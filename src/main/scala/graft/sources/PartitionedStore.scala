package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Partitioned parquet layout helpers — the at-scale storage story for
  * date-sliced data (the reference's `{aaaa}{mm}{dd}` filename slices,
  * SURVEY.md §2.10(b), generalized to hive-style partition directories).
  * A filter on the partition column prunes whole directories at planning
  * time — the scan never opens non-matching files, which is what makes
  * daily incremental processing O(day) instead of O(history) at 100 TB.
  */
object PartitionedStore {

  def write(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Compact a partitioned dataset in place: rewrite each partition's
    * many small files into ~`targetFiles` per partition. The small-files
    * problem is the classic failure mode of incremental partitioned
    * ingest (each micro-batch appends a file per partition per task);
    * compaction restores scan efficiency. Rewrites through a temp
    * directory so a crash mid-compact never truncates the source.
    */
  def compact(spark: SparkSession, path: String, partitionCols: Seq[String], targetFiles: Int = 1): Unit = {
    val tmp = path + "__compact_tmp"
    spark.read.parquet(path)
      .repartition(targetFiles, partitionCols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }

  /** Partition directories actually selected by `df`'s plan (from the
    * FileSourceScan's partition filters) — lets tests and ops verify
    * pruning happened instead of trusting it.
    */
  def selectedPartitionCount(df: DataFrame): Option[Long] = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    df.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s.selectedPartitions.partitionCount.toLong
    }
  }
}
