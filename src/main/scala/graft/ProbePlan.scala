package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe main (not part of the engine): print the executed plan of
  * a gated query — `runMain graft.ProbePlan <sfDir> <query> [grepTerm]`.
  */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val name = if (args.length > 1) args(1) else "x05_ngram_jaccard_pairs"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    println("[plan] nodes of interest:")
    plan.linesIterator.filter(l =>
      l.contains("ReusedExchange") || l.contains("Exchange") ||
      l.contains("Window") || l.contains("Scan ExistingRDD") ||
      l.contains("BroadcastHashJoin") || l.contains("SortMergeJoin"))
      .foreach(l => println("[plan] " + l.trim.take(160)))
    spark.stop()
  }
}
