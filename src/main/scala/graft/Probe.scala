package graft

import org.apache.spark.sql.SparkSession
import graft.ext.Dedup

/** Scratch probe main (not part of the engine). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val pairs = Dedup.minhashPairs(df, "doc_id", "text")
    pairs.collect()
    val plan = pairs.queryExecution.executedPlan.toString
    println("[probe] ReusedExchange count: " + "ReusedExchange".r.findAllIn(plan).length)
    println("[probe] HashAggregate(64 mins) count: " + "partial_min".r.findAllIn(plan).length / 64)
    spark.stop()
  }
}
