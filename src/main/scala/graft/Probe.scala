package graft

import org.apache.spark.sql.SparkSession
import graft.queries.{CoreQueries => C, ExtQueries => X}

/** Scratch probe main: explain-plan audit (not part of the engine). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    println("=== q01 ==="); C.q01PricingSummary(spark, d).explain("formatted")
    println("=== q02 ==="); C.q02TopOrders(spark, d).explain("formatted")
    println("=== q05 ==="); C.q05DomainFilter(spark, d).explain("formatted")
    println("=== q17 ==="); C.q17DateMacroFilter(spark, d).explain("formatted")
    spark.stop()
  }
}
