package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Scratch probe main for performance investigation (not part of the engine). */
object Probe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    time("minhash sf0.1")(println("pairs=" + Dedup.minhashPairs(df, "doc_id", "text").count()))
    time("simhash sf0.1")(println("pairs=" + Dedup.simhashPairs(df, "doc_id", "text").count()))
    time("ngram4 sf0.1")(println("pairs=" + Dedup.ngramJaccardPairs(df, "doc_id", "text", 4, 0.5, 1000000L).count()))
    spark.stop()
  }
}
