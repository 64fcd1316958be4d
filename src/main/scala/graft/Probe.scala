package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Scratch probe main for performance investigation (not part of the engine). */
object Probe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    time("warmup")(df.count())
    val posts = Dedup.shingleRows(df, "doc_id", "text", 4)
    time("shingleRows count")(println("posts=" + posts.count()))
    val kept = posts.withColumn("__df", count(lit(1)).over(Window.partitionBy(col("s"))))
      .filter(col("__df") <= 1000000L).drop("__df")
    time("df-window")(kept.count())
    val dfc = posts.groupBy(col("s")).agg(count(lit(1)).as("__df"))
    val kept2 = posts.join(dfc.filter(col("__df") <= 1000000L), "s").drop("__df")
    time("df-groupby-join")(kept2.count())
    val inter = kept.as("a").join(kept.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    time("inter via window-kept")(println(inter.count()))
    val inter2 = kept2.as("a").join(kept2.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    time("inter via groupby-kept")(println(inter2.count()))
    time("full x05")(println(Dedup.ngramJaccardPairs(df, "doc_id", "text", 4, 0.5, 1000000L).count()))
    spark.stop()
  }
}
