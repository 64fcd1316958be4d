package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe main (not part of the engine): time a subset of the
  * gated queries at a given SF — `runMain graft.Probe <sfDir> q1 q2 …`
  * (each query runs twice; the second, warm run is reported).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("x04_minhash_pairs")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count() // warm: JIT + codegen
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      println(f"[probe] $n%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($rows rows)")
    }
    spark.stop()
  }
}
