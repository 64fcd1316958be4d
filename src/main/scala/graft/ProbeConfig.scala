package graft
import org.apache.spark.sql.SparkSession

/** A/B a set of session configs over named queries: run each query
  * `passes` times (min reported) under the bench session shape plus the
  * given overrides — the measurement harness behind config choices in
  * Bench (guide §1: measure first; §9: configs are the last 10-30%).
  *
  * Usage: runMain graft.ProbeConfig <sfDir> <passes> [k=v ...] -- <query> [query...]
  */
object ProbeConfig {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val passes = args(1).toInt
    val (confs, rest) = args.drop(2).span(_ != "--")
    val queries = rest.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    confs.foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      b.config(k, v)
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"confs: ${confs.mkString(" ")}")
    val mins = queries.map { n =>
      val times = (0 until passes).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-28s min=${times.min}%7.3f  all=${times.map(t => f"$t%.2f").mkString(",")}")
      times.min
    }
    println(f"TOTAL min-sum ${mins.sum}%.3f s over ${queries.length} queries")
    spark.stop()
  }
}
