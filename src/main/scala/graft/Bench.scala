package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up pass at the smallest SF: JIT + codegen compilation dominate
    // first executions in a fresh JVM (observed 3-10x inflation on the
    // first query to touch each operator family); timed numbers should
    // measure the engine, not the JIT.
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => }
    }
    // Three timed passes, report the per-query MIN over SUCCESSFUL runs:
    // single-pass numbers in a shared JVM are GC/JIT-noise-dominated
    // (observed 3-10x spread on the same query; totals swung 37-46s with
    // min-of-2 under machine-load noise). A failed run must never
    // contribute its (fast) elapsed time — a query that failed every
    // pass reports -1 so the breakage is visible in the JSON.
    def pass(): Map[String, Double] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else Double.NaN)
    }
    val passes = Seq(pass(), pass(), pass())
    val results = passes.head.keys.map { k =>
      val times = passes.map(_(k)).filterNot(_.isNaN)
      k -> (if (times.isEmpty) -1.0 else times.min)
    }.toMap
    // 3-decimal values: the harness that captures this output keeps only a
    // bounded TAIL of stdout (r2/r3 both came back `parsed: null` with the
    // line's head — including the headline total — sliced off), so the
    // line must be as short as full query names allow
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.toSeq.sortBy(-_._2)
      .map { case (k, v) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    // the -1 failure sentinel stays visible per query but must not deflate
    // the headline total; broken queries surface as an explicit count
    val total = results.values.filter(_ >= 0).sum
    val failed = results.values.count(_ < 0)
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","passes":3,"failed":$failed,"queries":$qs,"sf":"$sfDir"}""")
    // Repeat the headline + slowest queries as a SHORT self-contained JSON
    // line LAST: whatever the capture buffer size, this one survives whole.
    val top = results.toSeq.sortBy(-_._2).take(8)
      .map { case (k, v) => s"\"" + k + "\":" + f3(v) }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","passes":3,"failed":$failed,"queries":$top,"sf":"$sfDir"}""")
    spark.stop()
  }
}
