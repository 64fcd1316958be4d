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
      // Local-FS I/O regime (r15, measured: 10-gate lifecycle subset
      // 95.3 s → 79.1 s, ~17%): Hadoop's default local "file" FS is
      // ChecksumFileSystem, which writes+verifies a client-side .crc
      // sidecar per file — an artifact of LOCAL mode that production
      // filesystems (HDFS datanode checksums, object-store etags) do not
      // pay on this code path. RawLocalFileSystem drops the sidecars;
      // commit semantics are unchanged (ManifestStore's create-exclusive
      // claim and read-back live on the raw FS either way). Overridable
      // via the standard spark.hadoop.* mechanism for deployments that
      // want client checksums on local disk.
      .config("spark.hadoop.fs.file.impl",
        "org.apache.hadoop.fs.RawLocalFileSystem")
      // v2 commit: task-commit renames instead of a sequential
      // job-commit rename pass on the driver. Safe here by construction:
      // every Spark write lands in a fresh per-commit/per-run directory
      // whose VISIBILITY is governed by the ManifestStore manifest flip
      // (or by being this run's scratch), so v1's stronger
      // job-level atomicity adds nothing — the table format already
      // provides it.
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // local-iteration filter, mirroring Verify: the driver sets no such
    // variable and always benches the full surface
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def benched = SparkEntry.queries.filter(kv => only.forall(_.contains(kv._1)))
    // Warm-up pass at the smallest SF: JIT + codegen compilation dominate
    // first executions in a fresh JVM (observed 3-10x inflation on the
    // first query to touch each operator family); timed numbers should
    // measure the engine, not the JIT.
    //
    // ENGINE queries + a small store-core sample only (r14 post-mortem):
    // warming all 104 lifecycle gates at sf0.001 cost the driver budget
    // ~15 min of commit-floor I/O that JIT does not need — their sf0.001
    // prototype builds aren't even reused at the bench SF — and that
    // overhead is what pushed the r14 post-close bench past the driver's
    // wall clock (rc 124). The sample below still JITs the store
    // machinery the whole lifecycle family shares (manifest merge/read,
    // streaming upsert, sketch/index/vector/card/sample appends).
    val lifecycleWarm = Set(
      "q46_manifest_merge", "x45_stream_upsert", "x88_card_store",
      "x114_cm_store", "x129_vector_store", "x156_index_store",
      "x195_sample_store")
    val warmDir = "/root/testdata/sf0.001"
    benched
      .filter(kv => !SparkEntry.lifecycleQueries.contains(kv._1) || lifecycleWarm(kv._1))
      .foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => }
      }
    // Three timed passes, report the per-query MIN over SUCCESSFUL runs:
    // single-pass numbers in a shared JVM are GC/JIT-noise-dominated
    // (observed 3-10x spread on the same query; totals swung 37-46s with
    // min-of-2 under machine-load noise). A failed run must never
    // contribute its (fast) elapsed time — a query that failed every
    // pass reports -1 so the breakage is visible in the JSON.
    def pass(): Map[String, Double] = benched.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else Double.NaN)
    }
    // Fixed calibration probe before each pass: the same cheap aggregation
    // every round, so machine-load noise shows up as calibration drift
    // instead of masquerading as a per-query regression (the r5 driver
    // bench read 30% hot purely from external load).
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().collect()
      (System.nanoTime() - t0) / 1e9
    }
    // POLLUTION-GATED passes (r11 verdict #5): pass 3 of r11 ran 2.1×
    // under external machine load and only min-of-3 saved the artifact —
    // two polluted passes would silently corrupt every min with no flag.
    // The gate: collect passes until 3 are CLEAN (total ≤ 1.5× the best
    // collected total) or 5 have run; per-query MIN is over clean passes
    // only, and every pass carries an explicit verdict in the artifacts,
    // so a number can never silently include a loaded-machine sample.
    val timedBuf = scala.collection.mutable.ArrayBuffer[(Double, Map[String, Double])]()
    def totalOf(p: Map[String, Double]): Double = p.values.filterNot(_.isNaN).sum
    def verdicts: Seq[Boolean] = {
      val totals = timedBuf.map(t => totalOf(t._2))
      if (totals.isEmpty) Nil
      else { val best = totals.min; totals.map(_ <= 1.5 * best).toSeq }
    }
    // WALL-BUDGET STOP (r14 post-mortem): the driver kills the whole
    // process at its own timeout, losing the artifact entirely (rc 124,
    // parsed:null) — an artifact from 2 clean passes beats no artifact
    // from 5. Stop collecting extra passes once the timed wall exceeds
    // the budget, as long as ≥ 2 passes ran; the pass verdicts still
    // label anything polluted.
    val budgetSec =
      sys.env.get("SPARK_GRAFT_BENCH_BUDGET_SEC").map(_.toDouble).getOrElse(2400.0)
    val tStart = System.nanoTime()
    def timedWall: Double = (System.nanoTime() - tStart) / 1e9
    while (timedBuf.size < 5 && verdicts.count(identity) < 3 &&
        (timedBuf.size < 2 || timedWall < budgetSec))
      timedBuf += ((calibrate(), pass()))
    val (calibs, passes) = (timedBuf.map(_._1).toSeq, timedBuf.map(_._2).toSeq)
    val clean = verdicts
    val cleanPasses = passes.zip(clean).collect { case (p, true) => p }
    val results = passes.head.keys.map { k =>
      val times = cleanPasses.map(_(k)).filterNot(_.isNaN)
      k -> (if (times.isEmpty) -1.0 else times.min)
    }.toMap
    // per-pass totals over queries that succeeded in THAT pass: uniform
    // inflation across passes = load noise; one slow pass = GC/JIT blip
    val passTotals = passes.map(totalOf)
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
    // engine-vs-lifecycle split (SparkEntry.lifecycleQueries): the
    // lifecycle family's wall-time is micro-batch + store-commit floors,
    // so its subtotal tracks commit-cycle count, not engine speed —
    // per-query regression signal lives in the ENGINE subtotal
    def familyTotal(in: String => Boolean): Double =
      results.collect { case (k, v) if in(k) && v >= 0 => v }.sum
    val lifecycleT = familyTotal(SparkEntry.lifecycleQueries.contains)
    val engineT = familyTotal(k => !SparkEntry.lifecycleQueries.contains(k))
    // The COMPLETE per-query map as a first-class committed artifact
    // (r8 verdict #1): the stdout line above is captured through a
    // bounded tail that has repeatedly truncated the middle of the map,
    // leaving regression claims only partially auditable. This file is
    // the authoritative record — full min-of-passes map, every per-pass
    // map, and the calibration probes — written where `git add` finds it.
    writeDetail(results, passes, clean, calibs, sfDir)
    val nClean = clean.count(identity)
    val verdictJson = clean.map(c => "\"" + (if (c) "clean" else "polluted") + "\"")
      .mkString("[", ",", "]")
    val noise =
      s""""pass_totals":${passTotals.map(f3).mkString("[", ",", "]")},"pass_verdicts":$verdictJson,"calib":${calibs.map(f3).mkString("[", ",", "]")}"""
    val fams = s""""engine":${f3(engineT)},"lifecycle":${f3(lifecycleT)}"""
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","passes":$nClean,"failed":$failed,$fams,$noise,"queries":$qs,"sf":"$sfDir"}""")
    // Repeat the headline + slowest queries as a SHORT self-contained JSON
    // line LAST: whatever the capture buffer size, this one survives whole.
    val top = results.toSeq.sortBy(-_._2).take(8)
      .map { case (k, v) => s"\"" + k + "\":" + f3(v) }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","passes":$nClean,"failed":$failed,$fams,$noise,"queries":$top,"sf":"$sfDir"}""")
    spark.stop()
  }

  /** Write `BENCH_DETAIL_r{NN}.json` to the repo root. Round number:
    * `SPARK_GRAFT_ROUND` if set, else 1 + the highest `BENCH_r{NN}.json`
    * already on disk (the driver commits round N's headline AFTER the
    * round, so during round N the newest committed file is N−1's and the
    * inference is stable across every in-round re-run). The inference
    * assumes cwd = repo root, which is where both the driver and the
    * documented bench invocation run; set SPARK_GRAFT_ROUND explicitly
    * when benching from elsewhere or after the round's headline landed.
    */
  private def writeDetail(
      results: Map[String, Double],
      passes: Seq[Map[String, Double]],
      clean: Seq[Boolean],
      calibs: Seq[Double],
      sfDir: String): Unit = {
    try {
      val root = new java.io.File(".").getCanonicalFile
      val prior = Option(root.listFiles()).getOrElse(Array.empty)
        .flatMap { f =>
          val m = "BENCH_r(\\d+)\\.json".r.findFirstMatchIn(f.getName)
          m.map(_.group(1).toInt)
        }
      val round = sys.env.get("SPARK_GRAFT_ROUND").map(_.toInt)
        .getOrElse(if (prior.isEmpty) 1 else prior.max + 1)
      def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
      def qmap(m: Map[String, Double]): String = m.toSeq.sortBy(_._1)
        .map { case (k, v) =>
          "\"" + k + "\":" + (if (v.isNaN) "-1.0" else f3(v)) }
        .mkString("{", ",", "}")
      val passJson = passes.map(qmap).mkString("[", ",", "]")
      def famTotal(in: String => Boolean): Double =
        results.collect { case (k, v) if in(k) && v >= 0 => v }.sum
      val fams =
        s""""engine":${f3(famTotal(k => !SparkEntry.lifecycleQueries.contains(k)))},""" +
          s""""lifecycle":${f3(famTotal(SparkEntry.lifecycleQueries.contains))}"""
      val verdictJson = clean.map(c => "\"" + (if (c) "clean" else "polluted") + "\"")
        .mkString("[", ",", "]")
      val json =
        s"""{"round":$round,"sf":"$sfDir","passes":${clean.count(identity)},
           |"pass_verdicts":$verdictJson,
           |$fams,
           |"calib":${calibs.map(f3).mkString("[", ",", "]")},
           |"min":${qmap(results)},
           |"per_pass":$passJson}""".stripMargin
      val out = new java.io.File(root, f"BENCH_DETAIL_r$round%02d.json")
      val w = new java.io.PrintWriter(out, "UTF-8")
      try w.println(json) finally w.close()
      println(s"bench detail -> ${out.getPath}")
    } catch {
      case e: Throwable =>
        // the artifact is best-effort: a read-only cwd must not fail the bench
        println(s"bench detail write failed: ${e.getMessage}")
    }
  }
}
