package graft

import org.apache.spark.sql.functions._

import graft.ext.Events

/** The two-phase salted sessionization (x66): bucket-width invariance
  * against the plain per-user rollup, and the sharded plan shape under a
  * pathologically hot user.
  */
class SaltedSessionSpec extends SparkSpec {
  import spark.implicits._

  private val gap = 30L * 60 * 1000000L // 30 min in µs

  private def evUs = {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    ev.withColumn("ts_us", Events.epochMicros(ev))
  }

  private def plain = Events
    .sessionStats(evUs, "user_id", "ts_us", gap, "ts_us")
    .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))

  test("salted rollups equal plain rollups for any bucket width") {
    val want = sortedRows(plain)
    // widths: ≫ gap, == gap, a prime sliver of it, and 1 µs (every event
    // its own bucket — the degenerate all-merge case)
    for (w <- Seq(6L * 3600L * 1000000L, gap, 777777L, 1L)) {
      val got = Events.sessionStatsSalted(evUs, "user_id", "ts_us", gap, "ts_us", w)
      assert(sortedRows(got) == want, s"bucketWidth=$w diverged")
    }
  }

  test("phase-1 window shards a 50%-hot user across time buckets") {
    // one user owns half the corpus, densely packed (1-min cadence, so
    // sessions span buckets and the boundary merge is exercised)
    val hot = (0L until 5000L).map(i => (99999L, i * 60L * 1000000L))
    val cold = (0L until 5000L).map(i => (i % 500, i * 61L * 1000000L))
    val df = (hot ++ cold).toDF("user_id", "ts_us")
    val width = 3600L * 1000000L // 1h buckets → hot user splits ~84 ways
    val out = Events.sessionStatsSalted(df, "user_id", "ts_us", gap, "ts_us", width)
    // plan shape: the per-event window partitions on (user, bucket), so
    // no stage hashes all of a user's EVENTS to one reducer
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("__bkt"),
      "phase-1 partitioning lost the salt bucket column")
    // correctness under the skew: equals the unsalted rollup
    val want = sortedRows(Events
      .sessionStats(df, "user_id", "ts_us", gap, "ts_us")
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events")))
    assert(sortedRows(out) == want)
    // the hot user's dense minute-cadence stream is ONE merged session
    val hotRows = out.filter(col("user_id") === 99999L).collect()
    assert(hotRows.length == 1 && hotRows.head.getLong(3) == 5000L)
  }

  test("sessionWindowStats: abutting windows merge at exactly-gap, split past it") {
    // u1: 0, gap-1 merge; u2: 0, gap ALSO merge (abutting per-event
    // windows — the inclusive boundary the scaladoc pins); u3: 0,
    // gap+1 split
    val df = Seq((1L, 0L), (1L, gap - 1L), (2L, 0L), (2L, gap),
      (3L, 0L), (3L, gap + 1L)).toDF("user_id", "ts_us")
    val out = Events.sessionWindowStats(df, "user_id", "ts_us", gap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
      .toSet
    assert(out == Set(
      (1L, 0L, gap - 1L + gap, 2L),
      (2L, 0L, 2L * gap, 2L),           // exactly-gap pair: ONE session
      (3L, 0L, gap, 1L),                // past the gap: split
      (3L, gap + 1L, 2L * gap + 1L, 1L)))
  }

  test("sessionWindowStats equals the gaps-and-islands rollup on the fixture") {
    val native = Events.sessionWindowStats(evUs, "user_id", "ts_us", gap)
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
    assert(native.except(plain).isEmpty && plain.except(native).isEmpty)
  }

  test("resampleFill fills silent buckets with 0 events and carries values forward") {
    val df = Seq(("a", 1L, 1.5d), ("a", 9L, 2.5d), ("a", 37L, 7.0d),
      ("b", 12L, 3.0d))
      .toDF("k", "ts_us", "value")
    val out = Events.resampleFill(df, "k", "ts_us", "value", stepUs = 10L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]), r.getDouble(4)))
      .toSet
    assert(out == Set(
      ("a", 0L, 2L, Some(4.0d), 4.0d),    // two events in bucket 0
      ("a", 10L, 0L, None, 4.0d),         // silent, carried forward
      ("a", 20L, 0L, None, 4.0d),
      ("a", 30L, 1L, Some(7.0d), 7.0d),
      ("b", 10L, 1L, Some(3.0d), 3.0d))) // per-key spine: b starts at its own min
  }

  test("hourlyAnomalies flags a hand-computed 3-sigma spike, all-integer") {
    // 20 quiet hours of 5 events + one 50-event hour: n=21, S=150,
    // Q=3000 → nQ−S² = 40500; spike dev = 50·21−150 = 900,
    // 900² = 810000 > 9·40500 = 364500 → exactly one anomaly.
    // (A lone outlier among n constants has z² = n−1 exactly, so n must
    // exceed k²+1 for the spike to register — 21 does.)
    val hour = 3600L * 1000000L
    val rows =
      (for (h <- 0 until 20; i <- 0 until 5) yield ("a", h * hour + i)) ++
        (0 until 50).map(i => ("a", 20L * hour + i))
    val got = Events.hourlyAnomalies(rows.toDF("event_type", "ts_us"),
        "event_type", "ts_us", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("a", 21L, 150L, 1L)))
  }

  test("volumeTrend recovers a hand-built linear ramp exactly") {
    val hour = 3600L * 1000000L
    // type "up": counts 2,4,6,8 per hour → slope exactly 2.0
    // type "flat": 3,3,3 → slope 0.0; type "one": single bucket → 0.0
    val rows =
      (for (h <- 0 until 4; i <- 0 until (2 * (h + 1))) yield ("up", h * hour + i)) ++
        (for (h <- 0 until 3; i <- 0 until 3) yield ("flat", h * hour + i)) ++
        (0 until 7).map(i => ("one", i.toLong))
    val got = Events.volumeTrend(rows.toDF("event_type", "ts_us"), "event_type", "ts_us")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(got.toSeq == Seq(("flat", 3L, 0.0), ("one", 1L, 0.0), ("up", 4L, 2.0)))
  }

  test("phase-1 rollup reuses the window's (user, bucket) partitioning") {
    // the groupBy after the in-bucket window groups on a SUPERSET of the
    // window's partition keys — exactly one exchange before the merge
    // phase's per-user exchange, not two
    val out = Events.sessionStatsSalted(evUs, "user_id", "ts_us", gap, "ts_us",
      6L * 3600L * 1000000L)
    val exchanges = out.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 2,
      s"expected 2 shuffles (events by (user,bkt), rollups by user), got $exchanges")
  }
}
