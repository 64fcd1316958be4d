package graft

import org.apache.spark.sql.functions._
import graft.streaming.LateData

/** Pins the calibrated watermark semantics LateData documents (and the
  * x36 oracle encodes): late-events filtering uses the PREVIOUS batch's
  * eviction watermark (W_{j-2}), both predicates act on the WINDOW END
  * non-strictly, and the AvailableNow trailing batch flushes with W_last.
  */
class LateDataSpec extends SparkSpec {
  import spark.implicits._

  private def mins(m: Long): Long = m * 60L * 1000000L

  private def run(rows: Seq[(Long, Long)], window: String, name: String) = {
    val df = rows.map { case (m, b) => (mins(m), b) }.toDF("tu", "__ab")
    LateData.replayedWindowedCounts(spark, df, "tu", "__ab",
      graft.Scratch.path(s"latedata_spec_$name"), window, "15 minutes", s"latedata_$name")
      .collect().map(r => (r.getLong(0) / 60000000L, r.getLong(1))).toMap
  }

  test("late rows filter against the watermark of two batches earlier, on window end") {
    // b0 {60} -> W0=45; b1 {60}; b2 filter wm = W0 = 45:
    //   30 (win end 40 <= 45, dropped), 42 and 45 (win 40-50, end 50 > 45,
    //   kept — raw ts below/equal the watermark does NOT matter),
    //   50 (kept); b3 {300} -> final wm 285 flushes all closed windows.
    val out = run(Seq(60L -> 0L, 60L -> 1L, 30L -> 2L, 42L -> 2L, 45L -> 2L, 50L -> 2L, 300L -> 3L),
      "10 minutes", "filter")
    assert(out == Map(40L -> 2L, 50L -> 1L, 60L -> 2L)) // 30-win dropped, 300-win still open
  }

  test("filter and eviction are both non-strict on window end") {
    // 15-min windows: b2 row 40 has window end 45 == filter wm -> dropped;
    // b2 row 280 has window end 285 == final eviction wm -> emitted.
    val out = run(Seq(60L -> 0L, 60L -> 1L, 40L -> 2L, 50L -> 2L, 280L -> 2L, 300L -> 3L),
      "15 minutes", "equality")
    assert(out == Map(45L -> 1L, 60L -> 2L, 270L -> 1L))
  }
}
