package graft

import org.apache.spark.sql.functions._
import graft.ext.{Events, Privacy, Retrieval, Scd2, Sketches, TextAnalysis}

/** Third-wave round-8 operators: SCD2 history/probe (x91/x92), RRF fusion
  * (x89), k-anonymity (x90), hashed linear scoring (x93), funnel (x94),
  * retention cohorts (x95), count-min sketch (x96).
  */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  // --- SCD2 ---------------------------------------------------------------

  private val changes = Seq(
    // user 1: versions at t=10 (A), t=20 (B); tie at t=20 loses to seq 4
    (1L, 10L, 1L, "A"),
    (1L, 20L, 3L, "Bzero"), // zero-width: same ts as seq 4, lower seq
    (1L, 20L, 4L, "B"),
    // user 2: single current version
    (2L, 15L, 2L, "C")).toDF("k", "t", "seq", "attr")

  test("scd2 build: versions, tiling intervals, zero-width ties") {
    val h = Scd2.build(changes, "k", "t", "seq", Seq("attr"))
      .orderBy("k", "version").collect()
    assert(h.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3), Option(r.get(4)))).toSeq == Seq(
      (1L, "A", 1L, 10L, Some(20L)),
      (1L, "Bzero", 2L, 20L, Some(20L)), // zero-width survives in history
      (1L, "B", 3L, 20L, None),
      (2L, "C", 1L, 15L, None)))
  }

  test("scd2 probe: containment semantics, ties, and pre-history nulls") {
    val h = Scd2.build(changes, "k", "t", "seq", Seq("attr"))
    val probes = Seq(
      (100L, 1L, 5L),  // before first version -> nulls
      (101L, 1L, 10L), // exactly at valid_from -> A
      (102L, 1L, 19L), // inside [10, 20) -> A
      (103L, 1L, 20L), // at the tie instant -> B (zero-width collapsed)
      (104L, 1L, 99L), // current -> B
      (105L, 2L, 15L)  // single current version
    ).toDF("pid", "k", "t")
    val out = Scd2.probe(h, probes, "k", "t", Seq("attr"))
      .orderBy("pid").collect()
    assert(out.map(r => (r.getLong(0), Option(r.get(3)))).toSeq == Seq(
      (100L, None), (101L, Some("A")), (102L, Some("A")),
      (103L, Some("B")), (104L, Some("B")), (105L, Some("C"))))
  }

  // --- RRF fusion ---------------------------------------------------------

  test("rrfFuse: hand-computed integer fusion and tie-break") {
    val l1 = Seq(("q", 1, 10L), ("q", 2, 11L)).toDF("query_id", "rank", "id")
    val l2 = Seq(("q", 1, 11L), ("q", 2, 12L)).toDF("query_id", "rank", "id")
    val out = Retrieval.rrfFuse(Seq(l1, l2), "id", k = 3)
      .orderBy("rank").collect()
    val c1 = 1000000000000L / 61L // rank 1
    val c2 = 1000000000000L / 62L // rank 2
    // 11 appears rank2+rank1, 10 rank1 only, 12 rank2 only
    assert(out.map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1, 11L, c1 + c2), (2, 10L, c1), (3, 12L, c2)))
  }

  // --- k-anonymity --------------------------------------------------------

  test("kAnonymityAudit: class sizes, l-diversity, risk flag") {
    val rows = Seq(
      ("a", 1L, 100.0), ("a", 1L, 100.0), ("a", 1L, 200.0),
      ("b", 2L, 300.0)).toDF("qi1", "qi2", "s")
    val out = Privacy.kAnonymityAudit(rows, Seq("qi1", "qi2"), "s", k = 2)
      .orderBy("qi1").collect()
    assert(out.map(r => (r.getString(0), r.getLong(2), r.getLong(3),
      r.getBoolean(4))).toSeq ==
      Seq(("a", 3L, 2L, false), ("b", 1L, 1L, true)))
  }

  // --- hashed linear scoring ----------------------------------------------

  test("hashedLinearScore: exact token count, additive scores, pred sign") {
    val docs = Seq((1L, "alpha beta alpha"), (2L, ""), (3L, "beta"))
      .toDF("id", "text")
    val out = TextAnalysis.hashedLinearScore(docs, "id", "text")
      .orderBy("id").collect()
    // empty doc emits no row
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    val d1 = out(0); val d3 = out(1)
    assert(d1.getLong(1) == 3L && d3.getLong(1) == 1L)
    // doc1 = 2*w(alpha) + w(beta): recover w(beta) from doc3 and check
    val wBeta = d3.getLong(2)
    assert((d1.getLong(2) - wBeta) % 2 == 0)
    assert(d3.getBoolean(3) == (wBeta > 0))
    // weights bounded by the fixed-point range
    assert(math.abs(wBeta) <= 1000L)
  }

  // --- funnel -------------------------------------------------------------

  test("funnel: strict ordering gates each stage") {
    val ev = Seq(
      // u1 completes in order
      (1L, "view", 10L), (1L, "click", 20L), (1L, "buy", 30L),
      // u2 clicks BEFORE its first view: click stage not reached
      (2L, "click", 5L), (2L, "view", 10L), (2L, "buy", 40L),
      // u3 view only
      (3L, "view", 7L)).toDF("u", "et", "t")
    val out = Events.funnel(ev, "u", "et", "t", Seq("view", "click", "buy"))
      .orderBy("stage_idx").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "view", 3L), (2L, "click", 1L), (3L, "buy", 1L)))
  }

  // --- retention cohorts --------------------------------------------------

  test("retentionCohorts: offsets against the first-event week") {
    val wk = 7L * 24 * 3600 * 1000000L
    val ev = Seq(
      (1L, 0L), (1L, wk), (1L, wk + 5L), // cohort 0, active weeks 0 and 1
      (2L, wk), (2L, 3 * wk)             // cohort 1, offsets 0 and 2
    ).toDF("u", "t")
    val out = Events.retentionCohorts(ev, "u", "t")
      .orderBy("cohort_week", "week_offset").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 0L, 1L), (0L, 1L, 1L), (1L, 0L, 1L), (1L, 2L, 1L)))
  }

  // --- count-min ----------------------------------------------------------

  test("countMin: estimates are one-sided and partition-invariant") {
    val vals = (1 to 400).flatMap(i => Seq.fill(i % 7 + 1)(s"v$i"))
      .toDF("v")
    val cells = Sketches.countMinCells(vals, "v", depth = 4, width = 64)
    val exact = vals.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val est = Sketches.countMinEstimate(cells, exact, "v", depth = 4, width = 64)
    assert(est.filter(col("est") < col("cnt")).count() == 0L)
    // sketch content is independent of input partitioning
    val cellsR = Sketches.countMinCells(vals.repartition(13), "v", depth = 4, width = 64)
    assert(cells.exceptAll(cellsR).count() == 0L &&
      cellsR.exceptAll(cells).count() == 0L)
  }

  test("countMin: collision-free width recovers exact counts") {
    val vals = Seq("a", "a", "b").toDF("v")
    val exact = vals.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val cells = Sketches.countMinCells(vals, "v", depth = 4, width = 4096)
    val est = Sketches.countMinEstimate(cells, exact, "v", depth = 4, width = 4096)
      .orderBy("v").collect()
    assert(est.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("a", 2L, 2L), ("b", 1L, 1L)))
  }
}
