package graft

import org.apache.spark.sql.functions._
import graft.ext.{LangModel, Profiling, Sampling, Similarity}

/** Round-9 second wave: per-group KN scoring + CCNet buckets (x132),
  * blocked edit-distance entity matching (x134), temporal embargo split
  * (x135), approximate-FD profiling (x136).
  */
class R9bOpsSpec extends SparkSpec {
  import spark.implicits._

  test("knScoreBy: per-group model == per-slice pooled model") {
    // the defining property of group-keyed training: scoring lang L under
    // knScoreBy must equal scoring the L slice alone under knScore —
    // nothing from the other group's statistics may leak in
    val docs = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the dog sat on the rug"),
      (3L, "de", "der hund sitzt auf der matte"),
      (4L, "de", "der hund schlaeft auf der matte")).toDF("id", "lang", "txt")
    val grouped = LangModel.knScoreBy(docs, "id", "txt", Seq("lang"))
      .select("id", "n_bigrams", "avg_lp")
      .orderBy("id").collect().toSeq
    val sliced = Seq("en", "de").map { l =>
      LangModel.knScore(docs.filter(col("lang") === l), "id", "txt")
    }.reduce(_ union _).orderBy("id").collect().toSeq
    assert(grouped == sliced)
  }

  test("groupedPhases: per-group thirds, phase 0 = best, null row-preserving") {
    // group a: scores 6,5,4,3,2,1 -> phases 0,0,1,1,2,2
    // group b: scores 9,8,7 (its own distribution) -> phases 0,1,2
    val df = (Seq(("a", 6), ("a", 5), ("a", 4), ("a", 3), ("a", 2), ("a", 1),
      ("b", 9), ("b", 8), ("b", 7))
      .map { case (g, s) => (g, Some(s)) } :+ (("b", None: Option[Int])))
      .toDF("g", "s")
    val out = Sampling.groupedPhases(df, Seq("g"), "s", 3)
    val got = out.collect()
      .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2))))
      .toSet
    assert(got == Set(
      ("a", Some(6), Some(0L)), ("a", Some(5), Some(0L)),
      ("a", Some(4), Some(1L)), ("a", Some(3), Some(1L)),
      ("a", Some(2), Some(2L)), ("a", Some(1), Some(2L)),
      ("b", Some(9), Some(0L)), ("b", Some(8), Some(1L)),
      ("b", Some(7), Some(2L)), ("b", None, None)))
  }

  test("blockedEditPairs: within-block matches only; nulls excluded") {
    val df = Seq(
      (1L, "smith", "b1"), (2L, "smyth", "b1"), (3L, "smithe", "b1"),
      (4L, "smith", "b2"), // exact dup of id 1 but in another block
      (5L, "jones", "b1"), // in-block but distance 4 from the smiths
      (6L, null.asInstanceOf[String], "b1"), (7L, "smith", null))
      .toDF("id", "nm", "bk")
    val out = Similarity.blockedEditPairs(df, "id", "nm", col("bk"), maxDist = 1)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // smith~smyth 1, smith~smithe 1, smyth~smithe 2 (dropped);
    // (1,4) is distance 0 but UNBLOCKED -> must not appear
    assert(out == Seq((1L, 2L, 1), (1L, 3L, 1)))
  }

  test("blockedEditPairs: equi-join plan, never a cartesian") {
    val df = Seq((1L, "aa", "b1"), (2L, "ab", "b1")).toDF("id", "nm", "bk")
    val out = Similarity.blockedEditPairs(df, "id", "nm", col("bk"), 1)
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"blocking must plan an equi-join:\n$plan")
  }

  test("embargoSplit: exact integer cutoffs, boundaries, null ts") {
    // ts 0..100: range 100, t1 = 70, t2 = 80; ts=70 -> embargo (not
    // train), ts=80 -> test (not embargo) — both boundaries half-open
    val df = (Seq(0L, 69L, 70L, 79L, 80L, 100L).map(Option(_)) :+
      (None: Option[Long])).toDF("ts")
    val got = Sampling.embargoSplit(df, "ts", 70, 10)
      .collect().map(r => (Option(r.get(0)), Option(r.getString(1)))).toSet
    assert(got == Set(
      (Some(0L), Some("train")), (Some(69L), Some("train")),
      (Some(70L), Some("embargo")), (Some(79L), Some("embargo")),
      (Some(80L), Some("test")), (Some(100L), Some("test")),
      (None, None)))
    intercept[IllegalArgumentException] {
      Sampling.embargoSplit(df, "ts", 90, 10)
    }
  }

  test("fdProfile: hand-computed g3; exact FD scores zero; nulls group") {
    val df = Seq(
      ("k1", "x", 10L), ("k1", "x", 11L), ("k1", "y", 12L),
      ("k2", "z", 13L),
      (null.asInstanceOf[String], "w", 14L),
      (null.asInstanceOf[String], "v", 15L)).toDF("l", "r", "id")
    val out = Profiling.fdProfile(df, Seq(("l", "r"), ("id", "r")))
      .orderBy("lhs").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getDouble(6))).toSeq
    // id is a key -> exact FD; l->r: groups k1 (3 rows, max 2, violating),
    // k2 (clean), null (2 rows, max 1, violating): violations 1+0+1 = 2/6
    assert(out == Seq(
      ("id", 6L, 0L, 6L, 0L, 0.0),
      ("l", 3L, 2L, 6L, 2L, 0.333333)))
  }

  test("fdProfile gid bit-order: 4 columns, 3 disjoint nonzero grouping sets, values") {
    // allCols = [a, b, c, d] (appearance order), sets {a,b} (gid 3),
    // {c,d} (gid 12), {b,c} (gid 9) under Spark's MSB-first convention.
    // A bit-order mismatch routes a candidate to another set's cells,
    // where its lhs column is NULL (not grouped) — n_groups collapses
    // to 1 — so this fails on VALUES, not just plan shape. Data is
    // asymmetric so the three candidates' stats are pairwise distinct.
    val df = Seq(
      ("a1", "b1", "c1", 1L), ("a1", "b2", "c2", 1L),
      ("a2", "b2", "c2", 2L), ("a2", "b2", "c3", 2L),
      ("a2", "b2", "c3", 2L)).toDF("a", "b", "c", "d")
    val cands = Seq(("a", "b"), ("c", "d"), ("b", "c"))
    // the cell table carries exactly the three expected grouping ids
    val gids = Profiling.fdCells(df, cands)
      .select("__gid").distinct().collect().map(_.getLong(0)).toSet
    assert(gids == Set(3L, 12L, 9L), s"gids=$gids")
    val out = Profiling.fdProfile(df, cands)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    // a->b: a1 {b1,b2} violates; a2 clean.  c->d: c2 {1,2} violates;
    // c1, c3 clean.  b->c: b2 {c2 x2, c3 x2} -> 2 violations; b1 clean.
    assert(out == Seq(
      ("a", "b", 2L, 1L, 5L, 1L, 0.2),
      ("c", "d", 3L, 1L, 5L, 1L, 0.2),
      ("b", "c", 2L, 1L, 5L, 2L, 0.4)), s"out=$out")
  }

  test("fdProfile: swapped-role and duplicate candidates share one scan's cells correctly") {
    val df = Seq(
      ("k1", "x"), ("k1", "x"), ("k1", "y"),
      ("k2", "z"), ("k2", "z"),
      ("k3", "x")).toDF("l", "r")
    // l->r: k1 violates (3 rows, max 2); r->l: x violates (3 rows, max
    // 2 for k1); the duplicate (l, r) must come back twice, row-equal
    val out = Profiling.fdProfile(df, Seq(("l", "r"), ("r", "l"), ("l", "r")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    val lr = ("l", "r", 3L, 1L, 6L, 1L, 0.166667)
    val rl = ("r", "l", 3L, 1L, 6L, 1L, 0.166667)
    assert(out == Seq(lr, rl, lr))
  }
}
