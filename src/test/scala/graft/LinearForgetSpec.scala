package graft

import org.apache.spark.sql.functions._
import graft.ext.{DataCard, LangModel, Sketches, StoreSidecar}
import graft.sources.ManifestStore

/** Round-15 forget-matrix completion: the two LINEAR sketch stores
  * (count-min, histogram) and the published data card erase by exact
  * subtraction (x205's negative-correction pattern — their cells are
  * sums), the heavy-hitter store by per-day RE-SUMMARIZATION (its
  * summaries discard what subtraction would need), and the
  * `has_corrections` marker keeps the forget-free read path cheap.
  * Each case pins the store read bit-equal to a from-scratch
  * survivors-only build on a hand fixture.
  */
class LinearForgetSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String): String =
    graft.Scratch.path(s"fmx_${tag}_${java.util.UUID.randomUUID().toString.take(8)}")

  // ---- count-min ----------------------------------------------------------

  test("countMinForget: netted cells equal the survivors-only sketch, cell for cell") {
    val t = fresh("cm")
    val vals = (1 to 300).map(i => (i.toLong, i.toLong % 31, i % 2)).toDF("id", "k", "day")
    (0 until 2).foreach { d =>
      Sketches.countMinAppendDay(spark, vals.filter(col("day") === d).select(col("k")),
        "k", s"d$d", t, depth = 4, width = 64)
    }
    val doomed = vals.filter(col("id") % 5 === 0).select(col("k"))
    Sketches.countMinForget(spark, doomed, "k", "f1", t, depth = 4, width = 64)
    // same-tag replay must REPLACE, never double-subtract
    Sketches.countMinForget(spark, doomed, "k", "f1", t, depth = 4, width = 64)
    assert(StoreSidecar.hasMarker(spark, t, "has_corrections"))
    val surv = vals.filter(col("id") % 5 =!= 0).select(col("k"))
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val want = cells(Sketches.countMinCells(surv, "k", 4, 64))
    assert(cells(Sketches.countMinCellsFromStore(spark, t)) == want)
    // compaction folds the correction ledger away; the read is unchanged
    Sketches.countMinCompact(spark, t, Seq("d0", "d1", "f1"), "epoch:01")
    assert(cells(Sketches.countMinCellsFromStore(spark, t)) == want)
    val days = ManifestStore.read(spark, t).select(col("day")).distinct()
      .collect().map(_.getString(0)).toSeq
    assert(days == Seq("epoch:01"))
  }

  test("countMinForget: a value alive only through the subject leaves the sketch") {
    val t = fresh("cmz")
    // width 1 forces every value into ONE cell per row: the doomed-only
    // value's entire mass must net out, not floor estimates at zero
    val d0 = Seq("a", "a", "zz", "zz", "zz").toDF("k")
    Sketches.countMinAppendDay(spark, d0, "k", "d0", t, depth = 2, width = 1)
    Sketches.countMinForget(spark, Seq("zz", "zz", "zz").toDF("k"), "k", "f1", t,
      depth = 2, width = 1)
    val got = Sketches.countMinCellsFromStore(spark, t)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val want = Sketches.countMinCells(Seq("a", "a").toDF("k"), "k", 2, 1)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  // ---- histogram ----------------------------------------------------------

  test("histForget: netted buckets equal the survivors-only histogram; zero-net buckets vanish") {
    val t = fresh("hist")
    val vals = (1 to 200).map(i => (i.toLong, (i % 9) * 10L, i % 2)).toDF("id", "v", "day")
    (0 until 2).foreach { d =>
      Sketches.histAppendDay(spark, vals.filter(col("day") === d).select(col("v")),
        "v", bucketWidth = 16L, day = s"d$d", table = t)
    }
    // bucket 5 (v=80) lives ONLY in doomed rows: ids ≡ 8 mod 9 → doom them all
    val doomed = vals.filter(col("id") % 9 === 8).select(col("v"))
    Sketches.histForget(spark, doomed, "v", 16L, "f1", t)
    Sketches.histForget(spark, doomed, "v", 16L, "f1", t)
    assert(StoreSidecar.hasMarker(spark, t, "has_corrections"))
    val surv = vals.filter(col("id") % 9 =!= 8).select(col("v"))
    def buckets(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val want = buckets(Sketches.histCells(surv, "v", 16L))
    assert(buckets(Sketches.histCellsFromStore(spark, t)) == want)
    assert(!want.exists(_.head == 5L)) // the doomed-only bucket is truly gone
    def q(df: org.apache.spark.sql.DataFrame) =
      Sketches.histQuantiles(df, 16L, Seq(0.5, 0.9)).collect().map(_.toSeq).toSet
    assert(q(Sketches.histCellsFromStore(spark, t))
      == q(Sketches.histCells(surv, "v", 16L)))
    Sketches.histCompact(spark, t, Seq("d0", "d1", "f1"), "epoch:01")
    assert(buckets(Sketches.histCellsFromStore(spark, t)) == want)
  }

  // ---- data card ----------------------------------------------------------

  test("DataCard.forget: the published card equals the survivors-only card; " +
      "a subject-only source leaves it") {
    val root = fresh("card")
    val docs = Seq(
      (1L, "alpha beta gamma", "en", "s1", 16L),
      (2L, "alpha beta gamma", "en", "s1", 16L), // dup of 1 within s1
      (3L, "uno dos tres cuatro", "es", "s1", 19L),
      (4L, "eins zwei drei", "de", "s2", 14L),
      (5L, "vier funf", "de", "s2", 9L),
      (6L, "solo doc", "en", "s3", 8L) // s3 lives ONLY through the subject
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    (0 until 2).foreach { d =>
      DataCard.appendDay(spark, docs.filter(col("doc_id") % 2 === d), s"d$d", root)
    }
    // subject: docs 3 and 6 — flips s1's modal language candidate set and
    // erases s3 entirely
    val doomed = docs.filter(col("doc_id") === 3L || col("doc_id") === 6L)
    DataCard.forget(spark, doomed, "f1", root)
    DataCard.forget(spark, doomed, "f1", root)
    assert(StoreSidecar.hasMarker(spark, root, "has_corrections"))
    val surv = docs.filter(col("doc_id") =!= 3L && col("doc_id") =!= 6L)
    def card(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val want = card(DataCard.sourceCard(surv))
    assert(card(DataCard.cardFromStore(spark, root)) == want)
    assert(!want.exists(_.head == "s3"))
    // fold the correction ledger away with the days — card unchanged
    DataCard.compactDays(spark, root, Seq("d0", "d1", "f1"), "epoch:01")
    assert(card(DataCard.cardFromStore(spark, root)) == want)
  }

  // ---- heavy hitters ------------------------------------------------------

  test("hhForgetDay: re-summarized days equal a store that never saw the subject") {
    val t = fresh("hh")
    val rows = Seq(
      (1L, "a", 0), (2L, "a", 0), (3L, "b", 0), (4L, "x", 0),
      (5L, "a", 1), (6L, "b", 1), (7L, "b", 1), (8L, "x", 1)
    ).toDF("id", "v", "day")
    (0 until 2).foreach { d =>
      Sketches.hhAppendDay(spark, rows.filter(col("day") === d).select(col("v")),
        "v", s"d$d", t, m = 2)
    }
    // subject: the 'x' rows (ids 4, 8) — both days affected
    (0 until 2).foreach { d =>
      Sketches.hhForgetDay(spark,
        rows.filter(col("day") === d && col("v") =!= "x").select(col("v")),
        "v", s"d$d", t, m = 2)
    }
    val want = fresh("hhwant")
    (0 until 2).foreach { d =>
      Sketches.hhAppendDay(spark,
        rows.filter(col("day") === d && col("v") =!= "x").select(col("v")),
        "v", s"d$d", want, m = 2)
    }
    def read(p: String) = Sketches.hhFromStore(spark, p, 3L)
      .collect().map(_.toSeq).toSet
    assert(read(t) == read(want) && read(t).nonEmpty)
  }

  test("hhForgetDay: a subject-only day takes the prune path, not a stale summary") {
    val t = fresh("hhp")
    Sketches.hhAppendDay(spark, Seq("a", "a", "b").toDF("v"), "v", "d0", t, m = 2)
    Sketches.hhAppendDay(spark, Seq("x", "x").toDF("v"), "v", "d1", t, m = 2)
    // scrubbing d1 leaves nothing — an empty re-append would silently
    // keep the old summary; the prune path must drop the day
    Sketches.hhForgetDay(spark, Seq.empty[String].toDF("v"), "v", "d1", t, m = 2)
    val days = ManifestStore.read(spark, s"$t/totals").select(col("day"))
      .distinct().collect().map(_.getString(0)).toSeq
    assert(days == Seq("d0"))
    // and the monitor sees only the surviving day: N=3, den=2 →
    // minCount 2, so only 'a' (2 hits) qualifies
    val out = Sketches.hhFromStore(spark, t, 2L)
      .collect().map(r => r.getString(0)).toSet
    assert(out == Set("a"))
  }

  // ---- the corrections marker ---------------------------------------------

  test("has_corrections: cheap and slow V paths agree; forget sets the marker first") {
    val t = fresh("lmmark")
    val ref = Seq((1L, "a b a c"), (2L, "b c d")).toDF("id", "text")
    LangModel.lmAppendDay(spark, ref, "id", "text", "d0", t)
    val docs = Seq((9L, "a b c d")).toDF("id", "text")
    def score() = LangModel.perplexityFromStore(spark, t, docs, "id", "text")
      .collect().map(_.toSeq).toSeq
    assert(!StoreSidecar.hasMarker(spark, t, "has_corrections"))
    val cheap = score() // no marker: the count_distinct fast path
    StoreSidecar.setMarker(spark, t, "has_corrections")
    assert(score() == cheap) // slow path is bit-identical on a positive store
    StoreSidecar.clearMarker(spark, t, "has_corrections")
    val t2 = fresh("lmmark2")
    LangModel.lmAppendDay(spark, ref, "id", "text", "d0", t2)
    LangModel.lmForget(spark, ref.filter(col("id") === 2L), "id", "text", "f1", t2)
    assert(StoreSidecar.hasMarker(spark, t2, "has_corrections"))
  }
}
