package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Events, Pq, Sketches}

/** Round-9 operators: sliding-window duplicate spans (x119), product
  * quantization (x120), cross-dataset contamination matrix (x121),
  * hopping windows (x122), maintained histogram store (x123).
  */
class R9OpsSpec extends SparkSpec {
  import spark.implicits._

  test("slidingDupStats: hand-computed span union on overlapping windows") {
    // k=3; docs 1 and 2 share "a b c d" -> windows "a b c" and "b c d"
    // both duplicated; doc1 has 5 tokens, starts 0 and 1 overlap:
    // covered = 3 + min(3, 1) = 4 of 5
    val docs = Seq(
      (1L, "a b c d x"),
      (2L, "z a b c d"),
      (3L, "p q r s t")).toDF("doc_id", "text")
    val out = Dedup.slidingDupStats(docs, "doc_id", "text", k = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(out(0) == ((1L, 5L, 3L, 2L, 4L, 0.8)))
    assert(out(1) == ((2L, 5L, 3L, 2L, 4L, 0.8)))
    assert(out(2) == ((3L, 5L, 3L, 0L, 0L, 0.0)))
  }

  test("slidingDupStats: self-repeat inside one doc counts as duplication") {
    val docs = Seq((1L, "a b a b a b"), (2L, "x y z w v u")).toDF("doc_id", "text")
    // k=2 windows of doc 1: ab ba ab ba ab -> every window duplicated,
    // covered = full 6 tokens
    val out = Dedup.slidingDupStats(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(3) == 5L && out(0).getLong(4) == 6L)
    assert(out(1).getLong(3) == 0L)
  }

  test("slidingDupStats: docs shorter than k emit no row") {
    val docs = Seq((1L, "a b"), (2L, "a b c d")).toDF("doc_id", "text")
    val out = Dedup.slidingDupStats(docs, "doc_id", "text", k = 3)
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(2L))
  }

  test("groupShingleOverlap: hand-computed jaccard, no cross-doc stitching") {
    // group g1: two docs whose CONCATENATION would mint the shingle
    // "b c" (doc A ends 'b', doc B starts 'c') — it must NOT exist
    val docs = Seq(
      (1L, "g1", "a b"),
      (2L, "g1", "c d"),
      (3L, "g2", "a b x"),
      (4L, "g3", "q r")).toDF("doc_id", "g", "text")
    val out = Dedup.groupShingleOverlap(docs, "doc_id", "text", "g", n = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // g1 = {ab, cd}, g2 = {ab, bx}, g3 = {qr}: only (g1,g2) share; if
    // stitching happened g1 would also hold "b c" (still no new overlap,
    // but n_a would read 3 and the jaccard would be wrong)
    assert(out.toSeq == Seq(("g1", "g2", 1L, 2L, 2L, 0.333333)))
  }

  test("groupShingleOverlap: maxGroupsPerShingle drops boilerplate") {
    val docs = Seq(
      (1L, "g1", "common one two"),
      (2L, "g2", "common one three"),
      (3L, "g3", "common one four")).toDF("doc_id", "g", "text")
    // "common one" sits in all 3 groups; cutoff 2 removes it, leaving
    // no shared shingles at all
    val all = Dedup.groupShingleOverlap(docs, "doc_id", "text", "g", n = 2)
    assert(all.count() == 3L) // all pairs share "common one"
    val cut = Dedup.groupShingleOverlap(docs, "doc_id", "text", "g", n = 2,
      maxGroupsPerShingle = 2)
    assert(cut.count() == 0L)
  }

  test("pq: encode picks the nearest codeword, adc ranks by summed LUT") {
    // dim 4, m 2, k 2, stride 1: codebook = subvectors of vectors 0, 1
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
      (1L, Seq(0.0f, 1.0f, 1.0f, 0.0f)),
      (2L, Seq(1.0f, 0.1f, 0.9f, 0.0f)) // sub0 ~ code0, sub1 ~ code1
    ).toDF("vec_id", "embedding")
    val cb = Pq.codebook(vecs, "vec_id", "embedding", dim = 4, m = 2, k = 2, stride = 1)
    assert(cb.count() == 4L) // m x k
    val codesDf = Pq.encode(vecs, cb, "vec_id", "embedding", dim = 4, m = 2)
    val codes = codesDf.orderBy("vec_id", "sub").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(codes.toSeq == Seq(
      (0L, 0L, 0L), (0L, 1L, 0L),
      (1L, 0L, 1L), (1L, 1L, 1L),
      (2L, 0L, 0L), (2L, 1L, 1L)))
    // query = vector 2: its own code cell (code0, code1) must rank
    // closest; est distance is the sum of its two subspace LUT entries
    val top = Pq.adcTopK(vecs.filter(col("vec_id") === 2), codesDf,
      cb, "vec_id", "embedding", dim = 4, m = 2, k = 3)
      .orderBy("rank").collect()
    assert(top.head.getLong(2) == 2L) // itself first
    // exact integer: sub0 d2 = 0.1^2 = 0.01; sub1 d2 = 0.9^2+..., both
    // on the 1e-9 grid — just pin determinism under repartition
    val again = Pq.adcTopK(vecs.filter(col("vec_id") === 2),
      Pq.encode(vecs.repartition(5), cb, "vec_id", "embedding", dim = 4, m = 2),
      cb, "vec_id", "embedding", dim = 4, m = 2, k = 3).orderBy("rank").collect()
    assert(top.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("hopping: each event lands in exactly span/slide windows") {
    val ev = Seq((1L, 100L), (2L, 3599L), (3L, 7200L)).toDF("id", "ts_us")
    val out = Events.hopping(ev, "ts_us", slideUs = 1800L, spanUs = 7200L,
      keys = Seq.empty, aggs = Seq(count(lit(1)).as("n")))
    assert(out.agg(sum("n")).head().getLong(0) == 12L) // 3 events x 4 windows
    // event at 100 belongs to starts 0, -1800, -3600, -5400
    val w1 = out.count()
    assert(w1 > 0)
    val starts = Events.hopping(ev.filter(col("id") === 1), "ts_us",
      1800L, 7200L, Seq.empty, Seq(count(lit(1)).as("n")))
      .select("window_start").as[Long].collect().sorted
    assert(starts.toSeq == Seq(-5400L, -3600L, -1800L, 0L))
  }

  test("hopping: window totals equal tumbling totals re-summed") {
    val ev = (0 until 100).map(i => (i.toLong, i * 977L)).toDF("id", "ts_us")
    val hop = Events.hopping(ev, "ts_us", slideUs = 1000L, spanUs = 4000L,
      Seq.empty, Seq(count(lit(1)).as("n")))
    // every event appears exactly 4x -> total count across windows = 4N
    assert(hop.agg(sum("n")).head().getLong(0) == 400L)
    // and each window's count equals the brute-force interval count
    val rows = hop.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val ts = (0 until 100).map(_ * 977L)
    rows.foreach { case (ws, n) =>
      assert(n == ts.count(t => t >= ws && t < ws + 4000L), s"window $ws")
    }
  }

  test("histogram store: cells merge to the batch histogram, quantiles bound") {
    val df = (1 to 1000).map(i => i.toLong).toDF("v")
    val cells = Sketches.histCells(df, "v", bucketWidth = 100L)
    assert(cells.count() == 11L) // buckets 0..10 (1000 div 100 = 10)
    val q = Sketches.histQuantiles(cells, 100L, Seq(0.5, 0.99))
      .orderBy("q").collect()
    // rank(0.5) = floor(0.5*999)+1 = 500 -> value 500 -> bucket 5
    assert(q(0).getLong(1) == 5L && q(0).getLong(2) == 500L && q(0).getLong(3) == 599L)
    // rank(0.99) = floor(0.99*999)+1 = 990 -> bucket 9
    assert(q(1).getLong(1) == 9L)
    // maintained store: three slices + a replayed day == batch cells
    val table = s"/tmp/graft_histstore_spec_${java.util.UUID.randomUUID().toString.take(8)}"
    for (d <- 0 to 2)
      Sketches.histAppendDay(spark, df.filter(col("v") % 3 === d), "v", 100L, s"d$d", table)
    Sketches.histAppendDay(spark, df.filter(col("v") % 3 === 1), "v", 100L, "d1", table)
    val stored = Sketches.histCellsFromStore(spark, table)
      .orderBy("bucket").collect().map(_.toSeq).toSeq
    assert(stored == cells.orderBy("bucket").collect().map(_.toSeq).toSeq)
  }
}
