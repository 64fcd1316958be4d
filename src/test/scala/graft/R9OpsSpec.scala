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

  test("rangeJoin point-in-interval: exact matches incl. bucket straddles") {
    // width 10; interval [5, 25) straddles buckets 0,1,2; [-7, 3) crosses 0
    val pts = Seq(-8L, -7L, 2L, 3L, 5L, 14L, 24L, 25L).toDF("pt")
    val ivs = Seq(("a", 5L, 25L), ("b", -7L, 3L), ("e", 9L, 9L)).toDF("iv", "lo", "hi")
    val got = graft.operators.RangeJoin
      .pointInInterval(pts, ivs, "pt", "lo", "hi", bucketWidth = 10L)
      .select("iv", "pt").collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(x => (x._1, x._2))
    assert(got.toSeq == Seq(("a", 5L), ("a", 14L), ("a", 24L),
      ("b", -7L), ("b", 2L))) // half-open: 25 out, 3 out; empty iv matches none
  }

  test("rangeJoin point-in-interval plans equi-joins, never a nested loop") {
    val pts = (0L to 1000L).toDF("pt")
    val ivs = Seq((1L, 100L, 300L), (2L, 500L, 900L)).toDF("iv", "lo", "hi")
    val out = graft.operators.RangeJoin
      .pointInInterval(pts, ivs, "pt", "lo", "hi", bucketWidth = 100L)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(2000))
    assert(out.count() == 200L + 400L)
  }

  test("rangeJoin intervalOverlap: canonical bucket emits each pair once") {
    // [0,35) vs [30,60): shared buckets 3 (w=10) -> without the canonical
    // filter the pair would surface in bucket 3 only; [0,35) vs [5,95)
    // shares buckets 0..3 (4 copies without dedup)
    val a = Seq(("a1", 0L, 35L)).toDF("ai", "alo", "ahi")
    val b = Seq(("b1", 30L, 60L), ("b2", 5L, 95L), ("b3", 40L, 50L)).toDF("bi", "blo", "bhi")
    val got = graft.operators.RangeJoin
      .intervalOverlap(a, b, "alo", "ahi", "blo", "bhi", bucketWidth = 10L)
      .select("ai", "bi").collect().map(r => (r.getString(0), r.getString(1)))
      .sortBy(_._2)
    assert(got.toSeq == Seq(("a1", "b1"), ("a1", "b2"))) // b3 disjoint
  }

  test("rangeJoin intervalOverlap equals the brute-force overlap join") {
    val rnd = new scala.util.Random(7)
    val ivsA = (1 to 80).map(i => (i.toLong, rnd.nextInt(1000).toLong))
      .map { case (i, lo) => (i, lo, lo + 1 + rnd.nextInt(200)) }
    val ivsB = (1 to 80).map(i => (i.toLong, rnd.nextInt(1000).toLong))
      .map { case (i, lo) => (i, lo, lo + 1 + rnd.nextInt(200)) }
    val a = ivsA.toDF("ai", "alo", "ahi")
    val b = ivsB.toDF("bi", "blo", "bhi")
    val got = graft.operators.RangeJoin
      .intervalOverlap(a, b, "alo", "ahi", "blo", "bhi", bucketWidth = 64L)
      .select("ai", "bi").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (ai, alo, ahi) <- ivsA
      (bi, blo, bhi) <- ivsB
      if alo < bhi && blo < ahi
    } yield (ai, bi)).toSet
    assert(got == want)
    // and exactly once each (Set comparison would hide duplicates)
    assert(graft.operators.RangeJoin
      .intervalOverlap(a, b, "alo", "ahi", "blo", "bhi", bucketWidth = 64L)
      .count() == want.size.toLong)
  }

  test("dpBoundedCounts: cap bounds each user's contribution before noise") {
    // u1 floods g1 with 100 rows; cap 3 keeps 3 of them
    val rows = (1 to 100).map(i => (1L, "g1", i.toLong)) ++
      Seq((2L, "g1", 1L), (2L, "g2", 2L), (3L, "g2", 3L))
    val df = rows.toDF("u", "g", "id")
    val out = graft.ext.Privacy.dpBoundedCounts(df, "u", "g", "id",
        capPerUser = 3, epsilon = 1.0, seed = "s", includeBounded = true)
      .orderBy("g").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("g1", 4L), ("g2", 2L))) // 3 (capped) + 1, and 2
    // noise scale is cap/eps = 3: bound |noise| < 3 * 40 like the
    // dpNoisyCounts grid argument
    out.foreach(r => assert(math.abs(r.getDouble(2) - r.getLong(1)) < 120.0))
    // default output hides the bounded count
    assert(graft.ext.Privacy.dpBoundedCounts(df, "u", "g", "id", 3, 1.0, "s")
      .columns.toSeq == Seq("g", "n_noisy"))
  }

  test("ivf+pq composition: candidates restricted to probed buckets") {
    val data = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cents = data.filter(col("vec_id") % 50 === 0)
    val assigned = graft.ext.Similarity
      .ivfAssign(data, cents, "vec_id", "embedding")
      .select(col("vec_id"), col("centroid_id"))
    val queries = data.filter(col("vec_id") < 4)
    val probes = graft.ext.Similarity.probeCentroids(
      queries, cents, "vec_id", "embedding", nprobe = 2)
    assert(probes.groupBy("query_id").count()
      .select("count").as[Long].collect().forall(_ == 2L))
    val candidates = probes
      .join(assigned.select(col("centroid_id"), col("vec_id")), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
    val cb = Pq.codebook(data, "vec_id", "embedding", 64, 4, 16, 3)
    val codes = Pq.encode(data, cb, "vec_id", "embedding", 64, 4)
    val top = Pq.adcTopKCandidates(queries, candidates, codes, cb,
      "vec_id", "embedding", 64, 4, k = 5)
    // every returned neighbor must sit in one of its query's probed buckets
    val bad = top.join(assigned, Seq("vec_id"))
      .join(probes.withColumnRenamed("centroid_id", "probed"), Seq("query_id"))
      .groupBy("query_id", "vec_id")
      .agg(max(when(col("centroid_id") === col("probed"), 1).otherwise(0)).as("ok"))
      .filter(col("ok") === 0)
    assert(bad.count() == 0L)
    assert(top.groupBy("query_id").count()
      .select("count").as[Long].collect().forall(_ <= 5L))
  }

  test("readPartitions scans only the requested leafs; missing leafs are empty") {
    val table = graft.Scratch.path(s"graft_rp_spec_${java.util.UUID.randomUUID().toString.take(8)}")
    val df = (0L to 99L).map(i => (i, i % 4)).toDF("id", "p")
    graft.sources.ManifestStore.write(spark, df, table, "p")
    val one = graft.sources.ManifestStore.readPartitions(spark, table, Seq("p=2"))
    assert(one.count() == 25L)
    assert(one.inputFiles.nonEmpty && one.inputFiles.forall(_.contains("p=2")),
      one.inputFiles.mkString(","))
    val none = graft.sources.ManifestStore.readPartitions(spark, table, Seq("p=9"))
    assert(none.count() == 0L && none.columns.toSeq == Seq("id", "p"))
    val mixed = graft.sources.ManifestStore
      .readPartitions(spark, table, Seq("p=0", "p=9", "p=3"))
    assert(mixed.count() == 50L)
  }

  test("vector store: frozen model, increment visibility, pruned probe") {
    import graft.ext.VectorStore
    val data = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val incPred = col("vec_id") % 5 === 1 && col("vec_id") % 3 =!= 0
    val root = graft.Scratch.path(s"graft_vstore_spec_${java.util.UUID.randomUUID().toString.take(8)}")
    VectorStore.build(spark, data.filter(!incPred),
      data.filter(col("vec_id") % 50 === 0), "vec_id", "embedding", root,
      dim = 64, m = 4, k = 16, stride = 3)
    val queries = data.filter(col("vec_id") < 4)
    val pre = VectorStore.probe(spark, queries, "vec_id", "embedding", root,
      64, 4, 16, 3, nprobe = 2, topK = 5)
    assert(pre.filter(incPred).count() == 0L)
    VectorStore.appendDay(spark, data.filter(incPred), "vec_id", "embedding",
      root, 64, 4, 16, 3)
    val post = VectorStore.probe(spark, queries, "vec_id", "embedding", root,
      64, 4, 16, 3, nprobe = 2, topK = 5)
    // the increment is rankable now, and the store equals the one-shot
    // build over the full corpus (frozen model == full-data model here)
    val full = s"${root}_full"
    VectorStore.build(spark, data, data.filter(col("vec_id") % 50 === 0),
      "vec_id", "embedding", full, 64, 4, 16, 3)
    val direct = VectorStore.probe(spark, queries, "vec_id", "embedding", full,
      64, 4, 16, 3, nprobe = 2, topK = 5)
    assert(sortedRows(post) == sortedRows(direct))
    // geometry sidecar: a mismatched call must fail loudly
    intercept[IllegalArgumentException] {
      VectorStore.probe(spark, queries, "vec_id", "embedding", root,
        64, 4, 16, stride = 5, nprobe = 2, topK = 5)
    }
    // the probe's codes scan touches ONLY probed partitions
    val cents = graft.sources.ManifestStore.read(spark, s"$root/centroids")
      .select(col("centroid_id").as("vec_id"), col("cv").as("embedding"))
    val probed = graft.ext.Similarity
      .probeCentroids(queries, cents, "vec_id", "embedding", 2)
      .select("centroid_id").distinct().collect().map(_.get(0).toString).toSet
    val scan = graft.sources.ManifestStore.readPartitions(spark, s"$root/codes",
      probed.toSeq.map(id => s"centroid_id=$id"))
    assert(scan.inputFiles.nonEmpty &&
      scan.inputFiles.forall(f => probed.exists(id => f.contains(s"centroid_id=$id"))))
  }

  test("expectations: every check kind counts its violations exactly") {
    import graft.ext.Expectations._
    val df = Seq(
      (1L, Some("en"), 10L), (2L, Some("de"), 700L), (3L, None, 55L),
      (4L, Some("zz"), 60L), (5L, Some("en"), 65L), (5L, Some("en"), 70L)
    ).toDF("id", "lang", "n")
    val ref = Seq(1L, 2L, 3L).toDF("k")
    val out = audit(df, Seq(
      NotNull("a", "lang"),
      InRange("b", "n", 50, 500),
      Accepted("c", "lang", Seq("en", "de")),
      Unique("d", "id"),
      RefIntegrity("e", "id", ref, "k")))
      .orderBy("check_id").collect()
      .map(r => (r.getString(0), r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      ("a", 1L, false), // null lang row 3
      ("b", 2L, false), // 10 and 700 out of range
      ("c", 1L, false), // zz
      ("d", 1L, false), // id 5 twice: 6 non-null - 5 distinct
      ("e", 3L, false))) // ids 4, 5, 5 missing from ref
    // a clean slice passes everything
    val clean = audit(Seq((1L, "en", 100L)).toDF("id", "lang", "n"), Seq(
      NotNull("a", "lang"), InRange("b", "n", 50, 500),
      Accepted("c", "lang", Seq("en")), Unique("d", "id")))
    assert(clean.collect().forall(_.getBoolean(4)))
    // an EMPTY table violates nothing (aggregates of zero rows)
    val empty = audit(df.filter(lit(false)), Seq(
      NotNull("a", "lang"), Unique("d", "id")))
    assert(empty.collect().forall(r => r.getLong(3) == 0L && r.getBoolean(4)))
    intercept[IllegalArgumentException] {
      audit(df, Seq(NotNull("a", "lang"), Unique("a", "id")))
    }
  }

  test("dedup stores: N daily appends -> compact -> probe unchanged (lifecycle)") {
    // the x117 lifecycle applied to the OTHER maintained-store family
    // (r8 verdict missing #2 named DedupStores explicitly): 4 daily
    // appends accumulate live commits; compaction collapses each store
    // to one commit and the probe result is bit-identical
    import graft.ext.DedupStores
    import graft.sources.ManifestStore
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val (fpT, idxT) = (graft.Scratch.path(s"graft_dsl_fp_$tag"), graft.Scratch.path(s"graft_dsl_idx_$tag"))
    // 64 hash buckets + small daily slices: each day touches a SUBSET of
    // partitions, so merge commits accumulate (a day spanning every
    // bucket would supersede the whole table and self-compact — the
    // interesting lifecycle is the sparse-touch one)
    DedupStores.build(spark, docs.filter(col("doc_id") % 5 === 0),
      "doc_id", "text", fpT, idxT, partitions = 64)
    for (d <- 1 to 4)
      DedupStores.append(spark, docs.filter(col("doc_id") % 5 === d),
        "doc_id", "text", fpT, idxT, partitions = 64)
    val inc = docs.filter(col("doc_id") % 7 === 3)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val pre = sortedRows(DedupStores.probe(spark, inc, "doc_id", "text", fpT, idxT))
    val cFp = ManifestStore.compact(spark, fpT)
    val cIdx = ManifestStore.compact(spark, idxT)
    assert(cFp >= 2 && cIdx >= 2, s"expected >=2 live commits, got $cFp/$cIdx")
    assert(ManifestStore.vacuum(spark, fpT, 0L) >= 1)
    assert(ManifestStore.compact(spark, fpT) == 0) // single commit now
    assert(ManifestStore.compact(spark, idxT) == 0)
    val post = sortedRows(DedupStores.probe(spark, inc, "doc_id", "text", fpT, idxT))
    assert(pre == post)
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
    val table = graft.Scratch.path(s"graft_histstore_spec_${java.util.UUID.randomUUID().toString.take(8)}")
    for (d <- 0 to 2)
      Sketches.histAppendDay(spark, df.filter(col("v") % 3 === d), "v", 100L, s"d$d", table)
    Sketches.histAppendDay(spark, df.filter(col("v") % 3 === 1), "v", 100L, "d1", table)
    val stored = Sketches.histCellsFromStore(spark, table)
      .orderBy("bucket").collect().map(_.toSeq).toSeq
    assert(stored == cells.orderBy("bucket").collect().map(_.toSeq).toSeq)
  }
}
