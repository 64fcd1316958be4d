package graft

import org.apache.spark.sql.functions._
import graft.ext.{Events, Multimodal, Similarity, TextAnalysis}

/** Similarity search, text analysis, event-time, multimodal plumbing. */
class ExtSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ similarity

  val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f)),
    (4L, Array(0.8f, 0.2f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("brute-force top-k ranks by cosine with deterministic ties") {
    val out = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0L),
      "vec_id", "embedding", k = 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 4L, 2L)) // by cosine desc: 0.994, 0.970, 0.0
  }

  test("ivf with all centroids probed equals brute force") {
    val centroids = vecs.filter(col("vec_id").isin(0L, 2L))
    val assigned = Similarity.ivfAssign(vecs, centroids, "vec_id", "embedding")
    assert(assigned.count() == 5)
    val ivf = Similarity.ivfTopK(assigned, centroids, vecs.filter(col("vec_id") === 0L),
      "vec_id", "embedding", k = 3, nprobe = 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    val bf = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0L),
      "vec_id", "embedding", k = 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(ivf == bf)
  }

  test("ivfAutoNprobe: chosen nprobe achieves the target recall, monotone, capped") {
    // 4 angular clusters of 6 points each in 2D — true top-5 neighbors
    // SPAN adjacent clusters, so nprobe=1 cannot reach full recall
    val pts = (for {
      c <- 0 until 4
      j <- 0 until 6
    } yield {
      val theta = c * (math.Pi / 8) + j * (math.Pi / 48)
      ((c * 6 + j).toLong, Array(math.cos(theta).toFloat, math.sin(theta).toFloat))
    }).toDF("vec_id", "embedding")
    val cents = (0 until 4).map { c =>
      val theta = c * (math.Pi / 8) + 2.5 * (math.Pi / 48)
      (c.toLong, Array(math.cos(theta).toFloat, math.sin(theta).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = pts.filter(col("vec_id").isin(0L, 5L, 11L, 17L, 23L))
    def recallAt(nprobe: Int): Double = {
      val assigned = Similarity.ivfAssign(pts, cents, "vec_id", "embedding")
      val truth = Similarity.bruteForceTopK(pts, queries, "vec_id", "embedding", 5)
        .select("query_id", "neighbor_id")
      val got = Similarity.ivfTopK(assigned, cents, queries, "vec_id", "embedding", 5, nprobe)
        .select("query_id", "neighbor_id")
      truth.join(got, Seq("query_id", "neighbor_id")).count().toDouble / truth.count()
    }
    val n90 = Similarity.ivfAutoNprobe(pts, cents, queries, "vec_id", "embedding", 5, 0.9)
    val n50 = Similarity.ivfAutoNprobe(pts, cents, queries, "vec_id", "embedding", 5, 0.5)
    val n100 = Similarity.ivfAutoNprobe(pts, cents, queries, "vec_id", "embedding", 5, 1.0)
    // the law is exact on the measuring sample: IVF recall@k at nprobe
    // IS the centroid-rank CDF the helper thresholds
    assert(recallAt(n90) >= 0.9, s"n90=$n90 recall=${recallAt(n90)}")
    assert(recallAt(n100) == 1.0, s"n100=$n100")
    assert(n50 <= n90 && n90 <= n100)
    // the fixture needs >1 probe for full recall (else the law is vacuous)
    assert(n100 > 1, s"fixture too separable: n100=$n100")
    assert(Similarity.ivfAutoNprobe(pts, cents, queries, "vec_id", "embedding", 5, 1.0,
      maxNprobe = 1) == 1)
  }

  test("hardNegatives returns only different-label neighbors, ranked") {
    val labeled = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.1f, 0.0f), 0),  // same label as query — excluded
      (2L, Array(0.8f, 0.2f, 0.0f), 1),  // best cross-label match
      (3L, Array(0.0f, 1.0f, 0.0f), 1),
      (4L, Array(-1.0f, 0.0f, 0.0f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(labeled,
        labeled.filter(col("vec_id") === 0L), "vec_id", "embedding", "label", k = 3)
      .orderBy("rank")
      .collect().map(r => r.getLong(2))
    assert(out.toSeq == Seq(2L, 3L, 4L)) // cos 0.970, 0.0, -1.0; never 1L
  }

  test("coverageAudit counts matches, misses, and orphans") {
    val docs = Seq((1L, "s1"), (2L, "s1"), (3L, "s2")).toDF("doc_id", "source")
    val embs = Seq(1L, 3L, 99L).toDF("vec_id") // 2 matched, doc 2 missing, 99 orphan
    val got = Multimodal.coverageAudit(docs, embs, "doc_id", "vec_id", "source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      ("__no_primary__", 0L, 1L, 0.0), ("s1", 2L, 1L, 0.5), ("s2", 1L, 1L, 1.0)))
  }

  // ---------------------------------------------------------- text analysis

  test("text metrics on a crafted doc") {
    val df = Seq("The quick brown fox, it jumps!").toDF("text").select(
      TextAnalysis.wordCount(col("text")).as("wc"),
      TextAnalysis.punctCharCount(col("text")).as("pc"),
      TextAnalysis.stopwordRatio(col("text")).as("sr"),
      TextAnalysis.fingerprint(col("text")).as("fp"),
      TextAnalysis.bagFingerprint(col("text")).as("bfp"))
    val r = df.collect().head
    assert(r.getLong(0) == 6)
    assert(r.getLong(1) == 2) // comma + bang
    assert(math.abs(r.getDouble(2) - 2.0 / 6.0) < 1e-12) // the, it
    assert(r.getString(3).length == 32)
  }

  test("bag fingerprint is word-order insensitive, exact fingerprint is not") {
    val df = Seq(("alpha beta gamma", "gamma beta alpha")).toDF("a", "b")
    val r = df.select(
      (TextAnalysis.bagFingerprint(col("a")) === TextAnalysis.bagFingerprint(col("b"))).as("bagEq"),
      (TextAnalysis.fingerprint(col("a")) === TextAnalysis.fingerprint(col("b"))).as("exactEq"))
      .collect().head
    assert(r.getBoolean(0) && !r.getBoolean(1))
  }

  test("rolling hash matches the scalar definition on long strings (no ANSI overflow)") {
    // >13 chars: with the old 2^61-1 modulus the accumulator overflowed Long
    // by the 13th character and ANSI mode threw ArithmeticException
    val s = "The quick brown fox jumps over the lazy dog 0123456789!?"
    val expected = s.foldLeft(0L)((acc, ch) =>
      java.lang.Math.floorMod(acc * 31L + ch.toLong, TextAnalysis.RollingHashMod))
    val got = Seq(s, s * 20).toDF("text")
      .select(TextAnalysis.rollingHash(col("text")).as("h")).collect()
    assert(got.head.getLong(0) == expected)
    assert(got(1).getLong(0) >= 0L) // 1140-char input computes without throwing
  }

  test("language id votes with deterministic tie-break and und fallback") {
    val df = Seq(
      ("d1", "the cat and the dog is that for with this are"),
      ("d2", "el la de que los una por del las es"),
      ("d3", "zzz qqq www")).toDF("id", "text")
    val out = df.select(col("id"), TextAnalysis.langId(col("text")).as("lang"))
    assert(sortedRows(out) == Seq(Seq("d1", "en"), Seq("d2", "es"), Seq("d3", "und")))
  }

  test("quality score is bounded and favors clean prose") {
    val df = Seq(
      ("clean", "the quick brown fox jumps over the lazy dog and runs to the hills " * 8),
      ("junk", "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( ))))")).toDF("id", "text")
    val m = df.select(col("id"), TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("clean") > 0.8 && m("junk") < 0.4)
    assert(m.values.forall(v => v >= 0.0 && v <= 1.0))
  }

  // ------------------------------------------------------------- event time

  test("gap sessionization splits on gap, counts events") {
    // user 1: events at 0s, 60s, 4000s, 4030s (gap 1800s) → 2 sessions
    val ev = Seq((1L, 0L), (1L, 60L), (1L, 4000L), (1L, 4030L), (2L, 10L))
      .toDF("user_id", "ts")
    val out = Events.sessionStats(ev, "user_id", "ts", gap = 1800L, tsCol = "ts")
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(rows == Set((1L, 1L, 0L, 60L, 2L), (1L, 2L, 4000L, 4030L, 2L), (2L, 1L, 10L, 10L, 1L)))
  }

  test("session_window streaming twin aggregates per gap session") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    mem.addData(
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L),
      (java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 1L),
      (java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), 1L))
    val df = mem.toDF().toDF("ts", "user_id")
    val q = Events.sessionWindowed(df, "user_id", "ts", "30 minutes")
      .writeStream.format("memory").queryName("sess_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val n = spark.sql("SELECT count(*) FROM sess_test").collect().head.getLong(0)
      assert(n == 2) // two sessions for user 1
    } finally q.stop()
  }

  test("props JSON extraction") {
    val df = Seq("""{"k": 42}""").toDF("props")
      .select(Events.propsField(col("props"), "k").as("k"))
    assert(rowsOf(df) == Seq(Seq("42")))
  }

  // ------------------------------------------------------------- multimodal

  test("binary metadata: byte_len, digest, magic") {
    val df = Seq(("a", Array[Byte](0x25, 0x50, 0x44, 0x46, 0x2d))).toDF("id", "blob")
    val out = Multimodal.withMeta(df, "blob").select("byte_len", "magic").collect().head
    assert(out.getLong(0) == 5L)
    assert(out.getString(1) == "25504446") // %PDF
  }

  test("decode stub emits deterministic features per blob") {
    import spark.implicits._
    val ds = Seq(Multimodal.MediaBlob(1L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)))
      .toDS()
    val out = Multimodal.decodeStub(ds).collect().head
    assert(out.byte_len == 8L && out.features.length == 4)
    assert(out.features(0) == (1 + 5) / 8.0)
  }

  test("dHash64: hand-computed bits; one-byte perturbation stays within Hamming 2") {
    import spark.implicits._
    // 72-byte blob = the grid samples byte k exactly at cell k: cell
    // values are 0..71 ascending, so EVERY adjacent compare in a row is
    // "greater" EXCEPT none — all 64 bits set
    val asc = Array.tabulate[Byte](72)(_.toByte)
    val h = Multimodal.dHash64(Seq(Multimodal.MediaBlob(1L, asc)).toDS())
      .collect().head.phash
    assert(h == -1L, s"ascending grid must set all 64 bits, got $h")
    // empty payload hashes to 0
    val h0 = Multimodal.dHash64(Seq(Multimodal.MediaBlob(2L, Array[Byte]())).toDS())
      .collect().head.phash
    assert(h0 == 0L)
    // a single replaced byte feeds one grid cell -> at most 2 bits flip,
    // and perceptualPairs surfaces the twin through the banded blocks
    val tw = asc.clone(); tw(36) = 100.toByte
    val pairs = Multimodal.perceptualPairs(
      Seq(Multimodal.MediaBlob(1L, asc), Multimodal.MediaBlob(2L, tw)).toDS(),
      maxDist = 3).collect()
    assert(pairs.length == 1 && pairs.head.getAs[Number]("hamming").longValue <= 2L)
  }

  test("hammingPairs64 refuses a chunk split that loses recall") {
    import spark.implicits._
    val df = Seq((1L, 5L), (2L, 7L)).toDF("id", "fp")
    intercept[IllegalArgumentException] {
      graft.ext.Dedup.hammingPairs64(df, maxDist = 2) // 3 chunks, 64 % 3 != 0
    }
  }

  test("frame sampling explodes every nth frame with byte slices") {
    val blob = Array.tabulate[Byte](10)(_.toByte)
    val df = Seq((1L, blob)).toDF("id", "blob")
    val frames = Multimodal.sampleFrames(df, "blob", frameBytes = 4, everyNth = 2)
    val idx = frames.select("frame_idx").as[Int].collect().toSeq.sorted
    assert(idx == Seq(0, 2)) // frames 0,1,2 exist; every 2nd → 0 and 2
    val f0 = frames.filter(col("frame_idx") === 0).select("frame_bytes").as[Array[Byte]].collect().head
    assert(f0.toSeq == Seq[Byte](0, 1, 2, 3))
  }
  test("aspectBatches: midpoint snapping and budgeted packing, hand-computed") {
    // ladder (0.5, 1, 2), midpoints 0.75 / 1.5 — boundary ratios snap UP
    val rows = Seq(
      (1L, 1, 2, 10L),  // ratio 0.5  -> bucket 0.5
      (2L, 3, 4, 60L),  // ratio 0.75 -> bucket 1.0 (boundary goes up)
      (3L, 3, 2, 10L),  // ratio 1.5  -> bucket 2.0 (boundary goes up)
      (4L, 1, 1, 50L),  // ratio 1.0  -> bucket 1.0
      (5L, 1, 1, 70L))  // bucket 1.0, overflows the 100-cost budget
      .toDF("id", "w", "h", "c")
    val out = Multimodal.aspectBatches(rows, "id", "w", "h", "c",
      ladder = Seq(0.5, 1.0, 2.0), budgetCost = 100L)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(3))).toSet
    assert(out == Set(
      (1L, 0.5, 0L),
      (2L, 1.0, 0L),   // cum 0
      (4L, 1.0, 0L),   // cum 60
      (5L, 1.0, 1L),   // cum 110 -> second batch
      (3L, 2.0, 0L)))
  }

  test("flatMapGroupsWithState sessionization carries state across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.StatefulSessions
    import graft.streaming.StatefulSessions.{Event => SEvent}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SEvent]
    val q = StatefulSessions.sessionize(mem.toDS(), gap = 100L)
      .writeStream.format("memory").queryName("stateful_sess")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: user 1 opens a session (ts 0..50)
      mem.addData(SEvent(1L, 0L), SEvent(1L, 50L))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM stateful_sess").collect().head.getLong(0) == 0)
      // batch 2: ts 400 exceeds the gap → the OPEN session from batch 1
      // closes (state crossed the batch boundary), new one opens
      mem.addData(SEvent(1L, 400L))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, session_start, session_end, n_events FROM stateful_sess")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(rows == Seq((1L, 0L, 50L, 2L)))
    } finally q.stop()
  }

  // -------------------------------------------- corpus-construction ops

  test("repeated n-gram stats count total/distinct/top exactly") {
    // 2-grams of "a b a b a": [a b, b a, a b, b a] → total 4, distinct 2
    val docs = Seq((1L, "a b a b a"), (2L, "x y z"), (3L, "w")).toDF("doc_id", "text")
    val out = TextAnalysis.repeatedNgramStats(docs, "doc_id", "text", 2)
      .orderBy("id")
      .select("id", "ngrams_total", "ngrams_distinct", "top_ngram_count", "dup_ngram_ratio")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // doc 3 has no 2-grams → no row
    assert(out.toSeq == Seq((1L, 4L, 2L, 2L, 0.5d), (2L, 2L, 2L, 1L, 0.0d)))
  }

  test("stratified top-k: salted two-stage equals the naive single window") {
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 200L).map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("k", "g")
    val got = graft.ext.Sampling.stratifiedTopK(df, Seq("g"), "k", k = 7, saltBuckets = 5)
      .select("g", "k", "sample_rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val naive = df.withColumn("r", row_number().over(
        Window.partitionBy(col("g")).orderBy(md5(col("k").cast("string")), col("k"))).cast("long"))
      .filter(col("r") <= 7).select("g", "k", "r").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == naive)
    assert(got.count(_._1 == "a") == 7 && got.count(_._1 == "b") == 7)
  }

  test("temperature mixture up-weights small sources at the sqrt ratio") {
    val docs = (1L to 900L).map(i => (i, if (i <= 800) "big" else "small")).toDF("k", "src")
    val out = graft.ext.Sampling.temperatureMixture(docs, "src", "k", 100L)
    val rates = out.select("src", "sample_rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // alpha=0.5 balancing: rate_small / rate_big = sqrt(n_big / n_small)
    val ratio = rates("small") / rates("big")
    assert(math.abs(ratio - math.sqrt(800.0 / 100.0)) < 0.01, s"ratio $ratio")
    assert(rates.values.forall(r => r > 0 && r <= 1.0))
    // membership is a pure function of the data: identical set on re-run
    val k1 = out.select("k").collect().map(_.getLong(0)).toSet
    val k2 = graft.ext.Sampling.temperatureMixture(docs, "src", "k", 100L)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(k1 == k2 && k1.nonEmpty)
  }

  test("benchmark overlap flags full, partial, and zero contamination") {
    import graft.ext.Dedup
    val bench = Seq((100L, "q r s t u")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "q r s t u"),        // identical: 3 of 3 trigrams leak
      (2L, "q r s x y z"),      // shares exactly trigram "q r s"
      (3L, "a b c d e")).toDF("doc_id", "text") // disjoint
    val out = Dedup.benchmarkOverlap(corpus, bench, "doc_id", "text", shingleN = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(out == Seq((1L, 3L, 3L, 1.0d), (2L, 4L, 1L, 0.25d), (3L, 3L, 0L, 0.0d)))
  }

  test("quality gate sets one fail bit per violated rule") {
    val theFiller = Seq.fill(20)("the data").mkString(" ")
    val docs = Seq(
      (1L, theFiller, "en"),                                  // clean → keep
      (2L, "the data is here", "en"),                         // bit 0: too short
      (3L, Seq.fill(15)("zebra quartz").mkString(" "), "en"), // bits 1+4: no stopwords, lang und
      (4L, theFiller + " " + "!" * 60, "en"),                 // bit 2: punct > 0.2
      (5L, theFiller, "fr"),                                  // bit 4: lang mismatch
      (6L, theFiller, null))                                  // bit 4: NO declared lang
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.qualityGate(docs, "text", "lang")
      .orderBy("doc_id").select("fail_mask", "keep").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    // null lang must FAIL the consistency rule (null-safe comparison),
    // not slip through as "consistent"
    assert(out == Seq((0L, true), (1L, false), (18L, false), (4L, false),
      (16L, false), (16L, false)))
  }
}
