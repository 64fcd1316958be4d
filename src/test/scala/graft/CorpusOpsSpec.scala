package graft

import org.apache.spark.sql.functions._
import graft.ext.{Chunking, Redaction, Sampling, Sketches, TextAnalysis}

/** Round-6 corpus-construction operators: PII redaction, token-window
  * chunking, KMV distinct sketch, weighted sampling.
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- redaction

  test("redact replaces email/ip/phone spans and counts them on raw text") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org here, host 192.168.0.1 dial +1 555-0100 ok 42"),
      (2L, "no pii at all"),
      (3L, "two mails a@b.io c@d.co one ip 10.0.0.255")).toDF("id", "text")
    val out = df.select(
      col("id"),
      Redaction.redact(col("text")).as("clean"),
      Redaction.piiCount(col("text"), "email").as("ne"),
      Redaction.piiCount(col("text"), "ipv4").as("ni"),
      Redaction.piiCount(col("text"), "phone").as("np"))
      .orderBy("id").collect()
    assert(out(0).getString(1) == "mail <EMAIL> here, host <IP> dial <PHONE> ok 42")
    assert((out(0).getLong(2), out(0).getLong(3), out(0).getLong(4)) == ((1L, 1L, 1L)))
    assert(out(1).getString(1) == "no pii at all")
    assert((out(1).getLong(2), out(1).getLong(3), out(1).getLong(4)) == ((0L, 0L, 0L)))
    assert(out(2).getString(1) == "two mails <EMAIL> <EMAIL> one ip <IP>")
    assert((out(2).getLong(2), out(2).getLong(3), out(2).getLong(4)) == ((2L, 1L, 0L)))
  }

  test("redaction placeholders are stable under a second pass (idempotent)") {
    val df = Seq((1L, "x a@b.io 10.0.0.1 +12 3456 7890")).toDF("id", "text")
    val once = df.select(Redaction.redact(col("text")).as("c"))
    val twice = once.select(Redaction.redact(col("c")).as("c"))
    assert(once.head.getString(0) == twice.head.getString(0))
  }

  // -------------------------------------------------------------- chunking

  test("tokenChunks emits overlapping windows with a short tail") {
    val df = Seq((7L, "a b c d e")).toDF("doc_id", "text")
    val out = Chunking.tokenChunks(df, Seq("doc_id"), "text", size = 3, stride = 2)
      .orderBy("chunk_idx")
      .select("chunk_idx", "start_tok", "n_toks", "chunk_text").collect()
    assert(out.map(_.toSeq).toSeq == Seq(
      Seq(0L, 0L, 3L, "a b c"),
      Seq(1L, 2L, 3L, "c d e"),
      Seq(2L, 4L, 1L, "e")))
  }

  test("tokenChunks: token-less docs emit no chunks; one-window docs emit one") {
    val df = Seq((1L, ""), (2L, "...!"), (3L, "only two")).toDF("doc_id", "text")
    val out = Chunking.tokenChunks(df, Seq("doc_id"), "text", size = 10, stride = 5)
      .select("doc_id", "chunk_idx", "n_toks", "chunk_text").collect()
    assert(out.map(_.toSeq).toSeq == Seq(Seq(3L, 0L, 2L, "only two")))
  }

  // ------------------------------------------------------------ KMV sketch

  test("kmvDistinct below k retains the exact distinct set") {
    val df = (0 until 100).map(i => ("g", s"v${i % 10}")).toDF("g", "v")
    val out = Sketches.kmvDistinct(df, "g", "v", k = 64).collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 10L)           // n_vals
    assert(out(0).isNullAt(2))                 // kth_hash absent
    assert(out(0).getDouble(3) == 10.0d)       // estimate = exact
  }

  test("kmvDistinct full sketch matches direct md5 order statistics and is salt-invariant") {
    val k = 8
    val df = (0 until 200).map(i => ("g", s"val$i")).toDF("g", "v")
    val out = Sketches.kmvDistinct(df, "g", "v", k = k).collect()(0)
    // expected: k-th smallest 12-hex-prefix md5 over the distinct values
    val hashes = (0 until 200).map { i =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"val$i".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString.take(12)
    }.distinct.sorted
    assert(out.getLong(1) == k.toLong)
    assert(out.getString(2) == hashes(k - 1))
    val vk = java.lang.Long.parseLong(hashes(k - 1), 16).toDouble
    assert(out.getDouble(3) == (k - 1).toDouble / (vk / 281474976710656.0d))
    // estimate lands in a sane band around the true 200
    assert(out.getDouble(3) > 40.0d && out.getDouble(3) < 1000.0d)
    val salted = Sketches.kmvDistinct(df, "g", "v", k = k, saltBuckets = 1).collect()(0)
    assert(salted.getString(2) == out.getString(2) && salted.getDouble(3) == out.getDouble(3))
  }

  test("maintained KMV store reads back as the batch sketch, replay replaces") {
    val k = 8
    val rows = (0 until 300).map(i => (s"g${i % 2}", s"val$i", s"d${i % 3}"))
    val df = rows.toDF("g", "v", "day")
    val table = graft.Scratch.path(s"kmvstore_${java.util.UUID.randomUUID().toString.take(8)}")
    (0 until 3).foreach { d =>
      Sketches.kmvAppendDay(spark, df.filter(col("day") === s"d$d"),
        "g", "v", s"d$d", table, k = k)
    }
    Sketches.kmvAppendDay(spark, df.filter(col("day") === "d1"),
      "g", "v", "d1", table, k = k) // replay: replace, not duplicate
    assert(graft.sources.ManifestStore.read(spark, table).count() == 6L) // 2 groups x 3 days
    val stored = Sketches.kmvDistinctFromStore(spark, table, "g", k = k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet
    val batch = Sketches.kmvDistinct(df, "g", "v", k = k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet
    assert(stored == batch) // bit-identical, kth-hash order statistic included
  }

  test("kmvOverlap below k is the exact set algebra") {
    // A = v0..v9, B = v5..v14: union 15 < k, so every output is exact
    val df = ((0 until 10).map(i => ("a", s"v$i")) ++
      (5 until 15).map(i => ("b", s"v$i"))).toDF("g", "v")
    val out = Sketches.kmvOverlap(
      Sketches.kmvMins(df, "g", "v", k = 64), "g", k = 64).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getLong(2) == 15L)                 // n_union_sketch = exact union
    assert(r.getLong(3) == 5L)                  // n_common = exact intersection
    assert(r.getDouble(4) == 15.0d)             // est_union exact
    assert(r.getDouble(5) == 5.0d / 15.0d)      // jaccard exact
    assert(r.getDouble(6) == 5.0d)              // est_intersection exact
  }

  test("kmvOverlap full sketch matches hand-computed md5 order statistics") {
    val k = 8
    def h(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val aVals = (0 until 200).map(i => s"val$i")
    val bVals = (100 until 300).map(i => s"val$i")
    val df = (aVals.map(("a", _)) ++ bVals.map(("b", _))).toDF("g", "v")
    val out = Sketches.kmvOverlap(
      Sketches.kmvMins(df, "g", "v", k = k), "g", k = k).collect()(0)
    val ma = aVals.map(h).distinct.sorted.take(k)
    val mb = bVals.map(h).distinct.sorted.take(k)
    val u = (ma ++ mb).distinct.sorted.take(k)
    val nc = u.count(x => ma.contains(x) && mb.contains(x))
    val vk = java.lang.Long.parseLong(u(k - 1), 16).toDouble
    val eu = (k - 1).toDouble / (vk / 281474976710656.0d)
    assert(out.getLong(2) == k.toLong)
    assert(out.getLong(3) == nc.toLong)
    assert(out.getDouble(4) == eu)
    assert(out.getDouble(5) == nc.toDouble / k.toDouble)
    assert(out.getDouble(6) ==
      BigDecimal(nc.toDouble / k.toDouble * eu)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  // ------------------------------------------------------- weighted sample

  test("weightedTopK is salt-invariant and ranks by the E-S key") {
    val df = (0 until 200).map(i => (i.toLong, (i % 7 + 1).toLong)).toDF("id", "w")
    val a = Sampling.weightedTopK(df, "id", col("w"), k = 20, saltBuckets = 64)
      .select("id", "sample_rank", "es_key")
    val b = Sampling.weightedTopK(df, "id", col("w"), k = 20, saltBuckets = 1)
      .select("id", "sample_rank", "es_key")
    assert(sortedRows(a) == sortedRows(b))
    assert(a.count() == 20)
    // recompute the key for the rank-1 row directly
    val top = a.orderBy("sample_rank").head
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(top.getLong(0).toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5d) / 281474976710656.0d
    val w = math.max((top.getLong(0) % 7 + 1).toDouble, 1.0d)
    val expected = BigDecimal(math.log(u) / w)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(top.getDouble(2) == expected)
  }

  test("weightedTopK caps the sample at the population size") {
    val df = (0 until 5).map(i => (i.toLong, 1L)).toDF("id", "w")
    assert(Sampling.weightedTopK(df, "id", col("w"), k = 50).count() == 5)
  }

  // ----------------------------------------------------------------- PMI

  test("pmiPairs: hand-computed document-frequency PMI") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "b c"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.pmiPairs(docs, "doc_id", "text", minPairDocs = 1L)
      .orderBy("tok_a", "tok_b").collect()
    // df: a=3 b=3 c=2, N=4; (a,b): n=2, pmi=ln(2·4/9); (a,c)/(b,c): n=1,
    // pmi=ln(4/6)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getDouble(3))).toSeq == Seq(
      ("a", "b", 2L, r6(math.log(8.0 / 9.0))),
      ("a", "c", 1L, r6(math.log(4.0 / 6.0))),
      ("b", "c", 1L, r6(math.log(4.0 / 6.0)))))
  }

  test("pmiPairs: repeated tokens in a doc count once (document frequency)") {
    val docs = Seq((1L, "a a a b b"), (2L, "a b"), (3L, "c c")).toDF("doc_id", "text")
    val out = TextAnalysis.pmiPairs(docs, "doc_id", "text", minPairDocs = 1L)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(out == Map(("a", "b") -> 2L)) // c never pairs; (a,b) df-counted
  }

  // ------------------------------------------------------------ key skew

  test("keySkewStats: hand-computed distribution stats incl. null key") {
    // counts per key: x→4, y→2, z→1, null→1  ⇒ dist {1:2, 2:1, 4:1}
    val df = (Seq.fill(4)("x") ++ Seq.fill(2)("y") ++ Seq("z") ++ Seq(null))
      .map(Tuple1(_)).toDF("k")
    val r = graft.ext.Quantiles.keySkewStats(df, Seq("k")).head
    assert(r.getString(0) == "k")
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((8L, 4L, 4L)))
    assert((r.getLong(4), r.getLong(5)) == ((1L, 2L))) // p50, p99
    assert(r.getDouble(6) == 0.5d) // top share
    assert(r.getDouble(7) == 1.213008d) // exact fixed-point entropy
  }

  test("keySkewStats: invariant under partitioning; uniform key entropy = ln n") {
    val df = (0 until 64).map(i => (i.toLong % 16, i)).toDF("k", "v")
    val a = graft.ext.Quantiles.keySkewStats(df, Seq("k")).head
    val b = graft.ext.Quantiles.keySkewStats(df.repartition(13), Seq("k")).head
    assert(a == b)
    // uniform 16 keys ⇒ entropy ln 16 = 2.772589 at 6 dp (the fixed-point
    // term round cancels: one dist row, multiplicity 16)
    assert(a.getDouble(7) == 2.772589d)
    assert(a.getDouble(6) == 0.0625d)
  }

  test("keySkewStats: one row per requested key column") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "s")
    val out = graft.ext.Quantiles.keySkewStats(df, Seq("id", "s"))
      .orderBy("key_col").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("id", "s"))
    assert(out(0).getLong(2) == 3L) // id: 3 distinct keys
    assert(out(1).getLong(3) == 2L) // s: hottest key count
  }

  // ------------------------------------------------------------ data card

  test("sourceCard: per-source composition report") {
    val docs = Seq(
      (1L, "hello world", "en", "s1", 11L),
      (2L, "hello world", "en", "s1", 11L),
      (3L, "foo bar baz", "fr", "s1", 11L),
      (4L, "x", "de", "s2", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.ext.DataCard.sourceCard(docs).orderBy("source").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getString(4), r.getDouble(5), r.getLong(6),
      r.getLong(7))).toSeq == Seq(
      ("s1", 3L, 7L, 2L, "en", 0.666667d, 2L, 11L),
      ("s2", 1L, 1L, 1L, "de", 1.0d, 0L, 1L)))
  }

  test("sourceCard: all-null-length source stays on the card with null median") {
    val docs = Seq(
      (1L, "a b", "en", "s1", Some(3L)),
      (2L, "c d", "en", "s2", None),
      (3L, "e f", "en", "s2", None))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.ext.DataCard.sourceCard(docs).orderBy("source").collect()
    assert(out.length == 2)
    assert(out(1).getString(0) == "s2" && out(1).isNullAt(7))
  }

  test("sourceCard: modal-language tie breaks on lang ascending") {
    val docs = Seq(
      (1L, "a", "fr", "s", 1L), (2L, "b", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(graft.ext.DataCard.sourceCard(docs).head.getString(4) == "en")
  }

  // ------------------------------------------------------- quality funnel

  test("qualityFunnel: per-rule failure counts and yield per source") {
    val good = "the quick brown fox jumps over the lazy dog and runs away fast"
    val docs = Seq(
      (1L, good, "en", "s1"),
      (2L, "the fox runs", "fr", "s1"), // fails length (3 words) AND lang
      (3L, good, "en", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.qualityFunnel(docs, "text", "lang", "source")
      .orderBy("source").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
      r.getDouble(8))).toSeq == Seq(
      ("s1", 2L, 1L, 1L, 0L, 0L, 0L, 1L, 0.5d),
      ("s2", 1L, 1L, 0L, 0L, 0L, 0L, 0L, 1.0d)))
  }

  // -------------------------------------------------- maintained data card

  test("cardFromStore equals the direct sourceCard; day replays are idempotent") {
    val docs = Seq(
      (1L, "hello world", "en", "s1", 11L),
      (2L, "hello world", "en", "s1", 11L),
      (3L, "foo bar baz", "fr", "s1", 12L),
      (4L, "x y", "de", "s2", 3L),
      (5L, "z", "de", "s2", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(graft.Scratch.root), "graft_cardstore").toString
    val day1 = docs.filter(col("doc_id") <= 2)
    val day2 = docs.filter(col("doc_id") > 2)
    graft.ext.DataCard.appendDay(spark, day1, "d1", root)
    graft.ext.DataCard.appendDay(spark, day2, "d2", root)
    graft.ext.DataCard.appendDay(spark, day2, "d2", root) // replay: no-op
    val fromStore = graft.ext.DataCard.cardFromStore(spark, root)
      .orderBy("source").collect().toSeq
    val direct = graft.ext.DataCard.sourceCard(docs)
      .orderBy("source").collect().toSeq
    assert(fromStore == direct)
    // the dup pair is SPLIT across days (doc 2 in d1... both in d1) —
    // also check a cross-day dup: append doc 2's twin as a third day
    graft.ext.DataCard.appendDay(spark,
      Seq((6L, "hello world", "en", "s1", 11L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"), "d3", root)
    val after = graft.ext.DataCard.cardFromStore(spark, root)
      .filter(col("source") === "s1").head
    assert(after.getLong(6) == 3L) // dup_docs: all three hello-world rows
    assert(after.getLong(1) == 4L) // n_docs grew by the day-3 doc
  }

  // ------------------------------------------------- c-TF-IDF class terms

  test("classTopTerms: hand-computed c-TF-IDF; unclassed docs drop") {
    // class A: apple×3 banana cherry (5 tokens); class B: banana×3
    // cherry date (5 tokens). A = 10/2 = 5. W(t,c) = tf · ln(1+5/f(t)).
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry"),
      (3L, "banana banana banana"),
      (4L, "cherry date"),
      (5L, "unclassed noise words")).toDF("doc_id", "text")
    val classes = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "B"))
      .toDF("doc_id", "cls")
    val got = TextAnalysis.classTopTerms(docs, classes,
      "doc_id", "text", "cls", topK = 3)
      .collect()
      .map(r => ((r.getString(0), r.getInt(1)), (r.getString(2), r.getDouble(3))))
      .toMap
    assert(got.size == 6)
    // A: apple 3·ln(1+5/3)=2.942488 > cherry ln(1+5/2)=1.252763 >
    //    banana ln(1+5/4)=0.81093
    assert(got(("A", 1)) == (("apple", 2.942488)))
    assert(got(("A", 2)) == (("cherry", 1.252763)))
    assert(got(("A", 3)) == (("banana", 0.81093)))
    // B: banana 3·ln(2.25)=2.432791 > date ln(6)=1.791759 > cherry
    assert(got(("B", 1)) == (("banana", 2.432791)))
    assert(got(("B", 2)) == (("date", 1.791759)))
    assert(got(("B", 3)) == (("cherry", 1.252763)))
    // the unclassed doc's vocabulary never appears
    assert(!got.values.exists(_._1 == "noise"))
  }

  test("zipfFit: exact power law fits slope -1 with r2 = 1; degenerate group nulls") {
    import graft.ext.TextAnalysis
    // counts follow cnt(rank) = 60/rank exactly for ranks 1..5:
    // w1 x60, w2 x30, w3 x20, w4 x15, w5 x12 -> ln-ln line slope -1
    val text = (Seq.fill(60)("w1") ++ Seq.fill(30)("w2") ++ Seq.fill(20)("w3")
      ++ Seq.fill(15)("w4") ++ Seq.fill(12)("w5")).mkString(" ")
    val docs = Seq((1L, "zipf", text), (2L, "flat", "only")).toDF("id", "g", "t")
    val out = TextAnalysis.zipfFit(docs, "id", "t", "g", topK = 10)
      .collect().map(r => r.getString(0) -> r).toMap
    val z = out("zipf")
    assert(z.getLong(1) == 5L)
    assert(math.abs(z.getDouble(2) + 1.0) < 1e-4, s"slope=${z.getDouble(2)}")
    assert(math.abs(z.getDouble(4) - 1.0) < 1e-6, s"r2=${z.getDouble(4)}")
    // intercept = ln(60) on the exact law
    assert(math.abs(z.getDouble(3) - math.log(60.0)) < 1e-4)
    // one distinct word: zero x-variance -> NULL stats, not NaN
    val f = out("flat")
    assert(f.getLong(1) == 1L && f.isNullAt(2) && f.isNullAt(3) && f.isNullAt(4))
  }

  test("heapsFit: exact power-law growth recovers beta; flat vocab flags beta ~ 0") {
    import graft.ext.TextAnalysis
    // day d contributes tokens so that N_cum = 4^d and V_cum = 2^d
    // (V = N^0.5): day words are fresh w{d}_{i}, counts pad N_cum
    val rows = (1 to 4).flatMap { d =>
      val nCum = math.pow(4, d).toLong
      val vCum = math.pow(2, d).toLong
      val nPrev = if (d == 1) 0L else math.pow(4, d - 1).toLong
      val vPrev = if (d == 1) 0L else math.pow(2, d - 1).toLong
      val fresh = (1L to (vCum - vPrev)).map(i => (s"w${d}_$i", 1L, s"d$d"))
      // pad the day's token count with weight on the first fresh word
      val pad = (nCum - nPrev) - fresh.size
      (fresh.head.copy(_2 = 1L + pad) +: fresh.tail)
    }
    val df = rows.toDF("w", "cnt", "day")
    val out = graft.ext.TextAnalysis.heapsFit(df).collect()(0)
    assert(out.getLong(0) == 4L)
    assert(math.abs(out.getDouble(1) - 0.5) < 1e-4, s"beta=${out.getDouble(1)}")
    assert(math.abs(out.getDouble(3) - 1.0) < 1e-6, s"r2=${out.getDouble(3)}")
    // constant vocabulary across growing days: beta ~ 0
    val flat = Seq(("a", 10L, "d1"), ("b", 10L, "d1"),
      ("a", 40L, "d2"), ("b", 40L, "d2")).toDF("w", "cnt", "day")
    val f = TextAnalysis.heapsFit(flat).collect()(0)
    assert(math.abs(f.getDouble(1)) < 1e-6, s"flat beta=${f.getDouble(1)}")
  }

  test("zipfFit: invariant to input partitioning") {
    import graft.ext.TextAnalysis
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(80)
    val a = TextAnalysis.zipfFit(docs, "doc_id", "text", "lang", topK = 50)
      .orderBy("lang").collect().map(_.toSeq).toSeq
    val b = TextAnalysis.zipfFit(docs.repartition(7), "doc_id", "text", "lang", topK = 50)
      .orderBy("lang").collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
