package graft

import org.apache.spark.sql.functions._

import graft.ext.Retrieval

/** BM25 keyword retrieval (x69). */
class RetrievalSpec extends SparkSpec {

  test("rerankStub: candidate-pruned scoring matches the hand-computed md5 ranks") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "alpha beta"), (2L, "gamma delta"), (3L, "epsilon"),
      (4L, null.asInstanceOf[String]), (5L, "never a candidate"))
      .toDF("doc_id", "text")
    val cands = Seq(
      ("qa", 1, 1L), ("qa", 2, 2L), ("qa", 3, 4L),
      ("qb", 1, 2L), ("qb", 2, 3L)).toDF("query_id", "rank", "doc_id")
    val got = graft.ext.Retrieval
      .rerankStub(cands, docs, "doc_id", "text", topK = 2, batchSize = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    def score(q: String, t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest((q + "|" + t).getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 12), 16)
    }
    val texts = Map(1L -> "alpha beta", 2L -> "gamma delta", 3L -> "epsilon", 4L -> "")
    val want = Seq(("qa", Seq(1L, 2L, 4L)), ("qb", Seq(2L, 3L))).flatMap { case (q, ids) =>
      ids.map(id => (q, id, score(q, texts(id))))
        .sortBy { case (_, id, s) => (-s, id) }
        .take(2).zipWithIndex
        .map { case ((qq, id, s), i) => (qq, i + 1, id, s) }
    }.toSet
    assert(got == want)
    // doc 5 is never scored: the text fetch is candidate-pruned
    val scoredIds = graft.ext.Retrieval
      .rerankStub(cands, docs, "doc_id", "text", topK = 10, batchSize = 2)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(!scoredIds.contains(5L))
  }

  test("rerankStub: a candidate with no docs row stays in the list, scored as empty text") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    // candidate 99 resolves to NO docs row (a retriever index newer than
    // the doc snapshot) — it must not silently shorten qa's list
    val cands = Seq(("qa", 1, 1L), ("qa", 2, 99L)).toDF("query_id", "rank", "doc_id")
    val got = graft.ext.Retrieval
      .rerankStub(cands, docs, "doc_id", "text", topK = 5, batchSize = 2)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSet
    def score(q: String, t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest((q + "|" + t).getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 12), 16)
    }
    // the unresolved candidate scores exactly like a null-text doc
    assert(got == Set(("qa", 1L, score("qa", "alpha beta")),
      ("qa", 99L, score("qa", ""))))
  }

  import spark.implicits._

  private def score(tf: Long, len: Long, n: Long, df: Long, avgdl: Double): Double = {
    val idf = math.log(1.0 + (n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5))
    val tfn = (tf.toDouble * 2.2) / (tf.toDouble + 1.2 * (0.25 + 0.75 * (len.toDouble / avgdl)))
    math.rint(math.rint(idf * tfn * 1e9) / 1e9 * 1e6) / 1e6
  }

  test("bm25TopK matches the hand formula on a toy corpus") {
    val docs = Seq((1L, "cat cat dog"), (2L, "cat"), (3L, "fish")).toDF("id", "text")
    val qs = Seq(("q", Seq("cat"))).toDF("query_id", "terms")
    val got = Retrieval.bm25TopK(docs, "id", "text", qs, k = 10)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    // N=3, avgdl=5/3, df(cat)=2
    val s1 = score(tf = 2, len = 3, n = 3, df = 2, avgdl = 5.0 / 3)
    val s2 = score(tf = 1, len = 1, n = 3, df = 2, avgdl = 5.0 / 3)
    assert(got.length == 2) // fish doc matches nothing
    assert(got(0) == ((1, if (s1 >= s2) 1L else 2L, math.max(s1, s2))))
    // higher tf on the longer doc vs lower tf on the shorter: both orders
    // are legal BM25 outcomes; pin the exact values instead of guessing
    assert(got.map(_._3).toSet == Set(s1, s2))
  }

  test("multi-term scores sum per doc and rank deterministically") {
    val docs = Seq(
      (1L, "spark spark streaming"), (2L, "spark streaming"), (3L, "spark"),
      (4L, "other words entirely")).toDF("id", "text")
    val qs = Seq(("q", Seq("spark", "streaming"))).toDF("query_id", "terms")
    val got = Retrieval.bm25TopK(docs, "id", "text", qs, k = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(got.length == 2) // k cutoff
    // doc 2 matches both terms with best length norm; doc 1 repeats spark
    assert(got.map(_._2).toSet.subsetOf(Set(1L, 2L, 3L)))
    assert(got.map(_._1).toSeq.sorted == Seq(1, 2))
  }

  test("a repeated query term scores once, not twice") {
    val docs = Seq((1L, "cat cat dog"), (2L, "cat"), (3L, "fish")).toDF("id", "text")
    val once = Retrieval.bm25TopK(docs, "id", "text",
      Seq(("q", Seq("cat"))).toDF("query_id", "terms"), k = 10)
    val twice = Retrieval.bm25TopK(docs, "id", "text",
      Seq(("q", Seq("cat", "cat"))).toDF("query_id", "terms"), k = 10)
    assert(sortedRows(once) == sortedRows(twice))
  }

  test("per-query top-k plans a WindowGroupLimit, not a full sort") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val qs = Seq(("q", Seq("hash", "join"))).toDF("query_id", "terms")
    val plan = Retrieval.bm25TopK(docs, "doc_id", "text", qs, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }

  test("query-vocab join broadcasts un-hinted at fixture scale (degrade path exists)") {
    // the broadcast() hint was dropped (r8 verdict #3): this pins that
    // Spark's own size estimate + AQE still pick broadcast hash joins for
    // a fixture-scale query set, so a past-threshold query log can
    // degrade to a shuffle join instead of OOMing the driver
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val qs = Seq(("q", Seq("hash", "join"))).toDF("query_id", "terms")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", qs, k = 5)
    out.collect() // materialize so AQE's final (re-planned) joins are visible
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("prfExpand pulls in docs the literal query misses") {
    // query "apple": round 1 sees d1/d2 only; d1 (min id) is the
    // feedback doc, "banana" its only non-original term -> round 2 on
    // {apple, banana} must surface d3, which shares no literal term
    val docs = Seq((1L, "apple banana"), (2L, "apple cherry"),
      (3L, "banana cherry")).toDF("doc_id", "text")
    val qs = Seq(("q1", Seq("apple"))).toDF("query_id", "terms")
    val base = Retrieval.bm25TopK(docs, "doc_id", "text", qs, k = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(base == Set(1L, 2L))
    val out = Retrieval.prfExpand(docs, "doc_id", "text", qs,
      kFeedback = 1, mTerms = 1, k = 10)
    val got = out.collect().map(r => (r.getInt(1), r.getLong(2))).toMap
    assert(got.values.toSet == Set(1L, 2L, 3L))
    assert(got(1) == 1L) // d1 matches both terms — still the top hit
  }

  test("prfExpand never spends an expansion slot on an original query term") {
    // feedback doc d1 is apple-heavy: unexcluded, "apple" (weight ≈
    // idf·ftf3) would beat "banana" (idf·1) for the single expansion
    // slot and round 2 would collapse to the literal query — leaving d3
    // unreachable. The exclusion hands the slot to "banana".
    val docs = Seq((1L, "apple apple apple banana"), (2L, "apple cherry"),
      (3L, "banana cherry")).toDF("doc_id", "text")
    val qs = Seq(("q1", Seq("apple"))).toDF("query_id", "terms")
    val out = Retrieval.prfExpand(docs, "doc_id", "text", qs,
      kFeedback = 1, mTerms = 1, k = 10)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet.contains(3L))
  }

  test("ndcgAtK: perfect=1; reversed order penalized though recall is perfect; disjoint=0") {
    def list(items: (Long, Int)*) =
      items.map { case (id, r) => ("q1", r, id) }.toDF("query_id", "rank", "nid")
    val exact = list(10L -> 1, 20L -> 2, 30L -> 3)
    // identical list: ndcg = 1 exactly
    val perfect = Retrieval.ndcgAtK(exact, exact, "nid", 3).collect()(0)
    assert(perfect.getLong(1) == 3L && perfect.getDouble(2) == 1.0)
    // same items reversed: every hit counted (recall-perfect) but
    // ndcg < 1 — the position sensitivity recall can't see
    val rev = list(30L -> 1, 20L -> 2, 10L -> 3)
    val r = Retrieval.ndcgAtK(exact, rev, "nid", 3).collect()(0)
    assert(r.getLong(1) == 3L && r.getDouble(2) < 1.0 && r.getDouble(2) > 0.5)
    // disjoint list: 0 hits, ndcg 0
    val miss = list(70L -> 1, 80L -> 2, 90L -> 3)
    val m = Retrieval.ndcgAtK(exact, miss, "nid", 3).collect()(0)
    assert(m.getLong(1) == 0L && m.getDouble(2) == 0.0)
    // hand check the reversed value: gains (3,2,1) at discounts
    // d(p)=1/log2(p+1): dcg = 1*d1 + 2*d2 + 3*d3, idcg = 3*d1+2*d2+1*d3
    def d(p: Int) = 1.0 / (math.log(p + 1.0) / math.log(2.0))
    val want = BigDecimal((math.round(1 * d(1) * 1e9) + math.round(2 * d(2) * 1e9)
      + math.round(3 * d(3) * 1e9)).toDouble /
      (math.round(3 * d(1) * 1e9) + math.round(2 * d(2) * 1e9)
        + math.round(1 * d(3) * 1e9)).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getDouble(2) - want) < 2e-6, s"got ${r.getDouble(2)}, want $want")
  }
}
