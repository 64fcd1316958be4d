package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword retrieval over the corpus: Okapi BM25 top-k (Robertson et al.;
  * the idf variant is Lucene's always-positive ln(1 + (N−df+0.5)/(df+0.5))).
  * The lexical complement of the embedding-side ANN operators — corpus
  * curation uses it for targeted audits ("show me the docs that score for
  * these terms") and contamination triage.
  *
  * 100 TB design:
  *  - the query table is O(queries × terms); corpus tokens join it
  *    FIRST, so tf counting shuffles only postings of the query
  *    vocabulary, never the corpus's. The join is un-hinted: Spark
  *    broadcasts it whenever the query vocab fits (the common case,
  *    spec-pinned at fixture scale) and degrades to a shuffle join on
  *    a past-threshold query log instead of OOMing the driver;
  *  - df/idf are per-term aggregates of that pruned posting set (tiny);
  *    N/avgdl is a 1-row broadcast. Doc lengths are the one O(corpus)
  *    table (BM25's length norm needs every doc's FULL token count) —
  *    a production deployment precomputes it at ingest as index
  *    metadata; here it rides the same token pass and joins the scored
  *    (query, doc) rows on id;
  *  - per-query top-k is a rank-filtered window — Spark's
  *    WindowGroupLimit pushes the limit into the shuffle (partial top-k
  *    per map side), so no query ever materializes its full candidate
  *    list on one reducer;
  *  - engine-portable determinism: per-(query, doc, term) partials are
  *    rounded to 1e-9 fixed-point LONGs and summed order-free (the x58
  *    convention); ranking orders by (integer score DESC, doc id ASC) —
  *    a total order, so exact-duplicate docs rank deterministically.
  */
object Retrieval {

  /** BM25 top-k: `queries` is (query_id, terms array<string>); returns
    * (query_id, rank, doc_id-named idCol, score) with rank 1..k over
    * (score DESC, id ASC) and score rounded to 6 dp. Docs matching no
    * query term score 0 and are not returned. k1 = 1.2, b = 0.75.
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      k: Int): DataFrame = {
    val toks = LangModel.tokenRows(docs, idCol, textCol)
    // doc length + corpus stats from the SAME tokenization; zero-token
    // docs count toward N and avgdl (they can never match, but they are
    // corpus members)
    val lens = docs.select(col(idCol).as("id"))
      .join(toks.groupBy(col("id")).agg(count(lit(1)).as("len")), Seq("id"), "left")
      .na.fill(0L, Seq("len"))
    val stats = lens.agg(count(lit(1)).as("nd"), sum(col("len")).as("tl"))
      .select(col("nd"), (col("tl").cast("double") / col("nd").cast("double")).as("avgdl"))
    // distinct per (query, term): a repeated term in a query's array
    // must not double its BM25 contribution (query-side tf is not part
    // of these semantics — the oracle scores each term once)
    val qt = queries.select(col("query_id"), explode(col("terms")).as("w"))
      .distinct()
    // prune the corpus token stream to the query vocabulary BEFORE any
    // counting — this join is the narrow gate everything else rides
    // behind. It is deliberately UN-hinted (the LangModel.perplexityScore
    // convention): at any query set whose vocab fits a broadcast, Spark's
    // size estimate + AQE still pick a broadcast hash join, but a massive
    // query log degrades to a shuffle join on w instead of OOMing the
    // driver — an explicit broadcast() hint would be honored regardless
    // of size. df_ and qt are the same query-scaled class, so they stay
    // un-hinted too; only the 1-row corpus stats keep their hint.
    val qVocab = qt.select(col("w")).distinct()
    val matched = toks.join(qVocab, Seq("w"))
    val tf = matched.groupBy(col("id"), col("w")).agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(df_, Seq("w"))
      .join(qt, Seq("w"))
      .join(lens, Seq("id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0d) +
        (col("nd").cast("double") - col("df").cast("double") + lit(0.5d)) /
          (col("df").cast("double") + lit(0.5d))))
      .withColumn("tfn",
        (col("tf").cast("double") * lit(2.2d)) /
          (col("tf").cast("double") + lit(1.2d) *
            (lit(0.25d) + lit(0.75d) * (col("len").cast("double") / col("avgdl")))))
      .withColumn("p9", round(col("idf") * col("tfn") * lit(1e9d), 0).cast("long"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("p9")).as("s9"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("s9").desc, col("id"))
    scored
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as(idCol),
        round(col("s9").cast("double") / lit(1e9d), 6).as("score"))
  }

  /** Pseudo-relevance-feedback query expansion (Rocchio 1971, the
    * tf-idf-weighted RM-style variant in public IR texts): run BM25,
    * treat each query's top `kFeedback` docs as relevant, pick the
    * `mTerms` highest tf-idf terms from that feedback set (originals
    * excluded), append them to the query, and re-run BM25 — the classic
    * recall lever for short audit queries whose one or two literal
    * terms miss paraphrased matches.
    *
    * 100 TB design: every intermediate is feedback-scaled, never
    * corpus-scaled — the feedback token pass semi-joins the token
    * stream against O(queries × kFeedback) doc ids, candidate-term df
    * counts only the candidate vocabulary's postings (the same pruned-
    * posting gate bm25 itself rides), and term selection is a
    * WindowGroupLimit top-m over O(queries × feedback vocab). The two
    * BM25 rounds each keep their own scale path.
    *
    * Determinism: term weights are 1e-9 fixed-point LONGs
    * (round(idf · feedback-tf · 1e9), the bm25 partial convention) and
    * selection orders by (weight DESC, term ASC) — a total order, so
    * the expanded query set is engine-portable and the whole pipeline
    * oracles exactly.
    */
  def prfExpand(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      kFeedback: Int,
      mTerms: Int,
      k: Int): DataFrame = {
    require(kFeedback >= 1 && mTerms >= 1 && k >= 1,
      s"prfExpand: kFeedback=$kFeedback, mTerms=$mTerms, k=$k")
    val base = bm25TopK(docs, idCol, textCol, queries, kFeedback)
    val toks = LangModel.tokenRows(docs, idCol, textCol)
    val fb = base.select(col("query_id"), col(idCol).as("id"))
    val ft = toks.join(fb, Seq("id"))
      .groupBy(col("query_id"), col("w")).agg(count(lit(1)).as("ftf"))
    val qt = queries.select(col("query_id"), explode(col("terms")).as("w"))
      .distinct()
    val cand = ft.join(qt, Seq("query_id", "w"), "left_anti")
    val cv = cand.select(col("w")).distinct()
    val dfc = toks.join(cv, Seq("w")).select(col("id"), col("w")).distinct()
      .groupBy(col("w")).agg(count(lit(1)).as("df"))
    val nd = docs.agg(count(lit(1)).as("nd"))
    val weighted = cand.join(dfc, Seq("w")).crossJoin(broadcast(nd))
      .withColumn("w9", round(
        log(lit(1.0d) +
          (col("nd").cast("double") - col("df").cast("double") + lit(0.5d)) /
            (col("df").cast("double") + lit(0.5d))) *
          col("ftf").cast("double") * lit(1e9d), 0).cast("long"))
    val byQ = Window.partitionBy(col("query_id"))
      .orderBy(col("w9").desc, col("w"))
    val extra = weighted.withColumn("__rn", row_number().over(byQ))
      .filter(col("__rn") <= mTerms).select(col("query_id"), col("w"))
    val expanded = qt.unionByName(extra)
      .groupBy(col("query_id")).agg(collect_list(col("w")).as("terms"))
    bm25TopK(docs, idCol, textCol, expanded, k)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) of any
    * number of per-query ranked lists — the standard hybrid-retrieval
    * combiner (BM25 ⊕ dense ANN) that needs no score calibration, only
    * ranks. Each list contributes floor(10¹² / (rrfK + rank)) to the
    * item's fused score — the exact-integer fixed-point image of the
    * paper's 1/(k+rank), so fused ranking is engine-portable; ties break
    * on the item id.
    *
    * 100 TB design: fusion's inputs are ALREADY per-query top-k lists
    * (each produced by its retriever's own scale path — BM25's pruned
    * postings, ANN's two-stage top-k), so the union is
    * O(queries × k × lists) rows — corpus-size-independent; one
    * map-side-combined groupBy on (query, id) and a WindowGroupLimit-
    * pushed per-query top-k finish it.
    *
    * @param lists each (query_id, rank, `idCol`); ranks 1-based
    * @return (query_id, rank, `idCol`, rrf_fp) — fused top-k per query
    *         by (summed integer score desc, id asc)
    */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, k: Int, rrfK: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse: need at least one ranked list")
    val contrib = lists.map(_.select(col("query_id"), col(idCol).as("id"),
      expr(s"1000000000000L div (${rrfK}L + CAST(rank AS LONG))").as("c")))
    val fused = contrib.reduce(_.unionByName(_))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("c")).as("rrf_fp"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_fp").desc, col("id"))
    fused.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as(idCol), col("rrf_fp"))
  }

  /** Cross-encoder RERANKING of a fused candidate list — the last stage
    * of the standard retrieve → fuse → rerank pipeline (the production
    * RAG shape: cheap retrievers propose, an expensive pairwise model
    * reorders the short list). The SCORER is STUBBED deterministically
    * (this container has no model runtime — the [[Multimodal.decodeStub]]
    * / x191 convention): score = the 48-bit integer image of
    * md5(query_id || '|' || text), so the whole rerank oracles
    * bit-for-bit; swap the body of the batch scorer for a real
    * cross-encoder session in deployment. The Spark-side shape is the
    * production one and is the point:
    *  - the candidates are ALREADY per-query top-k lists (corpus-size-
    *    independent), and the doc-text fetch is CANDIDATE-PRUNED (one
    *    left-semi join before the text columns are touched — the model
    *    never sees a non-candidate row);
    *  - scoring is ONE mapPartitions pass: model state initialized ONCE
    *    per partition, rows fed in `batchSize` groups (one "encoder
    *    call" per group — exactly where a real session amortizes);
    *  - a per-query window takes the reranked top-k (ties on id).
    * Output: (query_id, rank, idCol, score48).
    */
  def rerankStub(
      candidates: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      topK: Int,
      batchSize: Int = 32): DataFrame = {
    require(topK > 0 && batchSize > 0, s"rerankStub: topK=$topK batchSize=$batchSize")
    val spark = candidates.sparkSession
    import spark.implicits._
    // materialized: `cand` feeds BOTH the text prune and the scoring
    // join, and upstream is the whole retrieval+fusion pipeline — the
    // per-query top-k list is tiny, the pipeline is not
    val cand = Dedup.materialize(candidates
      .select(col("query_id").cast("string").as("q"), col(idCol).cast("long").as("id"))
      .distinct())
    val texts = docs
      .select(col(idCol).cast("long").as("id"), coalesce(col(textCol), lit("")).as("t"))
      .join(cand.select(col("id")).distinct(), Seq("id"), "left_semi")
    // LEFT join: a candidate id with no docs row (a retriever index
    // newer than the doc snapshot) must not silently shorten that
    // query's reranked list — it scores like a null-text doc and stays
    // rankable, the same coalesce the null-text path takes
    val scored = cand.join(texts, Seq("id"), "left")
      .select(col("q"), col("id"), coalesce(col("t"), lit("")).as("t"))
      .as[(String, Long, String)]
      .mapPartitions { it =>
        // real impl: load the cross-encoder session ONCE here
        val md = java.security.MessageDigest.getInstance("MD5")
        it.grouped(batchSize).flatMap { batch =>
          // real impl: ONE batched model call over `batch`
          batch.map { case (q, id, t) =>
            val hex = md.digest((q + "|" + t).getBytes("UTF-8"))
              .map(b => f"$b%02x").mkString
            (q, id, java.lang.Long.parseLong(hex.substring(0, 12), 16))
          }
        }
      }.toDF("query_id", "id", "score48")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score48").desc, col("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("id").as(idCol), col("score48"))
  }

  /** nDCG@k of an approximate ranking against an exact one — the
    * POSITION-SENSITIVE quality audit next to the recall audits
    * (x144/x145 count hits; nDCG also charges for returning them in
    * the wrong order, the metric ANN papers actually report). Graded
    * relevance from the exact ranking: gain(item at exact rank i) =
    * k+1−i; DCG = Σ_{approx pos p of a relevant item} gain·disc(p)
    * with disc(p) = 1/log₂(p+1); IDCG = the same sum over the exact
    * list itself (its items in its own order — the best achievable),
    * so nDCG = 1 iff the approx list reproduces the exact one.
    *
    * Determinism: gains and positions are exact integers; each
    * gain·disc term fixed-points at 1e-9 (LONG, order-free sum —
    * discounts are O(1) values, so libm's 1-ulp wobble is 7 orders
    * below the rounding grid); nDCG is one division of two exact sums,
    * rounded 6 dp. Both inputs are (query_id, rank, idName) top-k
    * lists; output (query_id, n_hit, ndcg) — O(queries × k) at every
    * step past the input joins.
    */
  def ndcgAtK(
      exact: DataFrame,
      approx: DataFrame,
      idName: String,
      k: Int): DataFrame = {
    require(k >= 1, s"ndcgAtK: k=$k")
    def term9(gain: org.apache.spark.sql.Column, pos: org.apache.spark.sql.Column) =
      round(gain.cast("double") * (lit(1e9d) /
        (log(pos.cast("double") + lit(1.0d)) / lit(math.log(2.0)))), 0)
        .cast("long")
    val rel = exact.select(col("query_id"), col(idName),
      (lit(k + 1L) - col("rank")).as("__g"), col("rank").as("__er"))
    val idcg = rel.groupBy(col("query_id"))
      .agg(sum(term9(col("__g"), col("__er"))).as("__idcg9"))
    val dcg = approx
      .join(rel.drop("__er"), Seq("query_id", idName), "left")
      .groupBy(col("query_id"))
      .agg(count(col("__g")).as("n_hit"),
        coalesce(sum(term9(coalesce(col("__g"), lit(0L)), col("rank"))),
          lit(0L)).as("__dcg9"))
    dcg.join(idcg, Seq("query_id"))
      .select(col("query_id"), col("n_hit"),
        round(col("__dcg9").cast("double") / col("__idcg9").cast("double"), 6)
          .as("ndcg"))
  }
}
