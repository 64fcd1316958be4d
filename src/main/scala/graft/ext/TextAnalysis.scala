package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (extension surface,
  * SURVEY.md §2.12): quality scoring, token counting, language ID,
  * document fingerprinting. All expression-only (whole-stage codegen);
  * every op is a narrow per-row map — zero shuffles, linear scale-out.
  */
object TextAnalysis {

  /** Word-ish tokens: runs of letters/digits, lowercased. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Count of punctuation characters (non-alnum, non-whitespace). */
  def punctCharCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))).cast("long")

  /** BPE-ish subword count approximation: alnum runs count ceil(len/4)
    * pieces (a 4-chars-per-token heuristic), punctuation chars count 1 each.
    */
  def approxBpeTokenCount(text: Column): Column = {
    val alnumPieces = aggregate(tokens(text), lit(0L),
      (acc, t) => acc + ceil(length(t).cast("double") / 4.0d).cast("long"))
    alnumPieces + punctCharCount(text)
  }

  def wordCount(text: Column): Column = size(tokens(text)).cast("long")

  def avgWordLen(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0d)).otherwise(
      aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") / size(t).cast("double"))
  }

  /** Ratio of non-alphanumeric, non-space chars to total chars. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0d)).otherwise(
      (length(text) - length(regexp_replace(text, "[^A-Za-z0-9 ]", ""))).cast("double")
        / length(text).cast("double"))

  val StopwordsEn: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "to", "in", "is", "on", "for", "with",
    "as", "by", "at", "be", "this", "that", "it", "from", "or", "are", "was")

  def stopwordRatio(text: Column, stopwords: Seq[String] = StopwordsEn): Column = {
    val t = tokens(text)
    val swCount = size(filter(t, x => x.isin(stopwords: _*)))
    when(size(t) === 0, lit(0.0d))
      .otherwise(swCount.cast("double") / size(t).cast("double"))
  }

  /** Composite quality score in [0,1]: rewards mid-length docs, presence of
    * stopwords, low punctuation density. A deterministic heuristic in the
    * spirit of C4/Gopher quality filters (public recipes), not a model.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0d, lit(1.0d))
    val swScore = least(stopwordRatio(text) * 4.0d, lit(1.0d))
    val punctPenalty = greatest(lit(0.0d), lit(1.0d) - punctRatio(text) * 5.0d)
    round((lenScore + swScore + punctPenalty) / 3.0d, 6)
  }

  /** Language-ID by marker-token voting: score = |tokens ∩ markers(lang)|
    * per language; argmax wins, ties broken by language code, docs with no
    * marker hit → "und". N-gram/stopword heuristics in the public-langid
    * tradition; marker sets are deliberately tiny and auditable.
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "for", "with", "this", "are"),
    "es" -> Seq("el", "la", "de", "que", "los", "una", "por", "del", "las", "es"),
    "fr" -> Seq("le", "les", "des", "une", "est", "dans", "pour", "que", "sur", "avec"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "für", "auf"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  def langId(text: Column, markers: Map[String, Seq[String]] = LangMarkers): Column = {
    val t = tokens(text)
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      struct(size(array_intersect(t, array(ms.map(lit): _*))).as("score"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*)) // struct max: by score then lang
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Exact content fingerprint: md5 of whitespace-normalized lowercase text. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Order-insensitive (bag-of-words) fingerprint: md5 over sorted tokens —
    * catches shuffled/near-identical docs that exact md5 misses.
    */
  def bagFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(tokens(text))))

  /** Polynomial rolling hash h = Σ h*31 + codepoint(char), mod the largest
    * prime below 2^57 (2^57-13). The modulus bound is what makes the step
    * overflow-safe under ANSI mode: acc < 2^57 after each pmod, so
    * acc*31 + c ≤ 31·(2^57-14) + c < 2^62 never overflows Long.
    * Deterministic, locality-free content hash usable as a shard key.
    */
  val RollingHashMod = 144115188075855859L // largest prime < 2^57

  def rollingHash(text: Column): Column =
    aggregate(filter(split(text, ""), ch => ch =!= ""), lit(0L),
      (acc, ch) => pmod(acc * 31L + coalesce(ascii(ch).cast("long"), lit(0L)), lit(RollingHashMod)))

  /** Deterministic 16-bit bucket from md5 of a key — reproducible sampling
    * and sharding (sample = bucket < fraction·65536) that any engine with
    * md5 can replicate, unlike rand()/TABLESAMPLE. Narrow per-row map.
    */
  def md5Bucket(key: Column): Column =
    shiftright(org.apache.spark.sql.graftfn.HashExpressions.md5Prefix48(key.cast("string")), 32)

  /** Per-doc repeated n-gram statistics — the Gopher-style repetition
    * signal (public Rae et al. 2021 quality heuristics): machine-generated
    * and boilerplate text repeats its own n-grams far more than prose.
    * Returns (id, ngrams_total, ngrams_distinct, top_ngram_count,
    * dup_ngram_ratio = (total - distinct) / total). Docs shorter than n
    * words have no n-grams and emit no row.
    *
    * Relational hot path (explode + lead window via
    * [[Dedup.shingleRows]] non-distinct, then two codegen'd aggregations
    * with map-side combine) — NOT array HOFs, which are CodegenFallback.
    * The ratio is a single division of exactly-counted ints, bit-identical
    * across engines.
    */
  def repeatedNgramStats(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    Dedup.shingleRows(df, idCol, textCol, n, distinct = false)
      .groupBy(col("id"), col("s")).agg(count(lit(1)).as("__c"))
      .groupBy(col("id")).agg(
        sum(col("__c")).cast("long").as("ngrams_total"),
        count(lit(1)).as("ngrams_distinct"),
        max(col("__c")).as("top_ngram_count"))
      .withColumn("dup_ngram_ratio",
        (col("ngrams_total") - col("ngrams_distinct")).cast("double")
          / col("ngrams_total").cast("double"))

  /** C4/Gopher-style composite quality gate: evaluates five deterministic
    * rules and returns the input plus `fail_mask` (bit i set = rule i
    * failed) and `keep` (mask == 0). Keeping the per-rule bits — not just
    * the boolean — is what lets a pipeline report WHY documents were
    * dropped, tune one rule without re-running the rest, and audit the
    * kill distribution per source.
    *
    * Rules (bit): 0 word count outside [10, 5000]; 1 stopword ratio <
    * 0.05; 2 punctuation ratio > 0.2; 3 mean word length outside [2, 12];
    * 4 marker-vote [[langId]] disagrees with the declared language column
    * (metadata-consistency check — mislabeled language is a top corpus
    * defect; null-safe, so a doc with NO declared language fails the
    * rule rather than slipping through as "consistent"). Narrow per-row
    * map, zero shuffles.
    */
  def qualityGate(df: DataFrame, textCol: String, langCol: String): DataFrame = {
    val text = col(textCol)
    val rules: Seq[Column] = Seq(
      !wordCount(text).between(10L, 5000L),
      stopwordRatio(text) < 0.05d,
      punctRatio(text) > 0.2d,
      !avgWordLen(text).between(2.0d, 12.0d),
      !(langId(text) <=> col(langCol)))
    val mask = rules.zipWithIndex.foldLeft(lit(0L)) { case (acc, (r, i)) =>
      acc + when(r, lit(1L << i)).otherwise(lit(0L))
    }
    df.withColumn("fail_mask", mask).withColumn("keep", col("fail_mask") === 0L)
  }

  /** Vocabulary coverage curve: for each cutoff K, the fraction of all
    * corpus token OCCURRENCES covered by the K most frequent token
    * types — the tokenizer-sizing diagnostic ("how big must the vocab
    * be before <unk> is rare"). Token counting is one shuffle with
    * map-side combine to O(vocab) rows; the global top-K runs through
    * [[Sampling.scoredTopK]]'s salted two-stage exact top-k (no full
    * vocab ever sorts on one reducer); the cutoff join touches only the
    * ≤ max(cutoffs) selected rows. Ranking order (count DESC, token
    * ASC) is total, so ties are engine-stable. Output: (k, n_vocab,
    * total_tokens, coverage 6 dp).
    */
  def vocabCoverage(
      df: DataFrame,
      idCol: String,
      textCol: String,
      cutoffs: Seq[Int]): DataFrame = {
    require(cutoffs.nonEmpty && cutoffs.forall(_ > 0), s"bad cutoffs: $cutoffs")
    val counts = LangModel.tokenRows(df, idCol, textCol)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(sum(col("cnt")).as("total_tokens"),
      count(lit(1)).as("n_vocab"))
    val top = Sampling.scoredTopK(counts, "w", col("cnt").cast("double"), cutoffs.max)
    val cuts = top.sparkSession.range(1)
      .select(explode(array(cutoffs.map(lit): _*)).as("k"))
    top.join(broadcast(cuts), col("sel_rank") <= col("k"))
      .groupBy(col("k")).agg(sum(col("cnt")).as("__top"))
      .crossJoin(broadcast(stats))
      .select(col("k"), col("n_vocab"), col("total_tokens"),
        round(col("__top").cast("double") / col("total_tokens").cast("double"), 6)
          .as("coverage"))
  }

  /** Per-group quality-gate yield report: where does each source's data
    * die? One row per group with total docs, survivors, a per-rule
    * failure count (a doc failing several rules counts in each — the
    * auditable kill distribution [[qualityGate]]'s fail bits exist for),
    * and the survivor fraction. The curation dashboard that says "source
    * X lost 40% to language mismatch" before anyone retrains a filter.
    *
    * Shape: the gate itself is a narrow per-row expression map; the
    * rollup is ONE shuffle with map-side combine to O(groups) rows.
    */
  def qualityFunnel(
      df: DataFrame,
      textCol: String,
      langCol: String,
      groupCol: String): DataFrame = {
    val g = qualityGate(df, textCol, langCol)
    def bit(b: Long) = sum(
      when(col("fail_mask").bitwiseAND(lit(b)) =!= 0L, 1L).otherwise(0L))
    g.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
        bit(1L).as("fail_len"), bit(2L).as("fail_stopword"),
        bit(4L).as("fail_punct"), bit(8L).as("fail_wordlen"),
        bit(16L).as("fail_lang"))
      .withColumn("yield_frac",
        round(col("n_keep").cast("double") / col("n_docs").cast("double"), 6))
  }

  /** Pointwise mutual information between token types co-occurring in
    * the same document (document-frequency PMI — the classic word-
    * association statistic; Church & Hanks 1990): for each unordered
    * token-type pair (a, b), pmi = ln(df_ab · N / (df_a · df_b)) where
    * df_x is the number of documents containing x and N the number of
    * documents with ≥1 token. Positive PMI = the pair co-occurs more
    * than independence predicts — the collocation / template signal a
    * corpus-curation pass uses to spot boilerplate phrases and topic
    * clusters.
    *
    * Scale shape: pair candidates come from a PER-DOCUMENT self-join on
    * the distinct (doc, token) postings — candidate volume Σ_doc v²
    * with v = distinct token types per doc (bounded by doc length), so
    * cost is linear in corpus size, never vocab². One (pair) shuffle
    * with map-side combine aggregates candidates to O(pairs) rows; the
    * df table and doc count are O(vocab)/O(1) broadcasts. Pairs below
    * `minPairDocs` support are dropped (rare-pair PMI is noise — and
    * unbounded output).
    *
    * Determinism: df counts are exact integers; the PMI is one double
    * division + ln, rounded to 6 dp (the x21 convention — ln is not
    * correctly rounded, so rounded values are the comparable surface).
    * Output: (tok_a, tok_b, n_ab, pmi) with tok_a < tok_b.
    */
  def pmiPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minPairDocs: Long = 2L): DataFrame = {
    require(minPairDocs >= 1L, s"minPairDocs must be >= 1, got $minPairDocs")
    // materialized: posts feeds FOUR consumers (df counts, doc count,
    // both self-join sides) — the x05 multi-consumer rule; without it
    // the tokenize+explode pass recomputes per consumer
    val posts = Dedup.materialize(df
      .select(col(idCol).as("id"),
        explode(array_distinct(tokens(col(textCol)))).as("w")))
    val dfTok = posts.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val nDocs = posts.agg(countDistinct(col("id")).as("nd"))
    val pairs = posts.as("a")
      .join(posts.as("b"), col("a.id") === col("b.id") && col("a.w") < col("b.w"))
      .select(col("a.w").as("tok_a"), col("b.w").as("tok_b"))
      .groupBy(col("tok_a"), col("tok_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairDocs)
    pairs
      .join(broadcast(dfTok.select(col("w").as("tok_a"), col("df").as("__da"))), "tok_a")
      .join(broadcast(dfTok.select(col("w").as("tok_b"), col("df").as("__db"))), "tok_b")
      .crossJoin(broadcast(nDocs))
      .select(col("tok_a"), col("tok_b"), col("n_ab"),
        round(log((col("n_ab") * col("nd")).cast("double") /
          (col("__da") * col("__db")).cast("double")), 6).as("pmi"))
  }

  /** Hashed-feature linear text classifier INFERENCE (the fastText /
    * hashing-trick shape quality filters ship as: CCNet's fastText
    * quality model, Gopher's rule+model gates). Token → md5 48-bit
    * bucket in [0, dim); the bucket's weight derives from a SECOND hash
    * of the bucket id — w_fp3(b) = hex48(md5("w<b>")) mod 2001 − 1000, a
    * 1e-3 fixed-point weight in [−1, 1] — so scoring needs NO weight
    * table at all (a trained model would broadcast its dim-sized vector;
    * the hash stands in as a deterministic fixture both engines can
    * rebuild). Doc score = Σ token weights, an exact LONG sum.
    *
    * 100 TB design: the entire model application is a narrow map
    * (tokenize → hash → hash again) followed by ONE map-side-combined
    * groupBy on the doc id — no join, no broadcast, no shuffle beyond
    * the id aggregation; whole-stage codegen end to end.
    *
    * Output: (idCol, n_toks, score_fp3, pred) for docs with ≥1 token;
    * `pred` = score_fp3 > 0.
    */
  def hashedLinearScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      dim: Int = 1024): DataFrame = {
    val toks = LangModel.tokenRows(df, idCol, textCol)
    import org.apache.spark.sql.graftfn.HashExpressions.md5Prefix48
    val b = pmod(md5Prefix48(col("w")), lit(dim.toLong))
    val wfp3 = pmod(md5Prefix48(concat(lit("w"), b.cast("string"))),
      lit(2001L)) - lit(1000L)
    toks.select(col("id"), wfp3.as("wf"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("wf")).as("score_fp3"))
      .select(col("id").as(idCol), col("n_toks"), col("score_fp3"),
        (col("score_fp3") > 0L).as("pred"))
  }

  /** Class-based TF-IDF topic terms (Grootendorst 2022's c-TF-IDF, the
    * public BERTopic labeling recipe): given a document→class
    * assignment (any classing — k-means clusters, sources, languages),
    * rank each class's most DISTINCTIVE terms by
    * W(t, c) = tf(t, c) · ln(1 + A / f(t)), where tf(t, c) is the
    * term's frequency within the class, f(t) its frequency across all
    * classed docs, and A the average token count per class. The
    * human-readable name a semantic cluster gets in a data card.
    *
    * 100 TB shape: one token pass → one map-side-combined (class,
    * term) count; everything after rides that O(distinct class-term)
    * table (f(t) and A are its rollups, A broadcast as one row); the
    * per-class top-k is a WindowGroupLimit-pushed rank filter. Scores
    * are fixed-point 1e-9 LONGs before ranking (the BM25 convention) —
    * engine-portable ordering with (score DESC, term ASC) total order.
    *
    * @param classes (idCol, classCol) — one class per doc; unclassed
    *                docs drop (they are outside every class's corpus)
    * @return (classCol, rank, term, ctfidf) — top `topK` per class
    */
  def classTopTerms(
      docs: DataFrame,
      classes: DataFrame,
      idCol: String,
      textCol: String,
      classCol: String,
      topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = LangModel.tokenRows(docs, idCol, textCol)
      .join(classes.select(col(idCol).as("id"), col(classCol).as("cls")),
        Seq("id"))
    val tfc = toks.groupBy(col("cls"), col("w")).agg(count(lit(1)).as("tf"))
    val ft = tfc.groupBy(col("w")).agg(sum(col("tf")).as("ft"))
    val avgw = tfc.groupBy(col("cls")).agg(sum(col("tf")).as("cw"))
      .agg(sum(col("cw")).as("tw"), count(lit(1)).as("nc"))
      .select((col("tw").cast("double") / col("nc").cast("double")).as("avgw"))
    val scored = tfc.join(ft, Seq("w")).crossJoin(broadcast(avgw))
      .withColumn("s9", round(col("tf").cast("double") *
        log(lit(1.0d) + col("avgw") / col("ft").cast("double")) * lit(1e9d), 0)
        .cast("long"))
    val w = Window.partitionBy(col("cls")).orderBy(col("s9").desc, col("w"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select(col("cls").as(classCol), col("rank"), col("w").as("term"),
        round(col("s9").cast("double") / lit(1e9d), 6).as("ctfidf"))
  }

  /** One-call document profile used by pipeline pruning. */
  def profile(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("word_count", wordCount(col(textCol)))
      .withColumn("avg_word_len", avgWordLen(col(textCol)))
      .withColumn("punct_ratio", punctRatio(col(textCol)))
      .withColumn("stopword_ratio", stopwordRatio(col(textCol)))
      .withColumn("quality_score", qualityScore(col(textCol)))
      .withColumn("lang_pred", langId(col(textCol)))
      .withColumn("fingerprint", fingerprint(col(textCol)))

  /** Zipf-law fit per group — the vocabulary-health profile (a natural
    * corpus follows freq ∝ rank^s with s ≈ −1; boilerplate, template
    * spam, or synthetic text bends the rank–frequency line, so the
    * fitted slope and r² are a cheap corpus-QA gate). OLS of ln(freq)
    * on ln(rank) over the TOP `topK` ranks (the standard fit window —
    * the tail is sampling noise; bounding K also bounds every
    * accumulator below at ANY corpus size).
    *
    * Determinism: ranks are exact (`row_number` over (count DESC, word)
    * — ASCII token tie-break, binary-collation-identical in both
    * engines); each ln rounds to a 1e-6 fixed-point LONG (safely above
    * libm's 1-ulp wobble), the five OLS sums are exact LONGs (bounded
    * by K·ln(maxCount)²·1e12 — long-safe for counts past 1e12), and the
    * slope/intercept/r² combinations are pinned-order double
    * expressions on those exact sums, rounded to 6 dp. Groups with a
    * degenerate fit (< 2 ranks or zero x-variance) emit NULL stats
    * rather than NaN.
    *
    * Scale shape: one map-side-combined (group, word) count, one
    * windowed top-K per group over the O(vocabulary) table, then
    * O(groups × K) fit rows. Output:
    * (groupCol, n_ranks, zipf_slope, intercept, r2).
    */
  def zipfFit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      topK: Int = 1000): DataFrame =
    zipfFitFromCounts(
      LangModel.tokenRowsBy(df, idCol, textCol, Seq(groupCol))
        .groupBy(col(groupCol), col("w"))
        .agg(count(lit(1)).as("cnt")),
      groupCol, topK)

  /** [[zipfFit]] from a prebuilt (groupCol, w, cnt) table — the
    * maintained-vocabulary path ([[Bpe.vocabFromStore]] with byCols):
    * the fit reads O(vocabulary) store state, never the corpus.
    */
  def zipfFitFromCounts(
      cnts0: DataFrame,
      groupCol: String,
      topK: Int = 1000): DataFrame = {
    require(topK >= 2, s"zipfFit: topK=$topK")
    import org.apache.spark.sql.expressions.Window
    val cnts = cnts0.select(col(groupCol).as("g"), col("w"), col("cnt"))
    val ranked = cnts
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("cnt").desc, col("w"))))
      .filter(col("rnk") <= topK)
    val x6 = round(log(col("rnk").cast("double")) * lit(1e6d), 0).cast("long")
    val y6 = round(log(col("cnt").cast("double")) * lit(1e6d), 0).cast("long")
    olsLogLog(ranked.select(col("g"), x6.as("x6"), y6.as("y6")),
      "slope" -> "zipf_slope")
      .select(col("g").as(groupCol), col("n_ranks"),
        col("zipf_slope"), col("intercept"), col("r2"))
  }

  /** The shared log–log OLS rollup over (g, x6, y6) rows (1e-6
    * fixed-point lns): exact LONG sums, pinned-order double
    * combinations, NULL (not NaN) stats on degenerate fits. Output:
    * (g, n_ranks, <slopeName>, intercept, r2) — used by [[zipfFit]]
    * (rank–frequency) and [[heapsFit]] (token–vocabulary growth).
    */
  private def olsLogLog(
      pts: DataFrame,
      slopeAlias: (String, String)): DataFrame = {
    val s = pts.groupBy(col("g"))
      .agg(count(lit(1)).as("n_ranks"),
        sum(col("x6")).as("sx"), sum(col("y6")).as("sy"),
        sum(col("x6") * col("x6")).as("sxx"),
        sum(col("x6") * col("y6")).as("sxy"),
        sum(col("y6") * col("y6")).as("syy"))
    val nD = col("n_ranks").cast("double")
    val num = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val den = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val den2 = nD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    val ok = col("n_ranks") >= 2L && den =!= 0.0d
    s.select(col("g"), col("n_ranks"),
      when(ok, round(num / den, 6)).as(slopeAlias._2),
      when(ok, round((col("sy").cast("double") - (num / den) *
        col("sx").cast("double")) / nD / lit(1e6d), 6)).as("intercept"),
      when(ok && den2 =!= 0.0d,
        round((num * num) / (den * den2), 6)).as("r2"))
  }

  /** Heaps'-law fit over a DAY-KEYED vocabulary store's growth curve —
    * the companion corpus-health panel to [[zipfFit]]: V(N) ≈ K·N^β
    * (β ≈ 0.4–0.6 on natural text; β near 1 means the vocabulary grows
    * as fast as the corpus — template ids, hashes, or spam). Points
    * are the store's day-ordered prefixes: N_d = cumulative token
    * count, V_d = cumulative distinct words first seen by day d; the
    * fit is the shared log–log OLS (slope = β, e^intercept = K).
    *
    * Input: a [[Bpe.vocabAppendDay]] store's rows (w, cnt, day), day
    * names ordering chronologically (zero-padded). Everything past the
    * store read is O(vocabulary): first-seen day per word, one
    * O(days) cumulative join, O(days) fit points. Output: one row
    * (n_points, heaps_beta, intercept, r2).
    */
  def heapsFit(vocabDays: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDay = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // O(days) rows after the two vocab-sized aggregations
    val toks = vocabDays.groupBy(col("day")).agg(sum(col("cnt")).as("__t"))
      .withColumn("n_cum", sum(col("__t")).over(byDay))
    val firsts = vocabDays.groupBy(col("w")).agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("__v"))
    val curve = toks.join(firsts, Seq("day"), "left")
      .withColumn("v_cum", sum(coalesce(col("__v"), lit(0L))).over(byDay))
    val pts = curve.select(lit("all").as("g"),
      round(log(col("n_cum").cast("double")) * lit(1e6d), 0).cast("long").as("x6"),
      round(log(col("v_cum").cast("double")) * lit(1e6d), 0).cast("long").as("y6"))
    olsLogLog(pts, "slope" -> "heaps_beta")
      .select(col("n_ranks").as("n_points"), col("heaps_beta"),
        col("intercept"), col("r2"))
  }
}
