package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{AsofJoin, Chunking, DataCard, Dedup, Dsir, Events, Graph, LangModel, MediaStore, Multimodal, Pq, Privacy, Profiling, Quantiles, Redaction, Retrieval, SampleStore, Sampling, Scd2, Sharding, Similarity, Sketches, TextAnalysis}

/** Extension-surface queries (SURVEY.md §2.12): dedup, similarity search,
  * text analysis, event-time windows, multimodal plumbing — each with a
  * DuckDB oracle unless the op is inherently approximate (x06/x11: the
  * blocking key depends on xxhash64, which DuckDB can't replicate — those
  * get rows-only checks).
  *
  * Determinism conventions shared with the oracles:
  *  - ratios are single divisions of exactly-computed integer counts
  *    (bit-identical across engines);
  *  - cosines are rounded to 6 dp AFTER identical-order double arithmetic;
  *  - event-time math runs on exact integer MICROSECONDS, resolved from
  *    the fixture's actual parquet encoding by [[graft.ext.Events
  *    .epochMicros]] (LONG nanos via the `nanosAsLong=true` compat read,
  *    or native TIMESTAMP(MICROS) — parquet's default); DuckDB oracles use
  *    the type-agnostic `epoch_us(ts)` and agree on either encoding.
  */
object ExtQueries {

  import CoreQueries.t

  private def dec2(c: Column): Column = c.cast("decimal(18,2)")

  // --- x01: exact-duplicate clusters via normalized content fingerprint --
  def x01ExactDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactClusters(
      t(spark, dir, "documents"),
      TextAnalysis.fingerprint(col("text")),
      col("doc_id"))

  val x01Sql: String =
    """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS dup_key,
       min(doc_id) AS keeper_id, count(*) AS dup_count
       FROM documents GROUP BY 1"""

  // --- x02: text quality profile (counts, ratios, fingerprint) ----------
  def x02TextProfile(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents").select(
      col("doc_id"),
      TextAnalysis.wordCount(col("text")).as("word_count"),
      TextAnalysis.avgWordLen(col("text")).as("avg_word_len"),
      TextAnalysis.punctRatio(col("text")).as("punct_ratio"),
      TextAnalysis.stopwordRatio(col("text")).as("stopword_ratio"),
      TextAnalysis.approxBpeTokenCount(col("text")).as("bpe_tokens"),
      TextAnalysis.fingerprint(col("text")).as("fingerprint"))

  val x02Sql: String =
    """WITH t AS (SELECT doc_id, text,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
       FROM documents)
       SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS word_count,
        CASE WHEN len(toks) = 0 THEN 0.0
             ELSE CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) END AS avg_word_len,
        CASE WHEN length(text) = 0 THEN 0.0
             ELSE CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) END AS punct_ratio,
        CASE WHEN len(toks) = 0 THEN 0.0
             ELSE CAST(len(list_filter(toks, x -> list_contains(['the','a','an','of','and','to','in','is','on','for','with','as','by','at','be','this','that','it','from','or','are','was'], x))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) END AS stopword_ratio,
        CAST(COALESCE(list_sum(list_transform(toks, x -> CAST(ceil(length(x) / 4.0) AS BIGINT))), 0)
             + length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS BIGINT) AS bpe_tokens,
        md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
       FROM t"""

  // --- x03: language ID by marker voting --------------------------------
  def x03LangId(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents").select(
      col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))

  val x03Sql: String =
    """WITH t AS (SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
       FROM documents),
       sc AS (
         SELECT doc_id, 'en' AS lang, len(list_filter(['the','and','of','to','is','that','for','with','this','are'], m -> list_contains(toks, m))) AS score FROM t
         UNION ALL SELECT doc_id, 'es', len(list_filter(['el','la','de','que','los','una','por','del','las','es'], m -> list_contains(toks, m))) FROM t
         UNION ALL SELECT doc_id, 'fr', len(list_filter(['le','les','des','une','est','dans','pour','que','sur','avec'], m -> list_contains(toks, m))) FROM t
         UNION ALL SELECT doc_id, 'de', len(list_filter(['der','die','das','und','ist','nicht','mit','ein','für','auf'], m -> list_contains(toks, m))) FROM t
         UNION ALL SELECT doc_id, 'zh', 0 FROM t),
       r AS (SELECT doc_id, lang, score,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn FROM sc)
       SELECT doc_id, CASE WHEN score > 0 THEN lang ELSE 'und' END AS lang_pred
       FROM r WHERE rn = 1"""

  // --- x04: MinHash+LSH near-dup pairs (verified with exact Jaccard) ----
  // The oracle is the EXACT all-pairs Jaccard (inverted index) — valid
  // because at threshold 0.7 with 32 bands × 2 rows the per-pair miss
  // probability is (1-s²)^32 ≤ 1e-23 for the fixture's s ≥ 0.9 dup pairs.
  def x04MinhashPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashPairs(t(spark, dir, "documents"), "doc_id", "text",
      shingleN = 3, bands = 32, rowsPerBand = 2, threshold = 0.7)

  /** Shared CTE chain computing exact all-pairs shingle Jaccard (inverted
    * index) — reused by the x04/x05 pair oracles and the x23 cluster
    * oracle. Ends with CTEs `inter` (id_a, id_b, i) and `sizes`.
    */
  private def jaccardCtes(n: Int): String = {
    val sliceHi = n - 1
    s"""w AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x <> '') AS ws FROM documents),
       sh0 AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(ws) - $sliceHi, 0) + 1), i -> array_to_string(ws[i:i+$sliceHi], ' '))) AS sh FROM w),
       sh AS (SELECT doc_id, sh FROM sh0 WHERE len(sh) > 0),
       posts AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
                 FROM posts a JOIN posts b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
       sizes AS (SELECT doc_id, len(sh) AS n FROM sh)"""
  }

  /** Recursive connected-components CTE chain over the exact 3-shingle
    * Jaccard pairs at `threshold` — appended after [[jaccardCtes]]
    * inside a WITH RECURSIVE. Defines pairs/edges/nodes/reach; each
    * caller adds its own min(r) rollup (labels vs cluster ids vs split
    * keys). ONE copy, because a subtle edit here (threshold, UNION vs
    * UNION ALL) must reach every components oracle at once.
    */
  private def componentCtes(threshold: Double): String =
    s"""pairs AS (
         SELECT id_a, id_b
         FROM inter JOIN sizes na ON na.doc_id = id_a
         JOIN sizes nb ON nb.doc_id = id_b
         WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= $threshold),
       edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                 UNION SELECT id_b, id_a FROM pairs),
       nodes AS (SELECT DISTINCT src AS id FROM edges),
       reach AS (
         SELECT id, id AS r FROM nodes
         UNION
         SELECT e.src AS id, reach.r AS r FROM reach JOIN edges e ON e.dst = reach.id)"""

  private def jaccardOracle(n: Int, threshold: Double): String =
    s"""WITH ${jaccardCtes(n)}
       SELECT id_a, id_b, CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) AS jaccard
       FROM inter JOIN sizes na ON na.doc_id = id_a JOIN sizes nb ON nb.doc_id = id_b
       WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= $threshold"""

  val x04Sql: String = jaccardOracle(3, 0.7)

  // --- x05: exact n-gram Jaccard pairs (inverted index) ------------------
  // 4-grams, not bigrams: the fixture vocabulary is ~30 words, so the
  // bigram universe is ~900 keys and every posting list is huge (the
  // inverted-index join would be quadratic); 4-gram postings are sparse.
  def x05NgramJaccardPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(t(spark, dir, "documents"), "doc_id", "text",
      shingleN = 4, threshold = 0.5, maxPostingLen = 1000000L)

  val x05Sql: String = jaccardOracle(4, 0.5)

  // --- x06: SimHash near-dup pairs (portable md5-nibble token hash) ------
  // Pigeonhole blocking has EXACT recall at maxDist=3, so the Spark result
  // is precisely "all pairs with hamming ≤ 3" — which the oracle computes
  // brute-force from the same md5-nibble simhash definition.
  def x06SimhashPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(t(spark, dir, "documents"), "doc_id", "text", maxDist = 3,
      portable = true)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))

  val x06Sql: String =
    """WITH toks AS (SELECT doc_id,
         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
       FROM documents),
       h AS (SELECT doc_id, md5(w) AS hx FROM toks),
       votes AS (SELECT doc_id, t.b,
           sum(CASE WHEN ((strpos('0123456789abcdef', substr(hx, 1 + CAST(t.b // 4 AS INT), 1)) - 1)
                          >> CAST(t.b % 4 AS INT)) & 1 = 1
               THEN 1 ELSE -1 END) AS v
         FROM h CROSS JOIN range(0, 64) t(b) GROUP BY 1, 2),
       bits AS (SELECT doc_id, b, CASE WHEN v > 0 THEN 1 ELSE 0 END AS bit FROM votes),
       pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS BIGINT) AS hamming
         FROM bits a JOIN bits b ON a.b = b.b AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
       SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3"""

  // --- x07: brute-force ANN top-k over embeddings ------------------------
  def x07AnnBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val data = t(spark, dir, "embeddings")
    Similarity.bruteForceTopK(data, data.filter(col("vec_id") < 8), "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  val x07Sql: String =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
       n AS (SELECT vec_id, ve, sqrt(list_sum(list_transform(ve, x -> x * x))) AS nrm FROM v),
       q AS (SELECT vec_id AS query_id, ve AS qv, nrm AS qn FROM n WHERE vec_id < 8),
       scored AS (SELECT q.query_id, c.vec_id AS neighbor_id,
           list_sum(list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * c.ve[i])) / (q.qn * c.nrm) AS cos
         FROM n c JOIN q ON c.vec_id <> q.query_id),
       r AS (SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM scored)
       SELECT query_id, rank, neighbor_id, round(cos, 6) AS cosine FROM r WHERE rank <= 10"""

  // --- x08: gap sessionization over the events feed ----------------------
  // Event-time math runs on exact integer MICROS regardless of the fixture's
  // parquet encoding — Events.epochMicros resolves LONG-nanos vs
  // TIMESTAMP(MICROS) by schema; DuckDB's `epoch_us(ts)` agrees either way.
  def x08SessionStats(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    Events.sessionStats(
      ev.withColumn("ts_us", Events.epochMicros(ev)),
      "user_id", "ts_us", gap = 30L * 60 * 1000000L, tsCol = "ts_us")
  }

  val x08Sql: String =
    """WITH x AS (SELECT user_id, epoch_us(ts) AS e FROM events),
       s AS (SELECT user_id, e,
         CASE WHEN lag(e) OVER (PARTITION BY user_id ORDER BY e) IS NULL
                OR e - lag(e) OVER (PARTITION BY user_id ORDER BY e) > 1800000000
              THEN 1 ELSE 0 END AS ns FROM x),
       g AS (SELECT user_id, e,
         sum(ns) OVER (PARTITION BY user_id ORDER BY e ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq FROM s)
       SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
              min(e) AS session_start, max(e) AS session_end,
              count(*) AS n_events
       FROM g GROUP BY user_id, session_seq"""

  // --- x09: tumbling event-time window (hour buckets, exact int math) ----
  def x09TumblingWindow(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    ev.withColumn("ts_us", Events.epochMicros(ev))
      .groupBy(expr("ts_us div 3600000000").as("hour_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).cast("double").as("total_value"))
  }

  val x09Sql: String =
    """SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
       FROM events GROUP BY 1, 2"""

  // --- x10: multimodal metadata over an opaque binary column -------------
  def x10MultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.withMeta(
      t(spark, dir, "documents").select(col("doc_id"), col("text").cast("binary").as("blob")),
      "blob")
      .select(col("doc_id"), col("byte_len"), col("digest"), col("magic"))

  val x10Sql: String =
    """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       md5(text) AS digest,
       upper(substr(hex(encode(text)), 1, 8)) AS magic
       FROM documents"""

  // --- x11: IVF ANN (bucket-pruned). Approximate relative to brute force,
  // but DETERMINISTIC: assignment, probing, and ranking are all exact
  // argmax/top-k with total-order tie-breaks, so DuckDB can replicate the
  // whole pipeline and the result is fully oracled.
  def x11AnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val data = t(spark, dir, "embeddings")
    val centroids = data.filter(col("vec_id") % 50 === 0)
    val assigned = Similarity.ivfAssign(data, centroids, "vec_id", "embedding")
    Similarity.ivfTopK(assigned, centroids, data.filter(col("vec_id") < 8),
      "vec_id", "embedding", k = 10, nprobe = 3)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Shared CTE chain: normalized vectors `n`, centroids `c`, and the
    * argmax-cosine centroid assignment `asg` — reused by the x11 probe
    * oracle and the x27 blocked-dedup oracle.
    */
  private val ivfCtes: String =
    """v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
       n AS (SELECT vec_id, ve, sqrt(list_sum(list_transform(ve, x -> x * x))) AS nrm FROM v),
       c AS (SELECT vec_id AS centroid_id, ve AS cv, nrm AS cn FROM n WHERE vec_id % 50 = 0),
       asg0 AS (SELECT n.vec_id, c.centroid_id,
           list_sum(list_transform(range(1, len(n.ve) + 1), i -> n.ve[i] * c.cv[i])) / (n.nrm * c.cn) AS sim
         FROM n CROSS JOIN c),
       asg AS (SELECT vec_id, centroid_id FROM (
           SELECT vec_id, centroid_id,
                  row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, centroid_id) AS rn
           FROM asg0) WHERE rn = 1)"""

  val x11Sql: String =
    s"""WITH $ivfCtes,
       q AS (SELECT vec_id AS query_id, ve AS qv, nrm AS qn FROM n WHERE vec_id < 8),
       pr0 AS (SELECT q.query_id, c.centroid_id,
           list_sum(list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * c.cv[i])) / (q.qn * c.cn) AS sim
         FROM q CROSS JOIN c),
       pr AS (SELECT query_id, centroid_id FROM (
           SELECT query_id, centroid_id,
                  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, centroid_id) AS rn
           FROM pr0) WHERE rn <= 3),
       sc AS (SELECT q.query_id, n.vec_id AS neighbor_id,
           list_sum(list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * n.ve[i])) / (q.qn * n.nrm) AS cos
         FROM n JOIN asg ON n.vec_id = asg.vec_id
         JOIN pr ON asg.centroid_id = pr.centroid_id
         JOIN q ON pr.query_id = q.query_id
         WHERE n.vec_id <> q.query_id),
       r AS (SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM sc)
       SELECT query_id, rank, neighbor_id, round(cos, 6) AS cosine FROM r WHERE rank <= 10"""

  // --- x12: embedding cosine near-dup pairs within label blocks ----------
  def x12EmbeddingPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingPairs(t(spark, dir, "embeddings"), "vec_id", "embedding",
      blockKey = col("label"), threshold = 0.4)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))

  val x12Sql: String =
    """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
       n AS (SELECT vec_id, label, ve, sqrt(list_sum(list_transform(ve, x -> x * x))) AS nrm FROM v),
       p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_sum(list_transform(range(1, len(a.ve) + 1), i -> a.ve[i] * b.ve[i])) / (a.nrm * b.nrm) AS cos
         FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
       SELECT id_a, id_b, round(cos, 6) AS cosine FROM p WHERE cos >= 0.4"""

  // --- x13: sliding event-time window (2h window, 1h slide) ---------------
  // Spark's window() needs a timestamp: reconstruct µs timestamps from the
  // schema-resolved epoch µs, emit window starts back as integer µs for
  // exact compare.
  def x13SlidingWindow(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .transform(ev => ev.withColumn("ts_t", timestamp_micros(Events.epochMicros(ev))))
      .groupBy(window(col("ts_t"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).cast("double").as("total_value"))
      .select(unix_micros(col("window.start")).as("win_start"),
        col("n_events"), col("total_value"))

  val x13Sql: String =
    """WITH e AS (SELECT epoch_us(ts) AS eus, value FROM events),
       b AS (
         SELECT (eus // 3600000000) * 3600000000 AS win_start, value FROM e
         UNION ALL
         SELECT ((eus // 3600000000) - 1) * 3600000000 AS win_start, value FROM e)
       SELECT win_start, count(*) AS n_events,
              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
       FROM b GROUP BY 1"""

  // --- x14: term frequency — top-5 terms per source (explode+topk) --------
  def x14TermFrequency(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = t(spark, dir, "documents")
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("term"))
    val counts = toks.groupBy(col("source"), col("term")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("source")).orderBy(col("cnt").desc, col("term"))
    counts.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
  }

  val x14Sql: String =
    """WITH toks AS (SELECT source,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term
       FROM documents),
       c AS (SELECT source, term, count(*) AS cnt FROM toks GROUP BY 1, 2),
       r AS (SELECT source, term, cnt,
             row_number() OVER (PARTITION BY source ORDER BY cnt DESC, term) AS rnk FROM c)
       SELECT source, term, cnt, rnk FROM r WHERE rnk <= 5"""

  // --- x15: CUBE rollup over (lang, source) -------------------------------
  def x15SourceCube(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .cube(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))

  val x15Sql: String =
    """SELECT lang, source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
       FROM documents GROUP BY CUBE (lang, source)"""

  // --- x16: IVF assignment (the ANN build step, fully oracled) ------------
  def x16IvfAssign(spark: SparkSession, dir: String): DataFrame = {
    val data = t(spark, dir, "embeddings")
    val centroids = data.filter(col("vec_id") % 50 === 0)
    Similarity.ivfAssign(data, centroids, "vec_id", "embedding")
      .select(col("vec_id"), col("centroid_id"))
  }

  val x16Sql: String =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
       n AS (SELECT vec_id, ve, sqrt(list_sum(list_transform(ve, x -> x * x))) AS nrm FROM v),
       c AS (SELECT vec_id AS centroid_id, ve AS cv, nrm AS cn FROM n WHERE vec_id % 50 = 0),
       s AS (SELECT n.vec_id, c.centroid_id,
           list_sum(list_transform(range(1, len(n.ve) + 1), i -> n.ve[i] * c.cv[i])) / (n.nrm * c.cn) AS sim
         FROM n CROSS JOIN c),
       r AS (SELECT vec_id, centroid_id,
             row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, centroid_id) AS rn FROM s)
       SELECT vec_id, centroid_id FROM r WHERE rn = 1"""

  // --- x17: as-of join — each event to the user's latest signup ≤ t -------
  // (union+window formulation, AsofJoin; µs domain for DuckDB parity)
  def x17AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .transform(e => e.withColumn("ts_us", Events.epochMicros(e)))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts_us"), col("event_id"))
    AsofJoin(
      ev.select(col("event_id"), col("user_id"), col("ts_us")),
      signups, keyCol = "user_id", leftTs = "ts_us", rightTs = "ts_us",
      rightCols = Map("event_id" -> "signup_event_id", "ts_us" -> "signup_ts"))
  }

  val x17Sql: String =
    """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
       s AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events WHERE event_type = 'signup')
       SELECT e.event_id, e.user_id, e.ts_us,
              s.event_id AS signup_event_id, s.ts_us AS signup_ts
       FROM e ASOF LEFT JOIN s ON e.user_id = s.user_id AND e.ts_us >= s.ts_us"""

  // --- x18: frame sampling over binary payloads (multimodal) --------------
  def x18FrameSample(spark: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(
      t(spark, dir, "documents").select(col("doc_id"), col("text").cast("binary").as("blob")),
      "blob", frameBytes = 16, everyNth = 2)
      .select(col("doc_id"), col("frame_idx"),
        col("frame_bytes").cast("string").as("frame"))

  val x18Sql: String =
    """WITH f AS (SELECT doc_id, text, CAST(ceil(length(text) / 16.0) AS INT) AS nf FROM documents),
       i AS (SELECT doc_id, text, unnest(range(0, nf)) AS frame_idx FROM f)
       SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
              substr(text, CAST(frame_idx AS INT) * 16 + 1, 16) AS frame
       FROM i WHERE frame_idx % 2 = 0"""

  // --- x19: int8 embedding quantization (storage-compression leg) ---------
  def x19QuantizeInt8(spark: SparkSession, dir: String): DataFrame = {
    val q = Similarity.quantizeInt8(col("embedding"))
    t(spark, dir, "embeddings").select(
      col("vec_id"),
      round(q.getField("scale"), 6).as("scale"),
      aggregate(q.getField("q"), lit(0L), (acc, x) => acc + x).as("q_sum"),
      array_min(q.getField("q")).as("q_min"),
      array_max(q.getField("q")).as("q_max"))
  }

  val x19Sql: String =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
       s AS (SELECT vec_id, ve, list_max(list_transform(ve, x -> abs(x))) AS scale FROM v),
       q AS (SELECT vec_id, scale,
             list_transform(ve, x -> CAST(round(x / scale * 127) AS INT)) AS qv FROM s)
       SELECT vec_id, round(scale, 6) AS scale,
              CAST(list_sum(qv) AS BIGINT) AS q_sum,
              list_min(qv) AS q_min, list_max(qv) AS q_max
       FROM q"""

  // --- x23: duplicate clusters (connected components over near-dup pairs) -
  // The minhash pair list (exact recall at threshold 0.7, see x04) becomes
  // clusters via iterative min-label propagation; the oracle computes the
  // same exact-Jaccard edge set and closes it with a recursive CTE.
  def x23DupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = allPairs(spark, dir)
    Dedup.duplicateClusters(pairs)
      .select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  val x23Sql: String =
    s"""WITH RECURSIVE ${jaccardCtes(3)},
       ${componentCtes(0.7)}
       SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id"""

  // --- x20: rolling-hash document fingerprint (shard-key content hash) ----
  // ASCII-sanitized input keeps codepoint semantics identical across
  // engines (Spark ascii() vs DuckDB ascii() agree on ASCII).
  def x20RollingFingerprint(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents").select(
      col("doc_id"),
      TextAnalysis.rollingHash(
        regexp_replace(col("text"), "[^\\x20-\\x7E]", "")).as("rhash"))

  val x20Sql: String =
    s"""WITH s AS (SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS t FROM documents)
       SELECT doc_id,
         CAST(list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split(t, ''), c -> CAST(ascii(c) AS BIGINT))),
           (acc, c) -> (acc * 31 + c) % ${TextAnalysis.RollingHashMod}) AS BIGINT) AS rhash
       FROM s"""

  // --- x21: TF-IDF top-3 terms per document ------------------------------
  // Classic keyword extraction: score = tf · ln(N/df). Counts are exact
  // integers; N is a broadcast scalar. ln is NOT IEEE-correctly-rounded,
  // so JVM Math.log and DuckDB's libm may differ in the last ulp — the
  // rank therefore uses the 6-dp ROUNDED score (+ term tiebreak): a flip
  // now needs two engines to round across a 1e-6 boundary from values
  // that differ by <1 ulp, instead of any two terms scoring within 1 ulp
  // of each other.
  def x21Tfidf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(spark, dir, "documents")
    val toks = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df_ = toks.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df_, "term").crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df").cast("double")), 6))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("score"))
  }

  val x21Sql: String =
    """WITH toks AS (SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term
       FROM documents),
       tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
       df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
       n AS (SELECT count(*) AS n_docs FROM documents),
       sc AS (SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
              round(tf * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS score
         FROM tf JOIN df USING (term) CROSS JOIN n),
       r AS (SELECT doc_id, term, tf, score,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk FROM sc)
       SELECT doc_id, rnk, term, tf, score FROM r WHERE rnk <= 3"""

  // --- x22: sequence packing (context-window binning for training) --------
  // Greedy in-order packing: within each source, docs in doc_id order are
  // assigned pack_id = ⌊exclusive-prefix-token-sum / capacity⌋. One window
  // cumsum per source partition — exact integer math, linear scale-out
  // (the 100 TB form packs within date/source partitions independently).
  def x22SequencePack(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val capacity = 2048L
    val docs = t(spark, dir, "documents").select(
      col("doc_id"), col("source"),
      TextAnalysis.wordCount(col("text")).as("n_tokens"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.withColumn("prev_tokens", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        (col("prev_tokens") / capacity).cast("long").as("pack_id"))
  }

  val x22Sql: String =
    """WITH d AS (SELECT doc_id, source,
         CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS BIGINT) AS n_tokens
       FROM documents),
       c AS (SELECT doc_id, source, n_tokens,
             COALESCE(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_tokens
         FROM d)
       SELECT doc_id, source, n_tokens,
              CAST(prev_tokens // 2048 AS BIGINT) AS pack_id
       FROM c"""

  // --- x24: reproducible ~10% corpus sample by md5 bucket -----------------
  // Hash-sampling instead of rand(): the SAME rows are selected on every
  // engine and every run — the reproducibility a training corpus needs.
  def x24HashSample(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("bucket", TextAnalysis.md5Bucket(col("doc_id")))
      .filter(col("bucket") < 6554) // 6554/65536 ≈ 10%
      .select(col("doc_id"), col("lang"), col("source"), col("bucket"))

  val x24Sql: String =
    """WITH h AS (SELECT doc_id, lang, source, md5(CAST(doc_id AS VARCHAR)) AS hx FROM documents),
       b AS (SELECT doc_id, lang, source,
           CAST((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 4096
              + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 256
              + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) AS BIGINT) AS bucket
         FROM h)
       SELECT doc_id, lang, source, bucket FROM b WHERE bucket < 6554"""

  // --- x25: fixed-range histogram (data profiling) ------------------------
  def x25Histogram(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(least(floor(col("o_totalprice") / 30000.0), lit(19.0)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("o_totalprice"))).cast("double").as("total"))

  val x25Sql: String =
    """SELECT CAST(least(floor(o_totalprice / 30000.0), 19.0) AS BIGINT) AS bucket,
       count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
       FROM orders GROUP BY 1"""

  // --- x26: dedup keeper selection (deterministic best-doc-per-group) -----
  // The final leg of the dedup story (pairs → clusters → KEEPER): one row
  // per content fingerprint, longest text wins, doc_id breaks ties.
  // Exercises Dedup.exact — Spark's dropDuplicates keeps an arbitrary row,
  // which a reproducible corpus can't use.
  def x26DedupKeeper(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
    Dedup.exact(docs, Seq("fp"),
      struct((-length(col("text"))).as("neg_len"), col("doc_id")))
      .select(col("doc_id"), col("fp"))
  }

  val x26Sql: String =
    """WITH d AS (SELECT doc_id, length(text) AS len,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
       FROM documents),
       r AS (SELECT doc_id, fp,
             row_number() OVER (PARTITION BY fp ORDER BY len DESC, doc_id) AS rn FROM d)
       SELECT doc_id, fp FROM r WHERE rn = 1"""

  // --- x27: embedding near-dup pairs blocked by IVF centroid --------------
  // The production-shaped blocking for embedding dedup at 100 TB: block =
  // nearest-centroid cell (x12's label blocking needs trusted metadata;
  // this derives the block from the vectors themselves). Approximate —
  // pairs straddling a cell boundary are missed — but DETERMINISTIC, so
  // the oracle replicates the same assignment and the check is exact.
  def x27EmbeddingDedupIvf(spark: SparkSession, dir: String): DataFrame = {
    val data = t(spark, dir, "embeddings")
    val centroids = data.filter(col("vec_id") % 50 === 0)
    val assigned = Similarity.ivfAssign(data, centroids, "vec_id", "embedding")
    Dedup.embeddingPairs(assigned, "vec_id", "embedding",
      blockKey = col("centroid_id"), threshold = 0.4)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  val x27Sql: String =
    s"""WITH $ivfCtes,
       p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_sum(list_transform(range(1, len(a.ve) + 1), i -> a.ve[i] * b.ve[i])) / (a.nrm * b.nrm) AS cos
         FROM n a JOIN asg aa ON a.vec_id = aa.vec_id
         JOIN asg ab ON aa.centroid_id = ab.centroid_id
         JOIN n b ON b.vec_id = ab.vec_id AND a.vec_id < b.vec_id)
       SELECT id_a, id_b, round(cos, 6) AS cosine FROM p WHERE cos >= 0.4"""

  // --- x28: incremental dedup (new batch vs historical fingerprints) ------
  // The daily-ingest pattern at 100 TB: dedup the INCREMENT against the
  // persisted fingerprint set (keys-only join) instead of re-deduping the
  // corpus. History here is the non-increment docs; the fingerprint store
  // side carries only distinct fps — never document payloads.
  /** Shared x28/x34 inputs: (increment (doc_id, fp), historical seen-fp
    * store (fp, __seen)). ONE definition — x34 is gated against the x28
    * oracle, so the split/fingerprint must not be able to drift apart.
    */
  private def incrementalDedupInputs(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val docs = t(spark, dir, "documents")
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
    val seen = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("fp")).distinct().withColumn("__seen", lit(1))
    (docs.filter(col("doc_id") % 5 === 0).select(col("doc_id"), col("fp")), seen)
  }

  def x28IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val (inc, seen) = incrementalDedupInputs(spark, dir)
    inc.join(seen, Seq("fp"), "left")
      .select(col("doc_id"), col("fp"), col("__seen").isNotNull.as("is_dup"))
  }

  val x28Sql: String =
    """WITH d AS (SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
       FROM documents),
       h AS (SELECT DISTINCT fp FROM d WHERE doc_id % 5 <> 0)
       SELECT d.doc_id, d.fp, h.fp IS NOT NULL AS is_dup
       FROM d LEFT JOIN h ON d.fp = h.fp
       WHERE d.doc_id % 5 = 0"""

  // --- x29: repeated n-gram stats (Gopher-style repetition signal) --------
  // Machine-generated/boilerplate text repeats its own n-grams; the dup
  // ratio (total - distinct) / total is the standard public repetition
  // heuristic (Rae et al. 2021). All counts exact ints, one division.
  def x29RepeatedNgrams(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.repeatedNgramStats(t(spark, dir, "documents"), "doc_id", "text", 3)
      .withColumnRenamed("id", "doc_id")

  val x29Sql: String =
    """WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS ws FROM documents),
       g AS (SELECT doc_id, list_transform(range(1, greatest(len(ws) - 2, 0) + 1), i -> array_to_string(ws[i:i+2], ' ')) AS gs FROM w),
       posts AS (SELECT doc_id, unnest(gs) AS s FROM g),
       pc AS (SELECT doc_id, s, count(*) AS c FROM posts GROUP BY 1, 2)
       SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS ngrams_total,
         count(*) AS ngrams_distinct,
         CAST(max(c) AS BIGINT) AS top_ngram_count,
         CAST(sum(c) - count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS dup_ngram_ratio
       FROM pc GROUP BY doc_id"""

  // --- x30: stratified top-k sample (exact per-language allocation) -------
  // Balanced-corpus construction: exactly k docs per language, membership
  // a pure function of the data (md5 rank) — reproducible on any engine,
  // unlike rand()/TABLESAMPLE. The operator's two-stage window keeps any
  // one stratum from funnelling into a single reducer at 100 TB.
  def x30StratifiedSample(spark: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedTopK(t(spark, dir, "documents"), Seq("lang"), "doc_id", 20)
      .select(col("doc_id"), col("lang"), col("sample_rank"))

  val x30Sql: String =
    """WITH r AS (SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS sample_rank
       FROM documents)
       SELECT doc_id, lang, CAST(sample_rank AS BIGINT) AS sample_rank
       FROM r WHERE sample_rank <= 20"""

  // --- x31: benchmark contamination (decontamination n-gram overlap) ------
  // Docs doc_id % 50 = 0 stand in for the benchmark/eval set; each corpus
  // doc reports what fraction of its distinct 6-grams leak from it. The
  // benchmark gram set broadcasts (benchmarks are MBs next to a 100 TB
  // corpus) — the corpus posting table never shuffles for the probe.
  def x31Contamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    Dedup.benchmarkOverlap(
      docs.filter(col("doc_id") % 50 =!= 0),
      docs.filter(col("doc_id") % 50 === 0),
      "doc_id", "text", shingleN = 6)
      .withColumnRenamed("id", "doc_id")
  }

  val x31Sql: String =
    """WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS ws FROM documents),
       sh0 AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(ws) - 5, 0) + 1), i -> array_to_string(ws[i:i+5], ' '))) AS sh FROM w),
       sh AS (SELECT doc_id, sh FROM sh0 WHERE len(sh) > 0),
       posts AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       bg AS (SELECT DISTINCT s FROM posts WHERE doc_id % 50 = 0),
       corpus AS (SELECT * FROM posts WHERE doc_id % 50 <> 0),
       sizes AS (SELECT doc_id, count(*) AS n_grams FROM corpus GROUP BY 1),
       hits AS (SELECT c.doc_id, count(*) AS n_contaminated
                FROM corpus c JOIN bg ON c.s = bg.s GROUP BY 1)
       SELECT s.doc_id, s.n_grams,
         COALESCE(h.n_contaminated, 0) AS n_contaminated,
         CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE) / CAST(s.n_grams AS DOUBLE) AS contamination_ratio
       FROM sizes s LEFT JOIN hits h ON s.doc_id = h.doc_id"""

  // --- x55: bloom-prefiltered decontamination ------------------------------
  // x31's exact-set broadcast assumes the benchmark fits as a hash set;
  // x55 is the shape for when it doesn't: a 16-bits/key bloom filter of
  // the benchmark 5-grams probes every corpus gram via a codegen'd
  // narrow expression (no join), and only survivors reach the exact
  // verify join — whose result is exact because FPs fail the equality.
  // Oracle: plain exact contamination (the bloom must be invisible in
  // the answer). Different slice (%25) and n (5) than x31 so the two
  // gates cannot mask each other.
  def x55BloomDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    Dedup.benchmarkOverlapBloom(
      docs.filter(col("doc_id") % 25 =!= 0),
      docs.filter(col("doc_id") % 25 === 0),
      "doc_id", "text", shingleN = 5)
      .withColumnRenamed("id", "doc_id")
  }

  val x55Sql: String =
    """WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS ws FROM documents),
       sh0 AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(ws) - 4, 0) + 1), i -> array_to_string(ws[i:i+4], ' '))) AS sh FROM w),
       sh AS (SELECT doc_id, sh FROM sh0 WHERE len(sh) > 0),
       posts AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       bg AS (SELECT DISTINCT s FROM posts WHERE doc_id % 25 = 0),
       corpus AS (SELECT * FROM posts WHERE doc_id % 25 <> 0),
       sizes AS (SELECT doc_id, count(*) AS n_grams FROM corpus GROUP BY 1),
       hits AS (SELECT c.doc_id, count(*) AS n_contaminated
                FROM corpus c JOIN bg ON c.s = bg.s GROUP BY 1)
       SELECT s.doc_id, s.n_grams, h.n_contaminated,
         CAST(h.n_contaminated AS DOUBLE) / CAST(s.n_grams AS DOUBLE) AS contamination_ratio
       FROM sizes s JOIN hits h ON s.doc_id = h.doc_id"""

  // --- x57: the incremental day, end to end -------------------------------
  // The streaming twin of x46's batch funnel, composed from the pieces the
  // surface already gates separately: the day's documents arrive as
  // Kafka-shaped wire records (x37's bus adapter), replay through a real
  // Structured Streaming query, and EVERY micro-batch runs the funnel —
  // decode → quality gate (x32/x46's rules) → exact-dup probe against the
  // persisted historical fingerprint store (x28's keys-only join) →
  // MinHash near-dup probe against the persisted historical LSH index
  // (x48's banded probe, index built ONCE outside the stream) — and
  // upserts the judged rows into a manifest-committed table (x45's sink,
  // txn-fenced). Per-batch cost is O(batch): nothing historical is
  // recomputed per batch; at 100 TB both stores are maintained tables and
  // the day streams against them. The oracle is the same funnel composed
  // relationally — streaming plumbing must be invisible in the answer.
  /** Fresh /tmp table path per (prefix, dir) invocation, reclaiming the
    * previous run's table so repeated bench passes don't accumulate.
    * Shared by the streaming-sink gates (x45, x57); each gate's FINAL
    * table remains until JVM exit — bounded at one live table per
    * (prefix, dir).
    */
  private object FreshTables {
    private val last = new java.util.concurrent.ConcurrentHashMap[String, String]()
    private val runs = new java.util.concurrent.atomic.AtomicLong(0L)
    private val token = java.util.UUID.randomUUID().toString.take(8)
    def next(spark: SparkSession, dir: String, prefix: String): String = {
      val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
      val table = s"/tmp/graft/${prefix}_tbl_${tag}_${token}_${runs.incrementAndGet()}"
      Option(last.put(s"$prefix|$dir", table)).foreach { prev =>
        val fs = new org.apache.hadoop.fs.Path(prev)
          .getFileSystem(spark.sessionState.newHadoopConf())
        try fs.delete(new org.apache.hadoop.fs.Path(prev), true)
        catch { case _: java.io.IOException => () }
      }
      table
    }
  }

  /** Build-once-per-JVM PROTOTYPE stores — the lifecycle commit-floor
    * diet (r11 verdict #5): several gates stage the IDENTICAL store
    * from the identical fixture (the agg view of x179/x181/x217, the
    * 3-day BM25 index of x156/x172/x216, the SCD2 store of x188/x190/
    * x217, the all-docs dedup+cluster stores of x173/x215/x217), and
    * re-running those ingest cycles per gate — and per bench PASS — is
    * pure commit-floor wall-time that measures nothing new. The first
    * caller builds (with the replay-accounting REQUIREs riding along);
    * read-only gates read the prototype, MUTATING gates [[cloneTo]] a
    * fresh copy first (one recursive file copy, orders of magnitude
    * cheaper than the ingest cycles) so gate isolation is intact: no
    * gate ever observes another's mutation.
    */
  private object ProtoStores {
    private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()
    private val dfs = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

    def proto(dir: String, kind: String)(build: String => Unit): String =
      built.computeIfAbsent(s"$kind|$dir", { _ =>
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val path = s"/tmp/graft/proto_${kind}_${tag}_" +
          java.util.UUID.randomUUID().toString.take(8)
        build(path)
        path
      })

    /** Memoized MATERIALIZED frame (e.g. the all-docs minhash pair set
      * shared by the cluster-store gates) — localCheckpoint blocks stay
      * alive for the JVM, which is the point: compute once, read many.
      */
    def df(dir: String, kind: String)(make: => DataFrame): DataFrame =
      dfs.computeIfAbsent(s"$kind|$dir", _ => Dedup.materialize(make))

    /** Copy a prototype to a fresh table a mutating gate owns. */
    def cloneTo(spark: SparkSession, src: String, dst: String): Unit = {
      val conf = spark.sessionState.newHadoopConf()
      val sp = new org.apache.hadoop.fs.Path(src)
      val fs = sp.getFileSystem(conf)
      org.apache.hadoop.fs.FileUtil.copy(
        fs, sp, fs, new org.apache.hadoop.fs.Path(dst), false, conf)
      ()
    }
  }

  /** The all-docs exact-recall MinHash pair set at the house geometry
    * (3-shingles, 32×2 bands, τ=0.7) — the INPUT FIXTURE of a dozen
    * gates (graph ops, cluster stores, data-card rollups), computed
    * once per JVM. x04 — the gate whose SUBJECT is the pair generator —
    * keeps computing its own.
    */
  private def allPairs(spark: SparkSession, dir: String): DataFrame =
    ProtoStores.df(dir, "minhashpairs") {
      Dedup.minhashPairs(t(spark, dir, "documents"),
        "doc_id", "text", shingleN = 3, bands = 32, rowsPerBand = 2,
        threshold = 0.7)
    }

  /** The all-docs DedupStores pair (fp + minhash index, default house
    * geometry) as a build-once prototype under `<root>/fp` and
    * `<root>/idx` — x215/x217 clone both, then forget.
    */
  private def dedupAllProto(spark: SparkSession, dir: String): String =
    ProtoStores.proto(dir, "dedupall") { root =>
      graft.ext.DedupStores.build(spark, t(spark, dir, "documents"),
        "doc_id", "text", s"$root/fp", s"$root/idx")
    }

  /** The plain full-corpus VectorStore (cents = vec_id % 50, 64/4/16/3)
    * as a build-once prototype — x180 probes it read-only; x150 (law
    * write), x157 and x217 (forgets) clone it first.
    */
  private def vecStoreProto(spark: SparkSession, dir: String): String =
    ProtoStores.proto(dir, "vecstore") { root =>
      val data = t(spark, dir, "embeddings")
      graft.ext.VectorStore.build(spark, data,
        data.filter(col("vec_id") % 50 === 0),
        "vec_id", "embedding", root, dim = 64, m = 4, k = 16, stride = 3)
    }

  /** The all-docs ClusterStore (components over [[allPairs]]) as a
    * build-once prototype — x173/x215/x217 clone it, then forget.
    */
  private def clusterAllProto(spark: SparkSession, dir: String): String =
    ProtoStores.proto(dir, "clusterall") { root =>
      graft.ext.ClusterStore.build(spark, allPairs(spark, dir), root,
        partitions = 8)
    }

  def x57StreamingFunnel(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.ManifestStore
    import graft.streaming.{KafkaShaped, StreamUpsert}
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val docs = t(spark, dir, "documents")
    val inc = docs.filter(col("doc_id") % 5 === 0)
    val hist = docs.filter(col("doc_id") % 5 =!= 0)

    // the persisted historical stores (built once per day, NOT per batch):
    // keys-only fingerprint set + MinHash/LSH index. localCheckpoint
    // stands in for the maintained tables these are at production scale.
    val histFp = hist.select(TextAnalysis.fingerprint(col("text")).as("fp"))
      .distinct().withColumn("__seen", lit(1)).localCheckpoint()
    val histIdx = Dedup.minhashIndex(hist, "doc_id", "text",
      shingleN = 3, bands = 32, rowsPerBand = 2)

    // the day's arrivals as bus records, four arrival batches ALIGNED
    // with the table's partition key (pt = doc_id % 8, batch = pt % 4):
    // each micro-batch merge reads and rewrites 2 of 8 partitions, the
    // O(touched partitions) ingest shape, not the whole table
    val wire = KafkaShaped.encode(
      inc.select(col("doc_id"), col("text"), col("lang"), col("source")),
      key = col("doc_id"), topic = "docs",
      partition = pmod(col("doc_id"), lit(4)), offset = col("doc_id"),
      timestamp = to_timestamp(lit("2024-01-01 00:00:00")))
      .withColumn("__ab", pmod(pmod(col("offset"), lit(8L)), lit(4L)))
    val wireCols = wire.columns.filterNot(_ == "__ab").toSeq
    val payloadSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING, source STRING")

    def funnel(batch: DataFrame): DataFrame = {
      val gated = TextAnalysis.qualityGate(
          KafkaShaped.decode(batch, payloadSchema), "text", "lang")
        .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      // near-dup probe AFTER the quality gate (the funnel order: only
      // kept docs pay the signature cost), against the prebuilt index
      val nd = Dedup.minhashProbe(
          Dedup.minhashIndex(gated.filter(col("keep")), "doc_id", "text",
            shingleN = 3, bands = 32, rowsPerBand = 2),
          histIdx, bands = 32, rowsPerBand = 2, threshold = 0.7)
        .select(col("inc_id").as("doc_id")).distinct().withColumn("__nd", lit(1))
      gated
        .join(histFp, Seq("fp"), "left")
        .join(nd, Seq("doc_id"), "left")
        .withColumn("is_exact_dup", col("__seen").isNotNull)
        .withColumn("is_near_dup", col("__nd").isNotNull)
        .withColumn("clean",
          col("keep") && !col("is_exact_dup") && !col("is_near_dup"))
        .select(col("doc_id"), col("source"), col("keep"),
          col("is_exact_dup"), col("is_near_dup"), col("clean"),
          pmod(col("doc_id"), lit(8L)).as("pt"))
    }

    // fresh table per run (repeated bench passes must not accumulate)
    val table = FreshTables.next(spark, dir, "funnel")
    // base snapshot = arrival batch 0 through the SAME funnel; batches
    // 1..3 then stream through replayedPipeline with txn fencing
    ManifestStore.write(spark,
      funnel(wire.filter(col("__ab") === 0L).drop("__ab")), table, "pt")
    StreamUpsert.replayedPipeline(spark,
      wire.filter(col("__ab") =!= 0L).withColumn("__ab", col("__ab") - 1L),
      wireCols, "__ab", s"/tmp/graft/funnel_in_$tag", table,
      Seq("doc_id"), Seq("pt"), funnel, writerId = Some(s"x57_$tag"))
    ManifestStore.read(spark, table).select(
      col("doc_id").cast("long").as("doc_id"), col("source"),
      col("keep").cast("boolean").as("keep"),
      col("is_exact_dup").cast("boolean").as("is_exact_dup"),
      col("is_near_dup").cast("boolean").as("is_near_dup"),
      col("clean").cast("boolean").as("clean"))
  }

  val x57Sql: String =
    """WITH t0 AS (SELECT doc_id, lang, source, text,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
       FROM documents WHERE doc_id % 5 = 0),
       m AS (SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS wc,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) END AS awl,
         CASE WHEN length(text) = 0 THEN 0.0
              ELSE CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) END AS pr,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(len(list_filter(toks, x -> list_contains(['the','a','an','of','and','to','in','is','on','for','with','as','by','at','be','this','that','it','from','or','are','was'], x))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) END AS swr
       FROM t0),
       sc AS (
         SELECT doc_id, 'en' AS plang, len(list_filter(['the','and','of','to','is','that','for','with','this','are'], x -> list_contains(toks, x))) AS score FROM t0
         UNION ALL SELECT doc_id, 'es', len(list_filter(['el','la','de','que','los','una','por','del','las','es'], x -> list_contains(toks, x))) FROM t0
         UNION ALL SELECT doc_id, 'fr', len(list_filter(['le','les','des','une','est','dans','pour','que','sur','avec'], x -> list_contains(toks, x))) FROM t0
         UNION ALL SELECT doc_id, 'de', len(list_filter(['der','die','das','und','ist','nicht','mit','ein','für','auf'], x -> list_contains(toks, x))) FROM t0
         UNION ALL SELECT doc_id, 'zh', 0 FROM t0),
       lp AS (SELECT doc_id,
             CASE WHEN score > 0 THEN plang ELSE 'und' END AS lang_pred,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, plang DESC) AS rn
           FROM sc),
       fl AS (SELECT t0.doc_id, t0.source, t0.text,
           (CASE WHEN NOT (m.wc BETWEEN 10 AND 5000) THEN 1 ELSE 0 END
          + CASE WHEN m.swr < 0.05 THEN 1 ELSE 0 END
          + CASE WHEN m.pr > 0.2 THEN 1 ELSE 0 END
          + CASE WHEN NOT (m.awl BETWEEN 2.0 AND 12.0) THEN 1 ELSE 0 END
          + CASE WHEN lp.lang_pred IS DISTINCT FROM t0.lang THEN 1 ELSE 0 END) = 0 AS keep
         FROM t0 JOIN m ON t0.doc_id = m.doc_id
         JOIN lp ON t0.doc_id = lp.doc_id AND lp.rn = 1),
       dfp AS (SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
         FROM documents WHERE doc_id % 5 = 0),
       hfp AS (SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
         FROM documents WHERE doc_id % 5 <> 0),
       kw AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS ws
              FROM fl WHERE keep),
       ksh AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(ws) - 2, 0) + 1), i -> array_to_string(ws[i:i+2], ' '))) AS sh FROM kw),
       kposts AS (SELECT doc_id, unnest(sh) AS s FROM ksh WHERE len(sh) > 0),
       hw AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS ws
              FROM documents WHERE doc_id % 5 <> 0),
       hsh AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(ws) - 2, 0) + 1), i -> array_to_string(ws[i:i+2], ' '))) AS sh FROM hw),
       hposts AS (SELECT doc_id, unnest(sh) AS s FROM hsh WHERE len(sh) > 0),
       inter AS (SELECT a.doc_id AS inc_id, b.doc_id AS hist_id, count(*) AS i
                 FROM kposts a JOIN hposts b ON a.s = b.s GROUP BY 1, 2),
       ks AS (SELECT doc_id, len(sh) AS n FROM ksh WHERE len(sh) > 0),
       hs AS (SELECT doc_id, len(sh) AS n FROM hsh WHERE len(sh) > 0),
       nd AS (SELECT DISTINCT inc_id FROM inter
              JOIN ks ON ks.doc_id = inc_id JOIN hs ON hs.doc_id = hist_id
              WHERE CAST(i AS DOUBLE) / CAST(ks.n + hs.n - i AS DOUBLE) >= 0.7)
       SELECT fl.doc_id, fl.source, fl.keep,
         (hfp.fp IS NOT NULL) AS is_exact_dup,
         (nd.inc_id IS NOT NULL) AS is_near_dup,
         (fl.keep AND hfp.fp IS NULL AND nd.inc_id IS NULL) AS clean
       FROM fl
       JOIN dfp ON fl.doc_id = dfp.doc_id
       LEFT JOIN hfp ON dfp.fp = hfp.fp
       LEFT JOIN nd ON nd.inc_id = fl.doc_id"""

  // --- x33: STATEFUL STREAMING sessionization ≡ batch oracle --------------
  // The flatMapGroupsWithState path end-to-end in the gate: events replay
  // through a real Structured Streaming query (parquet source →
  // StatefulSessions.sessionize → memory sink, Trigger.AvailableNow) and
  // must produce exactly the batch gaps-and-islands sessions. Append mode
  // only emits CLOSED sessions, so a per-user SENTINEL event at
  // max(ts) + gap + 1 closes each user's final session deterministically
  // (the sentinel's own session stays open and is never emitted). The
  // input is one sorted file → one micro-batch → no cross-batch
  // out-of-order hazard; state is O(users), the bounded-state shape that
  // scales to an unbounded stream where the batch window query cannot run.
  def x33StreamingSessions(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StatefulSessions
    val gap = 30L * 60 * 1000000L // 30 min in micros, same as x08
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val ev = t(spark, dir, "events")
      .transform(e => e.select(col("user_id"), Events.epochMicros(e).as("ts")))
    val sentinels = ev.groupBy("user_id").agg((max(col("ts")) + gap + 1).as("ts"))
    StatefulSessions.replayedSessionize(spark,
      ev.unionByName(sentinels.select(col("user_id"), col("ts"))), gap,
      s"/tmp/graft/ssess_$tag", s"x33_sessions_$tag")
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
  }

  // The batch oracle: identical gaps-and-islands sessions (x08 without
  // the session_seq column — streaming state has no global sequence).
  val x33Sql: String =
    """WITH x AS (SELECT user_id, epoch_us(ts) AS e FROM events),
       s AS (SELECT user_id, e,
         CASE WHEN lag(e) OVER (PARTITION BY user_id ORDER BY e) IS NULL
                OR e - lag(e) OVER (PARTITION BY user_id ORDER BY e) > 1800000000
              THEN 1 ELSE 0 END AS ns FROM x),
       g AS (SELECT user_id, e,
         sum(ns) OVER (PARTITION BY user_id ORDER BY e ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq FROM s)
       SELECT user_id, min(e) AS session_start, max(e) AS session_end,
              count(*) AS n_events
       FROM g GROUP BY user_id, session_seq"""

  // --- x34: STREAMING incremental dedup (stream-static join) --------------
  // The second core streaming pattern after x33's stateful path: the daily
  // increment arrives as a STREAM and joins the STATIC historical
  // fingerprint store — Spark's stream-static join, stateless and
  // deterministic regardless of micro-batching, so the result must equal
  // the batch x28 oracle exactly. At 100 TB the static side is the
  // keys-only fingerprint store (broadcast or bucket-joined), never the
  // corpus.
  def x34StreamingIncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val base = s"/tmp/graft/sdedup_$tag"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true) // fresh replay per run
    val (inc, seen) = incrementalDedupInputs(spark, dir)
    inc.write.parquet(s"$base/in")
    val qname = s"x34_sdedup_$tag"
    spark.catalog.dropTempView(qname)
    val q = spark.readStream.schema(inc.schema).parquet(s"$base/in")
      .join(seen, Seq("fp"), "left")
      .select(col("doc_id"), col("fp"), col("__seen").isNotNull.as("is_dup"))
      .writeStream.format("memory").queryName(qname)
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    try { if (!q.awaitTermination(300000)) throw new RuntimeException("x34: drain timeout") }
    finally q.stop()
    spark.table(qname)
  }

  val x34Sql: String = x28Sql

  // --- x35: temperature mixture sampling (alpha=0.5 source balancing) -----
  // The data-mixture step of corpus construction: sources re-weighted to
  // sqrt-proportional shares (up-weights low-resource sources), then
  // hash-sampled at the per-source rate that hits ~300 docs total. Every
  // arithmetic step is engineered bit-identical (integer-quantized
  // weights, exact integer sums, single divisions) so the sampled SET
  // reproduces on any engine.
  def x35MixtureSample(spark: SparkSession, dir: String): DataFrame =
    Sampling.temperatureMixture(t(spark, dir, "documents"), "source", "doc_id", 300L)
      .select(col("doc_id"), col("source"), col("sample_rate"))

  val x35Sql: String =
    """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
       w AS (SELECT source, n, CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000) AS BIGINT) AS w FROM c),
       t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w),
       r AS (SELECT source, least(1.0, CAST(300 * w AS DOUBLE) / CAST(tw * n AS DOUBLE)) AS sample_rate FROM w, t),
       b AS (SELECT d.doc_id, d.source, r.sample_rate,
           (SELECT CAST((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 4096
              + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 256
              + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) AS BIGINT)
            FROM (SELECT md5(CAST(d.doc_id AS VARCHAR)) AS hx)) AS bucket
         FROM documents d JOIN r USING (source))
       SELECT doc_id, source, sample_rate FROM b
       WHERE bucket < CAST(floor(sample_rate * 65536) AS BIGINT)"""

  // --- x32: composite quality gate (C4/Gopher rule mask) ------------------
  // The actual FILTERING step of a training-data pipeline: five rules,
  // per-rule fail bits (auditable kill distribution), keep = mask 0. Rule
  // 4 cross-checks marker-vote language ID against the declared lang
  // column — mislabeled language is a top corpus defect.
  def x32QualityGate(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityGate(t(spark, dir, "documents"), "text", "lang")
      .select(col("doc_id"), col("lang"), col("fail_mask"), col("keep"))

  /** Shared CTE chain ending in `f` (one row per doc with source, lang,
    * wc/awl/pr/swr metrics and lang_pred) — the relational twin of
    * [[TextAnalysis.qualityGate]]'s rule inputs; reused by the x32 gate
    * and x87's per-source funnel rollup.
    */
  private val qgCtes: String =
    """t AS (SELECT doc_id, source, lang, text,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
       FROM documents),
       m AS (SELECT doc_id, source, lang,
         CAST(len(toks) AS BIGINT) AS wc,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) END AS awl,
         CASE WHEN length(text) = 0 THEN 0.0
              ELSE CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) END AS pr,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(len(list_filter(toks, x -> list_contains(['the','a','an','of','and','to','in','is','on','for','with','as','by','at','be','this','that','it','from','or','are','was'], x))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) END AS swr
       FROM t),
       sc AS (
         SELECT doc_id, 'en' AS plang, len(list_filter(['the','and','of','to','is','that','for','with','this','are'], x -> list_contains(toks, x))) AS score FROM t
         UNION ALL SELECT doc_id, 'es', len(list_filter(['el','la','de','que','los','una','por','del','las','es'], x -> list_contains(toks, x))) FROM t
         UNION ALL SELECT doc_id, 'fr', len(list_filter(['le','les','des','une','est','dans','pour','que','sur','avec'], x -> list_contains(toks, x))) FROM t
         UNION ALL SELECT doc_id, 'de', len(list_filter(['der','die','das','und','ist','nicht','mit','ein','für','auf'], x -> list_contains(toks, x))) FROM t
         UNION ALL SELECT doc_id, 'zh', 0 FROM t),
       lp AS (SELECT doc_id,
             CASE WHEN score > 0 THEN plang ELSE 'und' END AS lang_pred,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, plang DESC) AS rn
           FROM sc),
       f AS (SELECT m.*, lp.lang_pred FROM m JOIN lp ON m.doc_id = lp.doc_id AND lp.rn = 1)"""

  private val qgMask: String =
    """CASE WHEN NOT (wc BETWEEN 10 AND 5000) THEN 1 ELSE 0 END
            + CASE WHEN swr < 0.05 THEN 2 ELSE 0 END
            + CASE WHEN pr > 0.2 THEN 4 ELSE 0 END
            + CASE WHEN NOT (awl BETWEEN 2.0 AND 12.0) THEN 8 ELSE 0 END
            + CASE WHEN lang_pred IS DISTINCT FROM lang THEN 16 ELSE 0 END"""

  val x32Sql: String =
    s"""WITH $qgCtes
       SELECT doc_id, lang,
         CAST($qgMask AS BIGINT) AS fail_mask,
         ($qgMask) = 0 AS keep
       FROM f"""

  // --- x36: late-data watermark gate (deterministic multi-batch replay) ---
  // Event-time correctness under out-of-order arrival: rows are assigned
  // an arrival batch (6 time-slices; a reproducible md5-chosen ~15% of
  // rows arrive TWO batches late), replayed file-per-batch, and aggregated
  // into 1-hour tumbling windows behind a 30-minute watermark. The oracle
  // replays the calibrated watermark algebra relationally — see the
  // LateData scaladoc for the W_{j-2} filter / W_{j-1} eviction rules.
  /** Replay-spec bounds (events min/max tu) for [[x36LateWatermark]] and
    * [[x42StreamJoin]], computed once per JVM per data dir: the
    * batch-assignment scalars are part of the replay SPEC, not something
    * each invocation should re-derive with a full scan (the bench's
    * warm-up + 3 passes share one pass).
    */
  private val x36Bounds =
    new java.util.concurrent.ConcurrentHashMap[String, Option[(Long, Long)]]()

  def x36LateWatermark(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.LateData
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val nBatches = 6
    val ev = t(spark, dir, "events")
      .transform(e => e.select(col("event_id"), Events.epochMicros(e).as("tu")))
    val bounds = x36Bounds.computeIfAbsent(dir, _ => {
      val r = ev.agg(min("tu"), max("tu")).collect().head
      if (r.isNullAt(0)) None else Some((r.getLong(0), r.getLong(1)))
    })
    if (bounds.isEmpty) // empty events table: no batches, no windows
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL("ws BIGINT, n BIGINT"))
    val (mn, mx) = bounds.get
    val assigned = ev
      .withColumn("__nat",
        least(expr(s"((tu - ${mn}L) * $nBatches) div (${mx}L - ${mn}L + 1)"), lit(nBatches - 1L)))
      .withColumn("__ab", least(
        col("__nat") + when(TextAnalysis.md5Bucket(col("event_id")) < 9830L, 2L).otherwise(0L),
        lit(nBatches - 1L)))
    LateData.replayedWindowedCounts(spark, assigned, "tu", "__ab",
      s"/tmp/graft/late_$tag", "1 hour", "30 minutes", s"x36_late_$tag")
  }

  // Watermark algebra, relationally: per-batch max event time -> running
  // max -> W_k = (floor_ms(max) - 30min)*1000; a row is kept iff its
  // window end beats W of two batches earlier (lag 2 = the late-events
  // watermark of its arrival batch); a window is emitted iff its end <=
  // the final watermark. 3600000000 = 1h in micros, 1800000 = 30min in ms.
  val x36Sql: String =
    """WITH e AS (SELECT event_id AS id, epoch_us(ts) AS tu FROM events),
       bounds AS (SELECT min(tu) AS mn, max(tu) AS mx FROM e),
       l AS (SELECT id, tu,
             least(((tu - mn) * 6) // (mx - mn + 1), 5)
           + CASE WHEN CAST((strpos('0123456789abcdef', substr(md5(CAST(id AS VARCHAR)), 1, 1)) - 1) * 4096
                + (strpos('0123456789abcdef', substr(md5(CAST(id AS VARCHAR)), 2, 1)) - 1) * 256
                + (strpos('0123456789abcdef', substr(md5(CAST(id AS VARCHAR)), 3, 1)) - 1) * 16
                + (strpos('0123456789abcdef', substr(md5(CAST(id AS VARCHAR)), 4, 1)) - 1) AS BIGINT) < 9830
             THEN 2 ELSE 0 END AS ab0
         FROM e, bounds),
       a AS (SELECT id, tu, least(ab0, 5) AS ab FROM l),
       pb AS (SELECT ab, max(tu) AS mxb FROM a GROUP BY ab),
       pw AS (SELECT ab, ((max(mxb) OVER (ORDER BY ab)) // 1000 - 1800000) * 1000 AS wnow FROM pb),
       f AS (SELECT ab, coalesce(lag(wnow, 2) OVER (ORDER BY ab), 0) AS fwm FROM pw),
       fin AS (SELECT max(wnow) AS ewm FROM pw),
       kept AS (SELECT tu FROM a JOIN f USING (ab)
                WHERE ((tu // 3600000000) + 1) * 3600000000 > fwm)
       SELECT (tu // 3600000000) * 3600000000 AS ws, count(*) AS n
       FROM kept, fin
       WHERE ((tu // 3600000000) + 1) * 3600000000 <= ewm
       GROUP BY 1"""

  // --- x37: Kafka-shaped wire ingestion through the online-job seam ------
  // The reference's push channel (inline RPC payloads,
  // cubicerpetl/cubicerpetl.py:204-214) modernized as a message bus: rows
  // are rendered as Kafka wire records (key/value binary + topic/partition/
  // offset), replayed hermetically from a parquet drop (this container
  // ships no Kafka connector jar — the adapter is source-agnostic by
  // design), decoded against an explicit payload schema, and drained by
  // the SAME OnlineJob seam as q39: transform + log-state recovery + merge
  // routing per micro-batch. One deliberately malformed payload proves the
  // PERMISSIVE null→error-channel routing claim; bus offsets ride along
  // (`bus_offset`) so at-least-once replays can be fenced downstream.
  def x37KafkaDrain(spark: SparkSession, dir: String): DataFrame = {
    import graft.sinks.{LogStore, MergeRouter}
    import graft.spec.Specs._
    import graft.streaming.{KafkaShaped, OnlineJob}
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val base = s"/tmp/graft/kafka_$tag"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(base), true) // fresh run: checkpoint must not carry over
    val (inDir, logDir, ckpt, outDir, errDir) =
      (s"$base/in", s"$base/log", s"$base/ckpt", s"$base/out", s"$base/err")

    val subset = t(spark, dir, "orders").filter(col("o_orderkey") % 5 === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
    val wire = KafkaShaped.encode(subset,
      key = col("o_orderkey"),
      topic = "orders",
      partition = pmod(col("o_orderkey"), lit(4)),
      offset = col("o_orderkey"),
      timestamp = to_timestamp(lit("2024-01-01 00:00:00")))
    // one wire record whose value is not JSON: must surface as an all-null
    // payload row (PERMISSIVE decode) and route to the error channel, not
    // kill the stream
    val malformed = spark.range(1).select(
      lit("bad").cast("binary").as("key"),
      lit("{not json").cast("binary").as("value"),
      lit("orders").as("topic"),
      lit(0).as("partition"),
      lit(-1L).as("offset"),
      to_timestamp(lit("2024-01-01 00:00:00")).as("timestamp"),
      lit(0).as("timestampType"))
    wire.unionByName(malformed).write.parquet(inDir)

    // keys already loaded once: must route as updates with the recovered id
    LogStore.append(spark, logDir, subset.filter(col("o_orderkey") % 10 === 0).select(
      lit("kafka_x37").as("job"), col("o_orderkey").cast("string").as("pk"),
      (col("o_orderkey") * 3).as("model_id"), lit("info").as("level"),
      lit("preloaded").as("message"), current_timestamp().as("ts")))

    val job = JobSpec(
      name = "kafka_x37",
      date = java.time.LocalDate.of(2024, 1, 1),
      extract = Left(FileResource(inDir, "parquet")),
      transform = TransformSpec(
        fields = Seq(
          FieldSpec("o_orderkey", fieldName = Some("okey"), fieldType = "int"),
          FieldSpec("o_totalprice", fieldName = Some("price"), fieldType = "float"),
          FieldSpec("offset", fieldName = Some("bus_offset"), fieldType = "int")),
        reprocess = ReprocessMode.Update,
        pkField = Some("o_orderkey")))

    val wireStream = spark.readStream.schema(KafkaShaped.wireSchema).parquet(inDir)
    val source = KafkaShaped.decode(wireStream,
      org.apache.spark.sql.types.StructType.fromDDL("o_orderkey long, o_totalprice double"))
    val q = OnlineJob.start(spark, job, source, logDir, ckpt, (routed, _) => {
      routed.filter(col("okey").isNull)
        .select(col("bus_offset"), lit("unparseable payload").as("reason"))
        .write.mode("append").parquet(errDir)
      routed.filter(col("okey").isNotNull).write.mode("append").parquet(outDir)
    })
    if (!q.awaitTermination(120000)) {
      q.stop() // never read partial output from a still-running drain
      throw new IllegalStateException("x37: streaming drain did not finish in 120s")
    }
    spark.read.parquet(outDir).select(
      col("okey").cast("long").as("okey"),
      col(MergeRouter.ActionCol).as("action"),
      col(MergeRouter.IdCol).cast("long").as("model_id"),
      col("bus_offset").cast("long").as("bus_offset"))
      .unionByName(spark.read.parquet(errDir).select(
        lit(null).cast("long").as("okey"), lit("error").as("action"),
        lit(null).cast("long").as("model_id"), col("bus_offset").cast("long").as("bus_offset")))
  }

  val x37Sql: String =
    """SELECT o_orderkey AS okey,
       CASE WHEN o_orderkey % 10 = 0 THEN 'update' ELSE 'insert' END AS action,
       CASE WHEN o_orderkey % 10 = 0 THEN o_orderkey * 3 END AS model_id,
       o_orderkey AS bus_offset
       FROM orders WHERE o_orderkey % 5 = 0
       UNION ALL
       SELECT CAST(NULL AS BIGINT), 'error', CAST(NULL AS BIGINT), CAST(-1 AS BIGINT)"""

  /** DuckDB SQL fragment parsing the first 12 hex chars of column/expr
    * `hx` into the 48-bit integer they encode — the oracle-side twin of
    * `conv(substring(hx, 1, 12), 16, 10)`. Generated, not hand-typed:
    * twelve strpos terms with exact power-of-16 multipliers.
    */
  private def duckHex48(hx: String): String =
    (0 until 12).map { i =>
      val mult = 1L << (4 * (11 - i))
      s"(strpos('0123456789abcdef', substr($hx, ${i + 1}, 1)) - 1) * $mult"
    }.mkString("(", "\n             + ", ")")

  // --- x38: PII redaction (emails / IPv4 / phone spans -> placeholders) --
  // The synthetic corpus carries no PII, so the query derives a
  // deterministic raw text (doc_id-keyed PII suffixes) in BOTH engines
  // and gates the operator on it: per-category counts on the raw text
  // (the audit signal) plus the placeholder-redacted text itself.
  def x38PiiRedact(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    val did = col("doc_id")
    val raw = concat(col("text"),
      when(pmod(did, lit(4L)) === 0L,
        concat(lit(" contact user"), did.cast("string"), lit("@example.com now")))
      .when(pmod(did, lit(4L)) === 1L,
        concat(lit(" node ip 10."), pmod(did, lit(256L)).cast("string"),
          lit(".0."), pmod(did, lit(100L)).cast("string"), lit(" up")))
      .when(pmod(did, lit(4L)) === 2L,
        concat(lit(" call +1 555 "), lpad(pmod(did, lit(10000L)).cast("string"), 4, "0"),
          lit(" ok")))
      .otherwise(lit("")))
    d.select(
      did,
      Redaction.redact(raw).as("clean"),
      Redaction.piiCount(raw, "email").as("n_email"),
      Redaction.piiCount(raw, "ipv4").as("n_ip"),
      Redaction.piiCount(raw, "phone").as("n_phone"))
  }

  val x38Sql: String =
    """WITH r AS (SELECT doc_id, text ||
         CASE WHEN doc_id % 4 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
              WHEN doc_id % 4 = 1 THEN ' node ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR) || ' up'
              WHEN doc_id % 4 = 2 THEN ' call +1 555 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ok'
              ELSE '' END AS raw
       FROM documents)
       SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(raw,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
           '\+\d(?:[ -]?\d){7,14}', '<PHONE>', 'g') AS clean,
         CAST(len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
         CAST(len(regexp_extract_all(raw, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
         CAST(len(regexp_extract_all(raw, '\+\d(?:[ -]?\d){7,14}')) AS BIGINT) AS n_phone
       FROM r"""

  // --- x39: weighted sample without replacement (Efraimidis-Spirakis) ----
  // Weight = word count (longer docs favored); k = 100. The oracle
  // replicates the exact key algebra: u from the md5 48-bit prefix,
  // key = round(ln(u)/w, 6), top-k by key desc with doc_id tiebreak.
  def x39WeightedSample(spark: SparkSession, dir: String): DataFrame =
    Sampling.weightedTopK(
      t(spark, dir, "documents"), "doc_id", TextAnalysis.wordCount(col("text")), 100)
      .select(col("doc_id"), col("sample_rank"), col("es_key"))

  val x39Sql: String =
    s"""WITH w AS (SELECT doc_id,
         len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS wc,
         md5(CAST(doc_id AS VARCHAR)) AS hx
       FROM documents),
       h AS (SELECT doc_id, wc, ${duckHex48("hx")} AS h48 FROM w),
       k AS (SELECT doc_id,
             round(ln((CAST(h48 AS DOUBLE) + 0.5) / 281474976710656.0)
                   / greatest(CAST(wc AS DOUBLE), 1.0), 6) AS es_key FROM h),
       r AS (SELECT doc_id, es_key,
             row_number() OVER (ORDER BY es_key DESC, doc_id) AS rn FROM k)
       SELECT doc_id, CAST(rn AS BIGINT) AS sample_rank, es_key
       FROM r WHERE rn <= 100"""

  // --- x40: KMV distinct-count sketch (token bigrams per language) -------
  // The mergeable-sketch answer to count(DISTINCT) at corpus scale; the
  // oracle replicates the sketch bit-for-bit from md5-hex order
  // statistics (k = 64, estimate = (k-1) / normalized kth hash).
  def x40KmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // bigrams relationally (posexplode + lead over the doc window) — the
    // array-HOF spelling is CodegenFallback and ~5x slower at sf0.1
    val ws = t(spark, dir, "documents")
      .select(col("lang"), col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "w")))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bg = ws.withColumn("__w1", lead(col("w"), 1).over(byDoc))
      .filter(col("__w1").isNotNull)
      .select(col("lang"), concat_ws(" ", col("w"), col("__w1")).as("bg"))
    Sketches.kmvDistinct(bg, "lang", "bg", k = 64)
  }

  val x40Sql: String =
    s"""WITH w AS (SELECT lang,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws
       FROM documents),
       b AS (SELECT lang, unnest(list_transform(generate_series(1, len(ws) - 1),
             i -> ws[i] || ' ' || ws[i + 1])) AS bg
         FROM w WHERE len(ws) >= 2),
       hd AS (SELECT DISTINCT lang, substr(md5(bg), 1, 12) AS hx FROM b),
       r AS (SELECT lang, hx, row_number() OVER (PARTITION BY lang ORDER BY hx) AS rn FROM hd),
       s AS (SELECT lang, count(*) AS nd FROM hd GROUP BY 1),
       kth AS (SELECT lang, hx FROM r WHERE rn = 64)
       SELECT s.lang,
         CAST(least(s.nd, 64) AS BIGINT) AS n_vals,
         kth.hx AS kth_hash,
         CASE WHEN kth.hx IS NOT NULL
              THEN 63.0 / (CAST(${duckHex48("kth.hx")} AS DOUBLE) / 281474976710656.0)
              ELSE CAST(least(s.nd, 64) AS DOUBLE) END AS est_distinct
       FROM s LEFT JOIN kth ON s.lang = kth.lang"""

  // --- x41: overlapping token-window chunking (size 40, stride 20) -------
  def x41DocChunks(spark: SparkSession, dir: String): DataFrame =
    Chunking.tokenChunks(t(spark, dir, "documents"), Seq("doc_id"), "text", 40, 20)

  val x41Sql: String =
    """WITH w AS (SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws
       FROM documents),
       s AS (SELECT doc_id, ws, unnest(generate_series(0, len(ws) - 1, 20)) AS st
         FROM w WHERE len(ws) > 0)
       SELECT doc_id,
         CAST(st // 20 AS BIGINT) AS chunk_idx,
         CAST(st AS BIGINT) AS start_tok,
         CAST(least(40, len(ws) - st) AS BIGINT) AS n_toks,
         array_to_string(list_slice(ws, st + 1, st + 40), ' ') AS chunk_text
       FROM s"""

  // --- x42: stream-stream interval join (clicks x purchases, <= 6h) ------
  // Arrival batches are assigned in event-time order (nothing droppable),
  // so the watermarked stream-stream join's append result equals the
  // batch interval join — the oracle. What the gate pins is the join
  // plumbing itself: two watermarked sources, bounded join state,
  // min-across-sources watermark, exactly-once match emission.
  def x42StreamJoin(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamJoin
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val nBatches = 4
    val ev = t(spark, dir, "events")
      .transform(e => e.select(col("user_id"), col("event_type"), Events.epochMicros(e).as("tu")))
    val bounds = x36Bounds.computeIfAbsent(dir, _ => {
      val r = ev.agg(min("tu"), max("tu")).collect().head
      if (r.isNullAt(0)) None else Some((r.getLong(0), r.getLong(1)))
    })
    if (bounds.isEmpty)
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(
          "user_id BIGINT, click_tu BIGINT, purchase_tu BIGINT"))
    val (mn, mx) = bounds.get
    val batch = least(
      expr(s"((tu - ${mn}L) * $nBatches) div (${mx}L - ${mn}L + 1)"), lit(nBatches - 1L))
    def side(tpe: String): DataFrame = ev
      .filter(col("event_type") === tpe)
      .withColumn("__ab", batch)
      .select(col("tu"), col("user_id"), col("__ab"))
    StreamJoin.replayedIntervalJoin(spark,
      side("click"), side("purchase"),
      "tu", "user_id", "__ab",
      s"/tmp/graft/sj_$tag", "1 hour", 21600000000L, s"x42_sj_$tag")
      .select(col("user_id"), col("l_tu").as("click_tu"), col("r_tu").as("purchase_tu"))
  }

  val x42Sql: String =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tu FROM events),
       c AS (SELECT user_id, tu FROM e WHERE event_type = 'click'),
       p AS (SELECT user_id, tu FROM e WHERE event_type = 'purchase')
       SELECT c.user_id, c.tu AS click_tu, p.tu AS purchase_tu
       FROM c JOIN p ON c.user_id = p.user_id
        AND p.tu >= c.tu AND p.tu <= c.tu + 21600000000"""

  /** DuckDB SQL fragment for the Morton interleave of two 16-bit rank
    * expressions — the oracle-side twin of [[ZOrder.zValue]]'s 32
    * shift/mask terms, generated with the same exact powers of two.
    */
  private def duckZ(x: String, y: String): String =
    (0 until graft.ext.ZOrder.Bits).map { i =>
      s"(($x // ${1L << i}) % 2) * ${1L << (2 * i)} + (($y // ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString("(", "\n             + ", ")")

  // --- x43: Z-order clustering stats (multi-dim data-skipping layout) ----
  // lineitem clustered on (l_partkey, l_suppkey): per-z-bucket row counts
  // and min/max of BOTH dimensions — the file-level skipping metadata a
  // Z-ordered layout publishes. ScaleSpec asserts the skipping property
  // itself (bounded per-bucket ranges in both dimensions).
  def x43ZOrderStats(spark: SparkSession, dir: String): DataFrame =
    graft.ext.ZOrder.zOrderStats(
      t(spark, dir, "lineitem").select(col("l_partkey"), col("l_suppkey")),
      "l_partkey", "l_suppkey", 16)

  val x43Sql: String =
    s"""WITH b AS (SELECT min(l_partkey) AS xmn, max(l_partkey) AS xmx,
                         min(l_suppkey) AS ymn, max(l_suppkey) AS ymx FROM lineitem),
       r AS (SELECT l_partkey, l_suppkey,
             ((l_partkey - xmn) * 65536) // (xmx - xmn + 1) AS rx,
             ((l_suppkey - ymn) * 65536) // (ymx - ymn + 1) AS ry
         FROM lineitem, b),
       z AS (SELECT l_partkey, l_suppkey, ${duckZ("rx", "ry")} AS zv FROM r)
       SELECT (zv * 16) // 4294967296 AS bucket,
         CAST(count(*) AS BIGINT) AS n,
         CAST(min(l_partkey) AS BIGINT) AS x_min, CAST(max(l_partkey) AS BIGINT) AS x_max,
         CAST(min(l_suppkey) AS BIGINT) AS y_min, CAST(max(l_suppkey) AS BIGINT) AS y_max
       FROM z GROUP BY 1"""

  // --- x44: streaming dedup within the watermark horizon -----------------
  // ~10% of events are re-sent 1s later (same id) — the classic at-least-
  // once re-delivery. dropDuplicatesWithinWatermark must drop every
  // re-arrival (both copies sit far inside the 30-minute horizon), so the
  // surviving ids equal the batch distinct — the oracle. The kept row's
  // WHICH-copy is racy within a micro-batch, so the gate emits ids only.
  def x44StreamDedup(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamDedup
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val nBatches = 4
    val ev = t(spark, dir, "events")
      .transform(e => e.select(col("event_id"), Events.epochMicros(e).as("tu")))
    val bounds = x36Bounds.computeIfAbsent(dir, _ => {
      val r = ev.agg(min("tu"), max("tu")).collect().head
      if (r.isNullAt(0)) None else Some((r.getLong(0), r.getLong(1)))
    })
    if (bounds.isEmpty)
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL("event_id BIGINT"))
    val (mn, mx) = bounds.get
    val dups = ev.filter(TextAnalysis.md5Bucket(col("event_id")) < 6553L)
      .withColumn("tu", col("tu") + 1000000L)
    val all = ev.unionByName(dups).withColumn("__ab", least(
      expr(s"((tu - ${mn}L) * $nBatches) div (${mx}L - ${mn}L + 1)"), lit(nBatches - 1L)))
    StreamDedup.replayedDedup(spark, all, "tu", "event_id", "__ab",
      s"/tmp/graft/sd_$tag", "30 minutes", s"x44_sd_$tag")
      .select(col("event_id"))
  }

  val x44Sql: String = "SELECT DISTINCT event_id FROM events"

  // --- x45: streaming upsert into the manifest-committed table -----------
  // The lakehouse sink: a base snapshot of orders is written as a
  // ManifestStore table, then a stream of updates (price corrections for
  // okey % 3 = 0) and inserts (new okey % 7 = 0 keys, offset past the key
  // space) replays in 3 micro-batches, each merging atomically. The final
  // table must equal the batch upsert — which is the oracle. Each key
  // appears in exactly one batch, so merge order is immaterial and the
  // at-least-once replay contract (StreamUpsert scaladoc) is convergent.
  def x45StreamUpsert(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.ManifestStore
    import graft.streaming.StreamUpsert
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val orders = t(spark, dir, "orders")
    val outSchema =
      org.apache.spark.sql.types.StructType.fromDDL("okey BIGINT, price DOUBLE, pt BIGINT")
    // empty base table: nothing to write, merge, or read (ManifestStore
    // rejects reading a zero-partition table by contract)
    if (orders.isEmpty)
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), outSchema)
    val base = orders.select(
      col("o_orderkey").as("okey"),
      col("o_totalprice").as("price"),
      pmod(col("o_orderkey"), lit(8L)).as("pt"))
    // the table mutates per run: fresh dir per invocation, previous run's
    // table reclaimed so repeated bench passes don't accumulate in /tmp
    val table = FreshTables.next(spark, dir, "smu")
    ManifestStore.write(spark, base, table, "pt")
    val updates = orders.filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey").as("okey"),
        (col("o_totalprice") * 2).as("price"),
        pmod(col("o_orderkey"), lit(8L)).as("pt"))
      .unionByName(orders.filter(col("o_orderkey") % 7 === 0)
        .select((col("o_orderkey") + 100000000L).as("okey"),
          col("o_totalprice").as("price"),
          pmod(col("o_orderkey") + 100000000L, lit(8L)).as("pt")))
      // partition-aligned arrival (the realistic ingest shape): batch b
      // carries only partitions pt ≡ b (mod 3), so each micro-batch merge
      // reads and rewrites ~1/3 of the table — exercising the
      // O(touched partitions) contract instead of touching everything
      .withColumn("__ab", pmod(col("pt"), lit(3L)))
    StreamUpsert.replayedMerge(spark, updates, Seq("okey", "price", "pt"), "__ab",
      s"/tmp/graft/smu_in_$tag", table, Seq("okey"), Seq("pt"))
    ManifestStore.read(spark, table).select(
      col("okey").cast("long").as("okey"),
      col("price").cast("double").as("price"),
      col("pt").cast("long").as("pt"))
  }

  val x45Sql: String =
    """WITH base AS (SELECT o_orderkey AS okey, o_totalprice AS price FROM orders),
       upd AS (SELECT o_orderkey AS okey, o_totalprice * 2 AS price
               FROM orders WHERE o_orderkey % 3 = 0),
       ins AS (SELECT o_orderkey + 100000000 AS okey, o_totalprice AS price
               FROM orders WHERE o_orderkey % 7 = 0),
       fin AS (SELECT b.okey, coalesce(u.price, b.price) AS price
               FROM base b LEFT JOIN upd u ON b.okey = u.okey
               UNION ALL SELECT okey, price FROM ins)
       SELECT okey, price, CAST(okey % 8 AS BIGINT) AS pt FROM fin"""

  // --- x46: end-to-end corpus funnel (quality -> dedup -> decontaminate) --
  // The whole training-data pipeline as ONE composition of the library's
  // operators, gated on its per-source funnel counts: raw corpus docs
  // (the %50=0 slice stands in for the benchmark set, as in x31) pass the
  // x32 quality gate, survivors dedup to their exact-fingerprint keeper
  // (x26 keeper rule), and keepers are dropped when >=20% of their
  // 6-grams leak from the benchmark set (x31 overlap). Stage flags stay
  // monotone (clean => unique => quality), so the funnel is auditable:
  // n_raw >= n_quality >= n_unique >= n_clean per source.
  def x46CorpusFunnel(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val flagged = TextAnalysis.qualityGate(corpus, "text", "lang")
    val kept = flagged.filter(col("keep"))
    val keepers = Dedup.exact(
      kept.withColumn("fp", TextAnalysis.fingerprint(col("text"))),
      Seq("fp"), struct((-length(col("text"))).as("neg_len"), col("doc_id")))
      .select(col("doc_id"), lit(1).as("__keeper"))
    val contam = Dedup.benchmarkOverlap(kept, bench, "doc_id", "text", shingleN = 6)
      .select(col("id").as("doc_id"), col("contamination_ratio"))
    flagged
      .join(keepers, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .withColumn("__unique", col("keep") && col("__keeper").isNotNull)
      .withColumn("__clean",
        col("__unique") && coalesce(col("contamination_ratio"), lit(0.0d)) < 0.2d)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_raw"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_quality"),
        sum(when(col("__unique"), 1L).otherwise(0L)).as("n_unique"),
        sum(when(col("__clean"), 1L).otherwise(0L)).as("n_clean"))
  }

  val x46Sql: String =
    """WITH t0 AS (SELECT doc_id, lang, source, text,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
       FROM documents WHERE doc_id % 50 <> 0),
       m AS (SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS wc,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) END AS awl,
         CASE WHEN length(text) = 0 THEN 0.0
              ELSE CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) END AS pr,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(len(list_filter(toks, x -> list_contains(['the','a','an','of','and','to','in','is','on','for','with','as','by','at','be','this','that','it','from','or','are','was'], x))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) END AS swr
       FROM t0),
       sc AS (
         SELECT doc_id, 'en' AS plang, len(list_filter(['the','and','of','to','is','that','for','with','this','are'], x -> list_contains(toks, x))) AS score FROM t0
         UNION ALL SELECT doc_id, 'es', len(list_filter(['el','la','de','que','los','una','por','del','las','es'], x -> list_contains(toks, x))) FROM t0
         UNION ALL SELECT doc_id, 'fr', len(list_filter(['le','les','des','une','est','dans','pour','que','sur','avec'], x -> list_contains(toks, x))) FROM t0
         UNION ALL SELECT doc_id, 'de', len(list_filter(['der','die','das','und','ist','nicht','mit','ein','für','auf'], x -> list_contains(toks, x))) FROM t0
         UNION ALL SELECT doc_id, 'zh', 0 FROM t0),
       lp AS (SELECT doc_id,
             CASE WHEN score > 0 THEN plang ELSE 'und' END AS lang_pred,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, plang DESC) AS rn
           FROM sc),
       fl AS (SELECT t0.doc_id, t0.source, t0.text,
           (CASE WHEN NOT (m.wc BETWEEN 10 AND 5000) THEN 1 ELSE 0 END
          + CASE WHEN m.swr < 0.05 THEN 1 ELSE 0 END
          + CASE WHEN m.pr > 0.2 THEN 1 ELSE 0 END
          + CASE WHEN NOT (m.awl BETWEEN 2.0 AND 12.0) THEN 1 ELSE 0 END
          + CASE WHEN lp.lang_pred IS DISTINCT FROM t0.lang THEN 1 ELSE 0 END) = 0 AS keep
         FROM t0 JOIN m ON t0.doc_id = m.doc_id
         JOIN lp ON t0.doc_id = lp.doc_id AND lp.rn = 1),
       kept AS (SELECT doc_id, source, text FROM fl WHERE keep),
       kd AS (SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
           length(text) AS len FROM kept),
       kr AS (SELECT doc_id,
             row_number() OVER (PARTITION BY fp ORDER BY len DESC, doc_id) AS rn FROM kd),
       uniq AS (SELECT doc_id FROM kr WHERE rn = 1),
       kw AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS ws FROM kept),
       ksh0 AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(ws) - 5, 0) + 1), i -> array_to_string(ws[i:i+5], ' '))) AS sh FROM kw),
       kposts AS (SELECT doc_id, unnest(sh) AS s FROM ksh0 WHERE len(sh) > 0),
       bw AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS ws
              FROM documents WHERE doc_id % 50 = 0),
       bsh0 AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(ws) - 5, 0) + 1), i -> array_to_string(ws[i:i+5], ' '))) AS sh FROM bw),
       bg AS (SELECT DISTINCT s FROM (SELECT unnest(sh) AS s FROM bsh0 WHERE len(sh) > 0)),
       sizes AS (SELECT doc_id, count(*) AS n FROM kposts GROUP BY 1),
       hits AS (SELECT k.doc_id, count(*) AS h FROM kposts k JOIN bg USING (s) GROUP BY 1),
       contam AS (SELECT s.doc_id, CAST(coalesce(h.h, 0) AS DOUBLE) / CAST(s.n AS DOUBLE) AS cr
                  FROM sizes s LEFT JOIN hits h ON s.doc_id = h.doc_id),
       ann AS (SELECT fl.source, fl.keep,
             (fl.keep AND u.doc_id IS NOT NULL) AS uniq_f,
             (fl.keep AND u.doc_id IS NOT NULL AND coalesce(c.cr, 0) < 0.2) AS clean_f
           FROM fl LEFT JOIN uniq u ON fl.doc_id = u.doc_id
           LEFT JOIN contam c ON fl.doc_id = c.doc_id)
       SELECT source, count(*) AS n_raw,
         CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
         CAST(sum(CASE WHEN uniq_f THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
         CAST(sum(CASE WHEN clean_f THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
       FROM ann GROUP BY 1"""

  // --- x47: exact group quantiles over the value distribution ------------
  // Document-length quantiles per source (the corpus-stats staple). The
  // operator never sorts rows within a group — it aggregates to the
  // distinct-value distribution first (map-side combinable), then windows
  // over that; see the Quantiles scaladoc for the 100 TB argument.
  def x47GroupQuantiles(spark: SparkSession, dir: String): DataFrame =
    Quantiles.groupQuantiles(
      t(spark, dir, "documents"), Seq("source"), "n_chars", Seq(0.5, 0.9, 0.99))

  val x47Sql: String =
    """WITH c AS (SELECT source, n_chars AS v, count(*) AS c FROM documents GROUP BY 1, 2),
       w AS (SELECT source, v, c,
             sum(c) OVER (PARTITION BY source ORDER BY v) AS cum,
             sum(c) OVER (PARTITION BY source) AS n
           FROM c),
       qs AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE), CAST(0.99 AS DOUBLE)]) AS q)
       SELECT source, q, CAST(v AS BIGINT) AS n_chars
       FROM w, qs
       WHERE CAST(floor(q * (n - 1)) + 1 AS BIGINT) > cum - c
         AND CAST(floor(q * (n - 1)) + 1 AS BIGINT) <= cum"""

  // --- x48: incremental MinHash near-dup (increment vs LSH index) --------
  // The daily-ingest near-dup path: the %5=0 increment (x28's split)
  // probes the historical corpus's band index — cross pairs only, exact
  // Jaccard verify. The oracle computes exact cross-pair Jaccard from the
  // inverted index; LSH recall at jaccard >= 0.7 is exact to well past
  // oracle precision (see Dedup.minhashPairsAgainst scaladoc).
  def x48IncrementalMinhash(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    Dedup.minhashPairsAgainst(
      docs.filter(col("doc_id") % 5 === 0),
      docs.filter(col("doc_id") % 5 =!= 0),
      "doc_id", "text", shingleN = 3, bands = 32, rowsPerBand = 2, threshold = 0.7)
  }

  val x48Sql: String =
    """WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS ws FROM documents),
       sh0 AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(ws) - 2, 0) + 1), i -> array_to_string(ws[i:i+2], ' '))) AS sh FROM w),
       sh AS (SELECT doc_id, sh FROM sh0 WHERE len(sh) > 0),
       posts AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       inter AS (SELECT a.doc_id AS inc_id, b.doc_id AS hist_id, count(*) AS i
                 FROM posts a JOIN posts b ON a.s = b.s
                 WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0 GROUP BY 1, 2),
       sizes AS (SELECT doc_id, len(sh) AS n FROM sh)
       SELECT inc_id, hist_id,
         CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) AS jaccard
       FROM inter JOIN sizes na ON na.doc_id = inc_id
       JOIN sizes nb ON nb.doc_id = hist_id
       WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.7"""

  // --- x49: corpus passage dedup (tiled substring dedup) -----------------
  // Lee et al. 2022 substring dedup, tiling approximation: only the
  // corpus-order first occurrence of each repeated k-word tile survives,
  // docs reassembled from survivors. k=3 is test-scale (the synthetic
  // vocabulary is tiny — ~19% of 3-word tiles repeat at sf0.01);
  // production uses 50–100-word tiles on real text.
  def x49PassageDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.passageDedup(t(spark, dir, "documents"), "doc_id", "text", 3)

  val x49Sql: String =
    """WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS ws FROM documents),
       t AS (SELECT doc_id, CAST(u.i AS BIGINT) AS ti,
               array_to_string(ws[u.i*3+1 : u.i*3+3], ' ') AS tile
             FROM w, UNNEST(range(0, CAST(ceil(len(ws)/3.0) AS BIGINT))) AS u(i)),
       r AS (SELECT *, row_number() OVER (PARTITION BY tile ORDER BY doc_id, ti) AS rn FROM t)
       SELECT doc_id,
         coalesce(string_agg(tile, ' ' ORDER BY ti) FILTER (WHERE rn = 1), '') AS clean_text,
         count(*) AS n_tiles,
         count(*) FILTER (WHERE rn = 1) AS n_kept
       FROM r GROUP BY doc_id"""

  // --- x50: near-dup funnel (MinHash → components → keeper) --------------
  // The fuzzy twin of x46's exact-dedup funnel — the standard LLM
  // fuzzy-dedup pass composed end-to-end from library operators: LSH
  // candidate pairs (x04's generator), connected components (x23's
  // funnel), one keeper per cluster. The component label IS the min
  // member id, so the keeper needs no extra pass: a doc survives iff it
  // is unclustered or it is its own cluster label. At 100 TB every stage
  // keeps its own bound (banded buckets, O(log d) contraction rounds,
  // one doc_id-keyed join) — the composition adds only the final join +
  // per-source rollup.
  def x50NearDupFunnel(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val pairs = allPairs(spark, dir)
    val clusters = Dedup.duplicateClusters(pairs)
      .select(col("id").as("doc_id"), col("label").as("cluster_id"))
    docs.join(clusters, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("cluster_id").isNotNull, 1L).otherwise(0L)).as("n_clustered"),
        sum(when(col("cluster_id").isNull ||
          col("cluster_id") === col("doc_id"), 1L).otherwise(0L)).as("n_survivors"))
  }

  val x50Sql: String =
    s"""WITH RECURSIVE ${jaccardCtes(3)},
       ${componentCtes(0.7)},
       cl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
       SELECT d.source, count(*) AS n_docs,
         CAST(sum(CASE WHEN cl.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clustered,
         CAST(sum(CASE WHEN cl.id IS NULL OR cl.cluster_id = d.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors
       FROM documents d LEFT JOIN cl ON d.doc_id = cl.id
       GROUP BY 1"""

  // --- x51: deterministic shard planning (greedy fill in md5 order) ------
  // The layout step before writing training shards: reproducible order
  // (md5 of doc_id, the repo convention), greedy fill to ~8192 chars.
  // The oracle's single global ORDER BY is exactly the funnel the
  // operator's bucket-offset cumsum avoids — see Sharding scaladoc.
  def x51ShardPlan(spark: SparkSession, dir: String): DataFrame =
    Sharding.planShards(t(spark, dir, "documents"), "doc_id", "n_chars", 8192L)

  val x51Sql: String =
    """WITH d AS (SELECT doc_id, coalesce(n_chars, 0) AS n_chars,
           md5(CAST(doc_id AS VARCHAR)) AS mk FROM documents),
       w AS (SELECT doc_id, n_chars,
           coalesce(sum(n_chars) OVER (ORDER BY mk, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
         FROM d)
       SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
         CAST(bef // 8192 AS BIGINT) AS shard_id FROM w"""

  // --- x58: bigram-LM perplexity quality score (CCNet-style) -------------
  // Wenzek et al. 2020: score every doc's mean bigram log-prob under an
  // add-one bigram LM trained on a reference slice (here doc_id % 7 = 0,
  // a held-in "known good" sample). The filter is a predicate on avg_lp;
  // the gate checks the scores themselves. Engine-portable determinism:
  // per-bigram log-probs fixed-pointed at 1e-9 (LONG sum, order-free),
  // mean rounded 6 dp — see LangModel scaladoc.
  def x58PerplexityScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    LangModel.perplexityScore(docs, docs.filter(col("doc_id") % 7 === 0), "doc_id", "text")
  }

  val x58Sql: String =
    """WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
       bi AS (SELECT doc_id, unnest(range(1, len(ws))) AS i, ws FROM t),
       bg AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2 FROM bi),
       lm AS (SELECT w1, w2, count(*) AS c2 FROM bg WHERE doc_id % 7 = 0 GROUP BY 1, 2),
       ctx AS (SELECT w1, sum(c2) AS c1 FROM lm GROUP BY 1),
       v AS (SELECT count(DISTINCT w) AS v
             FROM (SELECT unnest(ws) AS w FROM t WHERE doc_id % 7 = 0)),
       sc AS (SELECT bg.doc_id,
           CAST(round(ln(CAST(COALESCE(lm.c2, 0) + 1 AS DOUBLE)
                         / CAST(COALESCE(ctx.c1, 0) + v.v AS DOUBLE))
                      * 1000000000.0, 0) AS BIGINT) AS lp9
         FROM bg LEFT JOIN lm ON bg.w1 = lm.w1 AND bg.w2 = lm.w2
         LEFT JOIN ctx ON bg.w1 = ctx.w1 CROSS JOIN v)
       SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         round((CAST(sum(lp9) AS DOUBLE) / 1000000000.0)
               / CAST(count(*) AS DOUBLE), 6) AS avg_lp
       FROM sc GROUP BY 1"""

  // --- x59: DSIR importance resampling (hashed-unigram weights) ----------
  // Xie et al. 2023: target = English docs; every doc weighted by how
  // target-like its hashed-token distribution is, top-100 selected via
  // the two-stage salted top-k (no global sort). The oracle's single
  // ORDER BY window is exactly what scoredTopK avoids at scale.
  def x59DsirSample(spark: SparkSession, dir: String): DataFrame = {
    val w = Dsir.importanceWeights(
      t(spark, dir, "documents"), col("lang") === "en", "doc_id", "text")
    Sampling.scoredTopK(w, "doc_id", col("log_w"), 100)
  }

  val x59Sql: String =
    s"""WITH tk0 AS (SELECT doc_id, lang = 'en' AS tgt,
           unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS w
         FROM documents),
       hx AS (SELECT doc_id, tgt, md5(w) AS hx FROM tk0),
       tk AS (SELECT doc_id, tgt, ${duckHex48("hx")} % 1024 AS b FROM hx),
       counts AS (SELECT b, count(*) AS cr,
           sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct FROM tk GROUP BY 1),
       tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM counts),
       lr AS (SELECT b,
           CAST(round(ln((CAST(ct + 1 AS DOUBLE) / CAST(nt + 1024 AS DOUBLE))
                         / (CAST(cr + 1 AS DOUBLE) / CAST(nr + 1024 AS DOUBLE)))
                      * 1000000000.0, 0) AS BIGINT) AS lr9
         FROM counts CROSS JOIN tot),
       dw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
           round(CAST(sum(lr9) AS DOUBLE) / 1000000000.0, 4) AS log_w
         FROM tk JOIN lr USING (b) GROUP BY 1),
       r AS (SELECT doc_id, n_toks, log_w,
           row_number() OVER (ORDER BY log_w DESC, doc_id) AS rn FROM dw)
       SELECT doc_id, n_toks, log_w, CAST(rn AS BIGINT) AS sel_rank
       FROM r WHERE rn <= 100"""

  // --- x60: cross-source near-dup overlap matrix -------------------------
  // Corpus diagnostics: which source pairs share near-duplicate content
  // (the "crawl A re-hosts crawl B" signal that decides dedup ordering).
  // Pure composition: x04's exact-recall MinHash pairs → source lookup →
  // canonical (least, greatest) rollup. max() of per-pair jaccards is
  // order-free, so no fixed-point machinery is needed.
  def x60SourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val pairs = allPairs(spark, dir)
    val src = docs.select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("id_a"), col("source").as("sa")), "id_a")
      .join(src.select(col("doc_id").as("id_b"), col("source").as("sb")), "id_b")
      .groupBy(
        least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"), max(col("jaccard")).as("max_jaccard"))
  }

  val x60Sql: String =
    s"""WITH ${jaccardCtes(3)},
       p AS (SELECT id_a, id_b,
           CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) AS j
         FROM inter JOIN sizes na ON na.doc_id = id_a
         JOIN sizes nb ON nb.doc_id = id_b
         WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.7),
       ps AS (SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b, j
         FROM p JOIN documents da ON da.doc_id = id_a
         JOIN documents db ON db.doc_id = id_b)
       SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs,
         max(j) AS max_jaccard
       FROM ps GROUP BY 1, 2"""

  // --- x61: training-mixture recipe plan ---------------------------------
  // The Pile/Dolma "data recipe" table: per-source token allocation,
  // sampling rate, and epoch count under α=0.5 temperature balancing for
  // a 200k-token budget (chars stand in for tokens — same arithmetic).
  def x61MixturePlan(spark: SparkSession, dir: String): DataFrame =
    Sampling.mixturePlan(t(spark, dir, "documents"), "source", "n_chars", 200000L)

  val x61Sql: String =
    """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(coalesce(n_chars, 0)) AS BIGINT) AS n_toks FROM documents GROUP BY 1),
       w AS (SELECT *, CAST(floor(sqrt(CAST(n_toks AS DOUBLE)) * 1000) AS BIGINT) AS wq FROM c),
       t AS (SELECT sum(wq) AS tw FROM w),
       a AS (SELECT source, n_docs, n_toks,
             CAST((200000 * wq) // tw AS BIGINT) AS alloc_toks
             FROM w CROSS JOIN t)
       SELECT source, n_docs, n_toks, alloc_toks,
         CAST(CASE WHEN n_toks = 0 THEN 0
              ELSE (alloc_toks + n_toks - 1) // n_toks END AS BIGINT) AS epochs,
         CASE WHEN n_toks = 0 THEN 0.0
              ELSE round(CAST(alloc_toks AS DOUBLE) / CAST(n_toks AS DOUBLE), 6) END AS sample_rate
       FROM a"""

  // --- x62: SRP-LSH embedding near-dup pairs -----------------------------
  // The LSH-bucketed scale path for vector similarity (vs x27's IVF
  // blocking): 8 bands × 6 sign-projection bits, deterministic md5
  // hyperplanes that the oracle rebuilds bit-identically, exact-cosine
  // verify at 0.4. The oracle mirrors the FULL pipeline (planes, signs,
  // buckets, verify), so banded recall cancels out of the comparison.
  def x62SrpNearDup(spark: SparkSession, dir: String): DataFrame =
    Similarity.srpNearDupPairs(t(spark, dir, "embeddings"), "vec_id", "embedding",
      bands = 8, bitsPerBand = 6, threshold = 0.4)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))

  val x62Sql: String = {
    val h48 = duckHex48("hx")
    s"""WITH pl0 AS (SELECT i.i AS i, j.j AS j,
           md5('srp_' || CAST(i.i AS VARCHAR) || '_' || CAST(j.j AS VARCHAR)) AS hx
         FROM (SELECT unnest(range(0, 48)) AS i) i,
              (SELECT unnest(range(1, 65)) AS j) j),
       pl1 AS (SELECT i, j, 2.0 * ((CAST($h48 AS DOUBLE) + 0.5) / 281474976710656.0) - 1.0 AS r FROM pl0),
       planes AS (SELECT i, list(r ORDER BY j) AS rv FROM pl1 GROUP BY 1),
       v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
       n AS (SELECT vec_id, ve, sqrt(list_sum(list_transform(ve, x -> x * x))) AS nrm FROM v),
       bits AS (SELECT vec_id, i // 6 AS band, i % 6 AS bit,
           CASE WHEN list_sum(list_transform(range(1, 65), k -> ve[k] * rv[k])) >= 0
                THEN CAST(power(2, i % 6) AS BIGINT) ELSE 0 END AS bval
         FROM n CROSS JOIN planes WHERE nrm > 0),
       sig AS (SELECT vec_id, band, sum(bval) AS bucket FROM bits GROUP BY 1, 2),
       cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         FROM sig a JOIN sig b
           ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
       scored AS (SELECT id_a, id_b,
           list_sum(list_transform(range(1, 65), k -> na.ve[k] * nb.ve[k])) / (na.nrm * nb.nrm) AS cos
         FROM cand JOIN n na ON na.vec_id = id_a JOIN n nb ON nb.vec_id = id_b)
       SELECT id_a, id_b, round(cos, 6) AS cosine FROM scored WHERE cos >= 0.4"""
  }

  // --- x63: embedding-corpus funnel (SRP dedup → IVF layout → int8 audit) -
  // The vector-side twin of x46/x57's text funnels, composed end to end
  // from library operators: SRP-banded near-dup pairs (x62) → keep-first
  // dedup (a vector survives unless it appears as the LATER member of a
  // near-dup pair) → IVF assignment of survivors (x16's layout step —
  // at 100 TB the centroid id becomes the write-time partition key) →
  // per-bucket int8 quantization-error audit (x19's storage form; the
  // max-|error| column answers "is 4×-smaller storage safe for this
  // bucket"). Output is O(centroids) rows. The per-vector quant-error
  // HOF is bounded (64 dims) and off the hot path; at production scale
  // it would join the codegen'd expression family, and the survivor set
  // (consumed by both the assignment and the audit — recomputed here)
  // would be a persisted table between stages, as x48's index is.
  def x63EmbeddingFunnel(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val pairs = Similarity.srpNearDupPairs(emb, "vec_id", "embedding",
      bands = 8, bitsPerBand = 6, threshold = 0.4)
    val dropped = pairs.select(col("id_b").as("vec_id")).distinct()
    val kept = emb.join(dropped, Seq("vec_id"), "left_anti")
    val centroids = kept.filter(col("vec_id") % 50 === 0)
    val assigned = Similarity.ivfAssign(kept, centroids, "vec_id", "embedding")
    val dv = col("embedding").cast("array<double>")
    val scale = array_max(transform(dv, x => abs(x)))
    val qerr = array_max(transform(dv,
      x => abs(round(x / scale * 127) * scale / lit(127.0d) - x)))
    assigned
      .withColumn("qerr", qerr)
      .groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_vectors"), round(max(col("qerr")), 6).as("max_qerr"))
  }

  val x63Sql: String = {
    val h48 = duckHex48("hx")
    s"""WITH pl0 AS (SELECT i.i AS i, j.j AS j,
           md5('srp_' || CAST(i.i AS VARCHAR) || '_' || CAST(j.j AS VARCHAR)) AS hx
         FROM (SELECT unnest(range(0, 48)) AS i) i,
              (SELECT unnest(range(1, 65)) AS j) j),
       pl1 AS (SELECT i, j, 2.0 * ((CAST($h48 AS DOUBLE) + 0.5) / 281474976710656.0) - 1.0 AS r FROM pl0),
       planes AS (SELECT i, list(r ORDER BY j) AS rv FROM pl1 GROUP BY 1),
       v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
       n AS (SELECT vec_id, ve, sqrt(list_sum(list_transform(ve, x -> x * x))) AS nrm FROM v),
       bits AS (SELECT vec_id, i // 6 AS band, i % 6 AS bit,
           CASE WHEN list_sum(list_transform(range(1, 65), k -> ve[k] * rv[k])) >= 0
                THEN CAST(power(2, i % 6) AS BIGINT) ELSE 0 END AS bval
         FROM n CROSS JOIN planes WHERE nrm > 0),
       sig AS (SELECT vec_id, band, sum(bval) AS bucket FROM bits GROUP BY 1, 2),
       cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         FROM sig a JOIN sig b
           ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
       pairs AS (SELECT id_a, id_b
         FROM cand JOIN n na ON na.vec_id = id_a JOIN n nb ON nb.vec_id = id_b
         WHERE list_sum(list_transform(range(1, 65), k -> na.ve[k] * nb.ve[k])) / (na.nrm * nb.nrm) >= 0.4),
       kept AS (SELECT * FROM n WHERE vec_id NOT IN (SELECT id_b FROM pairs)),
       c AS (SELECT vec_id AS centroid_id, ve AS cv, nrm AS cn FROM kept WHERE vec_id % 50 = 0),
       s AS (SELECT k.vec_id, c.centroid_id,
           list_sum(list_transform(range(1, 65), k2 -> k.ve[k2] * c.cv[k2])) / (k.nrm * c.cn) AS sim
         FROM kept k CROSS JOIN c),
       r AS (SELECT vec_id, centroid_id,
             row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, centroid_id) AS rn FROM s),
       a AS (SELECT vec_id, centroid_id FROM r WHERE rn = 1),
       qe AS (SELECT k.vec_id,
           list_max(list_transform(k.ve,
             x -> abs(round(x / sc.scale * 127) * sc.scale / 127.0 - x))) AS qerr
         FROM kept k JOIN (SELECT vec_id, list_max(list_transform(ve, x -> abs(x))) AS scale FROM kept) sc
           ON sc.vec_id = k.vec_id)
       SELECT a.centroid_id, CAST(count(*) AS BIGINT) AS n_vectors,
         round(max(qe.qerr), 6) AS max_qerr
       FROM a JOIN qe ON qe.vec_id = a.vec_id
       GROUP BY 1"""
  }

  // --- x64: robust per-source outlier stats (median / MAD) ---------------
  // Data-quality monitoring: exact nearest-rank median and MAD per
  // source, plus the count of docs beyond 3×MAD (Leys et al. 2013's
  // robust outlier recipe). Entirely integer arithmetic on n_chars —
  // bit-identical on any engine; two distribution-level shuffles, never
  // a per-group row sort.
  def x64OutlierStats(spark: SparkSession, dir: String): DataFrame =
    Quantiles.robustOutlierStats(t(spark, dir, "documents"), Seq("source"), "n_chars", 3)

  val x64Sql: String =
    """WITH d AS (SELECT source, n_chars FROM documents WHERE n_chars IS NOT NULL),
       c1 AS (SELECT source, n_chars AS v, count(*) AS c FROM d GROUP BY 1, 2),
       w1 AS (SELECT source, v, c,
             sum(c) OVER (PARTITION BY source ORDER BY v) AS cum,
             sum(c) OVER (PARTITION BY source) AS n FROM c1),
       med AS (SELECT source, v AS med FROM w1
         WHERE CAST(floor(0.5 * (n - 1)) + 1 AS BIGINT) > cum - c
           AND CAST(floor(0.5 * (n - 1)) + 1 AS BIGINT) <= cum),
       dev AS (SELECT d.source, abs(d.n_chars - med.med) AS dv, med.med
         FROM d JOIN med USING (source)),
       c2 AS (SELECT source, dv, count(*) AS c FROM dev GROUP BY 1, 2),
       w2 AS (SELECT source, dv, c,
             sum(c) OVER (PARTITION BY source ORDER BY dv) AS cum,
             sum(c) OVER (PARTITION BY source) AS n FROM c2),
       mad AS (SELECT source, dv AS mad FROM w2
         WHERE CAST(floor(0.5 * (n - 1)) + 1 AS BIGINT) > cum - c
           AND CAST(floor(0.5 * (n - 1)) + 1 AS BIGINT) <= cum)
       SELECT dev.source, CAST(count(*) AS BIGINT) AS n,
         CAST(min(dev.med) AS BIGINT) AS median,
         CAST(min(mad.mad) AS BIGINT) AS mad,
         CAST(sum(CASE WHEN dev.dv > mad.mad * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
       FROM dev JOIN mad USING (source)
       GROUP BY 1"""

  // --- x65: day-over-day maintained dedup stores -------------------------
  // The production form of x57's historical stores: the fingerprint set
  // and the MinHash/LSH index are PERSISTED ManifestStore tables (x57
  // used localCheckpoint stand-ins). Day 1 builds them from the
  // historical slice; the day-2 increment is probed against the TABLES
  // (the historical corpus is not an input to the probe); the day's
  // clean docs are then folded into both stores by partition-pruned
  // merges, and a re-probe against the merged fingerprint table shows
  // them as historical — the day-over-day contract end to end. In-gate
  // requires pin the index merge (rows = hist index + clean-doc index,
  // disjoint ids). The oracle mirrors the dedup semantics; its
  // `is_exact_dup_after` is the closed form of "the merge folded exactly
  // the clean docs in" — any dropped/duplicated/mis-pruned partition in
  // the Spark-side merge diverges from it.
  def x65DedupStoreDaily(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.DedupStores
    import graft.sources.ManifestStore
    val docs = t(spark, dir, "documents")
    val inc = docs.filter(col("doc_id") % 5 === 0)
    val hist = docs.filter(col("doc_id") % 5 =!= 0)
    val fpT = FreshTables.next(spark, dir, "fpstore")
    val idxT = FreshTables.next(spark, dir, "idxstore")
    DedupStores.build(spark, hist, "doc_id", "text", fpT, idxT)
    val day1 = DedupStores.probe(spark, inc, "doc_id", "text", fpT, idxT)
      .localCheckpoint()
    val cleanDocs = inc.join(
      day1.filter(col("clean")).select(col("doc_id")), Seq("doc_id"))
    val idxBefore = ManifestStore.read(spark, idxT).count()
    // one signature pass: the accounting count and the append share the
    // materialized clean-doc index
    val cleanIdx = Dedup.minhashIndex(cleanDocs, "doc_id", "text").localCheckpoint()
    val incIdxRows = cleanIdx.count()
    DedupStores.append(spark, cleanDocs, "doc_id", "text", fpT, idxT,
      prebuiltIdx = Some(cleanIdx))
    val idxAfter = ManifestStore.read(spark, idxT).count()
    require(idxAfter == idxBefore + incIdxRows,
      s"x65: index merge folded $idxAfter rows, expected $idxBefore + $incIdxRows")
    // distinct: the store holds (fp, id) rows — a shared fp must not
    // fan out the flag join
    val merged = ManifestStore.read(spark, fpT)
      .select(col("fp")).distinct().withColumn("__a", lit(1))
    day1.join(merged, Seq("fp"), "left")
      .withColumn("is_exact_dup_after", col("__a").isNotNull)
      .select(col("doc_id"), col("is_exact_dup"), col("is_near_dup"),
        col("clean"), col("is_exact_dup_after"))
  }

  val x65Sql: String =
    """WITH dfp AS (SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
         FROM documents WHERE doc_id % 5 = 0),
       hfp AS (SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
         FROM documents WHERE doc_id % 5 <> 0),
       kw AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS ws
              FROM documents WHERE doc_id % 5 = 0),
       ksh AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(ws) - 2, 0) + 1), i -> array_to_string(ws[i:i+2], ' '))) AS sh FROM kw),
       kposts AS (SELECT doc_id, unnest(sh) AS s FROM ksh WHERE len(sh) > 0),
       hw AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS ws
              FROM documents WHERE doc_id % 5 <> 0),
       hsh AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(ws) - 2, 0) + 1), i -> array_to_string(ws[i:i+2], ' '))) AS sh FROM hw),
       hposts AS (SELECT doc_id, unnest(sh) AS s FROM hsh WHERE len(sh) > 0),
       inter AS (SELECT a.doc_id AS inc_id, b.doc_id AS hist_id, count(*) AS i
                 FROM kposts a JOIN hposts b ON a.s = b.s GROUP BY 1, 2),
       ks AS (SELECT doc_id, len(sh) AS n FROM ksh WHERE len(sh) > 0),
       hs AS (SELECT doc_id, len(sh) AS n FROM hsh WHERE len(sh) > 0),
       nd AS (SELECT DISTINCT inc_id FROM inter
              JOIN ks ON ks.doc_id = inc_id JOIN hs ON hs.doc_id = hist_id
              WHERE CAST(i AS DOUBLE) / CAST(ks.n + hs.n - i AS DOUBLE) >= 0.7),
       flags AS (SELECT dfp.doc_id,
           (hfp.fp IS NOT NULL) AS is_exact_dup,
           (nd.inc_id IS NOT NULL) AS is_near_dup
         FROM dfp LEFT JOIN hfp ON dfp.fp = hfp.fp
         LEFT JOIN nd ON nd.inc_id = dfp.doc_id)
       SELECT doc_id, is_exact_dup, is_near_dup,
         (NOT is_exact_dup AND NOT is_near_dup) AS clean,
         (is_exact_dup OR (NOT is_exact_dup AND NOT is_near_dup)) AS is_exact_dup_after
       FROM flags"""

  // --- x66: hot-user-safe salted sessionization --------------------------
  // x08's rollups through the two-phase salted path (Events
  // .sessionStatsSalted): per-(user, 6h-bucket) gaps-and-islands, then a
  // session-granularity boundary merge — a user owning half the events
  // shards across buckets instead of serializing one reducer. The
  // oracle is the PLAIN per-user session rollup: salting is an execution
  // strategy, the result must be bucket-width-invariant (the 6h width is
  // 12× the 30-min gap; SaltedSessionSpec pins invariance across widths
  // down to 1 µs and the sharded plan shape under a 50%-hot user).
  def x66SaltedSessions(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    Events.sessionStatsSalted(
      ev.withColumn("ts_us", Events.epochMicros(ev)),
      "user_id", "ts_us", gap = 30L * 60 * 1000000L, tsCol = "ts_us",
      bucketWidth = 6L * 3600L * 1000000L)
  }

  val x66Sql: String =
    """WITH x AS (SELECT user_id, epoch_us(ts) AS e FROM events),
       s AS (SELECT user_id, e,
         CASE WHEN lag(e) OVER (PARTITION BY user_id ORDER BY e) IS NULL
                OR e - lag(e) OVER (PARTITION BY user_id ORDER BY e) > 1800000000
              THEN 1 ELSE 0 END AS ns FROM x),
       g AS (SELECT user_id, e,
         sum(ns) OVER (PARTITION BY user_id ORDER BY e ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq FROM s)
       SELECT user_id, min(e) AS session_start, max(e) AS session_end,
              count(*) AS n_events
       FROM g GROUP BY user_id, session_seq"""

  // Shared oracle CTEs for the k-means family (x67/x68): two unrolled
  // Lloyd iterations from stride-50 seeds, mirroring Clustering's
  // fixed-point determinism conventions exactly — Σ round(x·10⁶) LONG
  // sums for centroid means (order-free), sequential-fold dot products,
  // (sim DESC, cid ASC) assignment tie-break. Ends with `af`:
  // (id, ve, nrm, cid, sim) under the final centroids.
  private def kmeansCtes: String = {
    def iter(i: Int, prev: String): String =
      s"""a$i AS (SELECT id, ve, nrm, cid FROM (
           SELECT n.id, n.ve, n.nrm, c.cid,
             row_number() OVER (PARTITION BY n.id ORDER BY
               list_sum(list_transform(range(1, 65), k -> n.ve[k] * c.cv[k]))
                 / (n.nrm * sqrt(list_sum(list_transform(c.cv, x -> x * x)))) DESC,
               c.cid) AS rn
           FROM n CROSS JOIN $prev c) WHERE rn = 1),
         e$i AS (SELECT cid, p.p AS pos, ve[p.p] AS x
           FROM a$i CROSS JOIN (SELECT unnest(range(1, 65)) AS p) p),
         s$i AS (SELECT cid, pos,
             CAST(sum(CAST(round(x * 1000000) AS BIGINT)) AS BIGINT) AS s,
             count(*) AS c
           FROM e$i GROUP BY 1, 2),
         c$i AS (SELECT cid, list(CAST(s AS DOUBLE) / CAST(c AS DOUBLE) / 1000000.0 ORDER BY pos) AS cv
           FROM s$i GROUP BY 1)"""
    s"""v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
       n0 AS (SELECT id, ve, sqrt(list_sum(list_transform(ve, x -> x * x))) AS nrm FROM v),
       n AS (SELECT * FROM n0 WHERE nrm > 0),
       c0 AS (SELECT id AS cid, ve AS cv FROM n WHERE id % 50 = 0),
       ${iter(1, "c0")},
       ${iter(2, "c1")},
       af AS (SELECT id, ve, nrm, cid, sim FROM (
           SELECT n.id, n.ve, n.nrm, c.cid,
             list_sum(list_transform(range(1, 65), k -> n.ve[k] * c.cv[k]))
               / (n.nrm * sqrt(list_sum(list_transform(c.cv, x -> x * x)))) AS sim,
             row_number() OVER (PARTITION BY n.id ORDER BY
               list_sum(list_transform(range(1, 65), k -> n.ve[k] * c.cv[k]))
                 / (n.nrm * sqrt(list_sum(list_transform(c.cv, x -> x * x)))) DESC,
               c.cid) AS rn
           FROM n CROSS JOIN c2 c) WHERE rn = 1)"""
  }

  // --- x67: spherical k-means cluster stats ------------------------------
  // Two deterministic Lloyd iterations (SemDeDup's clustering step made
  // engine-portable): per-cluster size + mean cosine to the final
  // centroid. The oracle unrolls the identical iterations, so every
  // centroid component and every argmax must match bit-for-bit — a
  // one-ulp divergence anywhere in the double pipeline would flip an
  // assignment and the row hashes.
  def x67KmeansStats(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Clustering.kmeansStats(
      t(spark, dir, "embeddings"), "vec_id", "embedding", stride = 50L, iters = 2)

  val x67Sql: String =
    s"""WITH $kmeansCtes
       SELECT cid, CAST(count(*) AS BIGINT) AS n_vectors,
         round(CAST(sum(CAST(round(sim * 1000000000) AS BIGINT)) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) / 1000000000.0, 6) AS cohesion
       FROM af GROUP BY 1"""

  // --- x68: SemDeDup within-cluster semantic near-dup pairs --------------
  // The payoff of x67's layout: the near-dup pair join is an EQUI-join
  // on the cluster id, so candidate volume is Σ size(cluster)² — bounded
  // by the layout, never N². τ=0.4 sits in the fixture's noise tail for
  // the same reason x62's does (documented in BENCH_SCALE.md); real
  // corpora run τ ≥ 0.9.
  def x68SemanticDedup(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Clustering.semanticDedupPairs(
      t(spark, dir, "embeddings"), "vec_id", "embedding",
      stride = 50L, iters = 2, threshold = 0.4)
      .select(col("id_a"), col("id_b"), col("cid"),
        round(col("cosine"), 6).as("cosine"))

  val x68Sql: String =
    s"""WITH $kmeansCtes
       SELECT a.id AS id_a, b.id AS id_b, a.cid AS cid,
         round(list_sum(list_transform(range(1, 65), k -> a.ve[k] * b.ve[k]))
           / (a.nrm * b.nrm), 6) AS cosine
       FROM af a JOIN af b ON a.cid = b.cid AND a.id < b.id
       WHERE list_sum(list_transform(range(1, 65), k -> a.ve[k] * b.ve[k]))
           / (a.nrm * b.nrm) >= 0.4"""

  // --- x69: BM25 keyword top-k retrieval ---------------------------------
  // Lexical retrieval over the corpus (the keyword complement of the ANN
  // family): three fixed term queries, Okapi BM25 (k1=1.2, b=0.75,
  // Lucene's always-positive idf), top-15 per query. Fixed-point 1e-9
  // partials (x58 convention) make the scores and the (score, id)
  // ranking engine-portable.
  def x69Bm25TopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qs = Seq(
      ("q_hash_join", Seq("hash", "join")),
      ("q_stream", Seq("stream", "window", "batch")),
      ("q_vector", Seq("vector", "data"))).toDF("query_id", "terms")
    Retrieval.bm25TopK(t(spark, dir, "documents"), "doc_id", "text", qs, k = 15)
  }

  val x69Sql: String =
    """WITH toks AS (SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS w
       FROM documents),
       lens AS (SELECT d.doc_id, coalesce(t.len, 0) AS len FROM documents d
         LEFT JOIN (SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM toks GROUP BY 1) t USING (doc_id)),
       stats AS (SELECT CAST(count(*) AS BIGINT) AS nd,
         CAST(sum(len) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM lens),
       qt AS (SELECT * FROM (VALUES
         ('q_hash_join','hash'),('q_hash_join','join'),
         ('q_stream','stream'),('q_stream','window'),('q_stream','batch'),
         ('q_vector','vector'),('q_vector','data')) AS q(query_id, w)),
       tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM toks
         WHERE w IN (SELECT DISTINCT w FROM qt) GROUP BY 1, 2),
       dft AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       sc AS (SELECT qt.query_id, tf.doc_id,
           CAST(sum(CAST(round(
             ln(1.0 + (CAST(nd AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
             * ((CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(len AS DOUBLE) / avgdl))))
             * 1000000000.0) AS BIGINT)) AS BIGINT) AS s9
         FROM tf JOIN dft USING (w) JOIN qt USING (w)
         JOIN lens USING (doc_id) CROSS JOIN stats
         GROUP BY 1, 2),
       r AS (SELECT query_id, doc_id, s9,
           row_number() OVER (PARTITION BY query_id ORDER BY s9 DESC, doc_id) AS rank
         FROM sc)
       SELECT query_id, rank, doc_id,
         round(CAST(s9 AS DOUBLE) / 1000000000.0, 6) AS score
       FROM r WHERE rank <= 15"""

  // --- x70: Misra-Gries heavy hitters + exact verify ---------------------
  // Vocabulary heavy hitters: every token with count >= ceil(N/100),
  // found via a bounded m=256 MG sketch (guaranteed candidate superset
  // for den <= m) + an exact recount of only the candidates — the
  // x55-bloom "sketch prefilter, exact verify" pattern applied to
  // frequency, so the oracle is the plain exact HAVING query.
  def x70HeavyHitters(spark: SparkSession, dir: String): DataFrame =
    Sketches.heavyHitters(
      LangModel.tokenRows(t(spark, dir, "documents"), "doc_id", "text")
        .select(col("w")),
      "w", m = 256, minFractionDen = 100L)

  val x70Sql: String =
    """WITH toks AS (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS w
       FROM documents),
       tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks)
       SELECT w, CAST(count(*) AS BIGINT) AS cnt
       FROM toks CROSS JOIN tot
       GROUP BY w, n
       HAVING count(*) >= (n + 99) // 100"""

  // --- x71: context-window packing plan ----------------------------------
  // Sequence-packing diagnostics for a 4096-token context (n_chars as
  // the token stand-in, x61's convention): docs concatenated in id
  // order, per-source boundary-crossing stats. The Spark side computes
  // global offsets with the two-phase DISTRIBUTED prefix sum (the only
  // unpartitioned window runs over O(buckets) totals); the oracle's
  // single global window is the semantic spec the distributed form must
  // equal.
  def x71PackingStats(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Packing.packingStats(
      t(spark, dir, "documents"), "doc_id", "n_chars", "source",
      capacity = 4096L, bucketWidth = 1000L)

  val x71Sql: String =
    """WITH d AS (SELECT doc_id, source, CAST(coalesce(n_chars, 0) AS BIGINT) AS len
         FROM documents),
       o AS (SELECT doc_id, source, len,
           CAST(coalesce(sum(len) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s
         FROM d),
       c AS (SELECT source, len,
           CASE WHEN len <= 0 THEN 0
                ELSE (s + len - 1) // 4096 - s // 4096 END AS cr
         FROM o)
       SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len) AS BIGINT) AS n_toks,
         CAST(sum(cr) AS BIGINT) AS n_crossings,
         round(CAST(sum(cr) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS crossing_frac
       FROM c GROUP BY 1"""

  // --- x72: hard-negative mining -----------------------------------------
  // Contrastive-training batch construction: for each query vector, the
  // top-5 most-similar vectors with a DIFFERENT label (the
  // highest-confusion negatives). Label inequality rides the broadcast
  // join condition; ranking shares the ANN family's (cosine DESC, id)
  // total order.
  def x72HardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.hardNegatives(emb, emb.filter(col("vec_id") % 25 === 0),
        "vec_id", "embedding", "label", k = 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  val x72Sql: String =
    """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
       n AS (SELECT vec_id, label, ve,
           sqrt(list_sum(list_transform(ve, x -> x * x))) AS nrm FROM v),
       q AS (SELECT * FROM n WHERE vec_id % 25 = 0),
       sc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           list_sum(list_transform(range(1, 65), k -> q.ve[k] * c.ve[k])) / (q.nrm * c.nrm) AS cos
         FROM q JOIN n c ON c.label <> q.label),
       r AS (SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         FROM sc)
       SELECT query_id, rank, neighbor_id, round(cos, 6) AS cosine
       FROM r WHERE rank <= 5"""

  // --- x73: hourly event-volume anomalies --------------------------------
  // Data-quality monitoring on the ingest feed: per event type, hours
  // whose count deviates > 3σ from the type's hourly mean. ENTIRELY
  // integer arithmetic ((c·n − S)² > 9·(n·Q − S²)) — no
  // floating-point threshold anywhere, so both engines agree exactly on
  // the anomaly set.
  def x73EventAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    Events.hourlyAnomalies(
      ev.withColumn("ts_us", Events.epochMicros(ev)), "event_type", "ts_us", k = 3)
  }

  val x73Sql: String =
    """WITH x AS (SELECT event_type, epoch_us(ts) // 3600000000 AS b FROM events),
       h AS (SELECT event_type, b, CAST(count(*) AS BIGINT) AS c FROM x GROUP BY 1, 2),
       st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS q
         FROM h GROUP BY 1),
       a AS (SELECT h.event_type, h.c,
           CASE WHEN (h.c * st.n - st.s) * (h.c * st.n - st.s)
                     > 9 * (st.n * st.q - st.s * st.s)
                THEN 1 ELSE 0 END AS an
         FROM h JOIN st USING (event_type))
       SELECT event_type, CAST(count(*) AS BIGINT) AS n_buckets,
         CAST(sum(c) AS BIGINT) AS n_events,
         CAST(sum(an) AS BIGINT) AS n_anomalies
       FROM a GROUP BY 1"""

  // --- x74: per-doc novelty vs the historical corpus ---------------------
  // Memorization-risk / freshness scoring: fraction of each arrival
  // doc's distinct trigram shingles never seen in history — catches
  // recombined known text that no single pairwise near-dup threshold
  // flags. One posting left-join against the DISTINCT historical
  // shingle set; the store-backed twin (DedupStores.noveltyAgainstStore)
  // is pinned ≡ in StreamingFunnelSpec.
  def x74NoveltyScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    Dedup.noveltyScore(
      docs.filter(col("doc_id") % 5 === 0),
      docs.filter(col("doc_id") % 5 =!= 0),
      "doc_id", "text", shingleN = 3)
  }

  val x74Sql: String =
    """WITH kw AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS ws
              FROM documents WHERE doc_id % 5 = 0),
       ksh AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(ws) - 2, 0) + 1), i -> array_to_string(ws[i:i+2], ' '))) AS sh FROM kw),
       kposts AS (SELECT doc_id, unnest(sh) AS s FROM ksh WHERE len(sh) > 0),
       hw AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS ws
              FROM documents WHERE doc_id % 5 <> 0),
       hsh AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(ws) - 2, 0) + 1), i -> array_to_string(ws[i:i+2], ' '))) AS sh FROM hw),
       hset AS (SELECT DISTINCT s FROM (SELECT unnest(sh) AS s FROM hsh WHERE len(sh) > 0)),
       j AS (SELECT k.doc_id, CASE WHEN h.s IS NOT NULL THEN 1 ELSE 0 END AS seen
             FROM kposts k LEFT JOIN hset h ON h.s = k.s)
       SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(seen) AS BIGINT) AS n_seen,
         round(1.0 - CAST(sum(seen) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS novelty
       FROM j GROUP BY 1"""

  // --- x75: cluster-balanced diversity sample ----------------------------
  // SemDeDup-pipeline companion: cap each semantic cluster's
  // contribution at 20 vectors, chosen by engine-portable md5 rank —
  // head clusters stop dominating the mix. Shares x67's unrolled-Lloyd
  // oracle CTEs.
  def x75BalancedSample(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Clustering.balancedSample(
      t(spark, dir, "embeddings"), "vec_id", "embedding",
      stride = 50L, iters = 2, quota = 20)

  val x75Sql: String =
    s"""WITH $kmeansCtes,
       r AS (SELECT id AS vec_id, cid,
           row_number() OVER (PARTITION BY cid
             ORDER BY md5(CAST(id AS VARCHAR)), id) AS rk
         FROM af)
       SELECT vec_id, cid, rk FROM r WHERE rk <= 20"""

  // --- x76: per-type event-volume trend ----------------------------------
  // Drift monitoring: OLS slope of hourly counts per event type, exact
  // integer sums (x re-based per type so both engines stay in BIGINT)
  // and one rounded double division.
  def x76VolumeTrend(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    Events.volumeTrend(
      ev.withColumn("ts_us", Events.epochMicros(ev)), "event_type", "ts_us")
  }

  val x76Sql: String =
    """WITH x AS (SELECT event_type, epoch_us(ts) // 3600000000 AS b FROM events),
       h AS (SELECT event_type, b, CAST(count(*) AS BIGINT) AS c FROM x GROUP BY 1, 2),
       h0 AS (SELECT event_type, CAST(min(b) AS BIGINT) AS b0 FROM h GROUP BY 1),
       r AS (SELECT h.event_type, h.b - h0.b0 AS xx, h.c FROM h JOIN h0 USING (event_type)),
       s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(xx) AS BIGINT) AS sx, CAST(sum(c) AS BIGINT) AS sy,
           CAST(sum(xx * xx) AS BIGINT) AS sxx, CAST(sum(xx * c) AS BIGINT) AS sxy
         FROM r GROUP BY 1)
       SELECT event_type, n AS n_buckets,
         CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
              ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE), 6) END AS slope
       FROM s"""

  // --- x77: per-source length-distribution drift (JS divergence) ---------
  // Today's arrivals vs history, per source: Jensen-Shannon divergence
  // of the n_chars histogram over 16 shared-bounds integer bins. Exact
  // integer binning, 1e-9 fixed-point log terms (x58 convention).
  // split on doc_id % 3: the fixture assigns source = doc_id % 20, so
  // any split modulus sharing a factor with 20 (2, 5, ...) correlates
  // EXACTLY with source and leaves every source one-sided; 3 is coprime,
  // so each source's ids cycle through all residues
  def x77LengthDrift(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    graft.ext.Drift.jsDivergence(
      docs.filter(col("doc_id") % 3 === 0),
      docs.filter(col("doc_id") % 3 =!= 0),
      "source", "n_chars", bins = 16)
  }

  val x77Sql: String =
    """WITH u AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v,
           CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END AS side
         FROM documents WHERE n_chars IS NOT NULL),
       bd AS (SELECT CAST(min(v) AS BIGINT) AS mn, CAST(max(v) AS BIGINT) AS mx FROM u),
       bn AS (SELECT g, side, ((v - mn) * 16) // (mx - mn + 1) AS bin
         FROM u CROSS JOIN bd),
       h AS (SELECT g, bin,
           CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
           CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
         FROM bn GROUP BY 1, 2),
       tt AS (SELECT g, CAST(sum(ca) AS BIGINT) AS na,
           CAST(sum(cb) AS BIGINT) AS nb FROM h GROUP BY 1
         HAVING sum(ca) > 0 AND sum(cb) > 0),
       terms AS (SELECT h.g,
           CASE WHEN ca > 0 THEN CAST(round(
             (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
             * ln((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
                 / ((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) + CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) / 2.0))
             * 1000000000.0) AS BIGINT) ELSE 0 END AS ta,
           CASE WHEN cb > 0 THEN CAST(round(
             (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
             * ln((CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
                 / ((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) + CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) / 2.0))
             * 1000000000.0) AS BIGINT) ELSE 0 END AS tb,
           na, nb
         FROM h JOIN tt ON tt.g = h.g)
       SELECT g AS source, max(na) AS n_a, max(nb) AS n_b,
         round((CAST(sum(ta) AS DOUBLE) / 1000000000.0
              + CAST(sum(tb) AS DOUBLE) / 1000000000.0) / 2.0, 6) AS js
       FROM terms GROUP BY 1"""

  // --- x78: vocabulary coverage curve ------------------------------------
  // Tokenizer sizing: fraction of corpus token occurrences covered by
  // the top-K token types, K in {5, 10, 20}. The global top-K is the
  // salted two-stage exact top-k; ranking (count DESC, token) is total.
  def x78VocabCoverage(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabCoverage(t(spark, dir, "documents"), "doc_id", "text",
      cutoffs = Seq(5, 10, 20))

  val x78Sql: String =
    """WITH toks AS (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS w
       FROM documents),
       c AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY 1),
       st AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_tokens,
         CAST(count(*) AS BIGINT) AS n_vocab FROM c),
       r AS (SELECT w, cnt, row_number() OVER (ORDER BY cnt DESC, w) AS rk FROM c),
       ks AS (SELECT unnest([5, 10, 20]) AS k)
       SELECT ks.k, st.n_vocab, st.total_tokens,
         round(CAST(sum(r.cnt) AS DOUBLE) / CAST(st.total_tokens AS DOUBLE), 6) AS coverage
       FROM r JOIN ks ON r.rk <= ks.k CROSS JOIN st
       GROUP BY 1, 2, 3"""

  // --- x79: per-label embedding-centroid drift ---------------------------
  // Representation drift between two embedding slices: cosine between
  // each label's fixed-point mean vectors (k-means convention — both
  // engines compute bit-identical centroids).
  def x79EmbeddingDrift(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    graft.ext.Drift.embeddingDrift(
      emb.filter(col("vec_id") % 2 === 0),
      emb.filter(col("vec_id") % 2 =!= 0),
      "label", "embedding")
  }

  val x79Sql: String =
    """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
       ex AS (SELECT label, vec_id % 2 AS side, p.p AS pos, ve[p.p] AS x
         FROM v CROSS JOIN (SELECT unnest(range(1, 65)) AS p) p),
       s AS (SELECT label, side, pos,
           CAST(sum(CAST(round(x * 1000000) AS BIGINT)) AS BIGINT) AS s,
           CAST(count(*) AS BIGINT) AS c
         FROM ex GROUP BY 1, 2, 3),
       m AS (SELECT label, side, max(c) AS n,
           list(CAST(s AS DOUBLE) / CAST(c AS DOUBLE) / 1000000.0 ORDER BY pos) AS mv
         FROM s GROUP BY 1, 2),
       ma AS (SELECT label, n AS n_a, mv AS va FROM m WHERE side = 0),
       mb AS (SELECT label, n AS n_b, mv AS vb FROM m WHERE side = 1)
       SELECT ma.label, ma.n_a, mb.n_b,
         round(list_sum(list_transform(range(1, 65), k -> va[k] * vb[k]))
           / (sqrt(list_sum(list_transform(va, x -> x * x)))
            * sqrt(list_sum(list_transform(vb, x -> x * x)))), 6) AS drift_cosine
       FROM ma JOIN mb USING (label)"""

  // --- x80: train/val/test split + leakage audit -------------------------
  // Eval hygiene WITHIN the corpus (x31/x55 decontaminate against an
  // EXTERNAL benchmark): assign a deterministic 80/10/10 md5-hash split,
  // then count near-dup pairs per split combination — pairs crossing
  // train/test are leakage an eval must not trust. Pairs ride x04's
  // banded-MinHash machinery; the canonical (least, greatest) rollup is
  // x60's convention.
  def x80SplitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val split = Sampling.hashSplit(docs, "doc_id",
        Seq(("train", 52429), ("val", 58982)), "test")
      .select(col("doc_id"), col("split"))
    allPairs(spark, dir)
      .join(split.select(col("doc_id").as("id_a"), col("split").as("sa")), "id_a")
      .join(split.select(col("doc_id").as("id_b"), col("split").as("sb")), "id_b")
      .select(least(col("sa"), col("sb")).as("split_a"),
        greatest(col("sa"), col("sb")).as("split_b"), col("jaccard"))
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"), max(col("jaccard")).as("max_jaccard"))
  }

  val x80Sql: String =
    s"""WITH ${jaccardCtes(3)},
       p AS (SELECT id_a, id_b,
           CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) AS j
         FROM inter JOIN sizes na ON na.doc_id = id_a
         JOIN sizes nb ON nb.doc_id = id_b
         WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.7),
       sp AS (SELECT doc_id,
           CASE WHEN bkt < 52429 THEN 'train'
                WHEN bkt < 58982 THEN 'val' ELSE 'test' END AS split
         FROM (SELECT doc_id,
             CAST((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
                + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
                + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
                + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) AS BIGINT) AS bkt
           FROM documents)),
       ps AS (SELECT least(sa.split, sb.split) AS split_a,
           greatest(sa.split, sb.split) AS split_b, j
         FROM p JOIN sp sa ON sa.doc_id = id_a JOIN sp sb ON sb.doc_id = id_b)
       SELECT split_a, split_b, CAST(count(*) AS BIGINT) AS n_pairs,
         max(j) AS max_jaccard
       FROM ps GROUP BY 1, 2"""

  // --- x81: cross-modality coverage audit --------------------------------
  // Pipeline health before multimodal training: per source, the
  // fraction of docs with a companion embedding (vec_id keys the same
  // id space), plus one __no_primary__ row counting orphan embeddings.
  def x81ModalityCoverage(spark: SparkSession, dir: String): DataFrame =
    Multimodal.coverageAudit(
      t(spark, dir, "documents"), t(spark, dir, "embeddings"),
      "doc_id", "vec_id", "source")

  val x81Sql: String =
    """WITH c AS (SELECT DISTINCT vec_id FROM embeddings),
       m AS (SELECT d.source AS g, CAST(count(*) AS BIGINT) AS n_primary,
           CAST(sum(CASE WHEN c.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched
         FROM documents d LEFT JOIN c ON d.doc_id = c.vec_id
         GROUP BY 1),
       o AS (SELECT '__no_primary__' AS g, CAST(0 AS BIGINT) AS n_primary,
           CAST(count(*) AS BIGINT) AS n_matched
         FROM c WHERE vec_id NOT IN (SELECT DISTINCT doc_id FROM documents)),
       u AS (SELECT * FROM m UNION ALL SELECT * FROM o)
       SELECT g AS source, n_primary, n_matched,
         CASE WHEN n_primary = 0 THEN 0.0
              ELSE round(CAST(n_matched AS DOUBLE) / CAST(n_primary AS DOUBLE), 6) END AS coverage
       FROM u"""

  // --- x82: PMI token-pair association -----------------------------------
  // Collocation mining (Church & Hanks 1990): document-frequency PMI over
  // token-type pairs co-occurring in a document. Pair candidates come
  // from a per-document self-join (Σ_doc v², linear in corpus), never
  // vocab²; support cutoff 5 bounds the output.
  def x82PmiPairs(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.pmiPairs(t(spark, dir, "documents"), "doc_id", "text",
      minPairDocs = 5L)

  val x82Sql: String =
    """WITH tk AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS w
         FROM documents),
       posts AS (SELECT DISTINCT doc_id, w FROM tk),
       dfk AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM posts GROUP BY 1),
       nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS nd FROM posts),
       pr AS (SELECT a.w AS tok_a, b.w AS tok_b, CAST(count(*) AS BIGINT) AS n_ab
         FROM posts a JOIN posts b ON a.doc_id = b.doc_id AND a.w < b.w
         GROUP BY 1, 2 HAVING count(*) >= 5)
       SELECT tok_a, tok_b, n_ab,
         round(ln(CAST(n_ab * nd AS DOUBLE) / CAST(da.df * db.df AS DOUBLE)), 6) AS pmi
       FROM pr JOIN dfk da ON da.w = tok_a JOIN dfk db ON db.w = tok_b
       CROSS JOIN nd"""

  // --- x83: shuffle-key skew profiler ------------------------------------
  // The pre-flight a 100 TB groupBy/join runs on its candidate key: key
  // cardinality, hottest-key share, exact p50/p99 of the per-key count
  // distribution, and distribution entropy — all derived from the
  // O(distinct count-values) distribution, never a per-row sort.
  def x83KeySkew(spark: SparkSession, dir: String): DataFrame =
    Quantiles.keySkewStats(t(spark, dir, "events"),
      Seq("user_id", "event_type"))

  private def skewCtes(k: String, p: String): String =
    s"""${p}c AS (SELECT $k AS k, CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1),
       ${p}d AS (SELECT c, CAST(count(*) AS BIGINT) AS m FROM ${p}c GROUP BY 1),
       ${p}w AS (SELECT c, m,
           CAST(sum(m) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
           CAST(sum(m) OVER () AS BIGINT) AS nk,
           CAST(sum(c * m) OVER () AS BIGINT) AS nr
         FROM ${p}d),
       ${p}s AS (SELECT '$k' AS key_col,
           max(nr) AS n_rows, max(nk) AS n_keys, max(c) AS max_cnt,
           max(CASE WHEN floor(0.5 * (nk - 1)) + 1 > cum - m
                     AND floor(0.5 * (nk - 1)) + 1 <= cum THEN c END) AS p50_cnt,
           max(CASE WHEN floor(0.99 * (nk - 1)) + 1 > cum - m
                     AND floor(0.99 * (nk - 1)) + 1 <= cum THEN c END) AS p99_cnt,
           round(CAST(max(c) AS DOUBLE) / CAST(max(nr) AS DOUBLE), 6) AS top_share,
           round(-CAST(sum(m * CAST(round((CAST(c AS DOUBLE) / nr) * ln(CAST(c AS DOUBLE) / nr) * 1000000000.0) AS BIGINT)) AS DOUBLE) / 1000000000.0, 6) AS entropy
         FROM ${p}w)"""

  val x83Sql: String =
    s"""WITH ${skewCtes("user_id", "u")},
       ${skewCtes("event_type", "e")}
       SELECT * FROM us UNION ALL SELECT * FROM es"""

  // --- x84: per-source corpus data card ----------------------------------
  // The release datasheet: volume, token mass, language mix, within-
  // source exact-dup mass, and the exact length median per source — one
  // table, every column an exact integer or one rounded division.
  def x84DataCard(spark: SparkSession, dir: String): DataFrame =
    DataCard.sourceCard(t(spark, dir, "documents"))

  val x84Sql: String =
    """WITH tk AS (SELECT source, lang, n_chars,
           len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS wc,
           md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
         FROM documents),
       base AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(wc) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
         FROM tk GROUP BY 1),
       lt AS (SELECT source, lang AS top_lang, CAST(count(*) AS BIGINT) AS lc,
           row_number() OVER (PARTITION BY source ORDER BY count(*) DESC, lang) AS rn
         FROM documents GROUP BY source, lang),
       lt1 AS (SELECT source, top_lang, lc FROM lt WHERE rn = 1),
       dup AS (SELECT source,
           CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_docs
         FROM (SELECT source, fp, CAST(count(*) AS BIGINT) AS c
               FROM tk GROUP BY 1, 2) GROUP BY 1),
       med AS (SELECT source, n_chars AS med_chars FROM (
           SELECT source, n_chars,
             row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rk,
             count(*) OVER (PARTITION BY source) AS n
           FROM documents WHERE n_chars IS NOT NULL)
         WHERE rk = floor(0.5 * (n - 1)) + 1)
       SELECT source, n_docs, n_tokens, n_langs, top_lang,
         round(CAST(lc AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS top_lang_share,
         dup_docs, med_chars
       FROM base JOIN lt1 USING (source) JOIN dup USING (source)
       LEFT JOIN med USING (source)"""

  // --- x85: near-dup graph centrality (fixed-point PageRank) -------------
  // Keeper selection upgraded from min-id to most-canonical: PageRank
  // over x04's banded-MinHash pair graph, 3 damped iterations in exact
  // 1e-9 fixed-point LONG arithmetic (every division integral on
  // positive operands — both engines produce bit-identical rank
  // vectors; no floating accumulation anywhere).
  def x85PairCentrality(spark: SparkSession, dir: String): DataFrame =
    Graph.pagerank(
      allPairs(spark, dir),
      "id_a", "id_b", "doc_id", iters = 3)

  private def pagerankCtes(iters: Int): String =
    (1 to iters).map { i =>
      s"""m$i AS (SELECT ud.v, CAST(sum(r${i - 1}.r // ud.deg) AS BIGINT) AS s
           FROM ud JOIN r${i - 1} USING (u) GROUP BY 1),
         r$i AS (SELECT deg.u,
             15000000000 // (100 * nv) + (85 * coalesce(s, 0)) // 100 AS r
           FROM deg LEFT JOIN m$i ON m$i.v = deg.u CROSS JOIN nv)"""
    }.mkString(",\n       ")

  val x85Sql: String =
    s"""WITH ${jaccardCtes(3)},
       e AS (SELECT id_a, id_b
         FROM inter JOIN sizes na ON na.doc_id = id_a
         JOIN sizes nb ON nb.doc_id = id_b
         WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.7),
       und AS (SELECT id_a AS u, id_b AS v FROM e
               UNION ALL SELECT id_b, id_a FROM e),
       deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY 1),
       nv AS (SELECT CAST(count(*) AS BIGINT) AS nv FROM deg),
       ud AS (SELECT und.u, und.v, deg.deg FROM und JOIN deg USING (u)),
       r0 AS (SELECT u, 1000000000 // nv AS r FROM deg CROSS JOIN nv),
       ${pagerankCtes(3)}
       SELECT deg.u AS doc_id, deg.deg AS deg, r3.r AS rank9
       FROM r3 JOIN deg USING (u)"""

  // --- x86: centrality-based keeper selection ----------------------------
  // The x23 + x85 composition: duplicate clusters keyed by their most-
  // CENTRAL member — the canonical document many variants derive from —
  // instead of the arbitrary min-id keeper. One pair list feeds both
  // the connected-components pass and the rank iteration.
  def x86CentralityKeepers(spark: SparkSession, dir: String): DataFrame =
    Graph.centralityKeepers(
      allPairs(spark, dir),
      "id_a", "id_b", iters = 3)

  val x86Sql: String =
    s"""WITH RECURSIVE ${jaccardCtes(3)},
       ${componentCtes(0.7)},
       cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
       und AS (SELECT id_a AS u, id_b AS v FROM pairs
               UNION ALL SELECT id_b, id_a FROM pairs),
       deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY 1),
       nv AS (SELECT CAST(count(*) AS BIGINT) AS nv FROM deg),
       ud AS (SELECT und.u, und.v, deg.deg FROM und JOIN deg USING (u)),
       r0 AS (SELECT u, 1000000000 // nv AS r FROM deg CROSS JOIN nv),
       ${pagerankCtes(3)},
       rk AS (SELECT deg.u AS doc_id, r3.r AS rank9 FROM r3 JOIN deg USING (u)),
       j AS (SELECT cl.cluster_id, cl.doc_id, rk.rank9,
           row_number() OVER (PARTITION BY cl.cluster_id
             ORDER BY rk.rank9 DESC, cl.doc_id) AS rn,
           CAST(count(*) OVER (PARTITION BY cl.cluster_id) AS BIGINT) AS n
         FROM cl JOIN rk USING (doc_id))
       SELECT cluster_id, n AS n_members, doc_id AS keeper_id,
         rank9 AS keeper_rank9
       FROM j WHERE rn = 1"""

  // --- x87: per-source quality funnel ------------------------------------
  // Where does each source's data die? x32's gate rolled up per source:
  // total docs, survivors, per-rule failure counts (a doc failing
  // several rules counts in each), survivor fraction. One map-side-
  // combined shuffle to O(sources) rows on top of the narrow gate.
  def x87QualityFunnel(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityFunnel(t(spark, dir, "documents"),
      "text", "lang", "source")

  val x87Sql: String =
    s"""WITH $qgCtes
       SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN ($qgMask) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         CAST(sum(CASE WHEN NOT (wc BETWEEN 10 AND 5000) THEN 1 ELSE 0 END) AS BIGINT) AS fail_len,
         CAST(sum(CASE WHEN swr < 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS fail_stopword,
         CAST(sum(CASE WHEN pr > 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS fail_punct,
         CAST(sum(CASE WHEN NOT (awl BETWEEN 2.0 AND 12.0) THEN 1 ELSE 0 END) AS BIGINT) AS fail_wordlen,
         CAST(sum(CASE WHEN lang_pred IS DISTINCT FROM lang THEN 1 ELSE 0 END) AS BIGINT) AS fail_lang,
         round(CAST(sum(CASE WHEN ($qgMask) = 0 THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(count(*) AS DOUBLE), 6) AS yield_frac
       FROM f GROUP BY 1"""

  // --- x88: maintained data card (day-over-day stores) -------------------
  // The x84 datasheet kept current by daily ingest: three "days"
  // (doc_id % 3) are appended as day-keyed SUBTOTALS into ManifestStore
  // tables (merge pruned to the day's partition, replay-idempotent);
  // the card derives from the stores alone — corpus never rescanned.
  // The oracle is the DIRECT datasheet over the full corpus: maintenance
  // must be invisible in the result.
  def x88CardStore(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val root = FreshTables.next(spark, dir, "cardstore")
    for (d <- 0 to 2)
      DataCard.appendDay(spark, docs.filter(col("doc_id") % 3 === d), s"day$d", root)
    DataCard.cardFromStore(spark, root)
  }

  val x88Sql: String = x84Sql

  // --- x89: hybrid retrieval via reciprocal-rank fusion ------------------
  // BM25 top-20 (x69's three term queries) fused with dense cosine
  // top-20 (probe vectors 0/1/2 standing in for the queries' embeddings;
  // vec_id ≡ doc_id per the x81 referential audit) — RRF with exact
  // integer floor(1e12/(60+rank)) contributions, top-10 per query.
  def x89RrfFusion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qs = Seq(
      ("q_hash_join", Seq("hash", "join")),
      ("q_stream", Seq("stream", "window", "batch")),
      ("q_vector", Seq("vector", "data"))).toDF("query_id", "terms")
    val lexical = Retrieval
      .bm25TopK(t(spark, dir, "documents"), "doc_id", "text", qs, k = 20)
      .select(col("query_id"), col("rank"), col("doc_id"))
    val emb = t(spark, dir, "embeddings")
    val probeMap = Seq(("q_hash_join", 0L), ("q_stream", 1L), ("q_vector", 2L))
      .toDF("qname", "pvec")
    val dense = Similarity
      .bruteForceTopK(emb, emb.filter(col("vec_id") < 3), "vec_id", "embedding", k = 20)
      .join(broadcast(probeMap), col("query_id") === col("pvec"))
      .select(col("qname").as("query_id"), col("rank"), col("neighbor_id").as("doc_id"))
    Retrieval.rrfFuse(Seq(lexical, dense), "doc_id", k = 10)
  }

  val x89Sql: String =
    """WITH toks AS (SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS w
       FROM documents),
       lens AS (SELECT d.doc_id, coalesce(t.len, 0) AS len FROM documents d
         LEFT JOIN (SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM toks GROUP BY 1) t USING (doc_id)),
       stats AS (SELECT CAST(count(*) AS BIGINT) AS nd,
         CAST(sum(len) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM lens),
       qt AS (SELECT * FROM (VALUES
         ('q_hash_join','hash'),('q_hash_join','join'),
         ('q_stream','stream'),('q_stream','window'),('q_stream','batch'),
         ('q_vector','vector'),('q_vector','data')) AS q(query_id, w)),
       tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM toks
         WHERE w IN (SELECT DISTINCT w FROM qt) GROUP BY 1, 2),
       dft AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       sc AS (SELECT qt.query_id, tf.doc_id,
           CAST(sum(CAST(round(
             ln(1.0 + (CAST(nd AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
             * ((CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(len AS DOUBLE) / avgdl))))
             * 1000000000.0) AS BIGINT)) AS BIGINT) AS s9
         FROM tf JOIN dft USING (w) JOIN qt USING (w)
         JOIN lens USING (doc_id) CROSS JOIN stats
         GROUP BY 1, 2),
       lexr AS (SELECT query_id, doc_id, rank FROM (
           SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id ORDER BY s9 DESC, doc_id) AS rank
           FROM sc) WHERE rank <= 20),
       ve AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
       vn AS (SELECT vec_id, ve, sqrt(list_sum(list_transform(ve, x -> x * x))) AS nrm FROM ve),
       vq AS (SELECT vec_id AS pid, ve AS qv, nrm AS qn FROM vn WHERE vec_id < 3),
       vscored AS (SELECT vq.pid, c.vec_id AS neighbor_id,
           list_sum(list_transform(range(1, len(vq.qv) + 1), i -> vq.qv[i] * c.ve[i])) / (vq.qn * c.nrm) AS cos
         FROM vn c JOIN vq ON c.vec_id <> vq.pid),
       vr AS (SELECT pid, neighbor_id, rank FROM (
           SELECT pid, neighbor_id,
             row_number() OVER (PARTITION BY pid ORDER BY cos DESC, neighbor_id) AS rank
           FROM vscored) WHERE rank <= 20),
       qmap AS (SELECT * FROM (VALUES
         ('q_hash_join', 0), ('q_stream', 1), ('q_vector', 2)) AS m(query_id, pvec)),
       densr AS (SELECT qmap.query_id, vr.neighbor_id AS doc_id, vr.rank
         FROM vr JOIN qmap ON vr.pid = qmap.pvec),
       contrib AS (
         SELECT query_id, doc_id, 1000000000000 // (60 + rank) AS c FROM lexr
         UNION ALL
         SELECT query_id, doc_id, 1000000000000 // (60 + rank) AS c FROM densr),
       fused AS (SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS rrf_fp
         FROM contrib GROUP BY 1, 2),
       rr AS (SELECT query_id, doc_id, rrf_fp,
           row_number() OVER (PARTITION BY query_id ORDER BY rrf_fp DESC, doc_id) AS rank
         FROM fused)
       SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, rrf_fp
       FROM rr WHERE rank <= 10"""

  // --- x90: k-anonymity / l-diversity release audit ----------------------
  // Publishing per-document metadata re-identifies by rare combination:
  // the audit groups customers by (nation, segment, balance band) and
  // flags equivalence classes smaller than k=5. One map-side-combined
  // groupBy to O(distinct QI combos) rows.
  def x90Kanonymity(spark: SparkSession, dir: String): DataFrame =
    Privacy.kAnonymityAudit(
      t(spark, dir, "customer")
        .withColumn("bal_band", floor(col("c_acctbal") / lit(500.0d)).cast("long")),
      Seq("c_nationkey", "c_mktsegment", "bal_band"), "c_acctbal", k = 5)

  val x90Sql: String =
    """SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 500.0) AS BIGINT) AS bal_band,
         CAST(count(*) AS BIGINT) AS class_size,
         CAST(count(DISTINCT c_acctbal) AS BIGINT) AS l_distinct,
         count(*) < 5 AS at_risk
       FROM customer GROUP BY 1, 2, 3"""

  // --- x91: SCD2 dimension history build ---------------------------------
  // Type-2 validity intervals from the purchase change feed: one row per
  // change with version numbers and [valid_from, valid_to) in exact
  // micros; ties within a (user, ts) are ordered by event_id. ONE
  // shuffle on the user key (row_number + lead share the sort).
  def x91Scd2History(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    Scd2.build(
      ev.filter(col("event_type") === "purchase")
        .withColumn("ts_us", Events.epochMicros(ev)),
      "user_id", "ts_us", "event_id", Seq("value"))
  }

  val x91Sql: String =
    """WITH c AS (SELECT user_id, epoch_us(ts) AS t, event_id, value
         FROM events WHERE event_type = 'purchase')
       SELECT user_id, value,
         CAST(row_number() OVER w AS BIGINT) AS version,
         t AS valid_from_us,
         lead(t) OVER w AS valid_to_us
       FROM c WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)"""

  // --- x92: SCD2 point-in-time probe -------------------------------------
  // Every click resolves the user's purchase-dimension state as of the
  // click instant. The engine runs AsofJoin's union+window (one shuffle,
  // linear scan — no range join); the oracle checks it with the plain
  // interval-containment BETWEEN join the window provably equals
  // (versions tile time; zero-width versions collapsed on both sides).
  def x92Scd2Probe(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val hist = Scd2.build(
      ev.filter(col("event_type") === "purchase")
        .withColumn("ts_us", Events.epochMicros(ev)),
      "user_id", "ts_us", "event_id", Seq("value"))
    val probes = ev.filter(col("event_type") === "click")
      .withColumn("t_us", Events.epochMicros(ev))
      .select(col("event_id"), col("user_id"), col("t_us"))
    Scd2.probe(hist, probes, "user_id", "t_us", Seq("value"))
  }

  val x92Sql: String =
    """WITH c AS (SELECT user_id, epoch_us(ts) AS t, event_id, value
         FROM events WHERE event_type = 'purchase'),
       v AS (SELECT user_id, value,
           CAST(row_number() OVER w AS BIGINT) AS version,
           t AS valid_from_us,
           lead(t) OVER w AS valid_to_us
         FROM c WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
       lv AS (SELECT * FROM v
         WHERE valid_to_us IS NULL OR valid_from_us < valid_to_us),
       p AS (SELECT event_id, user_id, epoch_us(ts) AS t_us
         FROM events WHERE event_type = 'click')
       SELECT p.event_id, p.user_id, p.t_us, lv.value, lv.version
       FROM p LEFT JOIN lv ON lv.user_id = p.user_id
         AND lv.valid_from_us <= p.t_us
         AND (lv.valid_to_us IS NULL OR p.t_us < lv.valid_to_us)"""

  // --- x93: hashed linear quality-model inference ------------------------
  // fastText-shaped quality scoring with a hash-derived weight table:
  // the whole model is a narrow map + one groupBy on the doc id — no
  // weight-table join anywhere (see TextAnalysis.hashedLinearScore).
  def x93QualityModel(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.hashedLinearScore(t(spark, dir, "documents"), "doc_id", "text")

  // hashed-linear-model scoring chain (x93's model), shared with x97:
  // ends in sc(doc_id, n_toks, score_fp3)
  private lazy val qmScoreCtes: String =
    s"""toks AS (SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS w
       FROM documents),
       hb AS (SELECT doc_id, md5(w) AS hx FROM toks),
       b AS (SELECT doc_id, ${duckHex48("hx")} % 1024 AS b FROM hb),
       hw AS (SELECT doc_id, md5('w' || CAST(b AS VARCHAR)) AS hx FROM b),
       wf AS (SELECT doc_id, (${duckHex48("hx")} % 2001) - 1000 AS wf FROM hw),
       sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
         CAST(sum(wf) AS BIGINT) AS score_fp3 FROM wf GROUP BY 1)"""

  val x93Sql: String =
    s"""WITH $qmScoreCtes
       SELECT doc_id, n_toks, score_fp3, score_fp3 > 0 AS pred FROM sc"""

  // --- x94: ordered conversion funnel ------------------------------------
  // view -> click -> purchase, each stage strictly after the user's
  // earliest valid previous stage; per-stage reached-user counts.
  def x94EventFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    Events.funnel(ev.withColumn("ts_us", Events.epochMicros(ev)),
      "user_id", "event_type", "ts_us", Seq("view", "click", "purchase"))
  }

  val x94Sql: String =
    """WITH e AS (SELECT user_id AS u, event_type AS et, epoch_us(ts) AS t FROM events),
       s1 AS (SELECT u, min(t) AS t FROM e WHERE et = 'view' GROUP BY 1),
       s2 AS (SELECT e.u, min(e.t) AS t FROM e JOIN s1 ON e.u = s1.u AND e.t > s1.t
         WHERE e.et = 'click' GROUP BY 1),
       s3 AS (SELECT e.u, min(e.t) AS t FROM e JOIN s2 ON e.u = s2.u AND e.t > s2.t
         WHERE e.et = 'purchase' GROUP BY 1)
       SELECT CAST(1 AS BIGINT) AS stage_idx, 'view' AS stage, CAST(count(*) AS BIGINT) AS users FROM s1
       UNION ALL
       SELECT CAST(2 AS BIGINT), 'click', CAST(count(*) AS BIGINT) FROM s2
       UNION ALL
       SELECT CAST(3 AS BIGINT), 'purchase', CAST(count(*) AS BIGINT) FROM s3"""

  // --- x95: weekly retention cohorts -------------------------------------
  // Users cohorted by first-event epoch-week; actives counted per
  // (cohort, offset). Event stream collapses to distinct user-weeks in
  // the first map-side-combined shuffle.
  def x95RetentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    Events.retentionCohorts(ev.withColumn("ts_us", Events.epochMicros(ev)),
      "user_id", "ts_us")
  }

  val x95Sql: String =
    """WITH uw AS (SELECT DISTINCT user_id AS u, epoch_us(ts) // 604800000000 AS wk FROM events),
       c AS (SELECT u, wk, min(wk) OVER (PARTITION BY u) AS cw FROM uw)
       SELECT cw AS cohort_week, wk - cw AS week_offset,
         CAST(count(*) AS BIGINT) AS users
       FROM c GROUP BY 1, 2"""

  // --- x96: count-min frequency sketch + exact verify --------------------
  // The x70 pattern for the CM sketch: estimates are one-sided
  // (est >= exact by construction), so the gate probes the exact top-20
  // tokens and reports est alongside the exact count — `overcount`
  // being >= 0 everywhere IS the sketch's guarantee, checked row by row.
  def x96CountMin(spark: SparkSession, dir: String): DataFrame = {
    val toks = LangModel.tokenRows(t(spark, dir, "documents"), "doc_id", "text")
      .select(col("w"))
    // ONE token-stream pass: the exact vocab table feeds both the
    // weighted cell build (bit-identical to the raw-stream build, but
    // d-way-expanding O(vocab) rows) and the top-20 probe set
    val exact = Dedup.materialize(
      toks.groupBy(col("w")).agg(count(lit(1)).as("cnt")))
    val cells = Sketches.countMinCellsWeighted(exact, "w", "cnt",
      depth = 4, width = 1024)
    val top = Sampling.scoredTopK(exact, "w", col("cnt"), k = 20).drop("sel_rank")
    Sketches.countMinEstimate(cells, top, "w", depth = 4, width = 1024)
      .withColumn("overcount", col("est") - col("cnt"))
  }

  val x96Sql: String =
    s"""WITH toks AS (SELECT
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS w
       FROM documents),
       ex AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY 1),
       top AS (SELECT w, cnt FROM (
           SELECT w, cnt, row_number() OVER (ORDER BY cnt DESC, w) AS rn FROM ex)
         WHERE rn <= 20),
       rr AS (SELECT r FROM (VALUES (0), (1), (2), (3)) AS t(r)),
       cells0 AS (SELECT r, md5('cm' || CAST(r AS VARCHAR) || '_' || w) AS hx
         FROM toks CROSS JOIN rr),
       cells AS (SELECT r, ${duckHex48("hx")} % 1024 AS cell,
           CAST(count(*) AS BIGINT) AS ccnt
         FROM cells0 GROUP BY 1, 2),
       pr0 AS (SELECT w, cnt, r, md5('cm' || CAST(r AS VARCHAR) || '_' || w) AS hx
         FROM top CROSS JOIN rr),
       pr AS (SELECT w, cnt, r, ${duckHex48("hx")} % 1024 AS cell FROM pr0)
       SELECT pr.w, pr.cnt, CAST(min(cells.ccnt) AS BIGINT) AS est,
         CAST(min(cells.ccnt) - pr.cnt AS BIGINT) AS overcount
       FROM pr JOIN cells USING (r, cell) GROUP BY pr.w, pr.cnt"""

  // --- x97: curriculum phase assignment ----------------------------------
  // Difficulty phases from the x93 model score WITHOUT a global sort:
  // phase = floor(8 · strictlyBetter / N) off the O(distinct scores)
  // distribution, broadcast-joined back (ties share a phase by
  // construction). Gate reports the per-phase rollup.
  def x97CurriculumPhases(spark: SparkSession, dir: String): DataFrame =
    // materialized: curriculumPhases consumes the scored frame twice
    // (distribution + join-back) — without this the scoring pass runs
    // twice (x05 multi-consumer rule)
    Sampling.curriculumPhases(
        Dedup.materialize(
          TextAnalysis.hashedLinearScore(t(spark, dir, "documents"), "doc_id", "text")),
        "score_fp3", phases = 8)
      .groupBy(col("phase"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("score_fp3")).as("min_score"),
        max(col("score_fp3")).as("max_score"))

  val x97Sql: String =
    s"""WITH $qmScoreCtes,
       d AS (SELECT score_fp3 AS s, CAST(count(*) AS BIGINT) AS c FROM sc GROUP BY 1),
       nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM d),
       cb AS (SELECT s, CAST(coalesce(sum(c) OVER (ORDER BY s DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
         FROM d),
       ph AS (SELECT sc.doc_id, sc.score_fp3,
           (8 * cb.cum) // nn.n AS phase
         FROM sc JOIN cb ON sc.score_fp3 = cb.s CROSS JOIN nn)
       SELECT CAST(phase AS BIGINT) AS phase, CAST(count(*) AS BIGINT) AS n_docs,
         min(score_fp3) AS min_score, max(score_fp3) AS max_score
       FROM ph GROUP BY 1"""

  // --- x98: CM-sketch join-size estimation -------------------------------
  // The planner pre-flight: |events ⋈ orders on user=custkey| estimated
  // from two d=4×w=1024 count-min sketches via the inner-product bound
  // (est >= exact, one-sided), verified against the exact aggregated
  // product — which the gate also computes, O(distinct keys), never the
  // joined rows.
  def x98JoinsizeEstimate(spark: SparkSession, dir: String): DataFrame = {
    val a = t(spark, dir, "events").select(col("user_id").as("k"))
    val b = t(spark, dir, "orders").select(col("o_custkey").as("k"))
    val est = Sketches.countMinJoinSize(
      Sketches.countMinCells(a, "k", depth = 4, width = 1024),
      Sketches.countMinCells(b, "k", depth = 4, width = 1024))
    val exact = a.groupBy(col("k")).agg(count(lit(1)).as("__ca"))
      .join(b.groupBy(col("k")).agg(count(lit(1)).as("__cb")), Seq("k"))
      .agg(coalesce(sum(col("__ca") * col("__cb")), lit(0L)).as("exact_join_size"))
    exact.crossJoin(est)
      .withColumn("overcount", col("est_join_size") - col("exact_join_size"))
  }

  val x98Sql: String =
    s"""WITH ea AS (SELECT CAST(user_id AS VARCHAR) AS v FROM events),
       ob AS (SELECT CAST(o_custkey AS VARCHAR) AS v FROM orders),
       rr AS (SELECT r FROM (VALUES (0), (1), (2), (3)) AS t(r)),
       ca0 AS (SELECT r, md5('cm' || CAST(r AS VARCHAR) || '_' || v) AS hx
         FROM ea CROSS JOIN rr),
       ca AS (SELECT r, ${duckHex48("hx")} % 1024 AS cell,
           CAST(count(*) AS BIGINT) AS c
         FROM ca0 GROUP BY 1, 2),
       cb0 AS (SELECT r, md5('cm' || CAST(r AS VARCHAR) || '_' || v) AS hx
         FROM ob CROSS JOIN rr),
       cbb AS (SELECT r, ${duckHex48("hx")} % 1024 AS cell,
           CAST(count(*) AS BIGINT) AS c
         FROM cb0 GROUP BY 1, 2),
       er AS (SELECT ca.r, CAST(sum(ca.c * cbb.c) AS BIGINT) AS er
         FROM ca JOIN cbb ON ca.r = cbb.r AND ca.cell = cbb.cell GROUP BY 1),
       est AS (SELECT CAST(min(er) AS BIGINT) AS est_join_size FROM er),
       ex AS (SELECT CAST(coalesce(sum(x.c * y.c), 0) AS BIGINT) AS exact_join_size
         FROM (SELECT user_id AS k, count(*) AS c FROM events GROUP BY 1) x
         JOIN (SELECT o_custkey AS k, count(*) AS c FROM orders GROUP BY 1) y USING (k))
       SELECT ex.exact_join_size, est.est_join_size,
         est.est_join_size - ex.exact_join_size AS overcount
       FROM ex CROSS JOIN est"""

  // --- x99: last-touch attribution ---------------------------------------
  // Every purchase resolves the user's latest at-or-before touch
  // (view/click/signup/error, deduped per instant by max event_id) via
  // the asof union+window; the oracle is an independent argmax
  // correlated subquery over the same touch set.
  def x99Attribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    Events.lastTouchAttribution(
      ev.withColumn("ts_us", Events.epochMicros(ev)),
      "user_id", "event_type", "ts_us", "event_id", "purchase", Seq("value"))
  }

  val x99Sql: String =
    """WITH np AS (SELECT user_id, epoch_us(ts) AS t, event_type, event_id
         FROM events WHERE event_type <> 'purchase'),
       np1 AS (SELECT user_id, t, event_type AS channel FROM (
           SELECT user_id, t, event_type,
             row_number() OVER (PARTITION BY user_id, t ORDER BY event_id DESC) AS rn
           FROM np) WHERE rn = 1),
       p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
         FROM events WHERE event_type = 'purchase')
       SELECT p.event_id, p.user_id, p.ts_us, p.value,
         (SELECT channel FROM np1
          WHERE np1.user_id = p.user_id AND np1.t <= p.ts_us
          ORDER BY np1.t DESC LIMIT 1) AS channel
       FROM p"""

  // --- x100: BPE merge learning ------------------------------------------
  // Two tokenizer-induction rounds over the weighted vocabulary; the
  // oracle unrolls both rounds (pair count -> argmax -> replace-apply)
  // in SQL with the SAME left-to-right non-overlapping replace
  // semantics (see Bpe scaladoc).
  def x100BpeMerges(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Bpe.learnMerges(t(spark, dir, "documents"), "doc_id", "text", rounds = 2)

  // the two-round BPE chain (x100's model), shared with x104: ends in
  // m1/m2 (the chosen merges) and s1 (the vocab after merge 1)
  private lazy val bpeCtes: String =
    """toks AS (SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS w
       FROM documents),
       vocab AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY 1),
       s0 AS (SELECT w, cnt, trim(regexp_replace(w, '(.)', '\1 ', 'g')) AS seq FROM vocab),
       i0 AS (SELECT cnt, l, unnest(generate_series(1, len(l) - 1)) AS i
         FROM (SELECT cnt, string_split(seq, ' ') AS l FROM s0)),
       p1 AS (SELECT l[i] AS a, l[i+1] AS b, CAST(sum(cnt) AS BIGINT) AS pc
         FROM i0 GROUP BY 1, 2),
       m1 AS (SELECT a, b, pc FROM p1 ORDER BY pc DESC, a, b LIMIT 1),
       s1 AS (SELECT s0.w, s0.cnt,
           trim(replace(' ' || s0.seq || ' ',
             ' ' || m1.a || ' ' || m1.b || ' ',
             ' ' || m1.a || m1.b || ' ')) AS seq
         FROM s0 CROSS JOIN m1),
       i1 AS (SELECT cnt, l, unnest(generate_series(1, len(l) - 1)) AS i
         FROM (SELECT cnt, string_split(seq, ' ') AS l FROM s1)),
       p2 AS (SELECT l[i] AS a, l[i+1] AS b, CAST(sum(cnt) AS BIGINT) AS pc
         FROM i1 GROUP BY 1, 2),
       m2 AS (SELECT a, b, pc FROM p2 ORDER BY pc DESC, a, b LIMIT 1)"""

  val x100Sql: String =
    s"""WITH $bpeCtes
       SELECT CAST(1 AS BIGINT) AS merge_rank, a AS left_sym, b AS right_sym,
         pc AS pair_count FROM m1
       UNION ALL
       SELECT CAST(2 AS BIGINT), a, b, pc FROM m2"""

  // --- x101: lakehouse time travel ---------------------------------------
  // write (v1) -> upsert rewrite (v2) -> insert batch (v3), then read
  // EVERY version via ManifestStore.read(version = Some(v)) and summarize
  // each snapshot — the gate proves old snapshots stay bit-stable after
  // later commits (the audit/reproducibility contract of the table
  // format). The oracle rebuilds each snapshot's summary from the inputs.
  def x101TimeTravel(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.ManifestStore
    val root = FreshTables.next(spark, dir, "timetravel")
    val base = t(spark, dir, "documents")
      .select(col("doc_id"), col("source").as("pt"), col("n_chars"))
    ManifestStore.write(spark, base, root, "pt")
    ManifestStore.merge(spark, root,
      base.filter(col("doc_id") % 7 === 0)
        .withColumn("n_chars", col("n_chars") + 1000L),
      Seq("doc_id"), "pt")
    ManifestStore.merge(spark, root,
      base.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 10000L).as("doc_id"), col("pt"), col("n_chars")),
      Seq("doc_id"), "pt")
    ManifestStore.versions(spark, root).sorted.map { v =>
      ManifestStore.read(spark, root, Some(v))
        .agg(count(lit(1)).as("n_rows"), sum(col("n_chars")).as("sum_chars"))
        .select(lit(v.toLong).as("version"), col("n_rows"), col("sum_chars"))
    }.reduce(_.unionByName(_))
  }

  val x101Sql: String =
    """WITH b AS (SELECT doc_id, n_chars FROM documents),
       b2 AS (SELECT doc_id,
           CASE WHEN doc_id % 7 = 0 THEN n_chars + 1000 ELSE n_chars END AS n_chars
         FROM b),
       b3 AS (SELECT * FROM b2
         UNION ALL SELECT doc_id + 10000, n_chars FROM b WHERE doc_id % 5 = 0)
       SELECT CAST(1 AS BIGINT) AS version, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM b
       UNION ALL
       SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
         CAST(sum(n_chars) AS BIGINT) FROM b2
       UNION ALL
       SELECT CAST(3 AS BIGINT), CAST(count(*) AS BIGINT),
         CAST(sum(n_chars) AS BIGINT) FROM b3"""

  // --- x102: n-gram containment pairs ------------------------------------
  // The quote/subsumption detector: asymmetric containment over the same
  // 4-gram inverted index as x05 — a short doc fully copied into a long
  // one scores containment ~1 where Jaccard stays low.
  def x102ContainmentPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(t(spark, dir, "documents"), "doc_id", "text",
      shingleN = 4, threshold = 0.8, maxPostingLen = 1000000L)

  val x102Sql: String =
    s"""WITH ${jaccardCtes(4)}
       SELECT id_a, id_b,
         CAST(i AS DOUBLE) / CAST(na.n AS DOUBLE) AS cont_a_in_b,
         CAST(i AS DOUBLE) / CAST(nb.n AS DOUBLE) AS cont_b_in_a
       FROM inter JOIN sizes na ON na.doc_id = id_a
       JOIN sizes nb ON nb.doc_id = id_b
       WHERE greatest(CAST(i AS DOUBLE) / CAST(na.n AS DOUBLE),
                      CAST(i AS DOUBLE) / CAST(nb.n AS DOUBLE)) >= 0.8"""

  // --- x103: triangle census of the near-dup graph -----------------------
  // Degree-ordered-orientation triangle count + global clustering
  // coefficient over x04's MinHash pair graph; the oracle counts
  // triangles by the id-canonical 3-way join (orientation changes the
  // bound, never the count).
  def x103TriangleStats(spark: SparkSession, dir: String): DataFrame =
    Graph.triangleStats(
      allPairs(spark, dir),
      "id_a", "id_b")

  val x103Sql: String =
    s"""WITH ${jaccardCtes(3)},
       pairs AS (SELECT id_a, id_b
         FROM inter JOIN sizes na ON na.doc_id = id_a
         JOIN sizes nb ON nb.doc_id = id_b
         WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.7),
       und AS (SELECT id_a AS u FROM pairs UNION ALL SELECT id_b FROM pairs),
       deg AS (SELECT u AS id, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY 1),
       tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
         FROM pairs e1
         JOIN pairs e2 ON e2.id_a = e1.id_b
         JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b),
       st AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(deg) // 2 AS BIGINT) AS n_edges,
           CAST(sum((deg * (deg - 1)) // 2) AS BIGINT) AS n_wedges
         FROM deg)
       SELECT n_nodes, n_edges, n_wedges, n_triangles,
         CASE WHEN n_wedges = 0 THEN 0.0
              ELSE round(3.0 * n_triangles / n_wedges, 6) END AS global_cc
       FROM st CROSS JOIN tri"""

  // --- x104: BPE-encoded vocabulary statistics ---------------------------
  // The tokenizer-side view of x100's run: the weighted vocab after both
  // merges, rolled up to induced-symbol statistics (top-10 by corpus
  // occurrences).
  def x104BpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val enc = graft.ext.Bpe.encodeVocab(t(spark, dir, "documents"),
      "doc_id", "text", rounds = 2)
    val sym = enc.select(col("cnt"), explode(split(col("seq"), " ")).as("sym"))
      .groupBy(col("sym"))
      .agg(sum(col("cnt")).as("n_occ"), count(lit(1)).as("n_words"))
    Sampling.scoredTopK(sym, "sym", col("n_occ"), k = 10)
      .withColumnRenamed("sel_rank", "rank")
  }

  val x104Sql: String =
    s"""WITH $bpeCtes,
       s2 AS (SELECT s1.w, s1.cnt,
           trim(replace(' ' || s1.seq || ' ',
             ' ' || m2.a || ' ' || m2.b || ' ',
             ' ' || m2.a || m2.b || ' ')) AS seq
         FROM s1 CROSS JOIN m2),
       syms AS (SELECT sym, CAST(sum(cnt) AS BIGINT) AS n_occ,
           CAST(count(*) AS BIGINT) AS n_words
         FROM (SELECT cnt, unnest(string_split(seq, ' ')) AS sym FROM s2)
         GROUP BY 1),
       r AS (SELECT sym, n_occ, n_words,
           row_number() OVER (ORDER BY n_occ DESC, sym) AS rank FROM syms)
       SELECT sym, n_occ, n_words, CAST(rank AS BIGINT) AS rank
       FROM r WHERE rank <= 10"""

  // --- x105: per-document tokenization under the induced tokenizer -------
  // x100's merges applied to the corpus: each doc's word stream joins
  // the merge-ENCODED vocab (broadcast, vocab-bounded) for its symbol
  // count — tokens-per-doc under the learned tokenizer, the statistic
  // packing and cost estimation actually need.
  def x105BpeTokenize(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val enc = graft.ext.Bpe.encodeVocab(docs, "doc_id", "text", rounds = 2)
      .select(col("w"), size(split(col("seq"), " ")).cast("long").as("n_syms_w"))
    LangModel.tokenRows(docs, "doc_id", "text")
      .join(broadcast(enc), Seq("w"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_syms_w")).as("n_syms"))
      .select(col("id").as("doc_id"), col("n_words"), col("n_syms"),
        round(col("n_syms").cast("double") / col("n_words").cast("double"), 6)
          .as("syms_per_word"))
  }

  val x105Sql: String =
    s"""WITH $bpeCtes,
       s2 AS (SELECT s1.w, s1.cnt,
           trim(replace(' ' || s1.seq || ' ',
             ' ' || m2.a || ' ' || m2.b || ' ',
             ' ' || m2.a || m2.b || ' ')) AS seq
         FROM s1 CROSS JOIN m2),
       wsyms AS (SELECT w, CAST(len(string_split(seq, ' ')) AS BIGINT) AS n_syms_w FROM s2)
       SELECT toks.doc_id, CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(n_syms_w) AS BIGINT) AS n_syms,
         round(CAST(sum(n_syms_w) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
           AS syms_per_word
       FROM toks JOIN wsyms USING (w) GROUP BY 1"""

  // --- x106: salting pre-flight plan -------------------------------------
  // x83's skew profile turned actionable: every token key whose count
  // exceeds the per-reducer row budget gets its ceil(cnt/target) salt
  // factor — the exact input saltedAgg/saltedJoin need, O(distinct
  // keys) work.
  def x106ShufflePlan(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.saltPlan(
      LangModel.tokenRows(t(spark, dir, "documents"), "doc_id", "text"),
      "w", targetRows = 500L)

  val x106Sql: String =
    """WITH toks AS (SELECT
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS w
       FROM documents)
       SELECT w, CAST(count(*) AS BIGINT) AS cnt,
         CAST((count(*) + 499) // 500 AS BIGINT) AS salt_buckets
       FROM toks GROUP BY 1 HAVING count(*) > 500"""

  // --- x107: differentially-private release counts -----------------------
  // Laplace mechanism (eps = 1) over per-source doc counts with the
  // seeded md5 inverse-CDF draw — noise applies as a narrow map over
  // the 20 aggregated groups, never over rows. The checked-in seed and
  // includeExact audit flag mark this as a portability ORACLE, not a
  // privacy release (a real release uses a secret seed and the default
  // n_noisy-only output — see Privacy.dpNoisyCounts scaladoc).
  private val DpFixtureSeed = "x107-fixture-seed"
  def x107DpHistogram(spark: SparkSession, dir: String): DataFrame =
    Privacy.dpNoisyCounts(t(spark, dir, "documents"), "source",
      epsilon = 1.0, seed = DpFixtureSeed, includeExact = true)

  val x107Sql: String =
    s"""WITH ex AS (SELECT source, CAST(count(*) AS BIGINT) AS n_exact
         FROM documents GROUP BY 1),
       h AS (SELECT source, n_exact, md5('$DpFixtureSeed' || '|' || source) AS hx FROM ex),
       u AS (SELECT source, n_exact,
           (CAST(${duckHex48("hx")} AS DOUBLE) + 0.5) / 281474976710656.0 AS u
         FROM h)
       SELECT source, n_exact,
         round(CAST(n_exact AS DOUBLE) +
           ((-1.0 * sign(u - 0.5)) * ln(1.0 - 2.0 * abs(u - 0.5))), 6) AS n_noisy
       FROM u"""

  // --- x108: Kneser-Ney bigram self-perplexity ---------------------------
  // The continuation-count LM next to x58's add-one model; train =
  // score corpus so no unseen branch exists, and the probability
  // expression's operation order is pinned identically in both engines.
  def x108KnScore(spark: SparkSession, dir: String): DataFrame =
    LangModel.knScore(t(spark, dir, "documents"), "doc_id", "text")

  val x108Sql: String =
    """WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
       bi AS (SELECT doc_id, unnest(range(1, len(ws))) AS i, ws FROM t),
       bg AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2 FROM bi),
       c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY 1, 2),
       ctx AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1,
           CAST(count(*) AS BIGINT) AS n1f FROM c2 GROUP BY 1),
       back AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1b FROM c2 GROUP BY 1),
       np AS (SELECT CAST(count(*) AS BIGINT) AS np FROM c2),
       sc AS (SELECT bg.doc_id,
           CAST(round(ln(
             (CAST(c2.c2 AS DOUBLE) - 0.75 +
              0.75 * CAST(ctx.n1f AS DOUBLE) *
                (CAST(back.n1b AS DOUBLE) / CAST(np.np AS DOUBLE)))
             / CAST(ctx.c1 AS DOUBLE)) * 1000000000.0, 0) AS BIGINT) AS lp9
         FROM bg JOIN c2 USING (w1, w2) JOIN ctx USING (w1)
         JOIN back USING (w2) CROSS JOIN np)
       SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         round((CAST(sum(lp9) AS DOUBLE) / 1000000000.0)
               / CAST(count(*) AS DOUBLE), 6) AS avg_lp
       FROM sc GROUP BY 1"""

  // --- x109: IPF raking of the source x lang contingency -----------------
  // One raking cycle toward uniform marginals on both attributes —
  // cell counts and marginal sums exact LONGs, the row-pass result
  // rounded to 1e-9 fixed point BEFORE the column pass so both engines
  // sum identical integers.
  def x109IpfRaking(spark: SparkSession, dir: String): DataFrame =
    Sampling.ipfWeights(t(spark, dir, "documents"), "source", "lang")

  val x109Sql: String =
    """WITH cells AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n
         FROM documents GROUP BY 1, 2),
       tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
           CAST(count(DISTINCT source) AS BIGINT) AS nr,
           CAST(count(DISTINCT lang) AS BIGINT) AS ncl
         FROM cells),
       rs AS (SELECT source, CAST(sum(n) AS BIGINT) AS rsum FROM cells GROUP BY 1),
       w1 AS (SELECT c.source, c.lang, c.n,
           CAST(round(CAST(c.n AS DOUBLE) *
             ((CAST(nn AS DOUBLE) / CAST(nr AS DOUBLE)) / CAST(rsum AS DOUBLE))
             * 1000000000.0, 0) AS BIGINT) AS w1
         FROM cells c JOIN rs USING (source) CROSS JOIN tot),
       cs AS (SELECT lang, CAST(sum(w1) AS BIGINT) AS csum FROM w1 GROUP BY 1)
       SELECT w1.source, w1.lang, w1.n,
         CAST(round(CAST(w1 AS DOUBLE) *
           ((CAST(nn AS DOUBLE) / CAST(ncl AS DOUBLE)) * 1000000000.0
             / CAST(csum AS DOUBLE)), 0) AS BIGINT) AS w9
       FROM w1 JOIN cs USING (lang) CROSS JOIN tot"""

  // --- x111: STREAMING count-min sketch maintenance ----------------------
  // The sketch family's streaming leg: CM cells maintained as a NATIVE
  // Structured Streaming aggregation — the groupBy(r, cell) count IS the
  // sketch, so the state store holds exactly d×w bounded rows no matter
  // how long the stream runs (the textbook mergeable-sketch property,
  // expressed as Spark streaming state). Complete-mode memory sink reads
  // back O(d×w) rows; the final cells are batch-invariant (counts are
  // exact sums), so the probe must equal the batch-built x96-style gate.
  def x111StreamCountmin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val base = s"/tmp/graft/scm_$tag"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val keys = t(spark, dir, "events").select(col("user_id").as("k"))
    keys.write.parquet(s"$base/in")
    val qname = s"x111_scm_$tag"
    spark.catalog.dropTempView(qname)
    val cells = Sketches.countMinCells(
      spark.readStream.schema(keys.schema).parquet(s"$base/in"),
      "k", depth = 4, width = 1024)
    val q = cells.writeStream.format("memory").queryName(qname)
      .outputMode("complete")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    try { if (!q.awaitTermination(300000)) throw new RuntimeException("x111: drain timeout") }
    finally q.stop()
    val exact = Dedup.materialize(
      keys.groupBy(col("k")).agg(count(lit(1)).as("cnt")))
    val top = Sampling.scoredTopK(exact, "k", col("cnt"), k = 20).drop("sel_rank")
    Sketches.countMinEstimate(spark.table(qname), top, "k", depth = 4, width = 1024)
      .withColumn("overcount", col("est") - col("cnt"))
  }

  val x111Sql: String =
    s"""WITH keys AS (SELECT CAST(user_id AS VARCHAR) AS v, user_id AS k FROM events),
       ex AS (SELECT k, CAST(count(*) AS BIGINT) AS cnt FROM keys GROUP BY 1),
       top AS (SELECT k, cnt FROM (
           SELECT k, cnt, row_number() OVER (ORDER BY cnt DESC, k) AS rn FROM ex)
         WHERE rn <= 20),
       rr AS (SELECT r FROM (VALUES (0), (1), (2), (3)) AS t(r)),
       cells0 AS (SELECT r, md5('cm' || CAST(r AS VARCHAR) || '_' || v) AS hx
         FROM keys CROSS JOIN rr),
       cells AS (SELECT r, ${duckHex48("hx")} % 1024 AS cell,
           CAST(count(*) AS BIGINT) AS ccnt
         FROM cells0 GROUP BY 1, 2),
       pr0 AS (SELECT k, cnt, r,
           md5('cm' || CAST(r AS VARCHAR) || '_' || CAST(k AS VARCHAR)) AS hx
         FROM top CROSS JOIN rr),
       pr AS (SELECT k, cnt, r, ${duckHex48("hx")} % 1024 AS cell FROM pr0)
       SELECT pr.k, pr.cnt, CAST(min(cells.ccnt) AS BIGINT) AS est,
         CAST(min(cells.ccnt) - pr.cnt AS BIGINT) AS overcount
       FROM pr JOIN cells USING (r, cell) GROUP BY pr.k, pr.cnt"""

  // --- x112: corpus build manifest ---------------------------------------
  // The capstone plan artifact: x61's temperature-mixture allocation
  // extended with shard provisioning — per source, the docs/tokens
  // inventory, the budgeted allocation, epochs, sampling rate, AND the
  // number of 50k-token output shards (ceil division of the allocation)
  // a writer should provision. Pure integer arithmetic on top of x61's
  // plan; O(sources) rows.
  def x112BuildManifest(spark: SparkSession, dir: String): DataFrame =
    Sampling.mixturePlan(t(spark, dir, "documents"), "source", "n_chars",
        budget = 200000L)
      .withColumn("n_shards", expr("(alloc_toks + 49999) div 50000L"))

  val x112Sql: String =
    """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(coalesce(n_chars, 0)) AS BIGINT) AS n_toks FROM documents GROUP BY 1),
       w AS (SELECT *, CAST(floor(sqrt(CAST(n_toks AS DOUBLE)) * 1000) AS BIGINT) AS wq FROM c),
       t AS (SELECT sum(wq) AS tw FROM w),
       a AS (SELECT source, n_docs, n_toks,
             CAST((200000 * wq) // tw AS BIGINT) AS alloc_toks
             FROM w CROSS JOIN t)
       SELECT source, n_docs, n_toks, alloc_toks,
         CAST(CASE WHEN n_toks = 0 THEN 0
              ELSE (alloc_toks + n_toks - 1) // n_toks END AS BIGINT) AS epochs,
         CASE WHEN n_toks = 0 THEN 0.0
              ELSE round(CAST(alloc_toks AS DOUBLE) / CAST(n_toks AS DOUBLE), 6) END AS sample_rate,
         CAST((alloc_toks + 49999) // 50000 AS BIGINT) AS n_shards
       FROM a"""

  // --- x113: quality-model calibration matrix ----------------------------
  // Per-source distribution of the x93 model's GLOBAL score deciles —
  // the calibration audit that shows which sources the model up- or
  // down-ranks (a uniform model would put ~10% of each source in each
  // decile). Rides x97's distribution-based phase assignment at
  // phases = 10; one extra O(sources × 10) rollup.
  def x113ScoreCalibration(spark: SparkSession, dir: String): DataFrame = {
    val scored = Dedup.materialize(
      TextAnalysis.hashedLinearScore(t(spark, dir, "documents"), "doc_id", "text")
        .join(t(spark, dir, "documents").select(col("doc_id"), col("source")), "doc_id"))
    Sampling.curriculumPhases(scored, "score_fp3", phases = 10)
      .groupBy(col("source"), col("phase").as("decile"))
      .agg(count(lit(1)).as("n_docs"))
  }

  val x113Sql: String =
    s"""WITH $qmScoreCtes,
       sc2 AS (SELECT sc.doc_id, sc.score_fp3, d.source
         FROM sc JOIN documents d USING (doc_id)),
       dist AS (SELECT score_fp3 AS s, CAST(count(*) AS BIGINT) AS c FROM sc2 GROUP BY 1),
       nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM dist),
       cb AS (SELECT s, CAST(coalesce(sum(c) OVER (ORDER BY s DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
         FROM dist)
       SELECT sc2.source, CAST((10 * cb.cum) // nn.n AS BIGINT) AS decile,
         CAST(count(*) AS BIGINT) AS n_docs
       FROM sc2 JOIN cb ON sc2.score_fp3 = cb.s CROSS JOIN nn
       GROUP BY 1, 2"""

  // --- x114: maintained count-min store (day-over-day) -------------------
  // Three "days" of event keys appended as day-keyed cell SUBTOTALS into
  // a ManifestStore table (partition-pruned, replay-idempotent — day 1
  // is appended TWICE in-gate to prove replaying replaces rather than
  // double-counts); the probe reads the summed store cells, which must
  // equal the one-shot batch sketch exactly (CM cells merge by
  // addition) — same oracle as x111.
  def x114CmStore(spark: SparkSession, dir: String): DataFrame = {
    val keys = t(spark, dir, "events")
      .select(col("event_id"), col("user_id").as("k"))
    val table = FreshTables.next(spark, dir, "cmstore")
    for (d <- 0 to 2)
      Sketches.countMinAppendDay(spark,
        keys.filter(col("event_id") % 3 === d).select(col("k")),
        "k", s"day$d", table, depth = 4, width = 1024)
    // replay day 1: idempotence is part of the gated contract
    Sketches.countMinAppendDay(spark,
      keys.filter(col("event_id") % 3 === 1).select(col("k")),
      "k", "day1", table, depth = 4, width = 1024)
    val cells = Sketches.countMinCellsFromStore(spark, table)
    val exact = Dedup.materialize(
      keys.groupBy(col("k")).agg(count(lit(1)).as("cnt")))
    val top = Sampling.scoredTopK(exact, "k", col("cnt"), k = 20).drop("sel_rank")
    Sketches.countMinEstimate(cells, top, "k", depth = 4, width = 1024)
      .withColumn("overcount", col("est") - col("cnt"))
  }

  val x114Sql: String = x111Sql

  // --- x115: winsorized robust statistics --------------------------------
  // Per-source winsorized mean of document length (clip at the exact
  // p05/p95 nearest-rank quantiles, then average) — the robust-mean
  // companion to x64's median/MAD; the whole computation lives on the
  // O(distinct values) distribution.
  def x115WinsorizedStats(spark: SparkSession, dir: String): DataFrame =
    Quantiles.winsorizedStats(t(spark, dir, "documents"), Seq("source"),
      "n_chars", lo = 0.05, hi = 0.95)

  val x115Sql: String =
    """WITH c AS (SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
         FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
       w AS (SELECT source, v, c,
             sum(c) OVER (PARTITION BY source ORDER BY v) AS cum,
             sum(c) OVER (PARTITION BY source) AS n
           FROM c),
       qs AS (SELECT unnest([CAST(0.05 AS DOUBLE), CAST(0.95 AS DOUBLE)]) AS q),
       qv AS (SELECT source, q, v FROM w, qs
         WHERE CAST(floor(q * (n - 1)) + 1 AS BIGINT) > cum - c
           AND CAST(floor(q * (n - 1)) + 1 AS BIGINT) <= cum),
       b AS (SELECT source,
           CAST(min(CASE WHEN q = 0.05 THEN v END) AS BIGINT) AS q_lo,
           CAST(min(CASE WHEN q = 0.95 THEN v END) AS BIGINT) AS q_hi
         FROM qv GROUP BY 1),
       f AS (SELECT c.source, c.c,
           least(greatest(c.v, b.q_lo), b.q_hi) AS clip
         FROM c JOIN b USING (source))
       SELECT f.source, CAST(sum(f.c) AS BIGINT) AS n,
         min(b.q_lo) AS q_lo, min(b.q_hi) AS q_hi,
         round(CAST(sum(f.clip * f.c) AS DOUBLE) / CAST(sum(f.c) AS DOUBLE), 6)
           AS winsorized_mean
       FROM f JOIN b USING (source) GROUP BY 1"""

  // --- x116: quality-budget selection curve ------------------------------
  // "How much data survives each quality bar": cumulative docs + token
  // mass down the x93 model's global score deciles — the curve a
  // curation run reads to pick its cutoff. Rides x113's decile
  // machinery; the cumsum window runs over 10 rows.
  def x116QualityBudget(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = Dedup.materialize(
      TextAnalysis.hashedLinearScore(t(spark, dir, "documents"), "doc_id", "text")
        .join(t(spark, dir, "documents").select(col("doc_id"), col("n_chars")), "doc_id"))
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Sampling.curriculumPhases(scored, "score_fp3", phases = 10)
      .groupBy(col("phase").as("decile"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_toks"))
      .withColumn("cum_docs", sum(col("n_docs")).over(w))
      .withColumn("cum_toks", sum(col("n_toks")).over(w))
  }

  val x116Sql: String =
    s"""WITH $qmScoreCtes,
       sc2 AS (SELECT sc.doc_id, sc.score_fp3, d.n_chars
         FROM sc JOIN documents d USING (doc_id)),
       dist AS (SELECT score_fp3 AS s, CAST(count(*) AS BIGINT) AS c FROM sc2 GROUP BY 1),
       nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM dist),
       cb AS (SELECT s, CAST(coalesce(sum(c) OVER (ORDER BY s DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
         FROM dist),
       ph AS (SELECT sc2.doc_id, sc2.n_chars,
           (10 * cb.cum) // nn.n AS decile
         FROM sc2 JOIN cb ON sc2.score_fp3 = cb.s CROSS JOIN nn),
       g AS (SELECT CAST(decile AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_toks
         FROM ph GROUP BY 1)
       SELECT decile, n_docs, n_toks,
         CAST(sum(n_docs) OVER (ORDER BY decile
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_docs,
         CAST(sum(n_toks) OVER (ORDER BY decile
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_toks
       FROM g"""

  // --- x117: maintained-store lifecycle (append^N -> compact -> vacuum) --
  // The r8 verdict's missing lifecycle piece: 8 daily CM-cell appends
  // accumulate 8 live commits; ManifestStore.compact collapses them to
  // ONE (the return value — liveCommits before — and the second
  // compact's 0 are require'd in-gate, proving post-compaction reads
  // touch O(partitions) commits, not O(days)); vacuum(0) reclaims the
  // superseded commit dirs; and the store's summed cells are
  // bit-identical before and after (require'd on the collected cell
  // tables — bounded at d×w = 4096 rows by sketch geometry, never
  // row-scaled). The probe then reads the compacted store, which must
  // still equal the one-shot batch sketch — same oracle as x111/x114.
  def x117StoreLifecycle(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.ManifestStore
    val keys = t(spark, dir, "events")
      .select(col("event_id"), col("user_id").as("k"))
    val table = FreshTables.next(spark, dir, "cmlife")
    for (d <- 0 to 7)
      Sketches.countMinAppendDay(spark,
        keys.filter(col("event_id") % 8 === d).select(col("k")),
        "k", s"day$d", table, depth = 4, width = 1024)
    val pre = Sketches.countMinCellsFromStore(spark, table)
      .orderBy(col("r"), col("cell")).collect().map(_.toSeq).toSeq
    val collapsed = ManifestStore.compact(spark, table)
    require(collapsed == 8,
      s"x117: expected 8 live commits before compaction, saw $collapsed")
    // no concurrent writer can exist on a FreshTables scratch dir, so the
    // retention fence can be 0 here (see vacuum scaladoc)
    val removed = ManifestStore.vacuum(spark, table, minAgeMillis = 0L)
    require(removed >= 8,
      s"x117: vacuum reclaimed $removed dirs, expected the 8 superseded commits")
    val post = Sketches.countMinCellsFromStore(spark, table)
      .orderBy(col("r"), col("cell")).collect().map(_.toSeq).toSeq
    require(pre == post, "x117: compaction changed the store's cell contents")
    require(ManifestStore.compact(spark, table) == 0,
      "x117: second compact must be a no-op on a single-commit store")
    val cells = Sketches.countMinCellsFromStore(spark, table)
    val exact = Dedup.materialize(
      keys.groupBy(col("k")).agg(count(lit(1)).as("cnt")))
    val top = Sampling.scoredTopK(exact, "k", col("cnt"), k = 20).drop("sel_rank")
    Sketches.countMinEstimate(cells, top, "k", depth = 4, width = 1024)
      .withColumn("overcount", col("est") - col("cnt"))
  }

  // day-keyed subtotals sum to the batch sketch no matter how history is
  // sliced, so the lifecycle store's oracle is x111's batch oracle
  val x117Sql: String = x111Sql

  // --- x118: plan-driven salted join on a hot key -------------------------
  // x106's salt plan composed with the join it exists for: half the
  // event stream collapses onto ONE key (user_id 0), making the plain
  // join's hash partitioning put 50% of the fact table on a single
  // reducer. plannedSaltedJoin spreads exactly the plan's hot keys
  // over ceil(cnt/target) salt buckets (routing only — the joined row
  // SET is deterministic), and the gate aggregates the join output so
  // the oracle is the plain-join SQL.
  def x118SaltedHotJoin(spark: SparkSession, dir: String): DataFrame = {
    val fact = t(spark, dir, "events")
      .select(when(col("user_id") % 2 === 0, lit(0L))
        .otherwise(col("user_id")).as("k"))
    val dim = Dedup.materialize(
      fact.distinct().withColumn("seg", expr("k % 7")))
    val plan = graft.operators.Skew.saltPlan(fact, "k", targetRows = 1000L)
    graft.operators.Skew.plannedSaltedJoin(fact, dim, "k", plan)
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("n_rows"), count_distinct(col("k")).as("n_keys"))
  }

  val x118Sql: String =
    """WITH f AS (SELECT CASE WHEN user_id % 2 = 0 THEN 0 ELSE user_id END AS k
         FROM events),
       d AS (SELECT DISTINCT k, k % 7 AS seg FROM f)
       SELECT seg, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(DISTINCT k) AS BIGINT) AS n_keys
       FROM f JOIN d USING (k) GROUP BY 1"""

  // --- x119: sliding-window duplicate-span profile ------------------------
  // Lee et al. exact-substring DETECTION with true sliding windows
  // (every 8-token window, vs x49's disjoint tiles): per doc, how many
  // of its tokens sit inside a window whose exact sequence repeats
  // anywhere in the corpus — the thresholding signal before span
  // surgery. Interval union via a lag sweep, exact integers end to end.
  def x119SlidingDup(spark: SparkSession, dir: String): DataFrame =
    Dedup.slidingDupStats(t(spark, dir, "documents"), "doc_id", "text", k = 8)

  val x119Sql: String =
    """WITH t AS (SELECT doc_id,
           list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS ws
         FROM documents),
       tk AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens, ws FROM t),
       w AS (SELECT doc_id, i - 1 AS tpos,
           md5(array_to_string(ws[i:i+7], ' ')) AS fp
         FROM tk, unnest(range(1, n_tokens - 6)) AS u(i)),
       dup AS (SELECT fp FROM w GROUP BY fp HAVING count(*) > 1),
       sw AS (SELECT doc_id, tpos,
           tpos - lag(tpos) OVER (PARTITION BY doc_id ORDER BY tpos) AS gap
         FROM w JOIN dup USING (fp)),
       cov AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_windows,
           CAST(sum(CASE WHEN gap IS NULL THEN 8 ELSE least(8, gap) END) AS BIGINT)
             AS covered_tokens
         FROM sw GROUP BY 1),
       nw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows FROM w GROUP BY 1)
       SELECT tk.doc_id, tk.n_tokens, nw.n_windows,
         CAST(coalesce(cov.dup_windows, 0) AS BIGINT) AS dup_windows,
         CAST(coalesce(cov.covered_tokens, 0) AS BIGINT) AS covered_tokens,
         round(CAST(coalesce(cov.covered_tokens, 0) AS DOUBLE)
           / CAST(tk.n_tokens AS DOUBLE), 6) AS dup_frac
       FROM tk JOIN nw USING (doc_id) LEFT JOIN cov USING (doc_id)"""

  // --- x120: product-quantization ANN (encode + ADC top-k) ----------------
  // PQ over the embeddings (4 subspaces x 16 dims, 16 sampled codewords
  // per subspace): encode the corpus to 4 codes/vector, then ADC top-10
  // for the x07 query slice through the integer LUT. The oracle
  // replicates codebook, argmin encode, LUT, and fused ranking — all on
  // the same fixed-point grid, so agreement is exact.
  def x120PqAnn(spark: SparkSession, dir: String): DataFrame = {
    val data = t(spark, dir, "embeddings")
    val cb = Pq.codebook(data, "vec_id", "embedding",
      dim = 64, m = 4, k = 16, stride = 3)
    val codes = Pq.encode(data, cb, "vec_id", "embedding", dim = 64, m = 4)
    Pq.adcTopK(data.filter(col("vec_id") < 8), codes, cb,
      "vec_id", "embedding", dim = 64, m = 4, k = 10)
  }

  private def pqD2(a: String, b: String): String =
    s"""CAST(round((list_sum(list_transform(range(1, 17), i -> $a[i] * $a[i]))
       + list_sum(list_transform(range(1, 17), i -> $b[i] * $b[i]))
       - 2 * list_sum(list_transform(range(1, 17), i -> $a[i] * $b[i]))) * 1e9)
       AS BIGINT)"""

  /** Shared PQ CTE chain over a pre-defined `v(vec_id, ..., ve)`:
    * codebook `cb`, per-vector subspaces `vsub`, argmin `codes`, and
    * the x07-slice query LUT `lut` — reused by x120 and the x128 IVF+PQ
    * composition.
    */
  private val pqCtes: String =
    s"""subs AS (SELECT unnest(range(0, 4)) AS sub),
       cb AS (SELECT s.sub, c.vec_id // 3 AS code,
           c.ve[s.sub * 16 + 1 : s.sub * 16 + 16] AS cv
         FROM v c CROSS JOIN subs s
         WHERE c.vec_id % 3 = 0 AND c.vec_id < 48 AND c.vec_id >= 0),
       vsub AS (SELECT vec_id, s.sub, ve[s.sub * 16 + 1 : s.sub * 16 + 16] AS sv
         FROM v CROSS JOIN subs s),
       pqdist AS (SELECT vs.vec_id, vs.sub, cb.code, ${pqD2("vs.sv", "cb.cv")} AS d9
         FROM vsub vs JOIN cb ON vs.sub = cb.sub),
       codes AS (SELECT vec_id, sub, code FROM (
           SELECT vec_id, sub, code,
             row_number() OVER (PARTITION BY vec_id, sub ORDER BY d9, code) AS rn
           FROM pqdist) WHERE rn = 1),
       lut AS (SELECT q.vec_id AS query_id, cb.sub, cb.code,
           ${pqD2("q.sv", "cb.cv")} AS pd9
         FROM vsub q JOIN cb ON q.sub = cb.sub WHERE q.vec_id < 8)"""

  val x120Sql: String =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
       $pqCtes,
       scored AS (SELECT l.query_id, c.vec_id, CAST(sum(l.pd9) AS BIGINT) AS est_d9
         FROM codes c JOIN lut l ON c.sub = l.sub AND c.code = l.code
         GROUP BY 1, 2),
       r AS (SELECT query_id, vec_id, est_d9,
           row_number() OVER (PARTITION BY query_id ORDER BY est_d9, vec_id) AS rank
         FROM scored)
       SELECT query_id, rank, vec_id, est_d9 FROM r WHERE rank <= 10"""

  // --- x121: cross-dataset exact n-gram contamination matrix --------------
  // GPT-3-style exact-overlap audit generalized to all source pairs:
  // distinct 5-gram vocabulary Jaccard per (source_a, source_b) — the
  // complement of x60's near-dup-pair matrix and x31/x55's
  // one-benchmark checks. Pair volume is sum over shingles of
  // (sources holding it)^2 — bounded by the source count, never doc^2.
  def x121ContaminationMatrix(spark: SparkSession, dir: String): DataFrame =
    Dedup.groupShingleOverlap(t(spark, dir, "documents"),
      "doc_id", "text", "source", n = 5)

  val x121Sql: String =
    """WITH t AS (SELECT source, doc_id,
           list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS ws
         FROM documents),
       sh AS (SELECT DISTINCT source, md5(array_to_string(ws[i:i+4], ' ')) AS fp
         FROM t, unnest(range(1, len(ws) - 3)) AS u(i)),
       sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS nsh FROM sh GROUP BY 1),
       shared AS (SELECT a.source AS group_a, b.source AS group_b,
           CAST(count(*) AS BIGINT) AS shared
         FROM sh a JOIN sh b ON a.fp = b.fp AND a.source < b.source
         GROUP BY 1, 2)
       SELECT s.group_a, s.group_b, s.shared,
         na.nsh AS n_a, nb.nsh AS n_b,
         round(CAST(s.shared AS DOUBLE)
           / CAST(na.nsh + nb.nsh - s.shared AS DOUBLE), 6) AS jaccard
       FROM shared s JOIN sizes na ON na.source = s.group_a
       JOIN sizes nb ON nb.source = s.group_b"""

  // --- x122: hopping event-time windows ------------------------------------
  // The sliding complement of x09's tumbling buckets: 2 h windows
  // hopping every 30 min, each event expanded into exactly 4 windows
  // (bounded explode), one map-side-combined shuffle on (window_start,
  // event_type). Exact integer microsecond math on both engines.
  def x122HoppingWindow(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    Events.hopping(
      ev.withColumn("ts_us", Events.epochMicros(ev)),
      "ts_us", slideUs = 30L * 60 * 1000000L, spanUs = 2L * 3600 * 1000000L,
      keys = Seq(col("event_type")),
      aggs = Seq(count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).cast("double").as("total_value")))
  }

  val x122Sql: String =
    """WITH x AS (SELECT epoch_us(ts) AS e, event_type, value FROM events),
       h AS (SELECT ((e - (e % 1800000000 + 1800000000) % 1800000000)
             // 1800000000 - i) * 1800000000 AS window_start,
           event_type, value
         FROM x, unnest(range(0, 4)) AS u(i))
       SELECT window_start, event_type, CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(28, 2))) AS DOUBLE) AS total_value,
         window_start + 7200000000 AS window_end
       FROM h GROUP BY 1, 2"""

  // --- x123: maintained histogram store + quantile bounds ------------------
  // The x114 day-keyed-subtotal pattern applied to a QUANTILE synopsis:
  // three days of doc-length histogram cells (width 32) land as
  // replay-idempotent day subtotals (day 1 appended twice in-gate); the
  // store reads back as EXACTLY the batch histogram (cells add), and
  // the p50/p90/p99 bucket bounds come off the O(buckets) cell table.
  def x123HistStore(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select(col("doc_id"), col("n_chars"))
    val table = FreshTables.next(spark, dir, "histstore")
    for (d <- 0 to 2)
      Sketches.histAppendDay(spark,
        docs.filter(col("doc_id") % 3 === d).select(col("n_chars")),
        "n_chars", bucketWidth = 32L, day = s"day$d", table = table)
    // replay day 1: idempotence is part of the gated contract
    Sketches.histAppendDay(spark,
      docs.filter(col("doc_id") % 3 === 1).select(col("n_chars")),
      "n_chars", bucketWidth = 32L, day = "day1", table = table)
    Sketches.histQuantiles(
      Sketches.histCellsFromStore(spark, table), bucketWidth = 32L,
      qs = Seq(0.5, 0.9, 0.99))
  }

  val x123Sql: String =
    """WITH c AS (SELECT n_chars // 32 AS bucket, CAST(count(*) AS BIGINT) AS cnt
         FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
       w AS (SELECT bucket, cnt,
           sum(cnt) OVER (ORDER BY bucket) AS cum,
           sum(cnt) OVER () AS n
         FROM c),
       qs AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
           CAST(0.99 AS DOUBLE)]) AS q)
       SELECT q, bucket, CAST(bucket * 32 AS BIGINT) AS lo,
         CAST(bucket * 32 + 31 AS BIGINT) AS hi, cnt
       FROM w, qs
       WHERE CAST(floor(q * (n - 1)) + 1 AS BIGINT) > cum - cnt
         AND CAST(floor(q * (n - 1)) + 1 AS BIGINT) <= cum"""

  // --- x124: binned range join (point-in-interval, NO equi-key) ----------
  // The range-predicate join Spark has no operator for: per-user audit
  // intervals (each user's first event + a user-scaled horizon) matched
  // against EVERY event's timestamp — no equi-key, so the naive plan is
  // a nested loop. RangeJoin.pointInInterval turns it into a bucket
  // equi-join (30 min bins) + exact re-check; the spec pins that no
  // BroadcastNestedLoopJoin/CartesianProduct survives in the plan.
  def x124RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val ev = Dedup.materialize(
      e.select(col("user_id"), Events.epochMicros(e).as("pt")))
    val iv = ev.filter(col("user_id") < 50)
      .groupBy(col("user_id"))
      .agg(min(col("pt")).as("lo"))
      .select(col("user_id").as("iv_user"), col("lo"),
        (col("lo") + (col("user_id") + 1) * lit(600000000L)).as("hi"))
    graft.operators.RangeJoin.pointInInterval(
        ev.select(col("pt")), iv, "pt", "lo", "hi",
        bucketWidth = 30L * 60 * 1000000L)
      .groupBy(col("iv_user"))
      .agg(count(lit(1)).as("n_hits"), min(col("pt")).as("first_hit"),
        max(col("pt")).as("last_hit"))
  }

  val x124Sql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS pt FROM events),
       iv AS (SELECT user_id AS iv_user, min(pt) AS lo,
           min(pt) + (user_id + 1) * 600000000 AS hi
         FROM e WHERE user_id < 50 GROUP BY user_id)
       SELECT iv_user, CAST(count(*) AS BIGINT) AS n_hits,
         min(e.pt) AS first_hit, max(e.pt) AS last_hit
       FROM iv JOIN e ON e.pt >= iv.lo AND e.pt < iv.hi GROUP BY 1"""

  // --- x125: binned interval-overlap join (concurrent sessions) ----------
  // x08's sessions turned into validity intervals, then the overlap
  // join: which user pairs were active at the same moment, and how many
  // of their session pairs overlapped. The canonical-bucket trick
  // dedupes pairs without a distinct; the exact overlap predicate
  // re-checks candidates. Users capped at < 100 so pair volume is
  // bounded by the USER pair count, not corpus size.
  def x125SessionOverlap(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val sess = Dedup.materialize(Events.sessionizeBatch(
        e.filter(col("user_id") < 100)
          .withColumn("ts_us", Events.epochMicros(e)),
        "user_id", "ts_us", gap = 30L * 60 * 1000000L)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts_us")).as("lo"),
        (max(col("ts_us")) + 1L).as("hi")))
    val a = sess.select(col("user_id").as("ua"),
      col("lo").as("alo"), col("hi").as("ahi"))
    val b = sess.select(col("user_id").as("ub"),
      col("lo").as("blo"), col("hi").as("bhi"))
    graft.operators.RangeJoin.intervalOverlap(
        a, b, "alo", "ahi", "blo", "bhi",
        bucketWidth = 6L * 3600 * 1000000L)
      .filter(col("ua") < col("ub"))
      .groupBy(col("ua"), col("ub"))
      .agg(count(lit(1)).as("n_overlaps"))
  }

  val x125Sql: String =
    """WITH x AS (SELECT user_id, epoch_us(ts) AS e FROM events WHERE user_id < 100),
       s AS (SELECT user_id, e,
         CASE WHEN lag(e) OVER w IS NULL OR e - lag(e) OVER w > 1800000000
              THEN 1 ELSE 0 END AS ns
         FROM x WINDOW w AS (PARTITION BY user_id ORDER BY e)),
       g AS (SELECT user_id, e,
         sum(ns) OVER (PARTITION BY user_id ORDER BY e
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq FROM s),
       iv AS (SELECT user_id, seq, min(e) AS lo, max(e) + 1 AS hi
         FROM g GROUP BY 1, 2)
       SELECT a.user_id AS ua, b.user_id AS ub,
         CAST(count(*) AS BIGINT) AS n_overlaps
       FROM iv a JOIN iv b
         ON a.lo < b.hi AND b.lo < a.hi AND a.user_id < b.user_id
       GROUP BY 1, 2"""

  // --- x126: STREAMING hopping windows ------------------------------------
  // x122's hopping aggregation as a NATIVE Structured Streaming window
  // (window(ts, span, slide) — Spark expands each event into its 4
  // windows inside the streaming agg; state is O(active windows ×
  // event_types), bounded by the horizon). Complete-mode drain over the
  // staged events must equal the batch hopping pass exactly, so the
  // oracle is x122's.
  def x126StreamHopping(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val base = s"/tmp/graft/shop_$tag"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val e = t(spark, dir, "events")
    val src = e.select(timestamp_micros(Events.epochMicros(e)).as("tss"),
      col("event_type"), col("value"))
    src.write.parquet(s"$base/in")
    val qname = s"x126_shop_$tag"
    spark.catalog.dropTempView(qname)
    val agg = spark.readStream.schema(src.schema).parquet(s"$base/in")
      .groupBy(window(col("tss"), "2 hours", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(dec2(col("value"))).as("__tv"))
    val q = agg.writeStream.format("memory").queryName(qname)
      .outputMode("complete")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    try { if (!q.awaitTermination(300000)) throw new RuntimeException("x126: drain timeout") }
    finally q.stop()
    spark.table(qname).select(
      unix_micros(col("window.start")).as("window_start"),
      col("event_type"), col("n_events"),
      col("__tv").cast("double").as("total_value"),
      unix_micros(col("window.end")).as("window_end"))
  }

  // Spark's window(ts, span, slide) and Events.hopping produce the same
  // epoch-aligned half-open windows, so the streaming drain shares the
  // batch oracle
  val x126Sql: String = x122Sql

  // --- x127: DP counts with per-user contribution bounding ----------------
  // The user-level-DP preprocessing x107 assumes away: each user's rows
  // per event_type capped at 5 (first by event_id — a deterministic,
  // data-independent rule), then Laplace(cap/eps) noise at the scale
  // the bounded sensitivity requires. Fixture seed + audit flag mark
  // this as a portability oracle, like x107.
  def x127DpBounded(spark: SparkSession, dir: String): DataFrame =
    Privacy.dpBoundedCounts(t(spark, dir, "events"),
      "user_id", "event_type", "event_id", capPerUser = 5,
      epsilon = 1.0, seed = DpFixtureSeed, includeBounded = true)

  val x127Sql: String =
    s"""WITH b AS (SELECT event_type FROM (
           SELECT event_type,
             row_number() OVER (PARTITION BY user_id, event_type
               ORDER BY event_id) AS rn
           FROM events) WHERE rn <= 5),
       ex AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_bounded
         FROM b GROUP BY 1),
       h AS (SELECT event_type, n_bounded,
           md5('$DpFixtureSeed' || '|' || event_type) AS hx FROM ex),
       u AS (SELECT event_type, n_bounded,
           (CAST(${duckHex48("hx")} AS DOUBLE) + 0.5) / 281474976710656.0 AS u
         FROM h)
       SELECT event_type, n_bounded,
         round(CAST(n_bounded AS DOUBLE) +
           ((-5.0 * sign(u - 0.5)) * ln(1.0 - 2.0 * abs(u - 0.5))), 6) AS n_noisy
       FROM u"""

  // --- x128: IVF + PQ — the production ANN pipeline end to end ------------
  // x11's bucket pruning composed with x120's compression: queries probe
  // their 3 nearest centroid buckets, then ADC-score ONLY those buckets'
  // code rows through the integer LUT — per-query work is the probed
  // partitions' codes, not the corpus, and the scored payload is m
  // one-byte codes per vector, not the float vector. At write time the
  // centroid assignment is the table's partition key, so the probe
  // prunes whole partitions. Self-matches excluded like ivfTopK.
  def x128IvfPq(spark: SparkSession, dir: String): DataFrame = {
    val data = t(spark, dir, "embeddings")
    val cents = data.filter(col("vec_id") % 50 === 0)
    val assigned = Similarity.ivfAssign(data, cents, "vec_id", "embedding")
      .select(col("vec_id"), col("centroid_id"))
    val queries = data.filter(col("vec_id") < 8)
    val probes = Similarity.probeCentroids(queries, cents,
      "vec_id", "embedding", nprobe = 3)
    val candidates = probes
      .join(assigned.select(col("centroid_id"), col("vec_id")), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
    val cb = Pq.codebook(data, "vec_id", "embedding",
      dim = 64, m = 4, k = 16, stride = 3)
    val codes = Pq.encode(data, cb, "vec_id", "embedding", dim = 64, m = 4)
    Pq.adcTopKCandidates(queries, candidates, codes, cb,
      "vec_id", "embedding", dim = 64, m = 4, k = 10)
  }

  val x128Sql: String =
    s"""WITH $ivfCtes,
       $pqCtes,
       pr0 AS (SELECT q.vec_id AS query_id, c.centroid_id,
           list_sum(list_transform(range(1, len(q.ve) + 1), i -> q.ve[i] * c.cv[i])) / (q.nrm * c.cn) AS sim
         FROM n q CROSS JOIN c WHERE q.vec_id < 8),
       pr AS (SELECT query_id, centroid_id FROM (
           SELECT query_id, centroid_id,
                  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, centroid_id) AS rn
           FROM pr0) WHERE rn <= 3),
       cand AS (SELECT pr.query_id, asg.vec_id
         FROM pr JOIN asg USING (centroid_id)
         WHERE asg.vec_id <> pr.query_id),
       scored AS (SELECT ca.query_id, ca.vec_id, CAST(sum(l.pd9) AS BIGINT) AS est_d9
         FROM cand ca JOIN codes cd ON ca.vec_id = cd.vec_id
         JOIN lut l ON l.query_id = ca.query_id
           AND l.sub = cd.sub AND l.code = cd.code
         GROUP BY 1, 2),
       r AS (SELECT query_id, vec_id, est_d9,
           row_number() OVER (PARTITION BY query_id ORDER BY est_d9, vec_id) AS rank
         FROM scored)
       SELECT query_id, rank, vec_id, est_d9 FROM r WHERE rank <= 10"""

  // --- x129: maintained vector-index store (IVF + PQ, day over day) ------
  // x128's pipeline as a PERSISTED index (ext/VectorStore): codes
  // partitioned by centroid assignment, model tables frozen at build.
  // The gate splits the corpus into history and a day's increment
  // (chosen OFF the model ids, so the frozen model equals the full-data
  // model and the oracle is x128's); builds from history, proves the
  // pre-append probe cannot see the increment, folds the day in TWICE
  // (replay-idempotence is part of the contract), and returns the
  // post-append probe — which must equal the one-shot IVF+PQ pass over
  // the full corpus, bit for bit.
  def x129VectorStore(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.VectorStore
    val data = t(spark, dir, "embeddings")
    val incPred = col("vec_id") % 5 === 1 && col("vec_id") % 3 =!= 0
    val hist = data.filter(!incPred)
    val inc = Dedup.materialize(data.filter(incPred))
    val cents = data.filter(col("vec_id") % 50 === 0)
    val root = FreshTables.next(spark, dir, "vecstore")
    VectorStore.build(spark, hist, cents, "vec_id", "embedding", root,
      dim = 64, m = 4, k = 16, stride = 3)
    val queries = data.filter(col("vec_id") < 8)
    val pre = VectorStore.probe(spark, queries, "vec_id", "embedding", root,
      dim = 64, m = 4, k = 16, stride = 3, nprobe = 3, topK = 10)
    require(pre.filter(col("vec_id") % 5 === 1 && col("vec_id") % 3 =!= 0)
        .count() == 0L,
      "x129: pre-append probe must not see the increment")
    VectorStore.appendDay(spark, inc, "vec_id", "embedding", root,
      dim = 64, m = 4, k = 16, stride = 3)
    // replay the day: merge on (vec_id, sub) must replace, not duplicate
    VectorStore.appendDay(spark, inc, "vec_id", "embedding", root,
      dim = 64, m = 4, k = 16, stride = 3)
    val nCodes = graft.sources.ManifestStore.read(spark, s"$root/codes").count()
    require(nCodes == data.count() * 4,
      s"x129: store holds $nCodes code rows, expected corpus x m")
    VectorStore.probe(spark, queries, "vec_id", "embedding", root,
      dim = 64, m = 4, k = 16, stride = 3, nprobe = 3, topK = 10)
  }

  // the final store state IS the full-corpus IVF+PQ index (frozen model
  // == full-data model by construction), so the oracle is x128's
  val x129Sql: String = x128Sql

  // --- x130: data-quality expectation suite --------------------------------
  // The promote-gate audit (Deequ-style): five checks over documents —
  // null lang, unique doc_id, length range, accepted languages, and
  // doc->embedding referential integrity. All row-local checks + the
  // uniqueness check ride ONE aggregation pass; the ref check is one
  // broadcast anti-join. Checks are chosen so both pass AND fail rows
  // exist (zh is deliberately outside the accepted set; n_chars range
  // is deliberately tight).
  def x130Expectations(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.Expectations._
    audit(t(spark, dir, "documents"), Seq(
      NotNull("c1_lang_notnull", "lang"),
      Unique("c2_docid_unique", "doc_id"),
      InRange("c3_len_range", "n_chars", lo = 50, hi = 500),
      Accepted("c4_lang_accepted", "lang", Seq("en", "de", "es", "fr")),
      RefIntegrity("c5_has_embedding", "doc_id",
        t(spark, dir, "embeddings"), "vec_id")))
  }

  val x130Sql: String =
    """SELECT 'c1_lang_notnull' AS check_id, 'not_null' AS check_type,
         'lang' AS col_name,
         CAST(count(CASE WHEN lang IS NULL THEN 1 END) AS BIGINT) AS n_violations,
         count(CASE WHEN lang IS NULL THEN 1 END) = 0 AS pass
       FROM documents
       UNION ALL
       SELECT 'c2_docid_unique', 'unique', 'doc_id',
         CAST(count(CASE WHEN doc_id IS NOT NULL THEN 1 END)
           - count(DISTINCT doc_id) AS BIGINT) AS v,
         count(CASE WHEN doc_id IS NOT NULL THEN 1 END)
           - count(DISTINCT doc_id) = 0
       FROM documents
       UNION ALL
       SELECT 'c3_len_range', 'in_range', 'n_chars',
         CAST(count(CASE WHEN n_chars IS NOT NULL
           AND (n_chars < 50 OR n_chars > 500) THEN 1 END) AS BIGINT) AS v,
         count(CASE WHEN n_chars IS NOT NULL
           AND (n_chars < 50 OR n_chars > 500) THEN 1 END) = 0
       FROM documents
       UNION ALL
       SELECT 'c4_lang_accepted', 'accepted', 'lang',
         CAST(count(CASE WHEN lang IS NOT NULL
           AND lang NOT IN ('en', 'de', 'es', 'fr') THEN 1 END) AS BIGINT) AS v,
         count(CASE WHEN lang IS NOT NULL
           AND lang NOT IN ('en', 'de', 'es', 'fr') THEN 1 END) = 0
       FROM documents
       UNION ALL
       SELECT 'c5_has_embedding', 'ref_integrity', 'doc_id',
         CAST((SELECT count(*) FROM documents d
           WHERE d.doc_id IS NOT NULL AND NOT EXISTS
             (SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id)) AS BIGINT) AS v,
         (SELECT count(*) FROM documents d
           WHERE d.doc_id IS NOT NULL AND NOT EXISTS
             (SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id)) = 0"""

  // --- x131: cluster-aware split (the FIX for x80's leakage finding) ------
  // x80 AUDITS near-dup leakage across a doc-keyed split; this gate
  // removes it: the split key is the doc's near-dup CLUSTER (connected
  // component label; singletons key on their own id), so an entire
  // duplicate family lands in one split and cross-split near-dup pairs
  // are ZERO by construction — require'd in-gate on the same banded
  // pair set x80 audits.
  def x131ClusterSplit(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val pairs = allPairs(spark, dir)
    val clusters = Dedup.duplicateClusters(pairs)
    val keyed = docs.select(col("doc_id"))
      .join(clusters.select(col("id").as("doc_id"), col("label")),
        Seq("doc_id"), "left")
      .withColumn("ckey", coalesce(col("label"), col("doc_id")))
    val split = Dedup.materialize(Sampling.hashSplit(keyed, "ckey",
        Seq(("train", 52429), ("val", 58982)), "test")
      .select(col("doc_id"), col("ckey"), col("split")))
    val sp = split.select(col("doc_id"), col("split"))
    val leaks = pairs
      .join(sp.select(col("doc_id").as("id_a"), col("split").as("sa")), "id_a")
      .join(sp.select(col("doc_id").as("id_b"), col("split").as("sb")), "id_b")
      .filter(col("sa") =!= col("sb")).count()
    require(leaks == 0L,
      s"x131: $leaks near-dup pairs cross splits — cluster keying is broken")
    split.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("ckey")).as("n_clusters"))
  }

  val x131Sql: String = {
    val bkt = (c: String) =>
      s"""CAST((strpos('0123456789abcdef', substr(md5(CAST($c AS VARCHAR)), 1, 1)) - 1) * 4096
         + (strpos('0123456789abcdef', substr(md5(CAST($c AS VARCHAR)), 2, 1)) - 1) * 256
         + (strpos('0123456789abcdef', substr(md5(CAST($c AS VARCHAR)), 3, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(md5(CAST($c AS VARCHAR)), 4, 1)) - 1) AS BIGINT)"""
    s"""WITH RECURSIVE ${jaccardCtes(3)},
       ${componentCtes(0.7)},
       cl AS (SELECT id AS doc_id, min(r) AS label FROM reach GROUP BY id),
       keyed AS (SELECT d.doc_id, coalesce(cl.label, d.doc_id) AS ckey
         FROM documents d LEFT JOIN cl USING (doc_id)),
       sp AS (SELECT doc_id, ckey,
           CASE WHEN ${bkt("ckey")} < 52429 THEN 'train'
                WHEN ${bkt("ckey")} < 58982 THEN 'val' ELSE 'test' END AS split
         FROM keyed)
       SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT ckey) AS BIGINT) AS n_clusters
       FROM sp GROUP BY 1"""
  }

  // --- x110: session-scoped conversion funnel ----------------------------
  // x08's gap sessions composed with x94's ordered funnel: the chain
  // must complete INSIDE one session — the composite (user, session)
  // progression key exercises funnelByKeys.
  def x110SessionFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val sess = Events.sessionizeBatch(
      ev.withColumn("ts_us", Events.epochMicros(ev)),
      "user_id", "ts_us", gap = 30L * 60 * 1000000L)
    Events.funnelByKeys(sess, Seq("user_id", "session_seq"),
      "event_type", "ts_us", Seq("view", "click", "purchase"))
  }

  val x110Sql: String =
    """WITH x AS (SELECT user_id, event_type, epoch_us(ts) AS e FROM events),
       s AS (SELECT user_id, event_type, e,
         CASE WHEN lag(e) OVER w IS NULL OR e - lag(e) OVER w > 1800000000
              THEN 1 ELSE 0 END AS ns
         FROM x WINDOW w AS (PARTITION BY user_id ORDER BY e)),
       g AS (SELECT user_id, event_type, e,
         sum(ns) OVER (PARTITION BY user_id ORDER BY e
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq FROM s),
       s1 AS (SELECT user_id, seq, min(e) AS t FROM g
         WHERE event_type = 'view' GROUP BY 1, 2),
       s2 AS (SELECT g.user_id, g.seq, min(g.e) AS t FROM g
         JOIN s1 ON g.user_id = s1.user_id AND g.seq = s1.seq AND g.e > s1.t
         WHERE g.event_type = 'click' GROUP BY 1, 2),
       s3 AS (SELECT g.user_id, g.seq, min(g.e) AS t FROM g
         JOIN s2 ON g.user_id = s2.user_id AND g.seq = s2.seq AND g.e > s2.t
         WHERE g.event_type = 'purchase' GROUP BY 1, 2)
       SELECT CAST(1 AS BIGINT) AS stage_idx, 'view' AS stage,
         CAST(count(*) AS BIGINT) AS units FROM s1
       UNION ALL
       SELECT CAST(2 AS BIGINT), 'click', CAST(count(*) AS BIGINT) FROM s2
       UNION ALL
       SELECT CAST(3 AS BIGINT), 'purchase', CAST(count(*) AS BIGINT) FROM s3"""

  // --- x132: per-language KN scoring + CCNet quality buckets --------------
  // The CCNet curation cut (Wenzek et al. 2020): every language gets its
  // OWN Kneser-Ney model (LangModel.knScoreBy — pooling would let the
  // dominant language's statistics drown the rest) and its own
  // head/middle/tail boundaries (Sampling.groupedPhases — per-group
  // thirds of the score distribution, phase 0 = most reference-like).
  // The rollup re-rounds the 6-dp score to exact integer micro-units
  // before summing, so the per-bucket totals are order-free LONGs.
  def x132PerplexityBuckets(spark: SparkSession, dir: String): DataFrame = {
    // materialized: groupedPhases consumes the scored frame twice (the
    // distribution pass and the join-back) — x05 multi-consumer rule
    val scored = Dedup.materialize(LangModel.knScoreBy(
      t(spark, dir, "documents"), "doc_id", "text", Seq("lang")))
    Sampling.groupedPhases(scored, Seq("lang"), "avg_lp", 3)
      .groupBy(col("lang"), col("phase").as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bigrams")).as("n_bigrams"),
        sum(round(col("avg_lp") * lit(1e6d), 0).cast("long")).as("sum_lp6"))
  }

  val x132Sql: String =
    """WITH t AS (SELECT doc_id, lang, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
       bi AS (SELECT doc_id, lang, unnest(range(1, len(ws))) AS i, ws FROM t),
       bg AS (SELECT doc_id, lang, ws[i] AS w1, ws[i+1] AS w2 FROM bi),
       c2 AS (SELECT lang, w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY 1, 2, 3),
       ctx AS (SELECT lang, w1, CAST(sum(c2) AS BIGINT) AS c1,
           CAST(count(*) AS BIGINT) AS n1f FROM c2 GROUP BY 1, 2),
       back AS (SELECT lang, w2, CAST(count(*) AS BIGINT) AS n1b FROM c2 GROUP BY 1, 2),
       np AS (SELECT lang, CAST(count(*) AS BIGINT) AS np FROM c2 GROUP BY 1),
       sc AS (SELECT bg.doc_id, bg.lang,
           CAST(round(ln(
             (CAST(c2.c2 AS DOUBLE) - 0.75 +
              0.75 * CAST(ctx.n1f AS DOUBLE) *
                (CAST(back.n1b AS DOUBLE) / CAST(np.np AS DOUBLE)))
             / CAST(ctx.c1 AS DOUBLE)) * 1000000000.0, 0) AS BIGINT) AS lp9
         FROM bg JOIN c2 USING (lang, w1, w2) JOIN ctx USING (lang, w1)
         JOIN back USING (lang, w2) JOIN np USING (lang)),
       d AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_bigrams,
           round((CAST(sum(lp9) AS DOUBLE) / 1000000000.0)
                 / CAST(count(*) AS DOUBLE), 6) AS avg_lp
         FROM sc GROUP BY 1, 2),
       dist AS (SELECT lang, avg_lp AS s, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY 1, 2),
       cb AS (SELECT lang, s,
           CAST(coalesce(sum(c) OVER (PARTITION BY lang ORDER BY s DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum,
           CAST(sum(c) OVER (PARTITION BY lang) AS BIGINT) AS n
         FROM dist),
       ph AS (SELECT lang, s, (3 * cum) // n AS bucket FROM cb),
       j AS (SELECT d.lang, ph.bucket, d.n_bigrams, d.avg_lp
         FROM d JOIN ph ON d.lang = ph.lang AND d.avg_lp = ph.s)
       SELECT lang, CAST(bucket AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams,
         CAST(sum(CAST(round(avg_lp * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS sum_lp6
       FROM j GROUP BY 1, 2"""

  // --- x133: fuzzy benchmark decontamination (MinHash probe) --------------
  // The fuzzy complement to x31/x55's exact n-gram overlap: eval items
  // that were PARAPHRASED or lightly edited into the corpus don't share
  // exact 5-grams but do share most shingles — the near-dup
  // decontamination pass of GPT-3 appendix C / Dodge et al. 2021. The
  // %10 = 0 slice stands in for the benchmark; the corpus probes the
  // benchmark's LSH band index (x48's machinery: O(corpus x bands)
  // probe, never all-pairs, exact-Jaccard verify), and contaminated
  // docs roll up per source. Oracle = exact cross-slice Jaccard (banded
  // recall at 0.7 is exact to well past oracle precision).
  def x133FuzzyDecontam(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val pairs = Dedup.minhashPairsAgainst(corpus, bench, "doc_id", "text",
      shingleN = 3, bands = 32, rowsPerBand = 2, threshold = 0.7)
    val hit = pairs.select(col("inc_id").as("doc_id")).distinct()
      .withColumn("__hit", lit(1))
    corpus.join(hit, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__hit").isNotNull, lit(1L)).otherwise(lit(0L)))
          .as("n_contaminated"))
      .withColumn("n_clean", col("n_docs") - col("n_contaminated"))
  }

  val x133Sql: String =
    """WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS ws FROM documents),
       sh0 AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(ws) - 2, 0) + 1), i -> array_to_string(ws[i:i+2], ' '))) AS sh FROM w),
       sh AS (SELECT doc_id, sh FROM sh0 WHERE len(sh) > 0),
       posts AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       inter AS (SELECT a.doc_id AS inc_id, b.doc_id AS hist_id, count(*) AS i
                 FROM posts a JOIN posts b ON a.s = b.s
                 WHERE a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0 GROUP BY 1, 2),
       sizes AS (SELECT doc_id, len(sh) AS n FROM sh),
       hits AS (SELECT DISTINCT inc_id AS doc_id
         FROM inter JOIN sizes na ON na.doc_id = inc_id
         JOIN sizes nb ON nb.doc_id = hist_id
         WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.7)
       SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(h.doc_id) AS BIGINT) AS n_contaminated,
         CAST(count(*) - count(h.doc_id) AS BIGINT) AS n_clean
       FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
       WHERE d.doc_id % 10 <> 0
       GROUP BY 1"""

  // --- x134: blocked edit-distance entity matching ------------------------
  // Entity-resolution blocking (Fellegi-Sunter; Christen 2012) on the
  // customer master: candidate duplicate records meet only inside their
  // (nation, name-prefix) block — one equi-join shuffle, O(sum block^2)
  // pairs, never the O(n^2) cross join — then the codegen'd levenshtein
  // keeps pairs within edit distance 1. DuckDB's levenshtein is the
  // same unit-cost DP distance, so the oracle is exact.
  def x134BlockedEr(spark: SparkSession, dir: String): DataFrame =
    Similarity.blockedEditPairs(t(spark, dir, "customer"),
      "c_custkey", "c_name",
      // concat (not concat_ws): NULL-PROPAGATING like the oracle's ||,
      // so a null nationkey excludes the record in BOTH engines instead
      // of silently blocking on the bare name prefix in one
      concat(col("c_nationkey").cast("string"), lit("|"),
        substring(col("c_name"), 1, 16)),
      maxDist = 1)

  val x134Sql: String =
    """WITH b AS (SELECT c_custkey AS id, c_name AS nm,
           CAST(c_nationkey AS VARCHAR) || '|' || substr(c_name, 1, 16) AS bk
         FROM customer)
       SELECT a.id AS id_a, c.id AS id_b, levenshtein(a.nm, c.nm) AS dist
       FROM b a JOIN b c ON a.bk = c.bk AND a.id < c.id
       WHERE levenshtein(a.nm, c.nm) <= 1"""

  // --- x135: temporal embargo split (purged time-series holdout) ----------
  // The time-ordered eval-hygiene split (de Prado 2018): train before
  // the 70th percentile of the time RANGE, test after the 80th, the
  // embargo window between DROPPED so autocorrelated state cannot
  // straddle the boundary. The audit reports per-split volume plus
  // cold-start users (test users never seen in train) — the number that
  // tells you whether the test split actually measures generalization
  // to new users or only to new time.
  def x135EmbargoSplit(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val ev = e.select(col("event_id"), col("user_id"),
      Events.epochMicros(e).as("ts_us"))
    val sp = Dedup.materialize(Sampling.embargoSplit(ev, "ts_us", 70, 10))
    val trainUsers = sp.filter(col("split") === "train")
      .select(col("user_id")).distinct().withColumn("__seen", lit(1))
    sp.join(trainUsers, Seq("user_id"), "left")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        count_distinct(when(col("__seen").isNull, col("user_id")))
          .as("n_cold_users"))
  }

  val x135Sql: String =
    """WITH x AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
       b AS (SELECT min(ts_us) AS mn, max(ts_us) AS mx FROM x),
       s AS (SELECT user_id,
           CASE WHEN ts_us < mn + ((mx - mn) * 70) // 100 THEN 'train'
                WHEN ts_us < mn + ((mx - mn) * 80) // 100 THEN 'embargo'
                ELSE 'test' END AS split
         FROM x CROSS JOIN b),
       tu AS (SELECT DISTINCT user_id FROM s WHERE split = 'train')
       SELECT s.split, CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(DISTINCT s.user_id) AS BIGINT) AS n_users,
         CAST(count(DISTINCT CASE WHEN tu.user_id IS NULL THEN s.user_id END) AS BIGINT) AS n_cold_users
       FROM s LEFT JOIN tu ON s.user_id = tu.user_id
       GROUP BY 1"""

  // --- x136: approximate-FD profile (g3 error) ----------------------------
  // Dependency DISCOVERY next to x130's declared checks: how far is each
  // candidate lhs -> rhs from holding exactly, by the g3 measure TANE
  // minimizes (rows to delete / total). l_orderkey -> l_linestatus is a
  // near-FD (line items of an order mostly ship together), the others
  // are deliberately weak — the profile's job is the NUMBER, not a
  // boolean.
  def x136FdProfile(spark: SparkSession, dir: String): DataFrame =
    Profiling.fdProfile(t(spark, dir, "lineitem"), Seq(
      ("l_orderkey", "l_linestatus"),
      ("l_partkey", "l_suppkey"),
      ("l_suppkey", "l_returnflag")))

  val x136Sql: String = {
    def one(lhs: String, rhs: String): String =
      s"""SELECT '$lhs' AS lhs, '$rhs' AS rhs,
         CAST(count(*) AS BIGINT) AS n_groups,
         CAST(count(*) FILTER (WHERE k > 1) AS BIGINT) AS n_violating_groups,
         CAST(sum(n) AS BIGINT) AS n_rows,
         CAST(sum(n - m) AS BIGINT) AS n_violations,
         round(CAST(sum(n - m) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 6) AS g3_rate
       FROM (SELECT l, sum(c) AS n, max(c) AS m, count(*) AS k
             FROM (SELECT $lhs AS l, $rhs AS r, CAST(count(*) AS BIGINT) AS c
                   FROM lineitem GROUP BY 1, 2) GROUP BY 1)"""
    s"""${one("l_orderkey", "l_linestatus")}
       UNION ALL ${one("l_partkey", "l_suppkey")}
       UNION ALL ${one("l_suppkey", "l_returnflag")}"""
  }

  // --- x137: STREAMING vector-index maintenance ---------------------------
  // x129's maintained IVF+PQ store fed by a STREAM: the day's embedding
  // increment arrives in micro-batches (file-per-batch replay), each
  // folded in by VectorStore.appendDay inside foreachBatch — encode
  // against the frozen model, partition-pruned merge on (vec_id, sub).
  // Appends commute and replays replace, so the final store state is
  // micro-batch-invariant AND at-least-once-safe (one batch is
  // deliberately re-appended after the drain); the closing probe must
  // equal the one-shot IVF+PQ pass over the full corpus, bit for bit —
  // x129's contract, reached through the streaming door.
  def x137StreamVectorStore(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.VectorStore
    import org.apache.spark.sql.streaming.Trigger
    val data = t(spark, dir, "embeddings")
    val incPred = col("vec_id") % 5 === 1 && col("vec_id") % 3 =!= 0
    val hist = data.filter(!incPred)
    val inc = Dedup.materialize(data.filter(incPred))
    val cents = data.filter(col("vec_id") % 50 === 0)
    val root = FreshTables.next(spark, dir, "svecstore")
    VectorStore.build(spark, hist, cents, "vec_id", "embedding", root,
      dim = 64, m = 4, k = 16, stride = 3)
    val batchKey = expr("pmod(vec_id div 3, 3)").cast("int")
    val base = FreshTables.next(spark, dir, "svecin")
    (0 until 3).foreach { b =>
      inc.filter(batchKey === b).repartition(1)
        .write.mode("append").parquet(s"$base/in")
    }
    val stream = spark.readStream.schema(inc.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        VectorStore.appendDay(spark, batch, "vec_id", "embedding", root,
          dim = 64, m = 4, k = 16, stride = 3)
        ()
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      if (!q.awaitTermination(300000))
        throw new RuntimeException("x137: drain timeout")
    } finally q.stop()
    // at-least-once replay: re-deliver one batch AFTER the drain — the
    // (vec_id, sub) merge must replace, not duplicate
    VectorStore.appendDay(spark, inc.filter(batchKey === 1),
      "vec_id", "embedding", root, dim = 64, m = 4, k = 16, stride = 3)
    val nCodes = graft.sources.ManifestStore.read(spark, s"$root/codes").count()
    require(nCodes == data.count() * 4,
      s"x137: store holds $nCodes code rows, expected corpus x m")
    VectorStore.probe(spark, data.filter(col("vec_id") < 8),
      "vec_id", "embedding", root,
      dim = 64, m = 4, k = 16, stride = 3, nprobe = 3, topK = 10)
  }

  // final store state == the full-corpus IVF+PQ index (the frozen model
  // is the full-data model by construction, as in x129)
  val x137Sql: String = x128Sql

  // --- x138: HyperLogLog distinct counts (verified sketch) ----------------
  // The constant-state sketch completing the quartet (KMV x40, MG x70,
  // CM x96/x98): 256 one-byte registers per group regardless of
  // cardinality. The gate unions a LOW-cardinality slice (150 users per
  // event type — the linear-counting correction branch) with a HIGH one
  // (distinct orderkeys per returnflag — the raw-estimate branch), so
  // both estimator paths are exercised and gated; n_exact rides along
  // for the accuracy audit. rho comes from bin()-string bit length —
  // never floating log2, whose ulp wobble at exact powers of two could
  // cross the floor boundary between engines.
  /** The shared HLL gate source (x138 / x143 / x146): a LOW-cardinality
    * slice (150 users per event type — the linear-counting branch)
    * unioned with a HIGH one (distinct orderkeys per returnflag — the
    * raw-estimate branch), null values excluded up front (they sketch
    * to nothing and must not count in exact counts or store accounting
    * either). ONE definition, because all three gates share x138's
    * oracle — a drifting copy would silently break that equivalence.
    */
  private def hllSource(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(concat(lit("ev_"), col("event_type")).as("grp"),
        col("user_id").cast("string").as("v"))
    val li = t(spark, dir, "lineitem")
      .select(concat(lit("li_"), col("l_returnflag")).as("grp"),
        col("l_orderkey").cast("string").as("v"))
    Dedup.materialize(ev.unionByName(li).filter(col("v").isNotNull))
  }

  def x138HllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val u = hllSource(spark, dir)
    val est = Sketches.hllEstimate(
      Sketches.hllRegisters(u, "grp", "v", p = 8), "grp", p = 8)
    est.join(u.groupBy(col("grp")).agg(count_distinct(col("v")).as("n_exact")),
      Seq("grp"))
  }

  val x138Sql: String = {
    val hex48 = duckHex48("md5(v)")
    s"""WITH src AS (SELECT 'ev_' || event_type AS grp, CAST(user_id AS VARCHAR) AS v FROM events
         UNION ALL
         SELECT 'li_' || l_returnflag, CAST(l_orderkey AS VARCHAR) FROM lineitem),
       dv AS (SELECT DISTINCT grp, v FROM src WHERE v IS NOT NULL),
       b AS (SELECT grp, $hex48 AS h48 FROM dv),
       r0 AS (SELECT grp, h48 // 1099511627776 AS idx, h48 % 1099511627776 AS w FROM b),
       r AS (SELECT grp, idx,
           CASE WHEN w = 0 THEN 41 ELSE 41 - length(bin(w)) END AS rho FROM r0),
       reg AS (SELECT grp, idx, max(rho) AS rho FROM r GROUP BY 1, 2),
       ag AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_registers,
           sum(power(2.0, -rho)) AS zsum FROM reg GROUP BY 1),
       e0 AS (SELECT grp, n_registers, CAST(256 - n_registers AS BIGINT) AS n_zero,
           (0.7213 / (1 + 1.079 / 256)) * 256.0 * 256.0
             / (zsum + CAST(256 - n_registers AS DOUBLE)) AS raw
         FROM ag),
       ex AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_exact FROM dv GROUP BY 1)
       SELECT e0.grp, n_registers, n_zero,
         round(CASE WHEN raw <= 640.0 AND n_zero > 0
               THEN 256.0 * ln(256.0 / CAST(n_zero AS DOUBLE)) ELSE raw END, 4) AS hll_est,
         n_exact
       FROM e0 JOIN ex ON e0.grp = ex.grp"""
  }

  // --- x139: per-column profile -------------------------------------------
  // The promote-gate datasheet next to x130's declared checks and x136's
  // dependency profile: ONE aggregation pass (multi-distinct via Expand,
  // one shuffle) + stack over the 1-row result — no per-column scans.
  def x139ColumnProfile(spark: SparkSession, dir: String): DataFrame =
    Profiling.columnProfile(t(spark, dir, "documents"),
      Seq("doc_id", "text", "lang", "source", "n_chars"))

  val x139Sql: String = {
    def one(c: String): String =
      s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
         CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         CAST(min($c) AS VARCHAR) AS min_v, CAST(max($c) AS VARCHAR) AS max_v
       FROM documents"""
    Seq("doc_id", "text", "lang", "source", "n_chars")
      .map(one).mkString("\n       UNION ALL ")
  }

  // --- x140: dedup-weighted sampling --------------------------------------
  // The soft alternative to dropping duplicates (keep everything, weight
  // down duplicated content — the Dolma/RedPajama "dedup by weighting"
  // option): each doc's A-Res weight is 1000 / near-dup-cluster size, so
  // a 5-doc cluster carries ~1 doc of expected mass. Rides x04's pairs,
  // x23's components, and x39's exact-k machinery end to end.
  def x140DedupWeighted(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val pairs = allPairs(spark, dir)
    val clusters = Dedup.duplicateClusters(pairs)
    val sizes = clusters.groupBy(col("label")).agg(count(lit(1)).as("__sz"))
    val keyed = docs.select(col("doc_id"))
      .join(clusters.select(col("id").as("doc_id"), col("label")),
        Seq("doc_id"), "left")
      .join(broadcast(sizes), Seq("label"), "left")
      .withColumn("n_dupes", coalesce(col("__sz"), lit(1L)))
      .select(col("doc_id"), col("n_dupes"))
    Sampling.weightedTopK(keyed, "doc_id",
      lit(1000.0d) / col("n_dupes").cast("double"), k = 100)
      .select(col("doc_id"), col("n_dupes"), col("sample_rank"), col("es_key"))
  }

  val x140Sql: String = {
    val hex48 = duckHex48("hx")
    s"""WITH RECURSIVE ${jaccardCtes(3)},
       ${componentCtes(0.7)},
       cl AS (SELECT id AS doc_id, min(r) AS label FROM reach GROUP BY id),
       csz AS (SELECT label, CAST(count(*) AS BIGINT) AS sz FROM cl GROUP BY 1),
       kd AS (SELECT d.doc_id, coalesce(csz.sz, 1) AS n_dupes
         FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id
         LEFT JOIN csz ON csz.label = cl.label),
       h AS (SELECT doc_id, n_dupes, md5(CAST(doc_id AS VARCHAR)) AS hx FROM kd),
       k AS (SELECT doc_id, n_dupes,
             round(ln((CAST($hex48 AS DOUBLE) + 0.5) / 281474976710656.0)
                   / greatest(1000.0 / CAST(n_dupes AS DOUBLE), 1.0), 6) AS es_key FROM h),
       r AS (SELECT doc_id, n_dupes, es_key,
             row_number() OVER (ORDER BY es_key DESC, doc_id) AS rn FROM k)
       SELECT doc_id, CAST(n_dupes AS BIGINT) AS n_dupes,
         CAST(rn AS BIGINT) AS sample_rank, es_key
       FROM r WHERE rn <= 100"""
  }

  // --- x141: session path mining ------------------------------------------
  // The "what do users actually do" product question: top-10 in-session
  // event-type trigrams. Paths are per-session lead windows (one user
  // shuffle, reusing the session partitioning); the rollup collapses to
  // O(|types|^3) path rows before the only global window (<= 125 rows —
  // the justified tiny-input class).
  def x141SessionPaths(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = t(spark, dir, "events")
    val sess = Events.sessionizeBatch(
      e.withColumn("ts_us", Events.epochMicros(e)),
      "user_id", "ts_us", gap = 30L * 60 * 1000000L)
    val w = Window.partitionBy(col("user_id"), col("session_seq"))
      .orderBy(col("ts_us"), col("event_id"))
    val tri = sess
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
    val counts = tri.groupBy(col("path")).agg(count(lit(1)).as("n_occurrences"))
    val rw = Window.orderBy(col("n_occurrences").desc, col("path"))
    counts.withColumn("rank", row_number().over(rw).cast("long"))
      .filter(col("rank") <= 10)
      .select(col("rank"), col("path"), col("n_occurrences"))
  }

  val x141Sql: String =
    """WITH x AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS e FROM events),
       s AS (SELECT user_id, event_id, event_type, e,
           CASE WHEN lag(e) OVER w IS NULL OR e - lag(e) OVER w > 1800000000
                THEN 1 ELSE 0 END AS ns
         FROM x WINDOW w AS (PARTITION BY user_id ORDER BY e, event_id)),
       g AS (SELECT user_id, event_id, event_type, e,
           sum(ns) OVER (PARTITION BY user_id ORDER BY e, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq FROM s),
       t0 AS (SELECT event_type AS e1, lead(event_type, 1) OVER w2 AS e2,
           lead(event_type, 2) OVER w2 AS e3
         FROM g WINDOW w2 AS (PARTITION BY user_id, seq ORDER BY e, event_id)),
       tri AS (SELECT e1 || '>' || e2 || '>' || e3 AS path FROM t0
         WHERE e3 IS NOT NULL),
       c AS (SELECT path, CAST(count(*) AS BIGINT) AS n_occurrences
         FROM tri GROUP BY 1),
       r AS (SELECT path, n_occurrences,
           row_number() OVER (ORDER BY n_occurrences DESC, path) AS rank FROM c)
       SELECT CAST(rank AS BIGINT) AS rank, path, n_occurrences
       FROM r WHERE rank <= 10"""

  // --- x142: STREAMING drift monitor --------------------------------------
  // x77's JS divergence as the per-ingest-day production monitor: each
  // micro-batch (file-per-batch replay, day-keyed) compares its
  // distribution of the JSON `props.k` metric against the full reference
  // per event_type, and the result lands in a day-partitioned
  // ManifestStore merge — replay-idempotent (one day is deliberately
  // re-delivered after the drain). The metric goes through JSON
  // extraction to an exact integer in BOTH engines (double casts would
  // hit the round-vs-truncate divergence).
  def x142StreamDrift(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import graft.sources.ManifestStore
    val e = t(spark, dir, "events")
    val ev = Dedup.materialize(e.select(col("event_id"), col("event_type"),
      get_json_object(col("props"), "$.k").cast("long").as("k"),
      concat(lit("d"), pmod(col("event_id"), lit(3)).cast("string")).as("day")))
    val base = FreshTables.next(spark, dir, "sdrift_in")
    (0 until 3).foreach { b =>
      ev.filter(col("day") === s"d$b").repartition(1)
        .write.mode("append").parquet(s"$base/in")
    }
    val resT = FreshTables.next(spark, dir, "sdrift_res")
    def fold(batch: DataFrame): Unit = {
      val d = batch.agg(min(col("day"))).head().getString(0)
      if (d != null) {
        val js = graft.ext.Drift.jsDivergence(ev, batch, "event_type", "k",
          bins = 16).withColumn("day", lit(d))
        ManifestStore.mergeOrCreate(spark, resT, js,
          Seq("day", "event_type"), "day")
      }
    }
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) => fold(batch) }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      if (!q.awaitTermination(300000))
        throw new RuntimeException("x142: drain timeout")
    } finally q.stop()
    // at-least-once: re-deliver day d1 — the keyed merge must replace
    fold(ev.filter(col("day") === "d1"))
    ManifestStore.read(spark, resT)
      .select(col("day"), col("event_type"), col("n_a"), col("n_b"), col("js"))
  }

  val x142Sql: String =
    """WITH ev AS (SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           'd' || CAST(event_id % 3 AS VARCHAR) AS day FROM events),
       days AS (SELECT DISTINCT day FROM ev),
       u AS (SELECT d.day, e.event_type AS g, e.k AS v, 0 AS side
             FROM ev e CROSS JOIN days d
         UNION ALL
         SELECT e.day, e.event_type, e.k, 1 FROM ev e),
       bd AS (SELECT CAST(min(k) AS BIGINT) AS mn, CAST(max(k) AS BIGINT) AS mx
         FROM ev WHERE k IS NOT NULL),
       bn AS (SELECT day, g, side, ((v - mn) * 16) // (mx - mn + 1) AS bin
         FROM u CROSS JOIN bd WHERE v IS NOT NULL),
       h AS (SELECT day, g, bin,
           CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
           CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
         FROM bn GROUP BY 1, 2, 3),
       tt AS (SELECT day, g, CAST(sum(ca) AS BIGINT) AS na,
           CAST(sum(cb) AS BIGINT) AS nb FROM h GROUP BY 1, 2
         HAVING sum(ca) > 0 AND sum(cb) > 0),
       terms AS (SELECT h.day, h.g,
           CASE WHEN ca > 0 THEN CAST(round(
             (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
             * ln((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
                 / ((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) + CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) / 2.0))
             * 1000000000.0) AS BIGINT) ELSE 0 END AS ta,
           CASE WHEN cb > 0 THEN CAST(round(
             (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
             * ln((CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
                 / ((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) + CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) / 2.0))
             * 1000000000.0) AS BIGINT) ELSE 0 END AS tb,
           na, nb
         FROM h JOIN tt ON tt.day = h.day AND tt.g = h.g)
       SELECT day, g AS event_type, max(na) AS n_a, max(nb) AS n_b,
         round((CAST(sum(ta) AS DOUBLE) / 1000000000.0
              + CAST(sum(tb) AS DOUBLE) / 1000000000.0) / 2.0, 6) AS js
       FROM terms GROUP BY 1, 2"""

  // --- x143: maintained HLL store (day-over-day distinct counts) ----------
  // x114's day-keyed-subtotal pattern on the DISTINCT sketch: registers
  // merge by MAX, so the store read across any day slicing is EXACTLY
  // the batch sketch — and because max is idempotent, a replayed day
  // cannot even in principle corrupt the estimate (the in-gate row
  // accounting still proves the partition-pruned merge REPLACED d1's
  // rows rather than duplicating store rows). Oracle = x138's: the
  // maintained store must reproduce the one-shot sketch bit for bit.
  def x143HllStore(spark: SparkSession, dir: String): DataFrame = {
    val u = Dedup.materialize(hllSource(spark, dir)
      .withColumn("day",
        concat(lit("d"), pmod(TextAnalysis.md5Bucket(col("v")), lit(3)))))
    val table = FreshTables.next(spark, dir, "hllstore")
    (0 until 3).foreach { b =>
      Sketches.hllAppendDay(spark, u.filter(col("day") === s"d$b"),
        "grp", "v", s"d$b", table)
    }
    // replay day d1: the day-partitioned merge must REPLACE its rows
    Sketches.hllAppendDay(spark, u.filter(col("day") === "d1"),
      "grp", "v", "d1", table)
    val stored = graft.sources.ManifestStore.read(spark, table).count()
    val expected = u
      .select(col("grp"), col("day"),
        shiftright(org.apache.spark.sql.graftfn.HashExpressions
          .md5Prefix48(col("v")), 40).as("idx"))
      .distinct().count()
    require(stored == expected,
      s"x143: store holds $stored register rows, expected $expected — " +
        "the d1 replay duplicated instead of replacing")
    Sketches.hllEstimate(
      Sketches.hllRegistersFromStore(spark, table, "grp"), "grp")
      .join(u.groupBy(col("grp")).agg(count_distinct(col("v")).as("n_exact")),
        Seq("grp"))
  }

  // the maintained store read IS the batch sketch (max-mergeable
  // registers), so the oracle is x138's
  val x143Sql: String = x138Sql

  // --- x144: ANN recall audit (IVF vs brute force) ------------------------
  // The approximation-quality measurement every deployed ANN index
  // ships with: per-query recall@10 of the IVF bucket-pruned search
  // (x11) against the exact brute-force top-10 (x07). Both pipelines
  // are deterministic, so the recall numbers themselves are exact and
  // fully oracled — the nprobe dial's quality cost, measured rather
  // than assumed. At scale the audit runs on a FIXED query sample, so
  // its cost is the brute-force pass over that sample only.
  /** Per-query recall@k of `approx` against `exact` (both (query_id,
    * `idName`) top-k lists) — the shared rollup of the x144/x145
    * approximation audits, so the recall definition lives once.
    */
  private def recallRollup(
      exact: DataFrame, approx: DataFrame, idName: String): DataFrame =
    exact.join(approx.withColumn("__h", lit(1)),
        Seq("query_id", idName), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("k"), count(col("__h")).as("n_hit"))
      .withColumn("recall",
        round(col("n_hit").cast("double") / col("k").cast("double"), 6))

  def x144AnnRecall(spark: SparkSession, dir: String): DataFrame = {
    val data = t(spark, dir, "embeddings")
    val queries = data.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(data, queries,
      "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
    val cents = data.filter(col("vec_id") % 50 === 0)
    val assigned = Similarity.ivfAssign(data, cents, "vec_id", "embedding")
    val approx = Similarity.ivfTopK(assigned, cents, queries,
      "vec_id", "embedding", k = 10, nprobe = 3)
      .select(col("query_id"), col("neighbor_id"))
    recallRollup(exact, approx, "neighbor_id")
  }

  val x144Sql: String =
    s"""WITH $ivfCtes,
       q AS (SELECT vec_id AS query_id, ve AS qv, nrm AS qn FROM n WHERE vec_id < 8),
       sce AS (SELECT q.query_id, c2.vec_id AS neighbor_id,
           list_sum(list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * c2.ve[i])) / (q.qn * c2.nrm) AS cos
         FROM n c2 JOIN q ON c2.vec_id <> q.query_id),
       rex AS (SELECT query_id, neighbor_id FROM (
           SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
           FROM sce) WHERE rn <= 10),
       pr0 AS (SELECT q.query_id, c.centroid_id,
           list_sum(list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * c.cv[i])) / (q.qn * c.cn) AS sim
         FROM q CROSS JOIN c),
       pr AS (SELECT query_id, centroid_id FROM (
           SELECT query_id, centroid_id,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, centroid_id) AS rn
           FROM pr0) WHERE rn <= 3),
       sca AS (SELECT q.query_id, n.vec_id AS neighbor_id,
           list_sum(list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * n.ve[i])) / (q.qn * n.nrm) AS cos
         FROM n JOIN asg ON n.vec_id = asg.vec_id
         JOIN pr ON asg.centroid_id = pr.centroid_id
         JOIN q ON pr.query_id = q.query_id
         WHERE n.vec_id <> q.query_id),
       ra AS (SELECT query_id, neighbor_id FROM (
           SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
           FROM sca) WHERE rn <= 10),
       j AS (SELECT rex.query_id,
           CASE WHEN ra.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS hit
         FROM rex LEFT JOIN ra ON ra.query_id = rex.query_id
           AND ra.neighbor_id = rex.neighbor_id)
       SELECT query_id, CAST(count(*) AS BIGINT) AS k,
         CAST(sum(hit) AS BIGINT) AS n_hit,
         round(CAST(sum(hit) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS recall
       FROM j GROUP BY 1"""

  // --- x145: PQ rank-distortion audit -------------------------------------
  // x144's sibling for the COMPRESSION side: within the SAME probed
  // candidate set, recall@10 of the ADC (code-approximated) ranking
  // against the exact-distance ranking — isolating quantization error
  // from IVF pruning error (x144 measures that one). Exact distances
  // use the same a·a + b·b − 2·a·b form and 1e-9 grid as the PQ LUT,
  // through the codegen'd dot product.
  def x145PqDistortion(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val data = t(spark, dir, "embeddings")
    val cents = data.filter(col("vec_id") % 50 === 0)
    val assigned = Similarity.ivfAssign(data, cents, "vec_id", "embedding")
      .select(col("vec_id"), col("centroid_id"))
    val queries = data.filter(col("vec_id") < 8)
    val probes = Similarity.probeCentroids(queries, cents,
      "vec_id", "embedding", nprobe = 3)
    val candidates = Dedup.materialize(probes
      .join(assigned, Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id")))
    val cb = Pq.codebook(data, "vec_id", "embedding",
      dim = 64, m = 4, k = 16, stride = 3)
    val codes = Pq.encode(data, cb, "vec_id", "embedding", dim = 64, m = 4)
    val adc = Pq.adcTopKCandidates(queries, candidates, codes, cb,
      "vec_id", "embedding", dim = 64, m = 4, k = 10)
      .select(col("query_id"), col("vec_id"))
    val dot = Similarity.dot _
    val qv = queries.select(col("vec_id").as("query_id"),
      col("embedding").cast("array<double>").as("__q"))
    val dv = data.select(col("vec_id"),
      col("embedding").cast("array<double>").as("__d"))
    val d9 = round((dot(col("__q"), col("__q")) + dot(col("__d"), col("__d")) -
      lit(2.0d) * dot(col("__q"), col("__d"))) * lit(1e9d), 0).cast("long")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d9").asc, col("vec_id").asc)
    val exact = candidates.join(qv, Seq("query_id")).join(dv, Seq("vec_id"))
      .withColumn("d9", d9)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select(col("query_id"), col("vec_id"))
    recallRollup(exact, adc, "vec_id")
  }

  // --- x146: STREAMING HyperLogLog maintenance ----------------------------
  // x111's bounded-state claim for the DISTINCT sketch: hllRegisters IS
  // a native streaming aggregation (groupBy (grp, idx) max(rho)), so
  // streaming state stays ≤ groups × 2^p rows for ANY stream length —
  // the register table after the drain is the batch sketch exactly
  // (max is order- and batching-insensitive), proven by sharing x138's
  // oracle. Drained in genuine multi-batch increments
  // (maxFilesPerTrigger = 1 over a 4-file stage).
  def x146StreamHll(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val u = hllSource(spark, dir)
    val base = FreshTables.next(spark, dir, "shll_in")
    u.repartition(4).write.parquet(s"$base/in")
    val qname = s"x146_shll_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    spark.catalog.dropTempView(qname)
    val regs = Sketches.hllRegisters(
      spark.readStream.schema(u.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$base/in"),
      "grp", "v", p = 8)
    val q = regs.writeStream.format("memory").queryName(qname)
      .outputMode("complete")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      if (!q.awaitTermination(300000))
        throw new RuntimeException("x146: drain timeout")
    } finally q.stop()
    val regTable = spark.table(qname)
    require(regTable.count() <= 13L * 256L,
      "x146: streaming state exceeded the groups x 2^p register bound")
    Sketches.hllEstimate(regTable, "grp")
      .join(u.groupBy(col("grp")).agg(count_distinct(col("v")).as("n_exact")),
        Seq("grp"))
  }

  // the drained register table IS the batch sketch (max-mergeable,
  // batching-insensitive), so the oracle is x138's
  val x146Sql: String = x138Sql

  // --- x147: maintained near-dup cluster store ----------------------------
  // The dedup-store capstone (ext/ClusterStore): persisted (id, label)
  // components that a day's NEW pairs fold into by recomputing only the
  // affected subgraph (new edges + member->old-label edges) — never the
  // historical pair list. The gate splits the corpus's LSH pair set
  // into two "days", builds from day 0, folds day 1 in (require:
  // relabeling actually cascaded — at least one stored id changed
  // label), replays day 1 (require: row accounting proves replace, not
  // duplicate), and the final labels must equal the batch components
  // over ALL pairs — the oracle's recursive CTE.
  def x147ClusterStore(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.ClusterStore
    val docs = t(spark, dir, "documents")
    val pairs = allPairs(spark, dir)
    // label-aware day split: day 0 gets the edges NOT touching their
    // cluster's min member, day 1 the min-touching ones — so every ≥3
    // cluster (a clique in this fixture at all SFs) is seeded on day 0
    // under a LARGER min and day 1's arrival of the true min forces the
    // relabel cascade the store exists to handle
    val full = Dedup.duplicateClusters(pairs)
      .select(col("id").as("id_a"), col("label").as("__l"))
    val pairsL = Dedup.materialize(pairs.join(full, Seq("id_a")))
    val day0 = pairsL.filter(col("id_a") =!= col("__l")).drop("__l")
    val day1 = pairsL.filter(col("id_a") === col("__l")).drop("__l")
    val root = FreshTables.next(spark, dir, "clstore")
    ClusterStore.build(spark, day0, root, partitions = 8)
    val pre = Dedup.materialize(ClusterStore.readLabels(spark, root))
    ClusterStore.appendPairs(spark, day1, root, partitions = 8)
    val mid = Dedup.materialize(ClusterStore.readLabels(spark, root))
    val changed = pre.withColumnRenamed("label", "l0")
      .join(mid, Seq("id")).filter(col("l0") =!= col("label")).count()
    require(changed > 0L,
      "x147: day 1 must exercise relabeling — adjust the pair split")
    // replay day 1: the keyed delete + merge must REPLACE, not duplicate
    ClusterStore.appendPairs(spark, day1, root, partitions = 8)
    val labels = ClusterStore.readLabels(spark, root)
    val nIds = pairs.select(col("id_a").as("id"))
      .unionByName(pairs.select(col("id_b").as("id"))).distinct().count()
    require(labels.count() == nIds,
      s"x147: store holds ${labels.count()} rows for $nIds clustered ids")
    labels.groupBy(col("label")).agg(count(lit(1)).as("n_members"))
  }

  val x147Sql: String =
    s"""WITH RECURSIVE ${jaccardCtes(3)},
       ${componentCtes(0.7)},
       cl AS (SELECT id AS doc_id, min(r) AS label FROM reach GROUP BY id)
       SELECT label, CAST(count(*) AS BIGINT) AS n_members
       FROM cl GROUP BY 1"""

  // --- x148: maintained KMV store (day-over-day distinct sketch) ----------
  // The fourth and last sketch family member gets its maintained gate
  // (CM x114, histogram x123, HLL x143): day-keyed (group, mins) rows,
  // merged at read by union -> distinct -> k smallest. Any of the
  // GLOBAL k smallest hashes is within its own day's k smallest, so
  // the store read is bit-identical to the one-shot sketch — x40's
  // oracle applies unchanged, kth-hash order statistic included.
  def x148KmvStore(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ws = t(spark, dir, "documents")
      .select(col("lang"), col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "w")))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bg = Dedup.materialize(ws.withColumn("__w1", lead(col("w"), 1).over(byDoc))
      .filter(col("__w1").isNotNull)
      .select(col("lang"), concat_ws(" ", col("w"), col("__w1")).as("bg"))
      .withColumn("day",
        concat(lit("d"), pmod(TextAnalysis.md5Bucket(col("bg")), lit(3)))))
    val table = FreshTables.next(spark, dir, "kmvstore")
    (0 until 3).foreach { b =>
      Sketches.kmvAppendDay(spark, bg.filter(col("day") === s"d$b"),
        "lang", "bg", s"d$b", table)
    }
    // replay day d1: the day-partitioned merge must REPLACE its rows
    Sketches.kmvAppendDay(spark, bg.filter(col("day") === "d1"),
      "lang", "bg", "d1", table)
    val stored = graft.sources.ManifestStore.read(spark, table).count()
    val expected = bg.select(col("lang"), col("day")).distinct().count()
    require(stored == expected,
      s"x148: store holds $stored sketch rows, expected $expected — " +
        "the d1 replay duplicated instead of replacing")
    Sketches.kmvDistinctFromStore(spark, table, "lang")
  }

  // the maintained store read IS the batch sketch (k-smallest arrays
  // merge losslessly), so the oracle is x40's
  val x148Sql: String = x40Sql

  // --- x149: k-means-trained PQ codebook ----------------------------------
  // Closes the Pq scaladoc's production promise: the codebook is now
  // TRAINED (2 per-subspace Lloyd steps under fixed-point squared L2,
  // all subspaces in one pass per iteration), not just stride-sampled.
  // The gate measures both codebooks' total quantization distortion on
  // the same corpus and REQUIRES trained ≤ seed per subspace (Lloyd's
  // guarantee, on the grid); the oracle replicates seed, both Lloyd
  // iterations, and both distortion rollups on the identical
  // fixed-point conventions, so every centroid component and every
  // argmin must agree bit-for-bit.
  def x149PqTrainedCodebook(spark: SparkSession, dir: String): DataFrame = {
    val data = t(spark, dir, "embeddings")
    val seed = Pq.codebook(data, "vec_id", "embedding",
      dim = 64, m = 4, k = 16, stride = 3)
    val trained = Pq.codebookKmeans(data, "vec_id", "embedding",
      dim = 64, m = 4, k = 16, stride = 3, iters = 2)
    val ds = Pq.distortion(data, seed, "vec_id", "embedding", dim = 64, m = 4)
      .select(col("sub"), col("d9_total").as("seed_d9"))
    val dt = Pq.distortion(data, trained, "vec_id", "embedding", dim = 64, m = 4)
      .select(col("sub"), col("n_codes"), col("d9_total").as("trained_d9"))
    val out = Dedup.materialize(ds.join(dt, Seq("sub"))
      .select(col("sub"), col("n_codes"), col("seed_d9"), col("trained_d9")))
    val worse = out.filter(col("trained_d9") > col("seed_d9")).count()
    require(worse == 0L,
      s"x149: $worse subspaces regressed vs the seed codebook — " +
        "Lloyd must not raise distortion")
    out
  }

  /** Two unrolled per-subspace Lloyd iterations from the sampled seed
    * `cb` (of [[pqCtes]]) to the trained codebook `t2` — each is argmin
    * assignment then fixed-point per-(sub, code, pos) means, the
    * kmeansCtes conventions under the PQ metric. Shared by the x149
    * (distortion) and x151 (trained store end-to-end) oracles.
    */
  private val pqTrainCtes: String = {
    def iter(i: Int, prev: String): String =
      s"""a$i AS (SELECT vec_id, sub, code, sv FROM (
           SELECT vs.vec_id, vs.sub, cb.code, vs.sv,
             row_number() OVER (PARTITION BY vs.vec_id, vs.sub
               ORDER BY ${pqD2("vs.sv", "cb.cv")}, cb.code) AS rn
           FROM vsub vs JOIN $prev cb ON vs.sub = cb.sub) WHERE rn = 1),
         e$i AS (SELECT sub, code, p.p AS pos, sv[p.p] AS x
           FROM a$i CROSS JOIN (SELECT unnest(range(1, 17)) AS p) p),
         s$i AS (SELECT sub, code, pos,
             CAST(sum(CAST(round(x * 1000000) AS BIGINT)) AS BIGINT) AS s,
             count(*) AS c
           FROM e$i GROUP BY 1, 2, 3),
         t$i AS (SELECT sub, code,
             list(CAST(s AS DOUBLE) / CAST(c AS DOUBLE) / 1000000.0 ORDER BY pos) AS cv
           FROM s$i GROUP BY 1, 2)"""
    s"""${iter(1, "cb")},
       ${iter(2, "t1")}"""
  }

  val x149Sql: String =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
       $pqCtes,
       $pqTrainCtes,
       smin AS (SELECT vec_id, sub, code, d9 FROM (
           SELECT vec_id, sub, code, d9,
             row_number() OVER (PARTITION BY vec_id, sub ORDER BY d9, code) AS rn
           FROM pqdist) WHERE rn = 1),
       sd AS (SELECT sub, CAST(sum(d9) AS BIGINT) AS seed_d9 FROM smin GROUP BY 1),
       tdist AS (SELECT vs.vec_id, vs.sub, cb.code,
           ${pqD2("vs.sv", "cb.cv")} AS d9
         FROM vsub vs JOIN t2 cb ON vs.sub = cb.sub),
       tmin AS (SELECT vec_id, sub, code, d9 FROM (
           SELECT vec_id, sub, code, d9,
             row_number() OVER (PARTITION BY vec_id, sub ORDER BY d9, code) AS rn
           FROM tdist) WHERE rn = 1),
       td AS (SELECT sub, CAST(count(DISTINCT code) AS BIGINT) AS n_codes,
           CAST(sum(d9) AS BIGINT) AS trained_d9
         FROM tmin GROUP BY 1)
       SELECT sd.sub, td.n_codes, sd.seed_d9, td.trained_d9
       FROM sd JOIN td ON sd.sub = td.sub"""

  // --- x150: auto-sized probe — the nprobe law wired into the store -------
  // Closes the r10 integration gap: production probes no longer hand-
  // pick nprobe. The gate builds the VectorStore, MEASURES the sizing
  // law against the stored routing table (writeNprobeLaw → the
  // persisted rank-CDF histogram), resolves nprobe for a DECLARED
  // target recall (autoNprobe — pure histogram read, no corpus work),
  // and probes at the resolved width (probeAuto). The oracle replicates
  // the measurement (brute-force truth → neighbor-centroid ranks →
  // CDF), resolves the SAME nprobe as a scalar subquery, and replays
  // the IVF+PQ probe at that width — so the law's resolution itself is
  // hash-checked, not just the probe it feeds.
  def x150AutoProbe(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.VectorStore
    val data = t(spark, dir, "embeddings")
    val root = FreshTables.next(spark, dir, "autoprobe")
    ProtoStores.cloneTo(spark, vecStoreProto(spark, dir), root)
    val queries = data.filter(col("vec_id") < 8)
    VectorStore.writeNprobeLaw(spark, data, queries, "vec_id", "embedding",
      root, k = 10)
    val np90 = VectorStore.autoNprobe(spark, root, k = 10, targetRecall = 0.9)
    val np50 = VectorStore.autoNprobe(spark, root, k = 10, targetRecall = 0.5)
    require(np90 >= np50 && np50 >= 1,
      s"x150: stored law not monotone: np90=$np90 np50=$np50")
    VectorStore.probeAuto(spark, queries, "vec_id", "embedding", root,
      dim = 64, m = 4, k = 16, stride = 3, targetRecall = 0.9, topK = 10)
  }

  val x150Sql: String =
    s"""WITH $ivfCtes,
       $pqCtes,
       q AS (SELECT vec_id AS query_id, ve AS qv, nrm AS qn FROM n WHERE vec_id < 8),
       sce AS (SELECT q.query_id, c2.vec_id AS neighbor_id,
           list_sum(list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * c2.ve[i])) / (q.qn * c2.nrm) AS cos
         FROM n c2 JOIN q ON c2.vec_id <> q.query_id),
       rex AS (SELECT query_id, neighbor_id FROM (
           SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
           FROM sce) WHERE rn <= 10),
       pr0 AS (SELECT q.query_id, c.centroid_id,
           list_sum(list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * c.cv[i])) / (q.qn * c.cn) AS sim
         FROM q CROSS JOIN c),
       prr AS (SELECT query_id, centroid_id,
           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, centroid_id) AS c_rank
         FROM pr0),
       ranks AS (SELECT prr.c_rank
         FROM rex JOIN asg ON rex.neighbor_id = asg.vec_id
         JOIN prr ON prr.query_id = rex.query_id
           AND prr.centroid_id = asg.centroid_id),
       np AS (SELECT min(c_rank) AS v FROM (
           SELECT c_rank,
             CAST(count(*) OVER (ORDER BY c_rank) AS DOUBLE)
               / CAST((SELECT count(*) FROM ranks) AS DOUBLE) AS cdf
           FROM ranks) WHERE cdf >= 0.9),
       pr AS (SELECT query_id, centroid_id FROM prr
         WHERE c_rank <= (SELECT v FROM np)),
       cand AS (SELECT pr.query_id, asg.vec_id
         FROM pr JOIN asg USING (centroid_id)
         WHERE asg.vec_id <> pr.query_id),
       scored AS (SELECT ca.query_id, ca.vec_id, CAST(sum(l.pd9) AS BIGINT) AS est_d9
         FROM cand ca JOIN codes cd ON ca.vec_id = cd.vec_id
         JOIN lut l ON l.query_id = ca.query_id
           AND l.sub = cd.sub AND l.code = cd.code
         GROUP BY 1, 2),
       r AS (SELECT query_id, vec_id, est_d9,
           row_number() OVER (PARTITION BY query_id ORDER BY est_d9, vec_id) AS rank
         FROM scored)
       SELECT query_id, rank, vec_id, est_d9 FROM r WHERE rank <= 10"""

  // --- x151: the production store config, end to end -----------------------
  // x129's store with BOTH production dials engaged at once: the
  // codebook is k-means-TRAINED at build (x149's machinery, frozen in
  // the store and geometry-guarded by the sidecar's iters field) and
  // the probe width comes from the PERSISTED sizing law at a declared
  // target recall (x150's machinery) — no sampled codebook, no
  // hand-picked nprobe anywhere on the path. The oracle composes the
  // trained-codebook Lloyd CTEs with the law resolution and replays
  // the ADC probe against trained codes + trained LUT.
  def x151TrainedStore(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.VectorStore
    val data = t(spark, dir, "embeddings")
    val cents = data.filter(col("vec_id") % 50 === 0)
    val root = FreshTables.next(spark, dir, "trainstore")
    VectorStore.build(spark, data, cents, "vec_id", "embedding", root,
      dim = 64, m = 4, k = 16, stride = 3, trainIters = 2)
    val queries = data.filter(col("vec_id") < 8)
    VectorStore.writeNprobeLaw(spark, data, queries, "vec_id", "embedding",
      root, k = 10)
    VectorStore.probeAuto(spark, queries, "vec_id", "embedding", root,
      dim = 64, m = 4, k = 16, stride = 3, targetRecall = 0.9, topK = 10,
      trainIters = 2)
  }

  val x151Sql: String =
    s"""WITH $ivfCtes,
       $pqCtes,
       $pqTrainCtes,
       tcodes AS (SELECT vec_id, sub, code FROM (
           SELECT vs.vec_id, vs.sub, cb.code,
             row_number() OVER (PARTITION BY vs.vec_id, vs.sub
               ORDER BY ${pqD2("vs.sv", "cb.cv")}, cb.code) AS rn
           FROM vsub vs JOIN t2 cb ON vs.sub = cb.sub) WHERE rn = 1),
       tlut AS (SELECT q.vec_id AS query_id, cb.sub, cb.code,
           ${pqD2("q.sv", "cb.cv")} AS pd9
         FROM vsub q JOIN t2 cb ON q.sub = cb.sub WHERE q.vec_id < 8),
       q AS (SELECT vec_id AS query_id, ve AS qv, nrm AS qn FROM n WHERE vec_id < 8),
       sce AS (SELECT q.query_id, c2.vec_id AS neighbor_id,
           list_sum(list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * c2.ve[i])) / (q.qn * c2.nrm) AS cos
         FROM n c2 JOIN q ON c2.vec_id <> q.query_id),
       rex AS (SELECT query_id, neighbor_id FROM (
           SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
           FROM sce) WHERE rn <= 10),
       pr0 AS (SELECT q.query_id, c.centroid_id,
           list_sum(list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * c.cv[i])) / (q.qn * c.cn) AS sim
         FROM q CROSS JOIN c),
       prr AS (SELECT query_id, centroid_id,
           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, centroid_id) AS c_rank
         FROM pr0),
       ranks AS (SELECT prr.c_rank
         FROM rex JOIN asg ON rex.neighbor_id = asg.vec_id
         JOIN prr ON prr.query_id = rex.query_id
           AND prr.centroid_id = asg.centroid_id),
       np AS (SELECT min(c_rank) AS v FROM (
           SELECT c_rank,
             CAST(count(*) OVER (ORDER BY c_rank) AS DOUBLE)
               / CAST((SELECT count(*) FROM ranks) AS DOUBLE) AS cdf
           FROM ranks) WHERE cdf >= 0.9),
       pr AS (SELECT query_id, centroid_id FROM prr
         WHERE c_rank <= (SELECT v FROM np)),
       cand AS (SELECT pr.query_id, asg.vec_id
         FROM pr JOIN asg USING (centroid_id)
         WHERE asg.vec_id <> pr.query_id),
       scored AS (SELECT ca.query_id, ca.vec_id, CAST(sum(l.pd9) AS BIGINT) AS est_d9
         FROM cand ca JOIN tcodes cd ON ca.vec_id = cd.vec_id
         JOIN tlut l ON l.query_id = ca.query_id
           AND l.sub = cd.sub AND l.code = cd.code
         GROUP BY 1, 2),
       r AS (SELECT query_id, vec_id, est_d9,
           row_number() OVER (PARTITION BY query_id ORDER BY est_d9, vec_id) AS rank
         FROM scored)
       SELECT query_id, rank, vec_id, est_d9 FROM r WHERE rank <= 10"""

  // --- x152: KS drift matrix (exact, all source pairs) ---------------------
  // The exact-CDF complement of x77's binned JS divergence: two-sample
  // Kolmogorov–Smirnov D over every source pair's doc-length
  // distribution — no bin dial, sensitive where a fixed grid blurs.
  // After one (source, length) count pass the whole computation lives
  // on the O(sources × distinct lengths) grid, row-count-independent.
  def x152KsMatrix(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Drift.ksMatrix(t(spark, dir, "documents"), "source", "n_chars")

  val x152Sql: String =
    """WITH c AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v, count(*) AS c
         FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL
         GROUP BY 1, 2),
       t AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
       vg AS (SELECT DISTINCT v FROM c),
       grid AS (SELECT t.g, vg.v FROM t CROSS JOIN vg),
       cum0 AS (SELECT grid.g, grid.v,
           CAST(sum(coalesce(c.c, 0)) OVER (PARTITION BY grid.g ORDER BY grid.v) AS BIGINT) AS cum
         FROM grid LEFT JOIN c ON c.g = grid.g AND c.v = grid.v),
       cn AS (SELECT cum0.g, cum0.v, cum0.cum, t.n
         FROM cum0 JOIN t ON t.g = cum0.g),
       d AS (SELECT a.g AS group_a, b.g AS group_b, a.n AS n_a, b.n AS n_b,
           abs(CAST(a.cum AS DOUBLE) / CAST(a.n AS DOUBLE)
             - CAST(b.cum AS DOUBLE) / CAST(b.n AS DOUBLE)) AS d
         FROM cn a JOIN cn b ON a.v = b.v AND a.g < b.g)
       SELECT group_a, group_b, n_a, n_b, round(max(d), 6) AS ks_d
       FROM d GROUP BY 1, 2, 3, 4"""

  // --- x153: dimension-truncation retrieval audit (MRL-style) --------------
  // The measurement behind Matryoshka-style dimension cuts (Kusupati
  // et al. 2022, public recipe): per-query overlap@10 of brute-force
  // retrieval on the FIRST-16-dim prefix against full-64-dim retrieval
  // — the exact recall price of a 4× embedding storage cut, measured
  // before anyone deploys the cut. Both pipelines are deterministic
  // brute force (the x07 shape), so the audit is fully oracled; cosine
  // renormalizes per slice by construction.
  def x153TruncationAudit(spark: SparkSession, dir: String): DataFrame = {
    val data = t(spark, dir, "embeddings")
    def prefix(d: DataFrame) = d.select(col("vec_id"),
      slice(col("embedding"), 1, 16).as("embedding"))
    val queries = data.filter(col("vec_id") < 8)
    val full = Similarity.bruteForceTopK(data, queries,
      "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
    val cut = Similarity.bruteForceTopK(prefix(data), prefix(queries),
      "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
    recallRollup(full, cut, "neighbor_id")
  }

  val x153Sql: String =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
       n AS (SELECT vec_id, ve, sqrt(list_sum(list_transform(ve, x -> x * x))) AS nrm FROM v),
       q AS (SELECT vec_id AS query_id, ve AS qv, nrm AS qn FROM n WHERE vec_id < 8),
       sce AS (SELECT q.query_id, c.vec_id AS neighbor_id,
           list_sum(list_transform(range(1, 65), i -> q.qv[i] * c.ve[i])) / (q.qn * c.nrm) AS cos
         FROM n c JOIN q ON c.vec_id <> q.query_id),
       rex AS (SELECT query_id, neighbor_id FROM (
           SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
           FROM sce) WHERE rn <= 10),
       p AS (SELECT vec_id, ve[1:16] AS pv,
           sqrt(list_sum(list_transform(ve[1:16], x -> x * x))) AS pn FROM v),
       pq AS (SELECT vec_id AS query_id, pv AS qv, pn AS qn FROM p WHERE vec_id < 8),
       scp AS (SELECT pq.query_id, c.vec_id AS neighbor_id,
           list_sum(list_transform(range(1, 17), i -> pq.qv[i] * c.pv[i])) / (pq.qn * c.pn) AS cos
         FROM p c JOIN pq ON c.vec_id <> pq.query_id),
       rcut AS (SELECT query_id, neighbor_id FROM (
           SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
           FROM scp) WHERE rn <= 10),
       j AS (SELECT rex.query_id,
           CASE WHEN rcut.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS hit
         FROM rex LEFT JOIN rcut ON rcut.query_id = rex.query_id
           AND rcut.neighbor_id = rex.neighbor_id)
       SELECT query_id, CAST(count(*) AS BIGINT) AS k,
         CAST(sum(hit) AS BIGINT) AS n_hit,
         round(CAST(sum(hit) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS recall
       FROM j GROUP BY 1"""

  val x145Sql: String = {
    val fullD9 =
      """CAST(round((list_sum(list_transform(range(1, 65), i -> q.ve[i] * q.ve[i]))
       + list_sum(list_transform(range(1, 65), i -> c2.ve[i] * c2.ve[i]))
       - 2 * list_sum(list_transform(range(1, 65), i -> q.ve[i] * c2.ve[i]))) * 1e9)
       AS BIGINT)"""
    s"""WITH $ivfCtes,
       $pqCtes,
       pr0 AS (SELECT q.vec_id AS query_id, c.centroid_id,
           list_sum(list_transform(range(1, len(q.ve) + 1), i -> q.ve[i] * c.cv[i])) / (q.nrm * c.cn) AS sim
         FROM n q CROSS JOIN c WHERE q.vec_id < 8),
       pr AS (SELECT query_id, centroid_id FROM (
           SELECT query_id, centroid_id,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, centroid_id) AS rn
           FROM pr0) WHERE rn <= 3),
       cand AS (SELECT pr.query_id, asg.vec_id
         FROM pr JOIN asg USING (centroid_id)
         WHERE asg.vec_id <> pr.query_id),
       scored AS (SELECT ca.query_id, ca.vec_id, CAST(sum(l.pd9) AS BIGINT) AS est_d9
         FROM cand ca JOIN codes cd ON ca.vec_id = cd.vec_id
         JOIN lut l ON l.query_id = ca.query_id
           AND l.sub = cd.sub AND l.code = cd.code
         GROUP BY 1, 2),
       ra AS (SELECT query_id, vec_id FROM (
           SELECT query_id, vec_id,
             row_number() OVER (PARTITION BY query_id ORDER BY est_d9, vec_id) AS rn
           FROM scored) WHERE rn <= 10),
       ex0 AS (SELECT ca.query_id, ca.vec_id, $fullD9 AS d9
         FROM cand ca JOIN v q ON q.vec_id = ca.query_id
         JOIN v c2 ON c2.vec_id = ca.vec_id),
       rex AS (SELECT query_id, vec_id FROM (
           SELECT query_id, vec_id,
             row_number() OVER (PARTITION BY query_id ORDER BY d9, vec_id) AS rn
           FROM ex0) WHERE rn <= 10),
       j AS (SELECT rex.query_id,
           CASE WHEN ra.vec_id IS NOT NULL THEN 1 ELSE 0 END AS hit
         FROM rex LEFT JOIN ra ON ra.query_id = rex.query_id
           AND ra.vec_id = rex.vec_id)
       SELECT query_id, CAST(count(*) AS BIGINT) AS k,
         CAST(sum(hit) AS BIGINT) AS n_hit,
         round(CAST(sum(hit) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS recall
       FROM j GROUP BY 1"""
  }

  // --- x154: STREAMING KS drift monitor ------------------------------------
  // Completes the drift-family matrix (batch JS x77 / stream JS x142 /
  // batch KS x152 / stream KS here): x142's file-per-batch replay
  // harness with the exact-CDF statistic — each day-batch's props.k
  // distribution scored per event_type against the full reference by
  // two-sample Kolmogorov–Smirnov D, landing in a day-partitioned
  // replay-idempotent ManifestStore merge (day d1 deliberately
  // re-delivered after the drain). Per batch the work lives on the
  // O(types × distinct k × 2) grid after one count pass.
  def x154StreamKs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import graft.sources.ManifestStore
    val e = t(spark, dir, "events")
    val ev = Dedup.materialize(e.select(col("event_id"), col("event_type"),
      get_json_object(col("props"), "$.k").cast("long").as("k"),
      concat(lit("d"), pmod(col("event_id"), lit(3)).cast("string")).as("day")))
    val base = FreshTables.next(spark, dir, "sks_in")
    (0 until 3).foreach { b =>
      ev.filter(col("day") === s"d$b").repartition(1)
        .write.mode("append").parquet(s"$base/in")
    }
    val resT = FreshTables.next(spark, dir, "sks_res")
    def fold(batch: DataFrame): Unit = {
      val d = batch.agg(min(col("day"))).head().getString(0)
      if (d != null) {
        val ks = graft.ext.Drift.ksTwoSample(ev, batch, "event_type", "k")
          .withColumn("day", lit(d))
        ManifestStore.mergeOrCreate(spark, resT, ks,
          Seq("day", "event_type"), "day")
      }
    }
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) => fold(batch) }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      if (!q.awaitTermination(300000))
        throw new RuntimeException("x154: drain timeout")
    } finally q.stop()
    // at-least-once: re-deliver day d1 — the keyed merge must replace
    fold(ev.filter(col("day") === "d1"))
    ManifestStore.read(spark, resT)
      .select(col("day"), col("event_type"), col("n_a"), col("n_b"), col("ks_d"))
  }

  // per (day, event_type): D between the day's k distribution and the
  // full reference. The batch is a subset of the reference, so the
  // pooled value set per group IS the reference's — the grid mirrors
  // ksTwoSample's dense per-group pooling exactly.
  val x154Sql: String =
    """WITH ev AS (SELECT event_type AS g,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS v,
           'd' || CAST(event_id % 3 AS VARCHAR) AS day FROM events),
       e AS (SELECT * FROM ev WHERE v IS NOT NULL AND g IS NOT NULL),
       days AS (SELECT DISTINCT day FROM e),
       ca AS (SELECT g, v, count(*) AS c FROM e GROUP BY 1, 2),
       cb AS (SELECT day, g, v, count(*) AS c FROM e GROUP BY 1, 2, 3),
       ta AS (SELECT g, CAST(sum(c) AS BIGINT) AS n_a FROM ca GROUP BY 1),
       tb AS (SELECT day, g, CAST(sum(c) AS BIGINT) AS n_b FROM cb GROUP BY 1, 2),
       grid AS (SELECT d.day, p.g, p.v
         FROM days d CROSS JOIN (SELECT DISTINCT g, v FROM e) p),
       cuma AS (SELECT g, v,
           CAST(sum(c) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cav
         FROM ca),
       cumb AS (SELECT grid.day, grid.g, grid.v,
           CAST(sum(coalesce(cb.c, 0)) OVER (
             PARTITION BY grid.day, grid.g ORDER BY grid.v) AS BIGINT) AS cbv
         FROM grid LEFT JOIN cb ON cb.day = grid.day
           AND cb.g = grid.g AND cb.v = grid.v),
       d AS (SELECT cumb.day, cumb.g, ta.n_a, tb.n_b,
           abs(CAST(cuma.cav AS DOUBLE) / CAST(ta.n_a AS DOUBLE)
             - CAST(cumb.cbv AS DOUBLE) / CAST(tb.n_b AS DOUBLE)) AS d
         FROM cumb JOIN cuma ON cuma.g = cumb.g AND cuma.v = cumb.v
         JOIN ta ON ta.g = cumb.g
         JOIN tb ON tb.day = cumb.day AND tb.g = cumb.g)
       SELECT day, g AS event_type, n_a, n_b, round(max(d), 6) AS ks_d
       FROM d GROUP BY 1, 2, 3, 4"""

  // --- x155: STREAMING cluster-store maintenance --------------------------
  // The last maintained store joins the streaming matrix (vector x137,
  // CM x111/x114, HLL x146, KMV x148, drift x142/x154): the corpus's
  // LSH pair set arrives as micro-batched "days" (file-per-batch
  // replay), each folded into ext/ClusterStore by appendPairs inside
  // foreachBatch — incremental min-member relabeling, O(affected +
  // batch pairs) per batch, the replay fence's started/completed
  // fingerprints recorded along the way. foreachBatch runs batches
  // sequentially, which is exactly the ordering the fence's one-step
  // prev_label breadcrumb needs. After the drain one batch is
  // re-appended (at-least-once): no open window, so the fence lets the
  // stale replay through, and keyed merges make it converge without
  // duplicates. Final labels == batch components over ALL pairs —
  // x147's recursive-CTE oracle, reached through the streaming door.
  def x155StreamCluster(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.ClusterStore
    import org.apache.spark.sql.streaming.Trigger
    val docs = t(spark, dir, "documents")
    val pairs = Dedup.materialize(allPairs(spark, dir)
      .withColumn("day", pmod(xxhash64(col("id_a").cast("string")), lit(3L))))
    val root = FreshTables.next(spark, dir, "sclstore")
    // geometry + empty tables up front; every pair arrives via a batch
    ClusterStore.build(spark, pairs.limit(0).drop("day"), root, partitions = 8)
    val base = FreshTables.next(spark, dir, "sclin")
    (0 until 3).foreach { b =>
      pairs.filter(col("day") === b.toLong).repartition(1)
        .write.mode("append").parquet(s"$base/in")
    }
    val stream = spark.readStream.schema(pairs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ClusterStore.appendPairs(spark, batch.drop("day"), root, partitions = 8)
        ()
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      if (!q.awaitTermination(300000))
        throw new RuntimeException("x155: drain timeout")
    } finally q.stop()
    // at-least-once: re-deliver one already-folded batch — keyed
    // merges must replace, never duplicate
    ClusterStore.appendPairs(spark,
      pairs.filter(col("day") === 1L).drop("day"), root, partitions = 8)
    val labels = ClusterStore.readLabels(spark, root)
    val nIds = pairs.select(col("id_a").as("id"))
      .unionByName(pairs.select(col("id_b").as("id"))).distinct().count()
    require(labels.count() == nIds,
      s"x155: store holds ${labels.count()} rows for $nIds clustered ids")
    labels.groupBy(col("label")).agg(count(lit(1)).as("n_members"))
  }

  // final store state == batch components over the union of all
  // streamed pair batches — x147's oracle verbatim
  val x155Sql: String = x147Sql

  // --- x156: maintained BM25 inverted-index store --------------------------
  // The lexical retrieval index becomes a MAINTAINED store
  // (ext/IndexStore), completing the maintained-store matrix on the
  // retrieval side (vector x129, dedup x65, cluster x147, sketches
  // x114/x123/x143/x148): the corpus ingests as three hash-split
  // "days" (postings keyed (term, doc) in term-hash buckets, lengths
  // in id-hash buckets, per-day corpus-stat subtotals), day d1 is
  // re-delivered (at-least-once — keyed merges must replace, row
  // accounting require'd), and the closing probe reads ONLY the query
  // vocabulary's buckets + matched ids' buckets yet must score
  // bit-identically to the one-shot Retrieval.bm25TopK pass — x69's
  // fixed queries, k, and oracle verbatim.
  /** The x156 3-day BM25 index as a build-once prototype (d1 replay +
    * accounting REQUIREs ride the build) — shared by x156 (reads it),
    * x172 and x216 (clone it, then forget/repair).
    */
  private def bm25Proto(spark: SparkSession, dir: String): String =
    ProtoStores.proto(dir, "bm25idx") { root =>
      import graft.ext.IndexStore
      val docs = t(spark, dir, "documents")
      val dayKey = pmod(xxhash64(col("doc_id").cast("string")), lit(3L))
      (0 until 3).foreach { b =>
        IndexStore.appendDay(spark, docs.filter(dayKey === b.toLong),
          "doc_id", "text", s"d$b", root, partitions = 8)
      }
      // at-least-once: re-deliver day d1 — every table must replace
      IndexStore.appendDay(spark, docs.filter(dayKey === 1L),
        "doc_id", "text", "d1", root, partitions = 8)
      val storedLens = graft.sources.ManifestStore.read(spark, s"$root/lens").count()
      require(storedLens == docs.count(),
        s"x156: lens holds $storedLens rows for ${docs.count()} docs — " +
          "the d1 replay duplicated instead of replacing")
      val statRows = graft.sources.ManifestStore.read(spark, s"$root/stats").count()
      require(statRows == 3L,
        s"x156: stats holds $statRows day subtotals, expected 3")
    }

  def x156IndexStore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.ext.IndexStore
    val qs = Seq(
      ("q_hash_join", Seq("hash", "join")),
      ("q_stream", Seq("stream", "window", "batch")),
      ("q_vector", Seq("vector", "data"))).toDF("query_id", "terms")
    IndexStore.bm25Probe(spark, bm25Proto(spark, dir), qs, "doc_id",
      topK = 15, partitions = 8)
  }

  // the maintained index scores the same corpus the batch pass scans,
  // so x69's oracle applies verbatim
  val x156Sql: String = x69Sql

  // --- x157: right-to-be-forgotten over the ANN index ----------------------
  // The privacy family (x52 lakehouse delete, x94 k-anonymity, x104 DP)
  // reaches the vector side: VectorStore.forget removes a subject's
  // code + assignment rows via the id-bucketed assign twin — O(doomed
  // buckets + their centroid partitions) I/O, never a codes scan. The
  // gate builds the full-corpus store, forgets vec_id % 7 == 2
  // (accounting: zero surviving code/assign rows), re-runs the same
  // forget (the crash-recovery path must converge), and probes: the
  // result is the one-shot IVF+PQ pass with the forgotten ids excluded
  // from the candidate set — the frozen model is unchanged (deletion
  // does not unlearn the codebook; rebuild is the documented cure), so
  // x128's oracle with one exclusion predicate is exact.
  def x157VectorForget(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.VectorStore
    val data = t(spark, dir, "embeddings")
    val root = FreshTables.next(spark, dir, "vforget")
    ProtoStores.cloneTo(spark, vecStoreProto(spark, dir), root)
    val doomed = data.filter(col("vec_id") % 7 === 2).select(col("vec_id"))
    VectorStore.forget(spark, doomed, "vec_id", root)
    val ms = graft.sources.ManifestStore
    val leftCodes = ms.read(spark, s"$root/codes")
      .join(doomed, Seq("vec_id"), "left_semi").count()
    val leftAsg = ms.read(spark, s"$root/assign")
      .join(doomed, Seq("vec_id"), "left_semi").count()
    require(leftCodes == 0L && leftAsg == 0L,
      s"x157: $leftCodes code / $leftAsg assign rows survived the forget")
    // idempotent re-run — the recovery path after a crash between the
    // codes delete and the twin delete
    VectorStore.forget(spark, doomed, "vec_id", root)
    VectorStore.probe(spark, data.filter(col("vec_id") < 8),
      "vec_id", "embedding", root,
      dim = 64, m = 4, k = 16, stride = 3, nprobe = 3, topK = 10)
  }

  // x128's pipeline with the forgotten ids excluded from the candidate
  // set (the model CTEs are untouched — frozen model contract)
  val x157Sql: String = {
    val anchor = "WHERE asg.vec_id <> pr.query_id"
    require(x128Sql.contains(anchor), "x157: x128Sql anchor moved")
    x128Sql.replace(anchor, anchor + " AND asg.vec_id % 7 <> 2")
  }

  // --- x158: c-TF-IDF cluster labeling -------------------------------------
  // The human-readable names the x67 semantic clusters get in a data
  // card (Grootendorst 2022's class-based TF-IDF, the public BERTopic
  // labeling recipe): k-means assignments (vec_id ≡ doc_id per the x81
  // referential audit) join the documents' tokens, and each cluster's
  // top-5 most DISTINCTIVE terms rank by tf(t,c) · ln(1 + A/f(t)) in
  // fixed-point. The oracle unrolls the identical Lloyd iterations
  // (x67's CTEs) plus the scoring rollups, so every assignment and
  // every score must agree bit-for-bit.
  def x158ClusterLabels(spark: SparkSession, dir: String): DataFrame = {
    val assign = graft.ext.Clustering.kmeansAssign(
      t(spark, dir, "embeddings"), "vec_id", "embedding",
      stride = 50L, iters = 2)
      .withColumnRenamed("vec_id", "doc_id")
    TextAnalysis.classTopTerms(t(spark, dir, "documents"), assign,
      "doc_id", "text", "cid", topK = 5)
  }

  val x158Sql: String =
    s"""WITH $kmeansCtes,
       toks AS (SELECT doc_id,
           unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS w
         FROM documents),
       ct AS (SELECT af.cid, t.w FROM toks t JOIN af ON af.id = t.doc_id),
       tfc AS (SELECT cid, w, CAST(count(*) AS BIGINT) AS tf FROM ct GROUP BY 1, 2),
       ft AS (SELECT w, CAST(sum(tf) AS BIGINT) AS ft FROM tfc GROUP BY 1),
       aw AS (SELECT CAST(sum(cw) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgw
         FROM (SELECT cid, CAST(sum(tf) AS BIGINT) AS cw FROM tfc GROUP BY 1)),
       sc AS (SELECT cid, w,
           CAST(round(CAST(tf AS DOUBLE) * ln(1.0 + avgw / CAST(ft AS DOUBLE))
             * 1000000000.0) AS BIGINT) AS s9
         FROM tfc JOIN ft USING (w) CROSS JOIN aw),
       r AS (SELECT cid, w, s9,
           row_number() OVER (PARTITION BY cid ORDER BY s9 DESC, w) AS rank
         FROM sc)
       SELECT cid, rank, w AS term,
         round(CAST(s9 AS DOUBLE) / 1000000000.0, 6) AS ctfidf
       FROM r WHERE rank <= 5"""

  // --- x159: STREAMING BM25 index maintenance ------------------------------
  // x156's maintained inverted index fed by a STREAM: document "days"
  // arrive as micro-batches (file-per-batch replay), each folded in by
  // IndexStore.appendDay inside foreachBatch — three keyed merges per
  // batch, all replay-idempotent, so the final index is micro-batch-
  // invariant AND at-least-once-safe (one batch re-appended after the
  // drain, row accounting require'd). The closing pruned probe must
  // score bit-identically to the one-shot batch BM25 — x69's oracle,
  // reached through the streaming door (the x137/x155 pattern).
  def x159StreamIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.ext.IndexStore
    import org.apache.spark.sql.streaming.Trigger
    val docs = Dedup.materialize(t(spark, dir, "documents")
      .withColumn("day", pmod(xxhash64(col("doc_id").cast("string")), lit(3L))))
    val root = FreshTables.next(spark, dir, "sidxstore")
    val base = FreshTables.next(spark, dir, "sidxin")
    (0 until 3).foreach { b =>
      docs.filter(col("day") === b.toLong).repartition(1)
        .write.mode("append").parquet(s"$base/in")
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val d = batch.agg(min(col("day"))).head().getLong(0)
        IndexStore.appendDay(spark, batch.drop("day"),
          "doc_id", "text", s"d$d", root, partitions = 8)
        ()
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      if (!q.awaitTermination(300000))
        throw new RuntimeException("x159: drain timeout")
    } finally q.stop()
    // at-least-once: re-deliver day 1 — all three tables must replace
    IndexStore.appendDay(spark, docs.filter(col("day") === 1L).drop("day"),
      "doc_id", "text", "d1", root, partitions = 8)
    val ms = graft.sources.ManifestStore
    require(ms.read(spark, s"$root/lens").count() == docs.count(),
      "x159: the d1 replay duplicated lens rows")
    require(ms.read(spark, s"$root/stats").count() == 3L,
      "x159: the d1 replay duplicated stats rows")
    val qs = Seq(
      ("q_hash_join", Seq("hash", "join")),
      ("q_stream", Seq("stream", "window", "batch")),
      ("q_vector", Seq("vector", "data"))).toDF("query_id", "terms")
    IndexStore.bm25Probe(spark, root, qs, "doc_id", topK = 15, partitions = 8)
  }

  val x159Sql: String = x69Sql

  // --- x160: drift matrix FROM the maintained histogram store --------------
  // The monitor consumes the STORE, not the raw data: four event "days"
  // ingest their props.k histograms via Sketches.histAppendDay
  // (bucketWidth 1 → exact value cells), day d1 is re-delivered
  // (day-keyed merge must replace), and the all-pairs day-drift KS
  // matrix is computed from the store's O(cells) rows by
  // Drift.ksMatrixFromCounts — the count shuffle was paid once at
  // ingest, so day-over-day drift monitoring never rescans events. The
  // oracle recomputes the per-day counts and the exact-CDF pair matrix
  // from the raw table.
  def x160StoreDrift(spark: SparkSession, dir: String): DataFrame = {
    val ev = Dedup.materialize(t(spark, dir, "events")
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"),
        concat(lit("d"), pmod(col("event_id"), lit(4)).cast("string")).as("day")))
    val table = FreshTables.next(spark, dir, "histdrift")
    (0 until 4).foreach { b =>
      Sketches.histAppendDay(spark, ev.filter(col("day") === s"d$b"),
        "k", bucketWidth = 1L, s"d$b", table)
    }
    // replay day d1: the (bucket, day)-keyed merge must replace
    Sketches.histAppendDay(spark, ev.filter(col("day") === "d1"),
      "k", bucketWidth = 1L, "d1", table)
    val cells = graft.sources.ManifestStore.read(spark, table)
    val expected = ev.filter(col("k").isNotNull)
      .select(col("day"), col("k")).distinct().count()
    require(cells.count() == expected,
      s"x160: store holds ${cells.count()} cells, expected $expected — " +
        "the d1 replay duplicated instead of replacing")
    graft.ext.Drift.ksMatrixFromCounts(cells, "day", "bucket", "cnt")
  }

  val x160Sql: String =
    """WITH ev AS (SELECT 'd' || CAST(event_id % 4 AS VARCHAR) AS g,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS v FROM events),
       c AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM ev
         WHERE v IS NOT NULL GROUP BY 1, 2),
       t AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
       vg AS (SELECT DISTINCT v FROM c),
       grid AS (SELECT t.g, vg.v FROM t CROSS JOIN vg),
       cum0 AS (SELECT grid.g, grid.v,
           CAST(sum(coalesce(c.c, 0)) OVER (PARTITION BY grid.g ORDER BY grid.v) AS BIGINT) AS cum
         FROM grid LEFT JOIN c ON c.g = grid.g AND c.v = grid.v),
       cn AS (SELECT cum0.g, cum0.v, cum0.cum, t.n
         FROM cum0 JOIN t ON t.g = cum0.g),
       d AS (SELECT a.g AS group_a, b.g AS group_b, a.n AS n_a, b.n AS n_b,
           abs(CAST(a.cum AS DOUBLE) / CAST(a.n AS DOUBLE)
             - CAST(b.cum AS DOUBLE) / CAST(b.n AS DOUBLE)) AS d
         FROM cn a JOIN cn b ON a.v = b.v AND a.g < b.g)
       SELECT group_a, group_b, n_a, n_b, round(max(d), 6) AS ks_d
       FROM d GROUP BY 1, 2, 3, 4"""

  // --- x161: STREAMING histogram-store maintenance --------------------------
  // The histogram store (x123) joins the streaming matrix, closing the
  // sketch-store stream column next to CM (x111) and HLL (x146):
  // document days arrive as micro-batches, each day's n_chars cells
  // folded by Sketches.histAppendDay in foreachBatch (day-keyed
  // subtotal merge, replay-idempotent; one batch re-delivered after
  // the drain with cell accounting). The store read merges day
  // subtotals losslessly, so the closing quantile estimates are
  // x123's — its oracle verbatim, through the streaming door.
  def x161StreamHist(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val docs = Dedup.materialize(t(spark, dir, "documents")
      .select(col("n_chars"), pmod(col("doc_id"), lit(3)).cast("long").as("day")))
    val table = FreshTables.next(spark, dir, "shiststore")
    val base = FreshTables.next(spark, dir, "shistin")
    (0 until 3).foreach { b =>
      docs.filter(col("day") === b.toLong).repartition(1)
        .write.mode("append").parquet(s"$base/in")
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val d = batch.agg(min(col("day"))).head().getLong(0)
        Sketches.histAppendDay(spark, batch, "n_chars",
          bucketWidth = 32L, day = s"day$d", table = table)
        ()
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      if (!q.awaitTermination(300000))
        throw new RuntimeException("x161: drain timeout")
    } finally q.stop()
    // at-least-once: re-deliver day 1 — the (bucket, day) merge replaces
    Sketches.histAppendDay(spark, docs.filter(col("day") === 1L), "n_chars",
      bucketWidth = 32L, day = "day1", table = table)
    val cells = graft.sources.ManifestStore.read(spark, table).count()
    val expected = docs.filter(col("n_chars").isNotNull)
      .select(col("day"), expr("n_chars div 32L")).distinct().count()
    require(cells == expected,
      s"x161: store holds $cells cells, expected $expected — " +
        "the day1 replay duplicated instead of replacing")
    Sketches.histQuantiles(
      Sketches.histCellsFromStore(spark, table), bucketWidth = 32L,
      qs = Seq(0.5, 0.9, 0.99))
  }

  // day subtotals merge losslessly, so the stream-fed store read is the
  // batch histogram — x123's oracle verbatim
  val x161Sql: String = x123Sql

  // --- x162: STREAMING KMV-store maintenance --------------------------------
  // The last sketch store joins the streaming matrix (CM x111, HLL
  // x146, histogram x161): x148's per-language bigram sketch fed by a
  // STREAM — each micro-batch's day folded by Sketches.kmvAppendDay in
  // foreachBatch ((group, day)-keyed min-array merge), one batch
  // re-delivered post-drain with row accounting. Any global k-minimum
  // hash is within its own day's k minima, so the store read is
  // bit-identical to the one-shot sketch — x40's oracle, kth-hash
  // order statistic included, through the streaming door.
  def x162StreamKmv(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.streaming.Trigger
    val ws = t(spark, dir, "documents")
      .select(col("lang"), col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "w")))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bg = Dedup.materialize(ws.withColumn("__w1", lead(col("w"), 1).over(byDoc))
      .filter(col("__w1").isNotNull)
      .select(col("lang"), concat_ws(" ", col("w"), col("__w1")).as("bg"))
      .withColumn("day", pmod(TextAnalysis.md5Bucket(col("bg")), lit(3))))
    val table = FreshTables.next(spark, dir, "skmvstore")
    val base = FreshTables.next(spark, dir, "skmvin")
    (0 until 3).foreach { b =>
      bg.filter(col("day") === b).repartition(1)
        .write.mode("append").parquet(s"$base/in")
    }
    val stream = spark.readStream.schema(bg.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val d = batch.agg(min(col("day"))).head().get(0).toString
        Sketches.kmvAppendDay(spark, batch, "lang", "bg", s"d$d", table)
        ()
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      if (!q.awaitTermination(300000))
        throw new RuntimeException("x162: drain timeout")
    } finally q.stop()
    // at-least-once: re-deliver day d1 — the (lang, day) merge replaces
    Sketches.kmvAppendDay(spark, bg.filter(col("day") === 1), "lang", "bg",
      "d1", table)
    val stored = graft.sources.ManifestStore.read(spark, table).count()
    val expected = bg.select(col("lang"), col("day")).distinct().count()
    require(stored == expected,
      s"x162: store holds $stored sketch rows, expected $expected — " +
        "the d1 replay duplicated instead of replacing")
    Sketches.kmvDistinctFromStore(spark, table, "lang")
  }

  val x162Sql: String = x40Sql

  // --- x163: zone-map data skipping ----------------------------------------
  // Min/max zone maps over a NON-partition column (the Delta/Iceberg
  // data-skipping statistic, sources/ZoneMaps): the corpus is laid out
  // clustered by length (pt = n_chars div 64 — what a 1-D Z-order
  // produces), the maps are refreshed against the snapshot, and a
  // BETWEEN query scans ONLY the partitions whose measured [lo, hi]
  // overlaps — require'd via the plan's selected-partition count, with
  // results equal to the plain filter (the oracle; zone maps may only
  // skip provably-empty partitions, never change results).
  def x163ZoneSkip(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.{ManifestStore, ZoneMaps}
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val table = FreshTables.next(spark, dir, "zonemap")
    ManifestStore.write(spark,
      docs.withColumn("pt", expr("n_chars div 64L")), table, "pt")
    ZoneMaps.refresh(spark, table, "n_chars")
    val out = ZoneMaps.readWhere(spark, table, "n_chars",
      lo = 150L, hi = 300L, requireFresh = true)
    val scanned = graft.sources.PartitionedStore.selectedPartitionCount(out)
    val total = docs.select(expr("n_chars div 64L")).distinct().count()
    require(scanned.exists(n => n > 0L && n < total),
      s"x163: scanned $scanned of $total partitions — the zone maps " +
        "skipped nothing (or everything)")
    out.select(col("doc_id"), col("lang"), col("n_chars"))
  }

  // zone maps only decide which partitions are provably empty of
  // matches — the result is the plain range filter
  val x163Sql: String =
    """SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
       FROM documents WHERE n_chars BETWEEN 150 AND 300"""

  // --- x164: Bloom-index equality skipping ----------------------------------
  // Per-partition Bloom filters over a NON-partition column
  // (sources/BloomIndex) — the equality complement to x163: the corpus
  // is partitioned by language (a natural layout where doc_id min/max
  // ranges overlap everywhere and zone maps prune NOTHING), and a point
  // lookup on doc_id scans only the one partition whose bloom might
  // contain it — require'd via the plan's selected-partition count,
  // results equal to the plain filter (no false negatives, so skipping
  // only drops provably-empty partitions).
  def x164BloomSkip(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.{BloomIndex, ManifestStore, PartitionedStore}
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val table = FreshTables.next(spark, dir, "bloomidx")
    ManifestStore.write(spark, docs.withColumn("pt", col("lang")), table, "pt")
    BloomIndex.refresh(spark, table, "doc_id")
    val out = BloomIndex.readEq(spark, table, "doc_id", 42L, requireFresh = true)
    val scanned = PartitionedStore.selectedPartitionCount(out)
    val total = docs.select(col("lang")).distinct().count()
    require(scanned.exists(n => n > 0L && n < total),
      s"x164: scanned $scanned of $total partitions — the blooms " +
        "skipped nothing (or everything)")
    out.select(col("doc_id"), col("lang"), col("n_chars"))
  }

  // blooms only decide which partitions are provably empty of matches —
  // the result is the plain point lookup
  val x164Sql: String =
    """SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
       FROM documents WHERE doc_id = 42"""

  // --- x165: maintained Bloom index (incremental day-over-day) -------------
  // The x164 index kept fresh WITHOUT rescanning history: bloom(A ∪ B)
  // = bloom(A) | bloom(B), so each ingest commit's words bit_or into
  // the stored maps (BloomIndex.mergeAppend, O(index + batch)) and the
  // stamp advances with the snapshot. The gate ingests the corpus in
  // two commits — full refresh after the first, mergeAppend after the
  // second — then point-looks-up one doc from EACH commit with
  // requireFresh = true: both must come back scanning only their
  // language's partition. Replay convergence, version-gap refusal, and
  // bit-identity to a from-scratch refresh are specced
  // (BloomIndexSpec); the oracle is the plain two-point lookup.
  def x165BloomMaintained(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.{BloomIndex, ManifestStore, PartitionedStore}
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("pt", col("lang"))
    val table = FreshTables.next(spark, dir, "bloommnt")
    ManifestStore.write(spark, docs.filter(col("doc_id") % 3 < 2), table, "pt")
    BloomIndex.refresh(spark, table, "doc_id")
    val day2 = docs.filter(col("doc_id") % 3 === 2)
    ManifestStore.merge(spark, table, day2, Seq("doc_id"), "pt")
    BloomIndex.mergeAppend(spark, table, "doc_id", day2)
    val total = docs.select(col("lang")).distinct().count()
    val out = Seq(42L, 44L).map { id => // 42 → commit 1, 44 → commit 2
      val hit = BloomIndex.readEq(spark, table, "doc_id", id, requireFresh = true)
      val scanned = PartitionedStore.selectedPartitionTotal(hit)
      require(scanned > 0L && scanned < total,
        s"x165: doc $id scanned $scanned of $total partitions — the " +
          "maintained blooms skipped nothing (or everything)")
      hit
    }.reduce(_ unionByName _)
    out.select(col("doc_id"), col("lang"), col("n_chars"))
  }

  val x165Sql: String =
    """SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
       FROM documents WHERE doc_id IN (42, 44)"""

  // --- x166: maintained zone maps (incremental day-over-day) ---------------
  // x163's maps kept fresh WITHOUT rescanning history: zone(A ∪ B) is
  // the per-partition min/max merge, so each ingest commit's stats
  // widen the stored rows at O(index + batch)
  // (ZoneMaps.mergeAppend). Two-commit ingest of the length-clustered
  // corpus — refresh after the first, mergeAppend after the second —
  // then the x163 BETWEEN read with requireFresh = true must still
  // prune (require'd via selected partitions) and still equal the
  // plain filter. Pure-append identity to refresh, replay idempotence,
  // version-gap refusal, and null-range pickup are specced
  // (ZoneMapsSpec).
  def x166ZoneMaintained(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.{ManifestStore, PartitionedStore, ZoneMaps}
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("pt", expr("n_chars div 64L"))
    val table = FreshTables.next(spark, dir, "zonemnt")
    ManifestStore.write(spark, docs.filter(col("doc_id") % 3 < 2), table, "pt")
    ZoneMaps.refresh(spark, table, "n_chars")
    val day2 = docs.filter(col("doc_id") % 3 === 2)
    ManifestStore.merge(spark, table, day2, Seq("doc_id"), "pt")
    ZoneMaps.mergeAppend(spark, table, "n_chars", day2)
    val out = ZoneMaps.readWhere(spark, table, "n_chars",
      lo = 150L, hi = 300L, requireFresh = true)
    val scanned = PartitionedStore.selectedPartitionTotal(out)
    val total = docs.select(col("pt")).distinct().count()
    require(scanned > 0L && scanned < total,
      s"x166: scanned $scanned of $total partitions — the maintained " +
        "maps skipped nothing (or everything)")
    out.select(col("doc_id"), col("lang"), col("n_chars"))
  }

  val x166Sql: String = x163Sql

  // --- x167: stream-fed skipping indexes ------------------------------------
  // x165/x166 through the streaming door, completing the skipping
  // indexes' build → maintained → streamed matrix: each micro-batch is
  // one ingest day — ManifestStore.merge, then maintainAppend on BOTH
  // indexes (zone maps over the clustering column, blooms over
  // doc_id). maintainAppend branches on an explicit version probe, so
  // at-least-once delivery converges at every crash position: a
  // replayed batch after a completed fold no-ops, a torn window (the
  // re-delivered commit doubled the version gap) degrades to a full
  // refresh, never to false negatives. The gate re-delivers the last
  // day after the drain, then requires BOTH reads to prune under
  // requireFresh — the range read is the output (x163's oracle), the
  // point lookup's result is require'd in place.
  def x167StreamSkip(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.{BloomIndex, ManifestStore, PartitionedStore, ZoneMaps}
    import org.apache.spark.sql.streaming.Trigger
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("pt", expr("n_chars div 64L"))
      .withColumn("day", pmod(col("doc_id"), lit(3)))
    val table = FreshTables.next(spark, dir, "sskip")
    val base = FreshTables.next(spark, dir, "sskipin")
    // day 0 is the batch bootstrap; days 1-2 arrive as micro-batches
    ManifestStore.write(spark, docs.filter(col("day") === 0).drop("day"),
      table, "pt")
    ZoneMaps.refresh(spark, table, "n_chars")
    BloomIndex.refresh(spark, table, "doc_id")
    (1 until 3).foreach { d =>
      docs.filter(col("day") === d).repartition(1)
        .write.mode("append").parquet(s"$base/in")
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.drop("day").cache()
        ManifestStore.merge(spark, table, b, Seq("doc_id"), "pt")
        ZoneMaps.maintainAppend(spark, table, "n_chars", b)
        BloomIndex.maintainAppend(spark, table, "doc_id", b)
        b.unpersist()
        ()
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      if (!q.awaitTermination(300000))
        throw new RuntimeException("x167: drain timeout")
    } finally q.stop()
    // at-least-once: re-deliver day 2 through the same maintenance path
    val replay = docs.filter(col("day") === 2).drop("day")
    ManifestStore.merge(spark, table, replay, Seq("doc_id"), "pt")
    ZoneMaps.maintainAppend(spark, table, "n_chars", replay)
    BloomIndex.maintainAppend(spark, table, "doc_id", replay)
    val hit = BloomIndex.readEq(spark, table, "doc_id", 42L, requireFresh = true)
    val bScanned = PartitionedStore.selectedPartitionTotal(hit)
    val total = docs.select(col("pt")).distinct().count()
    require(bScanned > 0L && bScanned < total,
      s"x167: point lookup scanned $bScanned of $total partitions")
    require(hit.count() == 1L, "x167: point lookup lost doc 42")
    val out = ZoneMaps.readWhere(spark, table, "n_chars",
      lo = 150L, hi = 300L, requireFresh = true)
    val zScanned = PartitionedStore.selectedPartitionTotal(out)
    require(zScanned > 0L && zScanned < total,
      s"x167: range read scanned $zScanned of $total partitions")
    out.select(col("doc_id"), col("lang"), col("n_chars"))
  }

  val x167Sql: String = x163Sql

  // --- x168: composite skipping over a Z-ordered layout --------------------
  // The payoff x43 promised, made queryable end-to-end: the corpus is
  // laid out by Morton z-bucket over (n_chars, doc_id)
  // (graft.ext.ZOrder — each of B buckets covers ~1/sqrt(B) of EACH
  // dimension's range), zone maps are refreshed on both columns plus a
  // bloom on lang, and a 3-conjunct query goes through
  // SkippingIndexes.readWhere: every fresh index's qualifying set is
  // INTERSECTED, so the two range predicates prune multiplicatively —
  // require'd: the composite scan opens at most as many partitions as
  // either single-predicate scan, and strictly fewer than the table
  // holds. Results equal the plain 3-conjunct filter (each set
  // over-approximates, the intersection over-approximates the
  // conjunction, the residual filter always applies).
  def x168CompositeSkip(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.{BloomIndex, ManifestStore, PartitionedStore,
      SkippingIndexes, ZoneMaps}
    import graft.sources.SkippingIndexes.{Between, Eq}
    import graft.ext.ZOrder
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val b = docs.agg(
      min(col("n_chars")).cast("long"), max(col("n_chars")).cast("long"),
      min(col("doc_id")).cast("long"), max(col("doc_id")).cast("long")).head()
    val zv = ZOrder.zValue(
      ZOrder.rank16(col("n_chars"), lit(b.getLong(0)), lit(b.getLong(1))),
      ZOrder.rank16(col("doc_id"), lit(b.getLong(2)), lit(b.getLong(3))))
    val table = FreshTables.next(spark, dir, "zskip")
    ManifestStore.write(spark,
      docs.withColumn("__zv", zv)
        .withColumn("pt", expr(s"(__zv * 16) div ${1L << 32}"))
        .drop("__zv"),
      table, "pt")
    ZoneMaps.refresh(spark, table, "n_chars")
    ZoneMaps.refresh(spark, table, "doc_id")
    BloomIndex.refresh(spark, table, "lang")
    val preds = Seq(Between("n_chars", 150L, 300L),
      Between("doc_id", 100L, 249L), Eq("lang", "fr"))
    val out = SkippingIndexes.readWhere(spark, table, preds, requireFresh = true)
    val sBoth = PartitionedStore.selectedPartitionTotal(out)
    val singles = preds.take(2).map { p =>
      PartitionedStore.selectedPartitionTotal(
        SkippingIndexes.readWhere(spark, table, Seq(p), requireFresh = true))
    }
    val total = ManifestStore.read(spark, table)
      .select(col("pt")).distinct().count()
    require(sBoth > 0L && sBoth <= singles.min && singles.max < total,
      s"x168: composite scanned $sBoth, singles $singles, of $total — " +
        "the z-layout intersection bought nothing")
    out.select(col("doc_id"), col("lang"), col("n_chars"))
  }

  val x168Sql: String =
    """SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
       FROM documents
       WHERE n_chars BETWEEN 150 AND 300 AND doc_id BETWEEN 100 AND 249
         AND lang = 'fr'"""

  // --- x169: merged-pass index refresh --------------------------------------
  // x168's three indexes rebuilt by SkippingIndexes.refreshAll in TWO
  // jobs instead of three: all zone columns share one aggregate (one
  // scan, one shuffle to O(partitions) rows carrying every column's
  // [lo, hi]) and the bloom shares one tagged-explode aggregate — the
  // refresh-cost story when a 100 TB table carries many indexed
  // columns, since each merged pass costs ~the widest single one, not
  // the sum (plan law specced: one leaf scan, bounded shuffles,
  // side-table content identical to single-column refreshes). The gate
  // then runs the composite read over the merged-built indexes:
  // pruning require'd, results equal the plain filter.
  def x169RefreshAll(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.{ManifestStore, PartitionedStore, SkippingIndexes}
    import graft.sources.SkippingIndexes.{Between, Eq}
    import graft.ext.ZOrder
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val b = docs.agg(
      min(col("n_chars")).cast("long"), max(col("n_chars")).cast("long"),
      min(col("doc_id")).cast("long"), max(col("doc_id")).cast("long")).head()
    val zv = ZOrder.zValue(
      ZOrder.rank16(col("n_chars"), lit(b.getLong(0)), lit(b.getLong(1))),
      ZOrder.rank16(col("doc_id"), lit(b.getLong(2)), lit(b.getLong(3))))
    val table = FreshTables.next(spark, dir, "refall")
    ManifestStore.write(spark,
      docs.withColumn("__zv", zv)
        .withColumn("pt", expr(s"(__zv * 16) div ${1L << 32}"))
        .drop("__zv"),
      table, "pt")
    SkippingIndexes.refreshAll(spark, table,
      zoneCols = Seq("n_chars", "doc_id"), bloomCols = Seq("lang"))
    val out = SkippingIndexes.readWhere(spark, table,
      Seq(Between("n_chars", 150L, 300L), Between("doc_id", 50L, 199L),
        Eq("lang", "de")), requireFresh = true)
    val scanned = PartitionedStore.selectedPartitionTotal(out)
    val total = ManifestStore.read(spark, table)
      .select(col("pt")).distinct().count()
    require(scanned > 0L && scanned < total,
      s"x169: scanned $scanned of $total partitions — the merged-pass " +
        "indexes skipped nothing (or everything)")
    out.select(col("doc_id"), col("lang"), col("n_chars"))
  }

  val x169Sql: String =
    """SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
       FROM documents
       WHERE n_chars BETWEEN 150 AND 300 AND doc_id BETWEEN 50 AND 199
         AND lang = 'de'"""

  // --- x170: bloom IN-list lookup -------------------------------------------
  // The multi-key form of x164 — "fetch THESE documents from the
  // corpus" (eval-set extraction, spot checks, per-id debugging): one
  // local job hashes every probed key, a partition is scanned when its
  // bloom might contain ANY of them, and the IN-list always applies as
  // the residual. Over the language-partitioned layout the three keys
  // live in ≤3 partitions; the gate requires the scan stays under the
  // partition count and over zero. Past a few hundred keys readIn
  // refuses loudly (a broadcast semi-join is the right tool there) —
  // the boundary is documented, not silent.
  def x170BloomIn(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.{BloomIndex, ManifestStore, PartitionedStore}
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val table = FreshTables.next(spark, dir, "bloomin")
    ManifestStore.write(spark, docs.withColumn("pt", col("lang")), table, "pt")
    BloomIndex.refresh(spark, table, "doc_id")
    val out = BloomIndex.readIn(spark, table, "doc_id",
      Seq(42L, 44L, 250L), requireFresh = true)
    val scanned = PartitionedStore.selectedPartitionTotal(out)
    val total = docs.select(col("lang")).distinct().count()
    require(scanned > 0L && scanned < total,
      s"x170: scanned $scanned of $total partitions — the IN probe " +
        "skipped nothing (or everything)")
    out.select(col("doc_id"), col("lang"), col("n_chars"))
  }

  val x170Sql: String =
    """SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
       FROM documents WHERE doc_id IN (42, 44, 250)"""

  // --- x171: right-to-be-forgotten over the dedup stores -------------------
  // The text-side sibling of x157: DedupStores.forget removes a
  // subject's (fp, id) fingerprint rows and LSH-index rows via keyed,
  // partition-pruned deletes — O(doomed buckets), never a store scan.
  // The gate builds both stores on the historical slice, forgets
  // doc_id % 7 == 2 (accounting: zero surviving fp/index rows for the
  // doomed ids), re-runs the same forget (crash-recovery convergence),
  // and probes the increment: flags must equal a probe against stores
  // built WITHOUT the doomed docs — x65's oracle with the doomed ids
  // excluded from the historical side. A fp shared with a SURVIVING
  // holder stays detectable (the (fp, id) row layout exists for exactly
  // this; pinned in ForgetMatrixSpec — the fixture has no cross-doc fp
  // collisions at gate SF).
  def x171DedupForget(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.DedupStores
    import graft.sources.ManifestStore
    val docs = t(spark, dir, "documents")
    val inc = docs.filter(col("doc_id") % 5 === 0)
    val hist = docs.filter(col("doc_id") % 5 =!= 0)
    val fpT = FreshTables.next(spark, dir, "fpforget")
    val idxT = FreshTables.next(spark, dir, "idxforget")
    DedupStores.build(spark, hist, "doc_id", "text", fpT, idxT)
    val doomed = hist.filter(col("doc_id") % 7 === 2)
    require(doomed.count() > 0L, "x171: empty doomed slice")
    DedupStores.forget(spark, doomed, "doc_id", "text", fpT, idxT)
    val doomedIds = doomed.select(col("doc_id").as("id"))
    val fpLeft = ManifestStore.read(spark, fpT)
      .join(doomedIds, Seq("id"), "left_semi").count()
    val idxLeft = ManifestStore.read(spark, idxT)
      .join(doomedIds, Seq("id"), "left_semi").count()
    require(fpLeft == 0L && idxLeft == 0L,
      s"x171: $fpLeft fp / $idxLeft index rows survived the forget")
    // idempotent re-run — the recovery path after a crash between the
    // fp delete and the index delete
    DedupStores.forget(spark, doomed, "doc_id", "text", fpT, idxT)
    DedupStores.probe(spark, inc, "doc_id", "text", fpT, idxT)
      .select(col("doc_id"), col("is_exact_dup"), col("is_near_dup"),
        col("clean"))
  }

  // x65's probe oracle with the doomed ids excluded from the historical
  // side (and without the post-merge column — no append in this gate)
  val x171Sql: String = {
    val histAnchor = "FROM documents WHERE doc_id % 5 <> 0)"
    val tailAnchor =
      """,
         (is_exact_dup OR (NOT is_exact_dup AND NOT is_near_dup)) AS is_exact_dup_after
       FROM flags"""
    require(x65Sql.contains(histAnchor) && x65Sql.contains(tailAnchor),
      "x171: x65Sql anchors moved")
    x65Sql
      .replace(histAnchor, "FROM documents WHERE doc_id % 5 <> 0 AND doc_id % 7 <> 2)")
      .replace(tailAnchor, "\n       FROM flags")
  }

  // --- x172: right-to-be-forgotten over the BM25 index store ---------------
  // The lexical side of the forget matrix (vector x157, dedup x171):
  // IndexStore.forget removes a subject's postings (term-bucket pruned
  // via the request's own content), corrects the day stats subtotals
  // under a txn fence (forgetSeq — a replay must never subtract twice),
  // and deletes the length row LAST so every crash window re-runs
  // against an intact presence gate. The gate ingests three day slices
  // (x156's layout), forgets doc_id % 7 == 2, REQUIREs zero surviving
  // postings/lens rows and stats N == survivor count, re-runs the same
  // forget (convergence + no double subtraction), and probes: scores
  // must be bit-identical to batch BM25 over the surviving corpus —
  // x69's oracle minus the forgotten docs. The avgdl in every score
  // hash-checks the tl subtraction, not just the row accounting.
  def x172IndexForget(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.ext.IndexStore
    import graft.sources.ManifestStore
    val docs = t(spark, dir, "documents")
    val root = FreshTables.next(spark, dir, "bmforget")
    ProtoStores.cloneTo(spark, bm25Proto(spark, dir), root)
    val doomed = docs.filter(col("doc_id") % 7 === 2)
    require(doomed.count() > 0L, "x172: empty doomed slice")
    IndexStore.forget(spark, doomed, "doc_id", "text", root, forgetSeq = 1L)
    val dIds = doomed.select(col("doc_id").as("id"))
    val postLeft = ManifestStore.read(spark, s"$root/postings")
      .join(dIds, Seq("id"), "left_semi").count()
    val lensLeft = ManifestStore.read(spark, s"$root/lens")
      .join(dIds, Seq("id"), "left_semi").count()
    require(postLeft == 0L && lensLeft == 0L,
      s"x172: $postLeft posting / $lensLeft lens rows survived the forget")
    def statsN(): Long = ManifestStore.read(spark, s"$root/stats")
      .agg(sum(col("nd"))).collect().head.getLong(0)
    val survivors = docs.filter(col("doc_id") % 7 =!= 2).count()
    require(statsN() == survivors,
      s"x172: stats N ${statsN()} != $survivors survivors")
    // idempotent re-run — every crash window converges, and the txn
    // fence stops a second stats subtraction
    IndexStore.forget(spark, doomed, "doc_id", "text", root, forgetSeq = 1L)
    require(statsN() == survivors,
      s"x172: replay double-subtracted stats (N ${statsN()})")
    val qs = Seq(
      ("q_hash_join", Seq("hash", "join")),
      ("q_stream", Seq("stream", "window", "batch")),
      ("q_vector", Seq("vector", "data"))).toDF("query_id", "terms")
    IndexStore.bm25Probe(spark, root, qs, "doc_id", topK = 15, partitions = 8)
  }

  // x69's oracle over the surviving corpus — the forgotten docs leave
  // the token stream, the length table, AND the N/avgdl stats
  val x172Sql: String = {
    val a1 = "FROM documents),"
    val a2 = "FROM documents d"
    require(x69Sql.contains(a1) && x69Sql.contains(a2), "x172: x69Sql anchors moved")
    x69Sql
      .replace(a1, "FROM documents WHERE doc_id % 7 <> 2),")
      .replace(a2, "FROM (SELECT * FROM documents WHERE doc_id % 7 <> 2) d")
  }

  // --- x173: right-to-be-forgotten over the cluster store ------------------
  // The component-store member of the forget matrix (vector x157, dedup
  // x171, BM25 x172): ClusterStore.forget removes the doomed ids'
  // membership rows and relabels each affected cluster to its min
  // SURVIVING member — twin-routed, partition-pruned, O(doomed +
  // affected members). Semantics are the documented conservative
  // decremental-connectivity form (clusters never split on forget; the
  // store holds labels, not edges), which the oracle replicates
  // exactly: full components over ALL pairs, doomed members dropped,
  // relabel per ORIGINAL component by min surviving id. The gate
  // REQUIREs the doomed slice to hit ≥1 cluster min (the relabel
  // cascade provably fires — % 9 == 4 dooms 3–4 minima at both gate
  // SFs), zero surviving doomed rows in either table, and re-runs the
  // forget (crash-recovery convergence) before the label rollup.
  def x173ClusterForget(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.ClusterStore
    import graft.sources.ManifestStore
    val docs = t(spark, dir, "documents")
    val root = FreshTables.next(spark, dir, "clforget")
    ProtoStores.cloneTo(spark, clusterAllProto(spark, dir), root)
    val labels = Dedup.materialize(ClusterStore.readLabels(spark, root))
    val doomed = Dedup.materialize(
      labels.filter(col("id") % 9 === 4).select(col("id")))
    require(doomed.count() > 0L, "x173: empty doomed slice")
    val minDoomed = labels.select(col("label").as("id")).distinct()
      .join(doomed, Seq("id"), "left_semi").count()
    require(minDoomed > 0L,
      "x173: doomed slice misses every cluster min — the relabel path is untested")
    ClusterStore.forget(spark, doomed, "id", root, partitions = 8)
    val mainLeft = ClusterStore.readLabels(spark, root)
      .join(doomed, Seq("id"), "left_semi").count()
    val twinLeft = ManifestStore.read(spark, s"$root/_idindex")
      .join(doomed, Seq("id"), "left_semi").count()
    require(mainLeft == 0L && twinLeft == 0L,
      s"x173: $mainLeft main / $twinLeft twin rows survived the forget")
    // idempotent re-run — the recovery path for every crash window
    ClusterStore.forget(spark, doomed, "id", root, partitions = 8)
    ClusterStore.readLabels(spark, root)
      .groupBy(col("label")).agg(count(lit(1)).as("n_members"))
  }

  // full components over ALL pairs → drop doomed members → relabel per
  // ORIGINAL component by min surviving id (the conservative no-split
  // semantics, replicated exactly)
  val x173Sql: String =
    s"""WITH RECURSIVE ${jaccardCtes(3)},
       ${componentCtes(0.7)},
       cl AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
       surv AS (SELECT id, comp FROM cl WHERE id % 9 <> 4),
       rel AS (SELECT comp, min(id) AS label FROM surv GROUP BY comp)
       SELECT rel.label, CAST(count(*) AS BIGINT) AS n_members
       FROM surv JOIN rel USING (comp) GROUP BY 1"""

  // --- x174: token-bloom keyword skipping ----------------------------------
  // The data-skipping family (x163–x170) reaches INSIDE text columns:
  // per-partition blooms over each partition's DISTINCT TOKENS, so a
  // keyword sweep ("every doc mentioning these terms" — a takedown
  // scan, a contamination spot check) prunes to the partitions whose
  // bloom might contain ALL probed terms instead of scanning the
  // corpus. Skipping is sound per conjunct (a doc holding every term
  // implies its partition's bloom does); the conjunctive residual
  // always applies, so the result never depends on the blooms. The
  // gate hash-partitions docs 256 ways, probes the fixture's one rare
  // token ('dup', ~5% of docs) plus a common one, and REQUIREs real
  // pruning (scanned strictly between 0 and the live-partition total
  // at every SF — verified 25/256 at sf0.01, 162/256 at sf0.1).
  def x174TokenSkip(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.{BloomIndex, ManifestStore, PartitionedStore}
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val table = FreshTables.next(spark, dir, "tokskip")
    ManifestStore.write(spark,
      docs.withColumn("pt", pmod(col("doc_id"), lit(256L))), table, "pt")
    BloomIndex.refreshTokens(spark, table, "text")
    val out = BloomIndex.readContainsAll(spark, table, "text",
      Seq("dup", "vector"), requireFresh = true)
    val scanned = PartitionedStore.selectedPartitionTotal(out)
    val total = docs.select(pmod(col("doc_id"), lit(256L))).distinct().count()
    require(scanned > 0L && scanned < total,
      s"x174: scanned $scanned of $total partitions — the token probe " +
        "skipped nothing (or everything)")
    out.select(col("doc_id"), col("lang"))
  }

  val x174Sql: String =
    """SELECT doc_id, lang FROM documents
       WHERE list_contains(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> ''), 'dup')
         AND list_contains(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> ''), 'vector')"""

  // --- x175: filtered ANN (attribute predicate inside the vector probe) ----
  // The filtered vector search every production store offers ("nearest
  // neighbors WHERE lang = 'en'"): build(attrCols) writes an attrs
  // table CO-PARTITIONED with the codes, and probeFiltered drops
  // candidates failing the predicate BEFORE the ADC ranking —
  // pre-filtering, so the top-k are the best k FILTERED candidates of
  // the probed cells (a post-filtered list would silently return fewer
  // than k). The predicate's I/O rides the SAME pruned partitions the
  // ranking reads. Oracle = x128's pipeline with the label predicate
  // applied at the candidate stage — the exact position the engine
  // applies it.
  def x175FilteredAnn(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.VectorStore
    val data = t(spark, dir, "embeddings")
    val cents = data.filter(col("vec_id") % 50 === 0)
    val root = FreshTables.next(spark, dir, "vfiltered")
    VectorStore.build(spark, data, cents, "vec_id", "embedding", root,
      dim = 64, m = 4, k = 16, stride = 3, attrCols = Seq("label"))
    val out = VectorStore.probeFiltered(spark, data.filter(col("vec_id") < 8),
      "vec_id", "embedding", root,
      dim = 64, m = 4, k = 16, stride = 3, nprobe = 3, topK = 10,
      predicate = col("label") % 2 === 0)
    require(out.count() > 0L, "x175: empty filtered probe")
    out
  }

  // x128's pipeline with the label predicate at the candidate stage
  val x175Sql: String = {
    val anchor = "WHERE asg.vec_id <> pr.query_id"
    require(x128Sql.contains(anchor), "x175: x128Sql anchor moved")
    x128Sql.replace(anchor,
      anchor + " AND asg.vec_id IN (SELECT vec_id FROM embeddings WHERE label % 2 = 0)")
  }

  // --- x176: maintained heavy-hitter store ---------------------------------
  // The heavy-hitter family gets its maintained form — but NOT by
  // persisting the x70 Misra–Gries counters (their state depends on
  // partition iteration order: not a deterministic stored artifact).
  // Instead each day stores its EXACT top-m counts plus a (n, kth)
  // stat row, and reads merge with the classic distributed top-k
  // bounds (Fagin's TA / TPUT): c_lo = the reporting days' sum, c_hi
  // adds each silent day's kth. No false negatives for any certifiable
  // threshold (> Σ kth — refused loudly below that). The fixture's
  // per-day vocabulary fits m, so every kth is 0 and the gate's bounds
  // collapse to exact counts — the oracle is the plain frequency
  // threshold; HhStoreSpec pins the kth>0 bound math and the torn-
  // window fence on hand-built days. Replay accounting in-gate: the
  // day-keyed merges replace wholesale.
  def x176HhStore(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val toks = Dedup.materialize(
      LangModel.tokenRows(docs, "doc_id", "text")
        .withColumn("day", pmod(col("id"), lit(3L))))
    val table = FreshTables.next(spark, dir, "hhstore")
    (0 until 3).foreach { b =>
      Sketches.hhAppendDay(spark, toks.filter(col("day") === b.toLong),
        "w", s"d$b", table)
    }
    // at-least-once: re-deliver day d1 — wholesale day replace
    Sketches.hhAppendDay(spark, toks.filter(col("day") === 1L),
      "w", "d1", table)
    val stored = graft.sources.ManifestStore.read(spark, s"$table/hh").count()
    // each day stores min(distinct, m) rows (the top-m cap binds on
    // vocabularies larger than m — the 10× scale corpus)
    val expected = toks.select(col("day"), col("w")).distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("nd"))
      .agg(sum(least(col("nd"), lit(256L)))).head().getLong(0)
    require(stored == expected,
      s"x176: store holds $stored summary rows, expected $expected — " +
        "the d1 replay duplicated instead of replacing")
    Sketches.hhFromStore(spark, table, minFractionDen = 50L)
  }

  // per-day vocab < m ⇒ kth = 0 ⇒ bounds are exact counts: the oracle
  // is the plain global frequency threshold at ceil(N/50)
  val x176Sql: String =
    """WITH t AS (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS v
         FROM documents),
       c AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY 1),
       n AS (SELECT CAST(sum(c) AS BIGINT) AS N FROM c)
       SELECT v, c AS c_lo, c AS c_hi, TRUE AS decided FROM c, n
       WHERE c >= (N + 49) // 50"""

  // --- x177: STREAMING heavy-hitter-store maintenance ----------------------
  // x176's store joins the streaming matrix (CM x111, HLL x146,
  // histogram x161, KMV x162): token days arrive as micro-batches,
  // each folded by Sketches.hhAppendDay in foreachBatch (two wholesale
  // day-replace merges per batch), one batch re-delivered post-drain
  // with row accounting — the monitor read is x176's oracle through
  // the streaming door.
  def x177StreamHh(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val docs = t(spark, dir, "documents")
    val toks = Dedup.materialize(
      LangModel.tokenRows(docs, "doc_id", "text")
        .withColumn("day", pmod(col("id"), lit(3L)))
        .select(col("w"), col("day")))
    val table = FreshTables.next(spark, dir, "shhstore")
    val base = FreshTables.next(spark, dir, "shhin")
    (0 until 3).foreach { b =>
      toks.filter(col("day") === b.toLong).repartition(1)
        .write.mode("append").parquet(s"$base/in")
    }
    val stream = spark.readStream.schema(toks.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val d = batch.agg(min(col("day"))).head().getLong(0)
        Sketches.hhAppendDay(spark, batch, "w", s"d$d", table)
        ()
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      if (!q.awaitTermination(300000))
        throw new RuntimeException("x177: drain timeout")
    } finally q.stop()
    // at-least-once: re-deliver day 1
    Sketches.hhAppendDay(spark, toks.filter(col("day") === 1L), "w", "d1", table)
    val stored = graft.sources.ManifestStore.read(spark, s"$table/hh").count()
    val expected = toks.select(col("day"), col("w")).distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("nd"))
      .agg(sum(least(col("nd"), lit(256L)))).head().getLong(0)
    require(stored == expected,
      s"x177: store holds $stored summary rows, expected $expected — " +
        "the d1 replay duplicated instead of replacing")
    Sketches.hhFromStore(spark, table, minFractionDen = 50L)
  }

  val x177Sql: String = x176Sql

  // --- x178: incrementally maintained join view ----------------------------
  // The materialized-view member of the maintained-store family
  // (ext/ViewStore): view = lineitem ⋈ orders kept fresh by the delta
  // rule ΔV = (ΔA ⋈ B_new) ∪ ((A_new ∖ ΔA) ⋈ ΔB) — the join is paid
  // incrementally at ingest (each term pruned to the other base's
  // touched join-key buckets), never as a full recompute, and the view
  // read is free. The gate deliberately DESYNCS the day splits (an
  // order arrives on a different day than its lineitems: okey % 3 vs
  // (okey+1) % 3) so cross-day pairing must flow through the persisted
  // bases, replays day 1 (keyed merges replace), REQUIREs view
  // cardinality == the one-shot join, and rolls the view up per
  // customer — the oracle is the plain join + rollup.
  def x178ViewStore(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.ViewStore
    val li = t(spark, dir, "lineitem").select(
      col("l_orderkey").as("okey"), col("l_linenumber"),
      col("l_quantity"), col("l_extendedprice"))
    val ord = t(spark, dir, "orders").select(
      col("o_orderkey").as("okey"), col("o_custkey"), col("o_orderpriority"))
    val root = FreshTables.next(spark, dir, "viewstore")
    def dayA(d: Int) = li.filter(pmod(col("okey"), lit(3L)) === d.toLong)
    def dayB(d: Int) = ord.filter(pmod(col("okey") + 1L, lit(3L)) === d.toLong)
    (0 until 3).foreach { d =>
      ViewStore.appendDay(spark, root, dayA(d), dayB(d), "okey",
        Seq("okey", "l_linenumber"), Seq("okey"))
    }
    // at-least-once: replay day 1 on both sides — every merge replaces
    ViewStore.appendDay(spark, root, dayA(1), dayB(1), "okey",
      Seq("okey", "l_linenumber"), Seq("okey"))
    val v = ViewStore.readView(spark, root)
    val expected = li.join(ord, Seq("okey")).count()
    require(v.count() == expected,
      s"x178: view holds ${v.count()} rows, the one-shot join has $expected")
    v.groupBy(col("o_custkey"), col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_price"),
        count(lit(1)).as("n_items"))
  }

  val x178Sql: String =
    """SELECT o_custkey, o_orderpriority, sum(l_quantity) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       count(*) AS n_items
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       GROUP BY 1, 2"""

  // --- x179: incrementally maintained AGGREGATE view ------------------------
  // The full IVM story on top of x178: the consumer-facing artifact is
  // a join+agg rollup whose day-keyed subtotals cost O(days × groups)
  // storage and an O(days × groups) re-sum at read — the join never
  // materializes for the consumer. The replay hazard is named and
  // closed: a late replay's recomputed delta regenerates cross-day
  // pairs the row view already holds, so the day's subtotal counts
  // only trueNew = ΔV ∖ view (keyed anti-join pruned to ΔV's buckets),
  // committed before the view merge — ViewStoreSpec pins the crash
  // windows. Replaying day 1 in-gate must leave exactly 3 day
  // subtotals; the oracle is the plain join rollup.
  /** The x179 aggregate-view store as a build-once prototype (3 desynced
    * ingest cycles + the d1 replay with its accounting REQUIREs) —
    * shared by x179 (reads it), x181 and x217 (clone it, then forget).
    */
  private def aggViewProto(spark: SparkSession, dir: String): String =
    ProtoStores.proto(dir, "aggview") { root =>
      import graft.ext.ViewStore
      val li = t(spark, dir, "lineitem").select(
        col("l_orderkey").as("okey"), col("l_linenumber"), col("l_quantity"))
      val ord = t(spark, dir, "orders").select(
        col("o_orderkey").as("okey"), col("o_orderpriority"))
      def dayA(d: Int) = li.filter(pmod(col("okey"), lit(3L)) === d.toLong)
      def dayB(d: Int) = ord.filter(pmod(col("okey") + 1L, lit(3L)) === d.toLong)
      def cycle(d: Int): Unit = ViewStore.appendDayAgg(spark, root,
        dayA(d), dayB(d), "okey", Seq("okey", "l_linenumber"), Seq("okey"),
        day = s"d$d", groupCols = Seq("o_orderpriority"),
        sumCols = Seq("l_quantity"))
      (0 until 3).foreach(cycle)
      cycle(1) // at-least-once: a completed day replayed — trueNew empty
      // day 0's increments have no partners yet (the desync sends an
      // order's lineitems and the order itself to different days), so
      // exactly days 1 and 2 carry subtotals — and the d1 replay must
      // not have re-added or wiped anything
      val days = graft.sources.ManifestStore.read(spark, s"$root/aggview")
        .select(col("day")).distinct().collect().map(_.getString(0)).toSet
      require(days == Set("d1", "d2"),
        s"x179: day subtotals $days after the replay, expected {d1, d2}")
    }

  def x179AggView(spark: SparkSession, dir: String): DataFrame =
    graft.ext.ViewStore.readAgg(spark, aggViewProto(spark, dir),
      groupCols = Seq("o_orderpriority"), sumCols = Seq("l_quantity"))

  val x179Sql: String =
    """SELECT o_orderpriority, count(*) AS cnt, sum(l_quantity) AS sum_l_quantity
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       GROUP BY 1"""

  // --- x180: hybrid retrieval from the maintained stores --------------------
  // x89's RRF fusion moved onto the PRODUCTION path: the lexical list
  // comes from the maintained BM25 index (x156 — the probe reads only
  // the query vocabulary's buckets) and the dense list from the
  // maintained IVF+PQ vector store (x129 — the probe scans only the
  // probed centroids' partitions), fused by exact-integer reciprocal
  // ranks. Neither side rescans its corpus — the complete retrieval
  // stack a deployment actually runs, end to end from stores. The
  // oracle nests x69's BM25 and x128's IVF+PQ pipelines as subqueries
  // (k=20 each) under the RRF rollup.
  def x180HybridStore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.ext.{IndexStore, VectorStore}
    val docs = t(spark, dir, "documents")
    val emb = t(spark, dir, "embeddings")
    val lexRoot = bm25Proto(spark, dir)
    val qs = Seq(
      ("q_hash_join", Seq("hash", "join")),
      ("q_stream", Seq("stream", "window", "batch")),
      ("q_vector", Seq("vector", "data"))).toDF("query_id", "terms")
    val lexical = IndexStore.bm25Probe(spark, lexRoot, qs, "doc_id", topK = 20)
      .select(col("query_id"), col("rank"), col("doc_id"))
    val vecRoot = vecStoreProto(spark, dir)
    val probeMap = Seq(("q_hash_join", 0L), ("q_stream", 1L), ("q_vector", 2L))
      .toDF("qname", "pvec")
    val dense = VectorStore.probe(spark, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", vecRoot,
      dim = 64, m = 4, k = 16, stride = 3, nprobe = 3, topK = 20)
      .join(broadcast(probeMap), col("query_id") === col("pvec"))
      .select(col("qname").as("query_id"), col("rank"), col("vec_id").as("doc_id"))
    Retrieval.rrfFuse(Seq(lexical, dense), "doc_id", k = 10)
  }

  val x180Sql: String = {
    val lexAnchor = "FROM r WHERE rank <= 15"
    val denSelAnchor = "SELECT query_id, rank, vec_id, est_d9 FROM r WHERE rank <= 10"
    val denQAnchor = "WHERE q.vec_id < 8"
    require(x69Sql.contains(lexAnchor) && x128Sql.contains(denSelAnchor) &&
      x128Sql.contains(denQAnchor), "x180: oracle anchors moved")
    val lex20 = x69Sql.replace(lexAnchor, "FROM r WHERE rank <= 20")
    val den20 = x128Sql
      .replace(denQAnchor, "WHERE q.vec_id < 3")
      .replace(denSelAnchor, "SELECT query_id, rank, vec_id FROM r WHERE rank <= 20")
    s"""WITH lexr AS (SELECT query_id, rank, doc_id FROM ($lex20)),
       denr0 AS (SELECT query_id, rank, vec_id FROM ($den20)),
       qmap(qname, pvec) AS (VALUES ('q_hash_join', 0), ('q_stream', 1), ('q_vector', 2)),
       denr AS (SELECT qname AS query_id, rank, vec_id AS doc_id
                FROM denr0 JOIN qmap ON query_id = pvec),
       contrib AS (SELECT query_id, doc_id, 1000000000000 // (60 + rank) AS c FROM lexr
                   UNION ALL
                   SELECT query_id, doc_id, 1000000000000 // (60 + rank) FROM denr),
       fused AS (SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS rrf_fp
                 FROM contrib GROUP BY 1, 2),
       fr AS (SELECT query_id, doc_id, rrf_fp,
              row_number() OVER (PARTITION BY query_id ORDER BY rrf_fp DESC, doc_id) AS rank
              FROM fused)
       SELECT query_id, rank, doc_id, rrf_fp FROM fr WHERE rank <= 10"""
  }

  // --- x181: right-to-be-forgotten over the maintained views ----------------
  // The forget matrix reaches the view stores (vector x157, dedup
  // x171, BM25 x172, cluster x173, views here): ViewStore.forgetA
  // removes doomed A-side rows from the base, every view row they
  // produced, and their mass from the aggregate subtotals — the
  // correction is a NEGATIVE subtotal under a per-request day key
  // (idempotent wholesale replace; readAgg nets it against the
  // positive days, so no historical subtotal is ever rewritten), and
  // the commit order (correction → view delete → base delete closing
  // the forget fence) replays to convergence from every window. The
  // gate builds x179's store, forgets okey % 11 == 3's lineitems,
  // REQUIREs zero surviving base/view rows, re-runs the forget, and
  // reads the aggregate — the oracle recomputes over the surviving
  // lineitems.
  def x181ViewForget(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.ViewStore
    val li = t(spark, dir, "lineitem").select(
      col("l_orderkey").as("okey"), col("l_linenumber"), col("l_quantity"))
    val root = FreshTables.next(spark, dir, "viewforget")
    ProtoStores.cloneTo(spark, aggViewProto(spark, dir), root)
    val doomed = li.filter(col("okey") % 11 === 3)
    require(doomed.count() > 0L, "x181: empty doomed slice")
    def forget(): Unit = ViewStore.forgetA(spark, root, doomed, "okey",
      Seq("okey", "l_linenumber"), forgetSeq = 1L,
      groupCols = Seq("o_orderpriority"), sumCols = Seq("l_quantity"))
    forget()
    val ms = graft.sources.ManifestStore
    val dk = doomed.select(col("okey"), col("l_linenumber"))
    val baseLeft = ms.read(spark, s"$root/a")
      .join(dk, Seq("okey", "l_linenumber"), "left_semi").count()
    val viewLeft = ms.read(spark, s"$root/view")
      .join(dk, Seq("okey", "l_linenumber"), "left_semi").count()
    require(baseLeft == 0L && viewLeft == 0L,
      s"x181: $baseLeft base / $viewLeft view rows survived the forget")
    forget() // idempotent re-run — the recovery path
    ViewStore.readAgg(spark, root,
      groupCols = Seq("o_orderpriority"), sumCols = Seq("l_quantity"))
  }

  // x179's rollup over the surviving lineitems
  val x181Sql: String = {
    val anchor = "FROM lineitem JOIN orders"
    require(x179Sql.contains(anchor), "x181: x179Sql anchor moved")
    x179Sql.replace(anchor,
      "FROM (SELECT * FROM lineitem WHERE l_orderkey % 11 <> 3) lineitem JOIN orders")
  }

  // --- x182: KMV set-algebra source-overlap matrix -------------------------
  // The cross-source vocabulary-overlap question (which corpora share
  // content?) answered from O(sources × k) sketch state instead of the
  // exact distinct-bigram pair join x60 pays: one token pass builds the
  // per-source KMV sketches (x40's machinery), then union/Jaccard/
  // intersection estimates for every pair come from the sketches alone
  // (Beyer et al. 2007). At 100 TB the exact join shuffles the corpus;
  // this shuffles k hashes per source.
  def x182KmvOverlap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ws = t(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "w")))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bg = ws.withColumn("__w1", lead(col("w"), 1).over(byDoc))
      .filter(col("__w1").isNotNull)
      .select(col("source"), concat_ws(" ", col("w"), col("__w1")).as("bg"))
    Sketches.kmvOverlap(Sketches.kmvMins(bg, "source", "bg", k = 64), "source")
  }

  val x182Sql: String =
    s"""WITH w AS (SELECT source,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws
       FROM documents),
       b AS (SELECT source, unnest(list_transform(generate_series(1, len(ws) - 1),
             i -> ws[i] || ' ' || ws[i + 1])) AS bg
         FROM w WHERE len(ws) >= 2),
       hd AS (SELECT DISTINCT source, substr(md5(bg), 1, 12) AS hx FROM b),
       r AS (SELECT source, hx, row_number() OVER (PARTITION BY source ORDER BY hx) AS rn FROM hd),
       m AS (SELECT source, list(hx ORDER BY hx) AS mins FROM r WHERE rn <= 64 GROUP BY 1),
       p AS (SELECT a.source AS group_a, b.source AS group_b, a.mins AS ma, b.mins AS mb
         FROM m a JOIN m b ON a.source < b.source),
       u0 AS (SELECT group_a, group_b, ma, mb,
           list_slice(list_sort(list_distinct(list_concat(ma, mb))), 1, 64) AS u
         FROM p),
       e AS (SELECT group_a, group_b, len(u) AS nu,
           len(list_filter(u, x -> list_contains(ma, x) AND list_contains(mb, x))) AS nc,
           CASE WHEN len(u) = 64
                THEN 63.0 / (CAST(${duckHex48("u[64]")} AS DOUBLE) / 281474976710656.0)
                ELSE CAST(len(u) AS DOUBLE) END AS eu
         FROM u0)
       SELECT group_a, group_b,
         CAST(nu AS BIGINT) AS n_union_sketch, CAST(nc AS BIGINT) AS n_common,
         eu AS est_union,
         CAST(nc AS DOUBLE) / CAST(nu AS DOUBLE) AS jaccard_est,
         round(CAST(nc AS DOUBLE) / CAST(nu AS DOUBLE) * eu, 6) AS est_intersection
       FROM e"""

  // --- x183: native session_window sessionization --------------------------
  // The built-in spelling of x08: Catalyst's MergingSessions operator
  // does the gap merge (one user shuffle, in-partition sort merge — no
  // window-function pass), and the identical expression runs under
  // readStream (x184). Boundary rule matches x08 exactly (abutting
  // per-event windows merge — spec-pinned), so the oracle is x08's
  // inclusive gaps-and-islands with the window_end = last + gap bound
  // added.
  def x183SessionWindow(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    Events.sessionWindowStats(
      ev.withColumn("ts_us", Events.epochMicros(ev)),
      "user_id", "ts_us", gapMicros = 1800000000L)
  }

  val x183Sql: String =
    """WITH x AS (SELECT user_id, epoch_us(ts) AS e FROM events),
       s AS (SELECT user_id, e,
         CASE WHEN lag(e) OVER (PARTITION BY user_id ORDER BY e) IS NULL
                OR e - lag(e) OVER (PARTITION BY user_id ORDER BY e) > 1800000000
              THEN 1 ELSE 0 END AS ns FROM x),
       g AS (SELECT user_id, e,
         sum(ns) OVER (PARTITION BY user_id ORDER BY e ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM s)
       SELECT user_id, min(e) AS window_start, max(e) + 1800000000 AS window_end,
              min(e) AS session_start, max(e) AS session_end,
              count(*) AS n_events
       FROM g GROUP BY user_id, sid"""

  // --- x184: streaming native session windows (≡ x183) ---------------------
  // The same session_window expression drained through Structured
  // Streaming (complete mode: sessions merge across micro-batches in
  // the session state store) — multi-batch replay must land exactly on
  // the batch result, through the shared x183 oracle.
  def x184StreamSessionWindow(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val base = s"/tmp/graft/ssw_$tag"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val e = t(spark, dir, "events")
    val src = e.select(timestamp_micros(Events.epochMicros(e)).as("tss"),
      col("user_id"))
    src.write.parquet(s"$base/in")
    val qname = s"x184_ssw_$tag"
    spark.catalog.dropTempView(qname)
    val agg = spark.readStream.schema(src.schema).parquet(s"$base/in")
      .groupBy(col("user_id"),
        session_window(col("tss"), "1800000000 microseconds").as("__sw"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("tss"))).as("session_start"),
        max(unix_micros(col("tss"))).as("session_end"))
    val q = agg.writeStream.format("memory").queryName(qname)
      .outputMode("complete")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    try { if (!q.awaitTermination(300000)) throw new RuntimeException("x184: drain timeout") }
    finally q.stop()
    spark.table(qname).select(col("user_id"),
      unix_micros(col("__sw.start")).as("window_start"),
      unix_micros(col("__sw.end")).as("window_end"),
      col("session_start"), col("session_end"), col("n_events"))
  }

  val x184Sql: String = x183Sql

  // --- x185: time-series resample + forward fill ---------------------------
  // Hourly per-type grid over events: silent hours appear with
  // n_events = 0 and the last observed hourly total carried forward —
  // the dense series every dashboard/alert consumer joins against.
  // One data pass; the grid work is O(types × hours).
  def x185ResampleFill(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    Events.resampleFill(
      ev.withColumn("ts_us", Events.epochMicros(ev)),
      "event_type", "ts_us", "value", stepUs = 3600000000L)
  }

  val x185Sql: String =
    """WITH x AS (SELECT event_type AS k, epoch_us(ts) AS e, value FROM events),
       o AS (SELECT k, e // 3600000000 AS b, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS tv
         FROM x GROUP BY 1, 2),
       r AS (SELECT k, min(b) AS lo, max(b) AS hi FROM o GROUP BY 1),
       sp AS (SELECT k, unnest(generate_series(lo, hi)) AS b FROM r),
       j AS (SELECT sp.k, sp.b, coalesce(o.n, 0) AS n_events, o.tv
         FROM sp LEFT JOIN o ON sp.k = o.k AND sp.b = o.b),
       f AS (SELECT k, b, n_events, tv,
           sum(CASE WHEN tv IS NULL THEN 0 ELSE 1 END) OVER (PARTITION BY k ORDER BY b
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
         FROM j)
       SELECT k AS event_type, b * 3600000000 AS bucket_start,
         CAST(n_events AS BIGINT) AS n_events, tv AS total_value,
         max(tv) OVER (PARTITION BY k, seg) AS filled_value
       FROM f"""

  // --- x186: k-core of the near-dup pair graph -----------------------------
  // Dense template-family mass vs star/chain periphery: the 2-core of
  // x04's pair graph (every member near-duplicates >= 2 others). The
  // peel is idempotent past its fixpoint, so the oracle unrolls MORE
  // rounds (8) than the live run needs — the live run require-converges
  // within the same bound.
  def x186KCore(spark: SparkSession, dir: String): DataFrame =
    Graph.kCorePeel(
      allPairs(spark, dir),
      "id_a", "id_b", k = 2, maxRounds = 8)
      .select(col("id").as("doc_id"), col("deg"))

  // every CTE MATERIALIZED: each round references its predecessor ~4×,
  // and DuckDB inlines plain CTEs per reference — 8 unrolled rounds
  // would exponentiate into hundreds of base-table scans (observed as
  // fd exhaustion), while materialization keeps the chain linear
  private def kCoreCtes(k: Int, rounds: Int): String = {
    val peel = (1 to rounds).map { i =>
      s"""d$i AS MATERIALIZED (SELECT id, count(*) AS deg FROM (
             SELECT u AS id FROM e${i - 1} UNION ALL SELECT v FROM e${i - 1}) GROUP BY 1),
         bad$i AS MATERIALIZED (SELECT id FROM d$i WHERE deg < $k),
         e$i AS MATERIALIZED (SELECT u, v FROM e${i - 1}
           WHERE u NOT IN (SELECT id FROM bad$i)
             AND v NOT IN (SELECT id FROM bad$i))"""
    }.mkString(",\n       ")
    s"""e0 AS MATERIALIZED (SELECT DISTINCT least(id_a, id_b) AS u, greatest(id_a, id_b) AS v FROM prs),
       $peel"""
  }

  val x186Sql: String =
    s"""WITH ${jaccardCtes(3)},
       prs AS (SELECT id_a, id_b
         FROM inter JOIN sizes na ON na.doc_id = id_a
         JOIN sizes nb ON nb.doc_id = id_b
         WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.7),
       ${kCoreCtes(2, 8)}
       SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS deg FROM (
         SELECT u AS id FROM e8 UNION ALL SELECT v FROM e8) GROUP BY 1"""

  // --- x187: pseudo-relevance-feedback query expansion ---------------------
  // Rocchio PRF over x69's query fixture: BM25 round 1 → top-5 feedback
  // docs → top-3 tf-idf expansion terms (originals excluded, exact-
  // integer selection order) → BM25 round 2 on the expanded queries.
  // The oracle generates both rounds from one CTE template so the two
  // engines can never drift on just one round.
  def x187PrfExpand(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qs = Seq(
      ("q_hash_join", Seq("hash", "join")),
      ("q_stream", Seq("stream", "window", "batch")),
      ("q_vector", Seq("vector", "data"))).toDF("query_id", "terms")
    Retrieval.prfExpand(t(spark, dir, "documents"), "doc_id", "text", qs,
      kFeedback = 5, mTerms = 3, k = 15)
  }

  /** One BM25 scoring round as CTEs (`{p}tf`/`{p}df`/`{p}sc`/`{p}r`)
    * over shared toks/lens/stats, scoring query-term table `qt`. */
  private def bm25RoundCtes(qt: String, p: String): String =
    s"""${p}tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM toks
         WHERE w IN (SELECT DISTINCT w FROM $qt) GROUP BY 1, 2),
       ${p}df AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM ${p}tf GROUP BY 1),
       ${p}sc AS (SELECT $qt.query_id, ${p}tf.doc_id,
           CAST(sum(CAST(round(
             ln(1.0 + (CAST(nd AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
             * ((CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(len AS DOUBLE) / avgdl))))
             * 1000000000.0) AS BIGINT)) AS BIGINT) AS s9
         FROM ${p}tf JOIN ${p}df USING (w) JOIN $qt USING (w)
         JOIN lens USING (doc_id) CROSS JOIN stats GROUP BY 1, 2),
       ${p}r AS (SELECT query_id, doc_id, s9,
           row_number() OVER (PARTITION BY query_id ORDER BY s9 DESC, doc_id) AS rank
         FROM ${p}sc)"""

  val x187Sql: String =
    s"""WITH toks AS MATERIALIZED (SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS w
       FROM documents),
       lens AS (SELECT d.doc_id, coalesce(t.len, 0) AS len FROM documents d
         LEFT JOIN (SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM toks GROUP BY 1) t USING (doc_id)),
       stats AS (SELECT CAST(count(*) AS BIGINT) AS nd,
         CAST(sum(len) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM lens),
       qt1 AS (SELECT * FROM (VALUES
         ('q_hash_join','hash'),('q_hash_join','join'),
         ('q_stream','stream'),('q_stream','window'),('q_stream','batch'),
         ('q_vector','vector'),('q_vector','data')) AS q(query_id, w)),
       ${bm25RoundCtes("qt1", "r1")},
       fb AS (SELECT query_id, doc_id FROM r1r WHERE rank <= 5),
       ft AS (SELECT fb.query_id, toks.w, CAST(count(*) AS BIGINT) AS ftf
         FROM fb JOIN toks USING (doc_id) GROUP BY 1, 2),
       cand AS (SELECT ft.query_id, ft.w, ft.ftf FROM ft
         LEFT JOIN qt1 ON qt1.query_id = ft.query_id AND qt1.w = ft.w
         WHERE qt1.w IS NULL),
       dfc AS (SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM toks
         WHERE w IN (SELECT DISTINCT w FROM cand) GROUP BY 1),
       wt AS (SELECT cand.query_id, cand.w,
           CAST(round(ln(1.0 + (CAST(nd AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
             * CAST(ftf AS DOUBLE) * 1000000000.0) AS BIGINT) AS w9
         FROM cand JOIN dfc USING (w) CROSS JOIN stats),
       ex AS (SELECT query_id, w FROM (
           SELECT query_id, w, row_number() OVER (PARTITION BY query_id ORDER BY w9 DESC, w) AS rn
           FROM wt) WHERE rn <= 3),
       qt2 AS (SELECT DISTINCT query_id, w FROM (
           SELECT query_id, w FROM qt1 UNION ALL SELECT query_id, w FROM ex)),
       ${bm25RoundCtes("qt2", "r2")}
       SELECT query_id, rank, doc_id,
         round(CAST(s9 AS DOUBLE) / 1000000000.0, 6) AS score
       FROM r2r WHERE rank <= 15"""

  // --- x188: maintained SCD2 dimension-history store ------------------------
  // x91's history as a persisted store fed day by day — with the days
  // sliced by event_id % 3, so every append delivers LATE changes that
  // re-thread existing interval chains (the hard case). Affected keys
  // rebuild from their pruned buckets; a day-1 replay must leave the
  // store row-identical. Oracle = the one-shot batch build (x91).
  /** The purchase-feed change rows shared by the SCD2 store gates. */
  private def scd2Feed(spark: SparkSession, dir: String): DataFrame =
    ProtoStores.df(dir, "scd2feed") {
      val ev = t(spark, dir, "events")
      ev.filter(col("event_type") === "purchase")
        .withColumn("ts_us", Events.epochMicros(ev))
        .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
    }

  /** The x188 3-day SCD2 store as a build-once prototype (d1 replay +
    * row accounting ride the build) — shared by x188 (reads it), x190
    * and x217 (clone it, then forget).
    */
  private def scd2Proto(spark: SparkSession, dir: String): String =
    ProtoStores.proto(dir, "scd2store") { root =>
      import graft.ext.Scd2Store
      val feed = scd2Feed(spark, dir)
      def day(d: Int) = feed.filter(pmod(col("event_id"), lit(3L)) === d.toLong)
      (0 until 3).foreach { d =>
        Scd2Store.appendDay(spark, root, day(d),
          "user_id", "ts_us", "event_id", Seq("value"))
      }
      val before = graft.sources.ManifestStore.read(spark, root).count()
      Scd2Store.appendDay(spark, root, day(1),
        "user_id", "ts_us", "event_id", Seq("value")) // replay: replace
      val after = graft.sources.ManifestStore.read(spark, root).count()
      require(after == before,
        s"x188: replay changed the store ($before -> $after rows)")
    }

  def x188Scd2Store(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Scd2Store.history(spark, scd2Proto(spark, dir))

  val x188Sql: String = x91Sql

  // --- x189: STREAMING SCD2 store maintenance (≡ x188 ≡ x91) ----------------
  // The dimension-history store joins the streaming matrix: the change
  // feed drains through foreachBatch appendDay one day per micro-batch,
  // one day re-delivered post-drain with row accounting, and the final
  // history is the batch build through the streaming door.
  def x189StreamScd2(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import graft.ext.Scd2Store
    val ev = t(spark, dir, "events")
    val feed = Dedup.materialize(ev.filter(col("event_type") === "purchase")
      .withColumn("ts_us", Events.epochMicros(ev))
      .withColumn("day", pmod(col("event_id"), lit(3L)))
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"),
        col("day")))
    val table = FreshTables.next(spark, dir, "sscd2store")
    val base = FreshTables.next(spark, dir, "sscd2in")
    (0 until 3).foreach { d =>
      feed.filter(col("day") === d.toLong).repartition(1)
        .write.mode("append").parquet(s"$base/in")
    }
    val stream = spark.readStream.schema(feed.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Scd2Store.appendDay(spark, table, batch.drop("day"),
          "user_id", "ts_us", "event_id", Seq("value"))
        ()
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      if (!q.awaitTermination(300000))
        throw new RuntimeException("x189: drain timeout")
    } finally q.stop()
    val before = graft.sources.ManifestStore.read(spark, table).count()
    Scd2Store.appendDay(spark, table, feed.filter(col("day") === 1L),
      "user_id", "ts_us", "event_id", Seq("value"))
    val after = graft.sources.ManifestStore.read(spark, table).count()
    require(after == before,
      s"x189: replay changed the store ($before -> $after rows)")
    Scd2Store.history(spark, table)
  }

  val x189Sql: String = x91Sql

  // --- x190: SCD2 store forget (whole-key + change-level) -------------------
  // The forget matrix closes over the dimension store: doomed KEYS
  // vanish in one pruned delete commit, doomed individual CHANGES
  // re-thread their survivors' interval chains (predecessor re-opens
  // onto successor, versions renumber) via the affected-key rebuild.
  // Both re-run idempotently (the crash-recovery path); oracle = x91
  // over the surviving change rows.
  def x190Scd2Forget(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.Scd2Store
    val feed = scd2Feed(spark, dir)
    val root = FreshTables.next(spark, dir, "scd2forget")
    ProtoStores.cloneTo(spark, scd2Proto(spark, dir), root)
    val doomedKeys = feed.filter(col("user_id") % 7 === 3)
    val doomedChanges = feed.filter(col("event_id") % 13 === 5)
    require(doomedKeys.count() > 0 && doomedChanges.count() > 0,
      "x190: empty doomed slice")
    def runForgets(): Unit = {
      Scd2Store.forget(spark, root, doomedKeys, "user_id")
      Scd2Store.forgetChanges(spark, root, doomedChanges,
        "user_id", "event_id", "ts_us", Seq("value"))
    }
    runForgets()
    val rows = graft.sources.ManifestStore.read(spark, root)
    require(rows.filter(col("user_id") % 7 === 3).count() == 0L,
      "x190: doomed keys survived")
    require(rows.filter(col("__seq") % 13 === 5).count() == 0L,
      "x190: doomed changes survived")
    runForgets() // idempotent re-run — the recovery path
    Scd2Store.history(spark, root)
  }

  val x190Sql: String = {
    val anchor = "WHERE event_type = 'purchase'"
    require(x91Sql.contains(anchor), "x190: x91Sql anchor moved")
    x91Sql.replace(anchor,
      anchor + " AND user_id % 7 <> 3 AND event_id % 13 <> 5")
  }

  // --- x191: aspect-ratio bucketing + budgeted batch packing ----------------
  // The multimodal batch shaper (SDXL-style public recipe) over the
  // stubbed decode: snap each media row to the nearest ladder ratio via
  // explicit midpoint boundaries (no argmin, no ties — the same IEEE
  // comparisons in both engines), then pack each bucket into <= 20000-
  // byte batches by exclusive-prefix-cost div budget in id order. The
  // decode stub's dims are deterministic functions of the byte length,
  // so the WHOLE pipeline — mapPartitions decode included — oracles.
  def x191AspectBatches(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = t(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id").as("media_id"), col("text").cast("binary").as("blob"))
      .as[Multimodal.MediaBlob]
    val feats = Multimodal.decodeStub(media).toDF()
    Multimodal.aspectBatches(feats, "media_id", "width", "height", "byte_len",
      ladder = x191Ladder, budgetCost = 20000L)
  }

  private val x191Ladder = Seq(0.5, 0.75, 1.0, 4.0 / 3.0, 2.0)

  val x191Sql: String = {
    val mids = x191Ladder.sliding(2).collect { case Seq(a, b) => (a + b) / 2.0d }.toSeq
    val cases = mids.zip(x191Ladder)
      .map { case (m, b) => s"WHEN ratio < $m THEN CAST($b AS DOUBLE)" }
      .mkString("\n           ")
    s"""WITH m AS (SELECT doc_id AS media_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS len
       FROM documents WHERE text IS NOT NULL),
       d AS (SELECT media_id, len,
           CAST(len % 640 + 1 AS DOUBLE) / CAST(len % 480 + 1 AS DOUBLE) AS ratio
         FROM m),
       b AS (SELECT media_id, len,
           CASE $cases
           ELSE CAST(${x191Ladder.last} AS DOUBLE) END AS ratio_bucket
         FROM d),
       c AS (SELECT media_id, ratio_bucket, len,
           coalesce(sum(len) OVER (PARTITION BY ratio_bucket ORDER BY media_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         FROM b)
       SELECT media_id, ratio_bucket, CAST(len AS BIGINT) AS cost,
         CAST(cum // 20000 AS BIGINT) AS batch_seq
       FROM c"""
  }

  // --- x192: store-fed KMV source-overlap (zero-pass read) ------------------
  // x182's pair algebra fed from the MAINTAINED x148-style store: the
  // day-sliced bigram feed folds into per-(source, day) min arrays, and
  // the overlap matrix reads O(sources × days × k) sketch state — no
  // token pass at all at question time. Store merge ≡ batch sketch
  // bit-for-bit (the kmvAppendDay law), so the oracle is x182's.
  def x192KmvOverlapStore(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ws = t(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "w")))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bg = Dedup.materialize(ws.withColumn("__w1", lead(col("w"), 1).over(byDoc))
      .filter(col("__w1").isNotNull)
      .select(col("source"), concat_ws(" ", col("w"), col("__w1")).as("bg"),
        pmod(col("doc_id"), lit(3L)).as("day")))
    val table = FreshTables.next(spark, dir, "kmvoverlap")
    (0 until 3).foreach { d =>
      Sketches.kmvAppendDay(spark, bg.filter(col("day") === d.toLong),
        "source", "bg", s"d$d", table, k = 64)
    }
    Sketches.kmvOverlap(
      Sketches.kmvMinsFromStore(spark, table, "source", k = 64), "source")
  }

  val x192Sql: String = x182Sql

  // --- x193: personalized PageRank seed expansion ---------------------------
  // Rank the near-dup pair graph by relatedness to a seed set (teleport
  // returns to the seeds, not uniform) — the model-free corpus-expansion
  // primitive. Exact 1e-9 fixed-point integer arithmetic throughout
  // (x85's discipline), 3 rounds unrolled in the oracle.
  def x193PprExpand(spark: SparkSession, dir: String): DataFrame =
    Graph.pagerankFrom(
      allPairs(spark, dir),
      "id_a", "id_b", "doc_id",
      t(spark, dir, "documents").select(col("doc_id"))
        .filter(col("doc_id") % 2 === 0),
      "doc_id", iters = 3)

  private def pprCtes(iters: Int): String =
    (1 to iters).map { i =>
      s"""m$i AS (SELECT ud.v, CAST(sum(r${i - 1}.r // ud.deg) AS BIGINT) AS s
           FROM ud JOIN r${i - 1} USING (u) GROUP BY 1),
         r$i AS (SELECT deg.u,
             CASE WHEN deg.is_seed THEN 15000000000 // (100 * ns) ELSE 0 END
               + (85 * coalesce(s, 0)) // 100 AS r
           FROM deg LEFT JOIN m$i ON m$i.v = deg.u CROSS JOIN ns)"""
    }.mkString(",\n       ")

  val x193Sql: String =
    s"""WITH ${jaccardCtes(3)},
       e AS (SELECT id_a, id_b
         FROM inter JOIN sizes na ON na.doc_id = id_a
         JOIN sizes nb ON nb.doc_id = id_b
         WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.7),
       und AS (SELECT id_a AS u, id_b AS v FROM e
               UNION ALL SELECT id_b, id_a FROM e),
       deg0 AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY 1),
       deg AS (SELECT u, deg, (u % 2 = 0) AS is_seed FROM deg0),
       ns AS (SELECT CAST(count(*) AS BIGINT) AS ns FROM deg WHERE is_seed),
       ud AS (SELECT und.u, und.v, deg.deg FROM und JOIN deg USING (u)),
       r0 AS (SELECT u, CASE WHEN is_seed THEN 1000000000 // ns ELSE 0 END AS r
         FROM deg CROSS JOIN ns),
       ${pprCtes(3)}
       SELECT deg.u AS doc_id, deg.deg AS deg, r3.r AS rank9, deg.is_seed AS is_seed
       FROM r3 JOIN deg USING (u)"""

  // --- x194: ε-DP quantile (exponential mechanism) --------------------------
  // DP median doc length per source, selecting over the DATA-INDEPENDENT
  // integer domain [0, 100000] (a data-dependent support is not ε-DP —
  // removing a value's only holder zeroes its probability): the domain
  // compresses into runs sharing (below, eq), utility = negative rank
  // distance, per-integer weights 1e-9 fixed-point, seeded integer draw
  // + in-run integer division — both engines select the identical value.
  def x194DpQuantile(spark: SparkSession, dir: String): DataFrame =
    Privacy.dpQuantile(t(spark, dir, "documents"), "source", "n_chars",
      q = 0.5, epsilon = 0.1, seed = DpFixtureSeed, lo = 0L, hi = 100000L)

  val x194Sql: String =
    s"""WITH c AS (SELECT source AS g,
           least(greatest(CAST(n_chars AS BIGINT), 0), 100000) AS v,
           CAST(count(*) AS BIGINT) AS cnt
         FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL GROUP BY 1, 2),
       r AS (SELECT g, v, cnt,
           coalesce(sum(cnt) OVER (PARTITION BY g ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
           coalesce(lead(v) OVER (PARTITION BY g ORDER BY v), 100001) AS next_v,
           sum(cnt) OVER (PARTITION BY g) AS n
         FROM c),
       runs AS (
         SELECT g, v AS start, CAST(1 AS BIGINT) AS width, below, cnt AS eq, n FROM r
         UNION ALL
         SELECT g, v + 1, next_v - v - 1, below + cnt, 0, n FROM r WHERE next_v - v - 1 > 0
         UNION ALL
         SELECT g, 0, v, 0, 0, n FROM r WHERE below = 0 AND v > 0),
       wt AS (SELECT g, start, width,
           CAST(round(exp(-0.1 / 4.0 * greatest(
             CAST(below AS DOUBLE) - 0.5 * CAST(n AS DOUBLE),
             0.5 * CAST(n AS DOUBLE) - CAST(below + eq AS DOUBLE),
             0.0)) * 1000000000.0) AS BIGINT) AS w19
         FROM runs),
       cum AS (SELECT g, start, w19, width * w19 AS rw,
           sum(width * w19) OVER (PARTITION BY g ORDER BY start
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
           sum(width * w19) OVER (PARTITION BY g) AS tw
         FROM wt),
       dr AS (SELECT g, start, w19, rw, cw,
           CAST(floor(((${duckHex48(s"md5('$DpFixtureSeed' || '|' || g)")}
             + 0.5) / 281474976710656.0) * CAST(tw AS DOUBLE)) AS BIGINT) AS draw
         FROM cum)
       SELECT g AS source,
         CAST(min_by(CASE WHEN w19 > 0 THEN start + (draw - (cw - rw)) // w19
                          ELSE start END, start) AS BIGINT) AS dp_quantile
       FROM dr WHERE cw > draw GROUP BY 1"""

  // --- x195: maintained weighted-sample store (A-Res joins the store matrix)
  // x39's Efraimidis-Spirakis sample as a day-over-day store: per-day
  // top-(k+slack) priority summaries merge losslessly (any global
  // k-largest priority is within its own day's k largest), day replay
  // replaces, and the slack buys exact-after-forget headroom. The gate
  // appends 3 hash-split days, replays one (row accounting), forgets
  // the global top-8 (erasure requests for the most prominent
  // samples — within slack), and reads the top-100: the oracle ranks
  // the full corpus, skips the 8 doomed, and re-ranks.
  def x195SampleStore(spark: SparkSession, dir: String): DataFrame = {
    val docs = Dedup.materialize(t(spark, dir, "documents")
      .select(col("doc_id"), TextAnalysis.wordCount(col("text")).as("wc"))
      .withColumn("day", pmod(col("doc_id"), lit(3)).cast("long")))
    val table = FreshTables.next(spark, dir, "samplestore")
    (0 until 3).foreach { b =>
      SampleStore.appendDay(spark, docs.filter(col("day") === b.toLong),
        "doc_id", col("wc"), s"d$b", k = 100, slack = 8, table = table)
    }
    // replay day 1: the (key, day) merge must REPLACE its rows
    SampleStore.appendDay(spark, docs.filter(col("day") === 1L),
      "doc_id", col("wc"), "d1", k = 100, slack = 8, table = table)
    val stored = graft.sources.ManifestStore.read(spark, table).count()
    val expected = docs.groupBy(col("day")).agg(count(lit(1)).as("n"))
      .agg(sum(least(col("n"), lit(108L)))).head().getLong(0)
    require(stored == expected,
      s"x195: store holds $stored sample rows, expected $expected — " +
        "the d1 replay duplicated instead of replacing")
    val doomed = SampleStore.sampleFromStore(spark, table, "doc_id", 8)
      .select(col("doc_id"))
    SampleStore.forget(spark, table, "doc_id", doomed, forgetSeq = 1L)
    SampleStore.sampleFromStore(spark, table, "doc_id", 100)
  }

  val x195Sql: String =
    s"""WITH w AS (SELECT doc_id,
         len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS wc,
         md5(CAST(doc_id AS VARCHAR)) AS hx
       FROM documents),
       h AS (SELECT doc_id, wc, ${duckHex48("hx")} AS h48 FROM w),
       k AS (SELECT doc_id,
             round(ln((CAST(h48 AS DOUBLE) + 0.5) / 281474976710656.0)
                   / greatest(CAST(wc AS DOUBLE), 1.0), 6) AS es_key FROM h),
       r AS (SELECT doc_id, es_key,
             row_number() OVER (ORDER BY es_key DESC, doc_id) AS rn FROM k),
       s AS (SELECT doc_id, es_key,
             row_number() OVER (ORDER BY es_key DESC, doc_id) AS rn2
         FROM r WHERE rn > 8)
       SELECT doc_id, CAST(rn2 AS BIGINT) AS sample_rank, es_key
       FROM s WHERE rn2 <= 100"""

  // --- x196: STREAMING sample-store maintenance ------------------------------
  // x195's store fed by a STREAM (the x161/x162 door): document days
  // arrive as micro-batches, each folded by SampleStore.appendDay in
  // foreachBatch; one day re-delivered post-drain with row accounting.
  // Day summaries merge losslessly, so the stream-fed store read is
  // the batch A-Res sample — x39's oracle verbatim.
  def x196StreamSample(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val docs = Dedup.materialize(t(spark, dir, "documents")
      .select(col("doc_id"), TextAnalysis.wordCount(col("text")).as("wc"))
      .withColumn("day", pmod(col("doc_id"), lit(3)).cast("long")))
    val table = FreshTables.next(spark, dir, "ssamplestore")
    val base = FreshTables.next(spark, dir, "ssamplein")
    (0 until 3).foreach { b =>
      docs.filter(col("day") === b.toLong).repartition(1)
        .write.mode("append").parquet(s"$base/in")
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val d = batch.agg(min(col("day"))).head().getLong(0)
        SampleStore.appendDay(spark, batch, "doc_id", col("wc"),
          s"d$d", k = 100, slack = 8, table = table)
        ()
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      if (!q.awaitTermination(300000))
        throw new RuntimeException("x196: drain timeout")
    } finally q.stop()
    // at-least-once: re-deliver day 1 — the (key, day) merge replaces
    SampleStore.appendDay(spark, docs.filter(col("day") === 1L),
      "doc_id", col("wc"), "d1", k = 100, slack = 8, table = table)
    val stored = graft.sources.ManifestStore.read(spark, table).count()
    val expected = docs.groupBy(col("day")).agg(count(lit(1)).as("n"))
      .agg(sum(least(col("n"), lit(108L)))).head().getLong(0)
    require(stored == expected,
      s"x196: store holds $stored sample rows, expected $expected — " +
        "the d1 replay duplicated instead of replacing")
    SampleStore.sampleFromStore(spark, table, "doc_id", 100)
  }

  // the stream-fed store read IS the batch sample (priority summaries
  // merge losslessly), so the oracle is x39's
  val x196Sql: String = x39Sql

  // --- x197: dominant-direction projection (all-but-the-top audit) ----------
  // The spectral primitive of Mu & Viswanath 2018's embedding fix, in
  // the x85 exact-integer discipline: quantized shifted inputs,
  // integral-div centering, 3 power-iteration rounds with
  // sign*(abs*SCALE div max) normalization — the oracle unrolls every
  // round bit-for-bit. Output: per-id exact-integer projection onto
  // the dominant direction (the anisotropy magnitude all-but-the-top
  // removes; extreme |proj| rows are the common-direction outliers).
  def x197DominantProj(spark: SparkSession, dir: String): DataFrame =
    graft.ext.EmbedPost.dominantProjection(
      spark, t(spark, dir, "embeddings"), "vec_id", "embedding",
      dim = 64, iters = 3)

  // one power round: s from the previous direction, normalize, push
  // through c, normalize — CTE suffix r; prev is the previous x CTE
  // (pos, x)
  private def pirRound(r: Int, prev: String): String =
    s"""s$r AS (SELECT c.vec_id, CAST(sum(c.c * p.x) AS BIGINT) AS s
         FROM c JOIN $prev p USING (pos) GROUP BY 1),
       m$r AS (SELECT greatest(CAST(max(abs(s)) // 10000 AS BIGINT), 1) AS m FROM s$r),
       n$r AS (SELECT vec_id,
           CAST(sign(s) AS BIGINT) * CAST(abs(s) // m AS BIGINT) AS sn
         FROM s$r, m$r),
       y$r AS (SELECT c.pos, CAST(sum(c.c * n.sn) AS BIGINT) AS y
         FROM c JOIN n$r n USING (vec_id) GROUP BY 1),
       w$r AS (SELECT greatest(CAST(max(abs(y)) // 10000 AS BIGINT), 1) AS m FROM y$r),
       x$r AS (SELECT pos,
           CAST(sign(y) AS BIGINT) * CAST(abs(y) // m AS BIGINT) AS x
         FROM y$r, w$r)"""

  val x197Sql: String =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
       e AS (SELECT vec_id, i AS pos,
           CAST(round(ve[i + 1] * 1000000.0) AS BIGINT) + 1000000 AS vq
         FROM v, unnest(range(0, 64)) AS u(i)),
       mu AS (SELECT pos, CAST(sum(vq) // count(*) AS BIGINT) AS mu
         FROM e GROUP BY 1),
       c AS (SELECT vec_id, pos, vq - mu AS c FROM e JOIN mu USING (pos)),
       x0 AS (SELECT i AS pos, CAST(10000 AS BIGINT) AS x
         FROM unnest(range(0, 64)) AS u(i)),
       ${pirRound(1, "x0")},
       ${pirRound(2, "x1")},
       ${pirRound(3, "x2")}
       SELECT c.vec_id, CAST(sum(c.c * p.x) AS BIGINT) AS proj
       FROM c JOIN x3 p USING (pos) GROUP BY 1"""

  // --- x198: pairwise mutual-information column profile ----------------------
  // fdProfile's association complement, fused into the SAME one-scan
  // grouping-sets Expand: MI/NMI for (lang, source), (lang,
  // len_bucket), (source, len_bucket) over documents — the leakage /
  // redundant-metadata panel. Exact counts, 1e-9 fixed-point ln terms
  // summed order-free, NMI one division of two exact sums.
  def x198MiProfile(spark: SparkSession, dir: String): DataFrame =
    Profiling.miProfile(
      t(spark, dir, "documents")
        .withColumn("len_bucket", expr("n_chars div 256L")),
      Seq(("lang", "source"), ("lang", "len_bucket"), ("source", "len_bucket")))

  // one pair's CTE chain + final row; a/b must be canonical (a < b)
  private def miPairSql(tag: String, a: String, b: String): String =
    s"""j$tag AS (SELECT $a AS va, $b AS vb, CAST(count(*) AS BIGINT) AS c
         FROM base GROUP BY 1, 2),
       ma$tag AS (SELECT va, CAST(sum(c) AS BIGINT) AS na FROM j$tag GROUP BY 1),
       mb$tag AS (SELECT vb, CAST(sum(c) AS BIGINT) AS nb FROM j$tag GROUP BY 1),
       t$tag AS (SELECT CAST(sum(c) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS cells FROM j$tag),
       mi$tag AS (SELECT t.n, t.cells,
           CAST(sum(CAST(round((CAST(j.c AS DOUBLE) / CAST(t.n AS DOUBLE))
             * ln((CAST(t.n AS DOUBLE) * CAST(j.c AS DOUBLE))
                  / (CAST(ma.na AS DOUBLE) * CAST(mb.nb AS DOUBLE)))
             * 1000000000.0) AS BIGINT)) AS BIGINT) AS mi9
         FROM j$tag j
         JOIN ma$tag ma ON j.va IS NOT DISTINCT FROM ma.va
         JOIN mb$tag mb ON j.vb IS NOT DISTINCT FROM mb.vb, t$tag t
         GROUP BY 1, 2),
       ha$tag AS (SELECT CAST(coalesce(sum(CAST(round(
             (CAST(na AS DOUBLE) / CAST(t.n AS DOUBLE))
             * ln(CAST(na AS DOUBLE) / CAST(t.n AS DOUBLE))
             * 1000000000.0) AS BIGINT)), 0) AS BIGINT) AS h9
         FROM ma$tag, t$tag t),
       hb$tag AS (SELECT CAST(coalesce(sum(CAST(round(
             (CAST(nb AS DOUBLE) / CAST(t.n AS DOUBLE))
             * ln(CAST(nb AS DOUBLE) / CAST(t.n AS DOUBLE))
             * 1000000000.0) AS BIGINT)), 0) AS BIGINT) AS h9
         FROM mb$tag, t$tag t),
       r$tag AS (SELECT '$a' AS col_a, '$b' AS col_b, mi.n AS n_rows,
           mi.cells AS n_cells,
           round(CAST(mi.mi9 AS DOUBLE) / 1000000000.0, 6) AS mi,
           CASE WHEN -ha.h9 <= 0 OR -hb.h9 <= 0 THEN 0.0
                ELSE round(CAST(mi.mi9 AS DOUBLE)
                  / CAST(least(-ha.h9, -hb.h9) AS DOUBLE), 6) END AS nmi
         FROM mi$tag mi, ha$tag ha, hb$tag hb)"""

  val x198Sql: String =
    s"""WITH base AS (SELECT lang, source, n_chars // 256 AS len_bucket
         FROM documents),
       ${miPairSql("LS", "lang", "source")},
       ${miPairSql("LB", "lang", "len_bucket")},
       ${miPairSql("SB", "len_bucket", "source")}
       SELECT * FROM rLS UNION ALL SELECT * FROM rLB UNION ALL SELECT * FROM rSB"""

  // --- x199: maintained embedding-moment store -------------------------------
  // The spectral family joins the store matrix: per-day exact quantized
  // first/second moments (mergeable by SUM — the centered Gram derives
  // at read via the integral-div mean, bit-identical however history
  // was sliced), then a corpus-free dense power iteration on the
  // O(dim^2) collected matrix. Three day appends + a replay (cell
  // accounting), direction out; the oracle rebuilds the moments and
  // unrolls the matrix rounds.
  def x199MomentStore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Dedup.materialize(t(spark, dir, "embeddings")
      .withColumn("day", pmod(col("vec_id"), lit(3)).cast("long")))
    val table = FreshTables.next(spark, dir, "momstore")
    (0 until 3).foreach { b =>
      graft.ext.EmbedPost.momentsAppendDay(spark,
        emb.filter(col("day") === b.toLong), "embedding", 64, s"d$b", table)
    }
    // replay day 1: the day-keyed merges must REPLACE their rows
    graft.ext.EmbedPost.momentsAppendDay(spark,
      emb.filter(col("day") === 1L), "embedding", 64, "d1", table)
    val m1Rows = graft.sources.ManifestStore.read(spark, s"$table/m1").count()
    val m2Rows = graft.sources.ManifestStore.read(spark, s"$table/m2").count()
    require(m1Rows == 64L * 3 && m2Rows == 2080L * 3,
      s"x199: store holds $m1Rows m1 / $m2Rows m2 rows, expected 192/6240 — " +
        "the d1 replay duplicated instead of replacing")
    val x = graft.ext.EmbedPost.directionFromMoments(spark, table, 64, iters = 3)
    x.zipWithIndex.map { case (c, p) => (p, c) }.toSeq
      .toDF("pos", "comp")
  }

  // shared x199/x205/x211/x214 oracle CTEs: moments -> centered Gram ->
  // shrink -> 3 dense power rounds, over an optionally-filtered
  // embeddings base; x214 appends a projection over held-out rows
  private def momentsSql(where: String): String =
    s"""WITH ${momentsCtes(where)}
       SELECT CAST(pos AS INTEGER) AS pos, x AS comp FROM x3"""

  private def momentsCtes(where: String): String =
    s"""v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve
         FROM embeddings $where),
       e AS (SELECT vec_id, i AS pos,
           CAST(round(ve[i + 1] * 1000000.0) AS BIGINT) + 1000000 AS vq
         FROM v, unnest(range(0, 64)) AS u(i)),
       m1 AS (SELECT pos, CAST(sum(vq) AS BIGINT) AS sv,
           CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1),
       m2 AS (SELECT a.pos AS i, b.pos AS j, CAST(sum(a.vq * b.vq) AS BIGINT) AS svv
         FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.pos <= b.pos
         GROUP BY 1, 2),
       mu AS (SELECT pos, CAST(sv // n AS BIGINT) AS mu, sv, n FROM m1),
       g0 AS (SELECT m2.i, m2.j,
           CAST(m2.svv - a.mu * b.sv - b.mu * a.sv + a.n * a.mu * b.mu AS BIGINT) AS g
         FROM m2 JOIN mu a ON m2.i = a.pos JOIN mu b ON m2.j = b.pos),
       g AS (SELECT i, j, g FROM g0
         UNION ALL SELECT j AS i, i AS j, g FROM g0 WHERE i <> j),
       dg AS (SELECT greatest(CAST(max(abs(g)) // 32768 AS BIGINT), 1) AS d FROM g),
       gn AS (SELECT i, j, CAST(g // d AS BIGINT) AS g FROM g, dg),
       x0 AS (SELECT i AS pos, CAST(10000 AS BIGINT) AS x
         FROM unnest(range(0, 64)) AS u(i)),
       ${momRound(1, "x0")},
       ${momRound(2, "x1")},
       ${momRound(3, "x2")}"""

  // one dense matrix power round (prev -> x$r over gn)
  private def momRound(r: Int, prev: String): String =
    s"""y$r AS (SELECT gn.i AS pos, CAST(sum(gn.g * p.x) AS BIGINT) AS y
         FROM gn JOIN $prev p ON gn.j = p.pos GROUP BY 1),
       w$r AS (SELECT greatest(CAST(max(abs(y)) // 10000 AS BIGINT), 1) AS m FROM y$r),
       x$r AS (SELECT pos,
           CAST(sign(y) AS BIGINT) * CAST(abs(y) // m AS BIGINT) AS x
         FROM y$r, w$r)"""

  val x199Sql: String = momentsSql("")

  // --- x200: STREAMING moment-store maintenance ------------------------------
  // x199 through the streaming door (the x161/x162/x196 pattern):
  // embedding days arrive as micro-batches, each folded by
  // momentsAppendDay in foreachBatch; one day re-delivered post-drain
  // with cell accounting. Moments merge by SUM, so the stream-fed
  // direction is x199's oracle verbatim.
  def x200StreamMoments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val emb = Dedup.materialize(t(spark, dir, "embeddings")
      .withColumn("day", pmod(col("vec_id"), lit(3)).cast("long")))
    val table = FreshTables.next(spark, dir, "smomstore")
    val base = FreshTables.next(spark, dir, "smomin")
    (0 until 3).foreach { b =>
      emb.filter(col("day") === b.toLong).repartition(1)
        .write.mode("append").parquet(s"$base/in")
    }
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val d = batch.agg(min(col("day"))).head().getLong(0)
        graft.ext.EmbedPost.momentsAppendDay(spark, batch, "embedding", 64,
          s"d$d", table)
        ()
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      if (!q.awaitTermination(300000))
        throw new RuntimeException("x200: drain timeout")
    } finally q.stop()
    // at-least-once: re-deliver day 1 — the day-keyed merges replace
    graft.ext.EmbedPost.momentsAppendDay(spark,
      emb.filter(col("day") === 1L), "embedding", 64, "d1", table)
    val m2Rows = graft.sources.ManifestStore.read(spark, s"$table/m2").count()
    require(m2Rows == 2080L * 3,
      s"x200: store holds $m2Rows m2 rows, expected 6240 — " +
        "the d1 replay duplicated instead of replacing")
    val x = graft.ext.EmbedPost.directionFromMoments(spark, table, 64, iters = 3)
    x.zipWithIndex.map { case (c, p) => (p, c) }.toSeq
      .toDF("pos", "comp")
  }

  // moments merge by SUM, so the stream-fed store read is x199's
  val x200Sql: String = x199Sql

  // --- x201: tokenizer APPLICATION (learned BPE over held-out docs) ---------
  // The production pass x100's trainer exists for: learn 8 merges on
  // the even-doc_id half, tokenize the odd half (unseen words included)
  // — per-doc word/token counts. Application is the trainer's own
  // space-padded replace chain (Java String.replace ≡ UTF8String ≡
  // DuckDB replace), one nested projection over the test vocabulary;
  // the oracle replays learning (x100's CTEs, 8 rounds) and the chain.
  def x201BpeTokenize(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val merges = graft.ext.Bpe
      .learnMerges(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", rounds = 8)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    graft.ext.Bpe.tokenize(
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", merges)
  }

  // one learning round over the train vocab (s0 seeded below)
  private def bpeLearnRound(r: Int): String =
    s"""i${r - 1} AS (SELECT cnt, l, unnest(generate_series(1, len(l) - 1)) AS i
         FROM (SELECT cnt, string_split(seq, ' ') AS l FROM s${r - 1})),
       p$r AS (SELECT l[i] AS a, l[i+1] AS b, CAST(sum(cnt) AS BIGINT) AS pc
         FROM i${r - 1} GROUP BY 1, 2),
       m$r AS (SELECT a, b, pc FROM p$r ORDER BY pc DESC, a, b LIMIT 1),
       s$r AS (SELECT s.w, s.cnt,
           trim(replace(' ' || s.seq || ' ',
             ' ' || m$r.a || ' ' || m$r.b || ' ',
             ' ' || m$r.a || m$r.b || ' ')) AS seq
         FROM s${r - 1} s CROSS JOIN m$r)"""

  // one application step of merge r on the test vocab encodings
  private def bpeApplyStep(r: Int): String =
    s"""tenc$r AS (SELECT w,
         replace(seq, ' ' || m$r.a || ' ' || m$r.b || ' ',
           ' ' || m$r.a || m$r.b || ' ') AS seq
       FROM tenc${r - 1} CROSS JOIN m$r)"""

  val x201Sql: String =
    s"""WITH toks AS (SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS w
       FROM documents WHERE doc_id % 2 = 0),
       vocab AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY 1),
       s0 AS (SELECT w, cnt, trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS seq FROM vocab),
       ${(1 to 8).map(bpeLearnRound).mkString(",\n       ")},
       ttoks AS (SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS w
       FROM documents WHERE doc_id % 2 = 1),
       tvocab AS (SELECT DISTINCT w FROM ttoks),
       tenc0 AS (SELECT w,
           ' ' || trim(regexp_replace(w, '(.)', '\\1 ', 'g')) || ' ' AS seq
         FROM tvocab),
       ${(1 to 8).map(bpeApplyStep).mkString(",\n       ")},
       tcount AS (SELECT w,
           CAST(len(string_split(trim(seq), ' ')) AS BIGINT) AS toks
         FROM tenc8)
       SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(c.toks) AS BIGINT) AS n_tokens
       FROM ttoks t JOIN tcount c USING (w) GROUP BY 1"""

  // --- x202: maintained BPE vocabulary store ---------------------------------
  // The trainer's corpus pass as a day-keyed store: word counts SUM
  // across days (losslessly — a count is insensitive to slicing), so
  // learnMergesFromStore trains with NO corpus rescan. 3 day appends +
  // a replay (row accounting), 2 merges out — x100's oracle verbatim.
  def x202VocabStore(spark: SparkSession, dir: String): DataFrame = {
    val docs = Dedup.materialize(t(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .withColumn("day", pmod(col("doc_id"), lit(3)).cast("long")))
    val table = FreshTables.next(spark, dir, "vocabstore")
    (0 until 3).foreach { b =>
      graft.ext.Bpe.vocabAppendDay(spark,
        docs.filter(col("day") === b.toLong), "doc_id", "text", s"d$b", table)
    }
    // replay day 1: the (w, day) merge must REPLACE its rows
    graft.ext.Bpe.vocabAppendDay(spark,
      docs.filter(col("day") === 1L), "doc_id", "text", "d1", table)
    val stored = graft.sources.ManifestStore.read(spark, table).count()
    val expected = graft.ext.LangModel.tokenRows(docs, "doc_id", "text")
      .join(docs.select(col("doc_id").as("id"), col("day")), Seq("id"))
      .select(col("w"), col("day")).distinct().count()
    require(stored == expected,
      s"x202: store holds $stored vocab rows, expected $expected — " +
        "the d1 replay duplicated instead of replacing")
    graft.ext.Bpe.learnMergesFromStore(spark, table, rounds = 2)
  }

  // day word counts sum losslessly, so training from the store is the
  // batch trainer — x100's oracle verbatim
  val x202Sql: String = x100Sql

  // --- x203: STREAMING vocabulary-store maintenance --------------------------
  // x202 fed by a stream (the x161/x196/x200 door): document days
  // arrive as micro-batches, each folded by vocabAppendDay in
  // foreachBatch; one day re-delivered post-drain with row accounting.
  def x203StreamVocab(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val docs = Dedup.materialize(t(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .withColumn("day", pmod(col("doc_id"), lit(3)).cast("long")))
    val table = FreshTables.next(spark, dir, "svocabstore")
    val base = FreshTables.next(spark, dir, "svocabin")
    (0 until 3).foreach { b =>
      docs.filter(col("day") === b.toLong).repartition(1)
        .write.mode("append").parquet(s"$base/in")
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val d = batch.agg(min(col("day"))).head().getLong(0)
        graft.ext.Bpe.vocabAppendDay(spark, batch, "doc_id", "text",
          s"d$d", table)
        ()
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      if (!q.awaitTermination(300000))
        throw new RuntimeException("x203: drain timeout")
    } finally q.stop()
    // at-least-once: re-deliver day 1 — the (w, day) merge replaces
    graft.ext.Bpe.vocabAppendDay(spark,
      docs.filter(col("day") === 1L), "doc_id", "text", "d1", table)
    graft.ext.Bpe.learnMergesFromStore(spark, table, rounds = 2)
  }

  val x203Sql: String = x100Sql

  // --- x204: Zipf-law vocabulary-health fit ----------------------------------
  // OLS of ln(freq) on ln(rank) over each language's top-500 ranks —
  // slope ≈ -1 on natural text; boilerplate/synthetic corpora bend the
  // line. Exact ranks, 1e-6 fixed-point ln terms, exact LONG sums,
  // pinned-order double combinations.
  def x204ZipfFit(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.zipfFit(t(spark, dir, "documents"),
      "doc_id", "text", "lang", topK = 500)

  // --- x205: moment-store forget (the forget matrix reaches spectral) -------
  // Moments are exact sums, so erasure is SUBTRACTION: the doomed
  // vectors land as ONE negative correction day and the read-time sum
  // yields exactly the survivors' moments — the direction is
  // bit-identical to a from-scratch build over the surviving corpus,
  // which is what the oracle computes.
  def x205MomentForget(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Dedup.materialize(t(spark, dir, "embeddings")
      .withColumn("day", pmod(col("vec_id"), lit(3)).cast("long")))
    val table = FreshTables.next(spark, dir, "momforget")
    (0 until 3).foreach { b =>
      graft.ext.EmbedPost.momentsAppendDay(spark,
        emb.filter(col("day") === b.toLong), "embedding", 64, s"d$b", table)
    }
    // erasure: every 7th vector; re-issue the forget (tag replay) —
    // the tag-keyed merge must REPLACE, not double-subtract
    val doomed = emb.filter(col("vec_id") % 7 === 0)
    graft.ext.EmbedPost.momentsForget(spark, doomed, "embedding", 64, "f1", table)
    graft.ext.EmbedPost.momentsForget(spark, doomed, "embedding", 64, "f1", table)
    val x = graft.ext.EmbedPost.directionFromMoments(spark, table, 64, iters = 3)
    x.zipWithIndex.map { case (c, p) => (p, c) }.toSeq
      .toDF("pos", "comp")
  }

  val x205Sql: String = momentsSql("WHERE vec_id % 7 <> 0")

  // --- x206: Zipf fit FROM the maintained vocabulary store -------------------
  // x204's analysis fed by x202's store (grouped by lang): day folds
  // build the per-language vocabulary, the fit reads O(vocab) store
  // state with NO corpus pass at question time — counts sum
  // losslessly, so the oracle is x204's verbatim.
  def x206ZipfFromStore(spark: SparkSession, dir: String): DataFrame = {
    val docs = Dedup.materialize(t(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
      .withColumn("day", pmod(col("doc_id"), lit(3)).cast("long")))
    val table = FreshTables.next(spark, dir, "zipfvocab")
    (0 until 3).foreach { b =>
      graft.ext.Bpe.vocabAppendDay(spark, docs.filter(col("day") === b.toLong),
        "doc_id", "text", s"d$b", table, byCols = Seq("lang"))
    }
    // replay day 0: the (lang, w, day) merge must REPLACE its rows
    graft.ext.Bpe.vocabAppendDay(spark, docs.filter(col("day") === 0L),
      "doc_id", "text", "d0", table, byCols = Seq("lang"))
    TextAnalysis.zipfFitFromCounts(
      graft.ext.Bpe.vocabFromStore(spark, table, byCols = Seq("lang")),
      "lang", topK = 500)
  }

  val x204Sql: String =
    """WITH w AS (SELECT lang,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS w
       FROM documents),
       c AS (SELECT lang AS g, w, CAST(count(*) AS BIGINT) AS cnt
         FROM w GROUP BY 1, 2),
       r AS (SELECT g, cnt,
           row_number() OVER (PARTITION BY g ORDER BY cnt DESC, w) AS rnk
         FROM c QUALIFY rnk <= 500),
       t6 AS (SELECT g,
           CAST(round(ln(CAST(rnk AS DOUBLE)) * 1000000.0) AS BIGINT) AS x6,
           CAST(round(ln(CAST(cnt AS DOUBLE)) * 1000000.0) AS BIGINT) AS y6
         FROM r),
       s AS (SELECT g, CAST(count(*) AS BIGINT) AS n_ranks,
           CAST(sum(x6) AS BIGINT) AS sx, CAST(sum(y6) AS BIGINT) AS sy,
           CAST(sum(x6 * x6) AS BIGINT) AS sxx,
           CAST(sum(x6 * y6) AS BIGINT) AS sxy,
           CAST(sum(y6 * y6) AS BIGINT) AS syy
         FROM t6 GROUP BY 1),
       f AS (SELECT g, n_ranks,
           CAST(n_ranks AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
           CAST(n_ranks AS DOUBLE) * CAST(sxx AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den,
           CAST(n_ranks AS DOUBLE) * CAST(syy AS DOUBLE)
             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS den2,
           CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
         FROM s)
       SELECT g AS lang, n_ranks,
         CASE WHEN n_ranks >= 2 AND den <> 0.0
              THEN round(num / den, 6) END AS zipf_slope,
         CASE WHEN n_ranks >= 2 AND den <> 0.0
              THEN round((syd - (num / den) * sxd)
                / CAST(n_ranks AS DOUBLE) / 1000000.0, 6) END AS intercept,
         CASE WHEN n_ranks >= 2 AND den <> 0.0 AND den2 <> 0.0
              THEN round((num * num) / (den * den2), 6) END AS r2
       FROM f"""

  // vocabulary counts sum losslessly across days, so the store-fed fit
  // is x204's (must follow x204Sql: vals initialize in order)
  val x206Sql: String = x204Sql

  // --- x207: maintained bigram-LM store --------------------------------------
  // x58's reference model as a day-keyed store: the "known good" slice
  // (doc_id % 7 = 0) arrives in 3 day folds (+ a replay with row
  // accounting), then the WHOLE corpus scores against the store —
  // bigram counts sum and V is distinct-stored-unigrams, so the scores
  // are x58's oracle verbatim, with no reference rescan at question
  // time.
  def x207LmStore(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val ref = Dedup.materialize(docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("text"))
      .withColumn("day", pmod(col("doc_id"), lit(3)).cast("long")))
    val table = FreshTables.next(spark, dir, "lmstore")
    (0 until 3).foreach { b =>
      LangModel.lmAppendDay(spark, ref.filter(col("day") === b.toLong),
        "doc_id", "text", s"d$b", table)
    }
    // replay day 1: the (w1, w2, day) merge must REPLACE its rows
    LangModel.lmAppendDay(spark, ref.filter(col("day") === 1L),
      "doc_id", "text", "d1", table)
    val stored = graft.sources.ManifestStore.read(spark, s"$table/bg").count()
    val expected = LangModel.bigramRowsBy(ref, "doc_id", "text", Seq("day"))
      .select(col("w1"), col("w2"), col("day")).distinct().count()
    require(stored == expected,
      s"x207: store holds $stored bigram rows, expected $expected — " +
        "the d1 replay duplicated instead of replacing")
    LangModel.perplexityFromStore(spark, table, docs, "doc_id", "text")
  }

  val x207Sql: String = x58Sql

  // --- x208: STREAMING bigram-LM store maintenance ---------------------------
  // x207 fed by a stream: reference days arrive as micro-batches, each
  // folded by lmAppendDay in foreachBatch; one day re-delivered
  // post-drain. Scores ≡ x58's oracle through the streaming door.
  def x208StreamLm(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val docs = t(spark, dir, "documents")
    val ref = Dedup.materialize(docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("text"))
      .withColumn("day", pmod(col("doc_id"), lit(3)).cast("long")))
    val table = FreshTables.next(spark, dir, "slmstore")
    val base = FreshTables.next(spark, dir, "slmin")
    (0 until 3).foreach { b =>
      ref.filter(col("day") === b.toLong).repartition(1)
        .write.mode("append").parquet(s"$base/in")
    }
    val stream = spark.readStream.schema(ref.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val d = batch.agg(min(col("day"))).head().getLong(0)
        LangModel.lmAppendDay(spark, batch, "doc_id", "text", s"d$d", table)
        ()
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      if (!q.awaitTermination(300000))
        throw new RuntimeException("x208: drain timeout")
    } finally q.stop()
    // at-least-once: re-deliver day 1 — the day-keyed merges replace
    LangModel.lmAppendDay(spark, ref.filter(col("day") === 1L),
      "doc_id", "text", "d1", table)
    LangModel.perplexityFromStore(spark, table, docs, "doc_id", "text")
  }

  val x208Sql: String = x58Sql

  // --- x209: nDCG@10 retrieval-quality audit (IVF vs brute force) ------------
  // The position-sensitive sibling of x144's recall audit: graded gains
  // from the exact ranking (11 - rank), log2 discounts at approx
  // positions, 1e-9 fixed-point terms, one division per query. The
  // 0.6931... literal is Java's Math.log(2.0) rendered exactly so both
  // engines divide by the identical double.
  def x209NdcgAudit(spark: SparkSession, dir: String): DataFrame = {
    val data = t(spark, dir, "embeddings")
    val queries = data.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(data, queries,
      "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
    val cents = data.filter(col("vec_id") % 50 === 0)
    val assigned = Similarity.ivfAssign(data, cents, "vec_id", "embedding")
    val approx = Similarity.ivfTopK(assigned, cents, queries,
      "vec_id", "embedding", k = 10, nprobe = 3)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
    Retrieval.ndcgAtK(exact, approx, "neighbor_id", k = 10)
  }

  private def ndcgTerm(g: String, p: String): String =
    s"""CAST(round(CAST($g AS DOUBLE) * (1000000000.0
       / (ln(CAST($p AS DOUBLE) + 1.0) / 0.6931471805599453)), 0) AS BIGINT)"""

  val x209Sql: String =
    s"""WITH $ivfCtes,
       q AS (SELECT vec_id AS query_id, ve AS qv, nrm AS qn FROM n WHERE vec_id < 8),
       sce AS (SELECT q.query_id, c2.vec_id AS neighbor_id,
           list_sum(list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * c2.ve[i])) / (q.qn * c2.nrm) AS cos
         FROM n c2 JOIN q ON c2.vec_id <> q.query_id),
       rex AS (SELECT query_id, neighbor_id, rn FROM (
           SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
           FROM sce) WHERE rn <= 10),
       pr0 AS (SELECT q.query_id, c.centroid_id,
           list_sum(list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * c.cv[i])) / (q.qn * c.cn) AS sim
         FROM q CROSS JOIN c),
       pr AS (SELECT query_id, centroid_id FROM (
           SELECT query_id, centroid_id,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, centroid_id) AS rn
           FROM pr0) WHERE rn <= 3),
       sca AS (SELECT q.query_id, n.vec_id AS neighbor_id,
           list_sum(list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * n.ve[i])) / (q.qn * n.nrm) AS cos
         FROM n JOIN asg ON n.vec_id = asg.vec_id
         JOIN pr ON asg.centroid_id = pr.centroid_id
         JOIN q ON pr.query_id = q.query_id
         WHERE n.vec_id <> q.query_id),
       ra AS (SELECT query_id, neighbor_id, rn FROM (
           SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
           FROM sca) WHERE rn <= 10),
       rel AS (SELECT query_id, neighbor_id, 11 - rn AS g, rn AS er FROM rex),
       idcg AS (SELECT query_id,
           CAST(sum(${ndcgTerm("g", "er")}) AS BIGINT) AS idcg9
         FROM rel GROUP BY 1),
       dcg AS (SELECT ra.query_id,
           CAST(count(rel.g) AS BIGINT) AS n_hit,
           CAST(coalesce(sum(${ndcgTerm("coalesce(rel.g, 0)", "ra.rn")}), 0) AS BIGINT) AS dcg9
         FROM ra LEFT JOIN rel ON ra.query_id = rel.query_id
           AND ra.neighbor_id = rel.neighbor_id
         GROUP BY 1)
       SELECT d.query_id, d.n_hit,
         round(CAST(d.dcg9 AS DOUBLE) / CAST(i.idcg9 AS DOUBLE), 6) AS ndcg
       FROM dcg d JOIN idcg i USING (query_id)"""

  // --- x210: Heaps'-law vocabulary growth from the vocab store ---------------
  // Zipf's companion panel (x204): V(N) ≈ K·N^β fitted over the
  // maintained vocabulary store's day-ordered growth curve — β near 1
  // flags template-id/hash/spam vocabularies. 6 day folds (+ a
  // replay), then the O(vocab) first-seen pass and the shared log-log
  // OLS; the oracle rebuilds the curve and the fit.
  def x210HeapsFit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Dedup.materialize(t(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .withColumn("day", pmod(col("doc_id"), lit(6)).cast("long")))
    val table = FreshTables.next(spark, dir, "heapsvocab")
    (0 until 6).foreach { b =>
      graft.ext.Bpe.vocabAppendDay(spark, docs.filter(col("day") === b.toLong),
        "doc_id", "text", s"d$b", table)
    }
    // replay day 3: the (w, day) merge must REPLACE its rows
    graft.ext.Bpe.vocabAppendDay(spark, docs.filter(col("day") === 3L),
      "doc_id", "text", "d3", table)
    TextAnalysis.heapsFit(graft.sources.ManifestStore.read(spark, table))
  }

  val x210Sql: String =
    """WITH toks AS (SELECT doc_id % 6 AS day,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS w
       FROM documents),
       vc AS (SELECT day, w, CAST(count(*) AS BIGINT) AS cnt
         FROM toks GROUP BY 1, 2),
       tk AS (SELECT day, CAST(sum(cnt) AS BIGINT) AS t FROM vc GROUP BY 1),
       tc AS (SELECT day, CAST(sum(t) OVER (ORDER BY day) AS BIGINT) AS n_cum FROM tk),
       fs AS (SELECT w, min(day) AS day FROM vc GROUP BY 1),
       fv AS (SELECT day, CAST(count(*) AS BIGINT) AS v FROM fs GROUP BY 1),
       cv AS (SELECT tc.day, tc.n_cum,
           CAST(sum(coalesce(fv.v, 0)) OVER (ORDER BY tc.day) AS BIGINT) AS v_cum
         FROM tc LEFT JOIN fv USING (day)),
       pts AS (SELECT
           CAST(round(ln(CAST(n_cum AS DOUBLE)) * 1000000.0) AS BIGINT) AS x6,
           CAST(round(ln(CAST(v_cum AS DOUBLE)) * 1000000.0) AS BIGINT) AS y6
         FROM cv),
       s AS (SELECT CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(x6) AS BIGINT) AS sx, CAST(sum(y6) AS BIGINT) AS sy,
           CAST(sum(x6 * x6) AS BIGINT) AS sxx,
           CAST(sum(x6 * y6) AS BIGINT) AS sxy,
           CAST(sum(y6 * y6) AS BIGINT) AS syy
         FROM pts),
       f AS (SELECT n_points,
           CAST(n_points AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
           CAST(n_points AS DOUBLE) * CAST(sxx AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den,
           CAST(n_points AS DOUBLE) * CAST(syy AS DOUBLE)
             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS den2,
           CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
         FROM s)
       SELECT n_points,
         CASE WHEN n_points >= 2 AND den <> 0.0
              THEN round(num / den, 6) END AS heaps_beta,
         CASE WHEN n_points >= 2 AND den <> 0.0
              THEN round((syd - (num / den) * sxd)
                / CAST(n_points AS DOUBLE) / 1000000.0, 6) END AS intercept,
         CASE WHEN n_points >= 2 AND den <> 0.0 AND den2 <> 0.0
              THEN round((num * num) / (den * den2), 6) END AS r2
       FROM f"""

  // --- x211: STREAMING erasure feed over the moment store --------------------
  // The forget matrix through the streaming door: erasure REQUESTS
  // arrive as micro-batches (the shape of a production right-to-be-
  // forgotten queue) and each batch folds by momentsForget under a
  // batch-derived tag; one batch re-delivered post-drain proves the
  // tag-keyed replace (no double subtraction). The surviving-corpus
  // direction is x205's oracle verbatim.
  def x211StreamForget(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val emb = Dedup.materialize(t(spark, dir, "embeddings")
      .withColumn("day", pmod(col("vec_id"), lit(3)).cast("long")))
    val table = FreshTables.next(spark, dir, "smomforget")
    (0 until 3).foreach { b =>
      graft.ext.EmbedPost.momentsAppendDay(spark,
        emb.filter(col("day") === b.toLong), "embedding", 64, s"d$b", table)
    }
    // the erasure queue: every 7th vector, split into 2 request batches
    val doomed = Dedup.materialize(emb.filter(col("vec_id") % 7 === 0)
      .withColumn("req", pmod(expr("vec_id div 7"), lit(2)).cast("long")))
    val base = FreshTables.next(spark, dir, "smomforgetin")
    (0 until 2).foreach { b =>
      doomed.filter(col("req") === b.toLong).repartition(1)
        .write.mode("append").parquet(s"$base/in")
    }
    val stream = spark.readStream.schema(doomed.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val r = batch.agg(min(col("req"))).head().getLong(0)
        graft.ext.EmbedPost.momentsForget(spark, batch, "embedding", 64,
          s"f$r", table)
        ()
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      if (!q.awaitTermination(300000))
        throw new RuntimeException("x211: drain timeout")
    } finally q.stop()
    // at-least-once: re-deliver request batch 1 — the tag-keyed merge
    // must REPLACE, not subtract twice
    graft.ext.EmbedPost.momentsForget(spark,
      doomed.filter(col("req") === 1L), "embedding", 64, "f1", table)
    val x = graft.ext.EmbedPost.directionFromMoments(spark, table, 64, iters = 3)
    x.zipWithIndex.map { case (c, p) => (p, c) }.toSeq
      .toDF("pos", "comp")
  }

  // the erasure feed converges on the survivors' moments, so the
  // oracle is x205's
  val x211Sql: String = momentsSql("WHERE vec_id % 7 <> 0")

  // --- x212: STRATIFIED maintained sample store -------------------------------
  // x195 per language: each stratum keeps its own reproducible k-row
  // weighted sample, day summaries merge per (lang, day), the slack
  // law holds per stratum, and erasing each language's 2 most
  // prominent samples (within slack) keeps every stratum's read exact
  // — the oracle ranks per language, skips the doomed 2, re-ranks.
  def x212StratSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Dedup.materialize(t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.wordCount(col("text")).as("wc"))
      .withColumn("day", pmod(col("doc_id"), lit(3)).cast("long")))
    val table = FreshTables.next(spark, dir, "stratsample")
    (0 until 3).foreach { b =>
      SampleStore.appendDay(spark, docs.filter(col("day") === b.toLong),
        "doc_id", col("wc"), s"d$b", k = 40, slack = 4, table = table,
        byCols = Seq("lang"))
    }
    // replay day 1: the (lang, doc_id, day) merge must REPLACE its rows
    SampleStore.appendDay(spark, docs.filter(col("day") === 1L),
      "doc_id", col("wc"), "d1", k = 40, slack = 4, table = table,
      byCols = Seq("lang"))
    val doomed = SampleStore.sampleFromStore(spark, table, "doc_id", 2,
      byCols = Seq("lang")).select(col("doc_id"))
    SampleStore.forget(spark, table, "doc_id", doomed,
      forgetSeq = 1L, byCols = Seq("lang"))
    SampleStore.sampleFromStore(spark, table, "doc_id", 40,
      byCols = Seq("lang"))
  }

  val x212Sql: String =
    s"""WITH w AS (SELECT doc_id, lang,
         len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS wc,
         md5(CAST(doc_id AS VARCHAR)) AS hx
       FROM documents),
       h AS (SELECT doc_id, lang, wc, ${duckHex48("hx")} AS h48 FROM w),
       k AS (SELECT doc_id, lang,
             round(ln((CAST(h48 AS DOUBLE) + 0.5) / 281474976710656.0)
                   / greatest(CAST(wc AS DOUBLE), 1.0), 6) AS es_key FROM h),
       r AS (SELECT doc_id, lang, es_key,
             row_number() OVER (PARTITION BY lang ORDER BY es_key DESC, doc_id) AS rn
         FROM k),
       s AS (SELECT doc_id, lang, es_key,
             row_number() OVER (PARTITION BY lang ORDER BY es_key DESC, doc_id) AS rn2
         FROM r WHERE rn > 2)
       SELECT lang, doc_id, CAST(rn2 AS BIGINT) AS sample_rank, es_key
       FROM s WHERE rn2 <= 40"""

  // --- x213: tokenizer lifecycle from maintained state -----------------------
  // The x180 composition pattern on the tokenizer: the training corpus
  // (even docs) folds into the vocabulary store day by day, merges
  // TRAIN from the store (no corpus rescan), and the learned tokenizer
  // applies to the held-out odd docs — the full production lifecycle
  // with zero training-side corpus rescans. Store counts sum
  // losslessly, so the result is x201's oracle verbatim.
  def x213TokenizerLifecycle(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val train = Dedup.materialize(docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("text"))
      .withColumn("day", pmod(col("doc_id"), lit(3)).cast("long")))
    val table = FreshTables.next(spark, dir, "tokvocab")
    (0 until 3).foreach { b =>
      graft.ext.Bpe.vocabAppendDay(spark, train.filter(col("day") === b.toLong),
        "doc_id", "text", s"d$b", table)
    }
    val merges = graft.ext.Bpe.learnMergesFromStore(spark, table, rounds = 8)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    graft.ext.Bpe.tokenize(
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", merges)
  }

  // store counts merge to the batch vocabulary, so training-from-store
  // + held-out application is x201's
  val x213Sql: String = x201Sql

  // --- x214: spectral scoring of NEW data from the moment store --------------
  // The serving pass of the spectral pipeline: even-id embeddings fold
  // into the moment store (2 days), the dominant direction + store
  // mean derive corpus-free, and every ODD (held-out) vector scores
  // its exact-integer projection — the anisotropy-outlier score for
  // arrivals without touching training history. The oracle derives
  // direction and mean from the even slice and projects the odd rows.
  def x214SpectralScore(spark: SparkSession, dir: String): DataFrame = {
    val emb = Dedup.materialize(t(spark, dir, "embeddings")
      .withColumn("day", pmod(col("vec_id"), lit(2)).cast("long")))
    val train = emb.filter(col("vec_id") % 2 === 0)
    val table = FreshTables.next(spark, dir, "specscore")
    // train days: split the even ids further by vec_id div 2 parity
    (0 until 2).foreach { b =>
      graft.ext.EmbedPost.momentsAppendDay(spark,
        train.filter(pmod(expr("vec_id div 2"), lit(2)) === b.toLong),
        "embedding", 64, s"d$b", table)
    }
    graft.ext.EmbedPost.projectFromStore(spark, table,
      emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", 64)
  }

  val x214Sql: String =
    s"""WITH ${momentsCtes("WHERE vec_id % 2 = 0")},
       pv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve
         FROM embeddings WHERE vec_id % 2 = 1),
       pe AS (SELECT vec_id, i AS pos,
           CAST(round(ve[i + 1] * 1000000.0) AS BIGINT) + 1000000 AS vq
         FROM pv, unnest(range(0, 64)) AS u(i)),
       proj AS (SELECT pe.vec_id,
           CAST(sum((pe.vq - m.mu) * x.x) AS BIGINT) AS proj
         FROM pe JOIN mu m ON pe.pos = m.pos
         JOIN x3 x ON pe.pos = x.pos
         GROUP BY 1)
       SELECT vec_id, proj FROM proj"""

  // --- x215: cluster-store rebuild from the LSH pair index -------------------
  // The cure for the forget matrix's one documented exactness leak:
  // ClusterStore.forget over-groups by design (the store holds labels,
  // not edges — survivors never split and a survivor whose last partner
  // died lingers as a phantom singleton member), while DedupStores'
  // minhash index stays EXACT over survivors. rebuildFromIndex closes
  // the gap: self-probe the surviving index, recompute components,
  // overwrite twin+main under the rebuild fence. The gate builds both
  // stores, forgets all-but-the-max member of every label%3==0 cluster
  // (guaranteeing phantom singletons), REQUIREs the leak is visible
  // (store rows > exact survivors-components rows), rebuilds, and the
  // final rollup must hash-match the batch components over surviving
  // pairs — the oracle's SECOND recursive CTE pass.
  def x215ClusterRebuild(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.{ClusterStore, DedupStores}
    val docs = Dedup.materialize(
      t(spark, dir, "documents").select(col("doc_id"), col("text")))
    val dd = FreshTables.next(spark, dir, "rbdd")
    ProtoStores.cloneTo(spark, dedupAllProto(spark, dir), dd)
    val (fpT, idxT) = (s"$dd/fp", s"$dd/idx")
    val pairs = allPairs(spark, dir)
    val root = FreshTables.next(spark, dir, "rbcl")
    ProtoStores.cloneTo(spark, clusterAllProto(spark, dir), root)
    // doomed: every member EXCEPT the max id of clusters labeled %3==0 —
    // their survivor is a guaranteed phantom singleton after forget
    val labels = Dedup.materialize(ClusterStore.readLabels(spark, root))
    val mx = labels.groupBy(col("label")).agg(max(col("id")).as("__mx"))
    val doomed = Dedup.materialize(labels.join(mx, Seq("label"))
      .filter(col("label") % 3 === 0 && col("id") =!= col("__mx"))
      .select(col("id")))
    require(doomed.count() > 0L, "x215: empty doomed slice — adjust the rule")
    // forget from BOTH stores: the index forget is exact over survivors,
    // the label forget is the documented conservative form
    DedupStores.forget(spark,
      docs.join(doomed, docs("doc_id") === doomed("id"), "left_semi"),
      "doc_id", "text", fpT, idxT)
    ClusterStore.forget(spark, doomed, "id", root, partitions = 8)
    // the leak, demonstrated: exact survivors-components vs the store
    val survPairs = pairs
      .join(doomed.select(col("id").as("id_a")), Seq("id_a"), "left_anti")
      .join(doomed.select(col("id").as("id_b")), Seq("id_b"), "left_anti")
    val exactN = Dedup.duplicateClusters(survPairs).count()
    val storeN = ClusterStore.readLabels(spark, root).count()
    require(storeN > exactN,
      s"x215: over-grouping not demonstrated (store $storeN vs exact $exactN)")
    // the cure — after it the store equals build() over the survivors
    ClusterStore.rebuildFromIndex(spark, idxT, root, threshold = 0.7, partitions = 8)
    ClusterStore.readLabels(spark, root)
      .groupBy(col("label")).agg(count(lit(1)).as("n_members"))
  }

  // full components → doomed rule → surviving pairs → components AGAIN
  // over the survivor edge set (the rebuilt store's exact semantics)
  val x215Sql: String =
    s"""WITH RECURSIVE ${jaccardCtes(3)},
       ${componentCtes(0.7)},
       cl AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
       mx AS (SELECT comp, max(id) AS mx FROM cl GROUP BY comp),
       doomed AS (SELECT id FROM cl JOIN mx USING (comp)
                  WHERE comp % 3 = 0 AND id <> mx),
       sp AS (SELECT id_a, id_b FROM pairs
              WHERE id_a NOT IN (SELECT id FROM doomed)
                AND id_b NOT IN (SELECT id FROM doomed)),
       edges2 AS (SELECT id_a AS src, id_b AS dst FROM sp
                  UNION SELECT id_b, id_a FROM sp),
       nodes2 AS (SELECT DISTINCT src AS id FROM edges2),
       reach2 AS (
         SELECT id, id AS r FROM nodes2
         UNION
         SELECT e.src AS id, reach2.r AS r FROM reach2 JOIN edges2 e ON e.dst = reach2.id),
       cl2 AS (SELECT id, min(r) AS label FROM reach2 GROUP BY id)
       SELECT label, CAST(count(*) AS BIGINT) AS n_members
       FROM cl2 GROUP BY 1"""

  // --- x216: BM25 index repair (postings GC after a divergent forget) --------
  // The lexical sibling of x215's rebuild cure: IndexStore.forget with
  // text that DIVERGES from the ingested bytes deletes the lens row but
  // strands the true terms' postings cells, inflating df (deflating
  // every survivor's idf) until repair. The gate ingests x172's 3-day
  // layout, forgets doc_id % 7 == 2 under a fully divergent text,
  // REQUIREs the leak (orphan cells exist AND the probe's scores differ
  // from the repaired ones), runs IndexStore.repair (postings anti-join
  // lens ids, keyed term-bucket delete), REQUIREs zero orphans, and
  // probes: scores must hash-match batch BM25 over the survivors —
  // x172's oracle verbatim.
  def x216IndexRepair(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.ext.IndexStore
    import graft.sources.ManifestStore
    val docs = t(spark, dir, "documents")
    val root = FreshTables.next(spark, dir, "bmrepair")
    ProtoStores.cloneTo(spark, bm25Proto(spark, dir), root)
    val doomed = docs.filter(col("doc_id") % 7 === 2)
    require(doomed.count() > 0L, "x216: empty doomed slice")
    // the divergent request: none of the ingested terms are supplied,
    // so EVERY true posting cell of the doomed docs is stranded
    IndexStore.forget(spark,
      doomed.withColumn("text", lit("qqdivergentzz")),
      "doc_id", "text", root, forgetSeq = 1L)
    def orphanCells(): Long = ManifestStore.read(spark, s"$root/postings")
      .join(ManifestStore.read(spark, s"$root/lens").select(col("id")),
        Seq("id"), "left_anti").count()
    val leaked = orphanCells()
    require(leaked > 0L, "x216: divergent forget stranded no postings")
    val qs = Seq(
      ("q_hash_join", Seq("hash", "join")),
      ("q_stream", Seq("stream", "window", "batch")),
      ("q_vector", Seq("vector", "data"))).toDF("query_id", "terms")
    val inflated = Dedup.materialize(
      IndexStore.bm25Probe(spark, root, qs, "doc_id", topK = 15, partitions = 8))
    IndexStore.repair(spark, root, partitions = 8)
    require(orphanCells() == 0L, "x216: repair left orphan cells")
    // idempotent re-run — a repair with nothing to do is a no-op
    IndexStore.repair(spark, root, partitions = 8)
    val fixed = IndexStore.bm25Probe(spark, root, qs, "doc_id",
      topK = 15, partitions = 8)
    require(inflated.except(fixed).count() > 0L,
      "x216: df inflation never showed in the probe — the leak demo is dead")
    fixed
  }

  // the repaired probe is batch BM25 over the survivors — x172's oracle
  val x216Sql: String = x172Sql

  // --- x217: COMPOSED cross-store erasure ------------------------------------
  // The shape a real deletion pipeline runs: ONE erasure request — a
  // manifest carrying the subject's keys in every keyspace (doc_id /
  // vec_id / l_orderkey / user_id, all % 7 == 2; a production request
  // enumerates its identifiers per system) plus the subject's content
  // for the content-keyed stores — driven through ALL NINE forget
  // families in one documented order, then a BLIND AUDIT (every
  // id-keyed store table probed for the keys: zero hits, REQUIREd) and
  // a full-request REPLAY (the orchestrator-crash recovery: every
  // family is keyed-idempotent or fenced). Output: one serving-read
  // FINGERPRINT row per store — count + bit_xor of md5-48 over the
  // canonical row string — each of which the oracle recomputes from
  // the SURVIVING base rows, so any stale or missing serving content
  // in any store flips the hash.
  //
  // Order, documented: (1) content-consuming forgets first (dedup
  // fp/idx, BM25 postings; the media band index — x219's store — runs
  // with them, its delete keys derive from the subject's bytes) — they
  // need the subject's bytes, so they must run before the lakehouse's
  // own delete would remove them. WITHIN a phase the families fan out
  // in parallel (disjoint store tables, independent transactional
  // deletes — the orchestrator shape; phase boundaries stay
  // sequential);
  // (2) id-keyed derived stores (vector, cluster, sample); (3)
  // subtraction-correction stores (moments, view aggregates); (4) the
  // dimension history (SCD2) last. The moment store holds no per-id
  // rows, so its audit IS the serving equality (direction == survivors'
  // from-scratch build, bit-exact).
  /** x217's three inline-built stores as build-once prototypes (the r12
    * bench-diet follow-up): the moment, sample, and media stores were
    * the last per-gate-per-pass ingest cycles in the erasure composite —
    * pure commit-floor wall-time measuring nothing new, since their
    * build REQUIREs are gated elsewhere (x199/x195/x219). x217 clones
    * each and mutates the clone; the fixtures are byte-identical to the
    * previous inline builds.
    */
  private def mom2Proto(spark: SparkSession, dir: String): String =
    ProtoStores.proto(dir, "mom2day") { root =>
      val emb = t(spark, dir, "embeddings")
      (0 until 2).foreach { d =>
        graft.ext.EmbedPost.momentsAppendDay(spark,
          emb.filter(pmod(col("vec_id"), lit(2L)) === d.toLong),
          "embedding", 64, s"d$d", root)
      }
    }

  private def sample2Proto(spark: SparkSession, dir: String): String =
    ProtoStores.proto(dir, "sample2day") { root =>
      val wdocs = t(spark, dir, "documents").select(col("doc_id"),
        TextAnalysis.wordCount(col("text")).as("wc"))
      (0 until 2).foreach { d =>
        SampleStore.appendDay(spark,
          wdocs.filter(pmod(col("doc_id"), lit(2L)) === d.toLong),
          "doc_id", col("wc"), s"d$d", k = 100, slack = 64, table = root)
      }
    }

  private def mediaAllProto(spark: SparkSession, dir: String): String =
    ProtoStores.proto(dir, "mediaall") { root =>
      MediaStore.append(spark, mediaBlobs(spark, mediaBase(spark, dir)), root)
    }

  def x217ComposedErasure(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.ext.{ClusterStore, DedupStores, IndexStore, Scd2Store, VectorStore, ViewStore}
    import graft.sources.ManifestStore
    // coarse phase profile (SPARK_GRAFT_X217_PROFILE=1): the bench-diet
    // feedback loop — which of clone/request/audit/replay/folds carries
    // the wall. Off by default; stderr only, never the result.
    val profile = sys.env.contains("SPARK_GRAFT_X217_PROFILE")
    var t0 = System.nanoTime()
    def mark(phase: String): Unit = if (profile) {
      val t1 = System.nanoTime()
      Console.err.println(f"x217-profile $phase ${(t1 - t0) / 1e9}%.2f s")
      t0 = t1
    }
    // plain parquet reads, NOT materialized: these are the corpus tables
    // (caching the corpus is exactly what a 100 TB pipeline must not do);
    // only the small doomed slices below are pinned
    val docs = t(spark, dir, "documents")
    val emb = t(spark, dir, "embeddings")
    // --- build the eight stores ---
    val dd = FreshTables.next(spark, dir, "cedd")
    ProtoStores.cloneTo(spark, dedupAllProto(spark, dir), dd)
    val (fpT, idxT) = (s"$dd/fp", s"$dd/idx")
    val clT = FreshTables.next(spark, dir, "cecl")
    ProtoStores.cloneTo(spark, clusterAllProto(spark, dir), clT)
    val bmT = FreshTables.next(spark, dir, "cebm")
    ProtoStores.cloneTo(spark, bm25Proto(spark, dir), bmT)
    val annT = FreshTables.next(spark, dir, "ceann")
    ProtoStores.cloneTo(spark, vecStoreProto(spark, dir), annT)
    val momT = FreshTables.next(spark, dir, "cemom")
    ProtoStores.cloneTo(spark, mom2Proto(spark, dir), momT)
    val smpT = FreshTables.next(spark, dir, "cesmp")
    ProtoStores.cloneTo(spark, sample2Proto(spark, dir), smpT)
    val vwT = FreshTables.next(spark, dir, "cevw")
    ProtoStores.cloneTo(spark, aggViewProto(spark, dir), vwT)
    val li = t(spark, dir, "lineitem").select(
      col("l_orderkey").as("okey"), col("l_linenumber"), col("l_quantity"))
    val scT = FreshTables.next(spark, dir, "cesc")
    ProtoStores.cloneTo(spark, scd2Proto(spark, dir), scT)
    val feed = scd2Feed(spark, dir)
    val mdT = FreshTables.next(spark, dir, "cemd")
    ProtoStores.cloneTo(spark, mediaAllProto(spark, dir), mdT)
    // --- THE REQUEST: the subject's keys + content, every keyspace ---
    val doomedDocs = Dedup.materialize(docs.filter(col("doc_id") % 7 === 2))
    val doomedDocIds = doomedDocs.select(col("doc_id").as("id"))
    val doomedVecs = Dedup.materialize(emb.filter(col("vec_id") % 7 === 2))
    val doomedLi = li.filter(col("okey") % 7 === 2)
    val doomedUsers = feed.filter(col("user_id") % 7 === 2)
    require(doomedDocs.count() > 0 && doomedVecs.count() > 0,
      "x217: empty erasure manifest")
    mark("clones+request-slices")
    // the request fans out IN PARALLEL within each ordering phase — the
    // production orchestrator shape: the nine families touch disjoint
    // store tables, so within a phase their transactional deletes are
    // independent Spark jobs (local scheduler interleaves them; a real
    // cluster runs them from orchestrator workers). The PHASE order is
    // the documented contract and stays sequential.
    def phase(steps: (() => Unit)*): Unit = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      Await.result(
        Future.sequence(steps.map(st => Future(st()))),
        scala.concurrent.duration.Duration(20, "min"))
      ()
    }
    def runRequest(): Unit = {
      // phase 1: content-consuming forgets (need the subject's bytes,
      // so they run before any lakehouse delete could remove them)
      phase(
        () => DedupStores.forget(spark, doomedDocs, "doc_id", "text", fpT, idxT),
        () => IndexStore.forget(spark, doomedDocs, "doc_id", "text", bmT,
          forgetSeq = 1L, partitions = 8),
        // null-text docs were never media-ingested (mediaBase filters
        // them), so the media request carries only ingested assets — an
        // unfiltered null blob would NPE inside dHash64
        () => MediaStore.forget(spark, mediaBlobs(spark,
          doomedDocs.filter(col("text").isNotNull)
            .select(col("doc_id").as("media_id"), col("text"))), mdT))
      // phase 2: id-keyed derived stores
      phase(
        () => VectorStore.forget(spark, doomedVecs.select(col("vec_id")), "vec_id", annT),
        () => ClusterStore.forget(spark, doomedDocIds, "id", clT, partitions = 8),
        () => SampleStore.forget(spark, smpT, "doc_id",
          doomedDocs.select(col("doc_id")), forgetSeq = 1L))
      // phase 3: subtraction-correction stores
      phase(
        () => graft.ext.EmbedPost.momentsForget(spark, doomedVecs, "embedding", 64,
          "f1", momT),
        () => ViewStore.forgetA(spark, vwT, doomedLi, "okey",
          Seq("okey", "l_linenumber"), forgetSeq = 1L,
          groupCols = Seq("o_orderpriority"), sumCols = Seq("l_quantity")))
      // phase 4: the dimension history, last
      Scd2Store.forget(spark, scT, doomedUsers, "user_id")
    }
    runRequest()
    mark("forgets")
    // --- BLIND AUDIT: zero hits for the subject in every id-keyed table ---
    def hits(table: String, keyCol: String, keys: DataFrame): Long =
      ManifestStore.read(spark, table)
        .join(keys.select(col(keyCol)), Seq(keyCol), "left_semi").count()
    val audit = Seq(
      ("dedup_fp", hits(fpT, "id", doomedDocIds)),
      ("dedup_idx", hits(idxT, "id", doomedDocIds)),
      ("cluster", hits(clT, "id", doomedDocIds)),
      ("cluster_twin", hits(s"$clT/_idindex", "id", doomedDocIds)),
      ("bm25_postings", hits(s"$bmT/postings", "id", doomedDocIds)),
      ("bm25_lens", hits(s"$bmT/lens", "id", doomedDocIds)),
      ("ann_codes", hits(s"$annT/codes", "vec_id", doomedVecs)),
      ("ann_assign", hits(s"$annT/assign", "vec_id", doomedVecs)),
      ("sample", hits(smpT, "doc_id", doomedDocs)),
      ("view_base", hits(s"$vwT/a", "okey", doomedLi)),
      ("view_rows", hits(s"$vwT/view", "okey", doomedLi)),
      ("scd2", hits(scT, "user_id", doomedUsers)),
      ("media_idx", hits(mdT, "media_id",
        doomedDocs.select(col("doc_id").as("media_id")))))
    for ((name, n) <- audit)
      require(n == 0L, s"x217 blind audit: $n subject rows survived in $name")
    mark("audit")
    // --- REPLAY the whole request: the orchestrator-crash recovery ---
    runRequest()
    mark("replay")
    // --- serving fingerprints, one row per store ---
    def fold(store: String, df: DataFrame, canon: org.apache.spark.sql.Column): DataFrame =
      df.select(conv(substring(md5(canon), 1, 12), 16, 10).cast("long").as("__h"))
        .agg(count(lit(1)).as("n_rows"),
          coalesce(expr("bit_xor(__h)"), lit(0L)).as("fp"))
        .select(lit(store).as("store"), col("n_rows"), col("fp"))
    val qs = Seq(
      ("q_hash_join", Seq("hash", "join")),
      ("q_stream", Seq("stream", "window", "batch")),
      ("q_vector", Seq("vector", "data"))).toDF("query_id", "terms")
    val folds = Seq(
      fold("dedup_fp", ManifestStore.read(spark, fpT),
        concat_ws("|", col("fp"), col("id"))),
      fold("dedup_idx", ManifestStore.read(spark, idxT), col("id").cast("string")),
      fold("cluster", ClusterStore.readLabels(spark, clT),
        concat_ws("|", col("id"), col("label"))),
      fold("bm25", IndexStore.bm25Probe(spark, bmT, qs, "doc_id",
          topK = 15, partitions = 8),
        concat_ws("|", col("query_id"), col("rank"), col("doc_id"),
          round(col("score") * lit(1e6d), 0).cast("long"))),
      fold("ann", VectorStore.probe(spark, emb.filter(col("vec_id") < 8),
          "vec_id", "embedding", annT,
          dim = 64, m = 4, k = 16, stride = 3, nprobe = 3, topK = 10),
        concat_ws("|", col("query_id"), col("rank"), col("vec_id"), col("est_d9"))),
      fold("moments",
        graft.ext.EmbedPost.directionFromMoments(spark, momT, 64, iters = 3)
          .zipWithIndex.map { case (c, p) => (p, c) }.toSeq.toDF("pos", "comp"),
        concat_ws("|", col("pos"), col("comp"))),
      fold("sample", SampleStore.sampleFromStore(spark, smpT, "doc_id", 100),
        concat_ws("|", col("doc_id"), col("sample_rank"),
          round(col("es_key") * lit(1e6d), 0).cast("long"))),
      fold("view", ViewStore.readAgg(spark, vwT,
          groupCols = Seq("o_orderpriority"), sumCols = Seq("l_quantity")),
        concat_ws("|", col("o_orderpriority"), col("cnt"),
          round(col("sum_l_quantity") * lit(100d), 0).cast("long"))),
      fold("scd2", Scd2Store.history(spark, scT),
        concat_ws("|", col("user_id"), round(col("value") * lit(1e6d), 0).cast("long"),
          col("version"), col("valid_from_us"), coalesce(col("valid_to_us"), lit(-1L)))),
      fold("media", MediaStore.probe(spark,
          mediaBlobs(spark, mediaTwins(mediaBase(spark, dir))), mdT, maxDist = 3),
        concat_ws("|", col("probe_id"), col("store_id"), col("hamming"))))
    if (profile) {
      val names = Seq("dedup_fp", "dedup_idx", "cluster", "bm25", "ann",
        "moments", "sample", "view", "scd2", "media")
      names.zip(folds).foreach { case (n, f) =>
        val ts = System.nanoTime()
        f.count()
        Console.err.println(
          f"x217-profile fold:$n ${(System.nanoTime() - ts) / 1e9}%.2f s")
      }
    }
    folds.reduce(_ unionByName _)
  }

  // each store's serving read recomputed from the SURVIVING base rows,
  // folded with the same md5-48 bit_xor
  val x217Sql: String = {
    def sec(store: String, inner: String, canon: String): String =
      s"""SELECT '$store' AS store, CAST(count(*) AS BIGINT) AS n_rows,
         coalesce(bit_xor(${duckHex48("hx")}), 0) AS fp
       FROM (SELECT md5($canon) AS hx FROM ($inner) t0) t"""
    val clusterInner =
      s"""WITH RECURSIVE ${jaccardCtes(3)},
         ${componentCtes(0.7)},
         cl AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
         surv AS (SELECT id, comp FROM cl WHERE id % 7 <> 2),
         rel AS (SELECT comp, min(id) AS label FROM surv GROUP BY comp)
         SELECT surv.id AS id, rel.label AS label FROM surv JOIN rel USING (comp)"""
    val sampleInner =
      s"""WITH w AS (SELECT doc_id,
           len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS wc,
           md5(CAST(doc_id AS VARCHAR)) AS hx
         FROM documents WHERE doc_id % 7 <> 2),
         h AS (SELECT doc_id, wc, ${duckHex48("hx")} AS h48 FROM w),
         k AS (SELECT doc_id,
               round(ln((CAST(h48 AS DOUBLE) + 0.5) / 281474976710656.0)
                     / greatest(CAST(wc AS DOUBLE), 1.0), 6) AS es_key FROM h),
         r AS (SELECT doc_id, es_key,
               row_number() OVER (ORDER BY es_key DESC, doc_id) AS rn FROM k)
         SELECT doc_id, CAST(rn AS BIGINT) AS sample_rank, es_key
         FROM r WHERE rn <= 100"""
    val viewAnchor = "FROM lineitem JOIN orders"
    require(x179Sql.contains(viewAnchor), "x217: x179Sql anchor moved")
    val scd2Anchor = "WHERE event_type = 'purchase'"
    require(x91Sql.contains(scd2Anchor), "x217: x91Sql anchor moved")
    Seq(
      sec("dedup_fp",
        """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
             doc_id AS id
           FROM documents WHERE doc_id % 7 <> 2 AND text IS NOT NULL""",
        "fp || '|' || CAST(id AS VARCHAR)"),
      sec("dedup_idx",
        """SELECT doc_id AS id FROM (
             SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS ws
             FROM documents WHERE doc_id % 7 <> 2) w
           WHERE len(ws) >= 3""",
        "CAST(id AS VARCHAR)"),
      sec("cluster", clusterInner,
        "CAST(id AS VARCHAR) || '|' || CAST(label AS VARCHAR)"),
      sec("bm25", x216Sql,
        "query_id || '|' || CAST(rank AS VARCHAR) || '|' || CAST(doc_id AS VARCHAR) || '|' || CAST(CAST(round(score * 1000000.0) AS BIGINT) AS VARCHAR)"),
      sec("ann", x157Sql,
        "CAST(query_id AS VARCHAR) || '|' || CAST(rank AS VARCHAR) || '|' || CAST(vec_id AS VARCHAR) || '|' || CAST(est_d9 AS VARCHAR)"),
      sec("moments", momentsSql("WHERE vec_id % 7 <> 2"),
        "CAST(pos AS VARCHAR) || '|' || CAST(comp AS VARCHAR)"),
      sec("sample", sampleInner,
        "CAST(doc_id AS VARCHAR) || '|' || CAST(sample_rank AS VARCHAR) || '|' || CAST(CAST(round(es_key * 1000000.0) AS BIGINT) AS VARCHAR)"),
      sec("view",
        x179Sql.replace(viewAnchor,
          "FROM (SELECT * FROM lineitem WHERE l_orderkey % 7 <> 2) lineitem JOIN orders"),
        "o_orderpriority || '|' || CAST(cnt AS VARCHAR) || '|' || CAST(CAST(round(sum_l_quantity * 100.0) AS BIGINT) AS VARCHAR)"),
      sec("scd2",
        x91Sql.replace(scd2Anchor,
          scd2Anchor + " AND user_id % 7 <> 2"),
        "CAST(user_id AS VARCHAR) || '|' || CAST(CAST(round(value * 1000000.0) AS BIGINT) AS VARCHAR) || '|' || CAST(version AS VARCHAR) || '|' || CAST(valid_from_us AS VARCHAR) || '|' || CAST(coalesce(valid_to_us, -1) AS VARCHAR)"),
      sec("media",
        s"""WITH $mediaOracleCtes
           SELECT t.media_id AS probe_id, s.media_id AS store_id,
             CAST(bit_count(xor(t.ph, s.ph)) AS BIGINT) AS hamming
           FROM pht t JOIN phb s ON t.media_id <> s.media_id
           WHERE s.media_id % 7 <> 2 AND bit_count(xor(t.ph, s.ph)) <= 3""",
        "CAST(probe_id AS VARCHAR) || '|' || CAST(store_id AS VARCHAR) || '|' || CAST(hamming AS VARCHAR)")
    ).mkString("\nUNION ALL\n")
  }

  // --- x218: perceptual near-dup over media blobs (dHash + Hamming bands) ----
  // The media modality joins the near-dup matrix (text has 5 flavors,
  // embeddings SRP/SemDeDup; media had none): the standard public
  // recipe — dHash bits over the stubbed decode's deterministic 9×8
  // grid, Hamming-banded candidate pairs via x06's pigeonhole blocks
  // (exact recall at maxDist=3), exact popcount verify. The fixture is
  // ASCII, so each sampled byte is a codepoint and the oracle unrolls
  // the WHOLE pipeline — grid sampling, all 64 dHash bits, the
  // brute-force Hamming verify — in SQL.
  // The fixture has no natural near-dup PAYLOADS (its near-dup texts
  // differ byte-wise enough that the sampled grid diverges — min pair
  // distance 13 at gate SFs), so the gate derives the actual use case
  // deterministically in BOTH engines: every 10th asset gets a
  // "re-encoded twin" with ONE middle byte replaced. One byte feeds at
  // most one grid cell (len ≥ 72 samples each position once; a cell
  // appears in ≤ 2 adjacent comparisons), so a twin's dHash is within
  // Hamming 2 of its original — the banded pipeline must surface
  // exactly the twin pairs, and the REQUIRE pins non-vacuity.
  def x218PerceptualDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = t(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id").as("media_id"), col("text"))
    val twins = base
      .filter(col("media_id") % 10 === 0 && length(col("text")) >= 4)
      .select((col("media_id") + lit(100000000L)).as("media_id"),
        expr("concat(substr(text, 1, length(text) div 2), 'q', " +
          "substr(text, length(text) div 2 + 2))").as("text"))
    val media = base.unionByName(twins)
      .select(col("media_id"), col("text").cast("binary").as("blob"))
      .as[Multimodal.MediaBlob]
    val pairs = Multimodal.perceptualPairs(media, maxDist = 3)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
    require(!pairs.head(1).isEmpty, "x218: no perceptual pairs — vacuous gate")
    pairs
  }

  val x218Sql: String = {
    // bit (r*8 + c): grid cell k = r*9 + c samples byte ⌊k·len/72⌋
    // (1-based substr; ASCII fixture ⇒ ascii(char) == byte value) —
    // ONE shared generator (dhashBitsSql) for every dHash oracle
    // (x217/x219/x220/x227 included), so the recipe can never
    // desynchronize between gates
    val bits = dhashBitsSql
    s"""WITH base AS (SELECT doc_id AS media_id, text
         FROM documents WHERE text IS NOT NULL),
       m AS (SELECT media_id, text FROM base
         UNION ALL
         SELECT media_id + 100000000,
           substr(text, 1, length(text) // 2) || 'q' || substr(text, length(text) // 2 + 2)
         FROM base WHERE media_id % 10 = 0 AND length(text) >= 4),
       mm AS (SELECT media_id, text, CAST(length(text) AS BIGINT) AS len FROM m),
       ph AS (SELECT media_id,
           CASE WHEN len = 0 THEN 0 ELSE $bits END AS ph
         FROM mm)
       SELECT a.media_id AS id_a, b.media_id AS id_b,
         CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
       FROM ph a JOIN ph b ON a.media_id < b.media_id
       WHERE bit_count(xor(a.ph, b.ph)) <= 3"""
  }

  // --- x219-x221: maintained perceptual-hash media store ---------------------
  // x218's one-shot near-dup becomes a LIFECYCLE store (the last
  // one-shot-only near-dup family): banded dHash postings in a
  // ManifestStore table, probes pruned to the increment's band
  // buckets, keyed append/forget. Shared fixture derivation with x218:
  // base docs as media blobs, every 10th asset a re-encoded twin (one
  // replaced middle byte, ≤ 2 dHash bits).

  private def mediaBase(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id").as("media_id"), col("text"))

  private def mediaTwins(base: DataFrame): DataFrame = base
    .filter(col("media_id") % 10 === 0 && length(col("text")) >= 4)
    .select((col("media_id") + lit(100000000L)).as("media_id"),
      expr("concat(substr(text, 1, length(text) div 2), 'q', " +
        "substr(text, length(text) div 2 + 2))").as("text"))

  private def mediaBlobs(spark: SparkSession, df: DataFrame)
      : Dataset[Multimodal.MediaBlob] = {
    import spark.implicits._
    df.select(col("media_id"), col("text").cast("binary").as("blob"))
      .as[Multimodal.MediaBlob]
  }

  /** The x218 dHash recipe as a reusable SQL fragment: 64 CASE bits over
    * a (media_id, text, len) relation — grid cell k of the 9×8 grid
    * samples byte ⌊k·len/72⌋ (ASCII fixture ⇒ ascii == byte value).
    */
  // lazy: referenced by x217Sql, which is declared ABOVE these helpers —
  // a plain val would still be null when the object initializer builds it
  private lazy val dhashBitsSql: String = (0 until 64).map { i =>
    val k1 = (i / 8) * 9 + (i % 8)
    def px(k: Int) = s"ascii(substr(text, CAST(($k * len) // 72 AS BIGINT) + 1, 1))"
    s"CASE WHEN ${px(k1 + 1)} > ${px(k1)} THEN CAST(${1L << i} AS BIGINT) ELSE 0 END"
  }.mkString("(", "\n             + ", ")")

  private lazy val mediaOracleCtes: String =
    s"""base AS (SELECT doc_id AS media_id, text
         FROM documents WHERE text IS NOT NULL),
       tw AS (SELECT media_id + 100000000 AS media_id,
           substr(text, 1, length(text) // 2) || 'q' || substr(text, length(text) // 2 + 2) AS text
         FROM base WHERE media_id % 10 = 0 AND length(text) >= 4),
       phb AS (SELECT media_id,
           CASE WHEN length(text) = 0 THEN 0 ELSE $dhashBitsSql END AS ph
         FROM (SELECT media_id, text, CAST(length(text) AS BIGINT) AS len FROM base)),
       pht AS (SELECT media_id,
           CASE WHEN length(text) = 0 THEN 0 ELSE $dhashBitsSql END AS ph
         FROM (SELECT media_id, text, CAST(length(text) AS BIGINT) AS len FROM tw))"""

  // --- x219: build + append + replay + pruned probe ---------------------------
  // Two-slice ingest (the daily cycle), day-2 re-delivered (the keyed
  // merge must REPLACE — row accounting REQUIREd), then the twins probe
  // the store: exact recall at Hamming ≤ 3 vs EVERY ingested asset,
  // store-side corpus never rescanned.
  def x219MediaStore(spark: SparkSession, dir: String): DataFrame = {
    val base = Dedup.materialize(mediaBase(spark, dir))
    val hist = base.filter(col("media_id") % 3 =!= 0)
    val inc = base.filter(col("media_id") % 3 === 0)
    val table = FreshTables.next(spark, dir, "mediastore")
    MediaStore.append(spark, mediaBlobs(spark, hist), table)
    MediaStore.append(spark, mediaBlobs(spark, inc), table)
    // at-least-once: re-deliver the increment — keyed merge replaces
    MediaStore.append(spark, mediaBlobs(spark, inc), table)
    val stored = graft.sources.ManifestStore.read(spark, table).count()
    val expected = base.count() * 4L
    require(stored == expected,
      s"x219: store holds $stored band rows, expected $expected — " +
        "the replay duplicated instead of replacing")
    val pairs = MediaStore
      .probe(spark, mediaBlobs(spark, mediaTwins(base)), table, maxDist = 3)
      .select(col("probe_id"), col("store_id"), col("hamming").cast("long").as("hamming"))
    require(!pairs.head(1).isEmpty, "x219: no matches — vacuous gate")
    pairs
  }

  val x219Sql: String =
    s"""WITH $mediaOracleCtes
       SELECT t.media_id AS probe_id, s.media_id AS store_id,
         CAST(bit_count(xor(t.ph, s.ph)) AS BIGINT) AS hamming
       FROM pht t JOIN phb s ON t.media_id <> s.media_id
       WHERE bit_count(xor(t.ph, s.ph)) <= 3"""

  // --- x220: right-to-be-forgotten over the media index -----------------------
  // Every 20th asset (half the twins' originals) is erased — keyed,
  // bucket-pruned delete, replayed once (idempotence) — then the twins
  // probe: the doomed originals MUST vanish from the matches while
  // survivor matches are bit-identical to an index built without them.
  def x220MediaForget(spark: SparkSession, dir: String): DataFrame = {
    val base = Dedup.materialize(mediaBase(spark, dir))
    val table = FreshTables.next(spark, dir, "mediaforget")
    // the same full-corpus store x219 gates the build of — cloned, not
    // re-ingested (the bench-diet rule: this gate's subject is forget)
    ProtoStores.cloneTo(spark, mediaAllProto(spark, dir), table)
    val doomed = base.filter(col("media_id") % 20 === 0)
    MediaStore.forget(spark, mediaBlobs(spark, doomed), table)
    // replay the same request: keyed delete is a no-op on absent keys
    MediaStore.forget(spark, mediaBlobs(spark, doomed), table)
    val stored = graft.sources.ManifestStore.read(spark, table).count()
    val expected = (base.count() - doomed.count()) * 4L
    require(stored == expected,
      s"x220: store holds $stored band rows after forget, expected $expected")
    val pairs = MediaStore
      .probe(spark, mediaBlobs(spark, mediaTwins(base)), table, maxDist = 3)
      .select(col("probe_id"), col("store_id"), col("hamming").cast("long").as("hamming"))
    require(!pairs.head(1).isEmpty, "x220: no survivor matches — vacuous gate")
    pairs
  }

  val x220Sql: String =
    s"""WITH $mediaOracleCtes
       SELECT t.media_id AS probe_id, s.media_id AS store_id,
         CAST(bit_count(xor(t.ph, s.ph)) AS BIGINT) AS hamming
       FROM pht t JOIN phb s ON t.media_id <> s.media_id
       WHERE s.media_id % 20 <> 0
         AND bit_count(xor(t.ph, s.ph)) <= 3"""

  // --- x221: STREAMING media-store maintenance --------------------------------
  // x219 fed by a stream (the x161/x196/x203 door): asset days arrive
  // as micro-batches, each folded by MediaStore.append in foreachBatch;
  // one day re-delivered post-drain (at-least-once), then the twins
  // probe — bit-identical to the batch build, x219's oracle verbatim.
  def x221StreamMedia(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val base = Dedup.materialize(mediaBase(spark, dir)
      .withColumn("day", pmod(col("media_id"), lit(3)).cast("long")))
    val table = FreshTables.next(spark, dir, "smediastore")
    val root = FreshTables.next(spark, dir, "smediain")
    (0 until 3).foreach { b =>
      base.filter(col("day") === b.toLong).repartition(1)
        .write.mode("append").parquet(s"$root/in")
    }
    val stream = spark.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        MediaStore.append(spark, mediaBlobs(spark, batch), table)
        ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      if (!q.awaitTermination(300000))
        throw new RuntimeException("x221: drain timeout")
    } finally q.stop()
    // at-least-once: re-deliver day 1 — the keyed merge replaces
    MediaStore.append(spark,
      mediaBlobs(spark, base.filter(col("day") === 1L)), table)
    val pairs = MediaStore
      .probe(spark, mediaBlobs(spark, mediaTwins(base)), table, maxDist = 3)
      .select(col("probe_id"), col("store_id"), col("hamming").cast("long").as("hamming"))
    require(!pairs.head(1).isEmpty, "x221: no matches — vacuous gate")
    pairs
  }

  val x221Sql: String = x219Sql

  // --- x222/x223: maintained benchmark-gram registry --------------------------
  // x31/x55's decontamination probe becomes a LIFECYCLE registry: eval
  // suites are appended (and re-delivered — keyed merge REPLACES, row
  // accounting REQUIREd) and RETIRED (one suite-partition keyed delete,
  // idempotent) over time, while corpus increments probe the persisted
  // gram table — the benchmark texts are never re-tokenized. Suites:
  // docs %50==0 → suiteA, %50==25 → suiteB; corpus = the rest.

  private def benchRegistryTable(spark: SparkSession, dir: String,
      prefix: String): (String, DataFrame) = {
    val docs = Dedup.materialize(t(spark, dir, "documents"))
    val table = FreshTables.next(spark, dir, prefix)
    graft.ext.BenchRegistry.appendSuite(spark,
      docs.filter(col("doc_id") % 50 === 0), "doc_id", "text", "suiteA", table)
    graft.ext.BenchRegistry.appendSuite(spark,
      docs.filter(col("doc_id") % 50 === 25), "doc_id", "text", "suiteB", table)
    // re-deliver suiteA: the (s, suite) keyed merge must REPLACE
    graft.ext.BenchRegistry.appendSuite(spark,
      docs.filter(col("doc_id") % 50 === 0), "doc_id", "text", "suiteA", table)
    val stored = graft.sources.ManifestStore.read(spark, table).count()
    // per-doc grams first (shingle windows must never stitch across
    // docs), then distinct per suite — the store's (s, suite) key space
    val expected = Dedup.shingleRows(
        docs.filter(col("doc_id") % 50 === 0 || col("doc_id") % 50 === 25),
        "doc_id", "text", 6)
      .select(when(pmod(col("id"), lit(50L)) === 0L, lit("suiteA"))
        .otherwise(lit("suiteB")).as("suite"), col("s"))
      .distinct().count()
    require(stored == expected,
      s"$prefix: registry holds $stored gram rows, expected $expected — " +
        "the suiteA replay duplicated instead of replacing")
    (table, docs)
  }

  // --- x222: append + replay + retire + probe ---------------------------------
  // suiteB is retired (twice — idempotence) before the probe, so the
  // contamination read must equal x31's plan against suiteA ALONE: a
  // leftover suiteB gram anywhere inflates a doc's n_contaminated and
  // flips the hash.
  def x222BenchRegistry(spark: SparkSession, dir: String): DataFrame = {
    val (table, docs) = benchRegistryTable(spark, dir, "benchreg")
    graft.ext.BenchRegistry.retireSuite(spark, "suiteB", table)
    graft.ext.BenchRegistry.retireSuite(spark, "suiteB", table)
    val corpus = docs.filter(col("doc_id") % 50 =!= 0 && col("doc_id") % 50 =!= 25)
    val out = graft.ext.BenchRegistry.probe(spark, corpus, "doc_id", "text", table)
      .withColumnRenamed("id", "doc_id")
    require(out.agg(sum(col("n_contaminated"))).head().getLong(0) > 0L,
      "x222: zero contamination hits — vacuous gate")
    out
  }

  val x222Sql: String =
    """WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS ws FROM documents),
       sh0 AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(ws) - 5, 0) + 1), i -> array_to_string(ws[i:i+5], ' '))) AS sh FROM w),
       sh AS (SELECT doc_id, sh FROM sh0 WHERE len(sh) > 0),
       posts AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       bg AS (SELECT DISTINCT s FROM posts WHERE doc_id % 50 = 0),
       corpus AS (SELECT * FROM posts WHERE doc_id % 50 <> 0 AND doc_id % 50 <> 25),
       sizes AS (SELECT doc_id, count(*) AS n_grams FROM corpus GROUP BY 1),
       hits AS (SELECT c.doc_id, count(*) AS n_contaminated
                FROM corpus c JOIN bg ON c.s = bg.s GROUP BY 1)
       SELECT s.doc_id, s.n_grams,
         COALESCE(h.n_contaminated, 0) AS n_contaminated,
         CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE) / CAST(s.n_grams AS DOUBLE) AS contamination_ratio
       FROM sizes s LEFT JOIN hits h ON s.doc_id = h.doc_id"""

  // --- x223: per-suite attribution ("WHICH benchmark leaks?") -----------------
  // Both suites live; the triage read after a probe flags a batch — hit
  // counts per (doc, suite), suites a doc doesn't touch emit no row. A
  // gram in BOTH suites counts once per suite (the registry is keyed
  // (s, suite)).
  def x223SuiteAttribution(spark: SparkSession, dir: String): DataFrame = {
    val (table, docs) = benchRegistryTable(spark, dir, "benchattr")
    val corpus = docs.filter(col("doc_id") % 50 =!= 0 && col("doc_id") % 50 =!= 25)
    val out = graft.ext.BenchRegistry
      .attribute(spark, corpus, "doc_id", "text", table)
      .withColumnRenamed("id", "doc_id")
    require(!out.head(1).isEmpty, "x223: no attributed hits — vacuous gate")
    out
  }

  val x223Sql: String =
    """WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS ws FROM documents),
       sh0 AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(ws) - 5, 0) + 1), i -> array_to_string(ws[i:i+5], ' '))) AS sh FROM w),
       sh AS (SELECT doc_id, sh FROM sh0 WHERE len(sh) > 0),
       posts AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       reg AS (SELECT DISTINCT s,
           CASE WHEN doc_id % 50 = 0 THEN 'suiteA' ELSE 'suiteB' END AS suite
         FROM posts WHERE doc_id % 50 = 0 OR doc_id % 50 = 25),
       corpus AS (SELECT * FROM posts WHERE doc_id % 50 <> 0 AND doc_id % 50 <> 25)
       SELECT c.doc_id, r.suite, CAST(count(*) AS BIGINT) AS n_hits
       FROM corpus c JOIN reg r ON c.s = r.s GROUP BY 1, 2"""

  // --- x224: epoch compaction of the index's day subtotals --------------------
  // The metadata diet for a years-of-ingest store: days d0+d1 fold into
  // ONE epoch row via ManifestStore.replaceWhere (one atomic manifest
  // flip — no window where both old days and the epoch are visible),
  // lens breadcrumbs rebadge so forgets keep subtracting from the row
  // that holds their counts. Compaction replayed (crash recovery), THEN
  // a forget of docs whose counts now live under the epoch — the probe
  // must hash-match the survivors-only batch BM25 (x172's oracle): a
  // dropped subtraction or a double-counted day flips N/avgdl and the
  // scores with it.
  def x224StatsCompaction(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.ext.IndexStore
    import graft.sources.ManifestStore
    val docs = t(spark, dir, "documents")
    val root = FreshTables.next(spark, dir, "bmcompact")
    ProtoStores.cloneTo(spark, bm25Proto(spark, dir), root)
    def statsRows(): Seq[String] = ManifestStore.read(spark, s"$root/stats")
      .select(col("day")).collect().map(_.getString(0)).sorted.toSeq
    require(statsRows() == Seq("d0", "d1", "d2"), s"x224: unexpected days ${statsRows()}")
    IndexStore.compactStats(spark, root, Seq("d0", "d1"), "epoch:01", compactSeq = 1L)
    // replay with the same seq — both steps converge
    IndexStore.compactStats(spark, root, Seq("d0", "d1"), "epoch:01", compactSeq = 1L)
    require(statsRows() == Seq("d2", "epoch:01"),
      s"x224: compaction left days ${statsRows()}")
    val lensDays = ManifestStore.read(spark, s"$root/lens")
      .select(col("day")).distinct().collect().map(_.getString(0)).toSet
    require(lensDays.subsetOf(Set("d2", "epoch:01")),
      s"x224: lens breadcrumbs not rebadged: $lensDays")
    // N must be UNCHANGED by compaction (exact sums)
    def statsN(): Long = ManifestStore.read(spark, s"$root/stats")
      .agg(sum(col("nd"))).head().getLong(0)
    require(statsN() == docs.count(), s"x224: compaction changed N to ${statsN()}")
    // forget across the epoch: doomed docs' counts subtract from the
    // epoch (or d2) row their breadcrumb names — then replay (fence)
    val doomed = docs.filter(col("doc_id") % 7 === 2)
    IndexStore.forget(spark, doomed, "doc_id", "text", root, forgetSeq = 1L)
    IndexStore.forget(spark, doomed, "doc_id", "text", root, forgetSeq = 1L)
    val survivors = docs.filter(col("doc_id") % 7 =!= 2).count()
    require(statsN() == survivors, s"x224: stats N ${statsN()} != $survivors survivors")
    val qs = Seq(
      ("q_hash_join", Seq("hash", "join")),
      ("q_stream", Seq("stream", "window", "batch")),
      ("q_vector", Seq("vector", "data"))).toDF("query_id", "terms")
    IndexStore.bm25Probe(spark, root, qs, "doc_id", topK = 15, partitions = 8)
  }

  // compaction is bit-invisible and the forget exact — x172's
  // survivors-only batch BM25 oracle verbatim
  val x224Sql: String = x172Sql

  // --- x225: epoch compaction of the moment store -----------------------------
  // x205's forget leaves an erasure LEDGER: the (day row, negative
  // correction row) pair reconstructs the forgotten vectors' aggregate
  // moments by subtraction. Folding all days AND the forget tag into
  // one epoch destroys that ledger (the privacy completion) and caps
  // the store at O(dim²) rows forever — while the direction read stays
  // BIT-IDENTICAL (exact sums, summed unordered). Replay converges;
  // row accounting REQUIREd; oracle = survivors-only direction, x205's
  // verbatim.
  def x225MomentsCompaction(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.sources.ManifestStore
    val emb = Dedup.materialize(t(spark, dir, "embeddings")
      .withColumn("day", pmod(col("vec_id"), lit(3)).cast("long")))
    val table = FreshTables.next(spark, dir, "momcompact")
    (0 until 3).foreach { b =>
      graft.ext.EmbedPost.momentsAppendDay(spark,
        emb.filter(col("day") === b.toLong), "embedding", 64, s"d$b", table)
    }
    val doomed = emb.filter(col("vec_id") % 7 === 0)
    graft.ext.EmbedPost.momentsForget(spark, doomed, "embedding", 64, "f1", table)
    graft.ext.EmbedPost.momentsCompact(spark, table,
      Seq("d0", "d1", "d2", "f1"), "epoch:all")
    // replay — each table's fold recomputes the identical epoch rows
    graft.ext.EmbedPost.momentsCompact(spark, table,
      Seq("d0", "d1", "d2", "f1"), "epoch:all")
    // the ledger is gone: exactly one subtotal row set survives
    val m1Rows = ManifestStore.read(spark, s"$table/m1").count()
    require(m1Rows == 64L, s"x225: m1 holds $m1Rows rows, expected 64 (one per pos)")
    val m2Days = ManifestStore.read(spark, s"$table/m2")
      .select(col("day")).distinct().collect().map(_.getString(0)).toSeq
    require(m2Days == Seq("epoch:all"), s"x225: m2 days $m2Days")
    val x = graft.ext.EmbedPost.directionFromMoments(spark, table, 64, iters = 3)
    x.zipWithIndex.map { case (c, p) => (p, c) }.toSeq
      .toDF("pos", "comp")
  }

  val x225Sql: String = momentsSql("WHERE vec_id % 7 <> 0")

  // --- x226: epoch compaction of the HLL store (MAX fold) ---------------------
  // The metadata diet reaches the sketch stores: register rows of all 3
  // days max-fold into one epoch set — O(groups × 2^p) rows forever —
  // and the estimate read is bit-identical (max-merge is associative
  // AND idempotent, so even a double fold converges). Row accounting
  // REQUIREd; oracle = x138's estimate, x143's verbatim.
  def x226HllCompaction(spark: SparkSession, dir: String): DataFrame = {
    val u = Dedup.materialize(hllSource(spark, dir)
      .withColumn("day",
        concat(lit("d"), pmod(TextAnalysis.md5Bucket(col("v")), lit(3)))))
    val table = FreshTables.next(spark, dir, "hllcompact")
    (0 until 3).foreach { b =>
      Sketches.hllAppendDay(spark, u.filter(col("day") === s"d$b"),
        "grp", "v", s"d$b", table)
    }
    Sketches.hllCompact(spark, table, "grp", Seq("d0", "d1", "d2"), "epoch:all")
    // replay — the max fold is idempotent
    Sketches.hllCompact(spark, table, "grp", Seq("d0", "d1", "d2"), "epoch:all")
    val stored = graft.sources.ManifestStore.read(spark, table).count()
    val expected = u
      .select(col("grp"),
        shiftright(org.apache.spark.sql.graftfn.HashExpressions
          .md5Prefix48(col("v")), 40).as("idx"))
      .distinct().count()
    require(stored == expected,
      s"x226: store holds $stored register rows after compaction, expected " +
        s"$expected (one per live (grp, idx))")
    Sketches.hllEstimate(
      Sketches.hllRegistersFromStore(spark, table, "grp"), "grp")
      .join(u.groupBy(col("grp")).agg(count_distinct(col("v")).as("n_exact")),
        Seq("grp"))
  }

  val x226Sql: String = x138Sql

  // --- x227: media forget BY ID (the bytes-unavailable deletion path) ---------
  // The real deletion-request shape: identifiers only, the lakehouse
  // bytes already gone. No band key to prune by, so the delete LOCATES
  // the doomed rows via a narrow key+partition scan of the index (the
  // x216 periodic/cure shape) and rewrites only their buckets — also
  // the convergence cure after a divergent-bytes forget (spec-pinned
  // with an adversarial orphan fixture). Replay idempotent; row
  // accounting REQUIREd; survivors' probe = x220's oracle verbatim
  // (same doomed slice).
  def x227MediaForgetById(spark: SparkSession, dir: String): DataFrame = {
    val base = Dedup.materialize(mediaBase(spark, dir))
    val table = FreshTables.next(spark, dir, "mediaid")
    // cloned full-corpus store (x220's diet note): the subject here is
    // forgetById, not the ingest
    ProtoStores.cloneTo(spark, mediaAllProto(spark, dir), table)
    val doomed = base.filter(col("media_id") % 20 === 0)
    MediaStore.forgetById(spark, doomed.select(col("media_id")), "media_id", table)
    MediaStore.forgetById(spark, doomed.select(col("media_id")), "media_id", table)
    val stored = graft.sources.ManifestStore.read(spark, table).count()
    val expected = (base.count() - doomed.count()) * 4L
    require(stored == expected,
      s"x227: store holds $stored band rows after forgetById, expected $expected")
    val pairs = MediaStore
      .probe(spark, mediaBlobs(spark, mediaTwins(base)), table, maxDist = 3)
      .select(col("probe_id"), col("store_id"), col("hamming").cast("long").as("hamming"))
    require(!pairs.head(1).isEmpty, "x227: no survivor matches — vacuous gate")
    pairs
  }

  val x227Sql: String = x220Sql

  // --- x228: dedup-store forget by id (the fp-orphan cure) --------------------
  // The fp store is keyed by the CONTENT hash, so a divergent-content
  // forget deterministically strands EVERY one of the subject's
  // (fp, id) rows — and orphaned fp rows keep flagging, so erased
  // content re-submitted still reads "already seen" (REQUIREd visible
  // via a probe of the erased texts). DedupStores.forgetById cures by
  // id alone (narrow locate scan, the x216/x227 cost shape), replayed
  // once; final probe = x171's survivors-only oracle verbatim (same
  // slices).
  def x228DedupForgetById(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.DedupStores
    import graft.sources.ManifestStore
    val docs = t(spark, dir, "documents")
    val inc = docs.filter(col("doc_id") % 5 === 0)
    val hist = docs.filter(col("doc_id") % 5 =!= 0)
    val fpT = FreshTables.next(spark, dir, "fpidcure")
    val idxT = FreshTables.next(spark, dir, "idxidcure")
    DedupStores.build(spark, hist, "doc_id", "text", fpT, idxT)
    val doomed = Dedup.materialize(hist.filter(col("doc_id") % 7 === 2))
    require(doomed.count() > 0L, "x228: empty doomed slice")
    // the divergent request: the supplied text is NOT the ingested bytes
    DedupStores.forget(spark,
      doomed.withColumn("text", lit("qq divergent zz")), "doc_id", "text", fpT, idxT)
    val doomedIds = doomed.select(col("doc_id").as("id"))
    val fpOrphans = ManifestStore.read(spark, fpT)
      .join(doomedIds, Seq("id"), "left_semi").count()
    require(fpOrphans > 0L, "x228: divergent forget stranded no fp orphans")
    // the leak, demonstrated: the erased texts re-probed under fresh ids
    // still flag exact-dup via the orphaned fingerprints
    val leak = DedupStores.probe(spark,
        doomed.select((col("doc_id") + lit(900000000L)).as("doc_id"), col("text")),
        "doc_id", "text", fpT, idxT)
      .filter(col("is_exact_dup")).count()
    require(leak > 0L, "x228: orphaned fps no longer flag — leak demo dead")
    DedupStores.forgetById(spark, doomedIds, "id", fpT, idxT)
    DedupStores.forgetById(spark, doomedIds, "id", fpT, idxT)
    val left = ManifestStore.read(spark, fpT)
      .join(doomedIds, Seq("id"), "left_semi").count()
    require(left == 0L, s"x228: $left fp rows survived the cure")
    DedupStores.probe(spark, inc, "doc_id", "text", fpT, idxT)
      .select(col("doc_id"), col("is_exact_dup"), col("is_near_dup"),
        col("clean"))
  }

  val x228Sql: String = x171Sql

  // --- x229: epoch compaction of the KMV store (k-min set fold) ---------------
  // The third fold algebra (sums x224/x225, maxes x226, k-min unions
  // here): per group, the 3 days' mins arrays fold into one epoch row
  // by union → distinct → k smallest — exact by the same pigeonhole
  // that makes the store read exact, idempotent by construction. Row
  // accounting REQUIREd (one row per group); estimate = x40's oracle,
  // x148's verbatim.
  def x229KmvCompaction(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ws = t(spark, dir, "documents")
      .select(col("lang"), col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "w")))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bg = Dedup.materialize(ws.withColumn("__w1", lead(col("w"), 1).over(byDoc))
      .filter(col("__w1").isNotNull)
      .select(col("lang"), concat_ws(" ", col("w"), col("__w1")).as("bg"))
      .withColumn("day",
        concat(lit("d"), pmod(TextAnalysis.md5Bucket(col("bg")), lit(3)))))
    val table = FreshTables.next(spark, dir, "kmvcompact")
    (0 until 3).foreach { b =>
      Sketches.kmvAppendDay(spark, bg.filter(col("day") === s"d$b"),
        "lang", "bg", s"d$b", table)
    }
    Sketches.kmvCompact(spark, table, "lang", Seq("d0", "d1", "d2"), "epoch:all")
    // replay — the k-min set fold is idempotent
    Sketches.kmvCompact(spark, table, "lang", Seq("d0", "d1", "d2"), "epoch:all")
    val stored = graft.sources.ManifestStore.read(spark, table).count()
    val groups = bg.select(col("lang")).distinct().count()
    require(stored == groups,
      s"x229: store holds $stored sketch rows after compaction, expected $groups")
    Sketches.kmvDistinctFromStore(spark, table, "lang")
  }

  val x229Sql: String = x40Sql

  // --- x230: cross-encoder reranking of the fused candidates ------------------
  // The retrieval pipeline's LAST production stage (retrieve → fuse →
  // rerank): x89's hybrid RRF list joins its candidate-pruned doc
  // texts and one mapPartitions pass batches (query, text) pairs
  // through the scorer — model state per partition, one "call" per
  // batch; the scorer itself is the deterministic md5 STUB (the
  // x191/x218 convention — swap for a real cross-encoder session in
  // deployment), so the oracle replays retrieval + fusion + scoring +
  // the top-5 window bit-for-bit.
  def x230Rerank(spark: SparkSession, dir: String): DataFrame = {
    val out = Retrieval.rerankStub(
      x89RrfFusion(spark, dir), t(spark, dir, "documents"),
      "doc_id", "text", topK = 5, batchSize = 8)
    require(!out.head(1).isEmpty, "x230: empty rerank — vacuous gate")
    out
  }

  val x230Sql: String = {
    val hx = "md5(f.query_id || '|' || coalesce(d.text, ''))"
    s"""SELECT query_id, rank, doc_id, score48 FROM (
         SELECT f.query_id, f.doc_id, ${duckHex48(hx)} AS score48,
           row_number() OVER (PARTITION BY f.query_id
             ORDER BY ${duckHex48(hx)} DESC, f.doc_id) AS rank
         FROM ($x89Sql) f JOIN documents d USING (doc_id))
       WHERE rank <= 5"""
  }

  // --- x231: bloom-prefiltered registry probe ---------------------------------
  // x222's scale path made real: the SAME registry (suiteB retired),
  // probed through the store-fed bloom prefilter — filter built
  // distributed from the stored grams, codegen'd narrow probe, exact
  // verify killing every FP — so the answer equals x222's restricted
  // to contaminated docs (the bloom must be invisible in the result,
  // x55's contract against the maintained store).
  def x231RegistryBloom(spark: SparkSession, dir: String): DataFrame = {
    val (table, docs) = benchRegistryTable(spark, dir, "benchbloom")
    graft.ext.BenchRegistry.retireSuite(spark, "suiteB", table)
    val corpus = docs.filter(col("doc_id") % 50 =!= 0 && col("doc_id") % 50 =!= 25)
    val out = graft.ext.BenchRegistry
      .probeBloom(spark, corpus, "doc_id", "text", table)
      .withColumnRenamed("id", "doc_id")
    require(!out.head(1).isEmpty, "x231: zero contaminated docs — vacuous gate")
    out
  }

  // only docs with >= 1 hit (benchmarkOverlapBloom's inner-join shape)
  val x231Sql: String = {
    val tail = "FROM sizes s LEFT JOIN hits h ON s.doc_id = h.doc_id"
    require(x222Sql.trim.endsWith(tail), "x231: x222Sql tail moved")
    x222Sql + "\n       WHERE COALESCE(h.n_contaminated, 0) > 0"
  }

  // --- x232–x237: the epoch-compaction ROLLOUT (r12 verdict #2) ---------------
  // compactDays (the generic sum/max fold, x224–x226/x229's mechanism)
  // reaches every remaining day-keyed store still accumulating O(days)
  // rows forever. Each gate: build the store exactly as its parent gate
  // does, DOUBLE-compact (fold, replay the fold, then fold the epoch
  // again with the remaining days — the second-generation fold a years-
  // long deployment runs monthly), REQUIRE the row/day accounting, and
  // read — the parent's oracle verbatim, because the fold must be
  // bit-invisible.

  // --- x232: epoch compaction of the count-min store (x114) -------------------
  def x232CmCompaction(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.ManifestStore
    val keys = t(spark, dir, "events")
      .select(col("event_id"), col("user_id").as("k"))
    val table = FreshTables.next(spark, dir, "cmcompact")
    for (d <- 0 to 2)
      Sketches.countMinAppendDay(spark,
        keys.filter(col("event_id") % 3 === d).select(col("k")),
        "k", s"day$d", table, depth = 4, width = 1024)
    Sketches.countMinCompact(spark, table, Seq("day0", "day1"), "epoch:01")
    // replay (crash recovery), then the second-generation fold
    Sketches.countMinCompact(spark, table, Seq("day0", "day1"), "epoch:01")
    Sketches.countMinCompact(spark, table, Seq("epoch:01", "day2"), "epoch:02")
    val days = ManifestStore.read(spark, table).select(col("day")).distinct()
      .collect().map(_.getString(0)).toSeq
    require(days == Seq("epoch:02"), s"x232: post-fold days $days")
    require(ManifestStore.read(spark, table).count() <= 4L * 1024L,
      "x232: folded store exceeds the d×w cell bound")
    val cells = Sketches.countMinCellsFromStore(spark, table)
    val exact = Dedup.materialize(
      keys.groupBy(col("k")).agg(count(lit(1)).as("cnt")))
    val top = Sampling.scoredTopK(exact, "k", col("cnt"), k = 20).drop("sel_rank")
    Sketches.countMinEstimate(cells, top, "k", depth = 4, width = 1024)
      .withColumn("overcount", col("est") - col("cnt"))
  }

  val x232Sql: String = x114Sql

  // --- x233: epoch compaction of the histogram store (x123) -------------------
  def x233HistCompaction(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.ManifestStore
    val docs = t(spark, dir, "documents").select(col("doc_id"), col("n_chars"))
    val table = FreshTables.next(spark, dir, "histcompact")
    for (d <- 0 to 2)
      Sketches.histAppendDay(spark,
        docs.filter(col("doc_id") % 3 === d).select(col("n_chars")),
        "n_chars", bucketWidth = 32L, day = s"day$d", table = table)
    Sketches.histCompact(spark, table, Seq("day0", "day1"), "epoch:01")
    Sketches.histCompact(spark, table, Seq("day0", "day1"), "epoch:01")
    Sketches.histCompact(spark, table, Seq("epoch:01", "day2"), "epoch:02")
    val stored = ManifestStore.read(spark, table).count()
    val buckets = docs.filter(col("n_chars").isNotNull)
      .select(expr("n_chars div 32L")).distinct().count()
    require(stored == buckets,
      s"x233: folded store holds $stored rows, expected one per live bucket ($buckets)")
    Sketches.histQuantiles(
      Sketches.histCellsFromStore(spark, table), bucketWidth = 32L,
      qs = Seq(0.5, 0.9, 0.99))
  }

  val x233Sql: String = x123Sql

  // --- x234: epoch compaction of the vocabulary store (x202) ------------------
  def x234VocabCompaction(spark: SparkSession, dir: String): DataFrame = {
    val docs = Dedup.materialize(t(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .withColumn("day", pmod(col("doc_id"), lit(3)).cast("long")))
    val table = FreshTables.next(spark, dir, "vocabcompact")
    (0 until 3).foreach { b =>
      graft.ext.Bpe.vocabAppendDay(spark,
        docs.filter(col("day") === b.toLong), "doc_id", "text", s"d$b", table)
    }
    graft.ext.Bpe.vocabCompact(spark, table, Seq("d0", "d1"), "epoch:01")
    graft.ext.Bpe.vocabCompact(spark, table, Seq("d0", "d1"), "epoch:01")
    graft.ext.Bpe.vocabCompact(spark, table, Seq("epoch:01", "d2"), "epoch:02")
    val stored = graft.sources.ManifestStore.read(spark, table).count()
    val expected = graft.ext.LangModel.tokenRows(docs, "doc_id", "text")
      .select(col("w")).distinct().count()
    require(stored == expected,
      s"x234: folded store holds $stored rows, expected one per distinct word ($expected)")
    graft.ext.Bpe.learnMergesFromStore(spark, table, rounds = 2)
  }

  val x234Sql: String = x202Sql

  // --- x235: epoch compaction of the bigram-LM store (x207) -------------------
  // The fold's one non-sum statistic — V = distinct stored unigrams —
  // survives because the fold GROUPS BY w (the live word set is
  // invariant under collapsing day subtotals); REQUIREd explicitly.
  def x235LmCompaction(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.ManifestStore
    val docs = t(spark, dir, "documents")
    val ref = Dedup.materialize(docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("text"))
      .withColumn("day", pmod(col("doc_id"), lit(3)).cast("long")))
    val table = FreshTables.next(spark, dir, "lmcompact")
    (0 until 3).foreach { b =>
      LangModel.lmAppendDay(spark, ref.filter(col("day") === b.toLong),
        "doc_id", "text", s"d$b", table)
    }
    LangModel.lmCompact(spark, table, Seq("d0", "d1"), "epoch:01")
    LangModel.lmCompact(spark, table, Seq("d0", "d1"), "epoch:01")
    LangModel.lmCompact(spark, table, Seq("epoch:01", "d2"), "epoch:02")
    val v = ManifestStore.read(spark, s"$table/uni").count()
    val expected = LangModel.tokenRows(ref, "doc_id", "text")
      .select(col("w")).distinct().count()
    require(v == expected,
      s"x235: folded uni table holds $v rows, expected one per distinct word " +
        s"($expected) — V (the vocabulary size) would be wrong")
    val bgDays = ManifestStore.read(spark, s"$table/bg").select(col("day"))
      .distinct().collect().map(_.getString(0)).toSeq
    require(bgDays == Seq("epoch:02"), s"x235: bg days $bgDays")
    LangModel.perplexityFromStore(spark, table, docs, "doc_id", "text")
  }

  val x235Sql: String = x207Sql

  // --- x236: epoch compaction of the data-card stores (x88) -------------------
  // All four subtotal tables fold in one call; the card's non-sum
  // columns (n_langs = distinct langs, dup mass over per-fp totals)
  // survive because the folds preserve the group-key sets.
  def x236CardCompaction(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.ManifestStore
    val docs = t(spark, dir, "documents")
    val root = FreshTables.next(spark, dir, "cardcompact")
    for (d <- 0 to 2)
      DataCard.appendDay(spark, docs.filter(col("doc_id") % 3 === d), s"day$d", root)
    DataCard.compactDays(spark, root, Seq("day0", "day1"), "epoch:01")
    DataCard.compactDays(spark, root, Seq("day0", "day1"), "epoch:01")
    DataCard.compactDays(spark, root, Seq("epoch:01", "day2"), "epoch:02")
    for (sub <- Seq("base", "lang", "len", "fp")) {
      val days = ManifestStore.read(spark, s"$root/$sub").select(col("day"))
        .distinct().collect().map(_.getString(0)).toSeq
      require(days == Seq("epoch:02"), s"x236: $sub days $days")
    }
    DataCard.cardFromStore(spark, root)
  }

  val x236Sql: String = x88Sql

  // --- x237: epoch compaction of the aggregate view (x179/x181) ---------------
  // Folds the positive day subtotals TOGETHER WITH a __forget_<seq>
  // correction day: readAgg's re-sum is bit-identical (x181's
  // survivors-only oracle verbatim), and the (subtotal, correction)
  // pair that could reconstruct the forgotten subject's contribution is
  // destroyed — the x225 ledger-destruction pattern on the view family.
  def x237ViewCompaction(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.ViewStore
    import graft.sources.ManifestStore
    val li = t(spark, dir, "lineitem").select(
      col("l_orderkey").as("okey"), col("l_linenumber"), col("l_quantity"))
    val root = FreshTables.next(spark, dir, "viewcompact")
    ProtoStores.cloneTo(spark, aggViewProto(spark, dir), root)
    val doomed = li.filter(col("okey") % 11 === 3)
    ViewStore.forgetA(spark, root, doomed, "okey",
      Seq("okey", "l_linenumber"), forgetSeq = 1L,
      groupCols = Seq("o_orderpriority"), sumCols = Seq("l_quantity"))
    val preDays = ManifestStore.read(spark, s"$root/aggview").select(col("day"))
      .distinct().collect().map(_.getString(0)).toSet
    require(preDays == Set("d1", "d2", "__forget_1"),
      s"x237: pre-fold agg days $preDays — the correction day is missing")
    ViewStore.compactAgg(spark, root, Seq("d1", "d2", "__forget_1"), "epoch:01",
      Seq("o_orderpriority"), Seq("l_quantity"))
    ViewStore.compactAgg(spark, root, Seq("d1", "d2", "__forget_1"), "epoch:01",
      Seq("o_orderpriority"), Seq("l_quantity"))
    val postDays = ManifestStore.read(spark, s"$root/aggview").select(col("day"))
      .distinct().collect().map(_.getString(0)).toSeq
    require(postDays == Seq("epoch:01"), s"x237: post-fold agg days $postDays")
    ViewStore.readAgg(spark, root,
      groupCols = Seq("o_orderpriority"), sumCols = Seq("l_quantity"))
  }

  val x237Sql: String = x181Sql

  // --- x238: epoch compaction of the sample store (x195) ----------------------
  // The fold with a LAW, not just an algebra: day summaries fold by the
  // x229 pigeonhole (the union's top-(k+slack) survives), but the slack
  // budgets fold too — N days' budgets collapse into ONE epoch budget,
  // re-derived full because the epoch row set is recomputed from
  // survivors. The gate drives forget → fold → forget → fold → read
  // (exact at every step, x195's oracle), and REQUIREs the refusal when
  // a day past its slack budget would be folded (the breach must stay
  // accountable — SampleStore.compactDays' fence).
  def x238SampleCompaction(spark: SparkSession, dir: String): DataFrame = {
    val docs = Dedup.materialize(t(spark, dir, "documents")
      .select(col("doc_id"), TextAnalysis.wordCount(col("text")).as("wc"))
      .withColumn("day", pmod(col("doc_id"), lit(3)).cast("long")))
    val table = FreshTables.next(spark, dir, "samplecompact")
    (0 until 3).foreach { b =>
      SampleStore.appendDay(spark, docs.filter(col("day") === b.toLong),
        "doc_id", col("wc"), s"d$b", k = 100, slack = 8, table = table)
    }
    // forget the global top-4 (within every day's slack), fold, replay
    val d1 = SampleStore.sampleFromStore(spark, table, "doc_id", 4)
      .select(col("doc_id"))
    SampleStore.forget(spark, table, "doc_id", d1, forgetSeq = 1L)
    SampleStore.compactDays(spark, table, "doc_id", Seq("d0", "d1"), "epoch:01")
    SampleStore.compactDays(spark, table, "doc_id", Seq("d0", "d1"), "epoch:01")
    // post-fold forget (spends the EPOCH's budget), then the
    // second-generation fold
    val d2 = SampleStore.sampleFromStore(spark, table, "doc_id", 4)
      .select(col("doc_id"))
    SampleStore.forget(spark, table, "doc_id", d2, forgetSeq = 2L)
    SampleStore.compactDays(spark, table, "doc_id", Seq("epoch:01", "d2"), "epoch:02")
    // the refusal fence, on a sacrificial store: slack=2, 3 forgets
    val mini = FreshTables.next(spark, dir, "samplebreach")
    SampleStore.appendDay(spark, docs, "doc_id", col("wc"), "d0",
      k = 5, slack = 2, table = mini)
    SampleStore.forget(spark, mini, "doc_id",
      SampleStore.sampleFromStore(spark, mini, "doc_id", 3).select(col("doc_id")),
      forgetSeq = 1L)
    val refused =
      try { SampleStore.compactDays(spark, mini, "doc_id", Seq("d0"), "epoch:x"); false }
      catch { case e: IllegalArgumentException => e.getMessage.contains("slack budget") }
    require(refused, "x238: a past-budget day folded without refusal")
    // the maintained read: bit-identical to the batch sample over the
    // survivors (global ranks 1–8 forgotten) — x195's oracle verbatim
    SampleStore.sampleFromStore(spark, table, "doc_id", 100)
  }

  val x238Sql: String = x195Sql

  // --- x239: the heavy-hitter store is NOT foldable — and refuses loudly ------
  // The one day-keyed store compactDays must never touch: the TA/TPUT
  // read pads each candidate by the kth of exactly the days SILENT on
  // it, and a fold forgets which days those were — a "successful"
  // compaction would silently loosen every certified threshold. The
  // hh tables carry the no_epoch_fold sidecar tag; the gate REQUIREs
  // the naive fold path to fail loudly on BOTH sub-tables, then reads
  // the untouched store — x176's oracle verbatim.
  def x239HhNoFold(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.ManifestStore
    val docs = t(spark, dir, "documents")
    val toks = Dedup.materialize(
      LangModel.tokenRows(docs, "doc_id", "text")
        .withColumn("day", pmod(col("id"), lit(3L))))
    val table = FreshTables.next(spark, dir, "hhnofold")
    (0 until 3).foreach { b =>
      Sketches.hhAppendDay(spark, toks.filter(col("day") === b.toLong),
        "w", s"d$b", table)
    }
    for (sub <- Seq("hh", "totals")) {
      val refused =
        try {
          ManifestStore.compactDays(spark, s"$table/$sub", "day",
            groupCols = Seq("day"), sumCols = Seq("n"),
            foldDays = Seq("d0", "d1"), epochDay = "epoch:01")
          false
        } catch {
          case e: IllegalStateException => e.getMessage.contains("no_epoch_fold")
        }
      require(refused, s"x239: compactDays on $sub did not refuse")
    }
    Sketches.hhFromStore(spark, table, minFractionDen = 50L)
  }

  val x239Sql: String = x176Sql

  // --- x240: the streaming corpus funnel decontaminates from the REGISTRY -----
  // The registry's production story completed (r12 verdict #5): daily
  // corpus increments arrive as micro-batches and are probed inside
  // foreachBatch against the MAINTAINED gram registry (one store read
  // per batch — the benchmark texts are never re-tokenized), results
  // folded into a keyed ManifestStore table; one batch re-delivered
  // post-drain (the probe is deterministic and the merge keyed, so
  // at-least-once converges). Read ≡ x222's one-shot probe (suiteB
  // retired) — the registry read is bit-invisible to the answer.
  def x240StreamRegistry(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import graft.sources.ManifestStore
    val (regT, docs) = benchRegistryTable(spark, dir, "streamreg")
    graft.ext.BenchRegistry.retireSuite(spark, "suiteB", regT)
    val corpus = Dedup.materialize(
      docs.filter(col("doc_id") % 50 =!= 0 && col("doc_id") % 50 =!= 25)
        .select(col("doc_id"), col("text"))
        .withColumn("day", pmod(col("doc_id"), lit(3)).cast("long")))
    val table = FreshTables.next(spark, dir, "streamregout")
    val base = FreshTables.next(spark, dir, "streamregin")
    (0 until 3).foreach { b =>
      corpus.filter(col("day") === b.toLong).repartition(1)
        .write.mode("append").parquet(s"$base/in")
    }
    def fold(batch: DataFrame): Unit = {
      val out = graft.ext.BenchRegistry
        .probe(spark, batch, "doc_id", "text", regT)
        .withColumn("pt", pmod(col("id"), lit(8L)))
      if (!out.head(1).isEmpty)
        ManifestStore.mergeOrCreate(spark, table, out, Seq("id"), "pt")
    }
    val stream = spark.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) => fold(batch) }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      if (!q.awaitTermination(300000))
        throw new RuntimeException("x240: drain timeout")
    } finally q.stop()
    // at-least-once: re-deliver day 1 — keyed merge replaces in place
    fold(corpus.filter(col("day") === 1L))
    val out = ManifestStore.read(spark, table).select(
      col("id").cast("long").as("doc_id"), col("n_grams"),
      col("n_contaminated"), col("contamination_ratio"))
    require(out.agg(sum(col("n_contaminated"))).head().getLong(0) > 0L,
      "x240: zero contamination hits — vacuous gate")
    out
  }

  val x240Sql: String = x222Sql

  // --- x241: heavy-hitter RETENTION pruning -----------------------------------
  // The alternative x239's refusal names, made real: hh day summaries
  // cannot fold, but days past the monitoring horizon DROP outright —
  // the bounds over the retained window are exactly "heavy hitters over
  // the last N days", and the store stays O(retained days × m). The
  // gate simulates the torn prune window first (summaries deleted,
  // totals not — hhFromStore's fence REQUIREd to refuse), then replays
  // hhPruneDays to convergence (twice — idempotent) and reads the
  // retained window; oracle = the frequency threshold over the
  // retained days' docs only.
  def x241HhRetention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.sources.ManifestStore
    val docs = t(spark, dir, "documents")
    val toks = Dedup.materialize(
      LangModel.tokenRows(docs, "doc_id", "text")
        .withColumn("day", pmod(col("id"), lit(3L))))
    val table = FreshTables.next(spark, dir, "hhretain")
    (0 until 3).foreach { b =>
      Sketches.hhAppendDay(spark, toks.filter(col("day") === b.toLong),
        "w", s"d$b", table)
    }
    // simulated crash: the prune's FIRST delete landed (summaries),
    // the totals delete didn't — the day sets diverge and the
    // torn-window fence must refuse the read
    ManifestStore.delete(spark, s"$table/hh",
      Seq("d0").toDF("day"), Seq("day"), Seq("day"))
    val refused =
      try { Sketches.hhFromStore(spark, table, 50L).head(1); false }
      catch { case e: IllegalArgumentException => e.getMessage.contains("diverge") }
    require(refused, "x241: torn prune window was not refused")
    // the cure: replay the prune — keyed deletes converge; twice for
    // idempotence
    Sketches.hhPruneDays(spark, table, Seq("d0"))
    Sketches.hhPruneDays(spark, table, Seq("d0"))
    val daysLeft = ManifestStore.read(spark, s"$table/totals")
      .select(col("day")).distinct().collect().map(_.getString(0)).sorted.toSeq
    require(daysLeft == Seq("d1", "d2"), s"x241: retained days $daysLeft")
    Sketches.hhFromStore(spark, table, minFractionDen = 50L)
  }

  // x176's oracle over the retained window's docs only
  val x241Sql: String = {
    val anchor = "FROM documents)"
    require(x176Sql.contains(anchor), "x241: x176Sql anchor moved")
    x176Sql.replace(anchor, "FROM documents WHERE doc_id % 3 <> 0)")
  }
}
