package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR — Xie et al. 2023,
  * public method): score every raw document by how target-like its
  * hashed-n-gram feature distribution is, then keep the top-weighted
  * slice. The importance weight of a document is
  *
  *   log w(d) = Σ_{tokens t ∈ d} log( p_target(b(t)) / p_raw(b(t)) )
  *
  * over hashed unigram buckets b(t), both distributions add-one smoothed
  * over B buckets. (The paper hashes unigram+bigram features into 10k
  * buckets; unigrams into [[DefaultBuckets]] keep the oracle tractable
  * while exercising the identical shape.)
  *
  * 100 TB design: the bucket table is O(B) rows regardless of corpus
  * size — two tiny broadcasts; the corpus pays one codegen'd token
  * explode (reused by both the count and the score pass) and one groupBy
  * on the doc id. Selection composes with [[Sampling.scoredTopK]]
  * (two-stage salted exact top-k — no global sort of the corpus).
  *
  * Determinism: the bucket hash is the md5 48-bit prefix mod B (portable
  * to any engine); per-bucket log-ratios are rounded to 1e-9 and summed
  * per doc as LONGs (order-free exact sum). Unlike LangModel's MEAN, the
  * weight is a raw sum, so a last-ulp `ln` flip in one bucket is
  * amplified by that bucket's in-doc token count (~1e-9 × count) — the
  * output therefore rounds to 4 dp, which absorbs flips up to ~50k
  * same-bucket tokens per document; ranking ties introduced by the
  * coarser rounding break on the doc id in both engines.
  */
object Dsir {

  val DefaultBuckets = 1024

  /** Hashed feature bucket in [0, buckets): md5 48-bit prefix mod B. */
  def bucket(w: Column, buckets: Int): Column =
    pmod(org.apache.spark.sql.graftfn.HashExpressions.md5Prefix48(w), lit(buckets.toLong))

  /** Per-document DSIR importance weight: (idCol, n_toks, log_w), one row
    * per document with ≥ 1 token. `isTarget` marks the rows whose token
    * distribution defines the target; the raw distribution is ALL of
    * `docs` (target ⊆ raw, as in the paper's raw-corpus setting).
    */
  def importanceWeights(
      docs: DataFrame,
      isTarget: Column,
      idCol: String,
      textCol: String,
      buckets: Int = DefaultBuckets): DataFrame = {
    val tk = docs
      .select(col(idCol).as("id"), isTarget.as("tgt"),
        explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("w"))
      .filter(col("w") =!= "")
      .select(col("id"), col("tgt"), bucket(col("w"), buckets).as("b"))
    val counts = tk.groupBy(col("b")).agg(
      count(lit(1)).as("cr"),
      sum(when(col("tgt"), lit(1L)).otherwise(lit(0L))).as("ct"))
    val tot = counts.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    val ratio =
      ((col("ct") + lit(1L)).cast("double") / (col("nt") + lit(buckets.toLong)).cast("double")) /
        ((col("cr") + lit(1L)).cast("double") / (col("nr") + lit(buckets.toLong)).cast("double"))
    val lr = counts.crossJoin(broadcast(tot))
      .select(col("b"), round(log(ratio) * lit(1e9d), 0).cast("long").as("lr9"))
    tk.join(broadcast(lr), "b")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("lr9")).as("slr"))
      .select(col("id").as(idCol), col("n_toks"),
        round(col("slr").cast("double") / lit(1e9d), 4).as("log_w"))
  }
}
