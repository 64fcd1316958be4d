package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (extension surface, SURVEY.md
  * §2.12). A 100 TB corpus question — "how many distinct n-grams /
  * URLs / users per group?" — cannot afford an exact `count(DISTINCT)`
  * shuffle of every distinct value to one reducer per group. The KMV
  * (k-minimum-values) sketch answers it with O(k) state per group:
  * keep the k smallest values of a uniform hash; the k-th smallest
  * order statistic estimates the distinct count as
  * `(k-1) / v_k` with `v_k` normalized to (0,1] (Bar-Yossef et al.
  * 2002; the estimator in public DataSketches docs).
  *
  * Unlike HLL, KMV with a fixed hash is fully deterministic AND
  * engine-portable — md5-hex order statistics compare identically as
  * strings in any engine, so a DuckDB oracle can replicate the sketch
  * bit-for-bit (the same trick [[Sampling]] uses for rank sampling).
  * The estimate is one IEEE division of exactly-represented integers —
  * bit-identical everywhere.
  *
  * Scale shape (mergeability is the whole point): stage 1 computes a
  * partial sketch per (group, salt) — `groupBy` with map-side combine,
  * bounded k-array state; stage 2 merges the `saltBuckets` partials
  * per group (union → distinct → k smallest), a shuffle of
  * O(groups × saltBuckets × k) hex strings, never of the data. This is
  * exactly how sketch libraries distribute: partial sketches up, one
  * merge down.
  */
object Sketches {

  /** Distinct-count KMV sketch of `valueCol` within each `groupCol`.
    * Returns one row per group: `n_vals` (number of hashes the sketch
    * retains, = min(k, distinct)), `kth_hash` (the k-th smallest
    * md5-hex, null when distinct < k) and `est_distinct` — the KMV
    * estimate when the sketch is full, else the exact retained count
    * (the sketch IS the distinct set when distinct < k).
    *
    * The 48-bit hash domain (first 12 md5 hex chars) keeps the
    * normalizing constant 2^48 exact in a double; collisions in 2^48
    * are immaterial at sketch precision (k=64 → ~12% RSE).
    */
  def kmvDistinct(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Int = 64,
      saltBuckets: Int = 8): DataFrame = {
    require(k > 1 && saltBuckets > 0, s"kmvDistinct: k=$k, saltBuckets=$saltBuckets")
    val g = col(groupCol)
    val hx = substring(md5(col(valueCol).cast("string")), 1, 12)
    // stage 1: partial sketch per (group, salt) — collect_set is the
    // bounded-state partial aggregate; slice caps it at k post-sort
    val partial = df
      .select(g.as("g"), hx.as("hx"),
        pmod(xxhash64(col(valueCol)), lit(saltBuckets)).as("__salt"))
      .groupBy(col("g"), col("__salt"))
      .agg(slice(array_sort(collect_set(col("hx"))), 1, k).as("mins"))
    // stage 2: merge partials per group — union, dedupe, k smallest
    val merged = partial.groupBy(col("g"))
      .agg(slice(array_sort(array_distinct(flatten(collect_list(col("mins"))))), 1, k)
        .as("mins"))
    merged.select(
      col("g").as(groupCol),
      size(col("mins")).cast("long").as("n_vals"),
      when(size(col("mins")) === k, element_at(col("mins"), k)).as("kth_hash"),
      when(size(col("mins")) === k,
        lit((k - 1).toDouble) /
          (conv(element_at(col("mins"), k), 16, 10).cast("double") / lit(2.0d * (1L << 47))))
        .otherwise(size(col("mins")).cast("double"))
        .as("est_distinct"))
  }
}
