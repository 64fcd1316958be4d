package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk audits for release hygiene: k-anonymity / l-diversity
  * over quasi-identifier (QI) combinations (Sweeney; Machanavajjhala et
  * al.). The corpus-release complement of the PII span redaction in
  * [[Redaction]]: redaction scrubs values INSIDE a document, this audits
  * whether the row-level metadata published WITH each document (source,
  * language, length band, ...) re-identifies individuals by rare
  * combination.
  *
  * 100 TB design: one map-side-combined groupBy on the QI tuple — the
  * output is O(distinct QI combinations), never row-sized; l-diversity
  * rides the same shuffle as an exact count_distinct of the sensitive
  * column per class (a second shuffle keyed by (QI, sensitive) would be
  * the exact-distinct expansion — at this cardinality Spark's
  * count_distinct plans it automatically). No row leaves its executor
  * un-aggregated.
  */
object Privacy {

  /** k-anonymity + l-diversity audit: one row per QI equivalence class
    * with its size, the number of distinct sensitive values it exposes,
    * and an at-risk flag (class smaller than k — publishable only after
    * suppression or generalization).
    *
    * @param sensitiveCol column whose values the adversary learns on
    *                     re-identification (drives `l_distinct`)
    */
  def kAnonymityAudit(
      df: DataFrame,
      qiCols: Seq[String],
      sensitiveCol: String,
      k: Long): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(
        count(lit(1)).as("class_size"),
        count_distinct(col(sensitiveCol)).as("l_distinct"))
      .withColumn("at_risk", col("class_size") < k)

  /** ε-DP counts with CONTRIBUTION BOUNDING — the piece [[dpNoisyCounts]]
    * assumes away: a user who contributes many rows to one group raises
    * the count query's sensitivity to their row count, so the mechanism
    * first caps each (user, group) at `capPerUser` rows (keeping the
    * first by `orderCol` — a deterministic, user-data-independent rule)
    * and then adds Laplace(cap/ε) noise, the scale the bounded
    * sensitivity actually requires. This is the standard user-level-DP
    * preprocessing (cf. Wilson et al. 2020's differentially private SQL).
    *
    * Spark shape: one windowed rank per (user, group) — the only
    * row-sized stage, shuffling on the composite key — then the same
    * O(groups) narrow noise map as dpNoisyCounts. Same seed-secrecy
    * contract; `includeBounded` is the gates' audit flag for the
    * pre-noise bounded count.
    */
  def dpBoundedCounts(
      df: DataFrame,
      userCol: String,
      groupCol: String,
      orderCol: String,
      capPerUser: Int,
      epsilon: Double,
      seed: String,
      includeBounded: Boolean = false): DataFrame = {
    require(capPerUser >= 1, s"dpBoundedCounts: capPerUser=$capPerUser")
    require(epsilon > 0, s"dpBoundedCounts: epsilon=$epsilon")
    require(seed.nonEmpty, "dpBoundedCounts: a secret seed is required")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol), col(groupCol)).orderBy(col(orderCol))
    val bounded = df
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= capPerUser)
    val u48 = conv(substring(md5(concat(lit(seed), lit("|"),
      col(groupCol).cast("string"))), 1, 12), 16, 10).cast("double")
    val u = (u48 + lit(0.5d)) / lit(281474976710656.0d)
    val cent = u - lit(0.5d)
    val noise = (lit(-capPerUser.toDouble / epsilon) * signum(cent)) *
      log(lit(1.0d) - lit(2.0d) * abs(cent))
    val agg = bounded.groupBy(col(groupCol)).agg(count(lit(1)).as("n_bounded"))
      .withColumn("n_noisy", round(col("n_bounded").cast("double") + noise, 6))
    if (includeBounded) agg else agg.drop("n_bounded")
  }

  /** ε-DP quantile via the EXPONENTIAL MECHANISM over a DATA-INDEPENDENT
    * bounded integer domain (McSherry & Talwar 2007; the quantile
    * instantiation in Smith 2011) — the release-hygiene complement of
    * [[dpNoisyCounts]] for "publish the median doc length per source"
    * questions, where Laplace noise on a post-hoc quantile has unbounded
    * sensitivity.
    *
    * The candidate set is EVERY integer in the caller-supplied `[lo,
    * hi]` (values clip into it first — a per-record transform, so
    * neighboring datasets stay neighbors). A data-dependent support
    * (e.g. the observed distinct values) would NOT be ε-DP: removing the
    * only row holding value v drops P[output = v] from positive to zero,
    * an unbounded privacy-loss ratio. Here every candidate keeps
    * positive weight on every neighboring dataset, so the standard
    * analysis applies: utility is the negative distance from the target
    * rank `q·n` to the candidate's occupied rank interval `[below,
    * below+eq]`; one row added or removed moves `below`/`eq` by ≤ 1 and
    * `q·n` by ≤ 1, so Δu ≤ 2 and weights are `exp(ε·u/(2Δu)) =
    * exp(−ε·dist/4)`.
    *
    * COST stays O(groups × observed distinct values), NOT O(domain):
    * consecutive unobserved integers share (below, eq) and therefore
    * weight, so the domain compresses into RUNS — one singleton run per
    * observed value, one gap run between neighbors (width = gap size,
    * weight = width × per-integer weight), one leading run from `lo`.
    * Selection walks the run-level cumulative weights and then indexes
    * into the chosen run by exact integer division.
    *
    * Engine-portable selection: per-integer weights round to 1e-9
    * fixed-point LONGs, run weights and the cumulative scan are exact
    * LONG arithmetic, and the draw is `floor(u01 · Σw)` with u01 from
    * md5(seed ∥ group) — integer compare and integer div from there, so
    * both engines select the identical value. Same seed-secrecy
    * contract as [[dpNoisyCounts]]: the draw is deterministic in (seed,
    * group) — treat `seed` as key material. (The 1e-9 rounding and the
    * single seeded draw are the portability convention, not part of the
    * privacy analysis; a hostile-auditor deployment would swap in real
    * randomness per release.)
    *
    * Output: (groupCol, dp_quantile).
    */
  def dpQuantile(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      q: Double,
      epsilon: Double,
      seed: String,
      lo: Long,
      hi: Long): DataFrame = {
    require(q > 0 && q < 1, s"dpQuantile: q=$q")
    require(epsilon > 0, s"dpQuantile: epsilon=$epsilon")
    require(seed.nonEmpty, "dpQuantile: a secret seed is required")
    require(lo <= hi, s"dpQuantile: empty candidate domain [$lo, $hi]")
    // hi + 1 rides through the gap-run arithmetic; Long.MaxValue would
    // wrap it negative and silently corrupt every trailing run
    require(hi < Long.MaxValue, "dpQuantile: hi must be < Long.MaxValue")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"))
    val dist = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("g"),
        least(greatest(col(valueCol).cast("long"), lit(lo)), lit(hi)).as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("below", coalesce(
        sum(col("cnt")).over(w.rowsBetween(Long.MinValue, -1)), lit(0L)))
      .withColumn("next_v", coalesce(lead(col("v"), 1).over(w), lit(hi + 1L)))
      .withColumn("n", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
    // the run table: every integer in [lo, hi] belongs to exactly one run
    // and shares (below, eq) with its run-mates
    val single = dist.select(col("g"), col("v").as("start"),
      lit(1L).as("width"), col("below"), col("cnt").as("eq"), col("n"))
    val gaps = dist
      .select(col("g"), (col("v") + lit(1L)).as("start"),
        (col("next_v") - col("v") - lit(1L)).as("width"),
        (col("below") + col("cnt")).as("below"), lit(0L).as("eq"), col("n"))
      .filter(col("width") > 0L)
    val leading = dist.filter(col("below") === 0L)
      .select(col("g"), lit(lo).as("start"), (col("v") - lit(lo)).as("width"),
        lit(0L).as("below"), lit(0L).as("eq"), col("n"))
      .filter(col("width") > 0L)
    val runs = single.unionByName(gaps).unionByName(leading)
    val qn = lit(q) * col("n").cast("double")
    val d = greatest(
      col("below").cast("double") - qn,
      qn - (col("below") + col("eq")).cast("double"),
      lit(0.0d))
    // w19 = per-INTEGER fixed-point weight; rw = the run's total
    val weighted = runs
      .withColumn("w19", round(exp(lit(-epsilon / 4.0d) * d) * lit(1e9d), 0).cast("long"))
      .withColumn("rw", col("width") * col("w19"))
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("start"))
    val cum = weighted
      .withColumn("cw", sum(col("rw")).over(wRun.rowsBetween(Long.MinValue, 0)))
      .withColumn("tw", sum(col("rw")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
    val u48 = conv(substring(md5(concat(lit(seed), lit("|"),
      col("g").cast("string"))), 1, 12), 16, 10).cast("double")
    val draw = floor(((u48 + lit(0.5d)) / lit(281474976710656.0d)) *
      col("tw").cast("double")).cast("long")
    // the chosen run is the FIRST whose inclusive cumulative weight
    // exceeds the draw (cw is nondecreasing in start, so min_by start);
    // within it, exact integer division locates the candidate. The
    // `w19 > 0` guard only protects NON-chosen rows from a div-by-zero
    // — a zero-weight run can never be chosen (its cw equals its
    // predecessor's, so `cw > draw` already held there).
    cum.withColumn("__draw", draw)
      .filter(col("cw") > col("__draw"))
      .withColumn("__v", expr(
        "CASE WHEN w19 > 0 THEN start + (__draw - (cw - rw)) div w19 ELSE start END"))
      .groupBy(col("g")).agg(min_by(col("__v"), col("start")).as("dp_quantile"))
      .select(col("g").as(groupCol), col("dp_quantile"))
  }

  /** ε-differentially-private release counts (Laplace mechanism,
    * sensitivity 1) with a SEEDED engine-portable noise draw: the
    * uniform u = (hex48(md5(seed ∥ "|" ∥ group)) + 0.5)/2⁴⁸ ∈ (0,1)
    * feeds the Laplace inverse CDF −(1/ε)·sgn(u−½)·ln(1−2|u−½|).
    *
    * The privacy of the release rests ENTIRELY on `seed` staying secret:
    * the draw is a deterministic function of (seed, group), so a
    * published or guessable seed lets an adversary reconstruct the noise
    * and recover the exact counts — callers must treat `seed` like key
    * material (the gate fixture uses a checked-in seed precisely because
    * its output is NOT a privacy release, just a portability oracle).
    * `n_exact` is the raw count the mechanism exists to hide; it is
    * emitted only under `includeExact = true`, the explicit audit flag
    * the gates set — a real release keeps the default and publishes only
    * `n_noisy`. The Spark shape — noise as a narrow codegen'd map over
    * the ALREADY-aggregated groups — is the production path unchanged.
    */
  def dpNoisyCounts(
      df: DataFrame,
      groupCol: String,
      epsilon: Double,
      seed: String,
      includeExact: Boolean = false): DataFrame = {
    require(epsilon > 0, s"dpNoisyCounts: epsilon=$epsilon")
    require(seed.nonEmpty, "dpNoisyCounts: a secret seed is required — " +
      "the noise draw is deterministic in (seed, group)")
    val u48 = conv(substring(md5(concat(lit(seed), lit("|"),
      col(groupCol).cast("string"))), 1, 12), 16, 10).cast("double")
    val u = (u48 + lit(0.5d)) / lit(281474976710656.0d)
    val cent = u - lit(0.5d)
    // pinned order: ((−(1/ε)) · sgn) · ln
    val noise = (lit(-1.0d / epsilon) * signum(cent)) *
      log(lit(1.0d) - lit(2.0d) * abs(cent))
    val agg = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_exact"))
      .withColumn("n_noisy", round(col("n_exact").cast("double") + noise, 6))
    if (includeExact) agg else agg.drop("n_exact")
  }
}
