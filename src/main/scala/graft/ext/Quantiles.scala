package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed quantiles without a per-group sort funnel.
  *
  * The naive exact algorithm — `row_number()` over every ROW of a group —
  * sorts each group in a single task: at 100 TB a hot group is a straggler
  * (or an OOM). This operator exploits that quantiles only depend on the
  * VALUE DISTRIBUTION: stage 1 aggregates to (group, value, count) with
  * map-side combine — the shuffle carries one row per DISTINCT value, not
  * per input row; stage 2 runs the cumulative-count window over that
  * (much smaller) distribution and picks, for each requested q, the
  * smallest value whose cumulative count reaches the target rank.
  *
  * Best for integral / bounded-cardinality metrics (lengths, token
  * counts, scores at fixed precision) where distinct ≪ rows. For
  * unbounded continuous values, pre-bucket first (the x25 histogram
  * path) — an exact quantile of raw doubles is a full sort by
  * definition, on any engine.
  *
  * Nearest-rank-lower definition, 1-based: rank(q) = floor(q·(n−1)) + 1 —
  * always an actual data value (no interpolation), deterministic, and
  * reproducible relationally in any engine, which is what makes the
  * DuckDB oracle exact.
  */
object Quantiles {

  /** Robust per-group outlier stats: exact median, exact MAD (median
    * absolute deviation — the robust scale estimator; public statistics,
    * e.g. Leys et al. 2013's MAD-based outlier recipe), and the count of
    * rows whose |value − median| exceeds `k`×MAD. Entirely integer
    * arithmetic for integral value columns (nearest-rank medians ARE
    * data values), so any engine reproduces it bit-for-bit.
    *
    * Exactly two corpus passes: the median pass, then one aggregation to
    * the (group, |dev|, count) distribution — MAD, n, and the outlier
    * count all derive from that distribution under one group-partitioned
    * window, so no third row-level scan exists. Both shuffles carry
    * distinct values, never rows; the only broadcasts are the O(groups)
    * median/MAD tables. Output: (groupCols*, n, median, mad, n_outliers).
    */
  def robustOutlierStats(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Int = 3): DataFrame = {
    val gs = groupCols.map(col)
    val med = groupQuantiles(df, groupCols, valueCol, Seq(0.5))
      .select(gs :+ col(valueCol).as("__med"): _*)
    // second (and last) corpus pass: aggregate straight to the
    // (group, median, |dev|, count) DISTRIBUTION — the MAD pick, n, and
    // the outlier count all derive from it, so no third row-level scan
    val devDist = df.filter(col(valueCol).isNotNull)
      .join(broadcast(med), groupCols)
      .groupBy(gs ++ Seq(col("__med"),
        abs(col(valueCol) - col("__med")).as("__dev")): _*)
      .agg(count(lit(1)).as("__c"))
    val byDev = Window.partitionBy(gs: _*).orderBy(col("__dev"))
    val whole = Window.partitionBy(gs: _*)
    val w = devDist
      .withColumn("__cum", sum(col("__c")).over(byDev))
      .withColumn("__n", sum(col("__c")).over(whole))
    // nearest-rank-lower MAD over the deviation distribution (the same
    // rank rule groupQuantiles uses, weighted by __c)
    val target = floor(lit(0.5d) * (col("__n") - 1)) + lit(1L)
    val mad = w
      .filter(target > col("__cum") - col("__c") && target <= col("__cum"))
      .select(gs :+ col("__dev").as("__mad"): _*)
    w.join(broadcast(mad), groupCols)
      .groupBy(gs: _*)
      .agg(
        first(col("__n")).as("n"),
        first(col("__med")).as("median"),
        first(col("__mad")).as("mad"),
        sum(when(col("__dev") > col("__mad") * k, col("__c")).otherwise(0L))
          .as("n_outliers"))
  }

  /** Shuffle-key skew profiler: for each candidate key column, the
    * statistics that decide whether a `groupBy`/`join` on that key
    * survives a 100× scale-up — key cardinality, the hottest key's row
    * count and share, exact p50/p99 of the per-key count distribution,
    * and the key distribution's Shannon entropy (nats). A top share near
    * 1 or p99 ≫ p50 means the shuffle funnels into few reducers: salt
    * (the [[Events.sessionStatsSalted]] pattern) or broadcast instead.
    *
    * Scale shape, per key column: one shuffle with map-side combine to
    * O(keys) rows, then a second combine to the O(distinct count-values)
    * distribution — every statistic (quantiles by the nearest-rank rule
    * above, max, entropy) derives from that distribution, so the only
    * unpartitioned window runs over distinct count-values, never keys,
    * never rows. Null keys count as a real key — a null-heavy column IS
    * the classic hot-key hazard.
    *
    * Determinism: counts are exact integers; entropy terms are 1e-9
    * fixed-point LONGs per distribution row (× multiplicity, an integer)
    * summed order-free (the x58 convention); shares/entropy round to
    * 6 dp. Output: one row per key column —
    * (key_col, n_rows, n_keys, max_cnt, p50_cnt, p99_cnt, top_share,
    * entropy).
    */
  def keySkewStats(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keySkewStats: no key columns given")
    keyCols.map { k =>
      val cnts = df.groupBy(col(k).as("__k")).agg(count(lit(1)).as("__c"))
      val dist = cnts.groupBy(col("__c")).agg(count(lit(1)).as("__m"))
      val byCnt = Window.orderBy(col("__c"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val whole = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val w = dist
        .withColumn("__cum", sum(col("__m")).over(byCnt))
        .withColumn("__nk", sum(col("__m")).over(whole))
        .withColumn("__nr", sum(col("__c") * col("__m")).over(whole))
      def pick(q: Double) = {
        val target = floor(lit(q) * (col("__nk") - 1)) + lit(1L)
        max(when(target > col("__cum") - col("__m") &&
          target <= col("__cum"), col("__c")))
      }
      val p = col("__c").cast("double") / col("__nr").cast("double")
      val term9 = col("__m") * round(p * log(p) * lit(1e9d), 0).cast("long")
      w.agg(
          max(col("__nr")).as("n_rows"),
          max(col("__nk")).as("n_keys"),
          max(col("__c")).as("max_cnt"),
          pick(0.5).as("p50_cnt"),
          pick(0.99).as("p99_cnt"),
          sum(term9).as("__h9"))
        .select(lit(k).as("key_col"), col("n_rows"), col("n_keys"),
          col("max_cnt"), col("p50_cnt"), col("p99_cnt"),
          round(col("max_cnt").cast("double") / col("n_rows").cast("double"), 6)
            .as("top_share"),
          round(-col("__h9").cast("double") / lit(1e9d), 6).as("entropy"))
    }.reduce(_ unionByName _)
  }

  /** Per-group exact quantiles of `valueCol` at each q in `qs`.
    * Returns one row per (group, q): `(groupCols*, q, valueCol)`.
    */
  def groupQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"groupQuantiles: qs must be in [0,1], got $qs")
    require(qs.distinct.size == qs.size, s"groupQuantiles: duplicate q in $qs")
    val gs = groupCols.map(col)
    // null values are excluded (standard quantile semantics) — and
    // explicitly, because engines disagree on null sort order (Spark
    // sorts nulls first ascending, others last), which would silently
    // shift every rank
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
    // both windows share the group partitioning: one shuffle, over the
    // distinct-value distribution only
    val byValue = Window.partitionBy(gs: _*).orderBy(col(valueCol))
    val whole = Window.partitionBy(gs: _*)
    counts
      .withColumn("__cum", sum(col("__c")).over(byValue))
      .withColumn("__n", sum(col("__c")).over(whole))
      .select(gs ++ Seq(col(valueCol), col("__c"), col("__cum"), col("__n"),
        explode(array(qs.map(lit(_)): _*)).as("q")): _*)
      .withColumn("__target", floor(col("q") * (col("__n") - 1)) + 1L)
      // the quantile value is the one whose cumulative span covers the
      // target rank: cum − c < target ≤ cum
      .filter(col("__target") > col("__cum") - col("__c") &&
        col("__target") <= col("__cum"))
      .select(gs ++ Seq(col("q"), col(valueCol)): _*)
  }

  /** Winsorized per-group statistics: values clipped to the group's
    * exact [lo, hi] nearest-rank quantiles before averaging — the robust
    * mean that outlier documents can't drag (the standard robust
    * companion to x64's median/MAD). Clipping bounds come from
    * [[groupQuantiles]]' distribution pass (O(distinct values) work);
    * the clipped sum is ONE more pass over the SAME distribution —
    * Σ clip(v) = Σ min(max(v, qlo), qhi) · multiplicity. For INTEGRAL
    * value columns (the x115 gate's case) that sum is exact LONGs and
    * bit-identical across engines; for a double-typed column the clipped
    * sum is floating-point and partition-order dependent, so the
    * cross-engine determinism claim is scoped to integral columns only.
    * No row-sized recomputation happens anywhere. Output: (groups,
    * n, q_lo, q_hi, winsorized_mean 6 dp); null values excluded like
    * all quantile ops.
    */
  def winsorizedStats(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      lo: Double = 0.05,
      hi: Double = 0.95): DataFrame = {
    require(lo < hi, s"winsorizedStats: lo=$lo must be < hi=$hi")
    val gs = groupCols.map(col)
    val dist = graft.ext.Dedup.materialize(
      df.filter(col(valueCol).isNotNull)
        .groupBy((groupCols :+ valueCol).map(col): _*)
        .agg(count(lit(1)).as("__c")))
    val bounds = groupQuantiles(df, groupCols, valueCol, Seq(lo, hi))
      .groupBy(gs: _*)
      .agg(min(when(col("q") === lo, col(valueCol))).as("q_lo"),
        min(when(col("q") === hi, col(valueCol))).as("q_hi"))
    dist.join(broadcast(bounds), groupCols)
      .withColumn("__clip",
        least(greatest(col(valueCol), col("q_lo")), col("q_hi")))
      .groupBy(gs: _*)
      .agg(first(col("q_lo")).as("q_lo"), first(col("q_hi")).as("q_hi"),
        sum(col("__c")).as("n"),
        sum(col("__clip") * col("__c")).as("__s"))
      .select(gs ++ Seq(col("n"), col("q_lo"), col("q_hi"),
        round(col("__s").cast("double") / col("n").cast("double"), 6)
          .as("winsorized_mean")): _*)
  }
}
