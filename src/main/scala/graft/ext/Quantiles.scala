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
}
