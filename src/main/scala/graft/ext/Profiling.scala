package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema/dependency profiling for data-quality triage (extension
  * surface, SURVEY.md §2.12) — the discovery side of the declared-check
  * suite in [[Expectations]]: instead of asserting a rule, MEASURE how
  * close the data comes to one.
  */
object Profiling {

  /** Approximate functional-dependency profile for declared candidate
    * column pairs, scored by the g3 error measure (Kivinen & Mannila
    * 1995, the measure TANE-style FD discovery minimizes): for a
    * candidate lhs → rhs,
    *
    *   g3 = (N − Σ_lhs max_rhs count(lhs, rhs)) / N
    *
    * — the fraction of rows that would have to be deleted for the FD to
    * hold exactly (0 = exact FD). One output row per candidate:
    * (lhs, rhs, n_groups, n_violating_groups, n_rows, n_violations,
    * g3_rate). NULLs group like values (a null lhs is one group, the
    * SQL GROUP BY convention) so a nullable key can't hide violations.
    *
    * 100 TB design: each candidate costs one map-side-combined groupBy
    * to the O(distinct (lhs, rhs)) cell table and one rollup over it —
    * never a self-join, never row-sized intermediate state; candidates
    * are independent single-pass aggregations unioned at O(candidates)
    * rows. Everything is exact LONG arithmetic except the final 6-dp
    * rate.
    */
  def fdProfile(df: DataFrame, candidates: Seq[(String, String)]): DataFrame = {
    require(candidates.nonEmpty, "fdProfile: no candidates")
    candidates.map { case (lhs, rhs) =>
      val cells = df.groupBy(col(lhs).as("__l"), col(rhs).as("__r"))
        .agg(count(lit(1)).as("__c"))
      val groups = cells.groupBy(col("__l"))
        .agg(sum(col("__c")).as("__n"), max(col("__c")).as("__m"),
          count(lit(1)).as("__k"))
      groups.agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("__k") > 1, lit(1L)).otherwise(lit(0L)))
          .as("n_violating_groups"),
        sum(col("__n")).as("n_rows"),
        sum(col("__n") - col("__m")).as("n_violations"))
        .select(lit(lhs).as("lhs"), lit(rhs).as("rhs"),
          col("n_groups"), col("n_violating_groups"),
          col("n_rows"), col("n_violations"),
          round(col("n_violations").cast("double") /
            col("n_rows").cast("double"), 6).as("g3_rate"))
    }.reduce(_ union _)
  }

  /** Per-column profile (the Deequ/pandas-profiling summary a promote
    * gate reads before trusting a new source): one row per requested
    * column with row count, null count, exact distinct count, and
    * min/max — aggregated under the COLUMN'S OWN type (numeric min, not
    * lexicographic) and cast to string only for the uniform output
    * schema. Callers profiling float columns should note min/max string
    * formatting is engine-specific; integral and string columns render
    * identically everywhere.
    *
    * 100 TB design: ONE aggregation pass computes every column's stats
    * (Spark plans the multi-distinct via Expand — one shuffle, state
    * O(distinct values) per column), and the per-column rows come from
    * `stack` over the single 1-row result — no per-column scans, no
    * melt of the data itself.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile: no columns")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(col(c)).as(s"__nn_$i"),
        count_distinct(col(c)).as(s"__nd_$i"),
        min(col(c)).cast("string").as(s"__mn_$i"),
        max(col(c)).cast("string").as(s"__mx_$i"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.zipWithIndex.map { case (c, i) =>
      s"'$c', __nn_$i, __nd_$i, __mn_$i, __mx_$i"
    }.mkString(", ")
    one.select(col("__n"),
      expr(s"stack(${cols.size}, $stackArgs) AS (col_name, __nn, n_distinct, min_v, max_v)"))
      .select(col("col_name"), col("__n").as("n_rows"),
        (col("__n") - col("__nn")).as("n_nulls"),
        col("n_distinct"), col("min_v"), col("max_v"))
  }
}
