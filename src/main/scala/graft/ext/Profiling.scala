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
    * 100 TB design: ALL candidates cost ONE scan of the input — the
    * candidate (lhs, rhs) pairs become GROUPING SETS, so Catalyst's
    * Expand fans each row into its candidates' cells inside a single
    * map-side-combined aggregation to the O(Σ distinct (lhs, rhs))
    * cell table (scan-count-independent of the candidate count: a
    * 20-candidate profile of a 100 TB table reads it once, not 20
    * times). The cell table is materialized, and each candidate's
    * rollup runs over its own grouping set's cells — typed grouping
    * throughout, so values never round-trip through strings. Never a
    * self-join, never row-sized intermediate state. Everything is
    * exact LONG arithmetic except the final 6-dp rate.
    */
  def fdProfile(df: DataFrame, candidates: Seq[(String, String)]): DataFrame = {
    require(candidates.nonEmpty, "fdProfile: no candidates")
    // the per-candidate rollup is a C-way union of single-row
    // aggregates over the (small, materialized) cell table — fine for
    // the declared use (tens of declared candidate pairs), but C in
    // the hundreds builds a C-way union PLAN on the driver; fail
    // loudly rather than degrade (a profile that wide should batch)
    require(candidates.size <= 64,
      s"fdProfile: ${candidates.size} candidates > 64 — profile in batches")
    val allCols = candidates.flatMap { case (l, r) => Seq(l, r) }.distinct
    // the per-column bit positions live in one Long AND grouping_id()
    // itself is a 64-bit integer — past 63 distinct columns the shifts
    // wrap (Long shifts are mod 64) and grouping ids silently alias,
    // matching WRONG grouping sets; fail loudly instead
    require(allCols.size <= 63,
      s"fdProfile: candidates span ${allCols.size} distinct columns > 63 — " +
        "grouping_id bit positions would overflow a Long; profile in batches")
    val cells = Dedup.materialize(fdCells(df, candidates))
    // grouping_id bit i (MSB-first over allCols) is 1 when the column
    // is NOT grouped in the output row — the standard SQL semantics;
    // each candidate reads exactly its own grouping set's cells, so
    // swapped-role candidates (a->b and b->a) share cells correctly
    val n = allCols.size
    def gidOf(s: Seq[String]): Long =
      allCols.zipWithIndex.collect {
        case (c, i) if !s.contains(c) => 1L << (n - 1 - i)
      }.sum
    candidates.map { case (lhs, rhs) =>
      val gid = gidOf(Seq(lhs, rhs).distinct)
      val groups = cells.filter(col("__gid") === gid)
        .groupBy(col(lhs))
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

  /** Pairwise mutual-information profile for declared column pairs —
    * the ASSOCIATION complement of [[fdProfile]]'s dependency measure
    * (an FD is the MI-saturated limit; MI grades the in-between):
    * for a pair (a, b) with joint counts n_ab over the pair's cells,
    *
    *   MI = Σ_ab (n_ab/n) · ln(n·n_ab / (n_a·n_b))   [nats]
    *   NMI = MI / min(H_a, H_b)    (0 when either column is constant)
    *
    * — the Deequ/pandas-profiling "column association" panel, used to
    * spot redundant metadata columns and leakage between a label and a
    * supposedly-independent field before training.
    *
    * 100 TB design: ALL pairs cost ONE scan — the same grouping-sets
    * Expand as [[fdProfile]] (shared [[fdCells]]), so the corpus
    * collapses to O(Σ distinct (a, b)) cells in a single map-side-
    * combined pass; marginals, entropies, and the MI sum are
    * aggregations OVER CELLS (broadcast marginal joins, null-safe so
    * null categories survive — a null-heavy column's association is
    * exactly what the profile must see). Determinism: counts exact
    * LONGs; each ln() term rounds to a 1e-9 fixed-point LONG and sums
    * order-free (the x58 convention); NMI is one division of two such
    * exact sums. Output per pair (canonicalized a < b):
    * (col_a, col_b, n_rows, n_cells, mi, nmi).
    */
  def miProfile(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "miProfile: no pairs")
    require(pairs.size <= 64,
      s"miProfile: ${pairs.size} pairs > 64 — profile in batches")
    val canon = pairs.map { case (a, b) =>
      require(a != b, s"miProfile: degenerate pair ($a, $b)")
      if (a < b) (a, b) else (b, a)
    }.distinct
    val allCols = canon.flatMap { case (l, r) => Seq(l, r) }.distinct
    // same Long-overflow guard as fdProfile: 64 pairs can span up to 128
    // distinct columns, where the shift wraps and grouping ids alias
    require(allCols.size <= 63,
      s"miProfile: pairs span ${allCols.size} distinct columns > 63 — " +
        "grouping_id bit positions would overflow a Long; profile in batches")
    val n = allCols.size
    def gidOf(s: Seq[String]): Long =
      allCols.zipWithIndex.collect {
        case (c, i) if !s.contains(c) => 1L << (n - 1 - i)
      }.sum
    val cells = Dedup.materialize(fdCells(df, canon))
    canon.map { case (a, b) =>
      val j = cells.filter(col("__gid") === gidOf(Seq(a, b)))
        .select(col(a).as("__a"), col(b).as("__b"), col("__c"))
      val ma = j.groupBy(col("__a").as("__ka")).agg(sum(col("__c")).as("__na"))
      val mb = j.groupBy(col("__b").as("__kb")).agg(sum(col("__c")).as("__nb"))
      val tot = j.agg(sum(col("__c")).as("__n"), count(lit(1)).as("__cells"))
      val nD = col("__n").cast("double")
      // H terms over the marginal distributions (exact counts -> one
      // rounded ln term per marginal row)
      def h9(m: DataFrame, cnt: String) = m.crossJoin(broadcast(tot))
        .agg(coalesce(sum(round((col(cnt).cast("double") / nD) *
          log(col(cnt).cast("double") / nD) * lit(1e9d), 0).cast("long")),
          lit(0L)).as("h9"))
      val scored = j
        .join(broadcast(ma), col("__a") <=> col("__ka")).drop("__ka")
        .join(broadcast(mb), col("__b") <=> col("__kb")).drop("__kb")
        .crossJoin(broadcast(tot))
        .agg(max(col("__n")).as("n_rows"), max(col("__cells")).as("n_cells"),
          sum(round((col("__c").cast("double") / nD) *
            log((nD * col("__c").cast("double")) /
              (col("__na").cast("double") * col("__nb").cast("double"))) *
            lit(1e9d), 0).cast("long")).as("mi9"))
      val haC = h9(ma, "__na").select(col("h9").as("ha9"))
      val hbC = h9(mb, "__nb").select(col("h9").as("hb9"))
      scored.crossJoin(broadcast(haC)).crossJoin(broadcast(hbC))
        .select(lit(a).as("col_a"), lit(b).as("col_b"),
          col("n_rows"), col("n_cells"),
          round(col("mi9").cast("double") / lit(1e9d), 6).as("mi"),
          when(greatest(-col("ha9"), lit(0L)) === 0L ||
               greatest(-col("hb9"), lit(0L)) === 0L, lit(0.0d))
            .otherwise(round(col("mi9").cast("double") /
              least(-col("ha9"), -col("hb9")).cast("double"), 6)).as("nmi"))
    }.reduce(_ union _)
  }

  /** The fused one-scan cell table: one row per (grouping set, lhs
    * value, rhs value) with its count and `grouping_id` — package-
    * private so the plan spec can pin "exactly one leaf scan, Expand
    * present" on the frame that actually touches the input.
    */
  private[graft] def fdCells(df: DataFrame, candidates: Seq[(String, String)]): DataFrame = {
    val allCols = candidates.flatMap { case (l, r) => Seq(l, r) }.distinct
    // sorted: a grouping SET is unordered, so (a, b) and its swapped
    // twin (b, a) must canonicalize to ONE set — emitting both would
    // double their shared cells under a single grouping_id
    val sets = candidates.map { case (l, r) => Seq(l, r).distinct.sorted }.distinct
    df.groupingSets(sets.map(_.map(col)), allCols.map(col): _*)
      .agg(grouping_id().as("__gid"), count(lit(1)).as("__c"))
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
