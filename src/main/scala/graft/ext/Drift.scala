package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift diagnostics between two corpus slices (today vs
  * history, train vs serve): the monitoring layer a continuously-ingested
  * training corpus runs before a new day's data is allowed into the mix.
  *
  * Engine-portable determinism, same conventions as the rest of the
  * engine: histogram binning is EXACT integer arithmetic on shared
  * global bounds; divergence log terms are rounded to 1e-9 fixed-point
  * LONGs and summed order-free (the x58 convention); final values round
  * to 6 dp.
  */
object Drift {

  /** Per-group Jensen–Shannon divergence between slice `a` and slice
    * `b`'s distribution of integer `metricCol`, over `bins` equal-width
    * bins spanning the UNION's [min, max] (shared bounds — the two
    * histograms must live on the same grid or the comparison is
    * meaningless). JS = (KL(P‖M) + KL(Q‖M)) / 2 with M = (P+Q)/2,
    * natural log — bounded by ln 2, symmetric, defined for
    * non-overlapping supports (unlike raw KL).
    *
    * Scale shape: one pass for global bounds (2-value broadcast), one
    * shuffle on (group, bin) with map-side combine for both histograms
    * (side is a pivot inside the aggregate, not a second shuffle), an
    * O(groups) totals broadcast, and an O(groups × bins) rollup.
    * Output: (groupCol, n_a, n_b, js).
    */
  def jsDivergence(
      a: DataFrame,
      b: DataFrame,
      groupCol: String,
      metricCol: String,
      bins: Int = 16): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val tag = (df: DataFrame, s: Int) => df
      .select(col(groupCol).as("g"), col(metricCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
      .withColumn("__side", lit(s))
    val u = tag(a, 0).unionByName(tag(b, 1))
    val bounds = u.agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    // exact integer binning: (v - mn) * bins div (mx - mn + 1) ∈ [0, bins)
    val binned = u.crossJoin(broadcast(bounds))
      .withColumn("__bin",
        expr(s"((v - mn) * $bins) div (mx - mn + 1)"))
    val hist = binned.groupBy(col("g"), col("__bin"))
      .agg(
        sum(when(col("__side") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("__side") === 1, 1L).otherwise(0L)).as("cb"))
    // groups present in only one slice are omitted (like
    // [[embeddingDrift]]): drift against an absent distribution is
    // undefined, and 0/0 probabilities would throw under ANSI
    val totals = hist.groupBy(col("g"))
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      .filter(col("na") > 0L && col("nb") > 0L)
    val p = col("ca").cast("double") / col("na").cast("double")
    val q = col("cb").cast("double") / col("nb").cast("double")
    val m = (p + q) / lit(2.0d)
    // KL terms only where the numerator mass is positive; each term is a
    // 1e-9 fixed-point LONG so the sums are order-free
    def t9(num: Column, cnt: Column): Column =
      when(cnt > 0L, round(num * log(num / m) * lit(1e9d), 0).cast("long"))
        .otherwise(lit(0L))
    hist.join(broadcast(totals), Seq("g"))
      .withColumn("__ta", t9(p, col("ca")))
      .withColumn("__tb", t9(q, col("cb")))
      .groupBy(col("g"))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        sum(col("__ta")).as("__sa"), sum(col("__tb")).as("__sb"))
      .select(col("g").as(groupCol), col("n_a"), col("n_b"),
        round((col("__sa").cast("double") / lit(1e9d) +
          col("__sb").cast("double") / lit(1e9d)) / lit(2.0d), 6).as("js"))
  }

  /** Per-group embedding-centroid drift between two slices: the cosine
    * between each group's fixed-point mean vector in `a` vs `b` (1.0 =
    * no drift). Means use the k-means convention — Σ round(x·10⁶) LONGs
    * per dimension, one division — so both engines compute identical
    * centroids; the shuffle carries groups × dim aggregated rows, never
    * vectors. Groups present in only one slice are omitted (drift is
    * undefined without both sides). Output: (groupCol, n_a, n_b,
    * drift_cosine).
    */
  def embeddingDrift(
      a: DataFrame,
      b: DataFrame,
      groupCol: String,
      vecCol: String): DataFrame = {
    def mean(df: DataFrame): DataFrame = df
      .select(col(groupCol).as("g"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
      .groupBy(col("g"), col("pos"))
      .agg(sum(round(col("x") * 1e6d, 0).cast("long")).as("s"),
        count(lit(1)).as("c"))
      .groupBy(col("g"))
      .agg(max(col("c")).as("n"),
        transform(
          array_sort(collect_list(struct(col("pos"), (col("s").cast("double") /
            col("c").cast("double") / 1e6d).as("m")))),
          p => p.getField("m")).as("mv"))
    val ma = mean(a).select(col("g"), col("n").as("n_a"), col("mv").as("va"))
    val mb = mean(b).select(col("g"), col("n").as("n_b"), col("mv").as("vb"))
    ma.join(mb, Seq("g"))
      .withColumn("drift_cosine", round(Similarity.cosine(
        col("va"), col("vb"),
        Similarity.norm(col("va")), Similarity.norm(col("vb"))), 6))
      .select(col("g").as(groupCol), col("n_a"), col("n_b"), col("drift_cosine"))
  }

  /** Per-group two-sample Kolmogorov–Smirnov statistic between slice
    * `a` and slice `b`'s distributions of integer `valCol` — the
    * exact-CDF counterpart of [[jsDivergence]] with the same slice
    * semantics (groups present in only one slice are omitted; null
    * groups/values drop). D = max_v |F_a(v) − F_b(v)| over the group's
    * pooled value set. Same grid shape as [[ksMatrix]] — after one
    * (group, value, side) count pass everything lives on the
    * O(groups × V × 2) grid. Output: (groupCol, n_a, n_b, ks_d).
    */
  def ksTwoSample(
      a: DataFrame,
      b: DataFrame,
      groupCol: String,
      valCol: String): DataFrame = {
    def tag(df: DataFrame, s: Int) = df
      .select(col(groupCol).as("g"), col(valCol).cast("long").as("v"))
      .filter(col("g").isNotNull && col("v").isNotNull)
      .withColumn("__side", lit(s))
    val counts = Dedup.materialize(
      tag(a, 0).unionByName(tag(b, 1))
        .groupBy(col("g"), col("v"), col("__side")).agg(count(lit(1)).as("c")))
    val totals = counts.groupBy(col("g"))
      .agg(sum(when(col("__side") === 0, col("c")).otherwise(0L)).as("n_a"),
        sum(when(col("__side") === 1, col("c")).otherwise(0L)).as("n_b"))
      .filter(col("n_a") > 0L && col("n_b") > 0L)
    // dense per-group grid: both sides need an F value at every pooled
    // v of THAT group, or a step where one side is flat goes missing
    val grid = counts.select(col("g"), col("v")).distinct()
      .withColumn("__side", explode(array(lit(0), lit(1))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g"), col("__side")).orderBy(col("v"))
    val cum = grid.join(counts, Seq("g", "v", "__side"), "left")
      .withColumn("cum", sum(coalesce(col("c"), lit(0L))).over(w))
      .groupBy(col("g"), col("v"))
      .agg(sum(when(col("__side") === 0, col("cum")).otherwise(0L)).as("ca"),
        sum(when(col("__side") === 1, col("cum")).otherwise(0L)).as("cb"))
    cum.join(totals, Seq("g"))
      .select(col("g"), col("n_a"), col("n_b"),
        abs(col("ca").cast("double") / col("n_a").cast("double")
          - col("cb").cast("double") / col("n_b").cast("double")).as("d"))
      .groupBy(col("g"), col("n_a"), col("n_b"))
      .agg(round(max(col("d")), 6).as("ks_d"))
      .select(col("g").as(groupCol), col("n_a"), col("n_b"), col("ks_d"))
  }

  /** All-pairs two-sample Kolmogorov–Smirnov statistic over `groupCol`'s
    * distributions of integer `valCol` — the EXACT distribution-shape
    * complement of [[jsDivergence]]'s binned view: KS needs no bin
    * dial, and D = max_v |F_a(v) − F_b(v)| is sensitive to shape
    * differences a fixed 16-bin grid blurs. The standard promote-gate
    * companion to the x121 vocabulary-overlap matrix: which sources'
    * LENGTH profiles diverge, exactly.
    *
    * Scale shape: ONE (group, value) count shuffle with map-side
    * combine collapses the data to O(S × V) rows (S = groups, V =
    * distinct values — both bounded domains, never row count); a dense
    * S × V grid gets per-group exact cumulative counts from one
    * window; the pair join runs grid × grid on the value key —
    * O(V · S²), data-size-independent after the first pass. Null
    * groups/values are excluded (a null has no place on a CDF axis).
    * Determinism: cumulatives are exact LONGs, F divisions are the
    * same IEEE doubles on any engine, 6-dp round at the end.
    * Output: (group_a, group_b, n_a, n_b, ks_d), group_a < group_b.
    */
  def ksMatrix(df: DataFrame, groupCol: String, valCol: String): DataFrame =
    ksMatrixCore(Dedup.materialize(
      df.select(col(groupCol).as("g"), col(valCol).cast("long").as("v"))
        .filter(col("g").isNotNull && col("v").isNotNull)
        .groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))))

  /** [[ksMatrix]] over PRE-AGGREGATED (group, value, count) cells — the
    * store-fed monitor (x160): a maintained histogram store's day cells
    * drive the all-pairs KS directly, so day-over-day drift costs
    * O(cells) and never recomputes over raw data. The count shuffle the
    * raw-data entry pays was already paid at ingest by the store's
    * append; everything downstream (dense grid, exact cumulative LONGs,
    * pair join) is count-based and shared.
    */
  def ksMatrixFromCounts(
      cells: DataFrame,
      groupCol: String,
      valCol: String,
      cntCol: String): DataFrame =
    ksMatrixCore(Dedup.materialize(
      cells.select(col(groupCol).as("g"), col(valCol).cast("long").as("v"),
        col(cntCol).cast("long").as("c"))
        .filter(col("g").isNotNull && col("v").isNotNull)
        .groupBy(col("g"), col("v")).agg(sum(col("c")).as("c"))))

  private def ksMatrixCore(counts: DataFrame): DataFrame = {
    val totals = counts.groupBy(col("g")).agg(sum(col("c")).as("n"))
    // dense grid: every group needs an F value at every pooled v, or
    // the pair join would silently skip steps where one side is flat
    val grid = counts.select(col("v")).distinct()
      .crossJoin(totals.select(col("g")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"))
    val cum = grid.join(counts, Seq("g", "v"), "left")
      .withColumn("cum", sum(coalesce(col("c"), lit(0L))).over(w))
      .join(totals, Seq("g"))
      .select(col("g"), col("v"), col("cum"), col("n"))
    cum.as("a").join(cum.as("b"),
        col("a.v") === col("b.v") && col("a.g") < col("b.g"))
      .select(col("a.g").as("group_a"), col("b.g").as("group_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"),
        abs(col("a.cum").cast("double") / col("a.n").cast("double")
          - col("b.cum").cast("double") / col("b.n").cast("double")).as("d"))
      .groupBy(col("group_a"), col("group_b"), col("n_a"), col("n_b"))
      .agg(round(max(col("d")), 6).as("ks_d"))
  }
}
