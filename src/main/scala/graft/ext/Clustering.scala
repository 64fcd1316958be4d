package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed spherical k-means (Lloyd's iterations) and the
  * SemDeDup-style semantic dedup it enables (Abbas et al. 2023,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication" — public recipe: cluster the embedding space, then
  * dedup by cosine WITHIN clusters, so the pair search is bounded by
  * cluster size instead of N²).
  *
  * 100 TB design:
  *  - assignment is a broadcast of the O(k) centroid table against the
  *    corpus — one narrow pass per iteration, argmax via per-vector
  *    window over k rows (the [[Similarity.ivfAssign]] shape);
  *  - centroid recompute is posexplode → groupBy (cid, dim) → reassemble:
  *    the shuffle carries k × dim aggregated rows, never vectors;
  *  - engine-portable determinism: centroid components are fixed-point
  *    means (Σ round(x·10⁶) as LONG — order-free exact sums — divided
  *    once), so every iteration's centroids are bit-identical on any
  *    engine and the argmax never hinges on summation order; cosine
  *    dot products are sequential folds on both engines (the x62/x63
  *    convention), so assignment ties break identically via the
  *    (sim DESC, cid ASC) total order;
  *  - empty clusters drop out of the recompute (standard Lloyd's
  *    behavior) — identically on both engines, since both emit no group.
  */
object Clustering {

  /** Working form (id, ve, nrm). Zero-norm vectors are excluded from
    * clustering ENTIRELY (corpus side and seeds alike): their cosine is
    * 0/0 = NaN, and Spark's NaN-greatest ordering would otherwise hand
    * a degenerate seed the whole corpus. The oracle CTEs mirror the
    * same nrm > 0 filter.
    */
  private def vecs(data: DataFrame, idCol: String, vecCol: String): DataFrame =
    data.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("ve"))
      .withColumn("nrm", Similarity.norm(col("ve")))
      .filter(col("nrm") > 0d)

  /** Deterministic stride seeding: every `stride`-th id is a seed, cid =
    * the seed's own id. Engine-portable and O(1) to express. NOTE the
    * cost dial: assignment work is N × k = N²/stride, so a FIXED stride
    * turns quadratic as the corpus grows (measured 4.6× wall at 10× rows
    * in BENCH_SCALE) — production sizing grows `stride` with N to hold k
    * (the cluster budget) fixed, making each Lloyd iteration linear. The
    * gates pin stride for oracle reproducibility.
    */
  def seedCentroids(data: DataFrame, idCol: String, vecCol: String, stride: Long): DataFrame =
    data.filter(col(idCol) % stride === 0)
      .select(col(idCol).as("cid"), col(vecCol).cast("array<double>").as("cv"))
      .filter(Similarity.norm(col("cv")) > 0d)

  /** Nearest-centroid assignment by cosine; ties break on lowest cid.
    * Input (id, ve, nrm) × centroids (cid, cv); output adds cid (and
    * `__sim`, the winning cosine, when `keepSim`).
    */
  private def assign(v: DataFrame, cents: DataFrame, keepSim: Boolean = false): DataFrame = {
    val c = cents.withColumn("cn", Similarity.norm(col("cv")))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("__sim").desc, col("cid"))
    val won = v.join(broadcast(c), lit(true))
      .withColumn("__sim",
        Similarity.cosine(col("ve"), col("cv"), col("nrm"), col("cn")))
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
    val cols = Seq(col("id"), col("ve"), col("nrm"), col("cid")) ++
      (if (keepSim) Seq(col("__sim")) else Nil)
    won.select(cols: _*)
  }

  /** The shared Lloyd loop: working vectors + the centroids after
    * `iters` full iterations from stride seeds. Each iteration's
    * centroid table is materialized — it feeds the next broadcast and
    * would otherwise re-run the whole lineage.
    */
  private def lloyd(
      data: DataFrame,
      idCol: String,
      vecCol: String,
      stride: Long,
      iters: Int): (DataFrame, DataFrame) = {
    val v = vecs(data, idCol, vecCol)
    var cents = seedCentroids(data, idCol, vecCol, stride)
    for (_ <- 0 until iters)
      cents = Dedup.materialize(recompute(assign(v, cents)))
    (v, cents)
  }

  /** One centroid recompute: fixed-point per-dimension means. */
  private def recompute(assigned: DataFrame): DataFrame =
    assigned.select(col("cid"), posexplode(col("ve")).as(Seq("pos", "x")))
      .groupBy(col("cid"), col("pos"))
      .agg(sum(round(col("x") * 1e6d, 0).cast("long")).as("s"),
        count(lit(1)).as("c"))
      .groupBy(col("cid"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), (col("s").cast("double") /
          col("c").cast("double") / 1e6d).as("m")))),
        p => p.getField("m")).as("cv"))

  /** `iters` full Lloyd steps from stride seeds, then a final assignment
    * against the last centroids. Output: (id, cid) — the cluster layout
    * SemDeDup and IVF write paths consume.
    */
  def kmeansAssign(
      data: DataFrame,
      idCol: String,
      vecCol: String,
      stride: Long,
      iters: Int): DataFrame = {
    val (v, cents) = lloyd(data, idCol, vecCol, stride, iters)
    assign(v, cents).select(col("id").as(idCol), col("cid"))
  }

  /** Per-cluster rollup of the final layout: size and mean cosine to the
    * centroid ("cohesion"), fixed-point-summed then rounded to 6 dp.
    */
  def kmeansStats(
      data: DataFrame,
      idCol: String,
      vecCol: String,
      stride: Long,
      iters: Int): DataFrame = {
    val (v, cents) = lloyd(data, idCol, vecCol, stride, iters)
    assign(v, cents, keepSim = true)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(round(col("__sim") * 1e9d, 0).cast("long")).as("__s9"))
      .select(col("cid"), col("n_vectors"),
        round(col("__s9").cast("double") / col("n_vectors").cast("double") / 1e9d, 6)
          .as("cohesion"))
  }

  /** Cluster-balanced (diversity) sampling: up to `quota` vectors per
    * final k-means cluster, chosen by deterministic md5 rank of the id —
    * the SemDeDup-pipeline companion that caps each semantic region's
    * contribution to a training mix instead of letting the head clusters
    * dominate. The md5-hex sort key is engine-portable (the corpus
    * sampling family's convention), and (md5, id) is a total order.
    * Output: (idCol, cid, rk).
    */
  def balancedSample(
      data: DataFrame,
      idCol: String,
      vecCol: String,
      stride: Long,
      iters: Int,
      quota: Int): DataFrame = {
    val laid = kmeansAssign(data, idCol, vecCol, stride, iters)
    val w = Window.partitionBy(col("cid"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    laid.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= quota)
      .select(col(idCol), col("cid"), col("rk"))
  }

  /** SemDeDup: near-dup pairs WITHIN each final cluster — the pair join
    * is cluster-local (an equi-join on cid), so candidate volume is
    * Σ sizeᵢ², bounded by the layout instead of N². Zero-norm vectors
    * are excluded like [[Similarity.srpNearDupPairs]] (NaN cosine would
    * pass the threshold under Spark's NaN ordering). Output:
    * (id_a, id_b, cid, cosine) with id_a < id_b.
    */
  def semanticDedupPairs(
      data: DataFrame,
      idCol: String,
      vecCol: String,
      stride: Long,
      iters: Int,
      threshold: Double): DataFrame = {
    val (v, cents) = lloyd(data, idCol, vecCol, stride, iters)
    val laid = Dedup.materialize(assign(v, cents))
    laid.as("a").join(laid.as("b"),
        col("a.cid") === col("b.cid") && col("a.id") < col("b.id"))
      .withColumn("cosine", Similarity.cosine(
        col("a.ve"), col("b.ve"), col("a.nrm"), col("b.nrm")))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.cid").as("cid"), col("cosine"))
  }
}
