package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding post-processing: "all-but-the-top" (Mu & Viswanath 2018,
  * ICLR) — subtract the corpus mean and remove the dominant principal
  * direction(s), the standard fix for the anisotropy that makes raw
  * embedding cosines cluster near 1 and degrades retrieval. The
  * spectral primitive is a POWER ITERATION for the top eigenvector of
  * the centered Gram matrix, run entirely in the engine's
  * exact-integer portability discipline (the x85 PageRank playbook):
  *
  *  - inputs quantize once to 1e-6 fixed point and shift by +1e6 so
  *    every value is non-negative (a constant shift is invisible to
  *    centering); the per-position mean is one integral `div` on
  *    non-negative operands (floor == truncate — the x85 rule), so the
  *    centered table `c` is exact integers on any engine;
  *  - each iteration is two bounded passes over `c`: `s_id = Σ_j c·x_j`
  *    (x is a BROADCAST LITERAL array — no join), normalize s to
  *    ±SCALE by `sign(s)·(|s|·SCALE div max|s|)` (abs keeps the div on
  *    non-negative operands), then `y_pos = Σ_id c·s'` (one join on id
  *    + one shuffle on pos) and the same normalization driver-side on
  *    the O(dim) collected y — the only driver state, dim longs;
  *  - the dominant-direction projection `proj_id = Σ_j c_j · x_j` is an
  *    exact integer — a DuckDB oracle replays the whole pipeline
  *    bit-for-bit (x197).
  *
  * Long-capacity bound: |c| ≤ 2.4e6, so the y-accumulator is exact for
  * corpora up to ~3.8e11 · SCALE⁻¹ rows — ~3.8e7 vectors at the
  * default SCALE=1e4 per group before `sum(LONG)` could overflow;
  * past that, widen the two sums to DECIMAL(38,0) (exact in both
  * engines) — the iteration shape is unchanged. Convergence needs the
  * usual spectral-gap caveat; 3–4 rounds suffice when one direction
  * dominates (the anisotropy case this op exists for), and the
  * planted-direction law is specced in EmbedPostSpec.
  *
  * [[removeTop]] is the production form: double arithmetic, corrected
  * embedding ⊥ the removed direction (machine-epsilon dot products,
  * specced) — downstream cosines don't need cross-engine bit equality,
  * the projection AUDIT (x197) does.
  */
object EmbedPost {

  private val Quant = 1000000L // 1e-6 fixed point
  private val Shift = 1000000L // makes every quantized value >= 0

  /** Exact-integer centered table (id, pos, c): quantize, shift
    * non-negative, subtract the integral-div per-position mean.
    */
  def centered(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int): DataFrame = {
    val e = df
      .select(col(idCol).as("id"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "v")))
    require(dim > 0, s"EmbedPost.centered: dim=$dim")
    val q = e.select(col("id"), col("pos"),
      (round(col("v") * lit(Quant.toDouble), 0).cast("long") + lit(Shift)).as("vq"))
    val mu = q.groupBy(col("pos"))
      .agg(sum(col("vq")).as("__sv"), count(lit(1)).as("__n"))
      .select(col("pos"), expr("__sv div __n").as("__mu"))
    q.join(broadcast(mu), Seq("pos"))
      .select(col("id"), col("pos"), (col("vq") - col("__mu")).as("c"))
  }

  /** `iters` power-iteration rounds over a [[centered]] table; returns
    * the integer direction vector (length `dim`, components in
    * [-scale, scale], max-|component| = scale). Deterministic: every
    * step is exact integer arithmetic with the div-on-non-negatives
    * rule; the O(dim) collected y is the only driver-side state.
    */
  def topDirection(
      spark: SparkSession,
      cent: DataFrame,
      dim: Int,
      iters: Int = 3,
      scale: Long = 10000L): Array[Long] = {
    require(iters > 0 && scale > 0, s"EmbedPost.topDirection: iters=$iters, scale=$scale")
    val c = Dedup.materialize(cent)
    var x = Array.fill(dim)(scale)
    (0 until iters).foreach { _ =>
      val xc = typedlit(x.toSeq)
      val s = c.groupBy(col("id"))
        .agg(sum(col("c") * element_at(xc, col("pos") + 1)).as("s"))
      val ms = s.agg(greatest(max(abs(col("s"))), lit(1L)).as("m"))
      val sn = s.crossJoin(broadcast(ms))
        .select(col("id"),
          (signum(col("s")).cast("long") *
            expr(s"(abs(s) * ${scale}L) div m")).as("sn"))
      val y = c.join(sn, Seq("id"))
        .groupBy(col("pos")).agg(sum(col("c") * col("sn")).as("y"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val my = math.max(1L, (0 until dim).map(p => math.abs(y.getOrElse(p, 0L))).max)
      x = (0 until dim).map { p =>
        val v = y.getOrElse(p, 0L)
        math.signum(v) * (math.abs(v) * scale / my)
      }.toArray
    }
    x
  }

  /** The x197 audit: per-id exact-integer projection onto the
    * dominant direction — the magnitude all-but-the-top removes,
    * and the embedding-artifact outlier score (ids with extreme
    * |proj| are the common-direction-dominated rows).
    * Output: (idCol, proj). One pass over the centered table.
    */
  def dominantProjection(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      iters: Int = 3): DataFrame = {
    val c = Dedup.materialize(centered(df, idCol, vecCol, dim))
    val x = topDirection(spark, c, dim, iters)
    c.groupBy(col("id"))
      .agg(sum(col("c") * element_at(typedlit(x.toSeq), col("pos") + 1)).as("proj"))
      .select(col("id").as(idCol), col("proj"))
  }

  /** Production all-but-the-top: mean-center (double arithmetic) and
    * remove the [[topDirection]] component — `e' = c − (c·u / u·u) u`.
    * Output: (idCol, corrected ARRAY<DOUBLE>). The corrected rows are
    * orthogonal to the removed direction to machine epsilon (specced);
    * cross-engine bit-equality is the audit's job, not this one's.
    */
  def removeTop(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      iters: Int = 3): DataFrame = {
    val cent = Dedup.materialize(centered(df, idCol, vecCol, dim))
    val u = topDirection(spark, cent, dim, iters).map(_.toDouble)
    val uu = u.map(v => v * v).sum
    val uc = typedlit(u.toSeq)
    val c = cent.withColumn("cd", col("c").cast("double") / lit(Quant.toDouble))
    val proj = c.groupBy(col("id"))
      .agg((sum(col("cd") * element_at(uc, col("pos") + 1)) / lit(uu)).as("__p"))
    c.join(proj, Seq("id"))
      .select(col("id"), col("pos"),
        (col("cd") - col("__p") * element_at(uc, col("pos") + 1)).as("e"))
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("e")))).as("__es"))
      .select(col("id").as(idCol),
        expr("transform(__es, s -> s.e)").as("corrected"))
  }
}
