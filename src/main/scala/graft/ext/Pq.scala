package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze & Schmid 2011) over the embedding
  * column: vectors split into `m` contiguous subspaces; each subspace
  * quantized to one of `k` codewords; a vector's code is its m codeword
  * ids (m bytes at k ≤ 256 — a 64-dim float vector compresses 32×).
  * Asymmetric distance computation (ADC) scores a query against codes
  * through a per-query lookup table of exact query-to-codeword
  * distances — the standard memory-bound ANN scale path.
  *
  * Codebooks come in two provenances sharing one dataflow: STRIDE-
  * SAMPLED corpus subvectors ([[codebook]], vec_id = c · stride — the
  * seed and the oracle-cheap baseline) and K-MEANS-TRAINED
  * ([[codebookKmeans]] — per-subspace Lloyd under squared L2 on the
  * fixed-point grid, seeded from the sampled codebook, the production
  * path: on real clustered embeddings a sampled codebook wastes most
  * of the quantization budget on duplicated codewords, while Lloyd
  * monotonically lowers distortion from the seed — the x149 gate
  * measures both on the same corpus and pins trained ≤ sampled per
  * subspace).
  *
  * 100 TB design:
  *  - the codebook is m×k rows — broadcast; encoding is one narrow pass
  *    over the corpus (explode to m subvector rows, broadcast-join the
  *    codebook, argmin per (vector, subspace) with map-side combine);
  *    the subspace rows come from exploding a STATICALLY-built array of
  *    (sub, slice) structs — slice() with literal bounds and the
  *    [[Similarity.dot]] expression are codegen'd; no array HOFs
  *    (transform/aggregate are CodegenFallback) anywhere;
  *  - ADC builds the O(|Q|·m·k) LUT once (broadcast), joins it to the
  *    code table on (subspace, code), and sums m integer partials per
  *    (query, vector) — brute-force over CODES, the PQ baseline; at
  *    corpus scale compose with [[Similarity.ivfAssign]] so a query
  *    scores only its probed partitions' codes;
  *  - determinism is the x58 fixed-point convention: each subspace
  *    distance is rounded to a 1e-9-grid LONG and summed order-free;
  *    ranking orders by (integer distance ASC, id ASC) — a total order.
  *    Distances expand as Σa² + Σb² − 2Σab with each Σ a sequential
  *    array-order sum, the exact expression the oracle replicates.
  */
object Pq {

  private def d2(a: Column, b: Column): Column =
    Similarity.dot(a, a) + Similarity.dot(b, b) - lit(2.0d) * Similarity.dot(a, b)

  /** Explode a vector frame into its m subspace rows (outId, sub,
    * `sliceName`) via a STATICALLY-built struct array — every slice has
    * literal bounds, so the whole expansion stays in codegen.
    */
  private def subspaces(
      df: DataFrame, idCol: String, vecCol: String,
      outId: String, sliceName: String, d: Int, m: Int): DataFrame =
    df.select(col(idCol).as(outId),
        col(vecCol).cast("array<double>").as("__v"))
      .select(col(outId), explode(array((0 until m).map(s =>
        struct(lit(s.toLong).as("sub"),
          slice(col("__v"), s * d + 1, d).as(sliceName))): _*)).as("__e"))
      .select(col(outId), col("__e.sub").as("sub"),
        col(s"__e.$sliceName").as(sliceName))

  /** The per-query ADC lookup table: (query_id, sub, code, pd9) — the
    * 1e-9-grid integer distance from each query subvector to each
    * codeword. O(|Q|·m·k) rows; both ADC paths broadcast it.
    */
  private def lut(
      queries: DataFrame, cb: DataFrame,
      idCol: String, vecCol: String, d: Int, m: Int): DataFrame =
    subspaces(queries, idCol, vecCol, "query_id", "qv", d, m)
      .join(broadcast(cb), Seq("sub"))
      .select(col("query_id"), col("sub"), col("code"),
        round(d2(col("qv"), col("cv")) * lit(1e9d), 0).cast("long").as("pd9"))

  /** The sampled codebook: (sub, code, cv) — subspace `sub`'s codeword
    * `code` is the sub-slice of the corpus vector with id = code ·
    * stride. `dim` must be divisible by `m`.
    */
  def codebook(
      data: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int,
      k: Int,
      stride: Long): DataFrame = {
    require(m >= 1 && dim % m == 0, s"Pq: dim=$dim not divisible by m=$m")
    require(k >= 1 && stride >= 1, s"Pq: k=$k stride=$stride")
    val d = dim / m
    subspaces(
      data.filter(col(idCol) % stride === 0 &&
          col(idCol) < k * stride && col(idCol) >= 0)
        .select(expr(s"`$idCol` div ${stride}L").as("__code"),
          col(vecCol).as(vecCol)),
      "__code", vecCol, "code", "cv", d, m)
      .select(col("sub"), col("code"), col("cv"))
  }

  /** Per (vector, subspace) argmin against a broadcast codebook:
    * (id, sub, sv, code, d9) — d9 the winning fixed-point distance,
    * ties on the lower code id. The shared kernel of [[encode]], the
    * Lloyd assignment step, and [[distortion]]: one broadcast join +
    * one map-side-combined argmin. sv rides through `first` — every
    * row of an (id, sub) group carries the identical subvector, so the
    * usual first-is-nondeterministic caveat is moot.
    */
  private def assignSub(subs: DataFrame, cb: DataFrame): DataFrame =
    subs.join(broadcast(cb), Seq("sub"))
      .select(col("id"), col("sub"), col("sv"),
        struct(round(d2(col("sv"), col("cv")) * lit(1e9d), 0).cast("long").as("d9"),
          col("code")).as("__s"))
      .groupBy(col("id"), col("sub"))
      .agg(min(col("__s")).as("__m"), first(col("sv")).as("sv"))
      .select(col("id"), col("sub"), col("sv"),
        col("__m.code").as("code"), col("__m.d9").as("d9"))

  /** Encode the corpus: (idCol, sub, code) — per (vector, subspace), the
    * codeword minimizing the fixed-point squared L2 distance (ties break
    * on the lower code id). One broadcast join + one map-side-combined
    * argmin; output is m rows per vector.
    */
  def encode(
      data: DataFrame,
      cb: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int): DataFrame = {
    require(m >= 1 && dim % m == 0, s"Pq: dim=$dim not divisible by m=$m")
    val d = dim / m
    assignSub(subspaces(data, idCol, vecCol, "id", "sv", d, m), cb)
      .select(col("id").as(idCol), col("sub"), col("code"))
  }

  /** K-MEANS-TRAINED codebook: `iters` Lloyd steps per subspace under
    * the fixed-point squared-L2 metric, ALL subspaces trained
    * simultaneously — assignment is ONE broadcast-join pass over the
    * exploded (id, sub, sv) table per iteration (never m separate
    * loops), and the recompute shuffles only (sub, code, pos)
    * aggregates, O(m·k·d) rows, never vectors. Seeded from the stride-
    * sampled [[codebook]], so iters = 0 returns it unchanged and every
    * iteration monotonically lowers the total distortion [[distortion]]
    * measures (Lloyd's guarantee, on the grid up to the 1e-9 rounding
    * quantum). Centroid components are the x67 fixed-point means
    * (Σ round(x·10⁶) LONG, order-free, divided once) — bit-identical on
    * any engine. Codewords no vector picks drop out (standard Lloyd's),
    * so a trained codebook may hold < k codes per subspace; code ids
    * are stable across iterations (a codeword keeps its seed id).
    */
  def codebookKmeans(
      data: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int,
      k: Int,
      stride: Long,
      iters: Int): DataFrame = {
    require(iters >= 0, s"Pq: iters=$iters")
    require(m >= 1 && dim % m == 0, s"Pq: dim=$dim not divisible by m=$m")
    val d = dim / m
    var cents = codebook(data, idCol, vecCol, dim, m, k, stride)
    if (iters == 0) return cents
    // each iteration re-reads the subvector table and the next
    // broadcast needs the previous centroids' VALUES — materialize both
    val subs = Dedup.materialize(subspaces(data, idCol, vecCol, "id", "sv", d, m))
    for (_ <- 0 until iters)
      cents = Dedup.materialize(
        assignSub(subs, cents)
          .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("pos", "x")))
          .groupBy(col("sub"), col("code"), col("pos"))
          .agg(sum(round(col("x") * 1e6d, 0).cast("long")).as("s"),
            count(lit(1)).as("c"))
          .groupBy(col("sub"), col("code"))
          .agg(transform(
            array_sort(collect_list(struct(col("pos"), (col("s").cast("double") /
              col("c").cast("double") / 1e6d).as("m")))),
            p => p.getField("m")).as("cv")))
    cents
  }

  /** Total quantization distortion per subspace under a codebook:
    * (sub, n_codes, d9_total) — n_codes the codewords at least one
    * vector picked, d9_total the exact-integer sum of every vector's
    * argmin distance. The measure Lloyd minimizes; the x149 gate pins
    * trained ≤ sampled with it.
    */
  def distortion(
      data: DataFrame,
      cb: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int): DataFrame = {
    require(m >= 1 && dim % m == 0, s"Pq: dim=$dim not divisible by m=$m")
    val d = dim / m
    assignSub(subspaces(data, idCol, vecCol, "id", "sv", d, m), cb)
      .groupBy(col("sub"))
      .agg(count_distinct(col("code")).as("n_codes"),
        sum(col("d9")).as("d9_total"))
  }

  /** ADC top-k: per query (same id/vec shape as the corpus), the k codes
    * with the smallest summed lookup-table distance. Returns (query_id,
    * rank, idCol, est_d9) — est_d9 the exact-integer sum of the m
    * rounded subspace distances, rank 1..k by (est_d9 ASC, id ASC).
    */
  def adcTopK(
      queries: DataFrame,
      codes: DataFrame,
      cb: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int,
      k: Int): DataFrame = {
    require(m >= 1 && dim % m == 0, s"Pq: dim=$dim not divisible by m=$m")
    val d = dim / m
    val scored = codes.withColumnRenamed(idCol, "__id")
      .join(broadcast(lut(queries, cb, idCol, vecCol, d, m)), Seq("sub", "code"))
      .groupBy(col("query_id"), col("__id"))
      .agg(sum(col("pd9")).as("est_d9"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("est_d9").asc, col("__id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("__id").as(idCol), col("est_d9"))
  }

  /** ADC top-k over an explicit CANDIDATE set — the IVF + PQ composition
    * ([[Similarity.probeCentroids]] + [[Similarity.ivfAssign]] produce
    * `candidates` = (query_id, idCol) pairs from the probed buckets;
    * this scores ONLY those, so per-query work is the probed buckets'
    * code rows, not the corpus). Same LUT, grid, and (est_d9 ASC, id
    * ASC) ranking as [[adcTopK]].
    */
  def adcTopKCandidates(
      queries: DataFrame,
      candidates: DataFrame,
      codes: DataFrame,
      cb: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int,
      k: Int): DataFrame = {
    require(m >= 1 && dim % m == 0, s"Pq: dim=$dim not divisible by m=$m")
    val d = dim / m
    val scored = candidates.select(col("query_id"), col(idCol).as("__id"))
      .join(codes.withColumnRenamed(idCol, "__id"), Seq("__id"))
      .join(broadcast(lut(queries, cb, idCol, vecCol, d, m)),
        Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("__id"))
      .agg(sum(col("pd9")).as("est_d9"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("est_d9").asc, col("__id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("__id").as(idCol), col("est_d9"))
  }
}
