package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Pq}

/** K-means-trained PQ codebooks (x149): Lloyd semantics on the
  * fixed-point grid, seed equivalence, distortion monotonicity,
  * dominated-codeword drop, determinism.
  */
class PqTrainSpec extends SparkSpec {
  import spark.implicits._

  private def cbSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getSeq[Double](2).toList)).toSet

  test("iters = 0 returns the stride-sampled seed codebook unchanged") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
      (1L, Seq(0.0f, 1.0f, 1.0f, 0.0f)),
      (2L, Seq(1.0f, 0.1f, 0.9f, 0.0f))).toDF("vec_id", "embedding")
    val seed = Pq.codebook(vecs, "vec_id", "embedding", dim = 4, m = 2, k = 2, stride = 1)
    val zero = Pq.codebookKmeans(vecs, "vec_id", "embedding",
      dim = 4, m = 2, k = 2, stride = 1, iters = 0)
    assert(cbSet(zero) == cbSet(seed))
  }

  test("one Lloyd step: hand-computed fixed-point centroid means") {
    // dim 2, m 1, k 2, stride 2: seeds = vectors 0 and 2.
    // assignment: {v0, v1} -> code 0, {v2, v3} -> code 1;
    // recompute: code0 = (0.1, 0), code1 = (9.9, 10) — exact on the
    // 1e-6 grid, so the doubles are exact too
    val vecs = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(0.2f, 0.0f)),
      (2L, Seq(10.0f, 10.0f)), (3L, Seq(9.8f, 10.0f))).toDF("vec_id", "embedding")
    val trained = Pq.codebookKmeans(vecs, "vec_id", "embedding",
      dim = 2, m = 1, k = 2, stride = 2, iters = 1)
    assert(cbSet(trained) == Set(
      (0L, 0L, List(0.1d, 0.0d)),
      (0L, 1L, List(9.9d, 10.0d))))
  }

  test("distortion is monotone non-increasing over iterations; trained beats seed") {
    // an asymmetric fixture where the stride seeds sit off the cluster
    // means, so at least the first iteration strictly improves
    val vecs = (0L until 24L).map { i =>
      val base = if (i % 2 == 0) 0.0f else 5.0f
      (i, Seq(base + (i % 7) * 0.1f, base - (i % 5) * 0.1f,
        base + (i % 3) * 0.2f, base)) }.toDF("vec_id", "embedding")
    def total(iters: Int): Long = {
      val cb = Pq.codebookKmeans(vecs, "vec_id", "embedding",
        dim = 4, m = 2, k = 4, stride = 6, iters = iters)
      Pq.distortion(vecs, cb, "vec_id", "embedding", dim = 4, m = 2)
        .agg(sum(col("d9_total"))).head().getLong(0)
    }
    val d = (0 to 3).map(total)
    assert(d.sliding(2).forall(p => p(1) <= p(0)), s"not monotone: $d")
    assert(d(1) < d(0), s"first step should strictly improve here: $d")
  }

  test("dominated codeword drops out; ties break to the lower code id") {
    // duplicate seed vectors: codes 0 and 1 start identical, every
    // assignment ties to code 0, so the trained book drops code 1
    val vecs = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(1.0f, 1.0f)),
      (2L, Seq(0.0f, 0.0f)), (3L, Seq(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val trained = Pq.codebookKmeans(vecs, "vec_id", "embedding",
      dim = 2, m = 1, k = 2, stride = 2, iters = 1)
    assert(cbSet(trained) == Set((0L, 0L, List(0.5d, 0.5d))))
    // distortion's n_codes reports the same drop against the raw seed
    val seed = Pq.codebook(vecs, "vec_id", "embedding", dim = 2, m = 1, k = 2, stride = 2)
    val nc = Pq.distortion(vecs, seed, "vec_id", "embedding", dim = 2, m = 1)
      .head()
    assert(nc.getLong(1) == 1L, s"expected 1 picked code, got $nc")
  }

  test("training is deterministic under repartition") {
    val vecs = (0L until 30L).map(i =>
      (i, Seq((i % 9).toFloat * 0.3f, (i % 4).toFloat, (i % 6).toFloat * 0.5f,
        (i % 11).toFloat * 0.2f))).toDF("vec_id", "embedding")
    val a = Pq.codebookKmeans(vecs, "vec_id", "embedding",
      dim = 4, m = 2, k = 4, stride = 7, iters = 2)
    val b = Pq.codebookKmeans(vecs.repartition(7), "vec_id", "embedding",
      dim = 4, m = 2, k = 4, stride = 7, iters = 2)
    assert(cbSet(a) == cbSet(b))
  }

  test("trained codebook feeds encode/ADC unchanged (provenance-agnostic dataflow)") {
    val vecs = (0L until 20L).map(i =>
      (i, Seq((i % 5).toFloat, (i % 3).toFloat, (i % 7).toFloat * 0.5f,
        (i % 2).toFloat))).toDF("vec_id", "embedding")
    val cb = Pq.codebookKmeans(vecs, "vec_id", "embedding",
      dim = 4, m = 2, k = 3, stride = 5, iters = 2)
    val codes = Pq.encode(vecs, cb, "vec_id", "embedding", dim = 4, m = 2)
    assert(codes.count() == 40L) // m rows per vector
    val top = Pq.adcTopK(vecs.filter(col("vec_id") === 0L), codes, cb,
      "vec_id", "embedding", dim = 4, m = 2, k = 5).collect()
    assert(top.length == 5 && top.map(_.getInt(1)).toSet == (1 to 5).toSet)
  }
}
