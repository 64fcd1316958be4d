package graft

import org.apache.spark.sql.functions._

import graft.ext.{Clustering, Similarity}

/** Spherical k-means (x67) and SemDeDup within-cluster dedup (x68). */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("kmeans on two separated toy clusters recovers them exactly") {
    // cluster A hugs +x, cluster B hugs +y; seeds (ids 0, 100) one in each
    val a = Seq(0L -> Array(1.0f, 0.02f), 2L -> Array(0.9f, 0.1f), 4L -> Array(1.1f, -0.1f))
    val b = Seq(100L -> Array(0.05f, 1.0f), 101L -> Array(-0.1f, 0.9f), 102L -> Array(0.1f, 1.2f))
    val df = (a ++ b).toDF("vec_id", "embedding")
    val got = Clustering.kmeansAssign(df, "vec_id", "embedding", stride = 100L, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(0L -> 0L, 2L -> 0L, 4L -> 0L, 100L -> 100L, 101L -> 100L, 102L -> 100L))
  }

  test("assignments partition the corpus; cluster ids are seed ids") {
    val stats = Clustering.kmeansStats(emb, "vec_id", "embedding", 50L, 2).collect()
    assert(stats.map(_.getLong(1)).sum == emb.count())
    val seedIds = emb.filter(col("vec_id") % 50 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    stats.foreach(r => assert(seedIds.contains(r.getLong(0))))
    stats.foreach(r => assert(r.getDouble(2) <= 1.0 + 1e-9))
  }

  test("Lloyd iterations do not decrease mean cohesion") {
    def meanCohesion(iters: Int): Double = {
      val s = Clustering.kmeansStats(emb, "vec_id", "embedding", 50L, iters)
        .agg(sum(col("cohesion") * col("n_vectors")), sum(col("n_vectors")))
        .head()
      s.getDouble(0) / s.getLong(1)
    }
    val (c0, c2) = (meanCohesion(0), meanCohesion(2))
    assert(c2 >= c0 - 1e-9, s"cohesion fell: $c0 -> $c2")
  }

  test("zero-norm vectors are excluded from corpus AND seeds") {
    // a zero-norm SEED would otherwise be a NaN-cosine centroid that
    // captures the whole corpus under Spark's NaN-greatest ordering
    val df = Seq(
      (0L, Array(0.0f, 0.0f)),  // zero-norm seed candidate (id % 2 == 0)
      (2L, Array(1.0f, 0.1f)),  // real seed
      (1L, Array(0.9f, 0.0f)),
      (3L, Array(0.0f, 0.0f))   // zero-norm corpus vector
    ).toDF("vec_id", "embedding")
    val got = Clustering.kmeansAssign(df, "vec_id", "embedding", stride = 2L, iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L)) // both zero-norm vectors gone
    val stats = Clustering.kmeansStats(df, "vec_id", "embedding", 2L, 1).collect()
    assert(stats.map(_.getLong(1)).sum == 2L)
    stats.foreach(r => assert(!r.getDouble(2).isNaN))
  }

  test("balancedSample caps every cluster at the quota, deterministically") {
    val quota = 5
    val got = Clustering.balancedSample(emb, "vec_id", "embedding", 50L, 2, quota)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val layout = Clustering.kmeansAssign(emb, "vec_id", "embedding", 50L, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val perCluster = got.groupBy(_._2)
    perCluster.foreach { case (_, rows) =>
      assert(rows.length <= quota)
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length)) // dense ranks
    }
    got.foreach { case (id, cid, _) => assert(layout(id) == cid) }
    // a second run picks the identical sample (md5 rank is deterministic)
    val again = Clustering.balancedSample(emb, "vec_id", "embedding", 50L, 2, quota)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.sortBy(r => (r._2, r._3)).toSeq == again.sortBy(r => (r._2, r._3)).toSeq)
  }

  test("semanticDedupPairs stays within clusters and under brute force") {
    val layout = Clustering.kmeansAssign(emb, "vec_id", "embedding", 50L, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val pairs = Clustering.semanticDedupPairs(emb, "vec_id", "embedding", 50L, 2, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (idA, idB, cid, cos) =>
      assert(idA < idB)
      assert(layout(idA) == cid && layout(idB) == cid)
      assert(cos >= 0.4)
    }
    // every emitted pair is also a brute-force >= 0.4 pair (clustering
    // only PRUNES candidates, it never invents similarity)
    val v = emb.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("ve"))
      .withColumn("n", Similarity.norm(col("ve")))
    val exact = v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .withColumn("cos", Similarity.cosine(
        col("a.ve"), col("b.ve"), col("a.n"), col("b.n")))
      .filter(col("cos") >= 0.4)
      .select(col("a.id"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs.foreach(p => assert(exact.contains((p._1, p._2))))
  }
}
