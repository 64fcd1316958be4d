package graft

import org.apache.spark.sql.functions._
import graft.ext.{Similarity, VectorStore}

/** The persisted nprobe sizing law and its production consumption
  * (x150): writeNprobeLaw / autoNprobe / probeAuto, plus the trained-
  * codebook build option.
  */
class VectorLawSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    graft.Scratch.path(s"veclaw_${java.util.UUID.randomUUID().toString.take(8)}")

  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("stored law resolves the same nprobe as the direct measurement") {
    val data = emb
    val cents = data.filter(col("vec_id") % 50 === 0)
    val queries = data.filter(col("vec_id") < 8)
    val root = fresh()
    VectorStore.build(spark, data, cents, "vec_id", "embedding", root,
      dim = 64, m = 4, k = 16, stride = 3)
    VectorStore.writeNprobeLaw(spark, data, queries, "vec_id", "embedding",
      root, k = 10)
    for (target <- Seq(0.5, 0.9, 1.0)) {
      val direct = Similarity.ivfAutoNprobe(data, cents, queries,
        "vec_id", "embedding", k = 10, targetRecall = target)
      val stored = VectorStore.autoNprobe(spark, root, k = 10, target)
      assert(stored == direct, s"target=$target stored=$stored direct=$direct")
    }
    // the cap flows through the stored path too
    assert(VectorStore.autoNprobe(spark, root, 10, 1.0, maxNprobe = 1) == 1)
  }

  test("probeAuto == probe at the resolved nprobe; law_k mismatch fails loudly") {
    val data = emb
    val cents = data.filter(col("vec_id") % 50 === 0)
    val queries = data.filter(col("vec_id") < 8)
    val root = fresh()
    VectorStore.build(spark, data, cents, "vec_id", "embedding", root,
      dim = 64, m = 4, k = 16, stride = 3)
    VectorStore.writeNprobeLaw(spark, data, queries, "vec_id", "embedding",
      root, k = 10)
    val np = VectorStore.autoNprobe(spark, root, k = 10, targetRecall = 0.9)
    val auto = VectorStore.probeAuto(spark, queries, "vec_id", "embedding",
      root, 64, 4, 16, 3, targetRecall = 0.9, topK = 10)
    val manual = VectorStore.probe(spark, queries, "vec_id", "embedding",
      root, 64, 4, 16, 3, nprobe = np, topK = 10)
    assert(sortedRows(auto) == sortedRows(manual))
    // probing at a depth the law wasn't measured at must not silently
    // reuse the k=10 law
    intercept[IllegalArgumentException] {
      VectorStore.autoNprobe(spark, root, k = 5, targetRecall = 0.9)
    }
    // re-measuring REPLACES the law (the table is re-runnable)
    VectorStore.writeNprobeLaw(spark, data, queries, "vec_id", "embedding",
      root, k = 5)
    assert(VectorStore.autoNprobe(spark, root, k = 5, targetRecall = 0.9) >= 1)
  }

  test("stale law: appends past maxLawLag refuse strictly, warn-mode resolves, re-measure cures") {
    val data = emb
    val cents = data.filter(col("vec_id") % 50 === 0)
    val queries = data.filter(col("vec_id") < 8)
    val root = fresh()
    VectorStore.build(spark,
      data.filter(col("vec_id") % 5 =!= 1), cents, "vec_id", "embedding", root,
      dim = 64, m = 4, k = 16, stride = 3)
    VectorStore.writeNprobeLaw(spark, data.filter(col("vec_id") % 5 =!= 1),
      queries, "vec_id", "embedding", root, k = 10)
    // fresh law resolves
    assert(VectorStore.autoNprobe(spark, root, 10, 0.9) >= 1)
    // one append bumps the codes version past maxLawLag = 0
    VectorStore.appendDay(spark, data.filter(col("vec_id") % 5 === 1),
      "vec_id", "embedding", root, 64, 4, 16, 3)
    val e = intercept[IllegalStateException] {
      VectorStore.autoNprobe(spark, root, 10, 0.9)
    }
    assert(e.getMessage.contains("nprobe law was measured at codes version"))
    intercept[IllegalStateException] {
      VectorStore.probeAuto(spark, queries, "vec_id", "embedding",
        root, 64, 4, 16, 3, targetRecall = 0.9, topK = 10)
    }
    // caller-chosen postures: a raised lag budget or warn-mode resolve
    assert(VectorStore.autoNprobe(spark, root, 10, 0.9, maxLawLag = 1) >= 1)
    assert(VectorStore.autoNprobe(spark, root, 10, 0.9,
      staleLawAction = "warn") >= 1)
    // the cure: re-measure against the grown corpus — strict resolves
    VectorStore.writeNprobeLaw(spark, data, queries, "vec_id", "embedding",
      root, k = 10)
    assert(VectorStore.autoNprobe(spark, root, 10, 0.9) >= 1)
    assert(VectorStore.probeAuto(spark, queries, "vec_id", "embedding",
      root, 64, 4, 16, 3, targetRecall = 0.9, topK = 10).count() > 0L)
  }

  test("trained-codebook build: geometry guards iters; store uses the trained book") {
    val data = emb
    val cents = data.filter(col("vec_id") % 50 === 0)
    val queries = data.filter(col("vec_id") < 8)
    val root = fresh()
    VectorStore.build(spark, data, cents, "vec_id", "embedding", root,
      dim = 64, m = 4, k = 16, stride = 3, trainIters = 2)
    // a probe that assumes the sampled book (iters 0) must fail loudly
    intercept[IllegalArgumentException] {
      VectorStore.probe(spark, queries, "vec_id", "embedding", root,
        64, 4, 16, 3, nprobe = 2, topK = 5)
    }
    // the stored codebook IS the trained one
    // the partition-column round trip narrows `sub` to int — compare
    // through strings for the ids
    val stored = graft.sources.ManifestStore.read(spark, s"$root/codebook")
      .select("sub", "code", "cv").collect()
      .map(r => (r.get(0).toString.toLong, r.get(1).toString.toLong,
        r.getSeq[Double](2).toList)).toSet
    val trained = graft.ext.Pq.codebookKmeans(data, "vec_id", "embedding",
      dim = 64, m = 4, k = 16, stride = 3, iters = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toList)).toSet
    assert(stored == trained)
    // and the geometry-matched probe works end to end
    val out = VectorStore.probe(spark, queries, "vec_id", "embedding", root,
      64, 4, 16, 3, nprobe = 2, topK = 5, trainIters = 2)
    assert(out.count() > 0L)
  }
}
