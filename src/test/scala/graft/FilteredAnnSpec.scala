package graft

import org.apache.spark.sql.functions._
import graft.ext.VectorStore
import graft.sources.ManifestStore

/** Attribute-filtered ANN (x175): pre-filter semantics, attrs lifecycle
  * (build/append/forget), and the appendDay attrs contract.
  */
class FilteredAnnSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    graft.Scratch.path(s"vfilt_${java.util.UUID.randomUUID().toString.take(8)}")

  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def buildStore(root: String): Unit =
    VectorStore.build(spark, emb, emb.filter(col("vec_id") % 50 === 0),
      "vec_id", "embedding", root, dim = 64, m = 4, k = 16, stride = 3,
      attrCols = Seq("label"))

  private def queries = emb.filter(col("vec_id") < 8)

  test("an always-true predicate reproduces the unfiltered probe bit for bit") {
    val root = fresh()
    buildStore(root)
    val filtered = sortedRows(VectorStore.probeFiltered(spark, queries,
      "vec_id", "embedding", root, 64, 4, 16, 3, nprobe = 3, topK = 10,
      predicate = lit(true)))
    val plain = sortedRows(VectorStore.probe(spark, queries,
      "vec_id", "embedding", root, 64, 4, 16, 3, nprobe = 3, topK = 10))
    assert(filtered == plain)
  }

  test("every filtered result satisfies the predicate; ranks are dense per query") {
    val root = fresh()
    buildStore(root)
    val out = VectorStore.probeFiltered(spark, queries,
      "vec_id", "embedding", root, 64, 4, 16, 3, nprobe = 3, topK = 10,
      predicate = col("label") % 2 === 0)
    val bad = out.join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
      .filter(col("label") % 2 =!= 0).count()
    assert(bad == 0L, "a result row violates the predicate")
    // pre-filter: ranking runs AFTER the filter, so ranks are 1..n dense
    val ranks = out.groupBy(col("query_id"))
      .agg(max(col("rank")).as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n")).count()
    assert(ranks == 0L, "rank gaps — the filter ran after ranking")
  }

  test("appendDay carries attrs; the appended vector is findable under its attr") {
    val root = fresh()
    val incPred = col("vec_id") % 5 === 1 && col("vec_id") % 3 =!= 0 &&
      col("vec_id") % 50 =!= 0
    VectorStore.build(spark, emb.filter(!incPred),
      emb.filter(col("vec_id") % 50 === 0),
      "vec_id", "embedding", root, 64, 4, 16, 3, attrCols = Seq("label"))
    VectorStore.appendDay(spark, emb.filter(incPred),
      "vec_id", "embedding", root, 64, 4, 16, 3, attrCols = Seq("label"))
    val post = VectorStore.probeFiltered(spark, queries,
      "vec_id", "embedding", root, 64, 4, 16, 3, nprobe = 3, topK = 10,
      predicate = lit(true))
    val full = fresh()
    buildStore(full)
    val oneShot = VectorStore.probeFiltered(spark, queries,
      "vec_id", "embedding", full, 64, 4, 16, 3, nprobe = 3, topK = 10,
      predicate = lit(true))
    assert(sortedRows(post) == sortedRows(oneShot))
  }

  test("appendDay without attrCols on an attrs-bearing store is refused loudly") {
    val root = fresh()
    buildStore(root)
    val e = intercept[IllegalArgumentException] {
      VectorStore.appendDay(spark, emb.filter(col("vec_id") === 3L),
        "vec_id", "embedding", root, 64, 4, 16, 3)
    }
    assert(e.getMessage.contains("attr"))
  }

  test("probeFiltered on a store built without attrs is refused loudly") {
    val root = fresh()
    VectorStore.build(spark, emb, emb.filter(col("vec_id") % 50 === 0),
      "vec_id", "embedding", root, 64, 4, 16, 3)
    val e = intercept[IllegalArgumentException] {
      VectorStore.probeFiltered(spark, queries, "vec_id", "embedding", root,
        64, 4, 16, 3, nprobe = 3, topK = 10, predicate = lit(true))
    }
    assert(e.getMessage.contains("attrCols"))
  }

  test("forget removes the attr rows with the codes") {
    val root = fresh()
    buildStore(root)
    val doomed = Seq(7L, 21L).toDF("vec_id")
    VectorStore.forget(spark, doomed, "vec_id", root)
    assert(ManifestStore.read(spark, s"$root/attrs")
      .join(doomed, Seq("vec_id"), "left_semi").count() == 0L)
  }
}
