package graft

import org.apache.spark.sql.functions._
import graft.ext.{IndexStore, Retrieval}

/** Maintained BM25 inverted index (x156): probe == batch equality,
  * replay idempotence, and partition-pruned probes on hand fixtures.
  */
class IndexStoreSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    graft.Scratch.path(s"idxspec_${java.util.UUID.randomUUID().toString.take(8)}")

  private val docs = Seq(
    (1L, "alpha beta beta gamma"),
    (2L, "beta gamma gamma delta"),
    (3L, "alpha alpha epsilon"),
    (4L, ""), // zero-token corpus member: counts toward N and avgdl
    (5L, "delta epsilon zeta alpha")).toDF("doc_id", "text")

  private val qs = Seq(
    ("qa", Seq("alpha", "gamma")),
    ("qb", Seq("delta", "delta", "zeta"))).toDF("query_id", "terms")

  test("probe over day-split ingest equals the one-shot batch BM25") {
    val root = fresh()
    // 3 uneven days, one of them empty-ish — appends must commute
    IndexStore.appendDay(spark, docs.filter(col("doc_id") <= 2),
      "doc_id", "text", "d0", root, partitions = 4)
    IndexStore.appendDay(spark, docs.filter(col("doc_id") === 3),
      "doc_id", "text", "d1", root, partitions = 4)
    IndexStore.appendDay(spark, docs.filter(col("doc_id") >= 4),
      "doc_id", "text", "d2", root, partitions = 4)
    val got = IndexStore.bm25Probe(spark, root, qs, "doc_id",
      topK = 10, partitions = 4).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val want = Retrieval.bm25TopK(docs, "doc_id", "text", qs, k = 10)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == want && got.nonEmpty)
  }

  test("day replay replaces across all three tables; zero-token doc stored") {
    val root = fresh()
    IndexStore.appendDay(spark, docs.filter(col("doc_id") <= 3),
      "doc_id", "text", "d0", root, partitions = 4)
    IndexStore.appendDay(spark, docs.filter(col("doc_id") > 3),
      "doc_id", "text", "d1", root, partitions = 4)
    val probe1 = IndexStore.bm25Probe(spark, root, qs, "doc_id",
      topK = 10, partitions = 4).collect().toSeq
    // re-deliver d1: postings/lens/stats must all REPLACE
    IndexStore.appendDay(spark, docs.filter(col("doc_id") > 3),
      "doc_id", "text", "d1", root, partitions = 4)
    import graft.sources.ManifestStore
    assert(ManifestStore.read(spark, s"$root/lens").count() == 5L)
    assert(ManifestStore.read(spark, s"$root/stats").count() == 2L)
    val lens = ManifestStore.read(spark, s"$root/lens")
      .select(col("id"), col("len")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(lens(4L) == 0L && lens(1L) == 4L)
    val probe2 = IndexStore.bm25Probe(spark, root, qs, "doc_id",
      topK = 10, partitions = 4).collect().toSeq
    assert(probe1.toSet == probe2.toSet)
  }

  test("postings probe is partition-pruned: inputFiles ⊆ the terms' buckets") {
    val root = fresh()
    IndexStore.appendDay(spark, docs, "doc_id", "text", "d0", root, partitions = 4)
    val terms = Seq("alpha", "zeta").toDF("w")
    val probe = IndexStore.postingsProbe(spark, root, terms, partitions = 4)
    val expected = terms
      .select(pmod(xxhash64(col("w").cast("string")), lit(4L)).as("b"))
      .collect().map(r => s"pt=${r.getLong(0)}").toSet
    assert(probe.inputFiles.nonEmpty &&
      probe.inputFiles.forall(f => expected.exists(b => f.contains(b))),
      s"expected ⊆ $expected, got ${probe.inputFiles.mkString(",")}")
  }

  test("geometry: a partitions mismatch fails loudly") {
    val root = fresh()
    IndexStore.appendDay(spark, docs, "doc_id", "text", "d0", root, partitions = 4)
    intercept[IllegalArgumentException] {
      IndexStore.bm25Probe(spark, root, qs, "doc_id", topK = 5, partitions = 8)
    }
  }

  test("repair: orphaned postings from a divergent forget GC'd; probe equals survivors batch") {
    import graft.sources.ManifestStore
    val root = fresh()
    IndexStore.appendDay(spark, docs, "doc_id", "text", "d0", root, partitions = 4)
    // forget doc 1 with text that shares NO terms with the ingested
    // bytes: the lens row dies, its true cells (alpha, beta, gamma)
    // stay orphaned and inflate those terms' df
    IndexStore.forget(spark,
      Seq((1L, "totally different words")).toDF("doc_id", "text"),
      "doc_id", "text", root, forgetSeq = 1L, partitions = 4)
    def orphans(): Long = ManifestStore.read(spark, s"$root/postings")
      .join(ManifestStore.read(spark, s"$root/lens").select(col("id")),
        Seq("id"), "left_anti").count()
    assert(orphans() == 3L) // alpha, beta, gamma cells of doc 1
    val before = IndexStore.bm25Probe(spark, root, qs, "doc_id",
      topK = 10, partitions = 4).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    IndexStore.repair(spark, root, partitions = 4)
    assert(orphans() == 0L)
    IndexStore.repair(spark, root, partitions = 4) // idempotent no-op
    val got = IndexStore.bm25Probe(spark, root, qs, "doc_id",
      topK = 10, partitions = 4).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val want = Retrieval.bm25TopK(docs.filter(col("doc_id") =!= 1L),
      "doc_id", "text", qs, k = 10).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == want, s"got $got want $want")
    assert(before != got, "df inflation never showed in the probe")
  }
}
