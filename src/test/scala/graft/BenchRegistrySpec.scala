package graft

import org.apache.spark.sql.functions._
import graft.ext.{BenchRegistry, Dedup}
import graft.sources.ManifestStore

/** Maintained benchmark-gram registry (x222/x223): probe == one-shot
  * equality, suite append replay, retire pruning + idempotence, and
  * geometry refusal on hand fixtures.
  */
class BenchRegistrySpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    graft.Scratch.path(s"benchreg_${java.util.UUID.randomUUID().toString.take(8)}")

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs"),
    (3L, "the quick brown fox sleeps all day long"),
    (4L, "short text")).toDF("doc_id", "text")

  private val suiteA = Seq(
    (10L, "the quick brown fox jumps over a fence")).toDF("doc_id", "text")
  private val suiteB = Seq(
    (20L, "pack my box with five dozen liquor jugs today")).toDF("doc_id", "text")

  test("probe from the store equals the one-shot benchmarkOverlap") {
    val table = fresh()
    BenchRegistry.appendSuite(spark, suiteA, "doc_id", "text", "A", table, shingleN = 3)
    BenchRegistry.appendSuite(spark, suiteB, "doc_id", "text", "B", table, shingleN = 3)
    val got = BenchRegistry.probe(spark, corpus, "doc_id", "text", table)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Dedup.benchmarkOverlap(
        corpus, suiteA.unionByName(suiteB), "doc_id", "text", shingleN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && got.exists(_._3 > 0))
  }

  test("suite replay replaces; retire prunes one suite and is idempotent") {
    val table = fresh()
    BenchRegistry.appendSuite(spark, suiteA, "doc_id", "text", "A", table, shingleN = 3)
    BenchRegistry.appendSuite(spark, suiteB, "doc_id", "text", "B", table, shingleN = 3)
    BenchRegistry.appendSuite(spark, suiteA, "doc_id", "text", "A", table, shingleN = 3)
    val perSuite = ManifestStore.read(spark, table)
      .groupBy("suite").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val aGrams = Dedup.shingleRows(suiteA, "doc_id", "text", 3).count()
    val bGrams = Dedup.shingleRows(suiteB, "doc_id", "text", 3).count()
    assert(perSuite == Map("A" -> aGrams, "B" -> bGrams))
    BenchRegistry.retireSuite(spark, "B", table)
    BenchRegistry.retireSuite(spark, "B", table)
    assert(ManifestStore.read(spark, table).select("suite").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("A"))
    // post-retire probe == one-shot vs suite A alone
    val got = BenchRegistry.probe(spark, corpus, "doc_id", "text", table)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val want = Dedup.benchmarkOverlap(corpus, suiteA, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got == want)
  }

  test("attribute: per-suite hit counts; shared grams count once per suite") {
    val table = fresh()
    BenchRegistry.appendSuite(spark, suiteA, "doc_id", "text", "A", table, shingleN = 3)
    // suiteC shares suiteA's text — every shared gram attributes to BOTH
    BenchRegistry.appendSuite(spark, suiteA, "doc_id", "text", "C", table, shingleN = 3)
    val got = BenchRegistry.attribute(spark, corpus, "doc_id", "text", table)
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    assert(got.nonEmpty)
    got.collect { case ((id, "A"), n) => assert(got(id -> "C") == n) }
    assert(got.keySet.map(_._2) == Set("A", "C"))
  }

  test("re-delivery is TRUE replacement: a corrected suite drops its stale grams") {
    val table = fresh()
    // first delivery mis-extracted: suiteA's text plus a spurious line
    val bad = suiteA.unionByName(
      Seq((11L, "spurious mis extracted gram line")).toDF("doc_id", "text"))
    BenchRegistry.appendSuite(spark, bad, "doc_id", "text", "A", table, shingleN = 3)
    val before = ManifestStore.read(spark, table).count()
    // corrected re-delivery: the suite partition is REPLACED, so the
    // spurious grams vanish (an upsert would keep them forever)
    BenchRegistry.appendSuite(spark, suiteA, "doc_id", "text", "A", table, shingleN = 3)
    val grams = ManifestStore.read(spark, table)
      .select("s").collect().map(_.getString(0)).toSet
    assert(ManifestStore.read(spark, table).count() < before)
    assert(!grams.exists(_.contains("spurious")))
    assert(grams == Dedup.shingleRows(suiteA, "doc_id", "text", 3)
      .collect().map(_.getString(1)).toSet)
  }

  test("probeBloom: the bloom is invisible — equals probe restricted to hit docs") {
    val table = fresh()
    BenchRegistry.appendSuite(spark, suiteA, "doc_id", "text", "A", table, shingleN = 3)
    BenchRegistry.appendSuite(spark, suiteB, "doc_id", "text", "B", table, shingleN = 3)
    val got = BenchRegistry.probeBloom(spark, corpus, "doc_id", "text", table)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = BenchRegistry.probe(spark, corpus, "doc_id", "text", table)
      .filter(col("n_contaminated") > 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("geometry: an n mismatch and a non-registry path fail loudly") {
    val table = fresh()
    BenchRegistry.appendSuite(spark, suiteA, "doc_id", "text", "A", table, shingleN = 3)
    intercept[IllegalArgumentException] {
      BenchRegistry.appendSuite(spark, suiteB, "doc_id", "text", "B", table, shingleN = 6)
    }
    intercept[IllegalStateException] {
      BenchRegistry.probe(spark, corpus, "doc_id", "text", fresh())
    }
    intercept[IllegalStateException] {
      BenchRegistry.retireSuite(spark, "A", fresh())
    }
  }

  test("a fully-retired registry reads as zero contamination, not a crash") {
    val table = fresh()
    BenchRegistry.appendSuite(spark, suiteA, "doc_id", "text", "A", table, shingleN = 3)
    BenchRegistry.appendSuite(spark, suiteB, "doc_id", "text", "B", table, shingleN = 3)
    BenchRegistry.retireSuite(spark, "A", table)
    BenchRegistry.retireSuite(spark, "B", table)
    // probe: every doc reports its gram count with 0 contaminated —
    // the all-suites-retracted curation state is an answer, not an error
    val got = BenchRegistry.probe(spark, corpus, "doc_id", "text", table)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val want = Dedup.shingleRows(corpus, "doc_id", "text", 3)
      .select(col("id")).distinct().collect().map(_.getLong(0)).toSet
    assert(got.keySet == want && got.values.forall(_ == 0L))
    // attribute and the bloom path report no hits (their hit-only shape)
    assert(BenchRegistry.attribute(spark, corpus, "doc_id", "text", table).isEmpty)
    assert(BenchRegistry.probeBloom(spark, corpus, "doc_id", "text", table).isEmpty)
  }
}
