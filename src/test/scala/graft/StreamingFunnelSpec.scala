package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, TextAnalysis}
import graft.queries.ExtQueries

/** x57: the incremental-day streaming funnel. The gate's oracle is DuckDB;
  * this suite pins the same claim inside Spark — the streamed, micro-batched,
  * manifest-merged funnel must be indistinguishable from the batch
  * composition of the identical library operators — plus the index/probe
  * API split the funnel's per-batch probe relies on.
  */
class StreamingFunnelSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("x57 streaming funnel equals its batch composition on sf0.001") {
    val out = ExtQueries.x57StreamingFunnel(spark, sfDir)

    val inc = docs.filter(col("doc_id") % 5 === 0)
    val hist = docs.filter(col("doc_id") % 5 =!= 0)
    val gated = TextAnalysis.qualityGate(
        inc.select(col("doc_id"), col("text"), col("lang"), col("source")), "text", "lang")
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
    val histFp = hist.select(TextAnalysis.fingerprint(col("text")).as("fp"))
      .distinct().withColumn("__seen", lit(1))
    val nd = Dedup.minhashPairsAgainst(gated.filter(col("keep")), hist,
        "doc_id", "text", shingleN = 3, bands = 32, rowsPerBand = 2, threshold = 0.7)
      .select(col("inc_id").as("doc_id")).distinct().withColumn("__nd", lit(1))
    // the decontamination leg: kept docs carrying any 6-gram of the LIVE
    // suite (A; B is retired in the funnel's registry) are flagged
    val suiteGrams = Dedup.shingleRows(
        docs.filter(col("doc_id") % 50 === 0), "doc_id", "text", 6)
      .select(col("s")).distinct()
    val ct = Dedup.shingleRows(gated.filter(col("keep")), "doc_id", "text", 6)
      .join(suiteGrams, Seq("s"), "left_semi")
      .select(col("id").as("doc_id")).distinct().withColumn("__ct", lit(1))
    val expected = gated
      .join(histFp, Seq("fp"), "left")
      .join(nd, Seq("doc_id"), "left")
      .join(ct, Seq("doc_id"), "left")
      .withColumn("is_exact_dup", col("__seen").isNotNull)
      .withColumn("is_near_dup", col("__nd").isNotNull)
      .withColumn("is_contaminated", col("__ct").isNotNull)
      .select(col("doc_id"), col("source"), col("keep"),
        col("is_exact_dup"), col("is_near_dup"), col("is_contaminated"),
        (col("keep") && !col("is_exact_dup") && !col("is_near_dup") &&
          !col("is_contaminated")).as("clean"))

    assert(out.count() > 0)
    assert(sortedRows(out) == sortedRows(expected))
  }

  test("DedupStores: day-2 probes day-1's persisted tables, no rebuild") {
    import graft.ext.DedupStores
    val base = graft.Scratch.path(s"dstores_spec_${java.util.UUID.randomUUID().toString.take(8)}")
    val hist = docs.filter(col("doc_id") % 5 =!= 0)
    DedupStores.build(spark, hist, "doc_id", "text", s"$base/fp", s"$base/idx")
    // day 2: an IN-MEMORY increment — if the probe still worked off the
    // historical corpus, the plan would have to scan documents.parquet;
    // it must scan ONLY the two store tables (+ the local increment)
    import spark.implicits._
    val histRow = hist.select(col("doc_id"), col("text")).limit(1)
      .collect().map(r => (r.getLong(0) + 1000000L, r.getString(1))).head
    val inc = Seq(histRow, (9999991L, "a completely novel never seen text " * 5))
      .toDF("doc_id", "text")
    val probe = DedupStores.probe(spark, inc, "doc_id", "text",
      s"$base/fp", s"$base/idx")
    val scans = probe.queryExecution.executedPlan.toString
    assert(scans.contains(s"$base/fp") && scans.contains(s"$base/idx"))
    assert(!scans.contains("documents.parquet"))
    val got = probe.collect().map(r =>
      (r.getLong(0), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4))).sortBy(_._1)
    // the copied doc is an exact dup of day-1 history; the novel doc is clean
    assert(got(0) == ((histRow._1, true, true, false)))
    assert(got(1) == ((9999991L, false, false, true)))
    // append the clean doc; a re-probe of the SAME increment now sees it
    DedupStores.append(spark,
      inc.filter(col("doc_id") === 9999991L), "doc_id", "text",
      s"$base/fp", s"$base/idx")
    val again = DedupStores.probe(spark, inc, "doc_id", "text",
        s"$base/fp", s"$base/idx")
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(again(9999991L)) // yesterday's clean doc is today's history
  }

  test("store-backed novelty equals direct novelty (history never rescanned)") {
    import graft.ext.DedupStores
    val base = graft.Scratch.path(s"nvl_spec_${java.util.UUID.randomUUID().toString.take(8)}")
    val inc = docs.filter(col("doc_id") % 5 === 0)
    val hist = docs.filter(col("doc_id") % 5 =!= 0)
    DedupStores.build(spark, hist, "doc_id", "text", s"$base/fp", s"$base/idx")
    val fromStore = DedupStores.noveltyAgainstStore(
      spark, inc, "doc_id", "text", s"$base/idx")
    val direct = Dedup.noveltyScore(inc, hist, "doc_id", "text")
    assert(sortedRows(fromStore) == sortedRows(direct))
    // the history side reads the store (the inc side still scans the
    // corpus for the arrivals themselves — that's its input)
    assert(fromStore.queryExecution.executedPlan.toString.contains(s"$base/idx"))
  }

  test("DedupStores rejects probes/appends with mismatched build geometry") {
    import graft.ext.DedupStores
    import spark.implicits._
    val base = graft.Scratch.path(s"geom_spec_${java.util.UUID.randomUUID().toString.take(8)}")
    val hist = docs.filter(col("doc_id") % 5 =!= 0).limit(20)
    DedupStores.build(spark, hist, "doc_id", "text", s"$base/fp", s"$base/idx",
      shingleN = 3, partitions = 8)
    val inc = Seq((1L, "some fresh text about nothing at all")).toDF("doc_id", "text")
    // a bigram probe against the trigram index would silently find no
    // collisions; the geometry sidecar turns that into a loud failure
    intercept[IllegalArgumentException] {
      DedupStores.probe(spark, inc, "doc_id", "text",
        s"$base/fp", s"$base/idx", shingleN = 2)
    }
    // a different partition count would hash existing keys to other
    // buckets and duplicate store keys on merge
    intercept[IllegalArgumentException] {
      DedupStores.append(spark, inc, "doc_id", "text",
        s"$base/fp", s"$base/idx", partitions = 16)
    }
    intercept[IllegalArgumentException] {
      DedupStores.noveltyAgainstStore(spark, inc, "doc_id", "text",
        s"$base/idx", shingleN = 4)
    }
    // matching geometry still works
    assert(DedupStores.probe(spark, inc, "doc_id", "text",
      s"$base/fp", s"$base/idx").count() == 1)
  }

  test("minhash index+probe equals the one-shot pairs API") {
    val inc = docs.filter(col("doc_id") % 5 === 0)
    val hist = docs.filter(col("doc_id") % 5 =!= 0)
    val oneShot = Dedup.minhashPairsAgainst(inc, hist, "doc_id", "text",
      shingleN = 3, bands = 32, rowsPerBand = 2, threshold = 0.7)
    val viaIndex = Dedup.minhashProbe(
      Dedup.minhashIndex(inc, "doc_id", "text", 3, 32, 2),
      Dedup.minhashIndex(hist, "doc_id", "text", 3, 32, 2),
      bands = 32, rowsPerBand = 2, threshold = 0.7)
    assert(sortedRows(oneShot) == sortedRows(viaIndex))
  }
}
