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
    val expected = gated
      .join(histFp, Seq("fp"), "left")
      .join(nd, Seq("doc_id"), "left")
      .withColumn("is_exact_dup", col("__seen").isNotNull)
      .withColumn("is_near_dup", col("__nd").isNotNull)
      .select(col("doc_id"), col("source"), col("keep"),
        col("is_exact_dup"), col("is_near_dup"),
        (col("keep") && !col("is_exact_dup") && !col("is_near_dup")).as("clean"))

    assert(out.count() > 0)
    assert(sortedRows(out) == sortedRows(expected))
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
