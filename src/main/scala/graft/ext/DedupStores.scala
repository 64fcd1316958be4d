package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.ManifestStore

/** Persisted, day-over-day-maintained dedup stores — the production form
  * of the incremental-dedup pattern (SURVEY.md §2.12; the reference's
  * closest shape is the reprocess log-state in
  * /root/reference/cubicerpetl/cubicerpetl.py:266-302, which keeps
  * processed-key state between runs; here the state is a maintained
  * TABLE, not a log replay).
  *
  * Two stores, both [[ManifestStore]] tables so every daily refresh is an
  * O(touched partitions) transactional merge rather than a rewrite:
  *  - the FINGERPRINT store: one row per distinct normalized-content
  *    fingerprint ever accepted (keys-only — at 100 TB this is the only
  *    corpus-sized artifact the daily job reads, and it is orders of
  *    magnitude smaller than the corpus);
  *  - the MINHASH INDEX store: the banded LSH index rows of
  *    [[Dedup.minhashIndex]] (id, shingle set, k minhashes), the
  *    persisted index that [[Dedup.minhashProbe]] probes in O(increment ×
  *    bands).
  *
  * Daily cycle: [[probe]] flags the increment against yesterday's stores
  * (exact + near dup) WITHOUT touching the historical corpus — the stores
  * are the only historical input; [[append]] then folds the day's
  * accepted docs into both stores (merge on fp / id, partition-pruned by
  * the hash-bucket partition key), so tomorrow's probe sees today's docs.
  * Nothing historical is ever recomputed: build once, probe + merge
  * daily.
  */
object DedupStores {

  /** Hash-bucket partition key: stable, uniform, and independent of the
    * key's type — merges of a day's increment touch only the buckets its
    * keys land in.
    */
  private def bucket(c: org.apache.spark.sql.Column, partitions: Int) =
    pmod(xxhash64(c), lit(partitions.toLong))

  /** Build (or rebuild) both stores from a corpus slice. One-time — the
    * daily path is [[probe]] + [[append]].
    */
  def build(
      spark: SparkSession,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      fpTable: String,
      idxTable: String,
      shingleN: Int = 3,
      bands: Int = 32,
      rowsPerBand: Int = 2,
      partitions: Int = 8): Unit = {
    val fp = corpus
      .select(TextAnalysis.fingerprint(col(textCol)).as("fp")).distinct()
      .withColumn("pt", bucket(col("fp"), partitions))
    ManifestStore.write(spark, fp, fpTable, "pt")
    val idx = Dedup.minhashIndex(corpus, idCol, textCol, shingleN, bands, rowsPerBand)
      .withColumn("pt", bucket(col("id"), partitions))
    ManifestStore.write(spark, idx, idxTable, "pt")
  }

  /** Flag an increment against the PERSISTED stores. The historical side
    * of both joins is a [[ManifestStore.read]] of the store tables — the
    * corpus that built them is not an input and is never rescanned.
    * Output: one row per increment doc with (idCol, fp, is_exact_dup,
    * is_near_dup, clean).
    */
  def probe(
      spark: SparkSession,
      inc: DataFrame,
      idCol: String,
      textCol: String,
      fpTable: String,
      idxTable: String,
      shingleN: Int = 3,
      bands: Int = 32,
      rowsPerBand: Int = 2,
      threshold: Double = 0.7): DataFrame = {
    val fpStore = ManifestStore.read(spark, fpTable)
      .select(col("fp")).withColumn("__seen", lit(1))
    val idxStore = ManifestStore.read(spark, idxTable).drop("pt")
    val nd = Dedup.minhashProbe(
        Dedup.minhashIndex(inc, idCol, textCol, shingleN, bands, rowsPerBand),
        idxStore, bands, rowsPerBand, threshold)
      .select(col("inc_id").as(idCol)).distinct().withColumn("__nd", lit(1))
    inc.select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .join(fpStore, Seq("fp"), "left")
      .join(nd, Seq(idCol), "left")
      .withColumn("is_exact_dup", col("__seen").isNotNull)
      .withColumn("is_near_dup", col("__nd").isNotNull)
      .withColumn("clean", !col("is_exact_dup") && !col("is_near_dup"))
      .select(col(idCol), col("fp"), col("is_exact_dup"), col("is_near_dup"),
        col("clean"))
  }

  /** Fold a day's accepted docs into both stores: an upsert merge on the
    * store key, partition-pruned to the hash buckets the day's keys land
    * in. Tomorrow's [[probe]] sees these docs as historical.
    * `prebuiltIdx` lets a caller that already computed the docs' minhash
    * index (a probe pass, an accounting count) hand it in instead of
    * paying the signature pass twice.
    */
  def append(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      fpTable: String,
      idxTable: String,
      shingleN: Int = 3,
      bands: Int = 32,
      rowsPerBand: Int = 2,
      partitions: Int = 8,
      prebuiltIdx: Option[DataFrame] = None): Unit = {
    val fp = docs
      .select(TextAnalysis.fingerprint(col(textCol)).as("fp")).distinct()
      .withColumn("pt", bucket(col("fp"), partitions))
    ManifestStore.merge(spark, fpTable, fp, Seq("fp"), "pt")
    val idx = prebuiltIdx
      .getOrElse(Dedup.minhashIndex(docs, idCol, textCol, shingleN, bands, rowsPerBand))
      .withColumn("pt", bucket(col("id"), partitions))
    ManifestStore.merge(spark, idxTable, idx, Seq("id"), "pt")
  }

  /** [[Dedup.noveltyScore]] with history read from the PERSISTED index
    * table: the historical shingle set is recovered from the store's
    * `sh` column (the index already carries each doc's distinct
    * shingles), so scoring a day's arrivals touches the store, never
    * the historical corpus — same contract as [[probe]].
    */
  def noveltyAgainstStore(
      spark: SparkSession,
      inc: DataFrame,
      idCol: String,
      textCol: String,
      idxTable: String,
      shingleN: Int = 3): DataFrame = {
    val histSet = ManifestStore.read(spark, idxTable)
      .select(explode(col("sh")).as("s")).distinct()
      .withColumn("__seen", lit(1L))
    Dedup.noveltyAgainst(
      Dedup.shingleRows(inc, idCol, textCol, shingleN), histSet, idCol)
  }
}
