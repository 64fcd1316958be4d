package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Day-over-day MAINTAINED WEIGHTED SAMPLE — [[Sampling.weightedTopK]]
  * (Efraimidis–Spirakis A-Res, 2006) joins the maintained-store matrix
  * next to the four sketches (CM x114, histogram x123, HLL x143, KMV
  * x148). The production question: "keep a reproducible 1M-doc
  * weighted sample of the whole corpus, updated as days arrive,
  * honoring erasure requests" — without ever re-ranking history.
  *
  * The store works because A-Res priorities are DETERMINISTIC per row
  * (`round(ln(u)/max(w,1), 6)` with u from the row key's md5 — no RNG
  * state, no draw order): the global top-k by priority is a pure
  * function of the row set, and any of the global k largest priorities
  * is within its own day's k largest (pigeonhole). So per-day top-k
  * summaries merge LOSSLESSLY: the read-time top-k over day summaries
  * is bit-identical to the batch sample over the union.
  *
  * `slack` buys erasure headroom: each day retains its top-(k+slack)
  * candidates, and the merged top-k stays EXACT (equal to the batch
  * sample over the surviving corpus) as long as at most `slack` rows
  * of any single day's retained set have been forgotten — each day's
  * top-k among survivors is then still inside its retained set. Past
  * that bound the sample degrades to "top-k over retained candidates"
  * (never wrong rows, possibly rank-displaced ones); re-appending the
  * breached day restores exactness. The law is specced in
  * SampleStoreSpec.
  *
  * Scale shape: the daily append is one O(day) pass (salted two-phase
  * top-k — no global sort of the day) + O(k+slack) rows of commit I/O;
  * the store holds O(days × (k+slack)) rows total, so reads and
  * forgets touch bounded state no matter the corpus size. Forgets are
  * [[graft.sources.ManifestStore.delete]] keyed deletes whose locate
  * pass scans only the store itself.
  */
object SampleStore {

  /** Append one day's candidates: the day's top-(k+slack) rows by
    * A-Res priority land as day-keyed (key, es_key) rows — global, or
    * PER STRATUM when `byCols` is set (the per-language reproducible
    * sample; the slack law then holds per (stratum, day) retained
    * set). Replaying a day REPLACES its rows (keyed merge on the day
    * partition), so at-least-once delivery converges.
    */
  def appendDay(
      spark: SparkSession,
      df: DataFrame,
      keyCol: String,
      weight: org.apache.spark.sql.Column,
      day: String,
      k: Int,
      slack: Int,
      table: String,
      byCols: Seq[String] = Nil): Unit = {
    require(k > 0 && slack >= 0, s"SampleStore.appendDay: k=$k, slack=$slack")
    import graft.sources.ManifestStore
    val top = Sampling.weightedTopKBy(df, keyCol, weight, byCols, k + slack)
      .select((byCols :+ keyCol).map(col) :+ col("es_key"): _*)
      .withColumn("day", lit(day))
    ManifestStore.mergeOrCreate(spark, table, top,
      byCols ++ Seq(keyCol, "day"), "day")
  }

  /** The maintained sample: global top-k by (es_key desc, key) over the
    * store's day summaries, ranked 1..k — bit-identical to
    * [[Sampling.weightedTopK]] over the surviving corpus whenever every
    * day's forget count is within its slack (see object doc). The scan
    * is O(days × (k+slack)) rows; the final rank runs on that bounded
    * set, not the corpus.
    */
  def sampleFromStore(
      spark: SparkSession,
      table: String,
      keyCol: String,
      k: Int,
      byCols: Seq[String] = Nil): DataFrame = {
    import graft.sources.ManifestStore
    val global = Window.partitionBy(byCols.map(col): _*)
      .orderBy(col("es_key").desc, col(keyCol))
    ManifestStore.read(spark, table)
      .withColumn("sample_rank", row_number().over(global).cast("long"))
      .filter(col("sample_rank") <= k)
      .select((byCols :+ keyCol).map(col) :+ col("sample_rank") :+ col("es_key"): _*)
  }

  /** Erase keys from the sample store (right-to-be-forgotten, the x171
    * matrix): a keyed ManifestStore delete. The doomed frame carries no
    * day column, so the delete's locate pass reads the STORE (bounded:
    * O(days × (k+slack)) rows), never the corpus. Exactness after the
    * forget follows the slack law in the object doc.
    */
  def forget(
      spark: SparkSession,
      table: String,
      keyCol: String,
      doomed: DataFrame): Unit =
    graft.sources.ManifestStore.delete(
      spark, table, doomed.select(col(keyCol)), Seq(keyCol), Seq("day"))
}
