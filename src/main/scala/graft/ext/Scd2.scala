package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension history: turn a change feed (one row
  * per attribute change) into versioned validity intervals, and resolve
  * point-in-time probes against them (Kimball SCD2 — the reference's ERP
  * world models masters this way; cf. the load-date'd dimension job rows
  * with write-date filters in the reference's etl/ CSV job definitions).
  *
  * 100 TB design:
  *  - [[build]] is ONE shuffle on the dimension key: version numbers and
  *    interval ends are a row_number + lead over (key) ordered by
  *    (ts, seq) — no self-join, no range probe;
  *  - [[probe]] reuses [[AsofJoin]]'s union+window formulation: probes
  *    and versions co-shuffle once on the key and a linear in-partition
  *    scan carries the last-opened version forward. Because versions
  *    TILE time (each valid_to is the next valid_from), "latest
  *    valid_from <= t" is exactly interval containment
  *    `valid_from <= t < valid_to` — the oracle can check the asof
  *    result with a plain BETWEEN join, while the engine never builds
  *    the quadratic candidate pairs that BETWEEN join would;
  *  - zero-width versions (two changes at one timestamp) are collapsed
  *    before probing — the BETWEEN semantics can never return them, and
  *    dropping them keeps the tiling invariant.
  */
object Scd2 {

  /** Build the SCD2 history from a change feed: one output row per
    * change, with `version` 1..n per key, `valid_from_us` = the change
    * timestamp, `valid_to_us` = the next change's timestamp (null for
    * the current version). Ties on the timestamp are totally ordered by
    * `seqCol` (a unique change id), so the build is deterministic; the
    * earlier change of a tie becomes a zero-width version.
    */
  def build(
      changes: DataFrame,
      keyCol: String,
      tsUsCol: String,
      seqCol: String,
      attrCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsUsCol), col(seqCol))
    changes.select((Seq(col(keyCol), col(tsUsCol), col(seqCol)) ++ attrCols.map(col)): _*)
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_from_us", col(tsUsCol))
      .withColumn("valid_to_us", lead(col(tsUsCol), 1).over(w))
      .drop(tsUsCol, seqCol)
  }

  /** Resolve each probe row's dimension state as of its timestamp:
    * attaches `version` and the attribute columns of the history version
    * containing `probeTsUs` (null columns when the probe precedes the
    * key's first version). `history` is [[build]]'s output.
    */
  def probe(
      history: DataFrame,
      probes: DataFrame,
      keyCol: String,
      probeTsUs: String,
      attrCols: Seq[String]): DataFrame = {
    val live = history.filter(
      col("valid_to_us").isNull || col("valid_from_us") < col("valid_to_us"))
    AsofJoin(
      probes, live, keyCol, probeTsUs, "valid_from_us",
      (Seq("version" -> "version") ++ attrCols.map(c => c -> c)).toMap)
  }
}
