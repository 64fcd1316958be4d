package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus datasheet: the per-source composition report a training-data
  * release ships with (the "data card" of Gebru et al. 2021's Datasheets
  * for Datasets, reduced to the measurable composition rows) — volume,
  * token mass, language mix, within-source exact-duplicate mass, and the
  * length median, in one table.
  *
  * Everything is a composition of existing one-shuffle aggregates, each
  * keyed on (source) or (source, small-cardinality attribute), joined at
  * O(sources) rows via broadcast — no shape here grows faster than the
  * corpus scan itself.
  */
object DataCard {

  /** One row per source:
    * (source, n_docs, n_tokens, n_langs, top_lang, top_lang_share,
    * dup_docs, med_chars).
    *
    *  - `n_tokens`: Σ [[TextAnalysis.wordCount]] — a narrow map folded
    *    into the base aggregate's map-side combine;
    *  - `top_lang`/`top_lang_share`: modal language by the total order
    *    (count DESC, lang ASC) over the O(sources × langs) rollup;
    *  - `dup_docs`: rows belonging to a within-source exact-duplicate
    *    group (same [[TextAnalysis.fingerprint]] as x01), i.e. the mass
    *    an exact-dedup pass would inspect;
    *  - `med_chars`: exact nearest-rank-lower median via
    *    [[Quantiles.groupQuantiles]] — the shuffle carries the distinct
    *    length distribution, not rows.
    *
    * Determinism: every column is an exact integer or a single rounded
    * (6 dp) division of exact integers.
    */
  def sourceCard(
      df: DataFrame,
      sourceCol: String = "source",
      textCol: String = "text",
      langCol: String = "lang",
      charsCol: String = "n_chars"): DataFrame = {
    val base = df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.wordCount(col(textCol))).as("n_tokens"),
        countDistinct(col(langCol)).as("n_langs"))
    val byCount = Window.partitionBy(col("source"))
      .orderBy(col("__lc").desc, col("top_lang"))
    val langTop = df
      .groupBy(col(sourceCol).as("source"), col(langCol).as("top_lang"))
      .agg(count(lit(1)).as("__lc"))
      .withColumn("__rn", row_number().over(byCount))
      .filter(col("__rn") === 1)
      .select(col("source"), col("top_lang"), col("__lc"))
    val dup = df
      .groupBy(col(sourceCol).as("source"),
        TextAnalysis.fingerprint(col(textCol)).as("__fp"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("source"))
      .agg(sum(when(col("__c") > 1L, col("__c")).otherwise(0L)).as("dup_docs"))
    val med = Quantiles.groupQuantiles(df, Seq(sourceCol), charsCol, Seq(0.5))
      .select(col(sourceCol).as("source"), col(charsCol).as("med_chars"))
    base
      .join(broadcast(langTop), "source")
      .join(broadcast(dup), "source")
      .join(broadcast(med), "source")
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_langs"),
        col("top_lang"),
        round(col("__lc").cast("double") / col("n_docs").cast("double"), 6)
          .as("top_lang_share"),
        col("dup_docs"), col("med_chars"))
  }
}
