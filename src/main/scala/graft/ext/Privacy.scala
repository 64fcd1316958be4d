package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk audits for release hygiene: k-anonymity / l-diversity
  * over quasi-identifier (QI) combinations (Sweeney; Machanavajjhala et
  * al.). The corpus-release complement of the PII span redaction in
  * [[Redaction]]: redaction scrubs values INSIDE a document, this audits
  * whether the row-level metadata published WITH each document (source,
  * language, length band, ...) re-identifies individuals by rare
  * combination.
  *
  * 100 TB design: one map-side-combined groupBy on the QI tuple — the
  * output is O(distinct QI combinations), never row-sized; l-diversity
  * rides the same shuffle as an exact count_distinct of the sensitive
  * column per class (a second shuffle keyed by (QI, sensitive) would be
  * the exact-distinct expansion — at this cardinality Spark's
  * count_distinct plans it automatically). No row leaves its executor
  * un-aggregated.
  */
object Privacy {

  /** k-anonymity + l-diversity audit: one row per QI equivalence class
    * with its size, the number of distinct sensitive values it exposes,
    * and an at-risk flag (class smaller than k — publishable only after
    * suppression or generalization).
    *
    * @param sensitiveCol column whose values the adversary learns on
    *                     re-identification (drives `l_distinct`)
    */
  def kAnonymityAudit(
      df: DataFrame,
      qiCols: Seq[String],
      sensitiveCol: String,
      k: Long): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(
        count(lit(1)).as("class_size"),
        count_distinct(col(sensitiveCol)).as("l_distinct"))
      .withColumn("at_risk", col("class_size") < k)
}
