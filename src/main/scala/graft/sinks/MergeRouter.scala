package graft.sinks

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import graft.spec.Specs.ReprocessMode
import graft.spec.Specs.ReprocessMode._

/** Upsert routing — the reference's `reprocess` load semantics
  * (reference cubicerpetl/cubicerpetl.py:505-537; id-recovery join against
  * the log state store :664-671; mode table in SURVEY.md §2.7).
  *
  * The reference decides insert-vs-update per row by probing the `etl.log`
  * table for a previously loaded `(job, pk) → model_id`. The distributed
  * form is a single left join of the incoming batch against the key-state
  * table, then routing each row to an action. One shuffle-or-broadcast join
  * total; the three writes that follow are filter-partitioned from the same
  * routed plan (classic foreachBatch + MERGE shape).
  */
object MergeRouter {

  val ActionCol = "__action"
  val IdCol = "__model_id"

  /** Join `incoming` (must carry `pkCol`) to `state` (columns: `pk`,
    * `model_id`) and add `__action` ∈ {insert, update, delete, skip} plus
    * `__model_id` (the recovered destination id, null for inserts).
    *
    * Semantics per mode (reference lines in parens):
    *  - Insert:     every row → insert (:509-517)
    *  - Update:     matched → update, unmatched → insert (:518-537)
    *  - NoUpdate:   matched → skip,   unmatched → insert (:529-537)
    *  - OnlyUpdate: matched → update, unmatched → skip (:518-528)
    *  - Delete:     matched rows ALSO emit a delete action for the old id,
    *                then every row → insert (:506-517)
    */
  def route(incoming: DataFrame, state: DataFrame, pkCol: String, mode: ReprocessMode): DataFrame = {
    val st0 = state.select(col("pk").as("__st_pk"), col("model_id").as(IdCol))
    // State tables are bounded by loaded-key cardinality; hint broadcast
    // when Catalyst's plan-time estimate fits the session broadcast
    // threshold, so the (typically huge) incoming side never shuffles just
    // to probe key state. Estimation happens on the optimized plan — no
    // action. When stats are unknown/over the threshold the hint is
    // withheld and AQE may still convert at runtime from actual shuffle
    // sizes.
    val conf = org.apache.spark.sql.internal.SQLConf.get
    val st =
      if (conf.autoBroadcastJoinThreshold > 0 &&
          st0.queryExecution.optimizedPlan.stats.sizeInBytes <= conf.autoBroadcastJoinThreshold)
        F.broadcast(st0)
      else st0
    val joined = incoming.join(
      st, incoming(pkCol).cast("string") === col("__st_pk").cast("string"), "left")
      .drop("__st_pk")
    val matched = col(IdCol).isNotNull
    val routed = mode match {
      case Insert =>
        joined.withColumn(ActionCol, lit("insert"))
      case Update =>
        joined.withColumn(ActionCol, when(matched, lit("update")).otherwise(lit("insert")))
      case NoUpdate =>
        joined.withColumn(ActionCol, when(matched, lit("skip")).otherwise(lit("insert")))
      case OnlyUpdate =>
        joined.withColumn(ActionCol, when(matched, lit("update")).otherwise(lit("skip")))
      case Delete =>
        val deletes = joined.filter(matched).withColumn(ActionCol, lit("delete"))
        val inserts = joined.withColumn(ActionCol, lit("insert"))
          .withColumn(IdCol, lit(null).cast(joined.schema(IdCol).dataType))
        // The union puts a pk's delete row and re-insert row in DIFFERENT
        // partitions; repartition on the pk here — where the mode is
        // known — so any partition-local sink (ConnectorSink orders
        // deletes first) applies delete-then-insert correctly without the
        // caller having to remember a co-location flag. Other modes emit
        // one action per pk and skip the extra shuffle.
        deletes.unionByName(inserts).repartition(col(pkCol))
    }
    routed
  }

  /** The rows a sink would act on (drops `skip`). */
  def actionable(routed: DataFrame): DataFrame =
    routed.filter(col(ActionCol) =!= "skip")
}
