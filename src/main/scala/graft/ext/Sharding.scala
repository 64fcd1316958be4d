package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic shard planning — lay a corpus out into ~budget-sized
  * shards in a reproducible, engine-portable order, the layout step
  * before writing training shards for a dataloader. Order is md5 of the
  * row key (the repo's standing determinism convention — never rand()),
  * and a doc's shard is the greedy fill position: shard_id =
  * (running cost total BEFORE the doc) div budget. Docs can straddle a
  * budget boundary, so shards overshoot by at most one doc — the
  * standard greedy packing every shard writer uses.
  *
  * Scale: the global running total is computed WITHOUT a global sort
  * funnel. Docs bucket by [[TextAnalysis.md5Bucket]] (the md5 prefix, so
  * (bucket, md5) order IS md5 order); each bucket cumsums independently
  * under one hash-partitioned window; bucket offsets are a ≤65536-row
  * rollup whose own cumsum runs in one tiny task and broadcast-joins
  * back. The full-volume stages shuffle once and never see more than a
  * bucket's rows in one task — a single ORDER BY over the corpus (what
  * the naive plan and the DuckDB oracle do) would funnel 100 TB through
  * one reducer.
  */
object Sharding {

  /** Plan shards of ~`budget` total `costCol` (greedy fill in md5(key)
    * order). Returns one row per input row:
    * `(keyCol, costCol, shard_id)`; null costs count as 0. `keyCol`
    * must be unique (it is a key): duplicate keys tie in the fill
    * order, making the duplicates' relative positions — and therefore
    * their shard assignment — permutation-dependent.
    */
  def planShards(
      df: DataFrame,
      keyCol: String,
      costCol: String,
      budget: Long): DataFrame = {
    require(budget >= 1L, s"planShards: budget must be >= 1, got $budget")
    val d = df.select(
      col(keyCol),
      coalesce(col(costCol).cast("long"), lit(0L)).as("__c"),
      md5(col(keyCol).cast("string")).as("__mk"),
      TextAnalysis.md5Bucket(col(keyCol)).as("__b"))
    // explicit ROWS frame: the default RANGE frame would lump rows tied
    // on (__mk, key) into one cumulative value — ROWS matches the
    // oracle's row-at-a-time running total exactly
    val inBucket = Window.partitionBy(col("__b"))
      .orderBy(col("__mk"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = d.withColumn("__cum", sum(col("__c")).over(inBucket))
    // bucket offsets: tiny rollup, one task for its cumsum — the ONLY
    // place the global order is threaded through a single partition
    val offsets = d.groupBy(col("__b")).agg(sum(col("__c")).as("__bt"))
      .withColumn("__off",
        coalesce(sum(col("__bt")).over(
          Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__b"), col("__off"))
    withLocal.join(broadcast(offsets), "__b")
      .withColumn("__before", col("__off") + col("__cum") - col("__c"))
      .select(col(keyCol), col("__c").as(costCol),
        expr(s"__before div ${budget}L").as("shard_id"))
  }
}
