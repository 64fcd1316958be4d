package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation — the two standard shapes, as reusable operators.
  * AQE's skew-join handles sort-merge cases automatically at runtime;
  * these are for the cases AQE can't fix: a single hot GROUP BY key, and
  * broadcast-ineligible joins with a known-skewed key column.
  */
object Skew {

  /** Two-phase ("salted") aggregation for hot grouping keys: phase 1
    * aggregates on (key, salt) — spreading each hot key over `buckets`
    * reducers — phase 2 merges the partials per key. Correct only for
    * decomposable aggregates (sum/count/min/max); the caller passes the
    * partial and merge forms.
    *
    * Example: saltedAgg(df, Seq("k"), 32,
    *   partial = Seq(count(lit(1)).as("c")),
    *   merge   = Seq(sum("c").as("c")))
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      buckets: Int,
      partial: Seq[Column],
      merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val phase1 = salted.groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    phase1.groupBy(keys.map(col): _*).agg(merge.head, merge.tail: _*)
  }

  /** Salted join for a skewed fact against a dimension too big to
    * broadcast: the fact side gets a random salt in [0, buckets); the dim
    * side is replicated `buckets` times (explode), so each (key, salt)
    * bucket joins independently. Replication factor = buckets × |dim| —
    * pick the smallest `buckets` that tames the hot keys.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(pmod(hash(monotonically_increasing_id(), spark_partition_id()), lit(buckets)) + lit(buckets), lit(buckets)))
    val replicatedDim = dim.withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(replicatedDim,
        saltedFact(key) === replicatedDim(key) && saltedFact("__salt") === replicatedDim("__salt"))
      .drop(replicatedDim(key)).drop("__salt")
  }

  /** Plan-driven salted join — [[saltPlan]] composed with the join it
    * plans for. Unlike [[saltedJoin]]'s uniform replication, only the
    * HOT keys replicate, each by its own ceil(cnt/target) factor:
    *
    *  - the plan (O(hot keys), broadcast) left-joins both sides;
    *  - a fact row of a hot key draws a random salt in [0, factor) —
    *    routing only, so the join result is deterministic;
    *  - a dim row of a hot key explodes into `factor` copies, one per
    *    salt; well-behaved keys keep factor 1 (single copy, salt 0).
    *
    * The join runs on (key, salt), so a key that would have landed on
    * ONE reducer spreads over `factor` reducers, while total dim
    * replication is Σ hot factors — not buckets × |dim|. This is the
    * shape for a skewed fact against a dimension too big to broadcast
    * and too skew-imbalanced for AQE's sort-merge splitting.
    */
  def plannedSaltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      plan: DataFrame): DataFrame = {
    val p = broadcast(plan.select(col(key).as("__pk"),
      col("salt_buckets").cast("int").as("__nb")))
    val f = fact.join(p, fact(key) === col("__pk"), "left")
      .withColumn("__salt",
        pmod(hash(monotonically_increasing_id(), spark_partition_id()),
          coalesce(col("__nb"), lit(1))))
      .drop("__pk", "__nb")
    val d = dim.join(p, dim(key) === col("__pk"), "left")
      .withColumn("__salt",
        explode(sequence(lit(0), coalesce(col("__nb"), lit(1)) - 1)))
      .drop("__pk", "__nb")
    f.join(d, f(key) === d(key) && f("__salt") === d("__salt"))
      .drop(d(key)).drop("__salt")
  }

  /** Salting PRE-FLIGHT: the plan [[saltedAgg]]/[[saltedJoin]] need as
    * input, computed from the key distribution before the expensive
    * shuffle runs. Every key whose row count exceeds `targetRows` (the
    * rows one reducer should own — derived from executor memory / spill
    * budget) gets `salt_buckets` = ceil(cnt / targetRows); well-behaved
    * keys are omitted (salt 1 implied). One map-side-combined groupBy to
    * O(distinct keys), filtered to the hot set — this is the x83 skew
    * profile turned into an actionable plan.
    *
    * Output: (`keyCol`, cnt, salt_buckets) for hot keys only.
    */
  def saltPlan(df: DataFrame, keyCol: String, targetRows: Long): DataFrame = {
    require(targetRows >= 1, s"saltPlan: targetRows=$targetRows")
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > targetRows)
      .withColumn("salt_buckets",
        expr(s"(cnt + ${targetRows - 1}L) div ${targetRows}L"))
  }
}
