package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join — the scale path for range-predicate joins Spark
  * has no operator for (a plain `ON pt BETWEEN lo AND hi` with no
  * equi-key plans as BroadcastNestedLoopJoin or a cartesian product,
  * both quadratic). The standard binning technique: quantize the range
  * dimension into fixed-width buckets, turn the range predicate into a
  * bucket EQUI-join (points land in one bucket; intervals explode over
  * the buckets they overlap), and re-check the exact predicate on the
  * (pruned) candidate pairs. Work is O(points + interval-bucket rows +
  * true matches) — never |left|×|right|.
  *
  * `bucketWidth` tunes the fan-out/precision trade: ~the median interval
  * span is the usual choice (each interval explodes into O(1) buckets;
  * candidates per point ≈ intervals genuinely near it). A width far
  * below the span inflates the interval explode; far above it inflates
  * false candidates — both degrade gracefully, neither is quadratic.
  *
  * Intervals are half-open [lo, hi) (event-time convention; an empty
  * interval lo >= hi matches nothing). Optional `keys` become extra
  * equi-join columns riding the same shuffle.
  */
object RangeJoin {

  /** Point-in-interval join: every (left point, right interval) pair
    * with `lo <= pt < hi` (and equal `keys`, when given). Each interval
    * appears once per overlapped bucket and a point lives in exactly ONE
    * bucket, so each qualifying pair surfaces exactly once — no dedup
    * pass. Returns left columns + right columns (right's join-key copies
    * dropped).
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      ptCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth >= 1, s"RangeJoin: bucketWidth=$bucketWidth")
    val p = points.withColumn("__b", bucketExpr(ptCol, bucketWidth))
    val iv = intervals
      .filter(col(loCol) < col(hiCol))
      .withColumn("__hi1", col(hiCol) - lit(1L))
      .withColumn("__b", explode(sequence(
        bucketExpr(loCol, bucketWidth),
        bucketExpr("__hi1", bucketWidth))))
      .drop("__hi1")
    p.join(iv, Seq("__b") ++ keys)
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("__b")
  }

  /** Interval-overlap join: every (a, b) pair whose half-open intervals
    * intersect (and equal `keys`, when given). Both sides explode over
    * their buckets; a pair would surface once per SHARED bucket, so the
    * join keeps only the pair's CANONICAL bucket — the one holding
    * max(aLo, bLo), i.e. the first bucket where both are present — which
    * deduplicates without a distinct pass (the classic bin-join trick).
    */
  def intervalOverlap(
      a: DataFrame,
      b: DataFrame,
      aLo: String, aHi: String,
      bLo: String, bHi: String,
      bucketWidth: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth >= 1, s"RangeJoin: bucketWidth=$bucketWidth")
    def expand(df: DataFrame, lo: String, hi: String): DataFrame = df
      .filter(col(lo) < col(hi))
      .withColumn("__hi1", col(hi) - lit(1L))
      .withColumn("__b", explode(sequence(
        bucketExpr(lo, bucketWidth),
        bucketExpr("__hi1", bucketWidth))))
      .drop("__hi1")
    expand(a, aLo, aHi).join(expand(b, bLo, bHi), Seq("__b") ++ keys)
      .filter(col(aLo) < col(bHi) && col(bLo) < col(aHi))
      .withColumn("__mx", greatest(col(aLo), col(bLo)))
      .filter(col("__b") === bucketExpr("__mx", bucketWidth))
      .drop("__b", "__mx")
  }

  /** Floor bucket in EXACT integer arithmetic over the whole LONG
    * domain: the pmod pre-subtract makes `div`'s truncation a floor on
    * negative values too (the epochMicros convention), and integral
    * `div` never loses precision the way a double division would past
    * 2^53 (epoch micros exceed that within the calendar).
    */
  private def bucketExpr(colName: String, w: Long): Column =
    expr(s"(`$colName` - pmod(`$colName`, ${w}L)) div ${w}L")
}
