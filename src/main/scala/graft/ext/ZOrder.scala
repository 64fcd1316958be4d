package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data
  * skipping (extension surface, SURVEY.md §2.12) — the public
  * Delta/Iceberg `ZORDER BY` idea on plain columns: interleave the bits
  * of two dimension ranks so rows close in BOTH dimensions land in the
  * same file, making per-file min/max statistics selective for
  * predicates on EITHER dimension.
  *
  * Why it matters at 100 TB: a table sorted linearly by X gives perfect
  * skipping on X and none on Y — every file spans the full Y range. The
  * Z-curve trades a little X-locality for bounded Y-locality: each of B
  * files covers ~1/sqrt(B) of each dimension's range, so a point/range
  * predicate on either column prunes ~sqrt(B)x more files. The spec
  * (ScaleSpec) asserts exactly that: mean per-bucket bounding-box area
  * shrinks vs the linear layout.
  *
  * Everything here is exact integer arithmetic (rank normalization is
  * one multiply + one integer division; interleaving is 32 shift/mask
  * terms) — codegen'd in Spark, replicated term-for-term by the DuckDB
  * oracle, deterministic on any engine.
  */
object ZOrder {

  val Bits = 16 // per-dimension rank width; z-values fill 32 bits

  /** Exact non-negative integer division: `(a - a mod b) / b` keeps the
    * double division exact (the numerator is an exact multiple of b), so
    * the result always equals SQL `div` — a bare `(a/b).cast("long")`
    * can round UP across an integer boundary and disagree with an
    * integer-division oracle by one.
    */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Normalize `v` into the [0, 2^Bits) rank domain given inclusive
    * min/max bounds: rank = (v - min) * 2^Bits div (max - min + 1).
    * Caller guarantees (max - min) * 2^Bits fits in a long.
    */
  def rank16(v: Column, mn: Column, mx: Column): Column =
    idiv((v - mn).cast("long") * lit(1L << Bits), (mx - mn).cast("long") + lit(1L))

  /** Morton interleave of two 16-bit ranks: bit i of `x` goes to bit 2i,
    * bit i of `y` to bit 2i+1. A fixed sum of shift/mask terms — one
    * codegen'd integer expression, no UDF.
    */
  def zValue(x: Column, y: Column): Column =
    (0 until Bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }

  /** Z-layout file-level statistics: ranks both dimensions, assigns each
    * row a z-bucket (the would-be file), and returns per-bucket row
    * counts and min/max of both dimensions — the skipping metadata a
    * layout would publish. One aggregate for the bounds (broadcast
    * back), one narrow map, one groupBy on the bucket.
    */
  def zOrderStats(
      df: DataFrame,
      xCol: String,
      yCol: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, s"zOrderStats: buckets=$buckets")
    val bounds = df.agg(
      min(col(xCol)).as("__xmn"), max(col(xCol)).as("__xmx"),
      min(col(yCol)).as("__ymn"), max(col(yCol)).as("__ymx"))
    val z = zValue(
      rank16(col(xCol), col("__xmn"), col("__xmx")),
      rank16(col(yCol), col("__ymn"), col("__ymx")))
    df.crossJoin(broadcast(bounds))
      .withColumn("__bucket", idiv(z * lit(buckets.toLong), lit(1L << (2 * Bits))))
      .groupBy(col("__bucket").as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        min(col(xCol)).cast("long").as("x_min"), max(col(xCol)).cast("long").as("x_max"),
        min(col(yCol)).cast("long").as("y_min"), max(col(yCol)).cast("long").as("y_max"))
  }
}
