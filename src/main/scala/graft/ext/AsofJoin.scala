package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the single right row with the
  * greatest `rightTs <= leftTs` within the same key group (the canonical
  * point-in-time lookup of event/feature pipelines; Spark has no native
  * operator for it).
  *
  * Implementation is the UNION + WINDOW formulation, not a per-row range
  * probe: tag both sides, union them, sort within each key partition by
  * (ts, side) and carry the last-seen right payload forward with
  * `last(..., ignoreNulls)` over a running frame. ONE shuffle on the key,
  * in-partition sort, linear scan — at 100 TB this is the only shape that
  * works (a range-condition join would be a quadratic nested loop; the
  * window never materializes pairs). Ties (`rightTs == leftTs`) match,
  * like DuckDB/pandas `ASOF` semantics (right sorts before left at equal
  * timestamps).
  *
  * @param rightCols right columns to attach (renamed as given)
  */
object AsofJoin {

  def apply(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTs: String,
      rightTs: String,
      rightCols: Map[String, String]): DataFrame = {
    val leftFields = left.columns.toSeq
    val payload = struct(rightCols.toSeq.sortBy(_._2).map { case (src, dst) => col(src).as(dst) }: _*)

    val lTagged = left.select(
      (leftFields.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__side")): _*)
    val rTagged = right.select(
      col(keyCol), col(rightTs).as("__ts"), lit(0).as("__side"), payload.as("__r"))

    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val picked = unioned.withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
    val outCols = leftFields.map(col) ++
      rightCols.values.toSeq.sorted.map(dst => col(s"__match.$dst").as(dst))
    picked.filter(col("__side") === 1).select(outCols: _*)
  }
}
