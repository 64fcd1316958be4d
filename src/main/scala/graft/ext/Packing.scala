package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window packing plan: documents are concatenated in id order
  * and split into fixed-capacity token windows — how LM training actually
  * packs sequences (docs cross window boundaries; nothing is padded away
  * except the final window). The planner assigns every doc its global
  * token span [start, end) and derives boundary-crossing stats, the
  * packing-efficiency diagnostic a mixture run reads per source.
  *
  * The global offsets are a DISTRIBUTED PREFIX SUM, never a global
  * window (a `Window.orderBy` with no partition is the one-reducer
  * anti-pattern at corpus scale): phase 1 cumsums within contiguous id
  * buckets (`floor(id / bucketWidth)` — monotone, so bucket order ≡ id
  * order) under a (bucket)-partitioned window; phase 2 computes each
  * bucket's starting offset from the O(buckets) per-bucket totals — the
  * only unpartitioned window runs over bucket TOTALS, bounded by the
  * bucket count, and is broadcast back. The classic two-phase scan.
  */
object Packing {

  /** Adds `start`/`end` global token-offset columns (concatenation in
    * `idCol` order, lengths from `lenCol`, nulls = 0). All input columns
    * pass through.
    */
  def withGlobalOffsets(
      df: DataFrame,
      idCol: String,
      lenCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val id = col(idCol)
    val len = coalesce(col(lenCol), lit(0L)).cast("long")
    // explicit ROWS frame: the default RANGE frame makes duplicate ids
    // frame PEERS, handing both rows the combined running total and
    // producing overlapping spans. With ROWS, duplicate ids pack in an
    // arbitrary (but non-overlapping, total-preserving) relative order;
    // unique ids — the normal case — are fully deterministic.
    val wB = Window.partitionBy(col("__bkt")).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = df
      .withColumn("__len", len)
      .withColumn("__bkt",
        // `div`, not `/`: double division misassigns buckets past 2^53 ids
        expr(s"(`$idCol` - pmod(`$idCol`, ${bucketWidth}L)) div ${bucketWidth}L"))
      .withColumn("__cum", sum(col("__len")).over(wB))
    val offsets = cum.groupBy(col("__bkt")).agg(sum(col("__len")).as("__bt"))
      .withColumn("__off", coalesce(
        sum(col("__bt")).over(Window.orderBy(col("__bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bkt"), col("__off"))
    cum.join(broadcast(offsets), Seq("__bkt"))
      .withColumn("start", col("__off") + col("__cum") - col("__len"))
      .withColumn("end", col("start") + col("__len"))
      .drop("__bkt", "__len", "__cum", "__off")
  }

  /** Per-group packing stats under `capacity`-token windows: doc and
    * token counts, boundary crossings (extra windows a doc spills into:
    * `bin(end-1) - bin(start)`, 0 for empty docs), and the crossing
    * fraction rounded to 6 dp.
    */
  def packingStats(
      df: DataFrame,
      idCol: String,
      lenCol: String,
      groupCol: String,
      capacity: Long,
      bucketWidth: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val g = withGlobalOffsets(df, idCol, lenCol, bucketWidth)
    // offsets are non-negative, so truncating `div` IS floor division
    val crossings = when(col("end") > col("start"),
      expr(s"(`end` - 1) div $capacity") - expr(s"`start` div $capacity"))
      .otherwise(lit(0L))
    g.withColumn("__cr", crossings)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("end") - col("start")).as("n_toks"),
        sum(col("__cr")).as("n_crossings"))
      .withColumn("crossing_frac",
        round(col("n_crossings").cast("double") / col("n_docs").cast("double"), 6))
  }
}
