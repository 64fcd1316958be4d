package graft.sinks

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import graft.spec.Specs.FwColumn
import graft.sources.FixedWidth

/** Fixed-width TXT sink with header/footer lines — reference
  * `get_txt_lines` + file assembly (cubicerpetl/cubicerpetl.py:548-565,
  * :420-431): optional header line rendered from the FIRST data row,
  * footer from the LAST, `\r\n` endings.
  *
  * Order caveat (SURVEY.md §7.4): "first"/"last" need an explicit ordering
  * column in a distributed engine; callers pass `orderCol`.
  */
object FixedWidthSink {

  /** Assemble the full file body as an ordered DataFrame of lines:
    * header (from first row) ++ data ++ footer (from last row).
    * Returns (`__ord`, `value`); writing with coalesce(1) + sort preserves
    * the reference's single-file layout, while multi-part output keeps
    * per-partition order for scale-out sinks.
    */
  def assemble(
      df: DataFrame,
      cols: Seq[FwColumn],
      orderCol: String,
      headerCols: Seq[FwColumn] = Nil,
      footerCols: Seq[FwColumn] = Nil): DataFrame = {
    val data = FixedWidth.renderLines(df.orderBy(col(orderCol)), cols)
      .select(lit(1L).as("__sec"), monotonically_increasing_id().as("__ord"), col("value"))

    def edgeRow(edgeCols: Seq[FwColumn], first: Boolean, sec: Long): Option[DataFrame] =
      if (edgeCols.isEmpty) None
      else {
        val b = df.agg((if (first) min(col(orderCol)) else max(col(orderCol))).as("__edge"))
        val row = df.join(broadcast(b), col(orderCol) === col("__edge")).limit(1)
        Some(FixedWidth.renderLines(row, edgeCols)
          .select(lit(sec).as("__sec"), lit(0L).as("__ord"), col("value")))
      }

    val header = edgeRow(headerCols, first = true, sec = 0L)
    val footer = edgeRow(footerCols, first = false, sec = 2L)
    (header.toSeq ++ Seq(data) ++ footer.toSeq).reduce(_ unionByName _)
  }

  /** Write as a single text file part (reference writes one file with
    * \r\n endings, cubicerpetl.py:429-431).
    */
  def write(
      df: DataFrame,
      path: String,
      cols: Seq[FwColumn],
      orderCol: String,
      headerCols: Seq[FwColumn] = Nil,
      footerCols: Seq[FwColumn] = Nil): Unit =
    assemble(df, cols, orderCol, headerCols, footerCols)
      .orderBy(col("__sec"), col("__ord"))
      .select(col("value"))
      .coalesce(1)
      .write.option("lineSep", "\r\n").mode("overwrite").text(path)
}
