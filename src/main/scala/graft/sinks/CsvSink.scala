package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.spec.Specs.{CsvDialect, FwColumn}

/** CSV sink with reference `get_csv_lines` semantics
  * (cubicerpetl/cubicerpetl.py:567-586, assembly :432-445): per-column
  * `forced_value` overrides, optional header row of column names
  * (`writeheader`, :579-581), and header/footer resource lines rendered
  * from the first/last data row.
  *
  * Lines are rendered with the built-in `to_csv` (codegen'd), so dialect
  * quoting/escaping matches `spark.read.csv` and the round-trip is exact.
  */
object CsvSink {

  /** Render data rows as CSV lines with forced values applied. */
  def renderLines(df: DataFrame, cols: Seq[FwColumn], dialect: CsvDialect): DataFrame = {
    val fields: Seq[Column] = cols.map { c =>
      val base = c.forced.map(v => lit(v)).getOrElse(col(c.name))
      base.as(c.outName)
    }
    df.select(to_csv(struct(fields: _*),
      java.util.Map.of("sep", dialect.separator, "quote", dialect.quote)).as("value"))
  }

  /** Assemble column-header + header-row + data + footer-row lines in
    * order, like [[FixedWidthSink.assemble]]: returns (`__sec`, `__ord`,
    * `value`) with sections 0=column header, 1=header line, 2=data,
    * 3=footer line.
    */
  def assemble(
      df: DataFrame,
      cols: Seq[FwColumn],
      dialect: CsvDialect,
      orderCol: String,
      headerCols: Seq[FwColumn] = Nil,
      footerCols: Seq[FwColumn] = Nil): DataFrame = {
    val data = renderLines(df.orderBy(col(orderCol)), cols, dialect)
      .select(lit(2L).as("__sec"), monotonically_increasing_id().as("__ord"), col("value"))

    val colHeader: Option[DataFrame] =
      if (!dialect.header) None
      else Some(df.sparkSession.range(1).select(
        lit(0L).as("__sec"), lit(0L).as("__ord"),
        lit(cols.map(_.outName).mkString(dialect.separator)).as("value")))

    def edgeRow(edgeCols: Seq[FwColumn], first: Boolean, sec: Long): Option[DataFrame] =
      if (edgeCols.isEmpty) None
      else {
        val b = df.agg((if (first) min(col(orderCol)) else max(col(orderCol))).as("__edge"))
        val row = df.join(broadcast(b), col(orderCol) === col("__edge")).limit(1)
        Some(renderLines(row, edgeCols, dialect)
          .select(lit(sec).as("__sec"), lit(0L).as("__ord"), col("value")))
      }

    (colHeader.toSeq ++ edgeRow(headerCols, first = true, 1L).toSeq ++ Seq(data) ++
      edgeRow(footerCols, first = false, 3L).toSeq).reduce(_ unionByName _)
  }

  /** Write a single CSV file part in reference layout. */
  def write(
      df: DataFrame,
      path: String,
      cols: Seq[FwColumn],
      dialect: CsvDialect,
      orderCol: String,
      headerCols: Seq[FwColumn] = Nil,
      footerCols: Seq[FwColumn] = Nil): Unit =
    assemble(df, cols, dialect, orderCol, headerCols, footerCols)
      .orderBy(col("__sec"), col("__ord"))
      .select(col("value"))
      .coalesce(1)
      .write.mode("overwrite").text(path)
}
