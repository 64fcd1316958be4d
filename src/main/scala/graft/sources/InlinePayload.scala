package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.spec.Specs.{CsvDialect, FwColumn}

/** Inline/"online" payload source — the reference's push-mode jobs carry
  * the input file as a base64 string on the job record
  * (`job['input_file']`, cubicerpetl/cubicerpetl.py:204-214) and parse it
  * with the same fixed-width/CSV machinery as file sources.
  *
  * The payload is decoded and split driver-side (it arrived ON the driver
  * by definition), then parallelized with explicit line numbers so the
  * order-dependent header/footer semantics hold. Payload size is bounded
  * by the RPC transport in the reference; anything bigger belongs on a
  * file source.
  */
object InlinePayload {

  /** Decode a base64 payload to ordered lines (`__line_no`, `value`). */
  def lines(spark: SparkSession, base64Payload: String, encoding: String = "UTF-8"): DataFrame = {
    import spark.implicits._
    val text = new String(java.util.Base64.getDecoder.decode(base64Payload), encoding)
    val split = text.split("\r\n|\n", -1).toIndexedSeq.filter(_.nonEmpty)
    split.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("__line_no", "value")
  }

  /** Parse an inline fixed-width payload (reference f_type='txt'). */
  def readTxt(
      spark: SparkSession,
      base64Payload: String,
      cols: Seq[FwColumn],
      headerCols: Seq[FwColumn] = Nil,
      footerCols: Seq[FwColumn] = Nil,
      encoding: String = "UTF-8"): DataFrame =
    FixedWidth.parseLines(lines(spark, base64Payload, encoding), cols, headerCols, footerCols)
      .drop("__line_no")

  /** Parse an inline CSV payload (reference f_type='csv'): the dialect's
    * header flag drops the first line, as csv.DictReader does.
    */
  def readCsv(
      spark: SparkSession,
      base64Payload: String,
      cols: Seq[FwColumn],
      dialect: CsvDialect = CsvDialect(),
      encoding: String = "UTF-8"): DataFrame = {
    val ls = lines(spark, base64Payload, encoding)
    val data = if (dialect.header) {
      val b = ls.agg(min(col("__line_no")).as("__first"))
      ls.crossJoin(broadcast(b)).filter(col("__line_no") =!= col("__first"))
    } else ls
    val parsed = data.select(from_csv(col("value"), CsvSource.schemaOf(cols),
      Map("sep" -> dialect.separator, "quote" -> dialect.quote,
        "timestampNTZFormat" -> "yyyy-MM-dd HH:mm:ss")).as("r"))
    parsed.select(cols.map(c => col(s"r.${c.outName}")): _*)
  }

  /** Row defaults (reference `row_default_value`, cubicerpetl.py:330-335):
    * seed every row with defaults; extracted values win when non-null.
    */
  def withRowDefaults(df: DataFrame, defaults: Map[String, Any]): DataFrame =
    defaults.foldLeft(df) { case (d, (name, value)) =>
      if (d.columns.contains(name))
        d.withColumn(name, coalesce(col(name), lit(value)))
      else d.withColumn(name, lit(value))
    }
}
