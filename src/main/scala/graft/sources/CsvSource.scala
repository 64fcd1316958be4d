package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.spec.Specs.{CsvDialect, FwColumn}

/** CSV source/sink with the reference's dialect surface
  * (reference cubicerpetl/cubicerpetl.py:249-270 read, :567-586 write:
  * configurable separator/quote, optional header, explicit column names for
  * headerless files). Delegates to Spark's native, splittable CSV
  * datasource — the scan parallelizes per-split and filters/projections
  * prune at the reader.
  */
object CsvSource {

  def schemaOf(cols: Seq[FwColumn]): StructType = {
    val fields = cols.map { c =>
      val dt = c.dataType match {
        case "string" => "string"
        case "int" => "int"
        case "long" => "long"
        case "double" => "double"
        case "date" => "date"
        // engine-internal timestamps are NTZ with a pinned-UTC session
        // (SURVEY.md §7.4 timezone rule; matches parquet fixtures)
        case "timestamp" => "timestamp_ntz"
      }
      s"${c.outName} $dt"
    }
    StructType.fromDDL(fields.mkString(", "))
  }

  def read(spark: SparkSession, path: String, dialect: CsvDialect, cols: Seq[FwColumn]): DataFrame =
    spark.read
      .option("sep", dialect.separator)
      .option("quote", dialect.quote)
      .option("header", dialect.header.toString)
      .option("encoding", dialect.encoding)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss")
      .schema(schemaOf(cols))
      .csv(path)

  def write(df: DataFrame, path: String, dialect: CsvDialect): Unit =
    df.write
      .option("sep", dialect.separator)
      .option("quote", dialect.quote)
      .option("header", dialect.header.toString)
      .option("encoding", dialect.encoding)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss")
      .mode("overwrite")
      .csv(path)
}
