package graft

import org.apache.spark.sql.functions._
import graft.sinks.FixedWidthSink
import graft.sources.{CsvSource, FixedWidth}
import graft.spec.Specs.{CsvDialect, FwColumn}

/** Fixed-width + CSV parse/render round-trips through real files. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  val cols = Seq(
    FwColumn("id", position = 1, length = 6, align = "rjust", fillChar = "0", dataType = "long"),
    FwColumn("name", position = 7, length = 10),
    FwColumn("amt", position = 17, length = 8, align = "rjust", dataType = "double"),
    FwColumn("d", position = 25, length = 10, dataType = "date"))

  val data = Seq(
    (7L, "alpha", 12.5, "2024-01-02"),
    (0L, "beta x", 0.25, "2024-11-30"),
    (123456L, "truncatedname", 99.0, "2024-06-15"))
    .toDF("id", "name", "amt", "d")
    .withColumn("d", col("d").cast("date"))

  test("fixed-width render: alignment, fill, truncation, gaps") {
    val lines = FixedWidth.renderLines(data, cols).as[String].collect()
    assert(lines(0) == "000007alpha         12.52024-01-02")
    assert(lines(1) == "000000beta x        0.252024-11-30")
    // name truncated to 10 chars
    assert(lines(2) == "123456truncatedn    99.02024-06-15")
  }

  test("fixed-width file round-trip with header/footer lines") {
    val dir = java.nio.file.Files.createTempDirectory(java.nio.file.Paths.get(graft.Scratch.root), "graft_fw").toString + "/out"
    val hCols = Seq(FwColumn("id", fieldName = Some("first_id"), position = 1, length = 6,
      align = "rjust", fillChar = "0", dataType = "long"))
    val fCols = Seq(FwColumn("id", fieldName = Some("last_id"), position = 1, length = 6,
      align = "rjust", fillChar = "0", dataType = "long"))
    FixedWidthSink.write(data, dir, cols, orderCol = "id",
      headerCols = hCols.map(_.copy(fieldName = None)),
      footerCols = fCols.map(_.copy(fieldName = None)))
    val back = FixedWidth.readFile(spark, dir, cols, hCols, fCols)
    assert(back.count() == 3)
    assert(back.columns.toSet == Set("id", "name", "amt", "d", "first_id", "last_id"))
    assert(back.select("first_id").distinct().as[Long].collect().toSeq == Seq(0L))
    assert(back.select("last_id").distinct().as[Long].collect().toSeq == Seq(123456L))
    val ids = back.select("id").as[Long].collect().toSeq.sorted
    assert(ids == Seq(0L, 7L, 123456L))
  }

  test("fixed-width read rejects multi-file sources (no implicit cross-file order)") {
    // two files in one dir: first/last/header/footer would depend on
    // Spark's split listing order (by size) — must fail loudly instead
    val dir = java.nio.file.Files.createTempDirectory(java.nio.file.Paths.get(graft.Scratch.root), "graft_fw_multi")
    java.nio.file.Files.writeString(dir.resolve("a.txt"), "000001\n000002\n")
    java.nio.file.Files.writeString(dir.resolve("b.txt"), "000003\n")
    val lcols = Seq(FwColumn("id", position = 1, length = 6,
      align = "rjust", fillChar = "0", dataType = "long"))
    val e = intercept[IllegalArgumentException] {
      FixedWidth.readFile(spark, dir.toString, lcols)
    }
    assert(e.getMessage.contains("2 data files"))
    // a glob resolving to several files is rejected the same way
    intercept[IllegalArgumentException] {
      FixedWidth.readFile(spark, dir.toString + "/*.txt", lcols)
    }
    // one file — directly or via the dir — still reads fine
    assert(FixedWidth.readFile(spark, dir.resolve("a.txt").toString, lcols).count() == 2)
    java.nio.file.Files.delete(dir.resolve("b.txt"))
    assert(FixedWidth.readFile(spark, dir.toString, lcols).count() == 2)
  }

  test("fixed-width read honors a non-UTF-8 encoding (Latin-1 round-trip)") {
    // 0xE9 ('é' in ISO-8859-1) is an invalid UTF-8 sequence — a UTF-8 read
    // would mangle it to the replacement char irrecoverably
    val f = java.nio.file.Files.createTempFile(java.nio.file.Paths.get(graft.Scratch.root), "graft_latin1", ".txt")
    val latin1Lines = Seq("000001café      ", "000002résumé    ")
    java.nio.file.Files.write(f,
      latin1Lines.mkString("\n").getBytes(java.nio.charset.Charset.forName("ISO-8859-1")))
    val lcols = Seq(
      FwColumn("id", position = 1, length = 6, align = "rjust", fillChar = "0", dataType = "long"),
      FwColumn("word", position = 7, length = 10))
    val back = FixedWidth.readFile(spark, f.toString, lcols, encoding = "ISO-8859-1")
    val words = back.orderBy("id").select("word").as[String].collect().toSeq
    assert(words == Seq("café", "résumé"))
    // the default UTF-8 read of the same bytes must NOT produce 'café'
    val mangled = FixedWidth.readFile(spark, f.toString, lcols)
      .orderBy("id").select("word").as[String].collect().toSeq
    assert(mangled != words)
    // multi-byte-newline charsets are rejected, not mis-split
    intercept[IllegalArgumentException] {
      FixedWidth.readFile(spark, f.toString, lcols, encoding = "UTF-16")
    }
    // EBCDIC has NO 0x0A newline byte at all — a name blacklist would let
    // it through and TextInputFormat would yield one mis-split record; the
    // property-based guard ('\n' must encode as the single byte 0x0A)
    // rejects it up front (ADVICE r3)
    intercept[IllegalArgumentException] {
      FixedWidth.readFile(spark, f.toString, lcols, encoding = "IBM037")
    }
  }

  test("fixed-width parse: zero-filled zero value and center align") {
    val c = Seq(FwColumn("v", position = 1, length = 5, align = "center", fillChar = "*"))
    val lines = Seq(("*ab**", 0L)).toDF("value", "__line_no")
    val parsed = FixedWidth.parseLines(lines, c).drop("__line_no")
    assert(rowsOf(parsed) == Seq(Seq("ab")))
    val zc = Seq(FwColumn("n", position = 1, length = 4, align = "rjust", fillChar = "0", dataType = "long"))
    val zl = Seq(("0000", 0L)).toDF("value", "__line_no")
    assert(rowsOf(FixedWidth.parseLines(zl, zc).drop("__line_no")) == Seq(Seq(0L)))
  }

  test("csv round-trip with custom dialect (sep/quote/no header)") {
    val dialect = CsvDialect(separator = ";", quote = "'", header = false)
    val schema = Seq(
      FwColumn("id", dataType = "long"),
      FwColumn("txt", dataType = "string"),
      FwColumn("amt", dataType = "double"))
    val df = Seq((1L, "has;sep", 1.5), (2L, "plain", 2.5)).toDF("id", "txt", "amt")
    val path = java.nio.file.Files.createTempDirectory(java.nio.file.Paths.get(graft.Scratch.root), "graft_csv").toString + "/out"
    CsvSource.write(df, path, dialect)
    val back = CsvSource.read(spark, path, dialect, schema)
    assert(sortedRows(back) == Seq(Seq(1L, "has;sep", 1.5), Seq(2L, "plain", 2.5)))
  }
}
