package graft

import org.apache.spark.sql.functions._
import graft.sources.Dbf

/** dBase III round-trip: write → read = identity for the supported types. */
class DbfSpec extends SparkSpec {
  import spark.implicits._

  test("dbf write∘read round-trip with all supported types") {
    val df = Seq(
      (1L, "alpha", 12.5, "2024-01-02", true),
      (2L, "beta", 0.25, "2024-11-30", false),
      (3L, null.asInstanceOf[String], 99.0, "2024-06-15", true))
      .toDF("id", "name", "amt", "d", "flag")
      .withColumn("d", col("d").cast("date"))
    val path = java.nio.file.Files.createTempDirectory(java.nio.file.Paths.get(graft.Scratch.root), "graft_dbf").toString + "/t.dbf"
    Dbf.write(df, path)
    val back = Dbf.read(spark, path)
    assert(back.schema.map(_.dataType.typeName).toSeq ==
      Seq("long", "string", "double", "date", "boolean"))
    assert(sortedRows(back.withColumn("d", col("d").cast("string"))) ==
      sortedRows(df.withColumn("d", col("d").cast("string"))))
  }

  test("dbf read skips deleted records and applies domain filter (F2)") {
    val df = Seq((1L, "keep"), (2L, "drop"), (3L, "keep"))
      .toDF("id", "tag")
    val path = java.nio.file.Files.createTempDirectory(java.nio.file.Paths.get(graft.Scratch.root), "graft_dbf2").toString + "/t.dbf"
    Dbf.write(df, path)
    // flip record 2's deletion flag byte
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val headerSize = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN).getShort(8)
    val recordSize = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN).getShort(10)
    bytes(headerSize + recordSize) = '*'
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)
    val back = Dbf.read(spark, path)
    assert(back.count() == 2)
    // dbf_domain analogue: plain filter expr over the result
    assert(back.filter(expr("tag = 'keep' AND id > 1")).count() == 1)
  }
}
