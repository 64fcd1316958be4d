package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.streaming.KafkaShaped

/** Wire-format adapter contract: encode→decode round-trip, malformed
  * payloads, and bus-metadata passthrough (the claims x37 gates
  * end-to-end, pinned here at unit granularity).
  */
class KafkaShapedSpec extends SparkSpec {
  import spark.implicits._

  private val payloadSchema = StructType.fromDDL("id BIGINT, name STRING")

  test("encode produces the Kafka source wire schema exactly") {
    val wire = KafkaShaped.encode(
      Seq((1L, "a")).toDF("id", "name"),
      key = col("id"), topic = "t", partition = lit(0),
      offset = lit(7L), timestamp = to_timestamp(lit("2024-01-01 00:00:00")))
    // literal-derived columns are non-nullable; names and types are the
    // wire contract, nullability is the source's business
    assert(wire.schema.map(f => (f.name, f.dataType)) ==
      KafkaShaped.wireSchema.map(f => (f.name, f.dataType)))
  }

  test("encode → decode round-trips payload columns and bus metadata") {
    val in = Seq((1L, "alpha"), (2L, "beta"), (3L, null.asInstanceOf[String]))
      .toDF("id", "name")
    val wire = KafkaShaped.encode(in,
      key = col("id"), topic = "orders", partition = pmod(col("id"), lit(2)),
      offset = col("id") * 10, timestamp = to_timestamp(lit("2024-01-01 00:00:00")))
    val back = KafkaShaped.decode(wire, payloadSchema)
    assert(back.columns.toSeq ==
      Seq("id", "name", "topic", "partition", "offset"))
    assert(sortedRows(back.select(col("id"), col("name"), col("topic"), col("offset"))) ==
      Seq(Seq(1L, "alpha", "orders", 10L), Seq(2L, "beta", "orders", 20L),
        Seq(3L, null, "orders", 30L)).sortBy(_.mkString("|")))
  }

  test("malformed payload decodes to all-null payload columns, metadata intact") {
    val wire = spark.range(1).select(
      lit("k").cast("binary").as("key"),
      lit("{definitely not json").cast("binary").as("value"),
      lit("orders").as("topic"), lit(3).as("partition"), lit(42L).as("offset"),
      to_timestamp(lit("2024-01-01 00:00:00")).as("timestamp"),
      lit(0).as("timestampType"))
    val rows = rowsOf(KafkaShaped.decode(wire, payloadSchema))
    assert(rows == Seq(Seq(null, null, "orders", 3, 42L)))
  }

  test("payload columns absent from a valid JSON value decode as null, not error") {
    val wire = spark.range(1).select(
      lit("k").cast("binary").as("key"),
      lit("""{"id": 5}""").cast("binary").as("value"),
      lit("t").as("topic"), lit(0).as("partition"), lit(1L).as("offset"),
      to_timestamp(lit("2024-01-01 00:00:00")).as("timestamp"),
      lit(0).as("timestampType"))
    val rows = rowsOf(KafkaShaped.decode(wire, payloadSchema))
    assert(rows == Seq(Seq(5L, null, "t", 0, 1L)))
  }
}
