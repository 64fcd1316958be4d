package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Adapter between Kafka's wire schema and the engine's typed rows, so an
  * [[OnlineJob]] can consume a message-bus stream through the same seam as
  * file streams. The reference's push-mode 'online' job receives inline
  * payloads over RPC (cubicerpetl/cubicerpetl.py:204-214) — the modern
  * equivalent of that push channel is a Kafka topic, and Spark's Kafka
  * source exposes exactly this fixed schema (key/value binary, topic,
  * partition, offset, timestamp, timestampType — public Structured
  * Streaming Kafka integration contract).
  *
  * The adapter is intentionally source-agnostic: `decode` takes ANY frame
  * with that shape — the real `spark.readStream.format("kafka")` (when the
  * connector jar is on the cluster classpath), a file-backed replay of
  * captured wire records (how the gate runs hermetically — this container
  * ships no Kafka connector), or a MemoryStream in tests. Payloads are
  * UTF-8 JSON decoded against an explicit schema: schema-on-contract like
  * every other engine source, never inferred from data.
  *
  * Scale: decode is a narrow per-row projection (from_json is codegen'd) —
  * no shuffle, parallelism = source partitions, exactly what a
  * 1000-executor topic drain wants. Offsets ride along so downstream
  * dedup/resume logic can fence replays (Kafka's at-least-once delivery).
  */
object KafkaShaped {

  /** Kafka source wire schema (column names and types are the public
    * contract of the Spark Kafka source).
    */
  val wireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Render typed rows as Kafka-shaped wire records: value = UTF-8 JSON of
    * all payload columns, key/partition/offset/timestamp from the given
    * expressions. Used by tests and capture-replay; a production producer
    * writes through the real Kafka sink with the same columns.
    */
  def encode(
      payload: DataFrame,
      key: Column,
      topic: String,
      partition: Column,
      offset: Column,
      timestamp: Column): DataFrame =
    payload.select(
      key.cast("string").cast("binary").as("key"),
      to_json(struct(payload.columns.map(col): _*)).cast("binary").as("value"),
      lit(topic).as("topic"),
      partition.cast("int").as("partition"),
      offset.cast("long").as("offset"),
      timestamp.as("timestamp"),
      lit(0).as("timestampType"))

  /** Decode a Kafka-shaped frame into payload columns + bus metadata
    * (topic, partition, offset). Rows whose value fails to parse surface
    * as nulls in every payload column (from_json PERMISSIVE default) —
    * route them to an error channel with the same key-presence split the
    * sinks already use, rather than killing the stream.
    */
  def decode(wire: DataFrame, payloadSchema: StructType): DataFrame =
    wire.select(
      from_json(col("value").cast("string"), payloadSchema).as("__payload"),
      col("topic"), col("partition"), col("offset"))
      .select((payloadSchema.fieldNames.map(f => col(s"__payload.$f")) ++
        Seq(col("topic"), col("partition"), col("offset"))): _*)
}
