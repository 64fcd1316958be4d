package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Event-time operators over the `events` feed (extension surface,
  * SURVEY.md §2.10/§2.12). The reference's only "streaming" is inline
  * base64 payloads on `online` jobs (cubicerpetl/cubicerpetl.py:204-214);
  * here the same pipeline shapes run as batch windows AND as Structured
  * Streaming (same column expressions both ways).
  */
object Events {

  /** Schema-aware epoch-microseconds accessor for an event-time column.
    * Event-time math in this engine runs on exact integer µs; the column
    * itself may arrive in either of two parquet encodings:
    *  - LONG — raw epoch nanoseconds (a `nanosAsLong=true` read of parquet
    *    TIMESTAMP(NANOS)): exact integer FLOOR division by 1000 (a pmod
    *    adjustment — `div` alone truncates toward zero, which would
    *    disagree with DuckDB's flooring `epoch_us` on pre-1970 negative
    *    event times; positive epochs are unaffected);
    *  - TIMESTAMP / TIMESTAMP_NTZ (parquet's default MICROS encoding):
    *    `unix_micros` after a cast to TIMESTAMP. The session timezone is
    *    pinned UTC throughout (Verify/Bench/specs), so the NTZ cast is an
    *    identity reinterpretation and the result is the same exact µs.
    * Every event-time operator resolves `ts` through this helper, so the
    * engine is indifferent to which encoding a fixture carries.
    */
  def epochMicros(df: DataFrame, tsCol: String = "ts"): Column =
    df.schema(tsCol).dataType match {
      case LongType => expr(s"(`$tsCol` - pmod(`$tsCol`, 1000)) div 1000")
      case _        => unix_micros(col(tsCol).cast(TimestampType))
    }

  /** Tumbling event-time aggregation. Batch form; streaming is identical
    * with `readStream` + `withWatermark` upstream.
    */
  def tumbling(df: DataFrame, ts: Column, every: String, aggs: Seq[Column], keys: Seq[Column] = Nil): DataFrame =
    df.groupBy((window(ts, every) +: keys): _*).agg(aggs.head, aggs.tail: _*)

  /** Gap-based sessionization, batch form (gaps-and-islands): a new session
    * starts when the gap from the previous event of the same user exceeds
    * `gap` (measured on `orderCol`, a NUMERIC epoch column — nanos, micros,
    * seconds — so gap math is exact integer arithmetic, immune to timestamp
    * truncation differences). Shuffles once on user, then two in-partition
    * window passes — the classic scalable form (each user's history must be
    * co-partitioned; skewed users are the caveat, salting applies).
    */
  def sessionizeBatch(df: DataFrame, userCol: String, orderCol: String, gap: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(orderCol))
    df.withColumn("__prev", lag(col(orderCol), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev").isNull || col(orderCol) - col("__prev") > gap, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("__new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__prev", "__new_session")
  }

  /** Per-session rollup on top of [[sessionizeBatch]]; `tsCol` is the
    * display timestamp (min/max per session), `orderCol`/`gap` drive the
    * gap logic.
    */
  def sessionStats(df: DataFrame, userCol: String, orderCol: String, gap: Long, tsCol: String): DataFrame =
    sessionizeBatch(df, userCol, orderCol, gap)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))

  /** Structured Streaming sessionization with the native `session_window`
    * operator + watermark — the streaming twin of [[sessionStats]]. Used by
    * the streaming spec; takes any (streaming or batch) DataFrame.
    */
  def sessionWindowed(df: DataFrame, userCol: String, tsCol: String, gap: String): DataFrame =
    df.withWatermark(tsCol, "10 minutes")
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"))

  /** JSON props extraction (`from_json`-style typed access; the fixture's
    * `props` carries {"k": int}).
    */
  def propsField(props: Column, field: String): Column =
    get_json_object(props, s"$$.$field")
}
