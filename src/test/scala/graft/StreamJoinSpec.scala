package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamJoin

/** Stream-stream interval join over the deterministic replay harness:
  * the append-mode result must equal the batch interval join when
  * arrival order is event-time order (nothing droppable).
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private val US = 1000000L // one second in micros

  test("replayed interval join equals the batch join, incl. cross-batch matches") {
    // batches split at t=100s and t=200s; matches within a batch
    // (l@10,r@20), across adjacent batches (l@95,r@105), and across a
    // 2-batch gap (l@99 matched by r@205 is OUTSIDE the 100s window ->
    // no row; l@150,r@210 IS inside)
    val left = Seq(
      (10L * US, 1L), (95L * US, 2L), (99L * US, 3L), (150L * US, 4L), (260L * US, 5L))
      .toDF("tu", "uid").withColumn("__ab", expr("tu div 100000000"))
    val right = Seq(
      (20L * US, 1L), (105L * US, 2L), (205L * US, 3L), (210L * US, 4L), (250L * US, 5L))
      .toDF("tu", "uid").withColumn("__ab", expr("tu div 100000000"))
    val out = StreamJoin.replayedIntervalJoin(spark, left, right,
      "tu", "uid", "__ab",
      graft.Scratch.path(s"test_sj_${System.nanoTime()}"), "10 seconds", 100L * US, "sj_spec")
      .select("uid", "l_tu", "r_tu")
    val expected = Seq(
      Seq(1L, 10L * US, 20L * US),
      Seq(2L, 95L * US, 105L * US),
      Seq(4L, 150L * US, 210L * US))
    assert(sortedRows(out) == expected.sortBy(_.mkString("|")))
    // uid 3: right event 106s after left -> outside window; uid 5:
    // right precedes left -> no match. Both proved absent by equality.
  }

  test("streamed dedup drops same-batch and cross-batch re-deliveries") {
    import graft.streaming.StreamDedup
    // batches split at t=100s; id 1 duplicated within batch 0, id 2
    // duplicated across the batch boundary (95s and 101s), id 3 unique
    val rows = Seq(
      (10L * US, 1L), (11L * US, 1L), (95L * US, 2L), (101L * US, 2L), (150L * US, 3L))
      .toDF("tu", "id").withColumn("__ab", expr("tu div 100000000"))
    val out = StreamDedup.replayedDedup(spark, rows, "tu", "id", "__ab",
      graft.Scratch.path(s"test_sd_${System.nanoTime()}"), "60 seconds", "sd_spec")
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("x44 streamed dedup equals batch distinct on sf0.001") {
    val out = graft.queries.ExtQueries.x44StreamDedup(spark, sfDir)
    val expected = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_id").distinct()
    assert(out.count() > 0)
    assert(sortedRows(out) == sortedRows(expected))
  }

  test("x42 replayed result equals its relational oracle shape on sf0.001") {
    val out = graft.queries.ExtQueries.x42StreamJoin(spark, sfDir)
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .transform(e => e.select(col("user_id"), col("event_type"), graft.ext.Events.epochMicros(e).as("tu")))
    val c = ev.filter(col("event_type") === "click").select(col("user_id"), col("tu").as("ctu"))
    val p = ev.filter(col("event_type") === "purchase").select(col("user_id"), col("tu").as("ptu"))
    val batch = c.join(p, Seq("user_id"))
      .filter(col("ptu") >= col("ctu") && col("ptu") <= col("ctu") + lit(21600000000L))
      .select(col("user_id"), col("ctu").as("click_tu"), col("ptu").as("purchase_tu"))
    assert(out.count() > 0)
    assert(sortedRows(out) == sortedRows(batch))
  }
}
