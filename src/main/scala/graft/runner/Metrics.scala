package graft.runner

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import graft.sinks.LogStore

/** Execution metrics → log store — the engine's analogue of the
  * reference's per-step `etl.log` bookkeeping (message/level/amount rows
  * written around every extract/load, cubicerpetl/cubicerpetl.py:783-811),
  * driven by Spark's own `QueryExecutionListener` instead of hand-placed
  * log calls.
  *
  * Entries buffer in memory and flush on demand: flushing from inside the
  * listener would recurse (the log write is itself a query execution).
  */
object Metrics {

  final case class Entry(job: String, funcName: String, durationNs: Long,
      outputRows: Option[Long], error: Option[String])

  final class Collector(job: String) extends QueryExecutionListener {
    val entries = new ConcurrentLinkedQueue[Entry]()

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      val rows = qe.executedPlan.metrics.get("numOutputRows").map(_.value)
      entries.add(Entry(job, funcName, durationNs, rows, None))
    }

    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
      entries.add(Entry(job, funcName, 0L, None, Some(exception.toString)))
  }

  /** Attach a collector for `job`; caller keeps the handle for flush. */
  def attach(spark: SparkSession, job: String): Collector = {
    val c = new Collector(job)
    spark.listenerManager.register(c)
    c
  }

  /** Drain buffered entries to the log store and detach. */
  def flushAndDetach(spark: SparkSession, c: Collector, logPath: String): Long = {
    spark.listenerManager.unregister(c)
    import spark.implicits._
    val drained = Iterator.continually(c.entries.poll()).takeWhile(_ != null).toSeq
    if (drained.nonEmpty) {
      val df = drained.map { e =>
        (e.job, null.asInstanceOf[String], e.outputRows.getOrElse(-1L),
          if (e.error.isDefined) "error" else "info",
          e.error.getOrElse(s"${e.funcName} in ${e.durationNs / 1000000} ms"),
          new java.sql.Timestamp(System.currentTimeMillis()))
      }.toDF("job", "pk", "model_id", "level", "message", "ts")
      LogStore.append(spark, logPath, df)
    }
    drained.size.toLong
  }
}
