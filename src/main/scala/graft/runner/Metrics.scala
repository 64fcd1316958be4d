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

  /** Canonical JSON for an observed-metrics row: fields in declaration
    * order, longs/ints rendered as digits — byte-stable across runs as
    * long as the observed aggregates themselves are deterministic (counts
    * and integer sums are; wall-clock and doubles are not, keep them out
    * of gated observations).
    */
  private[runner] def canonicalJson(row: org.apache.spark.sql.Row): String =
    row.schema.fields.zipWithIndex.map { case (f, i) =>
      val v = row.get(i) match {
        case null      => "null"
        case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
        case other     => other.toString
      }
      "\"" + f.name + "\":" + v
    }.mkString("{", ",", "}")

  final class Collector(val job: String) extends QueryExecutionListener {
    val entries = new ConcurrentLinkedQueue[Entry]()
    /** Named observations (`df.observe(...)`) seen while attached:
      * (observation name, canonical JSON of its aggregates). These are the
      * DETERMINISTIC slice of the execution log — the analogue of the
      * reference's per-step `amount` bookkeeping — where funcName timings
      * above are audit-only.
      */
    val observed = new ConcurrentLinkedQueue[(String, String)]()

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      val rows = qe.executedPlan.metrics.get("numOutputRows").map(_.value)
      entries.add(Entry(job, funcName, durationNs, rows, None))
      qe.observedMetrics.foreach { case (name, row) =>
        observed.add(name -> canonicalJson(row))
      }
    }

    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
      entries.add(Entry(job, funcName, 0L, None, Some(exception.toString)))

    /** Listener delivery is ASYNC (ExecutionListenerBus): an action's
      * events land some time after the action returns. Block until an
      * observation named `name` has arrived (or timeout) — callers that
      * gate on observed metrics must await before flushing.
      */
    def awaitObservation(name: String, timeoutMs: Long = 30000L): Boolean = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (System.nanoTime() < deadline) {
        val it = observed.iterator()
        while (it.hasNext) if (it.next()._1 == name) return true
        Thread.sleep(20)
      }
      false
    }
  }

  /** Attach a collector for `job`; caller keeps the handle for flush. */
  def attach(spark: SparkSession, job: String): Collector = {
    val c = new Collector(job)
    spark.listenerManager.register(c)
    c
  }

  /** Drain buffered entries to the log store and detach. Timed funcName
    * entries land at level 'info'/'error' (audit trail, nondeterministic
    * message); observed metrics land at level 'metric' with pk = the
    * observation name and a canonical-JSON message (deterministic, the
    * gateable slice).
    */
  def flushAndDetach(spark: SparkSession, c: Collector, logPath: String): Long = {
    spark.listenerManager.unregister(c)
    import spark.implicits._
    val drained = Iterator.continually(c.entries.poll()).takeWhile(_ != null).toSeq
    val metrics = Iterator.continually(c.observed.poll()).takeWhile(_ != null).toSeq
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    val rows = drained.map { e =>
      (e.job, null.asInstanceOf[String], e.outputRows.getOrElse(-1L),
        if (e.error.isDefined) "error" else "info",
        e.error.getOrElse(s"${e.funcName} in ${e.durationNs / 1000000} ms"), now)
    } ++ metrics.map { case (name, json) =>
      (c.job, name, -1L, "metric", json, now)
    }
    if (rows.nonEmpty)
      LogStore.append(spark, logPath,
        rows.toDF("job", "pk", "model_id", "level", "message", "ts"))
    (drained.size + metrics.size).toLong
  }
}
