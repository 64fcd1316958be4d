package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Transformer
import graft.sinks.{LogStore, MergeRouter}
import graft.spec.Specs._

/** "Online" jobs as Structured Streaming — the reference's push-mode path
  * (job type='online' with an inline payload, cubicerpetl/cubicerpetl.py:
  * 204-214) generalized: each arriving file/micro-batch runs the SAME
  * declarative transform + merge-routing as the batch path, inside
  * `foreachBatch`. `Trigger.AvailableNow` gives the reference's
  * "process what has arrived, then stop" semantics with checkpointed
  * exactly-once file tracking; a continuous trigger turns the same
  * pipeline into a long-running incremental loader.
  *
  * State: the log store remains the upsert state table across batches —
  * each batch joins against it (and appends to it via the caller's
  * `loadBatch`), which is exactly the reference's at-least-once resume
  * model (§2.7) with Spark's checkpoint on top.
  */
object OnlineJob {

  /** Start a streaming run of `job` over a file-source directory.
    *
    * @param source    streaming DataFrame (e.g. spark.readStream.schema(s)
    *                  .csv(dir)) — kept caller-provided so any streaming
    *                  source (files, Kafka-like, memory) plugs in
    * @param loadBatch callback receiving (routed batch, batchId): applies
    *                  the sink and appends results to the log store
    * @param availableNow true ⇒ drain what's there and stop (reference
    *                  online-job semantics); false ⇒ keep running
    */
  def start(
      spark: SparkSession,
      job: JobSpec,
      source: DataFrame,
      logPath: String,
      checkpoint: String,
      loadBatch: (DataFrame, Long) => Unit,
      availableNow: Boolean = true): StreamingQuery = {
    val writer = source.writeStream
      .queryName(s"graft_online_${job.name}")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val transformed = Transformer(batch, job.transform)
        // Missing path (nothing loaded yet) ⇒ empty state; read errors
        // propagate and fail the batch (LogStore.readOrEmpty).
        val state = LogStore.stateFor(LogStore.readOrEmpty(spark, logPath), job.name)
        val pkCol = if (transformed.columns.contains("pk")) "pk"
          else job.transform.pkField.getOrElse("pk")
        val routed = MergeRouter.route(transformed, state, pkCol, job.transform.reprocess)
        loadBatch(routed, batchId)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }
}
