package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expr.DateMacros
import graft.operators.Transformer
import graft.sinks.{LogStore, MergeRouter}
import graft.sources.{CsvSource, FixedWidth, InlinePayload}
import graft.spec.Specs._

/** Job orchestration — the engine analogue of `etl_cron.run`
  * (reference cubicerpetl/etl_cron.py:35-56): resolve the job spec, extract
  * as a DataFrame, transform declaratively, recover previously-loaded ids
  * from the log state store, and route rows by reprocess mode. The
  * remote state machine (`action_start`/`action_done`) becomes local
  * [[JobResult]] bookkeeping; the reference's 100-row chunk loop
  * (etl_cron.py:46-53, which silently DROPS the tail — SURVEY.md §2.8)
  * is replaced by Spark partitioning over the full dataset.
  */
object JobRunner {

  final case class JobResult(job: String, routed: DataFrame, state: DataFrame)

  /** Extract per the job's resource spec (SURVEY.md §2.1 dispatch,
    * reference do_extract cubicerpetl.py:191-355). File paths go through
    * date-macro substitution (:825).
    */
  def extract(spark: SparkSession, job: JobSpec): DataFrame = job.extract match {
    case Left(f) =>
      val path = DateMacros.substitute(f.pathTemplate, job.date)
      val df = f.fType match {
        case "parquet" => spark.read.parquet(path)
        case "csv"     => CsvSource.read(spark, path, f.dialect, f.columns)
        case "txt"     => FixedWidth.readFile(spark, path, f.columns, f.headerColumns, f.footerColumns)
        case other     => throw new IllegalArgumentException(s"file type: $other")
      }
      InlinePayload.withRowDefaults(df, job.rowDefaults)
    case Right(c) =>
      // connector extract: table registered in the session catalog, with
      // the Odoo domain pushed as a Catalyst predicate and the field list
      // as a projection — Catalyst carries both into the scan. Template
      // mode (reference template_run_from + model_ids, cubicerpetl.py:
      // 321-324): an explicit id list replaces the domain search, pushed
      // as an IN filter.
      var df = spark.table(c.model)
      df = c.ids match {
        case Some(ids) => df.filter(col(c.idField).isin(ids: _*))
        case None if c.domain.nonEmpty => df.filter(graft.expr.OdooDomain.compile(c.domain))
        case None => df
      }
      if (c.fields.nonEmpty) df = df.select(c.fields.map(col): _*)
      InlinePayload.withRowDefaults(df, job.rowDefaults)
  }

  /** Run extract → transform → id-recovery → routing. The caller hands the
    * routed DataFrame to a sink ([[graft.sinks.ConnectorSink]], JDBC,
    * file) and appends the results to the log store — keeping the plan
    * lazy end-to-end so Catalyst optimizes across stage boundaries.
    */
  def run(spark: SparkSession, job: JobSpec, logPath: Option[String] = None): JobResult = {
    val extracted = extract(spark, job)
    val transformed = Transformer(extracted, job.transform)
    // First run (missing log path) ⇒ empty state; real read errors
    // propagate (see LogStore.readOrEmpty).
    val state = logPath match {
      case Some(p) => LogStore.stateFor(LogStore.readOrEmpty(spark, p), job.name)
      case None    => emptyState(spark)
    }
    val pkCol = if (transformed.columns.contains("pk")) "pk"
      else job.transform.pkField.getOrElse(
        throw new IllegalArgumentException(s"job ${job.name}: no pk column for routing"))
    val routed = MergeRouter.route(transformed, state, pkCol, job.transform.reprocess)
    JobResult(job.name, routed, state)
  }

  private def emptyState(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Long)].toDF("pk", "model_id")
  }
}
