package graft.sources

import java.sql.DriverManager
import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.expr.DateMacros
import graft.spec.Specs.SqlResource

/** SQL database source/sink — reference `etl_type='db'`
  * (cubicerpetl/cubicerpetl.py:288-313 extract, :466-492 load).
  *
  * Reference behavior re-expressed:
  *  - `sql_begin` / `sql_end` are side-effecting session statements around
  *    the main query (:293-302). They are driver-side JDBC statements here —
  *    NOT DataFrame ops — run once, not per executor.
  *  - the main `sql_query` ships whole to the database (opaque pushdown,
  *    :299-302) via the JDBC `query` option; date macros are substituted
  *    first (:200-201). The reference's `%`-string interpolation of row
  *    values into per-row DML (:479) is SQL injection by design — replaced
  *    with batched `PreparedStatement` parameters in [[graft.sinks.JdbcSink]]/Spark's
  *    own JDBC writer.
  *  - the reference loads one row per statement (:468-490); `df.write.jdbc`
  *    batches per partition instead.
  */
object JdbcSource {

  /** Run a side-effecting statement on the driver (sql_begin/sql_end). */
  def execStatement(url: String, sql: String, props: Map[String, String] = Map.empty): Unit = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    val conn = DriverManager.getConnection(url, p)
    try { val st = conn.createStatement(); try st.execute(sql) finally st.close() }
    finally conn.close()
  }

  /** Extract: begin → read query as DataFrame → end. */
  def read(spark: SparkSession, res: SqlResource, jobDate: LocalDate): DataFrame = {
    res.sqlBegin.foreach(s => execStatement(res.url, DateMacros.substitute(s, jobDate), res.properties))
    // the reference's deliberate extract stall between sql_begin and the
    // main query (sleep(sql_begin_delay), cubicerpetl.py:295-298) — used
    // to let source-side triggers/materializations settle
    if (res.beginDelayMillis > 0) Thread.sleep(res.beginDelayMillis)
    val reader = spark.read.format("jdbc")
      .option("url", res.url)
      .option("query", DateMacros.substitute(res.sqlQuery, jobDate))
    val withProps = res.properties.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }
    val df = withProps.load()
    if (res.sqlEnd.isEmpty) df
    else {
      // The reference runs sql_end AFTER fetching the rows
      // (cubicerpetl.py:299-313); a lazy DataFrame would invert that —
      // sql_end may tear down state the query reads (drop a temp table
      // sql_begin staged), so the scan must complete first. Eager
      // localCheckpoint materializes the fetched rows as RDD blocks before
      // the teardown statement runs. Chosen over persist() deliberately:
      // persist registers in CacheManager, which holds a strong reference
      // until explicit unpersist — a scheduler running many sql_end jobs in
      // one session would pin every result for the session lifetime.
      // localCheckpoint blocks are reclaimed by the ContextCleaner once the
      // returned plan is garbage-collected, so callers owe no unpersist.
      // Non-replayable lineage is CORRECT here, not a compromise: a lost
      // block cannot be recomputed by re-running the query, because
      // sql_end already tore down the state it reads — failing the job
      // beats silently re-reading a dropped temp table.
      val fetched = df.localCheckpoint(true)
      res.sqlEnd.foreach(s => execStatement(res.url, DateMacros.substitute(s, jobDate), res.properties))
      fetched
    }
  }

  /** Load: append a DataFrame to a table with batched writes. */
  def write(df: DataFrame, res: SqlResource, jobDate: LocalDate): Unit = {
    res.sqlBegin.foreach(s => execStatement(res.url, DateMacros.substitute(s, jobDate), res.properties))
    val table = res.table.getOrElse(
      throw new IllegalArgumentException("JdbcSource.write needs SqlResource.table"))
    val p = new java.util.Properties()
    res.properties.foreach { case (k, v) => p.setProperty(k, v) }
    df.write.mode("append").option("batchsize", "1000").jdbc(res.url, table, p)
    res.sqlEnd.foreach(s => execStatement(res.url, DateMacros.substitute(s, jobDate), res.properties))
  }
}
