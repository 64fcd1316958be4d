package graft

import org.apache.spark.sql.functions._
import graft.runner.JobRunner
import graft.spec.SpecLoader
import graft.spec.Specs._

/** JSON job-spec loader: parse, defaults, end-to-end through the runner. */
class SpecLoaderSpec extends SparkSpec {

  test("parse a full file-extract job spec") {
    val job = SpecLoader.fromJson(
      """{ "name": "j1", "date": "2024-03-07",
           "extract": {"file": {"path": "/d/{aaaa}/{mm}/orders.csv", "type": "csv",
                                "dialect": {"separator": "|", "header": false},
                                "columns": [{"name": "k", "type": "long"},
                                            {"name": "v", "as": "val"}]}},
           "transform": {"reprocess": "onlyupdate", "pk": "k",
             "fields": [
               {"name": "k", "as": "key", "type": "int"},
               {"name": "v", "as": "status",
                "mapping": {"entries": {"F": "done"}, "default": "?", "returnNull": true}},
               {"name": "r", "expr": "concat('R-', k)"}]},
           "rowDefaults": {"tag": "B1", "n": 7} }""")
    assert(job.name == "j1")
    assert(job.date == java.time.LocalDate.of(2024, 3, 7))
    val f = job.extract.swap.getOrElse(sys.error("expected file"))
    assert(f.fType == "csv" && f.dialect.separator == "|" && !f.dialect.header)
    assert(f.columns.map(_.outName) == Seq("k", "val"))
    assert(job.transform.reprocess == ReprocessMode.OnlyUpdate)
    assert(job.transform.pkField.contains("k"))
    assert(job.transform.fields(1).mapping.get.default.contains("?"))
    assert(job.transform.fields(2).expr.contains("concat('R-', k)"))
    assert(job.rowDefaults == Map("tag" -> "B1", "n" -> 7L))
  }

  test("parse a connector job spec and run it end-to-end") {
    spark.read.parquet(s"$sfDir/orders.parquet").createOrReplaceTempView("orders_v")
    val job = SpecLoader.fromJson(
      """{ "name": "cj", "date": "2024-01-01",
           "extract": {"connector": {"model": "orders_v",
             "domain": ["|", ["o_orderstatus", "=", "P"],
                             ["o_totalprice", ">", 400000.0]],
             "fields": ["o_orderkey", "o_orderstatus", "o_totalprice"]}},
           "transform": {"pk": "o_orderkey",
             "fields": [{"name": "o_orderkey", "as": "k", "type": "int"},
                        {"name": "o_orderstatus", "as": "st"}]} }""")
    val routed = JobRunner.run(spark, job, None).routed
    val expected = spark.sql(
      """SELECT count(*) FROM orders_v
         WHERE o_orderstatus = 'P' OR o_totalprice > 400000.0""").collect().head.getLong(0)
    assert(routed.count() == expected)
    assert(routed.columns.contains("k") && routed.columns.contains("st"))
  }

  test("missing required fields fail loudly") {
    intercept[IllegalArgumentException](SpecLoader.fromJson("""{"date": "2024-01-01"}"""))
    intercept[IllegalArgumentException](SpecLoader.fromJson(
      """{"name": "x", "date": "2024-01-01", "extract": {}, "transform": {}}"""))
  }
  test("query-execution metrics collect and flush to the log store") {
    import graft.runner.Metrics
    val logDir = java.nio.file.Files.createTempDirectory(java.nio.file.Paths.get(graft.Scratch.root), "graft_metrics").toString
    val c = Metrics.attach(spark, "mjob")
    spark.read.parquet(s"$sfDir/nation.parquet").collect()
    // listener events deliver asynchronously
    var waited = 0
    while (c.entries.isEmpty && waited < 50) { Thread.sleep(100); waited += 1 }
    assert(!c.entries.isEmpty)
    val n = Metrics.flushAndDetach(spark, c, logDir)
    assert(n >= 1)
    val log = graft.sinks.LogStore.read(spark, logDir)
    assert(log.filter(col("job") === "mjob" && col("level") === "info").count() >= 1)
  }

  test("observed metrics flush as deterministic 'metric' log rows") {
    import graft.runner.Metrics
    val logDir = java.nio.file.Files.createTempDirectory(java.nio.file.Paths.get(graft.Scratch.root), "graft_metrics_obs").toString
    val c = Metrics.attach(spark, "mjob2")
    spark.range(10).toDF("v")
      .observe("obs_t", count(lit(1)).as("rows"), sum(col("v")).as("v_sum"))
      .collect()
    assert(c.awaitObservation("obs_t"), "observation not delivered")
    Metrics.flushAndDetach(spark, c, logDir)
    val rows = graft.sinks.LogStore.read(spark, logDir)
      .filter(col("level") === "metric" && col("pk") === "obs_t")
      .select(col("job"), col("message")).distinct().collect()
    assert(rows.map(_.toSeq).toSeq == Seq(Seq("mjob2", """{"rows":10,"v_sum":45}""")))
  }
}
