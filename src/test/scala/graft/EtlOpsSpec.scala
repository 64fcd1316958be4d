package graft

import org.apache.spark.sql.functions._
import graft.operators.{OrderedOps, Transformer}
import graft.sinks.{LogStore, MergeRouter}
import graft.spec.Specs._

/** Transform pipeline, upsert routing, ordered ops, log state store. */
class EtlOpsSpec extends SparkSpec {
  import spark.implicits._

  test("transformer: expr + mapping + coercion + pk derivation") {
    val spec = TransformSpec(
      fields = Seq(
        FieldSpec("id", fieldName = Some("ref"), expr = Some("concat('R-', id)")),
        FieldSpec("st", fieldName = Some("status"),
          mapping = Some(MappingSpec(Map("o" -> "open"), default = Some("?"))),
          fieldType = "selection"),
        FieldSpec("amt", fieldName = Some("amount"), fieldType = "float")),
      pkField = Some("id"))
    val out = Transformer(Seq((1, "o", "2.5"), (2, "x", "3")).toDF("id", "st", "amt"), spec)
    assert(out.columns.toSeq == Seq("ref", "status", "amount", "pk"))
    assert(sortedRows(out) == Seq(
      Seq("R-1", "open", 2.5, "1"), Seq("R-2", "?", 3.0, "2")))
  }

  test("transformer: forced value wins over data and hooks compose") {
    val spec = TransformSpec(Seq(FieldSpec("v", forced = Some("K"))))
    val out = Transformer.withHooks(
      Seq("a", "b").toDF("v"), spec,
      prev = df => df.filter(col("v") === "a"))
    assert(rowsOf(out) == Seq(Seq("K")))
  }

  val incoming = Seq(1, 2, 3, 4).toDF("pk")
  val state = Seq((2, 20L), (4, 40L)).toDF("pk", "model_id")

  def routes(mode: ReprocessMode): Seq[(Int, String, Any)] =
    MergeRouter.route(incoming, state, "pk", mode)
      .collect().toSeq.map(r => (r.getInt(0), r.getAs[String](MergeRouter.ActionCol), r.getAs[Any](MergeRouter.IdCol)))
      .sortBy(t => (t._1, t._2))

  test("merge router: all five reprocess modes") {
    assert(routes(ReprocessMode.Insert) ==
      Seq((1, "insert", null), (2, "insert", 20L), (3, "insert", null), (4, "insert", 40L)))
    assert(routes(ReprocessMode.Update) ==
      Seq((1, "insert", null), (2, "update", 20L), (3, "insert", null), (4, "update", 40L)))
    assert(routes(ReprocessMode.NoUpdate) ==
      Seq((1, "insert", null), (2, "skip", 20L), (3, "insert", null), (4, "skip", 40L)))
    assert(routes(ReprocessMode.OnlyUpdate) ==
      Seq((1, "skip", null), (2, "update", 20L), (3, "skip", null), (4, "update", 40L)))
    assert(routes(ReprocessMode.Delete) ==
      Seq((1, "insert", null), (2, "delete", 20L), (2, "insert", null),
        (3, "insert", null), (4, "delete", 40L), (4, "insert", null)))
    assert(MergeRouter.actionable(
      MergeRouter.route(incoming, state, "pk", ReprocessMode.OnlyUpdate)).count() == 2)
  }

  test("merge router: upsert idempotence (update twice ≡ once)") {
    val once = routes(ReprocessMode.Update)
    assert(routes(ReprocessMode.Update) == once)
  }

  test("break_on keeps rows strictly before first match, in order") {
    val df = Seq((1, 5.0), (2, 1.0), (3, 9.0), (4, 1.0), (5, 20.0)).toDF("ord", "v")
    val out = OrderedOps.breakOn(df, "ord", col("v") > 8.0)
    assert(out.select("ord").as[Int].collect().toSeq.sorted == Seq(1, 2))
    // no match → keep everything
    val all = OrderedOps.breakOn(df, "ord", col("v") > 100.0)
    assert(all.count() == 5)
  }

  test("attachEdgeRow broadcasts first/last row onto all rows") {
    val df = Seq(1, 2, 3).toDF("n")
    val edge = Seq((1, "first"), (9, "last")).toDF("ord", "tag")
    val withFirst = OrderedOps.attachEdgeRow(df, edge, "ord", first = true)
    assert(withFirst.select("tag").distinct().as[String].collect().toSeq == Seq("first"))
    val withLast = OrderedOps.attachEdgeRow(df, edge, "ord", first = false)
    assert(withLast.select("tag").distinct().as[String].collect().toSeq == Seq("last"))
    assert(withFirst.count() == 3)
  }

  test("log store: stateFor takes min info model_id per pk, ignores errors") {
    val log = Seq(
      ("j1", "1", 10L, "info"), ("j1", "1", 15L, "info"),
      ("j1", "2", -1L, "error"), ("j2", "3", 30L, "info"))
      .toDF("job", "pk", "model_id", "level")
    val st = LogStore.stateFor(log, "j1")
    assert(sortedRows(st) == Seq(Seq("1", 10L)))
  }

  test("log store: append + read round-trip with partition pruning") {
    val dir = java.nio.file.Files.createTempDirectory(java.nio.file.Paths.get(graft.Scratch.root), "graft_log").toString
    val entries = Seq(("j1", "1", 10L, "info", "ok", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("job", "pk", "model_id", "level", "message", "ts")
    LogStore.append(spark, dir, entries)
    val back = LogStore.read(spark, dir)
    assert(back.count() == 1)
    assert(LogStore.stateFor(back, "j1").count() == 1)
  }
  test("jdbc templated DML sink: batched upsert-shaped statements") {
    import graft.sinks.JdbcSink
    import graft.sources.JdbcSource
    val url = "jdbc:derby:memory:graft_sink;create=true"
    JdbcSource.execStatement(url, "CREATE TABLE t (k INT PRIMARY KEY, v VARCHAR(20))")
    val df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    JdbcSink.writeTemplated(df, url, "INSERT INTO t (k, v) VALUES (?, ?)", Seq("k", "v"), batchSize = 2)
    val back = spark.read.format("jdbc").option("url", url)
      .option("query", "SELECT k, v FROM t").load()
    assert(sortedRows(back) == Seq(Seq(1, "a"), Seq(2, "b"), Seq(3, "c")))
    // templated UPDATE with reordered column binding
    JdbcSink.writeTemplated(Seq((1, "A")).toDF("k", "v"), url,
      "UPDATE t SET v = ? WHERE k = ?", Seq("v", "k"))
    val after = spark.read.format("jdbc").option("url", url)
      .option("query", "SELECT v FROM t WHERE k = 1").load()
    assert(rowsOf(after) == Seq(Seq("A")))
  }

  test("jdbc read: sql_end teardown runs only after the fetch (temp-table lifecycle)") {
    import graft.spec.Specs.SqlResource
    import graft.sources.JdbcSource
    // sql_begin stages a scratch table the main query reads; sql_end drops
    // it (reference cubicerpetl.py:293-313 ordering). A lazy read would
    // scan a dropped table.
    val url = "jdbc:derby:memory:graft_sqlend;create=true"
    JdbcSource.execStatement(url, "CREATE TABLE src (k INT, v VARCHAR(10))")
    JdbcSource.execStatement(url, "INSERT INTO src VALUES (1, 'a'), (2, 'b')")
    JdbcSource.execStatement(url, "CREATE TABLE stage (k INT, v VARCHAR(10))")
    val res = SqlResource(url,
      sqlBegin = Some("INSERT INTO stage SELECT k, v FROM src"),
      sqlQuery = "SELECT k, v FROM stage",
      sqlEnd = Some("DROP TABLE stage"))
    val df = JdbcSource.read(spark, res, java.time.LocalDate.of(2024, 1, 1))
    // stage is already dropped by now — the rows must still be readable
    assert(sortedRows(df) == Seq(Seq(1, "a"), Seq(2, "b")))
    val probe = intercept[Exception] {
      spark.read.format("jdbc").option("url", url)
        .option("query", "SELECT * FROM stage").load().count()
    }
    assert(probe.getMessage.toUpperCase.contains("STAGE"))
    // no unpersist owed: the read materializes via localCheckpoint, whose
    // blocks the ContextCleaner reclaims once `df` is unreferenced
  }
}
