package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expr.{DateMacros, OdooDomain, ValueMapping}
import graft.operators.{OrderedOps, Transformer}
import graft.sinks.{FixedWidthSink, LogStore, MergeRouter}
import graft.sources.{CsvSource, FixedWidth, JdbcSource}
import graft.spec.Specs._

/** Reference-parity query surface: each function is one `SparkEntry.queries`
  * entry exercising an operator family from SURVEY.md §2, with a DuckDB
  * oracle in [[graft.SparkEntry.oracleSql]].
  *
  * Numeric-determinism convention used throughout (so Spark and DuckDB
  * hash-match bit-for-bit): money aggregates go through DECIMAL (exact,
  * order-independent) and are cast back to double at the very end;
  * plain double sums are only used where the addends are integral
  * (exact in IEEE754 up to 2^53).
  */
object CoreQueries {

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  // --- q01: grouped aggregation (pricing summary, TPC-H Q1 shape) -------
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") < lit("2001-01-01").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(3,2)") - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"))

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       count(*) AS count_order,
       sum(l_quantity) / count(*) AS avg_qty
       FROM lineitem WHERE l_shipdate < TIMESTAMP '2001-01-01'
       GROUP BY l_returnflag, l_linestatus"""

  // --- q02: multi-join + agg + deterministic top-k (TPC-H Q3 shape) -----
  def q02TopOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = t(spark, dir, "orders")
    val li = t(spark, dir, "lineitem")
    // customer is the small dim — broadcast it; lineitem⨝orders shuffles
    // on the order key (the natural co-partitioning key at scale).
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(3,2)") - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  val q02Sql: String =
    """SELECT o_orderkey, o_orderdate, o_orderpriority,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       WHERE c_mktsegment = 'BUILDING'
       GROUP BY o_orderkey, o_orderdate, o_orderpriority
       ORDER BY revenue DESC, o_orderkey LIMIT 10"""

  // --- q03: FK-resolution join chain (J2/J3 analogue: key → dim name) ---
  def q03RegionRollup(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
    val nation = t(spark, dir, "nation")
    val region = t(spark, dir, "region")
    cust.join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"),
        sum(dec(col("c_acctbal"))).cast("double").as("total_acctbal"))
  }

  val q03Sql: String =
    """SELECT r_name, count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY r_name"""

  // --- q04: value-mapping dictionary (J1) with default + passthrough ----
  val StatusMapping = MappingSpec(
    entries = Map("F" -> "FULFILLED", "O" -> "OPEN"),
    default = Some("OTHER"),
    returnNull = true)

  def q04ValueMapping(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders").select(
      col("o_orderkey"),
      col("o_orderstatus"),
      ValueMapping(col("o_orderstatus"), StatusMapping).as("status_label"))

  val q04Sql: String =
    """SELECT o_orderkey, o_orderstatus,
       CASE WHEN o_orderstatus IS NULL THEN NULL
            WHEN o_orderstatus = 'F' THEN 'FULFILLED'
            WHEN o_orderstatus = 'O' THEN 'OPEN'
            ELSE 'OTHER' END AS status_label
       FROM orders"""

  // --- q05: Odoo-domain filter pushdown (F1) -----------------------------
  def q05DomainFilter(spark: SparkSession, dir: String): DataFrame = {
    val domain: Seq[Any] = Seq(
      "|", OdooDomain.Term("o_orderpriority", "like", "URGENT"),
      "&", OdooDomain.Term("o_orderstatus", "=", "F"),
      OdooDomain.Term("o_totalprice", ">", 400000.0))
    t(spark, dir, "orders")
      .filter(OdooDomain.compile(domain))
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"), col("o_orderpriority"))
  }

  val q05Sql: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
       FROM orders
       WHERE o_orderpriority LIKE '%URGENT%'
          OR (o_orderstatus = 'F' AND o_totalprice > 400000.0)"""

  // --- q06: the per-field transform pipeline (§2.5) ----------------------
  val OrdersTransform = TransformSpec(
    fields = Seq(
      FieldSpec("o_orderkey", fieldName = Some("order_ref"),
        expr = Some("concat('ORD-', lpad(cast(o_orderkey as string), 10, '0'))")),
      FieldSpec("o_orderstatus", fieldName = Some("status"),
        mapping = Some(MappingSpec(Map("F" -> "done", "O" -> "open", "P" -> "pending"))),
        fieldType = "selection"),
      FieldSpec("o_orderdate", fieldName = Some("order_date"), fieldType = "date"),
      FieldSpec("o_totalprice", fieldName = Some("total_price"), fieldType = "float"),
      FieldSpec("o_orderpriority", fieldName = Some("priority_class"),
        expr = Some("substring(o_orderpriority, 1, 1)"))),
    pkField = Some("o_orderkey"))

  def q06TransformPipeline(spark: SparkSession, dir: String): DataFrame =
    Transformer(t(spark, dir, "orders"), OrdersTransform)

  val q06Sql: String =
    """SELECT concat('ORD-', lpad(CAST(o_orderkey AS VARCHAR), 10, '0')) AS order_ref,
       CASE o_orderstatus WHEN 'F' THEN 'done' WHEN 'O' THEN 'open' WHEN 'P' THEN 'pending'
            ELSE o_orderstatus END AS status,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_totalprice AS total_price,
       substring(o_orderpriority, 1, 1) AS priority_class,
       CAST(o_orderkey AS VARCHAR) AS pk
       FROM orders"""

  // --- q07/q08: fixed-width render + full roundtrip with header/footer ---
  val OrdersFwCols = Seq(
    FwColumn("o_orderkey", position = 1, length = 10, align = "rjust", fillChar = "0", dataType = "long"),
    FwColumn("o_orderstatus", position = 11, length = 1),
    FwColumn("price_str", fieldName = Some("o_totalprice"), position = 12, length = 12, align = "rjust"),
    FwColumn("o_orderdate", position = 24, length = 10, dataType = "timestamp", format = Some("yyyy-MM-dd")),
    FwColumn("o_orderpriority", position = 34, length = 15))

  /** Parse-side schema: same layout, parse-oriented types. */
  val OrdersFwParseCols = Seq(
    FwColumn("o_orderkey", position = 1, length = 10, align = "rjust", fillChar = "0", dataType = "long"),
    FwColumn("o_orderstatus", position = 11, length = 1),
    FwColumn("o_totalprice", position = 12, length = 12, align = "rjust", dataType = "double"),
    FwColumn("o_orderdate", position = 24, length = 10, dataType = "date", format = Some("yyyy-MM-dd")),
    FwColumn("o_orderpriority", position = 34, length = 15))

  private def ordersForFw(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders").withColumn("price_str",
      dec(col("o_totalprice")).cast("string"))

  def q07FixedWidthRender(spark: SparkSession, dir: String): DataFrame =
    FixedWidth.renderLines(ordersForFw(spark, dir), OrdersFwCols)

  val q07Sql: String =
    """SELECT lpad(CAST(o_orderkey AS VARCHAR), 10, '0')
       || o_orderstatus
       || lpad(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 12, ' ')
       || strftime(o_orderdate, '%Y-%m-%d')
       || rpad(o_orderpriority, 15, ' ') AS value
       FROM orders"""

  val FwHeaderCols = Seq(
    FwColumn("o_orderkey", fieldName = Some("first_key"), position = 1, length = 10,
      align = "rjust", fillChar = "0", dataType = "long"))
  val FwFooterCols = Seq(
    FwColumn("o_orderkey", fieldName = Some("last_key"), position = 1, length = 10,
      align = "rjust", fillChar = "0", dataType = "long"))

  def q08FixedWidthRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val body = FixedWidthSink.assemble(
      ordersForFw(spark, dir), OrdersFwCols, orderCol = "o_orderkey",
      headerCols = FwHeaderCols.map(c => c.copy(fieldName = None)),
      footerCols = FwFooterCols.map(c => c.copy(fieldName = None)))
    // __sec ∈ {0 header, 1 data, 2 footer}; __ord orders within section.
    // The line number is the ORDERED STRUCT (__sec, __ord), not an
    // arithmetic combination: __ord comes from monotonically_increasing_id
    // (partitionId·2^33 + offset), so any fixed stride overflows once the
    // data has enough partitions — struct comparison is stride-free and
    // holds at any partition count.
    val lines = body.select(
      struct(col("__sec"), col("__ord")).as("__line_no"), col("value"))
    FixedWidth.parseLines(lines, OrdersFwParseCols, FwHeaderCols, FwFooterCols)
      .drop("__line_no")
  }

  val q08Sql: String =
    """SELECT o_orderkey, o_orderstatus,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
       CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
       (SELECT min(o_orderkey) FROM orders) AS first_key,
       (SELECT max(o_orderkey) FROM orders) AS last_key
       FROM orders"""

  // --- q09: CSV dialect roundtrip through a real file (S2/K2) ------------
  val OrdersCsvCols = Seq(
    FwColumn("o_orderkey", dataType = "long"),
    FwColumn("o_custkey", dataType = "long"),
    FwColumn("o_orderstatus", dataType = "string"),
    FwColumn("o_totalprice", dataType = "double"),
    FwColumn("o_orderdate", dataType = "timestamp"),
    FwColumn("o_orderpriority", dataType = "string"))

  def q09CsvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val dialect = CsvDialect(separator = "|", quote = "'", header = false)
    val path = graft.Scratch.path(s"csv_orders_${dir.replaceAll("[^a-zA-Z0-9]", "_")}")
    CsvSource.write(t(spark, dir, "orders"), path, dialect)
    CsvSource.read(spark, path, dialect, OrdersCsvCols)
  }

  val q09Sql: String = "SELECT * FROM orders"

  // --- q10: break_on — order-dependent early abort (F5) ------------------
  def q10BreakOn(spark: SparkSession, dir: String): DataFrame =
    OrderedOps.breakOn(
      t(spark, dir, "orders").select(col("o_orderkey"), col("o_totalprice")),
      orderCol = "o_orderkey",
      pred = col("o_totalprice") > 450000.0)

  val q10Sql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
       WHERE o_orderkey < COALESCE(
         (SELECT min(o_orderkey) FROM orders WHERE o_totalprice > 450000.0),
         9223372036854775807)"""

  // --- q11..q15: upsert routing, one query per reprocess mode (§2.7) -----
  private def incoming(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))

  private def state(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders").filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey").as("pk"), (col("o_orderkey") * 1000).as("model_id"))

  private def merge(spark: SparkSession, dir: String, mode: ReprocessMode): DataFrame =
    MergeRouter.route(incoming(spark, dir), state(spark, dir), "o_orderkey", mode)
      .select(col("o_orderkey"),
        col(MergeRouter.ActionCol).as("action"),
        col(MergeRouter.IdCol).as("model_id"))

  def q11MergeInsert(s: SparkSession, d: String): DataFrame = merge(s, d, ReprocessMode.Insert)
  def q12MergeUpdate(s: SparkSession, d: String): DataFrame = merge(s, d, ReprocessMode.Update)
  def q13MergeNoUpdate(s: SparkSession, d: String): DataFrame = merge(s, d, ReprocessMode.NoUpdate)
  def q14MergeOnlyUpdate(s: SparkSession, d: String): DataFrame = merge(s, d, ReprocessMode.OnlyUpdate)
  def q15MergeDelete(s: SparkSession, d: String): DataFrame = merge(s, d, ReprocessMode.Delete)

  private val mergeMatched = "o_orderkey % 3 = 0"
  val q11Sql: String =
    s"""SELECT o_orderkey, 'insert' AS action,
        CASE WHEN $mergeMatched THEN o_orderkey * 1000 END AS model_id
        FROM orders"""
  val q12Sql: String =
    s"""SELECT o_orderkey,
        CASE WHEN $mergeMatched THEN 'update' ELSE 'insert' END AS action,
        CASE WHEN $mergeMatched THEN o_orderkey * 1000 END AS model_id
        FROM orders"""
  val q13Sql: String =
    s"""SELECT o_orderkey,
        CASE WHEN $mergeMatched THEN 'skip' ELSE 'insert' END AS action,
        CASE WHEN $mergeMatched THEN o_orderkey * 1000 END AS model_id
        FROM orders"""
  val q14Sql: String =
    s"""SELECT o_orderkey,
        CASE WHEN $mergeMatched THEN 'update' ELSE 'skip' END AS action,
        CASE WHEN $mergeMatched THEN o_orderkey * 1000 END AS model_id
        FROM orders"""
  val q15Sql: String =
    s"""SELECT o_orderkey, 'delete' AS action, o_orderkey * 1000 AS model_id
        FROM orders WHERE $mergeMatched
        UNION ALL
        SELECT o_orderkey, 'insert' AS action, CAST(NULL AS BIGINT) AS model_id
        FROM orders"""

  // --- q16: log-as-state-store id recovery (§2.5 / §2.7) -----------------
  def q16LogStateRecovery(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    // synthesize a log: info rows (two generations of model_id — min wins)
    // for even keys, error rows for all keys (must be ignored)
    val info1 = o.filter(col("o_orderkey") % 2 === 0).select(
      lit("j1").as("job"), col("o_orderkey").cast("string").as("pk"),
      (col("o_orderkey") * 10).as("model_id"), lit("info").as("level"))
    val info2 = o.filter(col("o_orderkey") % 2 === 0).select(
      lit("j1").as("job"), col("o_orderkey").cast("string").as("pk"),
      (col("o_orderkey") * 10 + 5).as("model_id"), lit("info").as("level"))
    val errs = o.select(
      lit("j1").as("job"), col("o_orderkey").cast("string").as("pk"),
      lit(-1L).as("model_id"), lit("error").as("level"))
    LogStore.stateFor(info1.unionByName(info2).unionByName(errs), "j1")
  }

  val q16Sql: String =
    """SELECT CAST(o_orderkey AS VARCHAR) AS pk, o_orderkey * 10 AS model_id
       FROM orders WHERE o_orderkey % 2 = 0"""

  // --- q17: date-macro substitution (S7 filename/query templating) -------
  def q17DateMacroFilter(spark: SparkSession, dir: String): DataFrame = {
    val jobDate = java.time.LocalDate.of(1998, 6, 15)
    val lo = DateMacros.substitute("{aaaa}-{mm}-01", jobDate)
    val hi = DateMacros.substitute("{aaaa}-{mm}-{dd}", jobDate)
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit(lo).cast("timestamp_ntz") &&
        col("l_shipdate") < lit(hi).cast("timestamp_ntz"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
  }

  val q17Sql: String =
    """SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1998-06-01' AND l_shipdate < TIMESTAMP '1998-06-15'"""

  // --- q18: rollup (grouping-set aggregation) -----------------------------
  def q18Rollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("o_totalprice"))).cast("double").as("total"))

  val q18Sql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
       FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)"""

  // --- q19: window top-k per group ----------------------------------------
  def q19WindowTopK(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(spark, dir, "orders")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("rnk"), col("o_orderkey"), col("o_totalprice"))
  }

  val q19Sql: String =
    """SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
                row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rnk
         FROM orders) WHERE rnk <= 3"""

  // --- q20: JDBC roundtrip through embedded Derby (S4/K4) ----------------
  // JVM-unique Derby dir: embedded Derby holds a single-JVM lock on its
  // database directory, so a per-SF-only path makes any CONCURRENT
  // local run (a second Verify, review tooling) fail q20 with a
  // spurious lock conflict; stable within the JVM so bench passes reuse
  // the same database.
  private val derbyToken = java.util.UUID.randomUUID().toString.take(8)

  def q20JdbcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val url = s"jdbc:derby:${graft.Scratch.path(s"derby_${tag}_$derbyToken")};create=true"
    // Spark's JDBC writer quotes column identifiers at CREATE, so an
    // unquoted column list would fold to upper case in Derby — SELECT *
    // preserves the created names. sql_begin/sql_end run as harmless
    // driver-side statements (the reference's session-setup hook points).
    val res = SqlResource(
      url = url,
      sqlBegin = Some("VALUES {aaaa}"),
      sqlQuery = "SELECT * FROM nation_copy",
      sqlEnd = Some("VALUES 1"),
      table = Some("nation_copy"))
    val jobDate = java.time.LocalDate.of(2024, 1, 1)
    try JdbcSource.execStatement(url, "DROP TABLE nation_copy") catch { case _: Throwable => }
    JdbcSource.write(t(spark, dir, "nation"), res.copy(sqlBegin = None, sqlEnd = None), jobDate)
    JdbcSource.read(spark, res, jobDate)
      .select(col("n_nationkey").cast("int").as("n_nationkey"), col("n_name"),
        col("n_regionkey").cast("int").as("n_regionkey"))
  }

  val q20Sql: String = "SELECT n_nationkey, n_name, n_regionkey FROM nation"
}
