package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._
import graft.expr.{Coercions, DateMacros, OdooDomain, ValueMapping}
import graft.spec.Specs.MappingSpec

/** Value mapping (reference cubicerpetl.py:624-649 semantics), domain
  * translator, date macros, coercions.
  */
class ExprSpec extends SparkSpec {
  import spark.implicits._

  val m = MappingSpec(Map("A" -> "alpha", "B" -> "beta"), default = Some("other"), returnNull = true)

  test("value mapping: hit, default, null passthrough") {
    val df = Seq(Some("A"), Some("B"), Some("Z"), None).toDF("v")
      .select(ValueMapping(col("v"), m).as("out"))
    assert(rowsOf(df).map(_.head) == Seq("alpha", "beta", "other", null))
  }

  test("value mapping: no default passes input through; returnNull=false maps null to default") {
    val noDefault = MappingSpec(Map("A" -> "alpha"))
    val df = Seq("A", "Z").toDF("v").select(ValueMapping(col("v"), noDefault).as("out"))
    assert(rowsOf(df).map(_.head) == Seq("alpha", "Z"))
    val withDefault = MappingSpec(Map("A" -> "alpha"), default = Some("d"), returnNull = false)
    val df2 = Seq(Some("A"), None).toDF("v").select(ValueMapping(col("v"), withDefault).as("out"))
    // null input, returnNull=false: try_element_at(null) is null → default
    assert(rowsOf(df2).map(_.head) == Seq("alpha", "d"))
  }

  test("value mapping join strategy matches literal strategy") {
    val mapDF = Seq(("A", "alpha"), ("B", "beta")).toDF("src", "dst")
    val df = Seq(Some("A"), Some("Z"), None).toDF("v")
    val out = ValueMapping.applyJoin(df, "v", mapDF, "out", default = Some("other"), returnNull = true)
    assert(rowsOf(out.select("out")).map(_.head) == Seq("alpha", "other", null))
  }

  test("odoo domain: implicit AND, prefix connectives, ops") {
    val df = Seq((1, "done", 10.0), (2, "open", 5.0), (3, "done", 2.0)).toDF("id", "state", "amt")
    def q(domain: Seq[Any]) = df.filter(OdooDomain.compile(domain)).select("id").as[Int].collect().toSeq.sorted

    assert(q(Seq(OdooDomain.Term("state", "=", "done"), OdooDomain.Term("amt", ">", 5.0))) == Seq(1))
    assert(q(Seq("|", OdooDomain.Term("id", "=", 1), OdooDomain.Term("id", "=", 3))) == Seq(1, 3))
    assert(q(Seq("!", OdooDomain.Term("state", "=", "done"))) == Seq(2))
    assert(q(Seq(OdooDomain.Term("id", "in", Seq(2, 3)))) == Seq(2, 3))
    assert(q(Seq(OdooDomain.Term("state", "like", "pen"))) == Seq(2))
    assert(q(Seq(OdooDomain.Term("state", "=like", "d%"))) == Seq(1, 3))
    assert(q(Seq(OdooDomain.Term("state", "ilike", "DONE"))) == Seq(1, 3))
    // =? is conditional equality: null/False value disables the term
    assert(q(Seq(OdooDomain.Term("state", "=?", "done"))) == Seq(1, 3))
    assert(q(Seq(OdooDomain.Term("state", "=?", null))) == Seq(1, 2, 3))
    assert(q(Seq(OdooDomain.Term("state", "=?", false))) == Seq(1, 2, 3))
    assert(q(Nil) == Seq(1, 2, 3))
  }

  test("odoo domain: null equality is IS NULL") {
    val df = Seq((1, Some("x")), (2, None)).toDF("id", "v")
    val got = df.filter(OdooDomain.compile(Seq(OdooDomain.Term("v", "=", null)))).select("id").as[Int].collect()
    assert(got.toSeq == Seq(2))
  }

  test("date macros: both spellings, all fields") {
    val d = LocalDate.of(2024, 3, 7)
    assert(DateMacros.substitute("/x/{aaaa}/{mm}/{dd}_{aa}.csv", d) == "/x/2024/03/07_24.csv")
    assert(DateMacros.substitute("WHERE d = '%(aaaa)s-%(mm)s-%(dd)s'", d) == "WHERE d = '2024-03-07'")
  }

  test("coercions: date/datetime render, numeric casts") {
    val df = Seq(("2024-03-07 13:14:15", "42", "3.5")).toDF("ts", "i", "f").select(
      Coercions.coerce(col("ts").cast("timestamp"), "date").as("d"),
      Coercions.coerce(col("ts").cast("timestamp"), "datetime").as("dt"),
      Coercions.coerce(col("i"), "int").as("i"),
      Coercions.coerce(col("f"), "float").as("f"),
      Coercions.coerce(lit(7), "char").as("c"))
    assert(rowsOf(df).head == Seq("2024-03-07", "2024-03-07 13:14:15", 42L, 3.5, "7"))
  }

  test("odoo falsy-null boundary") {
    val df = Seq(Some("x"), None).toDF("v").select(Coercions.odooFalsyNull(col("v")).as("o"))
    assert(rowsOf(df).map(_.head) == Seq("x", "False"))
  }
}
