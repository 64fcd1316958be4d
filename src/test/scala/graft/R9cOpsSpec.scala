package graft

import org.apache.spark.sql.functions._
import graft.ext.{Profiling, Sketches}

/** Round-9 third wave: HyperLogLog (x138) and the column profiler
  * (x139). x140–x142 are compositions of already-spec'd machinery and
  * are pinned by their gates' oracles.
  */
class R9cOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hll: registers merge by max — sketch of union == merged partial sketches") {
    val a = (1 to 4000).map(i => ("g", s"v$i")).toDF("g", "v")
    val b = (3000 to 7000).map(i => ("g", s"v$i")).toDF("g", "v")
    val direct = Sketches.hllRegisters(a.union(b), "g", "v")
    val merged = Sketches.hllRegisters(a, "g", "v")
      .union(Sketches.hllRegisters(b, "g", "v"))
      .groupBy(col("g"), col("idx")).agg(max(col("rho")).as("rho"))
    assert(direct.except(merged).count() == 0 &&
      merged.except(direct).count() == 0)
    // constant state: never more than 2^p = 256 registers
    assert(direct.count() <= 256)
  }

  test("hll: estimate within 10% at 7k distinct; exact-count join sane") {
    val df = (1 to 7000).map(i => ("g", s"id$i")).toDF("g", "v")
    val est = Sketches.hllEstimate(Sketches.hllRegisters(df, "g", "v"), "g")
      .head()
    val e = est.getDouble(3)
    assert(math.abs(e / 7000.0 - 1.0) < 0.10, s"hll_est=$e for 7000 distinct")
  }

  test("hll: small cardinality takes the linear-counting branch") {
    // 20 distinct values -> at most 20 registers hit, V >= 236, raw
    // estimate far below 2.5m: the correction m*ln(m/V) applies and is
    // a much better estimate than raw at this range
    val df = (1 to 20).map(i => ("g", s"u$i")).toDF("g", "v")
    val r = Sketches.hllEstimate(Sketches.hllRegisters(df, "g", "v"), "g").head()
    val (nZero, e) = (r.getLong(2), r.getDouble(3))
    assert(nZero >= 236L)
    val linear = 256.0 * math.log(256.0 / nZero)
    assert(math.abs(e - (math.rint(linear * 10000) / 10000)) < 1e-9,
      s"expected linear-counting value $linear, got $e")
    assert(math.abs(e / 20.0 - 1.0) < 0.2)
  }

  test("columnProfile: typed min/max, null and distinct accounting") {
    val df = Seq(
      (Some(2L), "b"), (Some(10L), "a"), (None, "a"), (Some(10L), null))
      .toDF("n", "s")
    val out = Profiling.columnProfile(df, Seq("n", "s"))
      .orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toSeq
    // numeric min is 2 (typed), NOT "10" (lexicographic)
    assert(out == Seq(
      ("n", 4L, 1L, 2L, "2", "10"),
      ("s", 4L, 1L, 2L, "a", "b")))
  }
}
