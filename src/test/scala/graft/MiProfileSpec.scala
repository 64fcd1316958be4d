package graft

import org.apache.spark.sql.functions._
import graft.ext.Profiling

/** Pairwise mutual-information profile (x198): hand-computed values,
  * null categories, constant-column NMI, saturation, and the shared
  * one-scan plan shape.
  */
class MiProfileSpec extends SparkSpec {
  import spark.implicits._

  test("miProfile: hand-computed MI on a 2x2 table; NMI reaches 1 at saturation") {
    // perfectly dependent: b = a. joint = {(0,0): 2, (1,1): 2}, n = 4
    // MI = 2 * (1/2) ln(4*2/(2*2)) = ln 2; H_a = H_b = ln 2 -> NMI = 1
    val dep = Seq((0, 0), (0, 0), (1, 1), (1, 1)).toDF("a", "b")
    val d = Profiling.miProfile(dep, Seq(("a", "b"))).collect()(0)
    assert(math.abs(d.getDouble(4) - math.log(2)) < 1e-6, s"mi=${d.getDouble(4)}")
    assert(math.abs(d.getDouble(5) - 1.0) < 1e-6, s"nmi=${d.getDouble(5)}")
    // independent 2x2: every cell n_ab = 1, n = 4, n_a = n_b = 2
    // each term: (1/4) ln(4*1/(2*2)) = 0 -> MI = 0
    val ind = Seq((0, 0), (0, 1), (1, 0), (1, 1)).toDF("a", "b")
    val i = Profiling.miProfile(ind, Seq(("a", "b"))).collect()(0)
    assert(i.getDouble(4) == 0.0 && i.getDouble(5) == 0.0)
  }

  test("miProfile: null is a real category, not a dropped row") {
    // b = (a is null): perfectly dependent through the null category
    val df = Seq((Some(1), "x"), (Some(1), "x"), (None, "y"), (None, "y"))
      .toDF("a", "b")
    val r = Profiling.miProfile(df, Seq(("a", "b"))).collect()(0)
    assert(r.getLong(2) == 4L, "all 4 rows must count")
    assert(math.abs(r.getDouble(4) - math.log(2)) < 1e-6)
    assert(math.abs(r.getDouble(5) - 1.0) < 1e-6)
  }

  test("miProfile: constant column yields mi=0, nmi=0 (not a division blowup)") {
    val df = Seq((1, "c"), (2, "c"), (3, "c")).toDF("a", "b")
    val r = Profiling.miProfile(df, Seq(("a", "b"))).collect()(0)
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0)
  }

  test("miProfile: unordered pairs canonicalize and dedup; degenerate pair refused") {
    val df = Seq((1, 2), (3, 4)).toDF("a", "b")
    val out = Profiling.miProfile(df, Seq(("b", "a"), ("a", "b")))
    assert(out.count() == 1L)
    assert(out.collect()(0).getString(0) == "a")
    intercept[IllegalArgumentException] {
      Profiling.miProfile(df, Seq(("a", "a")))
    }
  }

  test("miProfile: all pairs share ONE scan (Expand, single leaf)") {
    val dir = graft.Scratch.path(s"miplan_${java.util.UUID.randomUUID().toString.take(8)}")
    (1 to 300).map(i => (s"k${i % 7}", s"v${i % 5}", (i % 3).toLong))
      .toDF("a", "b", "c").write.parquet(dir)
    val df = spark.read.parquet(dir)
    val cells = Profiling.fdCells(df, Seq(("a", "b"), ("a", "c"), ("b", "c")))
    val leaves = cells.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.size == 1, s"3 pairs must cost ONE scan, got ${leaves.size}")
  }
}
