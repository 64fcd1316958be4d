package graft

import org.apache.spark.sql.functions._
import graft.ext.{Sampling, Sketches}

/** Plan-shape guards for the round-9 second-half operators (the
  * ScaleSpec discipline): the claims the scaladocs make about shuffles
  * and join strategies, asserted on executed plans.
  */
class R9PlanSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.count() // force AQE finalization
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("hllRegisters: one map-side-combined shuffle, no join, no sort exchange") {
    val df = (1 to 500).map(i => ("g", s"v$i")).toDF("g", "v")
    val plan = planOf(Sketches.hllRegisters(df, "g", "v"))
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected ONE shuffle (partial agg combines map-side):\n$plan")
    assert(!plan.contains("Exchange rangepartitioning") && !plan.contains("Join"),
      s"register build must be join- and sort-free:\n$plan")
  }

  test("groupedPhases: distribution joins back as a broadcast, never a shuffle join") {
    val df = (1 to 200).map(i => (s"g${i % 3}", i)).toDF("g", "s")
    val plan = planOf(Sampling.groupedPhases(df, Seq("g"), "s", 3))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"assignment join must broadcast the O(distinct scores) distribution:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a shuffle join on the corpus defeats the design:\n$plan")
  }

  test("fdProfile cells: ONE leaf scan of the input with Expand, however many candidates") {
    val dir = graft.Scratch.path(s"fdplan_${java.util.UUID.randomUUID().toString.take(8)}")
    (1 to 300).map(i => (s"k${i % 7}", s"v${i % 5}", i.toLong, s"w${i % 3}"))
      .toDF("a", "b", "c", "d").write.parquet(dir)
    val df = spark.read.parquet(dir)
    val cells = graft.ext.Profiling.fdCells(df,
      Seq(("a", "b"), ("c", "b"), ("d", "a"), ("b", "a")))
    val leaves = cells.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.size == 1,
      s"4 candidates must cost ONE scan, got ${leaves.size} leaves:\n${cells.queryExecution.optimizedPlan}")
    val plan = planOf(cells)
    assert(plan.contains("Expand"),
      s"grouping sets should fan out via Expand inside the single scan:\n$plan")
  }

  test("embargoSplit: narrow assignment — no shuffle beyond the 1-row bounds aggregate") {
    val df = (1L to 1000L).toDF("ts")
    val plan = planOf(Sampling.embargoSplit(df, "ts", 70, 10))
    // the only exchanges allowed are the bounds aggregate's (single
    // partition) — never a hash/range repartition of the data itself
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning"),
      s"split assignment must stay narrow:\n$plan")
  }
}
