package graft

import org.apache.spark.sql.functions._

import graft.ext.{Packing, Sketches}

/** MG heavy hitters (x70) and the distributed prefix-sum packing plan
  * (x71).
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("heavyHitters is exact under a deliberately tiny sketch") {
    // m=4 forces constant sketch pressure; 'a' (10) is the only value
    // at or above ceil(24/4)=6; 'b' (5) and 9 singletons must not leak
    val vals = Seq.fill(10)("a") ++ Seq.fill(5)("b") ++
      (1 to 9).map(i => s"u$i")
    val df = vals.toDF("w").repartition(7) // odd partitioning on purpose
    val got = Sketches.heavyHitters(df, "w", m = 4, minFractionDen = 4L)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a", 10L)))
  }

  test("heavyHitters output is partitioning-invariant") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(lower(col("text")), "[^a-z0-9]+")).as("w"))
      .filter(col("w") =!= "")
    def run(parts: Int) =
      Sketches.heavyHitters(df.repartition(parts), "w", m = 64, minFractionDen = 50L)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val a = run(2)
    assert(a.nonEmpty)
    assert(a == run(13)) // candidate SET may differ; verified output cannot
  }

  test("heavyHitters refuses a threshold the sketch cannot guarantee") {
    val df = Seq("a", "b").toDF("w")
    intercept[IllegalArgumentException] {
      Sketches.heavyHitters(df, "w", m = 10, minFractionDen = 11L)
    }
  }

  test("withGlobalOffsets equals a sequential cumsum on sparse ids") {
    // ids sparse and shuffled across width-3 buckets; null length
    val rows = Seq((2L, Some(5L)), (7L, Some(3L)), (1L, None),
      (9L, Some(4L)), (15L, Some(2L)), (4L, Some(1L)))
    val got = Packing.withGlobalOffsets(
        rows.toDF("id", "len"), "id", "len", bucketWidth = 3L)
      .select(col("id"), col("start"), col("end"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // sequential spec: order by id, cumsum of coalesce(len, 0)
    var off = 0L
    val want = rows.sortBy(_._1).map { case (id, len) =>
      val l = len.getOrElse(0L); val s = off; off += l; (id, s, s + l)
    }
    assert(got.toSeq == want)
  }

  test("packingStats counts hand-computed boundary crossings") {
    // capacity 10: spans [0,4) [4,8) [8,12) [12,26) → crossings 0,0,1,1
    // (the 14-len doc starts in bin 1 and ends in bin 2)
    val df = Seq((1L, 4L, "s1"), (2L, 4L, "s1"), (3L, 4L, "s2"), (4L, 14L, "s2"))
      .toDF("id", "len", "src")
    val got = Packing.packingStats(df, "id", "len", "src",
        capacity = 10L, bucketWidth = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).sortBy(_._1)
    assert(got.toSeq == Seq(("s1", 2L, 8L, 0L, 0.0), ("s2", 2L, 18L, 2L, 1.0)))
  }

  test("the per-event window partitions on the bucket, not globally") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    val plan = Packing.withGlobalOffsets(df, "doc_id", "n_chars", 1000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__bkt"),
      "data-sized window lost its bucket partitioning")
  }
}
