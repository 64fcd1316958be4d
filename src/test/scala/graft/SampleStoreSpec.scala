package graft

import org.apache.spark.sql.functions._
import graft.ext.{SampleStore, Sampling}

/** Maintained weighted-sample store (x195/x196): the slack law and the
  * crash/forget cases the gate fixture can't exercise — exactness under
  * ≤-slack forgets, the documented degrade past slack, replay
  * replacement, and forget of unknown keys.
  */
class SampleStoreSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    s"/tmp/graft/samplestore_${java.util.UUID.randomUUID().toString.take(8)}"

  // ids 1..n with weight w(id); day = id % days
  private def corpus(n: Int, days: Int) =
    (1 to n).map(i => (i.toLong, 1L + (i % 7).toLong, (i % days).toLong))
      .toDF("id", "w", "day")

  private def append(t: String, df: org.apache.spark.sql.DataFrame,
      days: Int, k: Int, slack: Int): Unit =
    (0 until days).foreach { d =>
      SampleStore.appendDay(spark, df.filter(col("day") === d.toLong),
        "id", col("w"), s"d$d", k, slack, t)
    }

  test("store read is bit-identical to the batch sample (no forgets)") {
    val t = fresh()
    val df = corpus(200, 3)
    append(t, df, days = 3, k = 10, slack = 2)
    val got = SampleStore.sampleFromStore(spark, t, "id", 10)
      .orderBy("sample_rank").collect().map(_.toSeq).toSeq
    val want = Sampling.weightedTopK(df, "id", col("w"), 10)
      .select(col("id"), col("sample_rank"), col("es_key"))
      .orderBy("sample_rank").collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("replaying a day replaces its rows (at-least-once convergence)") {
    val t = fresh()
    val df = corpus(200, 3)
    append(t, df, days = 3, k = 10, slack = 2)
    val before = graft.sources.ManifestStore.read(spark, t).count()
    SampleStore.appendDay(spark, df.filter(col("day") === 1L),
      "id", col("w"), "d1", 10, 2, t)
    assert(graft.sources.ManifestStore.read(spark, t).count() == before)
  }

  test("slack law: <= slack forgets per day keep the sample exact") {
    val t = fresh()
    val df = corpus(200, 2)
    append(t, df, days = 2, k = 10, slack = 3)
    // doom the global top-3: worst case all land in one day — still
    // within slack, so the store must equal the batch sample over the
    // surviving corpus
    val doomed = SampleStore.sampleFromStore(spark, t, "id", 3).select(col("id"))
    val doomedIds = doomed.collect().map(_.getLong(0)).toSet
    SampleStore.forget(spark, t, "id", doomed)
    val got = SampleStore.sampleFromStore(spark, t, "id", 10)
      .orderBy("sample_rank").collect().map(_.toSeq).toSeq
    val want = Sampling.weightedTopK(
        df.filter(!col("id").isin(doomedIds.toSeq: _*)), "id", col("w"), 10)
      .select(col("id"), col("sample_rank"), col("es_key"))
      .orderBy("sample_rank").collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("past slack the sample degrades to retained candidates, never wrong rows") {
    val t = fresh()
    val df = corpus(120, 1) // one day: retained = top-(k+slack) = top-7
    append(t, df, days = 1, k = 5, slack = 2)
    // forget 4 of the day's retained 7 — 2 past slack: the store can
    // only answer from its 3 retained survivors
    val doomed = SampleStore.sampleFromStore(spark, t, "id", 4).select(col("id"))
    SampleStore.forget(spark, t, "id", doomed)
    val got = SampleStore.sampleFromStore(spark, t, "id", 5).collect()
    assert(got.length == 3) // honest under-fill, not invented rows
    // every returned row is a true survivor ranked consistently with
    // the batch sample over survivors (a prefix displacement, not junk)
    val doomedIds = doomed.collect().map(_.getLong(0)).toSet
    val batch = Sampling.weightedTopK(
        df.filter(!col("id").isin(doomedIds.toSeq: _*)), "id", col("w"), 5)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got.map(_.getLong(0)).toSet.subsetOf(batch))
    // re-appending the breached day restores exactness
    SampleStore.appendDay(spark,
      df.filter(!col("id").isin(doomedIds.toSeq: _*)),
      "id", col("w"), "d0", 5, 2, t)
    val healed = SampleStore.sampleFromStore(spark, t, "id", 5)
      .collect().map(_.getLong(0)).toSet
    assert(healed == batch)
  }

  test("stratified store: per-group reads equal per-group batch samples") {
    val t = fresh()
    val df = (1 to 300).map(i =>
      (i.toLong, 1L + (i % 7).toLong, (i % 3).toLong, s"g${i % 2}"))
      .toDF("id", "w", "day", "grp")
    (0 until 3).foreach { d =>
      SampleStore.appendDay(spark, df.filter(col("day") === d.toLong),
        "id", col("w"), s"d$d", 10, 2, t, byCols = Seq("grp"))
    }
    val got = SampleStore.sampleFromStore(spark, t, "id", 10, byCols = Seq("grp"))
      .orderBy("grp", "sample_rank").collect().map(_.toSeq).toSeq
    val want = Sampling.weightedTopKBy(df, "id", col("w"), Seq("grp"), 10)
      .select(col("grp"), col("id"), col("sample_rank"), col("es_key"))
      .orderBy("grp", "sample_rank").collect().map(_.toSeq).toSeq
    assert(got == want)
    assert(got.count(_.head == "g0") == 10 && got.count(_.head == "g1") == 10)
  }

  test("forgetting unknown keys is a no-op") {
    val t = fresh()
    val df = corpus(50, 1)
    append(t, df, days = 1, k = 5, slack = 1)
    val before = SampleStore.sampleFromStore(spark, t, "id", 5)
      .collect().map(_.toSeq).toSeq
    SampleStore.forget(spark, t, "id", Seq(9999L).toDF("id"))
    val after = SampleStore.sampleFromStore(spark, t, "id", 5)
      .collect().map(_.toSeq).toSeq
    assert(before == after)
  }
}
