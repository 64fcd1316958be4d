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
    graft.Scratch.path(s"samplestore_${java.util.UUID.randomUUID().toString.take(8)}")

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
    SampleStore.forget(spark, t, "id", doomed, forgetSeq = 1L)
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
    SampleStore.forget(spark, t, "id", doomed, forgetSeq = 1L)
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

  test("epoch fold: reads bit-identical across a double compaction") {
    val t = fresh()
    val df = corpus(300, 4)
    append(t, df, days = 4, k = 10, slack = 3)
    val before = SampleStore.sampleFromStore(spark, t, "id", 10)
      .orderBy("sample_rank").collect().map(_.toSeq).toSeq
    SampleStore.compactDays(spark, t, "id", Seq("d0", "d1"), "epoch:01")
    // replay (crash recovery) — the fold re-derives identical rows
    SampleStore.compactDays(spark, t, "id", Seq("d0", "d1"), "epoch:01")
    val mid = SampleStore.sampleFromStore(spark, t, "id", 10)
      .orderBy("sample_rank").collect().map(_.toSeq).toSeq
    assert(mid == before)
    // second-generation fold: the prior epoch folds again with d2
    SampleStore.compactDays(spark, t, "id", Seq("epoch:01", "d2"), "epoch:02")
    val after = SampleStore.sampleFromStore(spark, t, "id", 10)
      .orderBy("sample_rank").collect().map(_.toSeq).toSeq
    assert(after == before)
    // metadata diet: 2 live day partitions (epoch:02, d3), each ≤ k+slack
    val days = graft.sources.ManifestStore.read(spark, t)
      .groupBy(col("day")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(days.keySet == Set("epoch:02", "d3") && days.values.forall(_ <= 13L))
  }

  test("epoch fold: post-fold forgets within the epoch's slack stay exact") {
    val t = fresh()
    val df = corpus(300, 3)
    append(t, df, days = 3, k = 10, slack = 3)
    SampleStore.compactDays(spark, t, "id", Seq("d0", "d1", "d2"), "epoch:all")
    // the epoch's budget is FRESH: forget the global top-3 (all
    // necessarily inside the epoch's retained set) — still exact
    val doomed = SampleStore.sampleFromStore(spark, t, "id", 3).select(col("id"))
    val doomedIds = doomed.collect().map(_.getLong(0)).toSet
    SampleStore.forget(spark, t, "id", doomed, forgetSeq = 1L)
    val got = SampleStore.sampleFromStore(spark, t, "id", 10)
      .orderBy("sample_rank").collect().map(_.toSeq).toSeq
    val want = Sampling.weightedTopK(
        df.filter(!col("id").isin(doomedIds.toSeq: _*)), "id", col("w"), 10)
      .select(col("id"), col("sample_rank"), col("es_key"))
      .orderBy("sample_rank").collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("epoch fold refuses a day past its slack budget (breach stays accountable)") {
    val t = fresh()
    val df = corpus(120, 2)
    append(t, df, days = 2, k = 5, slack = 2)
    // forget 3 retained rows (> slack = 2) across two requests — the
    // ledger must ACCUMULATE per day, not count requests
    val d1 = SampleStore.sampleFromStore(spark, t, "id", 2).select(col("id"))
    SampleStore.forget(spark, t, "id", d1, forgetSeq = 1L)
    val d2 = SampleStore.sampleFromStore(spark, t, "id", 2).select(col("id"))
    SampleStore.forget(spark, t, "id", d2, forgetSeq = 2L)
    // 4 forgotten rows over 2 days: at least one day is past slack=2,
    // OR both days absorbed ≤ 2 — make the breach deterministic by
    // checking the ledger and folding only if a breach exists; with
    // k+slack=7 retained per day and the global top-4 doomed, the
    // pigeonhole guarantees ≥ 2 in one day... so force a clear breach:
    val d3 = SampleStore.sampleFromStore(spark, t, "id", 3).select(col("id"))
    SampleStore.forget(spark, t, "id", d3, forgetSeq = 3L)
    val perDay = graft.sources.ManifestStore.read(spark, s"$t/_forgetledger")
      .groupBy(col("day")).agg(sum(col("cnt")).as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perDay.values.exists(_ > 2L), s"fixture never breached: $perDay")
    val breached = perDay.collect { case (d, f) if f > 2L => d }.toSeq
    val err = intercept[IllegalArgumentException] {
      SampleStore.compactDays(spark, t, "id", Seq("d0", "d1"), "epoch:01")
    }
    assert(err.getMessage.contains("slack budget"))
    // the cure: re-append the breached day(s) from the surviving corpus
    // and clear their ledger — the fold is then legal and exact
    val allDoomed = (d1.collect() ++ d2.collect() ++ d3.collect())
      .map(_.getLong(0)).toSet
    val surv = df.filter(!col("id").isin(allDoomed.toSeq: _*))
    breached.foreach { d =>
      SampleStore.appendDay(spark, surv.filter(col("day") === d.drop(1).toLong),
        "id", col("w"), d, 5, 2, t)
      SampleStore.clearLedgerDay(spark, t, d)
    }
    SampleStore.compactDays(spark, t, "id", Seq("d0", "d1"), "epoch:01")
    val got = SampleStore.sampleFromStore(spark, t, "id", 5)
      .orderBy("sample_rank").collect().map(_.toSeq).toSeq
    val want = Sampling.weightedTopK(surv, "id", col("w"), 5)
      .select(col("id"), col("sample_rank"), col("es_key"))
      .orderBy("sample_rank").collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("stratified epoch fold: per-group reads bit-identical; ledger counts the stratum max") {
    val t = fresh()
    val df = (1 to 300).map(i =>
      (i.toLong, 1L + (i % 7).toLong, (i % 3).toLong, s"g${i % 2}"))
      .toDF("id", "w", "day", "grp")
    (0 until 3).foreach { d =>
      SampleStore.appendDay(spark, df.filter(col("day") === d.toLong),
        "id", col("w"), s"d$d", 10, 3, t, byCols = Seq("grp"))
    }
    val before = SampleStore.sampleFromStore(spark, t, "id", 10, byCols = Seq("grp"))
      .orderBy("grp", "sample_rank").collect().map(_.toSeq).toSeq
    SampleStore.compactDays(spark, t, "id", Seq("d0", "d1"), "epoch:01",
      byCols = Seq("grp"))
    SampleStore.compactDays(spark, t, "id", Seq("d0", "d1"), "epoch:01",
      byCols = Seq("grp")) // replay
    assert(SampleStore.sampleFromStore(spark, t, "id", 10, byCols = Seq("grp"))
      .orderBy("grp", "sample_rank").collect().map(_.toSeq).toSeq == before)
    // per-stratum retention: each live (grp, day) holds ≤ k+slack rows
    val perCell = graft.sources.ManifestStore.read(spark, t)
      .groupBy(col("grp"), col("day")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(perCell.keys.map(_._2).toSet == Set("epoch:01", "d2"))
    assert(perCell.values.forall(_ <= 13L))
    // ledger conservatism: forget 2 of g0's top + 1 of g1's top in one
    // request — the day entry records the per-stratum MAX (2), not the
    // total (3)
    val top = SampleStore.sampleFromStore(spark, t, "id", 3, byCols = Seq("grp"))
    // pinned BEFORE the forget: the lazy store read would re-evaluate
    // against the mutated table afterwards
    val doomedIds = top.filter(
        (col("grp") === "g0" && col("sample_rank") <= 2) ||
        (col("grp") === "g1" && col("sample_rank") === 1))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val doomed = doomedIds.toSeq.toDF("id")
    SampleStore.forget(spark, t, "id", doomed, forgetSeq = 1L, byCols = Seq("grp"))
    val ledger = graft.sources.ManifestStore.read(spark, s"$t/_forgetledger")
      .groupBy(col("day")).agg(sum(col("cnt")).as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ledger.values.sum <= 4L && ledger.values.forall(_ <= 2L),
      s"ledger should carry per-stratum maxima: $ledger")
    // post-forget reads stay exact per stratum (within slack everywhere)
    val got = SampleStore.sampleFromStore(spark, t, "id", 10, byCols = Seq("grp"))
      .orderBy("grp", "sample_rank").collect().map(_.toSeq).toSeq
    val want = Sampling.weightedTopKBy(
        df.filter(!col("id").isin(doomedIds.toSeq: _*)), "id", col("w"), Seq("grp"), 10)
      .select(col("grp"), col("id"), col("sample_rank"), col("es_key"))
      .orderBy("grp", "sample_rank").collect().map(_.toSeq).toSeq
    assert(got.map(_.toList) == want.map(_.toList))
  }

  test("epoch fold replay never launders budget spent on the epoch by an interleaved forget") {
    val t = fresh()
    val df = corpus(200, 2)
    append(t, df, days = 2, k = 5, slack = 2)
    SampleStore.compactDays(spark, t, "id", Seq("d0", "d1"), "epoch:01")
    // an interleaved forget spends 2 of the epoch's slack-2 budget...
    val doomed = SampleStore.sampleFromStore(spark, t, "id", 2).select(col("id"))
    val pinned = doomed.collect().map(_.getLong(0)).toSeq.toDF("id")
    SampleStore.forget(spark, t, "id", pinned, forgetSeq = 1L)
    // ...and the crash-recovery REPLAY of the fold (indistinguishable
    // from a crash between its two commits) must leave that spending
    // on the ledger — the replay re-derives the epoch from the
    // already-shrunk rows, it cannot refill the budget
    SampleStore.compactDays(spark, t, "id", Seq("d0", "d1"), "epoch:01")
    val spent = graft.sources.ManifestStore.read(spark, s"$t/_forgetledger")
      .filter(col("day") === "epoch:01")
      .agg(coalesce(sum(col("cnt")), lit(0L))).head().getLong(0)
    assert(spent == 2L, s"epoch budget spending laundered by the replay: $spent")
    // one more forget breaches the epoch's budget — the NEXT fold
    // (epoch:01 + nothing new) must refuse, proving the record is live
    val d2 = SampleStore.sampleFromStore(spark, t, "id", 1).select(col("id"))
    SampleStore.forget(spark, t, "id",
      d2.collect().map(_.getLong(0)).toSeq.toDF("id"), forgetSeq = 2L)
    val e = intercept[IllegalArgumentException] {
      SampleStore.compactDays(spark, t, "id", Seq("epoch:01"), "epoch:02")
    }
    assert(e.getMessage.contains("slack budget"))
  }

  test("epoch fold refuses mismatched strata (byCols is a store property)") {
    val t = fresh()
    val df = (1 to 200).map(i =>
      (i.toLong, 1L + (i % 7).toLong, (i % 2).toLong, s"g${i % 2}"))
      .toDF("id", "w", "day", "grp")
    (0 until 2).foreach { d =>
      SampleStore.appendDay(spark, df.filter(col("day") === d.toLong),
        "id", col("w"), s"d$d", 10, 2, t, byCols = Seq("grp"))
    }
    // folding a stratified store as a GLOBAL one would window minority
    // strata out irreversibly — refused via the schema check
    val e = intercept[IllegalArgumentException] {
      SampleStore.compactDays(spark, t, "id", Seq("d0", "d1"), "epoch:01")
    }
    assert(e.getMessage.contains("strata"))
    // the right byCols still folds
    SampleStore.compactDays(spark, t, "id", Seq("d0", "d1"), "epoch:01",
      byCols = Seq("grp"))
  }

  test("forget ledger: a replayed request (same seq) does not double-count") {
    val t = fresh()
    val df = corpus(120, 1)
    append(t, df, days = 1, k = 5, slack = 2)
    val doomed = SampleStore.sampleFromStore(spark, t, "id", 2).select(col("id"))
    val pinned = doomed.collect().map(_.getLong(0)).toSeq.toDF("id")
    SampleStore.forget(spark, t, "id", pinned, forgetSeq = 7L)
    SampleStore.forget(spark, t, "id", pinned, forgetSeq = 7L)
    val total = graft.sources.ManifestStore.read(spark, s"$t/_forgetledger")
      .agg(sum(col("cnt"))).head().getLong(0)
    assert(total == 2L)
  }

  test("appendDay and compactDays refuse epoch-namespace misuse") {
    val t = fresh()
    val df = corpus(50, 1)
    val e1 = intercept[IllegalArgumentException] {
      SampleStore.appendDay(spark, df, "id", col("w"), "epoch:x", 5, 1, t)
    }
    assert(e1.getMessage.contains("reserved"))
    append(t, df, days = 1, k = 5, slack = 1)
    val e2 = intercept[IllegalArgumentException] {
      SampleStore.compactDays(spark, t, "id", Seq("d0"), "notepoch")
    }
    assert(e2.getMessage.contains("epoch"))
    // geometry sidecar: a later append at different (k, slack) refuses
    val e3 = intercept[IllegalArgumentException] {
      SampleStore.appendDay(spark, df, "id", col("w"), "d9", 6, 1, t)
    }
    assert(e3.getMessage.contains("geometry"))
  }

  test("epoch breach cure: clearLedgerDay refuses epochs; repairEpoch re-derives and refills") {
    val t = fresh()
    val df = corpus(120, 2)
    append(t, df, days = 2, k = 5, slack = 1)
    SampleStore.compactDays(spark, t, "id", Seq("d0", "d1"), "epoch:01")
    // breach the EPOCH itself: forget 2 (> slack = 1) of its retained rows
    val doomed = SampleStore.sampleFromStore(spark, t, "id", 2).select(col("id"))
    val doomedIds = doomed.collect().map(_.getLong(0)).toSet
    SampleStore.forget(spark, t, "id", doomed, forgetSeq = 1L)
    // folding the breached epoch forward refuses (the accountability fence)
    val folded = intercept[IllegalArgumentException] {
      SampleStore.compactDays(spark, t, "id", Seq("epoch:01"), "epoch:02")
    }
    assert(folded.getMessage.contains("slack budget"))
    // the ordinary-day escape hatch refuses epochs: clearing the ledger
    // alone would launder the breach while the degraded rows keep serving
    val laundered = intercept[IllegalArgumentException] {
      SampleStore.clearLedgerDay(spark, t, "epoch:01")
    }
    assert(laundered.getMessage.contains("repairEpoch"))
    // the real cure: re-derive the epoch from the surviving corpus slice
    val surv = df.filter(!col("id").isin(doomedIds.toSeq: _*))
    SampleStore.repairEpoch(spark, surv, "id", col("w"), "epoch:01", t)
    val want = Sampling.weightedTopK(surv, "id", col("w"), 5)
      .select(col("id"), col("sample_rank"), col("es_key"))
      .orderBy("sample_rank").collect().map(_.toSeq).toSeq
    def got() = SampleStore.sampleFromStore(spark, t, "id", 5)
      .orderBy("sample_rank").collect().map(_.toSeq).toSeq
    assert(got() == want)
    // budget refilled: the epoch folds forward legally and reads unchanged
    SampleStore.compactDays(spark, t, "id", Seq("epoch:01"), "epoch:02")
    assert(got() == want)
  }

  test("repairEpoch replay (crash between replace and ledger clear) converges") {
    val t = fresh()
    val df = corpus(80, 1)
    append(t, df, days = 1, k = 4, slack = 1)
    SampleStore.compactDays(spark, t, "id", Seq("d0"), "epoch:01")
    val doomed = SampleStore.sampleFromStore(spark, t, "id", 2).select(col("id"))
    val doomedIds = doomed.collect().map(_.getLong(0)).toSet
    SampleStore.forget(spark, t, "id", doomed, forgetSeq = 7L)
    val surv = df.filter(!col("id").isin(doomedIds.toSeq: _*))
    // run the repair twice — the second is the crash-window replay
    SampleStore.repairEpoch(spark, surv, "id", col("w"), "epoch:01", t)
    SampleStore.repairEpoch(spark, surv, "id", col("w"), "epoch:01", t)
    val want = Sampling.weightedTopK(surv, "id", col("w"), 4)
      .select(col("id"), col("sample_rank"), col("es_key"))
      .orderBy("sample_rank").collect().map(_.toSeq).toSeq
    assert(SampleStore.sampleFromStore(spark, t, "id", 4)
      .orderBy("sample_rank").collect().map(_.toSeq).toSeq == want)
    // repairEpoch refuses ordinary days — that path is appendDay's
    val e = intercept[IllegalArgumentException] {
      SampleStore.repairEpoch(spark, surv, "id", col("w"), "d0", t)
    }
    assert(e.getMessage.contains("appendDay"))
  }

  test("forgetting unknown keys is a no-op") {
    val t = fresh()
    val df = corpus(50, 1)
    append(t, df, days = 1, k = 5, slack = 1)
    val before = SampleStore.sampleFromStore(spark, t, "id", 5)
      .collect().map(_.toSeq).toSeq
    SampleStore.forget(spark, t, "id", Seq(9999L).toDF("id"), forgetSeq = 1L)
    val after = SampleStore.sampleFromStore(spark, t, "id", 5)
      .collect().map(_.toSeq).toSeq
    assert(before == after)
  }
}
