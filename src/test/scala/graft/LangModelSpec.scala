package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dsir, LangModel, Sampling}

/** LM perplexity scoring (x58), DSIR importance weights (x59), and the
  * scored top-k selection they compose with.
  */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("bigramRows emits adjacent pairs in order, drops short docs") {
    val df = Seq((1L, "the cat sat"), (2L, "one"), (3L, "")).toDF("id", "text")
    val rows = LangModel.bigramRows(df, "id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(rows.toSeq == Seq((1L, "cat", "sat"), (1L, "the", "cat")))
  }

  test("perplexityScore: hand-computed add-one bigram LM on a toy corpus") {
    // ref = "a b a b" → bigrams: (a,b)x2, (b,a)x1; c1(a)=2, c1(b)=1; V=2
    val ref = Seq((0L, "a b a b")).toDF("id", "text")
    val docs = Seq(
      (0L, "a b a b"),
      (1L, "a b"),   // one bigram: lp = ln((2+1)/(2+2)) = ln(0.75)
      (2L, "c c")    // unseen: lp = ln((0+1)/(0+2)) = ln(0.5)
    ).toDF("id", "text")
    val out = LangModel.perplexityScore(docs, ref, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val lnp = (p: Double) => math.rint(math.log(p) * 1e9) / 1e9
    assert(out(1) == ((1L, 1L, BigDecimal(lnp(0.75)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(out(2) == ((2L, 1L, BigDecimal(lnp(0.5)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // the reference doc itself: 3 bigrams ln(3/4), ln(2/3), ln(3/4)
    val exp0 = (lnp(3.0 / 4) + lnp(2.0 / 3) + lnp(3.0 / 4)) / 3.0
    assert(math.abs(out(0)._3 - exp0) < 1e-6)
  }

  test("perplexityScore: un-hinted lm join still broadcasts at fixture scale") {
    // The model join is deliberately NOT broadcast()-hinted (a hint is
    // honored regardless of size and would OOM on a huge reference
    // slice); this pins that Spark's own size estimate still picks a
    // broadcast hash join for a fixture-scale model, so dropping the
    // hint cost nothing at the scales the gates run at.
    val docs = sparkDocs()
    val out = LangModel.perplexityScore(
      docs, docs.filter(col("doc_id") % 7 === 0), "doc_id", "text")
    out.collect() // materialize so AQE's final (re-planned) join is visible
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"))
  }

  test("perplexityScore ranks reference-like docs above gibberish") {
    val docs = sparkDocs()
    val scored = LangModel.perplexityScore(
      docs, docs.filter(col("doc_id") % 7 === 0), "doc_id", "text")
    // held-in reference docs must average a (strictly) better score than
    // the corpus overall would if the LM were uninformative: compare
    // ref-slice mean vs non-ref mean
    val m = scored.withColumn("ref", col("doc_id") % 7 === 0)
      .groupBy("ref").agg(avg("avg_lp").as("m"))
      .collect().map(r => (r.getBoolean(0), r.getDouble(1))).toMap
    assert(m(true) > m(false))
  }

  test("Dsir importanceWeights: target-token docs outweigh raw-only docs") {
    // target docs say "alpha", raw-only docs say "omega"
    val docs = (0L until 20L).map { i =>
      if (i < 10) (i, "alpha alpha alpha", true) else (i, "omega omega omega", false)
    }.toDF("id", "text", "tgt")
    val w = Dsir.importanceWeights(docs, col("tgt"), "id", "text", buckets = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(w(0L) > w(10L))
    assert(w.values.toSet.size == 2) // deterministic: two distinct weights
  }

  test("scoredTopK matches a global sort and is pigeonhole-exact") {
    val df = (0L until 500L).map(i => (i, (i * 37 % 211).toDouble)).toDF("k", "sc")
    val got = Sampling.scoredTopK(df, "k", col("sc"), 25, saltBuckets = 8)
      .collect().map(r => (r.getLong(2), r.getLong(0))).sorted
    val want = (0L until 500L).map(i => (i, (i * 37 % 211).toDouble))
      .sortBy { case (k, s) => (-s, k) }.take(25)
      .zipWithIndex.map { case ((k, _), r) => (r.toLong + 1, k) }
    assert(got.toSeq == want)
  }

  test("x60 canonicalizes source pairs (source_a <= source_b)") {
    val out = graft.queries.ExtQueries.x60SourceOverlap(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getString(0) <= r.getString(1)))
  }

  test("lm store: sliced-day appends score identically to the one-shot model") {
    import graft.ext.LangModel
    val t = graft.Scratch.path(s"lmstore_${java.util.UUID.randomUUID().toString.take(8)}")
    val docs = sparkDocs().limit(60).select(col("doc_id"), col("text"))
    val ref = docs.filter(col("doc_id") % 2 === 0)
      .withColumn("day", pmod(col("doc_id"), lit(3)))
    (0 until 3).foreach { d =>
      LangModel.lmAppendDay(spark, ref.filter(col("day") === d.toLong),
        "doc_id", "text", s"d$d", t)
    }
    // replay + an empty day: both must leave the model unchanged
    LangModel.lmAppendDay(spark, ref.filter(col("day") === 2L),
      "doc_id", "text", "d2", t)
    LangModel.lmAppendDay(spark, ref.filter(col("doc_id") < 0),
      "doc_id", "text", "d9", t)
    val got = LangModel.perplexityFromStore(spark, t, docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val want = LangModel.perplexityScore(docs, ref, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("lmForget: scores equal the survivors-only model; V drops doomed-only words") {
    import graft.ext.LangModel
    val t = graft.Scratch.path(s"lmforget_${java.util.UUID.randomUUID().toString.take(8)}")
    // 'qq' and 'zz' occur ONLY in the doomed doc — after the forget they
    // must leave the vocabulary (V is net-positive words, not stored rows)
    val ref = Seq(
      (0L, "a b a b c"),
      (2L, "qq zz qq a"), // doomed
      (4L, "b c a b")).toDF("id", "text")
    val docs = ref.unionByName(Seq((1L, "a b qq"), (3L, "c a")).toDF("id", "text"))
    LangModel.lmAppendDay(spark, ref, "id", "text", "d0", t)
    val doomed = ref.filter(col("id") === 2L)
    LangModel.lmForget(spark, doomed, "id", "text", "f1", t)
    // tag replay: the day-keyed merge must REPLACE, never double-subtract
    LangModel.lmForget(spark, doomed, "id", "text", "f1", t)
    val got = LangModel.perplexityFromStore(spark, t, docs, "id", "text")
      .orderBy("id").collect().map(_.toSeq).toSeq
    val want = LangModel.perplexityScore(docs, ref.filter(col("id") =!= 2L),
      "id", "text").orderBy("id").collect().map(_.toSeq).toSeq
    assert(got == want)
    // the V path is genuinely exercised: the store still HOLDS rows for
    // the doomed-only words (positive day + negative tag), net zero
    val net = graft.sources.ManifestStore.read(spark, s"$t/uni")
      .groupBy(col("w")).agg(sum(col("cnt")).as("c"))
      .filter(col("w").isin("qq", "zz"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(net == Map("qq" -> 0L, "zz" -> 0L), s"net counts $net")
  }

  test("vocabForget: store-trained merges equal survivors-trained merges") {
    import graft.ext.Bpe
    val t = graft.Scratch.path(s"vforgetbpe_${java.util.UUID.randomUUID().toString.take(8)}")
    // the doomed doc dominates the pair stats — its erasure must change
    // the learned merges to the survivors-only ones
    val docs = Seq(
      (0L, "low lower lowest"),
      (1L, "zzzz zzzz zzzz zzzz zzzz"), // doomed: floods 'zz' pairs
      (2L, "low low newer")).toDF("id", "text")
    Bpe.vocabAppendDay(spark, docs, "id", "text", "d0", t)
    val doomed = docs.filter(col("id") === 1L)
    Bpe.vocabForget(spark, doomed, "id", "text", "f1", t)
    Bpe.vocabForget(spark, doomed, "id", "text", "f1", t) // tag replay
    val got = Bpe.learnMergesFromStore(spark, t, rounds = 2)
      .orderBy("merge_rank").collect().map(_.toSeq).toSeq
    val want = Bpe.learnMerges(docs.filter(col("id") =!= 1L), "id", "text",
      rounds = 2).orderBy("merge_rank").collect().map(_.toSeq).toSeq
    assert(got == want)
    // zero-net word: 'zzzz' rows remain (day + correction) but the read
    // excludes it — the survivors' vocabulary
    assert(Bpe.vocabFromStore(spark, t).filter(col("w") === "zzzz").count() == 0L)
    // the correction-pair privacy completion: the fold destroys the
    // (day, correction) pair and reads are unchanged
    Bpe.vocabCompact(spark, t, Seq("d0", "f1"), "epoch:01")
    val after = Bpe.learnMergesFromStore(spark, t, rounds = 2)
      .orderBy("merge_rank").collect().map(_.toSeq).toSeq
    assert(after == want)
    val days = graft.sources.ManifestStore.read(spark, t)
      .select(col("day")).distinct().collect().map(_.getString(0)).toSeq
    assert(days == Seq("epoch:01"), s"days $days")
  }

  private def sparkDocs() =
    spark.read.parquet(s"$sfDir/documents.parquet")
}
