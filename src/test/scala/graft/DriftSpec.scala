package graft

import org.apache.spark.sql.functions._

import graft.ext.{Drift, TextAnalysis}

/** Distribution drift (x77), vocab coverage (x78), embedding drift (x79). */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("jsDivergence is 0 against itself and ln 2 on disjoint supports") {
    val a = Seq(("g", 1L), ("g", 2L), ("g", 3L)).toDF("source", "v")
    assert(Drift.jsDivergence(a, a, "source", "v", bins = 4)
      .collect().map(r => (r.getString(0), r.getDouble(3))).toSeq == Seq(("g", 0.0)))
    // a lives entirely in the low bin, b entirely in the high bin
    val lo = Seq(("g", 0L), ("g", 1L)).toDF("source", "v")
    val hi = Seq(("g", 100L), ("g", 101L)).toDF("source", "v")
    val js = Drift.jsDivergence(lo, hi, "source", "v", bins = 2)
      .collect().head.getDouble(3)
    assert(js == math.rint(math.log(2) * 1e6) / 1e6) // 0.693147
  }

  test("jsDivergence omits groups present in only one slice") {
    val a = Seq(("both", 1L), ("only_a", 1L)).toDF("source", "v")
    val b = Seq(("both", 2L), ("only_b", 2L)).toDF("source", "v")
    val got = Drift.jsDivergence(a, b, "source", "v", bins = 4)
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("both"))
  }

  test("embeddingDrift: identical means 1.0, opposed means -1.0") {
    val a = Seq(("same", Array(1.0f, 0.0f)), ("flip", Array(1.0f, 0.0f)))
      .toDF("label", "embedding")
    val b = Seq(("same", Array(2.0f, 0.0f)), ("flip", Array(-1.0f, 0.0f)))
      .toDF("label", "embedding")
    val got = Drift.embeddingDrift(a, b, "label", "embedding")
      .collect().map(r => (r.getString(0), r.getDouble(3))).toMap
    assert(got == Map("same" -> 1.0, "flip" -> -1.0))
  }

  test("vocabCoverage matches hand counts on a toy corpus") {
    val df = Seq((1L, "a a a b"), (2L, "b c")).toDF("id", "text")
    // counts: a=3, b=2, c=1; total 6; ranks a,b,c
    val got = TextAnalysis.vocabCoverage(df, "id", "text", Seq(1, 2, 3))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1, 3L, 6L, 0.5), (2, 3L, 6L, math.rint(5.0 / 6 * 1e6) / 1e6), (3, 3L, 6L, 1.0)))
  }

  test("hashSplit is deterministic, growth-stable, and ratio-plausible") {
    import graft.ext.Sampling
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bounds = Seq(("train", 52429), ("val", 58982))
    val full = Sampling.hashSplit(docs, "doc_id", bounds, "test")
      .select(col("doc_id"), col("split"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    // growth stability: the split of a doc is a pure function of its id
    // — computing on a subset assigns the same labels
    val sub = Sampling.hashSplit(docs.filter(col("doc_id") < 100), "doc_id",
        bounds, "test")
      .select(col("doc_id"), col("split"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    sub.foreach { case (id, s) => assert(full(id) == s) }
    // ratio plausibility on 500 docs: train well clear of val+test
    val byLabel = full.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byLabel("train") > 300 && byLabel("train") < 480)
    assert(byLabel.keySet == Set("train", "val", "test"))
    // bounds must ascend
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(docs, "doc_id", Seq(("a", 10), ("b", 5)), "c")
    }
  }

  test("ksMatrix: hand-computed D, identical groups score 0, disjoint score 1") {
    // A = {1, 2, 3, 4}, B = {3, 4, 5, 6}: max CDF gap is at v=2
    // (F_A = 0.5, F_B = 0) → D = 0.5. C duplicates A exactly → D = 0.
    // E = {100} is disjoint from A → D = 1 at v=4. Group pairs order
    // lexicographically; nulls drop.
    val df = (
      Seq(1L, 2L, 3L, 4L).map(("a", _)) ++
      Seq(3L, 4L, 5L, 6L).map(("b", _)) ++
      Seq(1L, 2L, 3L, 4L).map(("c", _)) ++
      Seq(100L).map(("e", _)) :+
      (null.asInstanceOf[String], 7L)
    ).toDF("g", "v")
    val got = Drift.ksMatrix(df, "g", "v")
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet == Set(("a", "b"), ("a", "c"), ("a", "e"),
      ("b", "c"), ("b", "e"), ("c", "e")))
    assert(got(("a", "b")) == ((4L, 4L, 0.5)))
    assert(got(("a", "c")) == ((4L, 4L, 0.0)))
    assert(got(("a", "e")) == ((4L, 1L, 1.0)))
    assert(got(("b", "e")) == ((4L, 1L, 1.0)))
    assert(got(("b", "c"))._3 == 0.5)
  }

  test("ksTwoSample: hand-computed per-group D; one-slice groups drop") {
    // group g: a = {1, 2, 3, 4}, b = {3, 4, 5, 6} → D = 0.5 (at v = 2).
    // group h: identical slices → D = 0. group z: only in a → dropped.
    val a = Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 4L),
      ("h", 7L), ("h", 8L), ("z", 1L)).toDF("t", "v")
    val b = Seq(("g", 3L), ("g", 4L), ("g", 5L), ("g", 6L),
      ("h", 7L), ("h", 8L)).toDF("t", "v")
    val got = Drift.ksTwoSample(a, b, "t", "v")
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == Set("g", "h"))
    assert(got("g") == ((4L, 4L, 0.5)))
    assert(got("h") == ((2L, 2L, 0.0)))
    // values present only on side b still contribute CDF steps: a's F
    // is flat at 1.0 over b's tail {5, 6} while b's is still climbing
    val a2 = Seq(("g", 1L)).toDF("t", "v")
    val b2 = Seq(("g", 2L), ("g", 3L)).toDF("t", "v")
    assert(Drift.ksTwoSample(a2, b2, "t", "v")
      .head().getDouble(3) == 1.0) // at v=1: F_a=1, F_b=0
  }

  test("ksMatrix law: 10 random seeds match an in-memory brute-force reference") {
    for (seed <- 0 until 10) {
      val rnd = new scala.util.Random(seed)
      val groups = Seq("g0", "g1", "g2")
      val rows = (0 until 120).map { _ =>
        (groups(rnd.nextInt(3)), rnd.nextInt(12).toLong)
      }
      val got = Drift.ksMatrix(rows.toDF("g", "v"), "g", "v")
        .collect()
        .map(r => ((r.getString(0), r.getString(1)), r.getDouble(4))).toMap
      // brute-force reference: D = max over pooled values of |F_a - F_b|
      val by = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val pooled = rows.map(_._2).distinct.sorted
      for {
        a <- groups; b <- groups if a < b
      } {
        val (xa, xb) = (by.getOrElse(a, Nil), by.getOrElse(b, Nil))
        if (xa.nonEmpty && xb.nonEmpty) {
          val d = pooled.map { v =>
            math.abs(xa.count(_ <= v).toDouble / xa.size -
              xb.count(_ <= v).toDouble / xb.size)
          }.max
          val want = math.rint(d * 1e6) / 1e6
          assert(got((a, b)) == want, s"seed=$seed pair=($a,$b)")
        }
      }
    }
  }

  test("ksMatrixFromCounts on pre-aggregated cells equals ksMatrix on raw rows") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 150).map { _ =>
      (Seq("a", "b", "c")(rnd.nextInt(3)), rnd.nextInt(9).toLong)
    }
    val raw = rows.toDF("g", "v")
    def keyOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val want = keyOf(Drift.ksMatrix(raw, "g", "v"))
    val cells = raw.groupBy(col("g"), col("v")).count()
    assert(keyOf(Drift.ksMatrixFromCounts(cells, "g", "v", "count")) == want)
    // duplicate (g, v) cell rows (a store mid-compaction) still SUM
    val split = cells
      .withColumn("count",
        col("count") - when(col("count") > 1L, 1L).otherwise(0L))
      .unionByName(cells.filter(col("count") > 1L)
        .withColumn("count", lit(1L)))
      .filter(col("count") > 0L)
    assert(keyOf(Drift.ksMatrixFromCounts(split, "g", "v", "count")) == want)
  }

  test("coverage is monotone in k on the fixture corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val got = TextAnalysis.vocabCoverage(docs, "doc_id", "text", Seq(5, 10, 20))
      .collect().map(r => (r.getInt(0), r.getDouble(3))).sortBy(_._1)
    assert(got.length == 3)
    assert(got.sliding(2).forall(p => p(0)._2 <= p(1)._2))
    assert(got.forall(r => r._2 > 0.0 && r._2 <= 1.0))
  }
}
