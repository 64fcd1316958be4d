package graft

import org.apache.spark.sql.functions._
import graft.ext.EmbedPost

/** All-but-the-top embedding post-processing (x197): the laws the gate
  * fixture can't pin — planted-direction recovery, removeTop
  * orthogonality, partitioning-invariance, degenerate input.
  */
class EmbedPostSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  // deterministic pseudo-noise in [-0.05, 0.05) from (id, pos) — no RNG
  private def noise(i: Int, p: Int): Double =
    (((i * 31 + p * 17 + 7) % 100) - 50) / 1000.0

  // planted dominant direction u = (1, 1, 0, ..., 0)/sqrt(2) with
  // per-row magnitude a_i in [-2, 2], plus bounded noise: the top
  // eigenvector of the centered Gram is u up to noise
  private def planted(n: Int) = {
    val s = math.sqrt(0.5)
    (1 to n).map { i =>
      val a = ((i % 9) - 4).toDouble / 2.0
      (i.toLong, (0 until dim).map(p =>
        (if (p < 2) (a * s).toFloat else 0f) + noise(i, p).toFloat).toArray)
    }.toDF("id", "vec")
  }

  test("topDirection recovers a planted dominant direction") {
    val df = planted(200)
    val cent = EmbedPost.centered(df, "id", "vec", dim)
    val x = EmbedPost.topDirection(spark, cent, dim, iters = 4)
    val xn = x.map(_.toDouble)
    val u = Array.fill(dim)(0.0); u(0) = math.sqrt(0.5); u(1) = math.sqrt(0.5)
    val cos = math.abs(xn.zip(u).map { case (a, b) => a * b }.sum) /
      math.sqrt(xn.map(v => v * v).sum)
    assert(cos > 0.98, s"cosine(topDirection, planted)=$cos")
  }

  test("dominantProjection is invariant to input partitioning") {
    val df = planted(120)
    val a = EmbedPost.dominantProjection(spark, df, "id", "vec", dim)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val b = EmbedPost.dominantProjection(spark, df.repartition(7), "id", "vec", dim)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("removeTop output is orthogonal to the removed direction") {
    val df = planted(150)
    val cent = EmbedPost.centered(df, "id", "vec", dim)
    val u = EmbedPost.topDirection(spark, cent, dim, iters = 4).map(_.toDouble)
    val out = EmbedPost.removeTop(spark, df, "id", "vec", dim, iters = 4)
      .collect()
    assert(out.length == 150)
    out.foreach { r =>
      val e = r.getSeq[Double](1)
      assert(e.length == dim)
      val dot = e.zip(u).map { case (a, b) => a * b }.sum
      val scalefree = math.abs(dot) / math.sqrt(u.map(v => v * v).sum)
      assert(scalefree < 1e-6, s"residual projection $scalefree for id ${r.getLong(0)}")
    }
  }

  test("moment store: sliced-day appends merge to batch moments bit-for-bit") {
    val t = graft.Scratch.path(s"momstore_${java.util.UUID.randomUUID().toString.take(8)}")
    val df = planted(90).withColumn("day", pmod(col("id"), lit(3)))
    (0 until 3).foreach { d =>
      EmbedPost.momentsAppendDay(spark, df.filter(col("day") === d.toLong),
        "vec", dim, s"d$d", t)
    }
    // replay day 2: day-keyed merge must replace, not duplicate
    EmbedPost.momentsAppendDay(spark, df.filter(col("day") === 2L),
      "vec", dim, "d2", t)
    val (bm1, bm2) = EmbedPost.batchMoments(df, "vec", dim)
    val sm1 = graft.sources.ManifestStore.read(spark, t + "/m1")
      .groupBy(col("pos")).agg(sum(col("sv")).as("sv"), sum(col("n")).as("n"))
    val sm2 = graft.sources.ManifestStore.read(spark, t + "/m2")
      .groupBy(col("i"), col("j")).agg(sum(col("svv")).as("svv"))
    assert(sm1.orderBy("pos").collect().map(_.toSeq).toSeq ==
      bm1.orderBy("pos").collect().map(_.toSeq).toSeq)
    assert(sm2.orderBy("i", "j").collect().map(_.toSeq).toSeq ==
      bm2.orderBy("i", "j").collect().map(_.toSeq).toSeq)
  }

  test("directionFromMoments recovers the planted direction, corpus-free") {
    val t = graft.Scratch.path(s"momdir_${java.util.UUID.randomUUID().toString.take(8)}")
    val df = planted(200).withColumn("day", pmod(col("id"), lit(2)))
    (0 until 2).foreach { d =>
      EmbedPost.momentsAppendDay(spark, df.filter(col("day") === d.toLong),
        "vec", dim, s"d$d", t)
    }
    val x = EmbedPost.directionFromMoments(spark, t, dim, iters = 4)
    val xn = x.map(_.toDouble)
    val u = Array.fill(dim)(0.0); u(0) = math.sqrt(0.5); u(1) = math.sqrt(0.5)
    val cos = math.abs(xn.zip(u).map { case (a, b) => a * b }.sum) /
      math.sqrt(xn.map(v => v * v).sum)
    assert(cos > 0.98, s"cosine(storeDirection, planted)=$cos")
  }

  test("momentsForget: store minus doomed equals batch moments over survivors") {
    val t = graft.Scratch.path(s"momforget_${java.util.UUID.randomUUID().toString.take(8)}")
    val df = planted(120).withColumn("day", pmod(col("id"), lit(2)))
    (0 until 2).foreach { d =>
      EmbedPost.momentsAppendDay(spark, df.filter(col("day") === d.toLong),
        "vec", dim, s"d$d", t)
    }
    val doomed = df.filter(col("id") % 5 === 0)
    EmbedPost.momentsForget(spark, doomed, "vec", dim, "f1", t)
    // re-issued forget (same tag) replaces — no double subtraction
    EmbedPost.momentsForget(spark, doomed, "vec", dim, "f1", t)
    // empty forget is a no-op
    EmbedPost.momentsForget(spark, df.filter(col("id") < 0), "vec", dim, "f2", t)
    val (bm1, bm2) = EmbedPost.batchMoments(
      df.filter(col("id") % 5 =!= 0), "vec", dim)
    val sm1 = graft.sources.ManifestStore.read(spark, t + "/m1")
      .groupBy(col("pos")).agg(sum(col("sv")).as("sv"), sum(col("n")).as("n"))
    val sm2 = graft.sources.ManifestStore.read(spark, t + "/m2")
      .groupBy(col("i"), col("j")).agg(sum(col("svv")).as("svv"))
    assert(sm1.orderBy("pos").collect().map(_.toSeq).toSeq ==
      bm1.orderBy("pos").collect().map(_.toSeq).toSeq)
    // m2 cells that cancel to zero still hold a 0 row in the store —
    // compare with zero-filled batch cells
    val smap = sm2.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val bmap = bm2.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    (smap.keySet ++ bmap.keySet).foreach { k =>
      assert(smap.getOrElse(k, 0L) == bmap.getOrElse(k, 0L), s"cell $k")
    }
  }

  test("empty-day appends are no-ops; a never-fed store fails loudly") {
    val t = graft.Scratch.path(s"momempty_${java.util.UUID.randomUUID().toString.take(8)}")
    // empty day: no-op — must not create a poisoned no-partition table
    EmbedPost.momentsAppendDay(spark,
      planted(5).filter(col("id") < 0), "vec", dim, "d0", t)
    intercept[java.io.FileNotFoundException] {
      EmbedPost.directionFromMoments(spark, t, dim)
    }
    // a real day after the empty one works normally
    EmbedPost.momentsAppendDay(spark, planted(50), "vec", dim, "d1", t)
    assert(EmbedPost.directionFromMoments(spark, t, dim).length == dim)
  }

  test("projectFromStore: held-out scores track the planted magnitudes") {
    val t = graft.Scratch.path(s"momproj_${java.util.UUID.randomUUID().toString.take(8)}")
    val df = planted(240)
    val train = df.filter(col("id") % 2 === 0)
      .withColumn("day", pmod(col("id"), lit(4)))
    (0 until 4).foreach { d =>
      EmbedPost.momentsAppendDay(spark, train.filter(col("day") === d.toLong),
        "vec", dim, s"d$d", t)
    }
    val held = df.filter(col("id") % 2 === 1)
    val out = EmbedPost.projectFromStore(spark, t, held, "id", "vec", dim)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == held.count())
    // planted magnitude a_i = ((i % 9) - 4)/2 along u: |proj| must rank
    // with |a| — check the extreme groups separate cleanly
    def a(i: Long) = ((i % 9) - 4).toDouble / 2.0
    val big = out.filter { case (i, _) => math.abs(a(i)) >= 1.5 }.values.map(math.abs(_)).min
    val zero = out.filter { case (i, _) => a(i) == 0.0 }.values.map(math.abs(_)).max
    assert(big > 3 * zero, s"planted-magnitude separation: big=$big zero=$zero")
    // and signs follow a's sign consistently (up to one global flip)
    val signs = out.collect { case (i, p) if math.abs(a(i)) >= 1.5 =>
      math.signum(a(i)).toLong * math.signum(p) }
    assert(signs.toSet.size == 1, "projections must align with the planted axis")
  }

  test("centered: the per-position mean joins back as a broadcast, never a shuffle join") {
    val df = planted(200)
    val plan = EmbedPost.centered(df, "id", "vec", dim)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the O(dim) mean table must broadcast onto the exploded rows:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a corpus shuffle join on pos defeats the one-pass centering:\n$plan")
  }

  test("degenerate input (all rows identical) yields zero projections, no crash") {
    val df = (1 to 20).map(i =>
      (i.toLong, Array.fill(dim)(0.25f))).toDF("id", "vec")
    val out = EmbedPost.dominantProjection(spark, df, "id", "vec", dim)
      .collect()
    assert(out.length == 20 && out.forall(_.getLong(1) == 0L))
  }
}
