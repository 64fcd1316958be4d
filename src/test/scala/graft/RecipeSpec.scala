package graft

import org.apache.spark.sql.functions._
import graft.ext.{Sampling, Similarity}

/** Mixture recipe planning (x61) and SRP-LSH embedding near-dup (x62). */
class RecipeSpec extends SparkSpec {
  import spark.implicits._

  test("mixturePlan: exact allocation arithmetic on a toy corpus") {
    val df = Seq(
      ("a", 100L), ("a", 100L),     // a: 200 toks
      ("b", 10000L), ("b", 10000L), // b: 20000 toks
      ("c", 0L)                     // c: empty
    ).toDF("source", "n_chars")
    val out = Sampling.mixturePlan(df, "source", "n_chars", 1000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).sortBy(_._1)
    val wA = math.floor(math.sqrt(200.0) * 1000).toLong    // 14142
    val wB = math.floor(math.sqrt(20000.0) * 1000).toLong  // 141421
    val tw = wA + wB
    val (allocA, allocB) = (1000L * wA / tw, 1000L * wB / tw)
    assert(out(0) == (("a", 2L, 200L, allocA, (allocA + 199) / 200,
      math.rint(allocA.toDouble / 200.0 * 1e6) / 1e6)))
    assert(out(1) == (("b", 2L, 20000L, allocB, (allocB + 19999) / 20000,
      math.rint(allocB.toDouble / 20000.0 * 1e6) / 1e6)))
    assert(out(2) == (("c", 1L, 0L, 0L, 0L, 0.0)))
    // budget is respected up to per-source floor loss
    assert(allocA + allocB <= 1000L)
  }

  test("mixturePlan upsamples scarce sources (epochs > 1)") {
    val df = Seq.tabulate(100)(i => ("big", 1000L)) :+ (("rare", 50L))
    val out = Sampling.mixturePlan(df.toDF("source", "n_chars"), "source", "n_chars", 60000L)
      .collect().map(r => (r.getString(0), r.getLong(4))).toMap
    assert(out("rare") > 1L)  // α=0.5 gives the rare source more than its inventory
    assert(out("big") == 1L)
  }

  test("srpPlanes are deterministic, bounded, and md5-derived") {
    val p1 = Similarity.srpPlanes(4, 8)
    val p2 = Similarity.srpPlanes(4, 8)
    assert(p1.map(_.toSeq).toSeq == p2.map(_.toSeq).toSeq)
    assert(p1.flatten.forall(v => v >= -1.0 && v < 1.0))
    // independent recomputation of plane 0, component 1
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("srp_0_1".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val h48 = java.lang.Long.parseLong(hex.substring(0, 12), 16)
    assert(p1(0)(0) == 2.0 * ((h48 + 0.5) / 281474976710656.0) - 1.0)
  }

  test("srpNearDupPairs is a subset of exact pairs and id-ordered") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val got = Similarity.srpNearDupPairs(emb, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty)
    got.foreach { case (a, b) => assert(a < b) }
    // exact all-pairs ≥ 0.4 (brute force on the 500-row fixture)
    val v = emb.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("ve"))
      .withColumn("n", Similarity.norm(col("ve")))
    val exact = v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .withColumn("cos", Similarity.cosine(
        col("a.ve"), col("b.ve"), col("a.n"), col("b.n")))
      .filter(col("cos") >= 0.4)
      .select(col("a.id"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact))
    // banded recall at cos≈0.4 with 8×6 bands is ~0.4 analytically
    // (1−(1−(1−arccos(c)/π)^6)^8); assert the fixture lands in range
    assert(got.size * 3 >= exact.size)
  }

  test("srpNearDupPairs plans a bucket equi-join, never a cartesian") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val plan = Similarity.srpNearDupPairs(emb, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("srpAutoBits encodes the ~8-per-bucket sizing law") {
    assert(Similarity.srpAutoBits(500) == 6)   // the fixture pin
    assert(Similarity.srpAutoBits(5000) == 10) // 10× corpus → wider keys
    assert(Similarity.srpAutoBits(1L << 30) == 27)
    assert(Similarity.srpAutoBits(1) == 4)     // lower clamp
    assert(Similarity.srpAutoBits(Long.MaxValue) == 48) // upper clamp
  }

  test("srpNearDupPairs auto-sizes band keys at a staged 10x corpus") {
    // 10 shifted replicas of the fixture = 5000 vectors: the un-pinned
    // default must resolve to srpAutoBits(5000) = 10 bits, not the
    // fixture's 6 — same result as passing 10 explicitly, different
    // (coarser-bucket) result than 6 would give.
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val staged = (0 until 10).map(k =>
      emb.select((col("vec_id") + lit(k * 1000000L)).as("vec_id"),
        col("embedding"))).reduce(_ union _)
    val auto = Similarity.srpNearDupPairs(staged, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pinned = Similarity.srpNearDupPairs(staged, "vec_id", "embedding",
        bands = 8, bitsPerBand = Similarity.srpAutoBits(5000))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto == pinned)
    assert(auto.nonEmpty)
  }

  test("srpNearDupPairs drops zero-norm vectors instead of NaN pairs") {
    // two zero vectors collide in EVERY bucket (sign(0) >= 0 sets all
    // bits); their cosine is 0/0 = NaN, and NaN >= threshold is TRUE
    // under Spark's NaN ordering — the up-front nrm > 0 guard must keep
    // them out of the pair set entirely.
    val dim = 4
    val rows = Seq(
      (1L, Array.fill(dim)(1.0f)), (2L, Array.fill(dim)(1.0f)),
      (90L, Array.fill(dim)(0.0f)), (91L, Array.fill(dim)(0.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.srpNearDupPairs(df, "vec_id", "embedding",
        bands = 2, bitsPerBand = 4, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 1.0d)))
    got.foreach(r => assert(!r._3.isNaN))
  }

  test("robustOutlierStats: hand-computed median/MAD and outlier count") {
    // values 10,12,14,16,1000 → median 14 (rank floor(.5*4)+1 = 3),
    // deviations 4,2,0,2,986 → MAD 2; outliers: |v-14| > 6 → just 1000
    val df = Seq(10L, 12L, 14L, 16L, 1000L).map(("s", _)).toDF("source", "n_chars")
    val out = graft.ext.Quantiles.robustOutlierStats(df, Seq("source"), "n_chars", 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(("s", 5L, 14L, 2L, 1L)))
  }

  test("x63 embedding funnel: buckets partition the survivors") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val total = emb.count()
    val pairs = Similarity.srpNearDupPairs(emb, "vec_id", "embedding")
    val dropped = pairs.select("id_b").distinct().count()
    val out = graft.queries.ExtQueries.x63EmbeddingFunnel(spark, sfDir).collect()
    assert(out.map(_.getLong(1)).sum == total - dropped)
    out.foreach(r => assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 0.01))
  }
}
