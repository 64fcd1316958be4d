package graft

import org.apache.spark.sql.functions._
import scala.util.Random
import graft.ext.{ClusterStore, Dedup, Sampling, Similarity}

/** Randomized laws for the round-9 second-half operators, in the
  * AnalyticsPropertySpec tradition: each law pins an operator against
  * an independent brute-force or batch formulation on random inputs.
  */
class R9PropertySpec extends SparkSpec {
  import spark.implicits._

  test("ClusterStore: incremental over any random day split == batch components") {
    // 30 seeds × 3-day splits: wide enough to hit the cross-bucket
    // relabel collision (two clusters relabeled in ONE append where P's
    // new label bucket == Q's old label bucket — the stale delete must
    // be (id, pt)-scoped or P's fresh rows vanish; first failing seed
    // under the old id-only delete was 21) and multi-cascade appends
    for (seed <- 1 to 30) {
      val rnd = new Random(seed)
      val edges = (1 to 40)
        .map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter(p => p._1 != p._2)
        .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
        .distinct
      val days = edges.groupBy(_ => rnd.nextInt(3))
      val parts = (0 to 2).map(d => days.getOrElse(d, Seq.empty))
      val root = graft.Scratch.path(s"clprop_${seed}_${java.util.UUID.randomUUID().toString.take(8)}")
      // day 0 may legitimately be empty for some seeds — that exercises
      // the empty-first-day store path
      ClusterStore.build(spark, parts(0).toDF("id_a", "id_b"), root, 4)
      ClusterStore.appendPairs(spark, parts(1).toDF("id_a", "id_b"), root, 4)
      ClusterStore.appendPairs(spark, parts(2).toDF("id_a", "id_b"), root, 4)
      ClusterStore.appendPairs(spark, parts(2).toDF("id_a", "id_b"), root, 4) // replay
      val inc = ClusterStore.readLabels(spark, root)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = Dedup.duplicateClusters(edges.toDF("id_a", "id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(inc == batch,
        s"seed=$seed days=${parts.map(_.size).mkString(",")} " +
          s"missing=${(batch.map(_._1) -- inc.map(_._1)).toSeq.sorted.take(5)}")
    }
  }

  test("blockedEditPairs: exactly the brute-force pairs restricted to blocks") {
    val rnd = new Random(7)
    val alphabet = "abc"
    def word() = (1 to 4).map(_ => alphabet(rnd.nextInt(3))).mkString
    val rows = (1L to 40L).map(i => (i, word(), s"b${rnd.nextInt(3)}"))
    val df = rows.toDF("id", "nm", "bk")
    val got = Similarity.blockedEditPairs(df, "id", "nm", col("bk"), maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      a <- rows; b <- rows
      if a._1 < b._1 && a._3 == b._3 && lev(a._2, b._2) <= 1
    } yield (a._1, b._1)).toSet
    assert(got == want)
  }

  test("embargoSplit: total, ordered, and proportioned on random timelines") {
    for (seed <- 1 to 3) {
      val rnd = new Random(100 + seed)
      val ts = (1 to 300).map(_ => rnd.nextLong() % 1000000L)
      val out = Sampling.embargoSplit(ts.toDF("ts"), "ts", 70, 10)
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(out.length == ts.length && out.forall(_._2 != null))
      def all(s: String) = out.filter(_._2 == s).map(_._1)
      val (tr, em, te) = (all("train"), all("embargo"), all("test"))
      // time-ordered: max(train) < min(embargo ∪ test), max(embargo) < min(test)
      if (tr.nonEmpty && (em ++ te).nonEmpty) assert(tr.max < (em ++ te).min)
      if (em.nonEmpty && te.nonEmpty) assert(em.max < te.min)
      // cutoffs are range percentiles: train spans ≤ ~70% + test ≥ ~20%
      // of the value RANGE (counts can skew, positions cannot)
      val (mn, mx) = (ts.min, ts.max)
      val t1 = mn + (mx - mn) * 70 / 100
      val t2 = mn + (mx - mn) * 80 / 100
      assert(tr.forall(_ < t1) && em.forall(v => v >= t1 && v < t2) && te.forall(_ >= t2))
    }
  }
}
