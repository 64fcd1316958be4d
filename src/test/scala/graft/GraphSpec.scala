package graft

import org.apache.spark.sql.functions._
import graft.ext.Graph

/** Fixed-point PageRank over pair graphs (x85). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // star graph: hub 0 — leaves 1, 2, 3. Hand-unrolled 3 iterations of the
  // integer recurrence r' = 15e9 div (100·4) + (85·Σ(r div deg)) div 100:
  //   r0 = 250000000 for all
  //   r1: hub 675000000, leaf 108333333
  //   r2: hub 313749999, leaf 228750000
  //   r3: hub 620812500, leaf 126395833
  private val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")

  test("pagerank: hand-computed fixed-point ranks on a star graph") {
    val out = Graph.pagerank(star, "a", "b", "id", iters = 3)
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 3L, 620812500L), (1L, 1L, 126395833L),
        (2L, 1L, 126395833L), (3L, 1L, 126395833L)))
  }

  test("pagerank: invariant under input partitioning") {
    val a = Graph.pagerank(star, "a", "b", "id", iters = 3)
      .orderBy("id").collect().toSeq
    val b = Graph.pagerank(star.repartition(7), "a", "b", "id", iters = 3)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("pagerank: rank mass is conserved up to bounded floor leakage") {
    // each of the |V| nodes floors twice per round (its outgoing div and
    // the damped recombination), so after k rounds total mass sits within
    // k·2·|V| + |V| units below the initial |V|·(UNIT div |V|) ≤ UNIT
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("a", "b")
    val total = Graph.pagerank(edges, "a", "b", "id", iters = 3)
      .agg(sum(col("rank9"))).head.getLong(0)
    assert(total <= 1000000000L)
    assert(total > 1000000000L - 4L * (3 * 2 + 1))
  }

  test("centralityKeepers: keeper is the most-central member, min-id on ties") {
    // star {0;1,2,3} + pair {20,21}: cluster 0's keeper is the hub (rank
    // dominates), cluster 20's keeper falls back to min id (equal ranks)
    val edges = Seq((1L, 0L), (0L, 2L), (0L, 3L), (21L, 20L)).toDF("a", "b")
    val out = Graph.centralityKeepers(edges, "a", "b", iters = 3)
      .orderBy("cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((0L, 4L, 0L), (20L, 2L, 20L)))
  }

  test("pagerank: a hub outranks regular-component members") {
    // {10..13} a star on hub 10, {20,21} a pair. Within a REGULAR
    // component PageRank stays uniform (a 2-cycle just swaps mass), so
    // the pair holds its initial share — but the star's hub concentrates
    // its satellites' mass and must outrank both them and the pair.
    val edges = Seq((10L, 11L), (10L, 12L), (10L, 13L), (20L, 21L))
      .toDF("a", "b")
    val r = Graph.pagerank(edges, "a", "b", "id", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r(10L) > r(20L) && r(20L) > r(11L))
    assert(Seq(11L, 12L, 13L).map(r).distinct.size == 1) // leaf symmetry
  }

  test("pagerankFrom: rank concentrates at and around the seeds; unreachable nodes rank 0") {
    // path 1-2-3 seeded at 1; disconnected pair 10-11 unseeded
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val seeds = Seq(Tuple1(1L)).toDF("id")
    val r = Graph.pagerankFrom(edges, "a", "b", "id", seeds, "id", iters = 3)
      .collect().map(x => x.getLong(0) -> (x.getLong(2), x.getBoolean(3))).toMap
    assert(r(1L)._2 && !r(2L)._2)
    assert(r(10L)._1 == 0L && r(11L)._1 == 0L) // unreachable from seeds
    assert(r(1L)._1 > 0L && r(2L)._1 > 0L && r(3L)._1 > 0L)
    assert(r(1L)._1 > r(3L)._1) // seed outranks the far end of the path
  }

  test("pagerankFrom: hand-computed 1-iteration ranks on a seeded pair") {
    // nodes {1,2}, edge 1-2, seed {1}: r0 = (1e9, 0); after one round
    // r(1) = 0.15e9 + 0, r(2) = 0 + 85% of 1e9 = 0.85e9 (integer div)
    val edges = Seq((1L, 2L)).toDF("a", "b")
    val seeds = Seq(Tuple1(1L)).toDF("id")
    val r = Graph.pagerankFrom(edges, "a", "b", "id", seeds, "id", iters = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r == Map(1L -> 150000000L, 2L -> 850000000L))
    // seeds outside the node set are ignored; all-outside refuses loudly
    intercept[IllegalArgumentException] {
      Graph.pagerankFrom(edges, "a", "b", "id",
        Seq(Tuple1(99L)).toDF("id"), "id", iters = 1)
    }
  }

  test("kCorePeel: cascading peel reaches the triangle core") {
    // triangle {1,2,3} + tail 3-4-5: round 1 peels 5 (deg 1), round 2
    // peels the now-exposed 4 — the cascade a single-pass filter misses
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val out = Graph.kCorePeel(edges, "a", "b", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("kCorePeel: fixpoint law — every member keeps >= k core-internal neighbors") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (4L, 6L), (5L, 6L), (6L, 7L), (10L, 11L)).toDF("a", "b")
    val out = Graph.kCorePeel(edges, "a", "b", k = 2).collect()
    assert(out.nonEmpty && out.forall(_.getLong(1) >= 2L))
    // reversed/duplicate listings canonicalize to the same core
    val doubled = edges.unionAll(edges.select(col("b").as("a"), col("a").as("b")))
    val out2 = Graph.kCorePeel(doubled, "a", "b", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out2 == out.map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("kCorePeel: a graph with no k-core peels to empty, still converges") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    assert(Graph.kCorePeel(chain, "a", "b", k = 2).isEmpty)
  }
}
