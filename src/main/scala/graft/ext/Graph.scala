package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph centrality over pair lists (PageRank power
  * iteration; Page et al. 1999). The corpus-curation use: rank the
  * near-duplicate pair graph so each duplicate cluster's KEEPER is its
  * most-connected (most canonical) member, instead of the arbitrary
  * min-id x01/x26 pick — hub documents that many variants derive from
  * outrank their derivatives.
  *
  * 100 TB design:
  *  - the edge list comes from banded LSH ([[Dedup.minhashPairs]]) —
  *    never all-pairs — so |E| tracks true duplicate volume;
  *  - each iteration is ONE shuffle: messages `rank div deg` flow along
  *    edges and aggregate per destination with map-side combine (the
  *    Pregel shape expressed relationally); degree and node tables are
  *    O(V) and reused across iterations;
  *  - each round's rank table is localCheckpoint-materialized (standing
  *    invariant: iterative self-joins double the logical plan
  *    otherwise; see PLAN.md);
  *  - determinism is EXACT-INTEGER: ranks live in 1e-9 fixed-point LONG
  *    units, the damping split is integer (`85/100`), and every division
  *    is integral `div` on positive operands — floor and truncate agree
  *    there, so Spark and DuckDB produce bit-identical rank vectors at
  *    every iteration (no floating accumulation anywhere). Rank mass
  *    leaks ≤ 1 unit (1e-9) per node per division to flooring — bounded
  *    and identical on both engines.
  */
object Graph {

  private val Unit9 = 1000000000L

  /** PageRank over an undirected edge list `(srcCol, dstCol)`.
    * Reversed duplicates and repeated pairs are canonicalized away
    * internally (least/greatest + distinct), so any listing of the same
    * unordered pair set ranks identically. Returns `(idCol, deg, rank9)` for
    * every node with ≥1 edge, `rank9` in 1e-9 fixed-point units after
    * `iters` damped iterations from the uniform start.
    */
  def pagerank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      idCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, s"pagerank: iters must be >= 1, got $iters")
    // canonicalize internally: a caller passing both (a,b) and (b,a), or
    // duplicate pairs, must not silently double degrees — least/greatest
    // + distinct collapses reversed and repeated listings to one edge
    // (a no-op on already-canonical LSH pair lists, which list each
    // unordered pair exactly once with id_a < id_b)
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
    val und = canon
      .select(col("a").as("u"), col("b").as("v"))
      .unionByName(canon.select(col("b").as("u"), col("a").as("v")))
    // O(V) degree table — doubles as the node set; reused every round,
    // so materialize once (eager checkpoint, not persist — PLAN.md)
    val deg = Dedup.materialize(
      und.groupBy(col("u")).agg(count(lit(1)).as("deg")))
    val nv = deg.agg(count(lit(1)).as("nv"))
    // sender degree rides the edge list, attached once — each iteration
    // then joins ONLY the current rank table before the per-destination
    // combine (one edge-sized shuffle join + one map-side-combined
    // aggregation per round)
    val undDeg = Dedup.materialize(und.join(deg, "u"))
    var ranks = deg.join(broadcast(nv), lit(true))
      .select(col("u"), expr(s"${Unit9}L div nv").as("r"))
    ranks = Dedup.materialize(ranks)
    for (_ <- 1 to iters) {
      val msgs = undDeg
        .join(ranks, "u")
        .select(col("v"), expr("r div deg").as("__m"))
        .groupBy(col("v")).agg(sum(col("__m")).as("__s"))
      ranks = deg
        .join(msgs.withColumnRenamed("v", "u"), Seq("u"), "left")
        .join(broadcast(nv), lit(true))
        .select(col("u"),
          (expr(s"${15L * Unit9}L div (100L * nv)") +
            expr("(85L * coalesce(__s, 0L)) div 100L")).as("r"))
      ranks = Dedup.materialize(ranks)
    }
    ranks.join(deg, "u")
      .select(col("u").as(idCol), col("deg"), col("r").as("rank9"))
  }

  /** Personalized PageRank (the seed-restart variant in Page et al.
    * 1999 §6 / public RWR literature): the teleport mass returns to the
    * SEED set instead of the uniform distribution, so rank concentrates
    * in the seeds' neighborhood — the corpus-expansion read: "rank
    * everything by relatedness to this curated seed set" (grow a
    * quality domain list, expand a topic slice) without any model.
    *
    * Same exact-integer discipline and per-iteration shape as
    * [[pagerank]] (1e-9 fixed-point LONGs, integral `div`, one
    * edge-sized shuffle per round, localCheckpoint each round — ranks
    * bit-identical on both engines). Seeds outside the graph's node set
    * are ignored (they have no edges to propagate through); at least
    * one seed must survive the intersection. Non-seed mass decays
    * unless edge-delivered — nodes unreachable from the seeds rank 0.
    *
    * Output: (idCol, deg, rank9, is_seed).
    */
  def pagerankFrom(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      idCol: String,
      seeds: DataFrame,
      seedCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, s"pagerankFrom: iters must be >= 1, got $iters")
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
    val und = canon
      .select(col("a").as("u"), col("b").as("v"))
      .unionByName(canon.select(col("b").as("u"), col("a").as("v")))
    val sd = seeds.select(col(seedCol).as("u")).distinct()
    val deg = Dedup.materialize(
      und.groupBy(col("u")).agg(count(lit(1)).as("deg"))
        .join(sd.withColumn("__is_seed", lit(true)), Seq("u"), "left")
        .na.fill(false, Seq("__is_seed")))
    val ns = deg.filter(col("__is_seed")).agg(count(lit(1)).as("ns"))
    require(ns.head().getLong(0) > 0L,
      "pagerankFrom: no seed intersects the graph's node set")
    val undDeg = Dedup.materialize(und.join(deg.select(col("u"), col("deg")), "u"))
    var ranks = deg.join(broadcast(ns), lit(true))
      .select(col("u"),
        when(col("__is_seed"), expr(s"${Unit9}L div ns")).otherwise(lit(0L)).as("r"))
    ranks = Dedup.materialize(ranks)
    for (_ <- 1 to iters) {
      val msgs = undDeg
        .join(ranks, "u")
        .select(col("v"), expr("r div deg").as("__m"))
        .groupBy(col("v")).agg(sum(col("__m")).as("__s"))
      ranks = deg
        .join(msgs.withColumnRenamed("v", "u"), Seq("u"), "left")
        .join(broadcast(ns), lit(true))
        .select(col("u"),
          (when(col("__is_seed"), expr(s"${15L * Unit9}L div (100L * ns)"))
            .otherwise(lit(0L)) +
            expr("(85L * coalesce(__s, 0L)) div 100L")).as("r"))
      ranks = Dedup.materialize(ranks)
    }
    ranks.join(deg, "u")
      .select(col("u").as(idCol), col("deg"), col("r").as("rank9"),
        col("__is_seed").as("is_seed"))
  }

  /** The composition the scaladoc promises: duplicate clusters keyed by
    * their most-CENTRAL member instead of min-id. `pairs` (each
    * unordered near-dup pair once) feeds BOTH the connected-components
    * pass ([[Dedup.duplicateClusters]]) and [[pagerank]] — materialized
    * once — then one O(dup-nodes) join + a per-cluster window (cluster-
    * sized partitions) picks keeper = max by (rank9 DESC, id ASC).
    * Output: (cluster_id, n_members, keeper_id, keeper_rank9).
    */
  def centralityKeepers(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      iters: Int = 3): DataFrame = {
    val p = Dedup.materialize(
      pairs.select(col(aCol).as("id_a"), col(bCol).as("id_b")))
    val clusters = Dedup.duplicateClusters(p)
    val ranks = pagerank(p, "id_a", "id_b", "id", iters)
    val byRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label")).orderBy(col("rank9").desc, col("id"))
    val whole = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label"))
    clusters.join(ranks, "id")
      .withColumn("__rn", row_number().over(byRank))
      .withColumn("n_members", count(lit(1)).over(whole))
      .filter(col("__rn") === 1)
      .select(col("label").as("cluster_id"), col("n_members"),
        col("id").as("keeper_id"), col("rank9").as("keeper_rank9"))
  }

  /** k-core of an undirected pair graph (Seidman 1983): iteratively peel
    * every node of degree < k until none remains — the maximal subgraph
    * where every member has ≥ k neighbors. The curation read on a
    * near-dup graph: the k-core is the dense template/boilerplate family
    * mass (every member near-duplicates ≥ k others), as opposed to the
    * star/chain periphery the peel removes — the slice to inspect (or
    * down-weight) before the cheaper per-cluster keeper pass.
    *
    * Scale shape: each round is one O(E) degree aggregation (map-side
    * combined) plus two anti-joins of the edge list against the
    * O(doomed) peel set — never an all-pairs step; the edge list only
    * shrinks. Rounds are data-dependent, so the loop localCheckpoints
    * each round (standing invariant) and `require`s convergence within
    * `maxRounds` — a loud failure, not a silently-partial core. Extra
    * rounds after the fixpoint are no-ops (the peel is idempotent), so
    * an oracle may safely unroll MORE rounds than the live run needed.
    *
    * Output: (id, deg) for every k-core member, `deg` its degree INSIDE
    * the core (≥ k by construction). Empty when the graph has no k-core.
    */
  def kCorePeel(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      k: Int,
      maxRounds: Int = 8): DataFrame = {
    require(k >= 1 && maxRounds >= 1, s"kCorePeel: k=$k, maxRounds=$maxRounds")
    def degrees(e: DataFrame): DataFrame =
      e.select(col("u").as("id")).unionAll(e.select(col("v").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    var e = Dedup.materialize(
      pairs.select(least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v")).distinct())
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      round += 1
      val doomed = degrees(e).filter(col("deg") < k).select(col("id"))
      if (doomed.isEmpty) converged = true
      else e = Dedup.materialize(
        e.join(doomed.withColumnRenamed("id", "u"), Seq("u"), "left_anti")
          .join(doomed.withColumnRenamed("id", "v"), Seq("v"), "left_anti")
          .select(col("u"), col("v")))
    }
    require(converged, s"kCorePeel: no fixpoint after $maxRounds rounds — raise maxRounds")
    degrees(e)
  }

  /** Exact triangle census of an undirected pair graph — the structure
    * diagnostic of a near-dup graph (triangle-dense = template families,
    * triangle-free star = one canonical + variants; the global clustering
    * coefficient summarizes which regime the corpus is in).
    *
    * Scale design (Suri & Vassilvitskii's degree-ordered orientation):
    * each undirected edge is directed from its (degree, id)-SMALLER
    * endpoint to the larger, so every triangle is counted exactly once
    * and the wedge join's fan-out per node is its ORIENTED out-degree —
    * O(√m) on any graph, regardless of hub size (a celebrity node of
    * degree 10⁶ contributes no wedges; its edges point INTO it). Two
    * joins: oriented wedges (u→v, v→w) probe the oriented edge set for
    * the closing u→w. Degrees, wedges, and triangles are exact LONGs.
    *
    * Output: one row (n_nodes, n_edges, n_wedges, n_triangles,
    * global_cc) — global_cc = 3·triangles / wedges rounded 6 dp (0 when
    * the graph has no wedge).
    */
  def triangleStats(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    // least/greatest BEFORE distinct: a plain distinct() would keep both
    // (a,b) and (b,a) as separate rows and inflate degrees and triangles
    val e = Dedup.materialize(
      pairs.select(least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v")).distinct())
    val deg = e.select(col("u").as("id")).unionAll(e.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    // orient by (deg, id): lo -> hi
    val dU = deg.select(col("id").as("u"), col("deg").as("du"))
    val dV = deg.select(col("id").as("v"), col("deg").as("dv"))
    val oriented = Dedup.materialize(
      e.join(dU, "u").join(dV, "v")
        .select(
          when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")), col("u"))
            .otherwise(col("v")).as("s"),
          when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")), col("v"))
            .otherwise(col("u")).as("t")))
    val wedges = oriented.select(col("s"), col("t").as("w1"))
      .join(oriented.select(col("s"), col("t").as("w2")),
        Seq("s")).filter(col("w1") < col("w2"))
    val tri = wedges.join(
        oriented.select(col("s").as("w1"), col("t").as("w2")),
        Seq("w1", "w2"))
      .unionAll(wedges.join(
        oriented.select(col("t").as("w1"), col("s").as("w2")),
        Seq("w1", "w2")))
      .agg(count(lit(1)).as("n_triangles"))
    // `div`, not `/`: Spark's / on LONGs is double division — exactness
    // here is integer (both numerators are even, div truncation is exact)
    val stats = deg.agg(
      count(lit(1)).as("n_nodes"),
      expr("sum(deg) div 2").as("n_edges"),
      expr("sum((deg * (deg - 1)) div 2)").as("n_wedges"))
    stats.crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        when(col("n_wedges") === 0L, lit(0.0d))
          .otherwise(round(lit(3.0d) * col("n_triangles").cast("double") /
            col("n_wedges").cast("double"), 6)).as("global_cc"))
  }
}
