package graft

import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Dedup operators: shingles, MinHash/LSH recall, SimHash, exact paths. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near-dup of 1
    (3L, "completely different text with nothing shared whatsoever here friends"),
    (4L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 1
    (5L, "short doc"))
    .toDF("doc_id", "text")

  test("shingleRows matches wordShingles (relational vs HOF formulation)") {
    for (n <- Seq(1, 2, 3)) {
      val rel = Dedup.shingleRows(docs, "doc_id", "text", n)
        .groupBy("id").agg(sort_array(collect_list(col("s"))).as("sh"))
      val hof = docs.select(col("doc_id").as("id"),
        sort_array(Dedup.wordShingles(col("text"), n)).as("sh"))
        .filter(size(col("sh")) > 0)
      assert(sortedRows(rel) == sortedRows(hof), s"n=$n")
    }
  }

  test("shingleRows: docs shorter than n yield no rows") {
    val sh = Dedup.shingleRows(docs, "doc_id", "text", 3)
    assert(!sh.select("id").as[Long].collect().contains(5L) ||
      sh.filter(col("id") === 5L).count() == 0)
    val sh5 = Dedup.shingleRows(Seq((9L, "one two")).toDF("doc_id", "text"), "doc_id", "text", 3)
    assert(sh5.count() == 0)
  }

  test("exact dedup keeps deterministic keeper") {
    val out = Dedup.exact(docs, Seq("text"), col("doc_id"))
    assert(out.count() == 4)
    assert(out.filter(col("text").contains("today")).select("doc_id").as[Long].collect().toSeq == Seq(1L))
    val clusters = Dedup.exactClusters(docs, col("text"), col("doc_id"))
    assert(clusters.filter(col("dup_count") === 2).select("keeper_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("minhash pairs finds near+exact dups, not unrelated docs") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", shingleN = 2,
      bands = 16, rowsPerBand = 2, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L))) // exact dup, jaccard 1.0
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 4L))) // near dups
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash agrees with exact ngram jaccard on the fixture") {
    val fix = spark.read.parquet(s"$sfDir/documents.parquet")
    val mh = Dedup.minhashPairs(fix, "doc_id", "text", shingleN = 3, threshold = 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.ngramJaccardPairs(fix, "doc_id", "text", 3, 0.7, 1000000L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(mh == exact)
  }

  test("incremental minhash probes history with cross pairs only") {
    // increment = docs 2 and 5; history = 1, 3, 4 — near-dup 2~1/2~4 must
    // surface as cross pairs; 1~4 (both history) and nothing-shared 3 must not
    val inc = docs.filter(col("doc_id").isin(2L, 5L))
    val hist = docs.filter(!col("doc_id").isin(2L, 5L))
    val pairs = Dedup.minhashPairsAgainst(inc, hist, "doc_id", "text",
      shingleN = 2, bands = 16, rowsPerBand = 2, threshold = 0.5)
      .select("inc_id", "hist_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((2L, 1L)) && pairs.contains((2L, 4L)))
    assert(pairs.forall(_._1 == 2L), s"only increment ids on the left: $pairs")
    assert(!pairs.exists(p => p._2 == 3L))
  }

  test("incremental minhash agrees with exact cross-pair jaccard on the fixture") {
    val fix = spark.read.parquet(s"$sfDir/documents.parquet")
    val inc = fix.filter(col("doc_id") % 5 === 0)
    val hist = fix.filter(col("doc_id") % 5 =!= 0)
    val mh = Dedup.minhashPairsAgainst(inc, hist, "doc_id", "text", 3, 32, 2, 0.7)
      .select("inc_id", "hist_id").as[(Long, Long)].collect().toSet
    // exact reference: all-pairs jaccard restricted to cross pairs
    val exact = Dedup.ngramJaccardPairs(fix, "doc_id", "text", 3, 0.7, 1000000L)
      .select("id_a", "id_b").as[(Long, Long)].collect()
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (a, b) => a % 5 == 0 && b % 5 != 0 }
      .toSet
    assert(mh == exact)
  }

  test("simhashDf matches the per-row simhash64 expression") {
    val rel = Dedup.simhashDf(docs, "doc_id", "text")
    val hof = docs.select(col("doc_id").as("id"), Dedup.simhash64(col("text")).as("fp"))
    assert(sortedRows(rel) == sortedRows(hof))
  }

  test("simhash pairs: exact dup at hamming 0; blocking finds it") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 4L && p._3 == 0L))
  }

  test("minhash helpers share the hash-of-hash scheme with the pair pipeline") {
    // signatures precomputed at ingest (minhashSignature) must equal the
    // relational pipeline's min-aggregated seeded hashes, or ingest-time
    // band keys would never bucket-match minhashPairs
    val k = 8
    val sig = docs.filter(size(Dedup.wordShingles(col("text"), 3)) > 0)
      .select(col("doc_id"),
        Dedup.minhashSignature(Dedup.wordShingles(col("text"), 3), k).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val hashed = Dedup.shingleRows(docs, "doc_id", "text", 3)
      .select(col("id"), xxhash64(col("s")).as("h0"))
    val minCols = (0 until k).map(h => min(xxhash64(col("h0"), lit(h + 1))).as(s"m$h"))
    val rel = hashed.groupBy(col("id")).agg(minCols.head, minCols.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to k).map(r.getLong)).toMap
    assert(sig.keySet == rel.keySet)
    sig.foreach { case (id, s) => assert(s == rel(id), s"doc $id") }
  }

  test("duplicate clusters: min-label propagation finds connected components") {
    // chain 1-2-3 (via 2), pair 10-11, chain 20-21-22-23 (path, diameter 3)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 23L))
      .toDF("id_a", "id_b")
    val out = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
  }

  test("duplicate clusters: funnel merges chains spanning many partitions") {
    // one 400-node path (worst case for local contraction: edges of the
    // same component scattered across partitions) + noise cliques; spread
    // over 16 partitions so correctness cannot come from single-partition
    // luck, and shuffle the edge order so it cannot come from sortedness
    val chain = (1L until 400L).map(i => (i, i + 1))
    val cliques = (0 until 50).flatMap { c =>
      val base = 1000L + c * 10
      Seq((base, base + 1), (base + 1, base + 2), (base, base + 2))
    }
    val pairs = new scala.util.Random(7).shuffle(chain ++ cliques)
      .toDF("id_a", "id_b").repartition(16)
    val out = Dedup.duplicateClusters(pairs, fanIn = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 400L).foreach(i => assert(out(i) == 1L, s"chain node $i"))
    (0 until 50).foreach { c =>
      val base = 1000L + c * 10
      (0 to 2).foreach(o => assert(out(base + o) == base, s"clique $c node $o"))
    }
    assert(out.size == 400 + 150)
  }

  test("duplicate clusters: generic over non-long id types") {
    val pairs = Seq(("b", "c"), ("a", "b"), ("x", "y")).toDF("id_a", "id_b")
    val out = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("duplicate clusters: propagate variant agrees with the funnel") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 23L))
      .toDF("id_a", "id_b")
    val funnel = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = Dedup.duplicateClustersPropagate(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(funnel == prop)
    assert(prop == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
  }

  test("ngram jaccard posting cutoff drops ubiquitous shingles") {
    val rep = Seq(
      (1L, "x x x x x x"), (2L, "x x x x x x"), (3L, "x x x x x x"))
      .toDF("doc_id", "text")
    // every 1-gram posting has length 3 > maxPostingLen=2 → no candidates
    val none = Dedup.ngramJaccardPairs(rep, "doc_id", "text", 1, 0.1, maxPostingLen = 2)
    assert(none.count() == 0)
  }

  test("passageDedup keeps only the corpus-order first occurrence of a tile") {
    val corpus = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c x y z"),
      (3L, "x y z"),
      (4L, "  "))
      .toDF("doc_id", "text")
    val out = Dedup.passageDedup(corpus, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1 owns both its tiles; doc 2 loses "a b c" to (1,0); doc 3
    // loses "x y z" to (2,1); the whitespace-only doc 4 vanishes
    assert(out == Map(
      1L -> (("a b c d e f", 2L, 2L)),
      2L -> (("x y z", 2L, 1L)),
      3L -> (("", 1L, 0L))))
  }

  test("near-dup funnel counts agree with the standalone cluster pass") {
    val out = graft.queries.ExtQueries.x50NearDupFunnel(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, c, s) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(c <= n && s <= n && s >= n - c, s"inconsistent funnel row: $r")
    }
    // the funnel's n_clustered is exactly the cluster operator's member
    // count per source — the composition must not re-derive clustering
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val perSource = graft.queries.ExtQueries.x23DupClusters(spark, sfDir)
      .join(docs, "doc_id").groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val funnel = out.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(funnel.filter(_._2 > 0) == perSource.filter(_._2 > 0))
  }

  test("embedding pairs within blocks honor the threshold") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), "a"), (2L, Array(0.9f, 0.1f), "a"),
      (3L, Array(-1.0f, 0.0f), "a"), (4L, Array(1.0f, 0.0f), "b"))
      .toDF("vec_id", "embedding", "blk")
    val pairs = Dedup.embeddingPairs(vecs, "vec_id", "embedding", col("blk"), 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L))) // 3 is opposite, 4 is another block
  }

  test("hammingPairs64 at maxDist=0 bands on the full fingerprint, not a constant") {
    // one 64-bit chunk: (1L << 64) is 1 under Java's mod-64 shift, so
    // the old mask collapsed every band key to 0 — an all-pairs join
    // (exact results via the popcount verify, dead pruning). The fixed
    // mask keys exact-match bands by the full fp.
    val hashed = Seq(
      (1L, 0x1234567890abcdefL), (2L, 0x1234567890abcdefL),
      (3L, 0x1234567890abcdeeL), // 1 bit off — NOT a maxDist=0 pair
      (4L, -0x7fffffffffffffffL), (5L, -0x7fffffffffffffffL))
      .toDF("id", "fp")
    val got = Dedup.hammingPairs64(hashed, maxDist = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (4L, 5L)))
  }
}
