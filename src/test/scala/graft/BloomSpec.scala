package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftfn.{Bloom, BloomExpressions, BloomKernel}

/** Bloom filter kernel + build paths (x55's probe machinery). */
class BloomSpec extends SparkSpec {

  private def hashesOf(seed: Long, n: Int): Array[Long] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)(rnd.nextLong())
  }

  test("layout rounds bits to a power of two and clamps hash count") {
    for (n <- Seq(1L, 7L, 64L, 1000L, 123456L); bpk <- Seq(8, 16)) {
      val (m, k) = Bloom.layout(n, bpk)
      assert((m & (m - 1)) == 0L, s"m=$m not a power of two")
      assert(m >= n * bpk)
      assert(k >= 1 && k <= 24)
    }
    // n=0 degenerates to the 64-bit minimum, never divides by zero
    assert(Bloom.layout(0L, 16)._1 == 64L)
  }

  test("probe ≡ set round-trip: every inserted key is found") {
    val hs = hashesOf(42L, 5000)
    val b = Bloom.build(hs, 16)
    assert(hs.forall(b.mightContain))
  }

  test("FP-rate sanity: ~16 bits/key keeps false positives well under 1%") {
    val hs = hashesOf(7L, 10000)
    val b = Bloom.build(hs, 16)
    val inSet = hs.toSet
    val probes = hashesOf(8L, 20000).filterNot(inSet)
    val fp = probes.count(b.mightContain).toDouble / probes.length
    assert(fp < 0.01, s"fp=$fp")
  }

  test("distributed build ≡ driver build on the same key set") {
    val hs = hashesOf(99L, 20000)
    val driver = Bloom.build(hs, 16)
    val dist = Bloom.buildDistributed(
      spark.sparkContext.parallelize(hs.toSeq, 7), hs.length.toLong, 16)
    assert(dist.numHashes == driver.numHashes)
    assert(java.util.Arrays.equals(dist.bits, driver.bits))
  }

  test("kernel h2 stride is always odd (full-cycle double hashing)") {
    for (h <- hashesOf(3L, 100)) assert((BloomKernel.h2of(h) & 1L) == 1L)
  }

  test("graft_bloom_contains probes inside a dataframe plan") {
    import spark.implicits._
    val keys = Seq("alpha", "beta", "gamma")
    val hs = keys.toDF("s").select(xxhash64(col("s"))).collect().map(_.getLong(0))
    val b = Bloom.build(hs, 16)
    val got = Seq("alpha", "beta", "delta", "epsilon").toDF("s")
      .filter(BloomExpressions.mightContain(xxhash64(col("s")), b))
      .as[String].collect().toSet
    assert(Set("alpha", "beta").subsetOf(got))
    // and the codegen'd path produces the same verdicts as the kernel
    val all = Seq("alpha", "beta", "delta", "epsilon").toDF("s")
      .select(col("s"), BloomExpressions.mightContain(xxhash64(col("s")), b).as("hit"),
        xxhash64(col("s")).as("h"))
      .collect()
    for (r <- all)
      assert(r.getBoolean(1) == b.mightContain(r.getLong(2)))
  }
}
