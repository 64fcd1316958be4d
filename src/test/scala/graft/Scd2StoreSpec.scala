package graft

import org.apache.spark.sql.functions._

import graft.ext.{Scd2, Scd2Store}

/** Maintained SCD2 store (x188/x189): late changes re-thread interval
  * chains exactly, out-of-order daily appends converge on the one-shot
  * batch build, and replays replace instead of duplicating.
  */
class Scd2StoreSpec extends SparkSpec {
  import spark.implicits._

  private def fresh() =
    graft.Scratch.path(s"scd2store_${java.util.UUID.randomUUID().toString.take(8)}")

  private val attrs = Seq("v")

  test("a late change re-threads the interval chain: predecessor closes, versions renumber") {
    val root = fresh()
    Scd2Store.appendDay(spark,
      root, Seq((7L, 100L, 1L, "a"), (7L, 300L, 2L, "b")).toDF("k", "ts", "seq", "v"),
      "k", "ts", "seq", attrs)
    // the late mid-chain change
    Scd2Store.appendDay(spark,
      root, Seq((7L, 200L, 3L, "c")).toDF("k", "ts", "seq", "v"),
      "k", "ts", "seq", attrs)
    val got = Scd2Store.history(spark, root)
      .select("k", "v", "version", "valid_from_us", "valid_to_us")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
      .toSet
    assert(got == Set(
      (7L, "a", 1L, 100L, Some(200L)),
      (7L, "c", 2L, 200L, Some(300L)),
      (7L, "b", 3L, 300L, None)))
  }

  test("out-of-order daily appends converge on the batch build; replay replaces") {
    val root = fresh()
    // 5 keys x 6 changes; days sliced by seq % 3 and appended 2, 0, 1
    val rows = for (k <- 0L until 5L; s <- 0L until 6L)
      yield (k, 1000L + ((s * 7 + k * 3) % 11) * 100L, k * 100 + s, s"v$s")
    val feed = rows.toDF("k", "ts", "seq", "v")
    Seq(2L, 0L, 1L).foreach { d =>
      Scd2Store.appendDay(spark, root, feed.filter(col("seq") % 3 === d),
        "k", "ts", "seq", attrs)
    }
    val batch = Scd2.build(feed, "k", "ts", "seq", attrs)
    val stored = Scd2Store.history(spark, root)
    assert(stored.except(batch).isEmpty && batch.except(stored).isEmpty)
    val before = graft.sources.ManifestStore.read(spark, root).count()
    Scd2Store.appendDay(spark, root, feed.filter(col("seq") % 3 === 0L),
      "k", "ts", "seq", attrs)
    assert(graft.sources.ManifestStore.read(spark, root).count() == before)
    val replayed = Scd2Store.history(spark, root)
    assert(replayed.except(batch).isEmpty && batch.except(replayed).isEmpty)
  }

  test("forget erases every version of a doomed key; survivors and re-runs untouched") {
    val root = fresh()
    Scd2Store.appendDay(spark, root,
      Seq((1L, 100L, 1L, "a"), (1L, 200L, 2L, "b"), (2L, 100L, 3L, "x"))
        .toDF("k", "ts", "seq", "v"),
      "k", "ts", "seq", attrs)
    Scd2Store.forget(spark, root, Seq(Tuple1(1L)).toDF("k"), "k")
    def hist() = Scd2Store.history(spark, root)
      .select("k", "v", "version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(hist() == Set((2L, "x", 1L)))
    Scd2Store.forget(spark, root, Seq(Tuple1(1L)).toDF("k"), "k") // no-op
    assert(hist() == Set((2L, "x", 1L)))
  }

  test("forgetChanges re-threads the chain: predecessor re-opens, versions renumber") {
    val root = fresh()
    Scd2Store.appendDay(spark, root,
      Seq((1L, 100L, 1L, "a"), (1L, 200L, 2L, "b"), (1L, 300L, 3L, "c"))
        .toDF("k", "ts", "seq", "v"),
      "k", "ts", "seq", attrs)
    Scd2Store.forgetChanges(spark, root, Seq((1L, 2L)).toDF("k", "seq"),
      "k", "seq", "ts", attrs)
    def hist() = Scd2Store.history(spark, root)
      .select("k", "v", "version", "valid_from_us", "valid_to_us").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]))).toSet
    val expect = Set(
      (1L, "a", 1L, 100L, Some(300L)), // valid_to jumps the erased change
      (1L, "c", 2L, 300L, None))       // renumbered
    assert(hist() == expect)
    // replay from a crash window: merge a stale copy of the doomed row
    // back (rebuild committed, delete lost) — the re-run must converge
    val stale = Seq((1L, 200L, 2L, "b")).toDF("k", "ts", "seq", "v")
    val staleRows = Scd2.build(stale.withColumn("__seq", col("seq")),
      "k", "ts", "seq", attrs :+ "__seq")
      .withColumn("bucket", pmod(xxhash64(col("k")), lit(16L)))
    graft.sources.ManifestStore.merge(spark, root, staleRows,
      Seq("k", "__seq"), "bucket")
    Scd2Store.forgetChanges(spark, root, Seq((1L, 2L)).toDF("k", "seq"),
      "k", "seq", "ts", attrs)
    assert(hist() == expect)
  }

  test("forget/append refuse a mismatched bucket geometry") {
    val root = fresh()
    Scd2Store.appendDay(spark, root,
      Seq((1L, 100L, 1L, "a")).toDF("k", "ts", "seq", "v"),
      "k", "ts", "seq", attrs, buckets = 8)
    intercept[IllegalArgumentException] {
      Scd2Store.appendDay(spark, root,
        Seq((1L, 200L, 2L, "b")).toDF("k", "ts", "seq", "v"),
        "k", "ts", "seq", attrs, buckets = 16)
    }
    intercept[IllegalArgumentException] {
      Scd2Store.forget(spark, root, Seq(Tuple1(1L)).toDF("k"), "k", buckets = 16)
    }
  }

  test("probeStore resolves point-in-time state from the maintained history") {
    val root = fresh()
    Scd2Store.appendDay(spark,
      root, Seq((1L, 100L, 1L, "a"), (1L, 300L, 2L, "b")).toDF("k", "ts", "seq", "v"),
      "k", "ts", "seq", attrs)
    val probes = Seq((1L, 50L), (1L, 150L), (1L, 300L)).toDF("k", "t")
    val got = Scd2Store.probeStore(spark, root, probes, "k", "t", attrs)
      .select("k", "t", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(got == Set(
      (1L, 50L, None),            // before the first version
      (1L, 150L, Some("a")),
      (1L, 300L, Some("b"))))
  }
}
