package graft

import org.apache.spark.sql.functions._
import graft.ext.ClusterStore

/** Maintained cluster-label store (x147): incremental merge semantics
  * on hand-built graphs.
  */
class ClusterStoreSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    s"/tmp/graft/clspec_${java.util.UUID.randomUUID().toString.take(8)}"

  test("appendPairs: min arriving later relabels the whole cluster") {
    val root = fresh()
    ClusterStore.build(spark, Seq((2L, 3L)).toDF("id_a", "id_b"), root, 4)
    val pre = ClusterStore.readLabels(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pre == Set((2L, 2L), (3L, 2L)))
    // the new min (1) connects via ONE edge; both old members must
    // cascade to label 1 even though (1, 3) was never a pair
    ClusterStore.appendPairs(spark, Seq((1L, 2L)).toDF("id_a", "id_b"), root, 4)
    val got = ClusterStore.readLabels(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("appendPairs: bridging two stored clusters merges them") {
    val root = fresh()
    ClusterStore.build(spark,
      Seq((10L, 11L), (20L, 21L)).toDF("id_a", "id_b"), root, 4)
    ClusterStore.appendPairs(spark,
      Seq((11L, 21L)).toDF("id_a", "id_b"), root, 4)
    val got = ClusterStore.readLabels(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 10L), (11L, 10L), (20L, 10L), (21L, 10L)))
  }

  test("appendPairs: replay is idempotent; empty day is a no-op") {
    val root = fresh()
    ClusterStore.build(spark, Seq((2L, 3L)).toDF("id_a", "id_b"), root, 4)
    val day = Seq((1L, 2L)).toDF("id_a", "id_b")
    ClusterStore.appendPairs(spark, day, root, 4)
    ClusterStore.appendPairs(spark, day, root, 4) // replay: replace, not dup
    ClusterStore.appendPairs(spark,
      spark.emptyDataset[(Long, Long)].toDF("id_a", "id_b"), root, 4)
    val rows = ClusterStore.readLabels(spark, root).collect()
    assert(rows.length == 3 &&
      rows.map(r => (r.getLong(0), r.getLong(1))).toSet ==
        Set((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("appendPairs: replay converges from the crash window (merge committed, delete not)") {
    import graft.sources.ManifestStore
    val root = fresh()
    ClusterStore.build(spark, Seq((2L, 3L)).toDF("id_a", "id_b"), root, 4)
    // replicate an append that died between its two commits: the
    // relabeled rows are merged into their NEW partitions but the stale
    // copies were never deleted — ids may be visible under both labels
    val relabeled = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "label")
      .withColumn("pt", pmod(xxhash64(col("label").cast("string")), lit(4L)))
    ManifestStore.merge(spark, root, relabeled, Seq("id"), "pt")
    // replaying the SAME day through the public API must clear the
    // duplicates and land on exactly the final labels
    ClusterStore.appendPairs(spark, Seq((1L, 2L)).toDF("id_a", "id_b"), root, 4)
    val got = ClusterStore.readLabels(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("geometry: a partitions mismatch fails loudly") {
    val root = fresh()
    ClusterStore.build(spark, Seq((2L, 3L)).toDF("id_a", "id_b"), root, 4)
    intercept[IllegalArgumentException] {
      ClusterStore.appendPairs(spark,
        Seq((1L, 2L)).toDF("id_a", "id_b"), root, 8)
    }
  }
}
