package graft

import org.apache.spark.sql.functions._
import graft.sources.{ManifestStore, PartitionedStore, ZoneMaps}

/** Zone-map data skipping (x163): pruning on clustered layouts,
  * conservative behavior everywhere else, staleness semantics.
  */
class ZoneMapsSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    s"/tmp/graft/zmspec_${java.util.UUID.randomUUID().toString.take(8)}"

  private val rows = (1L to 400L).map(i => (i, i * 3)) // v clustered with id

  test("clustered layout: range read skips non-overlapping partitions, results exact") {
    val root = fresh()
    // pt = v div 300 → values 3..1200 spread over 5 partitions
    ManifestStore.write(spark,
      rows.toDF("id", "v").withColumn("pt", expr("v div 300L")), root, "pt")
    ZoneMaps.refresh(spark, root, "v")
    val out = ZoneMaps.readWhere(spark, root, "v", 310L, 580L, requireFresh = true)
    assert(PartitionedStore.selectedPartitionCount(out).contains(1L)) // pt=1 only
    assert(out.select(col("id")).collect().map(_.getLong(0)).toSet ==
      (104L to 193L).toSet) // 310/3=103.3 → 104; 580/3=193.3 → 193
  }

  test("hash layout: nothing skips, results still exact (correctness never depends on the maps)") {
    val root = fresh()
    ManifestStore.write(spark,
      rows.toDF("id", "v").withColumn("pt", pmod(xxhash64(col("id")), lit(4L))),
      root, "pt")
    ZoneMaps.refresh(spark, root, "v")
    val out = ZoneMaps.readWhere(spark, root, "v", 310L, 580L, requireFresh = true)
    assert(PartitionedStore.selectedPartitionCount(out).contains(4L))
    assert(out.count() == 90L)
  }

  test("stale maps: silent fallback scans everything; requireFresh is loud") {
    val root = fresh()
    ManifestStore.write(spark,
      rows.toDF("id", "v").withColumn("pt", expr("v div 300L")), root, "pt")
    ZoneMaps.refresh(spark, root, "v")
    // a later commit bumps the snapshot past the stamp
    ManifestStore.merge(spark, root,
      Seq((1000L, 5L)).toDF("id", "v").withColumn("pt", expr("v div 300L")),
      Seq("id"), "pt")
    val out = ZoneMaps.readWhere(spark, root, "v", 1L, 10L)
    // the un-skipped fallback still finds the new row the maps predate
    assert(out.select(col("id")).collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L, 1000L))
    intercept[IllegalArgumentException] {
      ZoneMaps.readWhere(spark, root, "v", 1L, 10L, requireFresh = true)
    }
    // re-refreshing re-stamps and skipping resumes (the post-merge
    // table spans two commits → sum selected partitions over ALL scans)
    ZoneMaps.refresh(spark, root, "v")
    val again = ZoneMaps.readWhere(spark, root, "v", 1L, 10L, requireFresh = true)
    assert(PartitionedStore.selectedPartitionTotal(again) == 1L)
    assert(again.count() == 4L)
  }

  test("all-null partitions scan conservatively; mapping a partition column is refused") {
    val root = fresh()
    val df = Seq((1L, Some(5L), 0L), (2L, None, 1L), (3L, None, 1L))
      .toDF("id", "v", "pt")
    ManifestStore.write(spark, df, root, "pt")
    ZoneMaps.refresh(spark, root, "v")
    // pt=1 has a NULL range — it must still be scanned (and contribute
    // nothing), never silently skipped
    val out = ZoneMaps.readWhere(spark, root, "v", 1L, 10L, requireFresh = true)
    assert(PartitionedStore.selectedPartitionCount(out).contains(2L))
    assert(out.select(col("id")).collect().map(_.getLong(0)).toSet == Set(1L))
    intercept[IllegalArgumentException] {
      ZoneMaps.refresh(spark, root, "pt")
    }
  }
}
