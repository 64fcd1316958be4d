package graft

import org.apache.spark.sql.functions._
import graft.sources.ManifestStore

/** Round-6 third wave: the lakehouse maintenance surface on
  * ManifestStore — copy-on-write DELETE, version-diff change feed,
  * commit compaction, and ADD-column schema evolution.
  */
class LakehouseOpsSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(prefix: String): String =
    graft.Scratch.path(s"${prefix}_${java.util.UUID.randomUUID().toString.take(8)}")

  private def state(table: String): Map[Long, (String, Long)] =
    ManifestStore.read(spark, table)
      .select(col("k"), col("v"), col("p").cast("long"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

  // --------------------------------------------------------------- delete

  test("delete rewrites only touched partitions and drops emptied leafs") {
    val table = freshTable("del")
    val base = Seq((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 1L), (4L, "d", 2L))
      .toDF("k", "v", "p")
    ManifestStore.write(spark, base, table, "p")
    // keys carry the partition column: touched set known without a scan
    ManifestStore.delete(spark, table,
      Seq((2L, 0L), (4L, 2L)).toDF("k", "p"), Seq("k"), Seq("p"))
    assert(state(table) == Map(1L -> (("a", 0L)), 3L -> (("c", 1L))))
    // partition p=2 was emptied: its leaf must be GONE from the snapshot,
    // and untouched p=1 must still read from the ORIGINAL commit's files
    val files = ManifestStore.read(spark, table).inputFiles
    assert(!files.exists(_.contains("p=2")))
    val v1Files = ManifestStore.read(spark, table, Some(1)).inputFiles
      .filter(_.contains("p=1")).toSet
    assert(files.filter(_.contains("p=1")).toSet == v1Files)
  }

  test("delete locates partitions when keys lack the partition column") {
    val table = freshTable("delloc")
    val base = Seq((1L, "a", 0L), (2L, "b", 1L), (3L, "c", 2L)).toDF("k", "v", "p")
    ManifestStore.write(spark, base, table, "p")
    ManifestStore.delete(spark, table, Seq(Tuple1(2L)).toDF("k"), Seq("k"), Seq("p"))
    assert(state(table) == Map(1L -> (("a", 0L)), 3L -> (("c", 2L))))
    // absent keys are a no-op: no new version, no empty commit
    val vBefore = ManifestStore.versions(spark, table).head
    ManifestStore.delete(spark, table, Seq(Tuple1(99L)).toDF("k"), Seq("k"), Seq("p"))
    assert(ManifestStore.versions(spark, table).head == vBefore)
  }

  // -------------------------------------------------------------- changes

  test("changes classifies insert/update/delete and scans only repointed partitions") {
    val table = freshTable("cdc")
    val base = Seq((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 1L), (4L, "d", 2L))
      .toDF("k", "v", "p")
    ManifestStore.write(spark, base, table, "p")
    // v2: update k=2 (same value for k=1 rides along in the rewrite),
    // insert k=5 into p=0
    ManifestStore.merge(spark, table,
      Seq((1L, "a", 0L), (2L, "B", 0L), (5L, "e", 0L)).toDF("k", "v", "p"),
      Seq("k"), Seq("p"))
    // v3: delete k=4 (empties p=2)
    ManifestStore.delete(spark, table, Seq((4L, 2L)).toDF("k", "p"), Seq("k"), Seq("p"))

    val feed = ManifestStore.changes(spark, table, 1, 3, Seq("k"))
    val got = feed.collect()
      .map(r => r.getAs[Long]("k") -> ((r.getAs[String]("v"), r.getAs[String]("change_type"))))
      .toMap
    // k=1 was physically rewritten but logically unchanged: NOT in the feed
    assert(got == Map(
      2L -> (("B", "update")),
      5L -> (("e", "insert")),
      4L -> (("d", "delete"))))
    // only the repointed partitions (p=0 old+new, p=2 old) are in the scan
    val scanned = feed.inputFiles
    assert(scanned.nonEmpty && !scanned.exists(_.contains("p=1")))
  }

  test("changes between adjacent compactions is empty") {
    val table = freshTable("cdcc")
    ManifestStore.write(spark,
      Seq((1L, "a", 0L), (2L, "b", 1L)).toDF("k", "v", "p"), table, "p")
    ManifestStore.merge(spark, table, Seq((3L, "c", 0L)).toDF("k", "v", "p"),
      Seq("k"), Seq("p"))
    val before = ManifestStore.versions(spark, table).head
    assert(ManifestStore.compact(spark, table) == 2)
    // compaction repoints every partition but changes no content: the
    // value comparison must suppress the physical rewrite entirely
    assert(ManifestStore.changes(spark, table, before, before + 1, Seq("k")).count() == 0)
  }

  // -------------------------------------------------------------- compact

  test("compact collapses live commits to one without changing content") {
    val table = freshTable("cmp")
    ManifestStore.write(spark,
      Seq((1L, "a", 0L), (2L, "b", 1L), (3L, "c", 2L)).toDF("k", "v", "p"), table, "p")
    ManifestStore.merge(spark, table, Seq((2L, "B", 1L)).toDF("k", "v", "p"), Seq("k"), Seq("p"))
    ManifestStore.merge(spark, table, Seq((4L, "d", 2L)).toDF("k", "v", "p"), Seq("k"), Seq("p"))
    val before = state(table)
    assert(ManifestStore.compact(spark, table) == 3) // 3 live commits collapsed
    assert(state(table) == before)
    val files = ManifestStore.read(spark, table).inputFiles
    // one live commit, one file per leaf (hash repartition on p)
    assert(files.map(_.replaceAll("/p=.*$", "")).toSet.size == 1)
    assert(files.groupBy(f => f.replaceAll("/[^/]*$", "")).forall(_._2.length == 1))
    // idempotent: a second compaction is a no-op, no version bump
    val v = ManifestStore.versions(spark, table).head
    assert(ManifestStore.compact(spark, table) == 0)
    assert(ManifestStore.versions(spark, table).head == v)
  }

  // ----------------------------------------------------- schema evolution

  test("merge with evolveSchema adds columns; old rows read as NULL") {
    val table = freshTable("evo")
    ManifestStore.write(spark,
      Seq((1L, "a", 0L), (2L, "b", 1L)).toDF("k", "v", "p"), table, "p")
    ManifestStore.merge(spark, table,
      Seq((2L, "B", 1L, 0.9), (3L, "c", 1L, 0.5)).toDF("k", "v", "p", "score"),
      Seq("k"), Seq("p"), evolveSchema = true)
    val got = ManifestStore.read(spark, table)
      .select(col("k"), col("v"), col("score"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), Option(r.get(2))))).toMap
    // k=1 lives in an untouched pre-evolution partition: NULL score at read
    assert(got == Map(
      1L -> (("a", None)),
      2L -> (("B", Some(0.9))),
      3L -> (("c", Some(0.5)))))
    // evolved column participates in later change feeds
    val feed = ManifestStore.changes(spark, table, 1, 2, Seq("k"))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("change_type")).toMap
    assert(feed == Map(2L -> "update", 3L -> "insert"))
  }

  test("merge without evolveSchema and type changes are rejected") {
    val table = freshTable("evoerr")
    ManifestStore.write(spark, Seq((1L, "a", 0L)).toDF("k", "v", "p"), table, "p")
    // a new batch column without evolveSchema must not be silently dropped
    intercept[IllegalArgumentException] {
      ManifestStore.merge(spark, table,
        Seq((1L, "A", 0L, 1.0)).toDF("k", "v", "p", "extra"), Seq("k"), Seq("p"))
    }
    intercept[IllegalArgumentException] {
      ManifestStore.merge(spark, table,
        Seq((1L, 7L, 0L)).toDF("k", "v", "p"), Seq("k"), Seq("p"), evolveSchema = true)
    }
  }
}
