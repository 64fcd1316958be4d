package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Manifest-committed partitioned parquet — the ATOMIC sibling of
  * [[PartitionedStore]] (whose per-partition delete-then-rename swap has a
  * documented crash window). The design is the public Delta/Iceberg idea
  * reduced to its core: data files are IMMUTABLE and never moved or
  * deleted by a commit; each commit writes new files plus one small
  * manifest that maps every live partition to the commit directory owning
  * its current version; readers resolve the LATEST manifest and scan only
  * the files it references. That gives:
  *
  *  - atomic commits: the manifest becomes visible via a single file
  *    rename — a crash mid-merge leaves an orphaned commit directory and
  *    an untouched manifest, never a torn table;
  *  - snapshot isolation: a reader that resolved manifest vN keeps
  *    reading vN's files even while vN+1 commits (nothing is overwritten);
  *  - object-store safety: no directory renames of data (object stores
  *    rename by copy, and partition-dir swaps are not atomic there) — the
  *    only rename is one small manifest file.
  *
  * Layout:
  * {{{
  *   path/commits/<uuid>/<partitionCol>=<val>/part-*.parquet   (immutable)
  *   path/_manifests/v00000001.json                            (one per commit)
  * }}}
  *
  * Manifest: `{"version": N, "partitionCol": c,
  * "commit": uuid, "partitions": {"c=v": "commits/<uuid>", ...}}` —
  * partition DIRECTORY NAMES as Spark wrote them (hive-escaped), mapped to
  * the commit root that owns the partition's current version.
  *
  * Concurrency: optimistic. A committer claims version N+1 by renaming a
  * staged manifest to `v<N+1>.json`; HDFS rename fails if the destination
  * exists, and a read-back verifies the claim on filesystems whose rename
  * overwrites (POSIX). The loser gets an IOException and must re-merge
  * from the new snapshot (its commit directory is orphaned, reclaimed by
  * [[vacuum]]). Cost per merge beyond PartitionedStore: one manifest
  * read + write — data I/O is identical (O(touched partitions)).
  */
object ManifestStore {

  private def fsFor(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestDir(path: String) = new Path(path, "_manifests")

  private final case class Manifest(
      version: Int, partitionCol: String, commit: String, partitions: Map[String, String])

  private def latest(fs: FileSystem, path: String): Option[Manifest] = {
    val dir = manifestDir(path)
    if (!fs.exists(dir)) return None
    val versions = fs.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toInt)
    if (versions.isEmpty) return None
    Some(readManifest(fs, path, versions.max))
  }

  private def readManifest(fs: FileSystem, path: String, version: Int): Manifest = {
    val p = new Path(manifestDir(path), f"v$version%08d.json")
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val j = JsonMethods.parse(text)
    def str(v: JValue) = v match { case JString(s) => s; case other => sys.error(s"manifest $p: $other") }
    Manifest(
      version,
      str(j \ "partitionCol"),
      str(j \ "commit"),
      (j \ "partitions") match {
        case JObject(fields) => fields.map { case (k, v) => k -> str(v) }.toMap
        case other => sys.error(s"manifest $p: partitions = $other")
      })
  }

  /** Atomically publish `m` as version `m.version`: stage to a temp file,
    * rename into place (fails if the version exists on HDFS-semantics
    * filesystems), read back and verify the commit uuid for
    * overwrite-rename filesystems (POSIX). Throws on a lost race.
    */
  private def commitManifest(fs: FileSystem, path: String, m: Manifest): Unit = {
    val dir = manifestDir(path)
    fs.mkdirs(dir)
    val dst = new Path(dir, f"v${m.version}%08d.json")
    if (fs.exists(dst))
      throw new java.io.IOException(
        s"ManifestStore: version ${m.version} already committed (concurrent writer) — re-merge from the new snapshot")
    val entries = m.partitions.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${k}":"${v}"""" }.mkString("{", ",", "}")
    val json =
      s"""{"version":${m.version},"partitionCol":"${m.partitionCol}","commit":"${m.commit}","partitions":$entries}"""
    val tmp = new Path(dir, s".tmp-${m.commit}")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    val renamed = fs.rename(tmp, dst)
    val verified = renamed && readManifest(fs, path, m.version).commit == m.commit
    if (!verified) {
      fs.delete(tmp, false)
      throw new java.io.IOException(
        s"ManifestStore: lost commit race for version ${m.version} — re-merge from the new snapshot")
    }
  }

  /** Write a data commit: the frame lands under `commits/<uuid>/` hive-
    * partitioned; returns (uuid, staged partition dir names as Spark
    * wrote them — never re-derived by string formatting, see
    * PartitionedStore.merge scaladoc).
    */
  private def writeCommit(
      spark: SparkSession, path: String, df: DataFrame, partitionCol: String): (String, Seq[String]) = {
    val uuid = java.util.UUID.randomUUID().toString
    val commitRoot = new Path(path, s"commits/$uuid")
    df.write.partitionBy(partitionCol).parquet(commitRoot.toString)
    val fs = fsFor(spark, commitRoot)
    val staged = fs.listStatus(commitRoot)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$partitionCol="))
      .map(_.getPath.getName).toSeq
    (uuid, staged)
  }

  /** Initialize (or fully replace) the table: one data commit containing
    * every partition + a manifest mapping all of them to it.
    */
  def write(spark: SparkSession, df: DataFrame, path: String, partitionCol: String): Unit = {
    val fs = fsFor(spark, new Path(path))
    val (uuid, staged) = writeCommit(spark, path, df, partitionCol)
    val version = latest(fs, path).map(_.version + 1).getOrElse(1)
    commitManifest(fs, path, Manifest(version, partitionCol,
      uuid, staged.map(_ -> s"commits/$uuid").toMap))
  }

  /** Read the latest snapshot. Partitions are grouped by owning commit
    * root, each group scanned with `basePath` = that commit root (restores
    * the partition column), then unioned — the plan size is O(live
    * commits), not O(partitions), and compaction/vacuum keep live commits
    * few.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val fs = fsFor(spark, new Path(path))
    val m = latest(fs, path).getOrElse(
      throw new java.io.FileNotFoundException(s"ManifestStore: no manifest under $path"))
    val byCommit = m.partitions.groupBy(_._2).toSeq.sortBy(_._1)
    byCommit.map { case (commitRel, parts) =>
      val base = new Path(path, commitRel).toString
      spark.read.option("basePath", base)
        .parquet(parts.keys.toSeq.sorted.map(d => s"$base/$d"): _*)
    }.reduce(_ unionByName _)
  }

  /** Copy-on-write MERGE with an atomic commit: same data plan as
    * [[PartitionedStore.merge]] (read ONLY touched partitions via the
    * manifest, anti-join on the keys, union the batch, rewrite those
    * partitions), but publication is a manifest pointer flip instead of
    * directory swaps. Same contract: batch carries the partition column,
    * single-level partitioning, non-null partition values, stable
    * key→partition assignment.
    */
  def merge(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      keyCols: Seq[String],
      partitionCol: String): Unit = {
    import org.apache.spark.sql.functions._
    val fs = fsFor(spark, new Path(path))
    val m = latest(fs, path).getOrElse(
      throw new java.io.FileNotFoundException(s"ManifestStore: no manifest under $path — write() first"))
    require(m.partitionCol == partitionCol,
      s"ManifestStore: table is partitioned by ${m.partitionCol}, not $partitionCol")
    val touched = batch.select(partitionCol).distinct().collect().map(_.get(0)).toSeq
    require(!touched.contains(null), s"merge: null $partitionCol in batch")
    // current rows of the touched partitions, via the manifest (a fresh
    // table or all-new partitions may have nothing to read)
    val currentTouched: Option[DataFrame] = {
      val sub = read(spark, path).filter(col(partitionCol).isin(touched: _*))
      val anyLive = m.partitions.nonEmpty
      if (anyLive) Some(sub) else None
    }
    val out = currentTouched match {
      case Some(cur) =>
        val keyed = batch.select(keyCols.map(c => batch(c).as(s"__k_$c")): _*)
        val keep = cur.join(keyed,
          keyCols.map(c => cur(c) === col(s"__k_$c")).reduce(_ && _), "left_anti")
        keep.unionByName(batch.select(keep.columns.map(col): _*))
      case None => batch
    }
    val (uuid, staged) = writeCommit(spark, path, out, partitionCol)
    commitManifest(fs, path, Manifest(m.version + 1, partitionCol, uuid,
      m.partitions ++ staged.map(_ -> s"commits/$uuid")))
  }

  /** Delete data not referenced by the LATEST manifest: whole commit
    * directories with no live partition (crashed/lost-race commits), and
    * superseded partition subdirs inside still-live commits. Returns the
    * number of directories removed. Readers still holding an older
    * manifest lose their snapshot — run vacuum on a retention delay in
    * production.
    */
  def vacuum(spark: SparkSession, path: String): Int = {
    val fs = fsFor(spark, new Path(path))
    val m = latest(fs, path).getOrElse(return 0)
    val commitsDir = new Path(path, "commits")
    if (!fs.exists(commitsDir)) return 0
    var removed = 0
    for (c <- fs.listStatus(commitsDir) if c.isDirectory) {
      val rel = s"commits/${c.getPath.getName}"
      val livePartsHere = m.partitions.collect { case (p, r) if r == rel => p }.toSet
      if (livePartsHere.isEmpty) { fs.delete(c.getPath, true); removed += 1 }
      else for (p <- fs.listStatus(c.getPath)
                if p.isDirectory && p.getPath.getName.startsWith(s"${m.partitionCol}=")
                  && !livePartsHere.contains(p.getPath.getName)) {
        fs.delete(p.getPath, true); removed += 1
      }
    }
    removed
  }
}
