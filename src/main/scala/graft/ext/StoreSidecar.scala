package graft.ext

import org.apache.spark.sql.SparkSession

/** The `_graft_geometry.json` sidecar shared by every maintained store
  * ([[DedupStores]], [[VectorStore]], [[ClusterStore]]): a tiny
  * flat-integer JSON at the table root — outside `manifests/`/
  * `commits/`, so ManifestStore's reads and vacuum never touch it —
  * recording the build-time geometry that later probes/appends must
  * match. Each store keeps its OWN mismatch policy (lenient-if-missing,
  * must-exist, …); this object holds the one copy of the IO + parse so
  * a fix to sidecar handling lands everywhere at once.
  */
private[graft] object StoreSidecar {

  private def path(root: String) =
    new org.apache.hadoop.fs.Path(root, "_graft_geometry.json")

  def write(spark: SparkSession, root: String, fields: Seq[(String, Long)]): Unit = {
    val p = path(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(
      fields.map { case (k, v) => s""""$k":$v""" }
        .mkString("{", ",", "}").getBytes("UTF-8"))
    finally out.close()
  }

  /** All requested keys parsed from the sidecar, or None when the file
    * is absent OR any key is missing/unparsable (a partial sidecar is
    * as untrustworthy as none).
    */
  def read(spark: SparkSession, root: String, keys: Seq[String]): Option[Map[String, Long]] = {
    val p = path(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val parsed = keys.flatMap { k =>
      s""""$k":(\\d+)""".r.findFirstMatchIn(txt).map(m => k -> m.group(1).toLong)
    }.toMap
    if (parsed.size == keys.size) Some(parsed) else None
  }

  /** A tiny named MARKER file at the table root (`_graft_<name>`) —
    * the cheap-path switch for reads that pay a forget-correctness tax
    * only forget-touched stores need (r14 verdict: the LM/vocab net-sum
    * V filter ran on every forget-free read). Contract: the WRITER must
    * set the marker BEFORE committing the state the marker describes
    * (marker-first ordering) — a crash between the two leaves a set
    * marker over an untouched store, which only costs the slow path,
    * never correctness; the reverse order would serve the cheap path
    * over corrected counts. Markers are never cleared: compaction that
    * folds corrections away may clear via [[clearMarker]] AFTER the
    * fold commits (slow-path-safe in the same way).
    */
  def setMarker(spark: SparkSession, root: String, name: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(root, s"_graft_$name")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write("1".getBytes("UTF-8")) finally out.close()
  }

  def hasMarker(spark: SparkSession, root: String, name: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(root, s"_graft_$name")
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  def clearMarker(spark: SparkSession, root: String, name: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(root, s"_graft_$name")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) { fs.delete(p, false); () }
  }

  /** The require-or-init policy most stores share (IndexStore,
    * MediaStore, BenchRegistry): first touch on a fresh table RECORDS
    * the geometry; every later touch REQUIRES an exact match and fails
    * loudly otherwise — one copy of the compare loop so the stores
    * cannot subtly diverge. (DedupStores keeps its own
    * validate-if-present flavor: its probe validates a field SUBSET
    * and must never initialize a partial sidecar.)
    */
  def requireOrInit(
      spark: SparkSession,
      root: String,
      want: Seq[(String, Long)],
      store: String): Map[String, Long] =
    read(spark, root, want.map(_._1)) match {
      case Some(got) =>
        for ((k, v) <- want)
          require(got(k) == v,
            s"$store: $root was built with $k=${got(k)} but this call uses $k=$v — " +
              "a geometry mismatch silently corrupts reads or recall")
        got
      case None =>
        write(spark, root, want)
        want.toMap
    }
}
