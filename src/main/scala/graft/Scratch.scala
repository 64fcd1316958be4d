package graft

/** Per-JVM scratch tree under `/tmp/graft`, with a startup sweep of
  * stale sibling runs.
  *
  * Why this exists (r14 post-mortem): every graft JVM — bench passes,
  * Verify, sbt test forks, crashed driver runs — used to write fixed
  * `/tmp/graft/<name>_<sfTag>` paths. Two consequences, both observed:
  * a concurrent or crashed-stale process could race a running bench's
  * parquet writes at the SAME path (the r14 driver bench died in
  * `ChecksumFileSystem.create` exactly there), and thousands of
  * orphaned table directories accumulated (8k+ at the r14 audit),
  * inflating every file-creation and listing in the tree (q38's
  * unexplained 2.5× regression wrote directly into that directory).
  *
  * The fix is structural, not a cleanup script:
  *  - every scratch path is namespaced under a per-JVM `run_<token>`
  *    directory, so two JVMs can NEVER collide however their scratch
  *    names are derived;
  *  - first use sweeps siblings whose mtime is older than [[staleMs]]
  *    (a live run's directory is as young as the JVM that made it;
  *    anything older is a crashed or finished run's leak);
  *  - a shutdown hook removes this JVM's own run directory, so a clean
  *    exit leaks nothing at all.
  *
  * At cluster scale the same discipline holds with a job-id in place
  * of the random token: scratch under `scratch/<applicationId>/`,
  * swept by lifecycle policy on the store, never by name-collision
  * luck.
  */
object Scratch {

  /** Eight hex chars of JVM identity — also reusable by callers that
    * need a token (Derby URLs) without minting their own.
    */
  val token: String = java.util.UUID.randomUUID().toString.take(8)

  /** A sibling run directory untouched this long is a leak. Driver
    * rounds budget ~1 h of wall clock, so 3 h cannot be a live peer.
    */
  private val staleMs = 3L * 3600 * 1000

  lazy val root: String = {
    val base = new java.io.File("/tmp/graft")
    base.mkdirs()
    sweep(base)
    // pre-Scratch ScaleBench runs left their own sibling tree
    sweep(new java.io.File("/tmp/graft_scalebench"))
    val r = new java.io.File(base, s"run_$token")
    r.mkdirs()
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try deleteRec(r) catch { case _: Throwable => () }))
    r.getAbsolutePath
  }

  /** `/tmp/graft/run_<token>/<name>` — parent dirs exist. */
  def path(name: String): String = s"$root/$name"

  private def sweep(base: java.io.File): Unit = {
    val now = System.currentTimeMillis()
    Option(base.listFiles()).getOrElse(Array.empty[java.io.File]).foreach { f =>
      if (now - f.lastModified() > staleMs)
        try deleteRec(f) catch { case _: Throwable => () }
    }
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory && !java.nio.file.Files.isSymbolicLink(f.toPath))
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(deleteRec)
    f.delete()
    ()
  }
}
