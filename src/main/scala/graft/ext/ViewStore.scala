package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.ManifestStore

/** Incrementally maintained JOIN VIEW — the materialized-view member of
  * the maintained-store family (sketch stores keep aggregates fresh;
  * this keeps a JOIN fresh): `view = A ⋈ B` on a join key, with both
  * base tables persisted alongside it, and each ingest cycle folding
  * the day's increments in via the textbook delta rule
  *
  *   ΔV = (ΔA ⋈ B_new) ∪ ((A_new ∖ ΔA) ⋈ ΔB)
  *
  * — which equals `A_new ⋈ B_new ∖ A_old ⋈ B_old` for append-days, with
  * the ΔA ⋈ ΔB cross term counted exactly once. A row's join partners
  * that arrive on a LATER day still pair up: the later delta joins the
  * persisted base, not the day.
  *
  * 100 TB shape: all three tables partition by the JOIN KEY's hash
  * bucket, so each delta term reads only the OTHER base's buckets the
  * day's keys land in ([[ManifestStore.readPartitions]]), each merge
  * rewrites only touched buckets, and the view read is free — the join
  * was paid incrementally at ingest, never as a full recompute. Per
  * cycle: O(Δ + matched base partitions), independent of history size.
  *
  * Ingest contract (the maintained-store convention): increments are
  * NEW rows or at-least-once REPLAYS of identical rows — keyed merges
  * replace, so replays converge; the view's invariant `view == A ⋈ B`
  * survives any crash position because a replay recomputes its delta
  * against the CURRENT bases (a late replay may regenerate rows that
  * already exist — they merge onto themselves). Re-keying a row to a
  * DIFFERENT join key is not a supported operation (the old view rows
  * would need a targeted delete — that is a rebuild, as with every
  * store in this family).
  *
  * Aside from the join key, the two sides' column names must be
  * DISJOINT (required loudly): the view carries both sides' columns
  * verbatim, so a silent collision would drop one side's values.
  */
object ViewStore {

  private def aT(root: String) = s"$root/a"
  private def bT(root: String) = s"$root/b"
  private def vT(root: String) = s"$root/view"

  private def bucket(c: org.apache.spark.sql.Column, partitions: Int) =
    pmod(xxhash64(c.cast("string")), lit(partitions.toLong))

  private def requireGeometry(spark: SparkSession, root: String, partitions: Int): Unit = {
    val got = StoreSidecar.read(spark, root, Seq("partitions"))
      .map(_("partitions").toInt)
    if (got.isEmpty)
      StoreSidecar.write(spark, root, Seq("partitions" -> partitions.toLong))
    else require(got.contains(partitions),
      s"ViewStore: $root was built with partitions=${got.get}, not $partitions — " +
        "a bucket mismatch breaks every pruned read and merge")
  }

  /** Fold one day's increments of both sides into the bases and the
    * view. Either delta may be empty (a B-only day maintains the view
    * too). `jk` must be a column of both deltas; `aKeys`/`bKeys` are
    * the sides' row identities (the view row's key is their
    * concatenation).
    */
  def appendDay(
      spark: SparkSession,
      root: String,
      deltaA: DataFrame,
      deltaB: DataFrame,
      jk: String,
      aKeys: Seq[String],
      bKeys: Seq[String],
      partitions: Int = 8): Unit = {
    requireGeometry(spark, root, partitions)
    val aCols = deltaA.columns.toSet - jk
    val bCols = deltaB.columns.toSet - jk
    require((aCols & bCols).isEmpty,
      s"ViewStore: column collision ${(aCols & bCols).mkString(",")} — " +
        "the view carries both sides verbatim; rename before ingest")
    val dA = Dedup.materialize(deltaA.withColumn("__jpt", bucket(col(jk), partitions)))
    val dB = Dedup.materialize(deltaB.withColumn("__jpt", bucket(col(jk), partitions)))
    val hasA = !dA.head(1).isEmpty
    val hasB = !dB.head(1).isEmpty
    if (!hasA && !hasB) return
    // base merges first: the delta terms below join the POST-merge
    // bases, so a crash before the view merge replays into the same
    // delta (keyed replaces make every re-run converge)
    if (hasA) ManifestStore.mergeOrCreate(spark, aT(root), dA, aKeys, "__jpt")
    if (hasB) ManifestStore.mergeOrCreate(spark, bT(root), dB, bKeys, "__jpt")
    def leafsOf(d: DataFrame): Seq[String] = d
      .select(col("__jpt")).distinct()
      .collect().map(r => s"__jpt=${r.getLong(0)}").sorted.toSeq
    val dV1 =
      if (!hasA || !ManifestStore.exists(spark, bT(root))) None
      else Some(dA.drop("__jpt").join(
        ManifestStore.readPartitions(spark, bT(root), leafsOf(dA))
          .drop("__jpt"), Seq(jk)))
    val dV2 =
      if (!hasB || !ManifestStore.exists(spark, aT(root))) None
      else {
        val aSurvivors = ManifestStore.readPartitions(spark, aT(root), leafsOf(dB))
          .drop("__jpt")
          .join(dA.select(aKeys.map(col): _*), aKeys, "left_anti")
        Some(aSurvivors.join(dB.drop("__jpt"), Seq(jk)))
      }
    val dV = (dV1, dV2) match {
      case (Some(x), Some(y)) => Some(x.unionByName(y))
      case (Some(x), None) => Some(x)
      case (None, Some(y)) => Some(y)
      case _ => None
    }
    dV.foreach { d =>
      val keyed = Dedup.materialize(
        d.withColumn("__jpt", bucket(col(jk), partitions)))
      if (!keyed.head(1).isEmpty)
        ManifestStore.mergeOrCreate(spark, vT(root), keyed,
          (aKeys ++ bKeys).distinct, "__jpt")
    }
  }

  /** The maintained view — free at read time; the join was paid at
    * ingest.
    */
  def readView(spark: SparkSession, root: String): DataFrame =
    ManifestStore.read(spark, vT(root)).drop("__jpt")
}
