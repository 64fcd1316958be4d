package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.ManifestStore

/** Day-over-day MAINTAINED near-dup cluster labels — the missing piece
  * between [[DedupStores]] (which maintains the PAIR-GENERATING index)
  * and [[Dedup.duplicateClusters]] (which computes labels in one batch
  * pass): a persisted (id, label) table that a day's new pairs fold
  * into WITHOUT recomputing components over the historical pair graph.
  *
  * The incremental-merge insight that keeps labels exact: a cluster's
  * label is its MIN member id, and every stored member carries an edge
  * to that label implicitly. So when new pairs arrive, the component
  * computation only needs the NEW edges plus one (member → old label)
  * edge per member of an AFFECTED cluster — a graph of O(affected
  * members + day pairs), never the historical pair list. Components of
  * that small graph have the same min-member labels the full-graph
  * batch pass would assign (min(min A, min B) = min(A ∪ B)), so the
  * store equals [[Dedup.duplicateClusters]] over the union of all
  * pairs ever appended — the x147 gate's oracle.
  *
  * 100 TB shape, per daily append: ONE column-pruned co-keyed scan of
  * the store resolves the touched ids' current labels (at production
  * scale this lookup would ride an id-bucketed twin index for
  * partition-pruned probes — the [[DedupStores]] layout note); member
  * retrieval prunes to the affected labels' hash-bucket partitions
  * ([[ManifestStore.readPartitions]]); the component pass runs on the
  * affected subgraph only; and the merge + scoped delete rewrite
  * touched partitions. Re-appending a day is IDEMPOTENT: the local
  * recompute reproduces the already-stored labels and the keyed merge
  * replaces rather than duplicates (row accounting `require`d in the
  * gate). The merge and stale-copy delete are two commits, ordered so
  * a crash between them leaves an id visible under BOTH labels (never
  * missing) and the next replay converges; a reader inside that window
  * sees the duplicate — production serializes readers against the
  * append the same way the streaming sinks fence replays.
  */
object ClusterStore {

  private def bucket(c: org.apache.spark.sql.Column, partitions: Int) =
    pmod(xxhash64(c.cast("string")), lit(partitions.toLong))

  private def writeGeometry(spark: SparkSession, table: String, partitions: Int): Unit =
    StoreSidecar.write(spark, table, Seq("partitions" -> partitions.toLong))

  /** A partitions mismatch hashes existing labels to different buckets:
    * member retrieval misses them and the store accumulates duplicate
    * ids — fail loudly instead (the [[DedupStores]] sidecar cure).
    */
  private def requireGeometry(spark: SparkSession, table: String, partitions: Int): Unit = {
    val got = StoreSidecar.read(spark, table, Seq("partitions"))
      .map(_("partitions").toInt)
    require(got.isDefined,
      s"ClusterStore: $table has no geometry sidecar — build() first")
    require(got.contains(partitions),
      s"ClusterStore: $table was built with partitions=${got.get}, not $partitions")
  }

  /** Initialize the store from a pair set: labels = min-member
    * components, partitioned by the LABEL's hash bucket so later
    * appends retrieve an affected cluster's members with a
    * partition-pruned read.
    */
  def build(
      spark: SparkSession,
      pairs: DataFrame,
      table: String,
      partitions: Int = 8): Unit = {
    writeGeometry(spark, table, partitions)
    val labels = Dedup.duplicateClusters(pairs)
      .withColumn("pt", bucket(col("label"), partitions))
    ManifestStore.write(spark, labels, table, "pt")
  }

  /** Fold a day's new pairs in. Touches O(affected members + day
    * pairs) everywhere except the one co-keyed id→label lookup scan
    * (see the object scaladoc).
    */
  def appendPairs(
      spark: SparkSession,
      newPairs: DataFrame,
      table: String,
      partitions: Int = 8,
      idA: String = "id_a",
      idB: String = "id_b"): Unit = {
    requireGeometry(spark, table, partitions)
    val touched = Dedup.materialize(
      newPairs.select(col(idA).as("id"))
        .unionByName(newPairs.select(col(idB).as("id"))).distinct())
    if (touched.head(1).isEmpty) return // an empty day changes nothing
    // a store legitimately built from a no-dup-pairs day 0 has zero
    // partitions; treat it as "no stored members" instead of bricking
    // every later append on the read (the realistic first-day case)
    val members = Dedup.materialize(
      try {
        val stored = ManifestStore.read(spark, table)
        val oldLabels = Dedup.materialize(
          stored.join(touched, Seq("id")).select(col("label")).distinct())
        val leafs = oldLabels
          .select(bucket(col("label"), partitions).as("pt")).distinct()
          .collect().map(r => s"pt=${r.getLong(0)}").sorted
        ManifestStore.readPartitions(spark, table, leafs.toSeq)
          .join(oldLabels, Seq("label"))
          .select(col("id"), col("label"))
      } catch {
        case _: IllegalStateException =>
          newPairs.select(col(idA).as("id"), col(idA).as("label")).limit(0)
      })
    // the affected subgraph: new edges + one (member -> old label) edge
    // per affected member — components of THIS graph carry the exact
    // min-member labels of the full-graph batch pass
    val edges = newPairs.select(col(idA).as("id_a"), col(idB).as("id_b"))
      .unionByName(members.select(col("id").as("id_a"), col("label").as("id_b")))
    val relabeled = Dedup.materialize(Dedup.duplicateClusters(edges)
      .withColumn("pt", bucket(col("label"), partitions)))
    // MERGE FIRST, then drop the stale copies of relabeled members from
    // their OLD partitions. The reverse order (delete first) loses
    // members forever if the process dies between the two commits; this
    // order's crash window only leaves an id visible under both labels,
    // and REPLAYING the append converges: the lookup sees both labels,
    // the recompute reproduces the final labels, and the scoped delete
    // clears the stale copy. A completed append replayed again is one
    // idempotent merge commit (no stale rows -> no delete commit).
    ManifestStore.merge(spark, table, relabeled, Seq("id"), "pt")
    val stale = members
      .withColumn("__op", bucket(col("label"), partitions))
      .join(relabeled.select(col("id"), col("pt").as("__np")), Seq("id"))
      .filter(col("__op") =!= col("__np"))
      .select(col("id"), col("__op").as("pt"))
    if (!stale.head(1).isEmpty)
      ManifestStore.delete(spark, table, stale, Seq("id"), Seq("pt"))
  }

  /** The current (id, label) table. */
  def readLabels(spark: SparkSession, table: String): DataFrame =
    ManifestStore.read(spark, table).select(col("id"), col("label"))
}
