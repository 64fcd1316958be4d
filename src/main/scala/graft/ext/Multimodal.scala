package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing (extension surface,
  * SURVEY.md §2.12): media as opaque `binary` columns + typed metadata,
  * with decode/feature-extraction as batched per-partition functions.
  *
  * The Spark-side shapes (schema, partition sizing, batch iteration) are
  * real and tested; the codec itself is STUBBED deterministically because
  * this container has no image/audio libraries — swap [[decodeStub]]'s body
  * for an actual decoder (e.g. javax.imageio / ffmpeg bindings) in a real
  * deployment. Binary payloads are the scale hazard: size partitions by
  * bytes (`spark.sql.files.maxPartitionBytes`), never collect blobs, and
  * keep metadata in separate (pruned) columns so metadata-only queries
  * never touch the blob column thanks to parquet column pruning.
  */
object Multimodal {

  /** Typed row for the decode stage. */
  final case class MediaBlob(media_id: Long, blob: Array[Byte])
  final case class MediaFeatures(
      media_id: Long,
      byte_len: Long,
      width: Int,
      height: Int,
      features: Array[Double])

  /** Metadata over an opaque binary column — pure expressions, no decode:
    * byte length, content digest, magic prefix (format sniffing).
    */
  def withMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("byte_len", length(col(binCol)).cast("long"))
      .withColumn("digest", md5(col(binCol)))
      .withColumn("magic", upper(hex(substring(col(binCol), 1, 4))))

  /** Batched decode / feature-extract over partitions — the mapInPandas
    * analogue in Scala: one iterator pass per partition, constant memory,
    * codec state reusable across the batch. STUB: emits deterministic fake
    * dimensions/features derived from the bytes so tests are reproducible.
    */
  def decodeStub(ds: Dataset[MediaBlob]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    ds.mapPartitions { it =>
      // real impl: initialize the codec ONCE here, reuse across rows
      it.map { m =>
        val len = m.blob.length.toLong
        // deterministic fake "decode": dims from length, features = bytewise
        // moments — replace with actual pixel decode in production
        val width = (len % 640 + 1).toInt
        val height = (len % 480 + 1).toInt
        val sums = new Array[Double](4)
        var i = 0
        while (i < m.blob.length) {
          val b = m.blob(i) & 0xff
          sums(i % 4) += b.toDouble
          i += 1
        }
        val feats = sums.map(s => if (len == 0) 0.0 else s / len.toDouble)
        MediaFeatures(m.media_id, len, width, height, feats)
      }
    }
  }

  /** Typed row for the perceptual-hash stage. */
  final case class MediaHash(media_id: Long, phash: Long)

  /** Perceptual difference hash (dHash — the standard public
    * image-near-dup recipe: resize to a 9×8 grayscale grid, emit one
    * bit per horizontally adjacent pixel pair, Hamming distance ≈
    * perceptual distance) over the STUBBED decode: the 9×8 grid is
    * sampled deterministically from the payload bytes (cell k of 72
    * reads byte ⌊k·len/72⌋ — the "resize") instead of decoded pixels,
    * the same stub convention as [[decodeStub]]/x191. The dHash
    * ALGORITHM — grid → adjacent-compare → 64 bits — and the Spark
    * plumbing (one mapPartitions pass, codec state reusable per
    * partition, constant memory) are the production shape; swap the
    * grid sampler for a real resize+grayscale in deployment.
    *
    * Bit layout: bit (r·8 + c) is set iff grid(r, c+1) > grid(r, c),
    * rows r and columns c in 0..7 over the 9-wide grid. Empty payloads
    * hash to 0. Deterministic, so the whole pipeline oracles.
    */
  def dHash64(ds: Dataset[MediaBlob]): Dataset[MediaHash] = {
    implicit val enc = Encoders.product[MediaHash]
    ds.mapPartitions { it =>
      // real impl: initialize the resize/grayscale codec ONCE here
      it.map { m =>
        val len = m.blob.length
        var h = 0L
        if (len > 0) {
          var r = 0
          while (r < 8) {
            var c = 0
            while (c < 8) {
              val k1 = r * 9 + c
              val p1 = m.blob(((k1.toLong * len) / 72L).toInt) & 0xff
              val p2 = m.blob((((k1 + 1).toLong * len) / 72L).toInt) & 0xff
              if (p2 > p1) h |= 1L << (r * 8 + c)
              c += 1
            }
            r += 1
          }
        }
        MediaHash(m.media_id, h)
      }
    }
  }

  /** Perceptual near-dup pairs over a media corpus: [[dHash64]] bits →
    * Hamming-banded candidate blocks → exact popcount verify, i.e. the
    * x06 simhash pigeonhole machinery ([[Dedup.hammingPairs64]]) fed by
    * the perceptual hash instead of the token hash. Exact recall at
    * `maxDist` (see hammingPairs64); output (id_a, id_b, hamming).
    */
  def perceptualPairs(ds: Dataset[MediaBlob], maxDist: Int = 3): DataFrame =
    Dedup.hammingPairs64(
      dHash64(ds).toDF().select(col("media_id").as("id"), col("phash").as("fp")),
      maxDist)

  /** Frame-sampling shape for video-like payloads: split a blob into fixed
    * windows ("frames") and emit one row per sampled frame — the explode
    * pattern that keeps frame rows independent (and thus redistributable)
    * downstream. Stub: frames are byte slices.
    */
  def sampleFrames(df: DataFrame, binCol: String, frameBytes: Int, everyNth: Int): DataFrame = {
    val nFrames = ceil(length(col(binCol)).cast("double") / frameBytes).cast("int")
    // empty-blob guard: Spark's sequence(0, -1) DESCENDS instead of being
    // empty, which would emit bogus frames for zero-length payloads
    val idxs = when(nFrames <= 0, array().cast("array<int>"))
      .otherwise(filter(sequence(lit(0), greatest(nFrames, lit(1)) - 1), i => i % everyNth === 0))
    df.withColumn("frame_idx", explode(idxs))
      .withColumn("frame_bytes",
        expr(s"substring($binCol, frame_idx * $frameBytes + 1, $frameBytes)"))
  }

  /** Aspect-ratio bucketing + budgeted batch packing — the multimodal
    * batch shaper image-training pipelines run (the public SDXL-style
    * recipe): each image snaps to the NEAREST ratio in a fixed `ladder`
    * (so a batch shares one crop geometry), then each bucket packs into
    * batches in id order with the standard PREFIX-PACKING bound: a
    * batch's total cost is < `budgetCost` + its last item's cost (the
    * exclusive-prefix-sum div assigns each item by the cost BEFORE it,
    * so one item may overhang the budget — and a single item costlier
    * than the whole budget still forms one batch). Callers needing a
    * hard cap must size `budgetCost` ≥ the max item cost + slack.
    * Snapping is spelled as
    * explicit midpoint boundaries (`ratio < (b_i + b_{i+1})/2` → b_i) —
    * no argmin, no ties, the same IEEE comparisons in any engine, so
    * the whole assignment oracles exactly.
    *
    * Scale shape: bucket assignment is a narrow codegen'd map; packing
    * is one cumulative-sum window per bucket (`batch_seq =
    * exclusive-prefix-cost div budget` — exact integer arithmetic).
    * Buckets are few (the ladder) and batches within them ordered, so
    * the window partition is bucket-sized — for a corpus where one
    * bucket dominates, the two-phase salted prefix sum
    * ([[Packing]]/[[Sharding.planShards]]) is the drop-in upgrade, same
    * semantics.
    *
    * Output: input id + `ratio_bucket` (the snapped ladder value),
    * `batch_seq` (0-based within the bucket), and the row's cost.
    */
  def aspectBatches(
      df: DataFrame,
      idCol: String,
      wCol: String,
      hCol: String,
      costCol: String,
      ladder: Seq[Double],
      budgetCost: Long): DataFrame = {
    require(ladder.nonEmpty && ladder == ladder.sorted && ladder.distinct == ladder,
      s"aspectBatches: ladder must be sorted distinct, got $ladder")
    require(budgetCost > 0, s"aspectBatches: budgetCost=$budgetCost")
    val ratio = col(wCol).cast("double") / col(hCol).cast("double")
    val mids = ladder.sliding(2).collect { case Seq(a, b) => (a + b) / 2.0d }.toSeq
    val bucket = mids.zipWithIndex.foldRight(lit(ladder.last): Column) {
      case ((mid, i), acc) => when(ratio < lit(mid), lit(ladder(i))).otherwise(acc)
    }
    val byBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ratio_bucket")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("ratio_bucket", bucket)
      .withColumn("__cum", coalesce(sum(col(costCol).cast("long")).over(byBucket), lit(0L)))
      .withColumn("batch_seq", expr(s"__cum div ${budgetCost}L"))
      .select(col(idCol), col("ratio_bucket"),
        col(costCol).cast("long").as("cost"), col("batch_seq"))
  }

  /** Cross-modality referential-integrity audit: per group, how many
    * primary rows have a companion row in the other modality (doc →
    * embedding coverage), plus one `__no_primary__` row counting
    * companions with NO primary (orphans — stale embeddings after a doc
    * delete, or an upstream id-space bug). Two one-shuffle outer joins
    * on the id; the pipeline-health check every multimodal corpus runs
    * before training ("which sources are missing their embeddings?").
    * Output: (groupCol, n_primary, n_matched, coverage 6 dp).
    */
  def coverageAudit(
      primary: DataFrame,
      companion: DataFrame,
      primaryId: String,
      companionId: String,
      groupCol: String): DataFrame = {
    val comp = companion.select(col(companionId).as("__cid")).distinct()
    val matched = primary
      .join(comp, primary(primaryId) === col("__cid"), "left")
      .groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n_primary"),
        sum(when(col("__cid").isNotNull, 1L).otherwise(0L)).as("n_matched"))
    val prim = primary.select(col(primaryId).as("__pid")).distinct()
    val orphans = comp
      .join(prim, col("__cid") === col("__pid"), "left_anti")
      .agg(count(lit(1)).as("n_orphan"))
      .select(lit("__no_primary__").as("g"), lit(0L).as("n_primary"),
        col("n_orphan").as("n_matched"))
    matched.unionByName(orphans)
      .select(col("g").as(groupCol), col("n_primary"), col("n_matched"),
        when(col("n_primary") === 0L, lit(0.0d))
          .otherwise(round(col("n_matched").cast("double") /
            col("n_primary").cast("double"), 6)).as("coverage"))
  }
}
