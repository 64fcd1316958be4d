package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines
  * (extension surface mandated by BASELINE.json; not in the reference —
  * SURVEY.md §2.12). All variants are expression-only (no UDFs) so every
  * stage stays inside whole-stage codegen, and all pair generation is
  * candidate-pruned (LSH bands / pigeonhole blocks / inverted index with
  * frequency cutoff) — never an O(n²) cross join — so the shapes hold at
  * 100 TB where n² is off the table.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup with a DETERMINISTIC keeper: first row per key group by
    * `tiebreak` order. (Spark's dropDuplicates keeps an arbitrary row —
    * unacceptable for reproducible corpora.) One shuffle on the key.
    */
  def exact(df: DataFrame, keys: Seq[String], tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tiebreak)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact-duplicate clusters: normalized key → keeper id + group size.
    * Map-side partial aggregation makes this one key-shuffle of
    * (key, id) pairs only, not of document payloads.
    */
  def exactClusters(df: DataFrame, key: Column, id: Column): DataFrame =
    df.groupBy(key.as("dup_key"))
      .agg(min(id).as("keeper_id"), count(lit(1)).as("dup_count"))

  // ------------------------------------------------------------- shingles

  /** Whitespace tokens, lowercased. */
  def words(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Distinct word n-gram shingles as array<string>. */
  def wordShingles(text: Column, n: Int): Column = {
    val w = words(text)
    val count = greatest(size(w) - (n - 1), lit(0))
    array_distinct(transform(sequence(lit(1), count), i => concat_ws(" ", slice(w, i, lit(n)))))
  }

  /** Exact Jaccard similarity of two shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0d, lit(0d)).otherwise(inter / union)
  }

  // ------------------------------------------------------------- MinHash

  /** MinHash signature: k minimums of per-shingle seeded xxhash64. */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(1), lit(k)),
      h => array_min(transform(shingles, s => xxhash64(s, h))))

  /** LSH band keys: hash each r-row band of the signature. */
  def bandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b =>
      xxhash64(slice(signature, b * rowsPerBand + 1, rowsPerBand))): _*)

  /** MinHash+LSH near-duplicate pairs, verified with exact Jaccard.
    *
    * Pipeline: shingle → minhash(bands×rowsPerBand) → band-bucket self-join
    * (the ONLY shuffle that touches pairs, and only same-bucket pairs) →
    * distinct candidates → exact-Jaccard verify ≥ threshold.
    *
    * Scale notes: bucket join keys are (band index, 64-bit band hash), so
    * candidate volume ≈ true-duplicate volume; rowsPerBand=2, bands=32
    * gives P(candidate | jaccard=s) = 1-(1-s²)³² — ≥ 1-4e-10 at s ≥ 0.7,
    * so recall at any verify threshold ≥ 0.7 is effectively exact.
    * Shingle arrays ride along only into the final verify join.
    */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      bands: Int = 32,
      rowsPerBand: Int = 2,
      threshold: Double = 0.7): DataFrame = {
    val sh = df.select(col(idCol).as("id"), wordShingles(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
    val sig = sh.withColumn("bands", bandKeys(minhashSignature(col("sh"), bands * rowsPerBand), bands, rowsPerBand))
    val buckets = sig.select(col("id"), posexplode(col("bands")).as(Seq("band", "bkey")))
    val cands = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cands
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // ---------------------------------------------- exact n-gram Jaccard

  /** ALL pairs with exact shingle-Jaccard ≥ threshold via an inverted
    * index: post (shingle → id), self-join postings, count co-occurrences,
    * Jaccard from |A∩B| and set sizes. `maxPostingLen` drops ubiquitous
    * shingles (standard df-cutoff) to bound the quadratic blowup of hot
    * postings; the same cutoff must be applied by any oracle.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      threshold: Double,
      maxPostingLen: Long = 1000): DataFrame = {
    val sh = df.select(col(idCol).as("id"), wordShingles(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
    val sizes = sh.select(col("id"), size(col("sh")).as("n"))
    val posts = sh.select(col("id"), explode(col("sh")).as("s"))
    val kept = posts.withColumn("__df", count(lit(1)).over(Window.partitionBy(col("s"))))
      .filter(col("__df") <= maxPostingLen).drop("__df")
    val inter = kept.as("a").join(kept.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // ------------------------------------------------------------- SimHash

  /** 64-bit SimHash over word tokens: bit b of the fingerprint is the sign
    * of Σ_tokens (±1 by bit b of xxhash64(token)). Expression-only.
    */
  def simhash64(text: Column): Column = {
    // hash each token once; bit b of the fingerprint = sign of the vote sum
    val hashes = transform(words(text), t => xxhash64(t))
    val bits: Seq[Column] = (0 until 64).map { b =>
      when(aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L)
      ) > 0, lit(1L)).otherwise(lit(0L))
    }
    // assemble MSB-first into one long (bit 63 folded in last; signed
    // wraparound is fine for a hash value)
    bits.foldLeft(lit(0L))((acc, bit) => shiftleft(acc, 1).bitwiseOR(bit))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist (default 3).
    * Blocking: split the 64-bit fingerprint into maxDist+1 chunks — by
    * pigeonhole, any pair within maxDist matches on ≥1 whole chunk, so
    * recall is EXACT while the join key (chunk index, chunk value) prunes
    * candidates to near-duplicate volume.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxDist: Int = 3): DataFrame = {
    val chunks = maxDist + 1
    val bitsPer = 64 / chunks
    val f = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("fp"))
    val blocked = f.select(col("id"), col("fp"), posexplode(
      array((0 until chunks).map(i =>
        shiftrightunsigned(col("fp"), i * bitsPer)
          .bitwiseAND(lit((1L << bitsPer) - 1))): _*)).as(Seq("chunk", "ckey")))
    blocked.as("a").join(blocked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  // ------------------------------------------- embedding cosine near-dup

  /** Embedding near-dup pairs: cosine ≥ threshold within blocking groups.
    * `blockKey` is the scale lever — at 100 TB you block on a coarse
    * quantization / metadata key so each block is small; within-block
    * comparison is a self-join on the key.
    */
  def embeddingPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      blockKey: Column,
      threshold: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"), blockKey.as("blk"))
      .withColumn("nrm", sqrt(Similarity.dot(col("v"), col("v"))))
    v.as("a").join(v.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .withColumn("cosine",
        Similarity.dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
  }
}
