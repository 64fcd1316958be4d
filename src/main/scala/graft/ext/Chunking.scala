package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for training/retrieval pipelines (extension
  * surface, SURVEY.md §2.12): split each document into overlapping
  * token windows — the standard context-window / RAG-passage prep step
  * (size-N windows every `stride` tokens, tail window shorter).
  *
  * Scale shape: one narrow projection computes the token array and the
  * start offsets (`sequence`), one generator (`posexplode`) emits the
  * chunks — no shuffle at all; chunk rows inherit the scan's
  * partitioning, so a 100 TB corpus chunks at scan speed and the
  * output is already well-distributed for a downstream embed/tokenize
  * stage. Offsets (`start_tok`, `n_toks`) ride along so a chunk can be
  * traced back to its document span without re-tokenizing.
  */
object Chunking {

  /** Overlapping token-window chunks of `textCol`. One output row per
    * chunk: id column(s), `chunk_idx` (0-based), `start_tok`, `n_toks`,
    * `chunk_text` (tokens re-joined with single spaces). Empty/token-less
    * docs emit no row. Windows start at 0, `stride`, 2·stride, … while
    * the start is inside the document; the final windows may be shorter
    * than `size` (tail is kept — dropping it silently loses corpus).
    */
  def tokenChunks(
      df: DataFrame,
      idCols: Seq[String],
      textCol: String,
      size: Int,
      stride: Int): DataFrame = {
    require(size > 0 && stride > 0, s"tokenChunks: size=$size, stride=$stride")
    val toks: Column = TextAnalysis.tokens(col(textCol))
    val withToks = df
      .select(idCols.map(col) :+ toks.as("__toks"): _*)
      .filter(org.apache.spark.sql.functions.size(col("__toks")) > 0)
      .withColumn("__starts",
        sequence(lit(0), org.apache.spark.sql.functions.size(col("__toks")) - 1, lit(stride)))
    withToks
      .select(idCols.map(col) :+ posexplode(col("__starts")).as(Seq("chunk_idx", "__s")) :+
        col("__toks"): _*)
      .select(
        idCols.map(col) ++ Seq(
          col("chunk_idx").cast("long").as("chunk_idx"),
          col("__s").cast("long").as("start_tok"),
          least(lit(size),
            org.apache.spark.sql.functions.size(col("__toks")) - col("__s"))
            .cast("long").as("n_toks"),
          concat_ws(" ", slice(col("__toks"), col("__s") + 1, lit(size))).as("chunk_text")): _*)
  }
}
