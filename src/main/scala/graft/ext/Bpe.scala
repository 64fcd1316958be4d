package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning (Sennrich et al. 2016) — the
  * tokenizer-induction pass a training-data pipeline runs over its corpus.
  * Classic BPE, distributed the way it actually scales:
  *
  *  - the corpus collapses ONCE to the weighted vocabulary (distinct word
  *    → count) — every later round is corpus-size-INDEPENDENT, touching
  *    only the vocab table;
  *  - each round is one pair-count aggregation over the vocab's adjacent
  *    symbol pairs (weighted by word count, map-side combined), an argmax
  *    planned as TakeOrderedAndProject(limit=1) — never a full sort — and
  *    a narrow per-word re-encode;
  *  - the chosen merge is the round's 1-row model parameter, collected to
  *    the driver exactly like x67's k-means centroids — rounds are
  *    inherently sequential (round r's counts depend on merge r−1);
  *  - the re-encode loop checkpoints each round via Dedup.materialize (standing invariant:
  *    iterative DataFrame chains re-analyze exponentially otherwise).
  *
  * Merge application uses non-regex `replace` on the space-joined symbol
  * encoding — left-to-right, non-overlapping, scan resuming AFTER each
  * replacement. On runs of a repeated symbol this consumes the separating
  * space, so e.g. `l l l l l` under merge (l,l) becomes `ll l ll`, not
  * greedy-BPE's `ll ll l`; the deviation only affects ≥3-runs of one
  * symbol and is identical in any engine with standard replace semantics
  * (JVM UTF8String.replace ≡ DuckDB replace — verified).
  */
object Bpe {

  /** Learn `rounds` merges over the corpus; returns (merge_rank,
    * left_sym, right_sym, pair_count) — one row per learned merge, fewer
    * if the vocabulary runs out of adjacent pairs. Ties on pair count
    * break on (left, right) ascending.
    */
  def learnMerges(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    run(docs, idCol, textCol, rounds)._1
      .toDF("merge_rank", "left_sym", "right_sym", "pair_count")
  }

  /** The weighted vocabulary ENCODED by the learned merges: (w, cnt,
    * seq) with `seq` the space-joined symbol sequence after `rounds`
    * merge applications — the tokenizer-side view of the same training
    * run (symbol statistics over it are the induced vocabulary's).
    */
  def encodeVocab(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      rounds: Int): DataFrame =
    run(docs, idCol, textCol, rounds)._2

  private def run(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      rounds: Int): (Seq[(Long, String, String, Long)], DataFrame) = {
    require(rounds >= 1, s"Bpe: rounds=$rounds must be >= 1")
    var seqDf = Dedup.materialize(LangModel.tokenRows(docs, idCol, textCol)
      .groupBy(col("w")).agg(sum(lit(1L)).as("cnt"))
      .withColumn("seq", trim(regexp_replace(col("w"), "(.)", "$1 "))))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val toks = seqDf.select(col("w"), col("cnt"),
        posexplode(split(col("seq"), " ")).as(Seq("pos", "s")))
      val byW = Window.partitionBy(col("w")).orderBy(col("pos"))
      val top = toks.withColumn("s2", lead(col("s"), 1).over(byW))
        .filter(col("s2").isNotNull)
        .groupBy(col("s"), col("s2")).agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("s"), col("s2")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val Row(a: String, b: String, pc: Long) = top(0)
        // symbols are [a-z0-9]+ concatenations by construction (the
        // tokenizer strips everything else) — safe to splice into SQL
        require(a.matches("[a-z0-9]+") && b.matches("[a-z0-9]+"),
          s"Bpe: unexpected symbol '$a'/'$b'")
        merges += ((r.toLong, a, b, pc))
        seqDf = Dedup.materialize(seqDf.withColumn("seq",
            trim(expr(s"replace(concat(' ', seq, ' '), ' $a $b ', ' $a$b ')"))))
      }
      r += 1
    }
    (merges.toSeq, seqDf)
  }
}
