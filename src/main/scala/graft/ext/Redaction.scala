package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction for training-data pipelines (extension
  * surface, SURVEY.md §2.12). The standard pre-training scrub: find
  * email / IP / phone-shaped spans, count them per category (the audit
  * signal a pipeline reports per source), and replace them with stable
  * placeholder tokens so downstream dedup still clusters scrubbed docs.
  *
  * All expression-only (`regexp_count` / `regexp_replace` are codegen'd)
  * — a narrow per-row map, zero shuffles, linear scale-out; at 100 TB
  * this runs at scan speed inside whole-stage codegen.
  *
  * Pattern dialect is the portable intersection of Java regex (Spark)
  * and RE2 (DuckDB oracle): character classes, bounded repetition,
  * non-capturing groups, `\b` word boundaries — no lookarounds or
  * backreferences, so both engines match identical spans with
  * leftmost-first semantics.
  */
object Redaction {

  /** (category, pattern, placeholder) — applied in order; placeholders
    * contain no digits/@ so a later pattern can never re-match an
    * earlier replacement.
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\+\\d(?:[ -]?\\d){7,14}", "<PHONE>"))

  /** Per-category match count on the RAW text (pre-redaction audit). */
  def piiCount(text: Column, category: String): Column = {
    val pat = PiiPatterns.find(_._1 == category)
      .getOrElse(throw new IllegalArgumentException(s"unknown PII category: $category"))._2
    regexp_count(text, lit(pat)).cast("long")
  }

  /** Text with every PII span replaced by its category placeholder. */
  def redact(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (_, pat, tok)) =>
      regexp_replace(c, pat, tok)
    }
}
