package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Deequ/Great-Expectations
  * pattern): a check suite evaluated against a table, producing one row
  * per check with its violation count — the contract gate a pipeline
  * runs before promoting a day's data, and the audit trail it keeps.
  *
  * 100 TB design: every ROW-LOCAL check (null, range, accepted values)
  * and the uniqueness check compile into aggregate expressions of ONE
  * map-side-combined pass over the table — adding checks adds columns
  * to that single aggregation, not passes. Referential-integrity checks
  * each need their own anti-join (a second table is involved), planned
  * as broadcast when the reference's key set fits. Everything stays a
  * DataFrame end to end — no driver-side counting.
  */
object Expectations {

  sealed trait Check { def id: String; def column: String }
  /** Violations: rows where `column` IS NULL. */
  final case class NotNull(id: String, column: String) extends Check
  /** Violations: non-null values outside [lo, hi]. */
  final case class InRange(id: String, column: String, lo: Double, hi: Double) extends Check
  /** Violations: non-null values not in `values`. */
  final case class Accepted(id: String, column: String, values: Seq[String]) extends Check
  /** Violations: non-null rows minus distinct non-null values — 0 iff
    * every non-null value appears exactly once. */
  final case class Unique(id: String, column: String) extends Check
  /** Violations: non-null values with no match in `ref`'s `refColumn`. */
  final case class RefIntegrity(id: String, column: String,
      ref: DataFrame, refColumn: String) extends Check

  /** Evaluate the suite: (check_id, check_type, col_name, n_violations,
    * pass) — one row per check, in no guaranteed order (sort on
    * check_id to present).
    */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "Expectations.audit: empty check suite")
    require(checks.map(_.id).distinct.size == checks.size,
      s"Expectations.audit: duplicate check ids in ${checks.map(_.id)}")
    val local = checks.filter(!_.isInstanceOf[RefIntegrity])
    val refs = checks.collect { case r: RefIntegrity => r }
    val parts = (if (local.nonEmpty) Seq(localAudit(df, local)) else Nil) ++
      refs.map(refAudit(df, _))
    parts.reduce(_.unionByName(_))
      .withColumn("pass", col("n_violations") === 0L)
  }

  private def violations(c: Check): Column = c match {
    case NotNull(_, cn) => sum(when(col(cn).isNull, 1L).otherwise(0L))
    case InRange(_, cn, lo, hi) => sum(when(col(cn).isNotNull &&
      (col(cn) < lo || col(cn) > hi), 1L).otherwise(0L))
    case Accepted(_, cn, vs) => sum(when(col(cn).isNotNull &&
      !col(cn).isin(vs: _*), 1L).otherwise(0L))
    case Unique(_, cn) =>
      count(when(col(cn).isNotNull, 1L)) - count_distinct(col(cn))
    case _: RefIntegrity =>
      throw new IllegalStateException("ref checks take the anti-join path")
  }

  private def kind(c: Check): String = c match {
    case _: NotNull => "not_null"
    case _: InRange => "in_range"
    case _: Accepted => "accepted"
    case _: Unique => "unique"
    case _: RefIntegrity => "ref_integrity"
  }

  private def localAudit(df: DataFrame, local: Seq[Check]): DataFrame = {
    val aggs = local.map(c => violations(c).cast("long").as(c.id))
    // coalesce(0): aggregates of an EMPTY table return null counts; an
    // empty table violates nothing
    val wide = df.agg(aggs.head, aggs.tail: _*)
    wide.select(explode(array(local.map(c => struct(
      lit(c.id).as("check_id"), lit(kind(c)).as("check_type"),
      lit(c.column).as("col_name"),
      coalesce(col(c.id), lit(0L)).as("n_violations"))): _*)).as("__c"))
      .select(col("__c.check_id"), col("__c.check_type"),
        col("__c.col_name"), col("__c.n_violations"))
  }

  private def refAudit(df: DataFrame, r: RefIntegrity): DataFrame =
    df.select(col(r.column).as("__v")).filter(col("__v").isNotNull)
      .join(r.ref.select(col(r.refColumn).as("__v")).distinct(),
        Seq("__v"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(r.id).as("check_id"), lit(kind(r)).as("check_type"),
        lit(r.column).as("col_name"), col("n_violations"))
}
