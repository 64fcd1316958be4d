package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expr.{Coercions, ValueMapping}
import graft.spec.Specs.{FieldSpec, TransformSpec}

/** The per-row transform pipeline — reference `do_transform` + `get_values`
  * (cubicerpetl/cubicerpetl.py:357-387, :651-703).
  *
  * The reference loops rows and, per field: eval a Python expression over
  * the row → value-mapping translate → type coercion → FK staging. Here the
  * whole field list compiles to ONE narrow `select` of Catalyst columns —
  * no shuffle, fully codegen'd, embarrassingly parallel at any scale.
  *
  * Expression subset: `FieldSpec.expr` is a Spark SQL expression string
  * (the declarative analogue of the reference's per-field `eval`,
  * cubicerpetl.py:676-677). Hooks beyond expressions are Scala functions
  * applied before/after (SURVEY.md §2.9) via [[withHooks]].
  */
object Transformer {

  /** Compile one field spec to a Column. Order matches the reference:
    * expression (or source column) → mapping → coercion; `forced` wins all
    * (file-sink forced_value, cubicerpetl.py:556).
    */
  def fieldColumn(f: FieldSpec): Column = {
    val base: Column = f.forced match {
      case Some(v) => lit(v)
      case None    => f.expr.map(expr).getOrElse(col(f.name))
    }
    val mapped = f.mapping.map(m => ValueMapping(base, m)).getOrElse(base)
    Coercions.coerce(mapped, f.fieldType).as(f.outName)
  }

  /** Apply the transform: one select over all fields; optionally derive the
    * reference's `pk` column (from `pk` or `id`, cubicerpetl.py:658-663).
    */
  def apply(df: DataFrame, spec: TransformSpec): DataFrame = {
    val cols = spec.fields.map(fieldColumn)
    val withPk = spec.pkField match {
      case Some(pk) if !spec.fields.exists(_.outName == "pk") =>
        cols :+ col(pk).cast("string").as("pk")
      case _ => cols
    }
    df.select(withPk: _*)
  }

  /** Dataset-level hooks (prev/post, reference :369-384): plain DataFrame →
    * DataFrame Scala functions. Opaque per-partition logic should use
    * `df.mapPartitions` inside the hook; declarative logic should stay in
    * Column expressions so Catalyst can see through it.
    */
  def withHooks(
      df: DataFrame,
      spec: TransformSpec,
      prev: DataFrame => DataFrame = identity,
      post: DataFrame => DataFrame = identity): DataFrame =
    post(apply(prev(df), spec))
}
