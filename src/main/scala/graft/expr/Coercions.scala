package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Field-type coercions — the engine analogue of the reference's
  * `get_values` type switch (reference cubicerpetl/cubicerpetl.py:676-702)
  * and extract normalization (:336-354).
  *
  * Deliberate deviations from the reference (SURVEY.md §7.4):
  *   - Odoo renders NULL as `False` (:338-339, :347-348); inside the engine
  *     we keep SQL `NULL` and only emulate falsy-null at a connector sink
  *     boundary.
  *   - `Decimal` → `float` (:340-341) becomes an explicit double cast.
  */
object Coercions {

  /** Coerce a column per the reference's Odoo field-type system. */
  def coerce(c: Column, fieldType: String): Column = fieldType match {
    case "char" | "text" | "selection" => c.cast("string")
    // date → 'YYYY-MM-DD' string (ref strftime('%Y-%m-%d'), :684-686)
    case "date"     => date_format(c, "yyyy-MM-dd")
    // datetime → 'YYYY-MM-DD HH:MM:SS' (ref :687-689)
    case "datetime" => date_format(c, "yyyy-MM-dd HH:mm:ss")
    case "int" | "integer" => c.cast("long")
    case "float" | "decimal" => c.cast("double")
    case "many2one" => c.cast("long") // FK id; resolution handled by joins
    case "boolean"  => c.cast("boolean")
    case other => throw new IllegalArgumentException(s"field type: $other")
  }

  /** Odoo falsy-null boundary conversion (sink-side only): null string → "False"
    * analogue is NOT applied inside the engine; this helper exists for a
    * connector sink that needs reference-shaped payloads.
    */
  def odooFalsyNull(c: Column): Column =
    when(c.isNull, lit("False")).otherwise(c.cast("string"))
}
