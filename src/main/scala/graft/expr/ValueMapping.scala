package graft.expr

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.spec.Specs.MappingSpec

/** Value-mapping dictionaries — the reference's `etl.mapping` translate
  * (reference cubicerpetl/cubicerpetl.py:624-649).
  *
  * Reference semantics (get_value_mapping, :643-648):
  *   1. falsy input with `return_null` ⇒ null            (:643-644)
  *   2. input found in the dictionary ⇒ mapped value      (:645, :647)
  *   3. not found, a default line exists ⇒ default        (:640-641, :645-646)
  *   4. not found, no default ⇒ input passes through      (:648)
  *
  * Two physical strategies, both shuffle-free:
  *   - [[apply]]: the dictionary inlined as a literal map expression —
  *     stays inside whole-stage codegen; right for catalog-sized dicts.
  *   - [[applyJoin]]: broadcast-hash left join against a mapping DataFrame —
  *     right when the dictionary itself is a table (still no shuffle on the
  *     fact side; Catalyst broadcasts the dim).
  */
object ValueMapping {

  /** Literal-map strategy: `element_at` on a `map(...)` literal + coalesce
    * chain encoding the default/passthrough rules.
    */
  def apply(src: Column, spec: MappingSpec): Column = {
    val mapped: Column =
      if (spec.entries.isEmpty) lit(null).cast("string")
      else {
        val kvs = spec.entries.toSeq.sortBy(_._1).flatMap { case (k, v) => Seq(lit(k), lit(v)) }
        // try_element_at: missing key ⇒ null (plain element_at throws under
        // ANSI mode, and "not in the dictionary" is a NORMAL case here)
        try_element_at(map(kvs: _*), src.cast("string"))
      }
    val fallback = spec.default match {
      case Some(d) => lit(d)
      case None    => src.cast("string")
    }
    val translated = coalesce(mapped, fallback)
    if (spec.returnNull) when(src.isNull, lit(null).cast("string")).otherwise(translated)
    else translated
  }

  /** Broadcast-join strategy: `mapDF` must have columns (`src`, `dst`).
    * Adds `outCol` to `df`. The join is a broadcast hash join — no shuffle
    * of the fact table, which is what keeps this viable at 100 TB.
    */
  def applyJoin(
      df: DataFrame,
      srcCol: String,
      mapDF: DataFrame,
      outCol: String,
      default: Option[String] = None,
      returnNull: Boolean = false): DataFrame = {
    val m = mapDF.select(col("src").cast("string").as("__vm_src"), col("dst").cast("string").as("__vm_dst"))
    val joined = df.join(broadcast(m), df(srcCol).cast("string") === col("__vm_src"), "left")
    val fallback = default.map(lit).getOrElse(col(srcCol).cast("string"))
    val translated = coalesce(col("__vm_dst"), fallback)
    val out = if (returnNull) when(col(srcCol).isNull, lit(null).cast("string")).otherwise(translated)
              else translated
    joined.withColumn(outCol, out).drop("__vm_src", "__vm_dst")
  }
}
