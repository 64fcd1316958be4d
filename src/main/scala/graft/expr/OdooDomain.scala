package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Odoo-domain → Catalyst `Column` translator.
  *
  * The reference pushes list-of-triples domain filters to the source server
  * (`model.search(eval(rpc_domain))`, reference cubicerpetl/cubicerpetl.py:326-327;
  * also the job filter `[('state','=','ready'),('type','=','batch')]` at :76).
  * Here the same domain language compiles to a Catalyst predicate, so
  * Catalyst's stock pushdown rules carry it into the parquet/JDBC scan —
  * the distributed generalization of the reference's remote `search`.
  *
  * Domain syntax (Odoo polish-prefix notation):
  *   - a term is `(field, op, value)` — modeled as [[OdooDomain.Term]]
  *   - `"&"` / `"|"` are prefix binary connectives, `"!"` prefix unary
  *   - consecutive terms without a connective are implicitly AND-ed
  *
  * Operators: `=`, `!=`, `<`, `<=`, `>`, `>=`, `in`, `not in`, `like`,
  * `not like`, `ilike`, `not ilike`, `=like`, `=ilike`, `=?`. Odoo `like`
  * wraps the value in `%…%` (substring match); `=like` uses the raw
  * pattern. `=` against null matches IS NULL (Odoo falsy-null
  * semantics); `=?` is Odoo's conditional equality — TRUE (term ignored)
  * when the value is null/False, plain `=` otherwise. `child_of`/
  * `parent_of` are deliberately unsupported: they need the model's
  * parent hierarchy (a recursive closure over parent_id), which is not
  * part of a single-relation scan — resolve them to an id list first and
  * push `in`.
  */
object OdooDomain {

  final case class Term(field: String, op: String, value: Any)

  /** Compile a domain (mix of [[Term]] and "&"/"|"/"!" connectives) to a
    * single boolean Column. Empty domain ⇒ `true` (match all), like Odoo.
    */
  def compile(domain: Seq[Any]): Column = {
    if (domain.isEmpty) return lit(true)
    val (c, rest) = parseOne(domain.toList)
    // Consecutive terms without a connective are implicitly AND-ed
    // (Odoo domain normalization).
    if (rest.isEmpty) c else c && compile(rest)
  }

  private def parseOne(items: List[Any]): (Column, List[Any]) = items match {
    case "&" :: tail =>
      val (l, r1) = parseOne(tail)
      val (r, r2) = parseOne(r1)
      (l && r, r2)
    case "|" :: tail =>
      val (l, r1) = parseOne(tail)
      val (r, r2) = parseOne(r1)
      (l || r, r2)
    case "!" :: tail =>
      val (c, r1) = parseOne(tail)
      (!c, r1)
    case (t: Term) :: tail => (term(t), tail)
    case ((f: String, op: String, v: Any)) :: tail => (term(Term(f, op, v)), tail)
    case other => throw new IllegalArgumentException(s"bad domain element: ${other.headOption}")
  }

  private def term(t: Term): Column = {
    val c = col(t.field)
    def v: Column = literal(t.value)
    t.op match {
      case "=" if t.value == null => c.isNull
      case "!=" if t.value == null => c.isNotNull
      case "=?" if t.value == null || t.value == false => lit(true)
      case "=?" => c === v
      case "="  => c === v
      case "!=" | "<>" => c =!= v
      case "<"  => c < v
      case "<=" => c <= v
      case ">"  => c > v
      case ">=" => c >= v
      case "in" => c.isin(seqOf(t.value): _*)
      case "not in" => !c.isin(seqOf(t.value): _*)
      case "like"      => c.like(s"%${t.value}%")
      case "not like"  => !c.like(s"%${t.value}%")
      case "ilike"     => lower(c).like(s"%${t.value.toString.toLowerCase}%")
      case "not ilike" => !lower(c).like(s"%${t.value.toString.toLowerCase}%")
      case "=like"     => c.like(t.value.toString)
      case "=ilike"    => lower(c).like(t.value.toString.toLowerCase)
      case other => throw new IllegalArgumentException(s"unsupported domain op: $other")
    }
  }

  private def literal(v: Any): Column = v match {
    case d: java.time.LocalDate => lit(java.sql.Date.valueOf(d))
    case t: java.time.LocalDateTime => lit(java.sql.Timestamp.valueOf(t))
    case other => lit(other)
  }

  private def seqOf(v: Any): Seq[Any] = v match {
    case s: Seq[_] => s
    case a: Array[_] => a.toSeq
    case other => Seq(other)
  }
}
