package graft.spec

import org.json4s._
import org.json4s.jackson.JsonMethods

import Specs._

/** JSON loader for job specs — the config-file analogue of the
  * reference's server-side catalog (`etl.job` + linked records fetched
  * over XML-RPC, SURVEY.md §1.5). A job definition becomes a checked-in
  * JSON document instead of mutable server state.
  *
  * Shape (all transform/mapping fields optional with reference defaults):
  * {{{
  * { "name": "orders_job", "date": "2024-01-15",
  *   "extract": {"file": {"path": "/data/{aaaa}{mm}{dd}/orders.csv", "type": "csv",
  *                        "dialect": {"separator": "|", "header": false}}},
  *   "transform": {"reprocess": "update", "pk": "o_orderkey",
  *     "fields": [
  *       {"name": "o_orderkey", "as": "okey", "type": "int"},
  *       {"name": "o_orderstatus", "as": "status",
  *        "mapping": {"entries": {"F": "done"}, "default": "?", "returnNull": true}},
  *       {"name": "ref", "expr": "concat('R-', o_orderkey)"}]},
  *   "rowDefaults": {"batch_tag": "B1"} }
  * }}}
  *
  * Connector extract:
  * {{{ "extract": {"connector": {"model": "orders_model",
  *      "domain": [["o_orderstatus", "=", "F"]], "fields": ["o_orderkey"]}} }}}
  */
object SpecLoader {

  def fromJson(json: String): JobSpec = {
    val j = JsonMethods.parse(json)
    JobSpec(
      name = str(j \ "name").getOrElse(fail("name")),
      date = java.time.LocalDate.parse(str(j \ "date").getOrElse(fail("date"))),
      extract = parseExtract(j \ "extract"),
      transform = parseTransform(j \ "transform"),
      rowDefaults = (j \ "rowDefaults") match {
        case JObject(fields) => fields.map { case (k, v) => k -> anyOf(v) }.toMap
        case _ => Map.empty
      })
  }

  private def fail(field: String): Nothing =
    throw new IllegalArgumentException(s"job spec: missing '$field'")

  private def str(v: JValue): Option[String] = v match {
    case JString(s) => Some(s)
    case _ => None
  }

  private def anyOf(v: JValue): Any = v match {
    case JString(s) => s
    case JInt(i) => i.toLong
    case JLong(l) => l
    case JDouble(d) => d
    case JBool(b) => b
    case JNull => null
    case other => throw new IllegalArgumentException(s"job spec: unsupported value $other")
  }

  private def parseExtract(v: JValue): Either[FileResource, ConnectorResource] =
    (v \ "file", v \ "connector") match {
      case (f: JObject, _) =>
        Left(FileResource(
          pathTemplate = str(f \ "path").getOrElse(fail("extract.file.path")),
          fType = str(f \ "type").getOrElse("parquet"),
          columns = parseColumns(f \ "columns"),
          dialect = parseDialect(f \ "dialect"),
          headerColumns = parseColumns(f \ "headerColumns"),
          footerColumns = parseColumns(f \ "footerColumns")))
      case (_, c: JObject) =>
        Right(ConnectorResource(
          model = str(c \ "model").getOrElse(fail("extract.connector.model")),
          domain = (c \ "domain") match {
            case JArray(items) => items.map {
              case JArray(List(f, op, value)) =>
                graft.expr.OdooDomain.Term(
                  str(f).getOrElse(fail("domain field")),
                  str(op).getOrElse(fail("domain op")), anyOf(value))
              case JString(conn) => conn // "&" | "|" | "!"
              case other => throw new IllegalArgumentException(s"bad domain: $other")
            }
            case _ => Nil
          },
          fields = strSeq(c \ "fields"),
          ids = (c \ "ids") match {
            case JArray(items) => Some(items.map(anyOf))
            case _ => None
          },
          idField = str(c \ "idField").getOrElse("id")))
      case _ => fail("extract.file | extract.connector")
    }

  private def parseDialect(v: JValue): CsvDialect = v match {
    case o: JObject => CsvDialect(
      separator = str(o \ "separator").getOrElse(","),
      quote = str(o \ "quote").getOrElse("\""),
      header = (o \ "header") match { case JBool(b) => b; case _ => true },
      encoding = str(o \ "encoding").getOrElse("UTF-8"))
    case _ => CsvDialect()
  }

  private def parseColumns(v: JValue): Seq[FwColumn] = v match {
    case JArray(items) => items.map { c =>
      FwColumn(
        name = str(c \ "name").getOrElse(fail("column.name")),
        fieldName = str(c \ "as"),
        position = intOf(c \ "position", 1),
        length = intOf(c \ "length", 1),
        align = str(c \ "align").getOrElse("ljust"),
        fillChar = str(c \ "fill").getOrElse(" "),
        forced = str(c \ "forced"),
        dataType = str(c \ "type").getOrElse("string"),
        format = str(c \ "format"))
    }
    case _ => Nil
  }

  private def parseTransform(v: JValue): TransformSpec = TransformSpec(
    fields = (v \ "fields") match {
      case JArray(items) => items.map { f =>
        FieldSpec(
          name = str(f \ "name").getOrElse(fail("field.name")),
          fieldName = str(f \ "as"),
          expr = str(f \ "expr"),
          mapping = (f \ "mapping") match {
            case m: JObject => Some(MappingSpec(
              entries = (m \ "entries") match {
                case JObject(fields) => fields.collect { case (k, JString(s)) => k -> s }.toMap
                case _ => Map.empty
              },
              default = str(m \ "default"),
              returnNull = (m \ "returnNull") match { case JBool(b) => b; case _ => false }))
            case _ => None
          },
          fieldType = str(f \ "type").getOrElse("char"),
          forced = str(f \ "forced"))
      }
      case _ => Nil
    },
    reprocess = ReprocessMode.fromString(str(v \ "reprocess").getOrElse("insert")),
    pkField = str(v \ "pk"))

  private def strSeq(v: JValue): Seq[String] = v match {
    case JArray(items) => items.flatMap(str)
    case _ => Nil
  }

  private def intOf(v: JValue, dflt: Int): Int = v match {
    case JInt(i) => i.toInt
    case JLong(l) => l.toInt
    case _ => dflt
  }
}
