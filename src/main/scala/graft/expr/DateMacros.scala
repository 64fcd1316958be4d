package graft.expr

import java.time.LocalDate

/** Date-macro substitution for filenames and SQL strings — the Spark-native
  * analogue of the reference's `%(aaaa)s/%(mm)s/%(dd)s/%(aa)s` interpolation
  * env built from the job date (reference cubicerpetl/cubicerpetl.py:200-201,
  * applied to filenames at :825 and SQL at :291, :299, :306).
  *
  * Macros: `{aaaa}` 4-digit year, `{aa}` 2-digit year, `{mm}` 2-digit month,
  * `{dd}` 2-digit day. Both `{x}` and the reference's `%(x)s` spellings are
  * accepted.
  */
object DateMacros {

  def env(date: LocalDate): Map[String, String] = Map(
    "aaaa" -> f"${date.getYear}%04d",
    "aa"   -> f"${date.getYear % 100}%02d",
    "mm"   -> f"${date.getMonthValue}%02d",
    "dd"   -> f"${date.getDayOfMonth}%02d")

  /** Substitute all date macros in `template` for the given job date. */
  def substitute(template: String, date: LocalDate): String = {
    val e = env(date)
    e.foldLeft(template) { case (acc, (k, v)) =>
      acc.replace(s"{$k}", v).replace(s"%($k)s", v)
    }
  }
}
