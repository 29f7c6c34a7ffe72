package graft.prql

/** DuckDB→Spark SQL dialect shim for s-strings (SURVEY.md §7 "hard parts").
  *
  * The reference splices raw *DuckDB* SQL via PRQL s-strings
  * (/root/reference/examples/queries/invoice_totals.prql:4-9, e.g.
  * `s"STRFTIME('%Y-%m', {i.invoice_date})"`). We rewrite the function names
  * and strftime %-codes to Spark SQL before handing the fragment to
  * `functions.expr`. Unknown constructs pass through untouched — Spark's
  * parser fails loudly on anything it can't handle, which is the behavior we
  * want (fail at compile, not wrong answers).
  */
object SqlShim {

  /** DuckDB strftime %-codes → java.time format pattern (date_format). */
  private val pctCodes: Seq[(String, String)] = Seq(
    "%Y" -> "yyyy", "%y" -> "yy", "%m" -> "MM", "%d" -> "dd",
    "%H" -> "HH", "%I" -> "hh", "%M" -> "mm", "%S" -> "ss",
    "%j" -> "DDD", "%p" -> "a", "%A" -> "EEEE", "%a" -> "EEE",
    "%B" -> "MMMM", "%b" -> "MMM", "%%" -> "%",
  )

  def strftimeToJava(fmt: String): String =
    pctCodes.foldLeft(fmt) { case (s, (k, v)) => s.replace(k, v) }

  /** Rewrite one SQL fragment from DuckDB dialect to Spark SQL. */
  def translate(sql: String): String = {
    var out = rewriteStrftime(sql)
    // name-for-name renames (case-insensitive, word boundaries)
    val renames = Seq(
      "EPOCH_MS" -> "TIMESTAMP_MILLIS",
      "LIST_VALUE" -> "ARRAY",
      "STRING_SPLIT" -> "SPLIT",
      "REGEXP_MATCHES" -> "RLIKE",
    )
    renames.foreach { case (from, to) =>
      out = out.replaceAll("(?i)\\b" + from + "\\b", to)
    }
    out
  }

  /** `STRFTIME('%Y-%m', x)` → `date_format(x, 'yyyy-MM')` (arg order swaps;
    * DuckDB also accepts (ts, fmt) order — handle both by detecting which
    * top-level argument is the quoted format string). */
  /** First occurrence of `strftime(` that is a real function call: outside
    * single-quoted literals and not a suffix of a longer identifier
    * (my_strftime). Plain indexOf would corrupt both. */
  private def findStrftime(sql: String): Int = {
    val lower = sql.toLowerCase
    var i = 0
    var inStr = false
    while (i < lower.length) {
      val c = lower.charAt(i)
      if (inStr) { if (c == '\'') inStr = false; i += 1 }
      else if (c == '\'') { inStr = true; i += 1 }
      else if (lower.startsWith("strftime(", i) &&
               (i == 0 || { val p = lower.charAt(i - 1); !p.isLetterOrDigit && p != '_' }))
        return i
      else i += 1
    }
    -1
  }

  private def rewriteStrftime(sql: String): String = {
    val idx = findStrftime(sql)
    if (idx < 0) return sql
    val argStart = idx + "strftime(".length
    // scan to the balanced closing paren
    var depth = 1; var j = argStart; var inStr = false
    while (j < sql.length && depth > 0) {
      val c = sql.charAt(j)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
      }
      j += 1
    }
    val inner = sql.substring(argStart, j - 1)
    // split on top-level commas
    val args = splitTopLevel(inner, ',')
    val translated =
      if (args.length == 2) {
        val (fmtArg, tsArg) =
          if (args(0).trim.startsWith("'")) (args(0).trim, args(1).trim)
          else (args(1).trim, args(0).trim)
        val fmt = fmtArg.stripPrefix("'").stripSuffix("'")
        s"date_format($tsArg, '${strftimeToJava(fmt)}')"
      } else sql.substring(idx, j) // unexpected arity: leave as-is
    sql.substring(0, idx) + translated + rewriteStrftime(sql.substring(j))
  }

  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = Vector.newBuilder[String]
    val sb = new StringBuilder
    var depth = 0; var inStr = false
    s.foreach { c =>
      if (inStr) { sb += c; if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true; sb += c
        case '(' => depth += 1; sb += c
        case ')' => depth -= 1; sb += c
        case `sep` if depth == 0 => out += sb.toString; sb.clear()
        case _ => sb += c
      }
    }
    out += sb.toString
    out.result()
  }
}
