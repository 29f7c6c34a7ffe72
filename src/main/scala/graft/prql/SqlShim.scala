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

  /** DuckDB string literals are standard SQL — a backslash is a literal
    * character — while Spark's parser applies C-style escapes inside
    * single quotes (default `spark.sql.parser.escapedStringLiterals=false`),
    * so a reference user's regex `'\s+'` would silently become `'s+'` and
    * match nothing. Double every backslash INSIDE string literals; quote
    * doubling ('') is unaffected. */
  private def escapeStringLiterals(sql: String): String = {
    val sb = new StringBuilder(sql.length + 8)
    var inStr = false
    sql.foreach { c =>
      if (c == '\'') { inStr = !inStr; sb += c }
      else if (c == '\\' && inStr) sb ++= "\\\\"
      else sb += c
    }
    sb.toString
  }

  /** Rewrite one SQL fragment from DuckDB dialect to Spark SQL. */
  def translate(sql: String): String = {
    // epoch_us(ts) → unix_micros(cast(ts as timestamp)): same µs-since-UTC-
    // epoch value, but Spark's unix_micros REJECTS TIMESTAMP_NTZ (what
    // parquet timestamps without tz metadata scan as) while DuckDB's
    // timestamps are all NTZ-shaped; under the UTC session the cast is the
    // identity instant, so this is rename + type adaptation, not semantics
    val epochUs = rewriteCall(sql, "epoch_us") {
      case Seq(arg) => Some(s"unix_micros(cast($arg as timestamp))")
      case _        => None
    }
    var out = escapeStringLiterals(rewriteStrftime(epochUs))
    // name-for-name renames (case-insensitive, word boundaries; `_` is a
    // word char, so STRING_SPLIT never fires inside STRING_SPLIT_REGEX).
    // Only arity/semantics-identical pairs belong here — anything needing
    // argument surgery gets a rewriter like strftime above. Not renamed on
    // purpose: `len` (DuckDB overloads strings AND lists; Spark size() is
    // arrays-only — a blind rename corrupts string code) and `octet_length`
    // (Spark has it natively; pinned by a pass-through test).
    val renames = Seq(
      "EPOCH_MS" -> "TIMESTAMP_MILLIS",
      "LIST_VALUE" -> "ARRAY",
      "STRING_SPLIT_REGEX" -> "SPLIT", // both regex-split to array<string>
      "STRING_SPLIT" -> "SPLIT",
      "REGEXP_MATCHES" -> "RLIKE",
      "QUANTILE_CONT" -> "PERCENTILE", // exact interpolated quantile in both
      "LIST_TRANSFORM" -> "TRANSFORM", // same lambda arrow syntax `x -> ...`
      "LIST_FILTER" -> "FILTER",
      "LIST_DISTINCT" -> "ARRAY_DISTINCT",
      "LIST_CONTAINS" -> "ARRAY_CONTAINS",
    )
    renames.foreach { case (from, to) =>
      out = out.replaceAll("(?i)\\b" + from + "\\b", to)
    }
    out
  }

  /** First occurrence of `<fn>(` that is a real function call: outside
    * single-quoted literals and not a suffix of a longer identifier
    * (my_strftime). Plain indexOf would corrupt both. */
  private def findCall(sql: String, fn: String): Int = {
    val lower = sql.toLowerCase
    val needle = fn.toLowerCase + "("
    var i = 0
    var inStr = false
    while (i < lower.length) {
      val c = lower.charAt(i)
      if (inStr) { if (c == '\'') inStr = false; i += 1 }
      else if (c == '\'') { inStr = true; i += 1 }
      else if (lower.startsWith(needle, i) &&
               (i == 0 || { val p = lower.charAt(i - 1); !p.isLetterOrDigit && p != '_' }))
        return i
      else i += 1
    }
    -1
  }

  /** Rewrite every call of `fn` via `build(trimmed top-level args)`; a None
    * (unexpected arity) leaves that call untouched. String-literal and
    * nested-paren aware; recurses over the remainder for repeated calls. */
  private def rewriteCall(sql: String, fn: String)
                         (build: Seq[String] => Option[String]): String = {
    val idx = findCall(sql, fn)
    if (idx < 0) return sql
    val argStart = idx + fn.length + 1
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
    val args = splitTopLevel(inner, ',').map(_.trim)
    val translated = build(args).getOrElse(sql.substring(idx, j))
    sql.substring(0, idx) + translated + rewriteCall(sql.substring(j), fn)(build)
  }

  /** `STRFTIME('%Y-%m', x)` → `date_format(x, 'yyyy-MM')` (arg order swaps;
    * DuckDB also accepts (ts, fmt) order — handled by detecting which
    * top-level argument is the quoted format string). */
  private def rewriteStrftime(sql: String): String =
    rewriteCall(sql, "strftime") {
      case Seq(a0, a1) =>
        val (fmtArg, tsArg) = if (a0.startsWith("'")) (a0, a1) else (a1, a0)
        val fmt = fmtArg.stripPrefix("'").stripSuffix("'")
        Some(s"date_format($tsArg, '${strftimeToJava(fmt)}')")
      case _ => None // unexpected arity: leave as-is
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
