package graft.prql

import Lexer._
import Ast._

/** Recursive-descent parser for the PRQL 0.6.1 surface (SURVEY.md §2b/2c).
  * Grammar behavior cross-checked against the reference's example queries
  * (/root/reference/examples/queries/ — the .prql files) and the generated SQL shown in
  * its README.md:105-129.
  */
final class Parser(tokens: Vector[Tok], src: String = "") {
  private var p = 0

  /** When parsing a bare `group <key> (pipeline)` key, a following `(` opens
    * the sub-pipeline, not a function-application argument. */
  private var noParenApp = false

  private def cur: Tok = tokens(p)
  private def advance(): Tok = { val t = tokens(p); p += 1; t }
  private def isOp(s: String): Boolean = cur match { case TOp(o, _) => o == s; case _ => false }
  private def isIdent(s: String): Boolean = cur match { case TIdent(w, _) => w == s; case _ => false }
  private def eatOp(s: String): Unit =
    if (isOp(s)) p += 1 else fail(s"expected '$s'")
  private def eatIdent(): String = cur match {
    case TIdent(w, _) => p += 1; w
    case t => fail(s"expected identifier, got $t")
  }
  private def fail(msg: String): Nothing =
    throw new RuntimeException(
      s"parse error: $msg at token ${cur} (index $p)" + Parser.caret(src, cur.pos))

  private def skipNewlines(): Unit = while (cur.isInstanceOf[TNewline]) p += 1
  private def atEof: Boolean = cur.isInstanceOf[TEof]

  // ---------------- query / statements ----------------

  def parseQuery(): Query = {
    skipNewlines()
    // optional `prql version:'0.6.1' target:sql.generic` header (main.rs:153-157)
    if (isIdent("prql")) { while (!cur.isInstanceOf[TNewline] && !atEof) p += 1 }
    val funcs = Vector.newBuilder[FuncDef]
    val lets = Vector.newBuilder[LetDef]
    skipNewlines()
    var more = true
    while (more && !atEof) {
      if (isIdent("func")) { funcs += parseFunc(); skipNewlines() }
      else if (isIdent("let")) { lets += parseLet(); skipNewlines() }
      else more = false
    }
    val main = parsePipeline(insideParens = false)
    Query(funcs.result(), lets.result(), main)
  }

  /** `func name p1 p2 -> expr` — inlined at compile time (SURVEY §2c). */
  private def parseFunc(): FuncDef = {
    p += 1 // func
    val name = eatIdent()
    val params = Vector.newBuilder[String]
    while (!isOp("->")) params += eatIdent()
    eatOp("->")
    FuncDef(name, params.result(), parseExpr())
  }

  /** `let name = (pipeline)` or `let name = s"SELECT ..."` (duckdb.rs:53-59). */
  private def parseLet(): LetDef = {
    p += 1 // let
    val name = eatIdent()
    eatOp("=")
    skipNewlinesInExpr()
    cur match {
      case TInterp('s', _, _) =>
        parseAtom() match {
          case s: SStr => LetDef(name, LetSql(s))
          case other   => fail(s"expected s-string, got $other")
        }
      case TOp("(", _) =>
        p += 1; skipNewlines()
        val pipe = parsePipeline(insideParens = true)
        eatOp(")")
        LetDef(name, LetPipeline(pipe))
      case _ => // bare pipeline until newline-separated `from`-like boundary: parse one line
        LetDef(name, LetPipeline(parsePipeline(insideParens = false, singleLine = true)))
    }
  }

  // ---------------- pipelines / transforms ----------------

  /** Transforms separated by newline or `|`; stops at `)` when insideParens. */
  def parsePipeline(insideParens: Boolean, singleLine: Boolean = false): Seq[Transform] = {
    val out = Vector.newBuilder[Transform]
    var done = false
    skipNewlines()
    while (!done && !atEof && !(insideParens && isOp(")"))) {
      out += parseTransform()
      // separators
      var sawSep = false
      while (isOp("|") || cur.isInstanceOf[TNewline]) {
        if (cur.isInstanceOf[TNewline] && singleLine) { done = true }
        sawSep = true
        p += 1
        if (!singleLine) skipNewlines()
      }
      if (!sawSep) done = true
      if (insideParens && isOp(")")) done = true
      if (atEof) done = true
    }
    out.result()
  }

  private def parseTransform(): Transform = cur match {
    case TIdent("from", _)      => p += 1; parseFrom()
    case TIdent("select", _)    => p += 1; Select(parseItemList())
    case TIdent("derive", _)    => p += 1; Derive(parseItemList())
    case TIdent("filter", _)    => p += 1; Filter(parseExpr())
    case TIdent("sort", _)      => p += 1; parseSort()
    case TIdent("take", _)      => p += 1; parseTake()
    case TIdent("join", _)      => p += 1; parseJoin()
    case TIdent("group", _)     => p += 1; parseGroup()
    case TIdent("aggregate", _) => p += 1; Aggregate(parseItemList())
    case TIdent("window", _)    => p += 1; parseWindow()
    case TIdent("append", _)    => p += 1; Append(parseDottedIdent())
    case TIdent("loop", _)      => p += 1; parseLoopT()
    case t => fail(s"expected transform keyword, got $t")
  }

  private def parseFrom(): From = {
    val first = eatIdent()
    if (isOp("=")) { p += 1; From(parseDottedIdent(), Some(first)) }
    else {
      var parts = Vector(first)
      while (isOp(".")) { p += 1; parts :+= eatIdent() }
      From(Ident(parts), None)
    }
  }

  private def parseSort(): Sort = {
    if (isOp("[")) {
      p += 1; skipNewlines()
      val items = Vector.newBuilder[SortItem]
      while (!isOp("]")) {
        items += parseSortItem()
        skipNewlines()
        if (isOp(",")) { p += 1; skipNewlines() }
      }
      eatOp("]")
      Sort(items.result())
    } else Sort(Seq(parseSortItem()))
  }

  private def parseSortItem(): SortItem = {
    val desc = isOp("-")
    if (desc) p += 1
    val plus = isOp("+") // explicit asc
    if (plus) p += 1
    SortItem(parseAppOrAtomChainNoMath(), desc)
  }

  /** Sort keys are plain references/calls — avoid consuming `-`/`+` of the
    * next item as binary math. */
  private def parseAppOrAtomChainNoMath(): Expr = parseApplication()

  private def parseTake(): Take = {
    val lo = cur match { case TInt(v, _) => p += 1; v; case t => fail(s"take expects int, got $t") }
    if (isOp("..")) {
      p += 1
      val hi = cur match { case TInt(v, _) => p += 1; v; case t => fail(s"take range end int, got $t") }
      Take(Some(lo), Some(hi))
    } else Take(None, Some(lo)) // take n == rows 1..n
  }

  private def parseJoin(): Join = {
    var side = "inner"
    if (isIdent("side")) { p += 1; eatOp(":"); side = eatIdent() }
    val first = eatIdent()
    val (table, alias) =
      if (isOp("=")) { p += 1; (parseDottedIdent(), Some(first)) }
      else {
        var parts = Vector(first)
        while (isOp(".")) { p += 1; parts :+= eatIdent() }
        (Ident(parts), None)
      }
    eatOp("[")
    skipNewlines()
    val conds = Vector.newBuilder[JoinCond]
    while (!isOp("]")) {
      if (isOp("==")) { p += 1; conds += UsingCol(eatIdent()) }
      else {
        parseExpr() match {
          case Ident(Seq(one)) => conds += UsingCol(one)
          case e               => conds += OnExpr(e)
        }
      }
      skipNewlines()
      if (isOp(",")) { p += 1; skipNewlines() }
    }
    eatOp("]")
    Join(side, table, alias, conds.result())
  }

  private def parseLoopT(): Loop = {
    skipNewlinesInExpr()
    eatOp("(")
    skipNewlines()
    val pipe = parsePipeline(insideParens = true)
    eatOp(")")
    Loop(pipe)
  }

  private def parseGroup(): Group = {
    val keys =
      if (isOp("[")) parseItemList()
      else {
        val saved = noParenApp
        noParenApp = true
        try Seq(parseItem()) finally noParenApp = saved
      }
    skipNewlinesInExpr()
    eatOp("(")
    skipNewlines()
    val pipe = parsePipeline(insideParens = true)
    eatOp(")")
    Group(keys, pipe)
  }

  private def parseWindow(): WindowT = {
    var rows: Option[(Option[Long], Option[Long])] = None
    var range: Option[(Option[Long], Option[Long])] = None
    var expanding = false
    var rolling: Option[Long] = None
    while (cur match { case TIdent(w, _) => Seq("rows", "range", "expanding", "rolling").contains(w); case _ => false }) {
      val key = eatIdent(); eatOp(":")
      key match {
        case "rows"      => rows = Some(parseIntRange())
        case "range"     => range = Some(parseIntRange())
        case "expanding" => expanding = eatIdent() == "true"
        case "rolling"   => rolling = Some(cur match { case TInt(v, _) => p += 1; v; case t => fail(s"rolling:int, got $t") })
      }
    }
    skipNewlinesInExpr()
    eatOp("(")
    skipNewlines()
    val pipe = parsePipeline(insideParens = true)
    eatOp(")")
    WindowT(rows, range, expanding, rolling, pipe)
  }

  /** `-3..0`, `..0`, `-3..` — signed int range for window frames. */
  private def parseIntRange(): (Option[Long], Option[Long]) = {
    def bound(): Option[Long] = cur match {
      case TOp("-", _) => p += 1; cur match { case TInt(v, _) => p += 1; Some(-v); case t => fail(s"int, got $t") }
      case TInt(v, _)  => p += 1; Some(v)
      case _           => None
    }
    val lo = bound()
    eatOp("..")
    val hi = bound()
    (lo, hi)
  }

  /** `[a, b = expr, ...]` or a single bare item. */
  private def parseItemList(): Seq[Expr] = {
    if (isOp("[")) {
      p += 1; skipNewlines()
      val items = Vector.newBuilder[Expr]
      while (!isOp("]")) {
        items += parseItem()
        skipNewlines()
        if (isOp(",")) { p += 1; skipNewlines() }
      }
      eatOp("]")
      items.result()
    } else Seq(parseItem())
  }

  /** List item: `name = expr` (assign) or plain expr. */
  private def parseItem(): Expr = {
    (cur, tokens.lift(p + 1)) match {
      case (TIdent(name, _), Some(TOp("=", _))) if !name.contains(".") =>
        p += 2
        skipNewlinesInExpr()
        Assign(name, parseExpr())
      case _ => parseExpr()
    }
  }

  // ---------------- expressions ----------------

  /** Allows newlines inside bracketed/parenthesized expression context. */
  private def skipNewlinesInExpr(): Unit = skipNewlines()

  /** A whole token stream as one expression (f-/s-string holes). Handles
    * top-level expression pipes (`{x | in 1..10}`) and fails loudly on
    * trailing tokens — silently dropping them turned `x | in 1..10` into
    * bare `x`. */
  def parseExprStandalone(): Expr = {
    skipNewlines()
    var e = parseExpr()
    while (isOp("|")) { p += 1; skipNewlinesInExpr(); e = PipeE(e, parseApplication()) }
    skipNewlines()
    if (!atEof) fail("trailing tokens after interpolated expression")
    e
  }

  def parseExpr(): Expr = parseOr()

  private def parseOr(): Expr = {
    var l = parseAnd()
    while (isIdent("or")) { p += 1; skipNewlinesInExpr(); l = BinOp("or", l, parseAnd()) }
    l
  }
  private def parseAnd(): Expr = {
    var l = parseCompare()
    while (isIdent("and")) { p += 1; skipNewlinesInExpr(); l = BinOp("and", l, parseCompare()) }
    l
  }
  private def parseCompare(): Expr = {
    var l = parseCoalesce()
    var go = true
    while (go) cur match {
      case TOp(op @ ("==" | "!=" | "<" | "<=" | ">" | ">="), _) =>
        p += 1; skipNewlinesInExpr(); l = BinOp(op, l, parseCoalesce())
      case _ => go = false
    }
    l
  }
  private def parseCoalesce(): Expr = {
    var l = parseRange()
    while (isOp("??")) { p += 1; skipNewlinesInExpr(); l = BinOp("??", l, parseRange()) }
    l
  }
  /** `a..b` between comparison and additive so `in 0..10` and date ranges work. */
  private def parseRange(): Expr = {
    if (isOp("..")) { p += 1; return RangeE(None, Some(parseAdditive())) }
    val l = parseAdditive()
    if (isOp("..")) {
      p += 1
      val hi = cur match {
        // `|` ends an open range too: `(ts.. | in x)` — fuzz find
        case TOp(")" | "]" | "," | "|", _) | TNewline(_) | TEof(_) => None
        case _ => Some(parseAdditive())
      }
      RangeE(Some(l), hi)
    } else l
  }
  private def parseAdditive(): Expr = {
    var l = parseMultiplicative()
    var go = true
    while (go) cur match {
      case TOp(op @ ("+" | "-"), _) =>
        p += 1; skipNewlinesInExpr(); l = BinOp(op, l, parseMultiplicative())
      case _ => go = false
    }
    l
  }
  private def parseMultiplicative(): Expr = {
    var l = parseUnary()
    var go = true
    while (go) cur match {
      case TOp(op @ ("*" | "/" | "%"), _) =>
        p += 1; skipNewlinesInExpr(); l = BinOp(op, l, parseUnary())
      case _ => go = false
    }
    l
  }
  private def parseUnary(): Expr = cur match {
    case TOp("-", _)       => p += 1; UnOp("-", parseUnary())
    case TIdent("not", _)  => p += 1; UnOp("not", parseUnary())
    case _                 => parseApplication()
  }

  /** Function application: `sum x`, `lag 7 col`, `in 0..10`. First atom must
    * be a bare identifier for application to trigger; args are atoms (PRQL
    * requires parens for compound args: `sum (a * b)`). */
  private def parseApplication(): Expr = {
    val head = parseAtom()
    head match {
      case id: Ident if atomStart =>
        val args = Vector.newBuilder[Expr]
        var named = Map.empty[String, Expr]
        while (atomStart) {
          (cur, tokens.lift(p + 1)) match {
            case (TIdent(name, _), Some(TOp(":", _))) =>
              p += 2; named += (name -> parseAtomRange())
            case _ => args += parseAtomRange()
          }
        }
        Call(id, args.result(), named)
      case other => other
    }
  }

  /** True when the next token can begin a function-application argument. */
  private def atomStart: Boolean = cur match {
    case TIdent("and" | "or" | "not" | "in", _) => cur match {
      case TIdent("in", _) => true // `in` is itself a function when applied
      case _ => false
    }
    case _: TIdent | _: TInt | _: TFloat | _: TStr | _: TInterp | _: TDate | _: TInterval => true
    case TOp("(", _) => !noParenApp
    case TOp("[", _) => true // list-literal argument: `in ["A", "B"]`
    case _ => false
  }

  /** An application argument: atom, optionally extended into a range (`0..10`). */
  private def parseAtomRange(): Expr = {
    val a = parseAtom()
    if (isOp("..")) {
      p += 1
      val hi = cur match {
        case TOp(")" | "]" | "," | "|", _) | TNewline(_) | TEof(_) => None
        case _ => Some(parseAtom())
      }
      RangeE(Some(a), hi)
    } else a
  }

  private def parseAtom(): Expr = cur match {
    case TInt(v, _)   => p += 1; IntLit(v)
    case TFloat(v, _) => p += 1; FloatLit(v)
    case TStr(v, _)   => p += 1; StrLit(v)
    case TDate(raw, _) => p += 1; DateLit(raw)
    case TInterval(v, unit, _) => p += 1; IntervalLit(v, unit)
    case TInterp(kind, raw, _) =>
      p += 1
      val parts = parseInterpParts(raw)
      if (kind == 'f') FStr(parts) else SStr(parts)
    case TIdent("true", _)  => p += 1; BoolLit(true)
    case TIdent("false", _) => p += 1; BoolLit(false)
    case TIdent("null", _)  => p += 1; NullLit
    case TIdent("switch", _) | TIdent("case", _) => p += 1; parseSwitch()
    case TIdent(_, _) => parseDottedIdent()
    case TOp("(", _) =>
      p += 1; skipNewlinesInExpr()
      val saved = noParenApp
      noParenApp = false // inside parens the group-key ambiguity is gone
      var e = parseExpr()
      noParenApp = saved
      skipNewlinesInExpr()
      // expression pipeline: (x | in 0..10) — lhs becomes last arg of rhs
      while (isOp("|")) {
        p += 1; skipNewlinesInExpr()
        val f = parseApplication()
        e = PipeE(e, f)
        skipNewlinesInExpr()
      }
      eatOp(")")
      e
    case TOp("[", _) =>
      p += 1; skipNewlines()
      val items = Vector.newBuilder[Expr]
      while (!isOp("]")) {
        items += parseItem()
        skipNewlines()
        if (isOp(",")) { p += 1; skipNewlines() }
      }
      eatOp("]")
      ListE(items.result())
    case t => fail(s"unexpected token in expression: $t")
  }

  /** `switch [cond -> val, ...]` */
  private def parseSwitch(): Expr = {
    eatOp("[")
    skipNewlines()
    val cases = Vector.newBuilder[(Expr, Expr)]
    while (!isOp("]")) {
      val c = parseExpr()
      eatOp("->")
      skipNewlinesInExpr()
      val v = parseExpr()
      cases += ((c, v))
      skipNewlines()
      if (isOp(",")) { p += 1; skipNewlines() }
    }
    eatOp("]")
    Switch(cases.result())
  }

  private def parseDottedIdent(): Ident = {
    var parts = Vector(eatIdent())
    while (isOp(".")) {
      // only a dot directly followed by an ident continues the reference
      tokens.lift(p + 1) match {
        case Some(TIdent(_, _)) => p += 1; parts :+= eatIdent()
        case _ => return Ident(parts)
      }
    }
    Ident(parts)
  }

  /** Split an f-/s-string raw body into literal and `{expr}` parts. */
  private def parseInterpParts(raw: String): Seq[Either[String, Expr]] = {
    val parts = Vector.newBuilder[Either[String, Expr]]
    val sb = new StringBuilder
    var i = 0
    while (i < raw.length) {
      raw.charAt(i) match {
        case '{' if i + 1 < raw.length && raw.charAt(i + 1) == '{' => sb += '{'; i += 2
        case '}' if i + 1 < raw.length && raw.charAt(i + 1) == '}' => sb += '}'; i += 2
        case '{' =>
          if (sb.nonEmpty) { parts += Left(sb.toString); sb.clear() }
          var depth = 1; var j = i + 1
          while (j < raw.length && depth > 0) {
            raw.charAt(j) match { case '{' => depth += 1; case '}' => depth -= 1; case _ => }
            j += 1
          }
          val inner = raw.substring(i + 1, j - 1)
          parts += Right(new Parser(Lexer.lex(inner)).parseExprStandalone())
          i = j
        case c => sb += c; i += 1
      }
    }
    if (sb.nonEmpty) parts += Left(sb.toString)
    parts.result()
  }
}

object Parser {
  def parse(src: String): Query =
    try new Parser(Lexer.lex(src), src).parseQuery()
    catch {
      // lex errors carry a raw offset — render them with the same
      // line/column caret the parse errors get
      case e: Lexer.LexError =>
        throw new RuntimeException(s"parse error: ${e.getMessage}${caret(src, e.pos)}")
    }

  /** `line L, column C` plus a two-line caret snippet for an offset into
    * `src` — turns "at offset 37" errors into something a user can act on.
    * Empty when no source is available (sub-parsers over interpolation
    * holes re-parse fragments; their offsets wouldn't map to user text). */
  private[prql] def caret(src: String, pos: Int): String = {
    if (src.isEmpty || pos < 0) return ""
    val bounded = math.min(pos, src.length)
    val lineStart = src.lastIndexOf('\n', math.max(0, bounded - 1)) + 1
    val lineEnd = { val e = src.indexOf('\n', lineStart); if (e < 0) src.length else e }
    val line = 1 + src.substring(0, lineStart).count(_ == '\n')
    val col = bounded - lineStart + 1
    s" (line $line, column $col)\n  ${src.substring(lineStart, lineEnd)}\n  ${" " * (col - 1)}^"
  }
}
