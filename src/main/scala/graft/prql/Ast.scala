package graft.prql

/** PL-level AST for the PRQL 0.6.1 surface exercised by the reference
  * (prql-query v0.0.15). Shape informed by the language constructs catalogued
  * in SURVEY.md §2b/§2c; citations into /root/reference where a construct is
  * demonstrated there (e.g. examples/queries/invoice_totals.prql:1-21).
  */
object Ast {

  // ---------- expressions ----------
  sealed trait Expr

  /** Possibly-dotted reference: `l_quantity`, `ii.quantity`. */
  final case class Ident(parts: Seq[String]) extends Expr {
    def name: String = parts.last
    override def toString: String = parts.mkString(".")
  }
  object Ident { def of(s: String): Ident = Ident(s.split('.').toSeq) }

  sealed trait Lit extends Expr
  final case class IntLit(v: Long) extends Lit
  final case class FloatLit(v: Double) extends Lit
  final case class StrLit(v: String) extends Lit
  final case class BoolLit(v: Boolean) extends Lit
  case object NullLit extends Lit
  /** `@2009-01-01`, `@2009-01-01T00:00:00` — date/timestamp literal
    * (SURVEY §2c "date/time literals"). Raw text kept verbatim. */
  final case class DateLit(raw: String) extends Lit
  /** `30days`, `2months` — interval literal for date arithmetic
    * (PRQL 0.6.1; SURVEY §1 "date/interval literals"). */
  final case class IntervalLit(n: Long, unit: String) extends Lit

  /** Binary operator. `op` one of + - * / % == != < <= > >= and or ?? */
  final case class BinOp(op: String, l: Expr, r: Expr) extends Expr
  /** Unary `-` / `not`. */
  final case class UnOp(op: String, e: Expr) extends Expr

  /** Function application `sum x`, `lag 7 x`, `round 2 y` with optional
    * named args (`side:left` style is handled at transform level). */
  final case class Call(fn: Ident, args: Seq[Expr], named: Map[String, Expr] = Map.empty) extends Expr

  /** `name = expr` inside select/derive/aggregate lists. */
  final case class Assign(name: String, e: Expr) extends Expr

  /** Range `a..b` (either end optional: `..10`). */
  final case class RangeE(lo: Option[Expr], hi: Option[Expr]) extends Expr

  /** Expression pipeline `(x | in 0..10)` — lhs piped as last arg of rhs call. */
  final case class PipeE(in: Expr, fn: Expr) extends Expr

  /** f"{a} - {b}" — parts are Left(literal) / Right(expr). */
  final case class FStr(parts: Seq[Either[String, Expr]]) extends Expr
  /** s"RAW SQL {col}" — backend SQL splice (invoice_totals.prql:4-9). */
  final case class SStr(parts: Seq[Either[String, Expr]]) extends Expr

  /** `switch [cond -> val, ...]` (PRQL 0.6 name for case). */
  final case class Switch(cases: Seq[(Expr, Expr)]) extends Expr

  /** Tuple/list literal `[a, b]` in expression position (rare; join conds). */
  final case class ListE(items: Seq[Expr]) extends Expr

  // ---------- transforms ----------
  sealed trait Transform

  final case class From(table: Ident, alias: Option[String]) extends Transform
  final case class Select(items: Seq[Expr]) extends Transform
  final case class Derive(items: Seq[Expr]) extends Transform
  final case class Filter(cond: Expr) extends Transform
  final case class SortItem(e: Expr, desc: Boolean)
  final case class Sort(items: Seq[SortItem]) extends Transform
  /** `take n` or `take a..b` (1-based inclusive range → OFFSET/LIMIT). */
  final case class Take(lo: Option[Long], hi: Option[Long]) extends Transform

  sealed trait JoinCond
  /** `[==col]` / bare `[col]` → USING-style join (README.md:123-124). */
  final case class UsingCol(col: String) extends JoinCond
  /** `[a.x == b.y]` → ON condition. */
  final case class OnExpr(e: Expr) extends JoinCond
  final case class Join(side: String, table: Ident, alias: Option[String],
                        conds: Seq[JoinCond]) extends Transform

  /** `group [keys] (sub-pipeline)` — keys may be Ident or Assign. */
  final case class Group(keys: Seq[Expr], pipeline: Seq[Transform]) extends Transform
  final case class Aggregate(items: Seq[Expr]) extends Transform

  /** `window expanding:true (...)` / `rolling:n` / `rows:a..b` / `range:a..b`. */
  final case class WindowT(rows: Option[(Option[Long], Option[Long])],
                           range: Option[(Option[Long], Option[Long])],
                           expanding: Boolean, rolling: Option[Long],
                           pipeline: Seq[Transform]) extends Transform

  /** `append table` → UNION ALL. */
  final case class Append(table: Ident) extends Transform

  /** `loop (pipeline)` — PRQL 0.6 experimental iteration: union the current
    * relation with repeated applications of the step pipeline until a step
    * yields no rows (the recursive-CTE equivalent, SURVEY §2c). */
  final case class Loop(pipeline: Seq[Transform]) extends Transform

  // ---------- statements / query ----------
  final case class FuncDef(name: String, params: Seq[String], body: Expr)
  sealed trait LetBody
  final case class LetPipeline(p: Seq[Transform]) extends LetBody
  final case class LetSql(s: SStr) extends LetBody
  final case class LetDef(name: String, body: LetBody)

  final case class Query(funcs: Seq[FuncDef], lets: Seq[LetDef], main: Seq[Transform])
}
