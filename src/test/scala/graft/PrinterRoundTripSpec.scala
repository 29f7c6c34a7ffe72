package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.prql.{Ast, Parser, Printer}
import Ast._

/** parse ∘ print round-trip fuzz over random ASTs — the compiler surface
  * the lowering-law properties don't reach (VERDICT r5 #7). The printer is
  * the witness: for every generated query, `Parser.parse(Printer.print(q))`
  * must return `q` structurally. Generators are constrained to the
  * canonical-form subset the parser itself produces (non-negative numeric
  * literals — `-5` lexes as unary minus; multi-branch OnExpr conditions —
  * a single bare ident in a join condition IS the using-col form; lo-less
  * ranges keep a hi bound).
  */
class PrinterRoundTripSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // ---- expression generators ----

  private val nameGen: Gen[String] =
    Gen.oneOf("a", "b", "c", "col1", "total", "x_2", "qty")

  private val identGen: Gen[Ident] = for {
    n <- Gen.chooseNum(1, 2)
    parts <- Gen.listOfN(n, nameGen)
  } yield Ident(parts)

  private val litGen: Gen[Expr] = Gen.oneOf(
    Gen.chooseNum(0L, 99999L).map(IntLit.apply),
    Gen.chooseNum(0, 999999).map(n => FloatLit(n / 1000.0)),
    Gen.oneOf("alpha", "two words", "tab\there", "nl\nline", "q\"uote", "back\\slash")
      .map(StrLit.apply),
    Gen.oneOf(true, false).map(BoolLit.apply),
    Gen.const(NullLit),
    Gen.oneOf(DateLit("2009-01-01"), DateLit("2009-01-01T00:00:00")),
    for { n <- Gen.chooseNum(1L, 30L); u <- Gen.oneOf("days", "months", "years") }
      yield IntervalLit(n, u))

  private def callGen(depth: Int): Gen[Call] = for {
    fn <- Gen.oneOf("sum", "min", "max", "avg", "lag", "round", "in")
    n <- Gen.chooseNum(1, 2)
    args <- Gen.listOfN(n, exprGen(depth - 1))
    named <- Gen.oneOf(
      Gen.const(Map.empty[String, Expr]),
      Gen.zip(Gen.oneOf("k", "opt"), exprGen(depth - 1)).map(kv => Map(kv)))
  } yield Call(Ident.of(fn), args, named)

  private def rangeGen(depth: Int): Gen[RangeE] = Gen.oneOf(
    Gen.zip(exprGen(depth - 1), exprGen(depth - 1))
      .map { case (l, h) => RangeE(Some(l), Some(h)) },
    exprGen(depth - 1).map(l => RangeE(Some(l), None)),
    exprGen(depth - 1).map(h => RangeE(None, Some(h))))

  /** Interpolation-hole expressions: the outer lexer scans the raw body to
    * the closing quote, so a string literal INSIDE a hole would terminate
    * the f-/s-string early — quote-free expressions only (a real grammar
    * constraint, not a printer artifact). */
  private def holeExprGen(depth: Int): Gen[Expr] = {
    val leaf = Gen.frequency(
      2 -> Gen.chooseNum(0L, 9999L).map(IntLit.apply): (Int, Gen[Expr]),
      1 -> Gen.chooseNum(0, 99999).map(n => FloatLit(n / 100.0)),
      3 -> identGen.map(e => e: Expr))
    if (depth <= 0) leaf
    else Gen.frequency(
      3 -> leaf,
      2 -> (for {
        op <- Gen.oneOf("+", "-", "*", "/", "==", "??")
        l <- holeExprGen(depth - 1); r <- holeExprGen(depth - 1)
      } yield BinOp(op, l, r)),
      1 -> (for {
        fn <- Gen.oneOf("sum", "round"); a <- holeExprGen(depth - 1)
      } yield Call(Ident.of(fn), Seq(a))))
  }

  private def fstrGen(depth: Int): Gen[Expr] = for {
    kind <- Gen.oneOf('f', 's')
    lead <- Gen.option(Gen.oneOf("abc ", "x{y} ", "2020-"))
    holes <- Gen.chooseNum(1, 2)
    parts <- Gen.listOfN(holes, Gen.zip(holeExprGen(depth - 1), Gen.option(Gen.oneOf(" mid", "-"))))
  } yield {
    val seq = lead.map(Left(_)).toSeq ++ parts.flatMap { case (e, trail) =>
      Right(e) +: trail.map(Left(_)).toSeq
    }
    if (kind == 'f') FStr(seq) else SStr(seq)
  }

  private def exprGen(depth: Int): Gen[Expr] =
    if (depth <= 0) Gen.frequency(2 -> litGen, 2 -> identGen.map(e => e: Expr))
    else Gen.frequency(
      3 -> litGen,
      3 -> identGen.map(e => e: Expr),
      3 -> (for {
        op <- Gen.oneOf("+", "-", "*", "/", "%", "==", "!=", "<", "<=", ">", ">=",
          "and", "or", "??")
        l <- exprGen(depth - 1); r <- exprGen(depth - 1)
      } yield BinOp(op, l, r)),
      1 -> (for { op <- Gen.oneOf("-", "not"); e <- exprGen(depth - 1) } yield UnOp(op, e)),
      3 -> callGen(depth),
      1 -> rangeGen(depth),
      1 -> (for { in <- exprGen(depth - 1); fn <- callGen(depth - 1) } yield PipeE(in, fn)),
      1 -> fstrGen(depth),
      1 -> (for {
        n <- Gen.chooseNum(1, 2)
        cases <- Gen.listOfN(n, Gen.zip(exprGen(depth - 1), exprGen(depth - 1)))
      } yield Switch(cases)),
      1 -> Gen.chooseNum(1, 3).flatMap(n =>
        Gen.listOfN(n, exprGen(depth - 1)).map(ListE.apply)))

  // ---- transform generators ----

  private def itemGen(depth: Int): Gen[Expr] = Gen.frequency(
    2 -> Gen.zip(nameGen, exprGen(depth)).map { case (n, e) => Assign(n, e) },
    3 -> exprGen(depth))

  private def itemsGen(depth: Int): Gen[Seq[Expr]] =
    Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, itemGen(depth)))

  private val sortGen: Gen[Sort] = Gen.chooseNum(1, 2).flatMap(n =>
    Gen.listOfN(n, Gen.zip(exprGen(1), Gen.oneOf(true, false))
      .map { case (e, d) => SortItem(e, d) })).map(Sort.apply)

  private val takeGen: Gen[Take] = Gen.oneOf(
    Gen.chooseNum(1L, 100L).map(n => Take(None, Some(n))),
    Gen.zip(Gen.chooseNum(1L, 50L), Gen.chooseNum(0L, 50L))
      .map { case (a, d) => Take(Some(a), Some(a + d)) })

  private val joinGen: Gen[Join] = for {
    side <- Gen.oneOf("inner", "left", "right", "full")
    table <- identGen
    alias <- Gen.option(nameGen)
    n <- Gen.chooseNum(1, 2)
    conds <- Gen.listOfN(n, Gen.oneOf(
      nameGen.map(UsingCol.apply): Gen[JoinCond],
      Gen.zip(identGen, identGen).map { case (l, r) =>
        OnExpr(BinOp("==", l, r)): JoinCond
      }))
  } yield Join(side, table, alias, conds)

  private def subPipelineGen(depth: Int): Gen[Seq[Transform]] =
    Gen.chooseNum(1, 2).flatMap(n => Gen.listOfN(n, Gen.frequency(
      3 -> itemsGen(depth).map(Aggregate.apply): (Int, Gen[Transform]),
      2 -> itemsGen(depth).map(Derive.apply),
      2 -> exprGen(depth).map(Filter.apply),
      1 -> sortGen,
      1 -> takeGen)))

  private def transformGen(depth: Int): Gen[Transform] = Gen.frequency(
    3 -> itemsGen(depth).map(Select.apply): (Int, Gen[Transform]),
    3 -> itemsGen(depth).map(Derive.apply),
    3 -> exprGen(depth).map(Filter.apply),
    2 -> sortGen,
    2 -> takeGen,
    2 -> joinGen,
    2 -> Gen.zip(itemsGen(1), subPipelineGen(depth - 1)).map { case (k, p) => Group(k, p) },
    1 -> (for {
      frame <- Gen.oneOf(0, 1, 2, 3)
      lo <- Gen.chooseNum(-5L, 0L); hi <- Gen.chooseNum(0L, 5L)
      roll <- Gen.chooseNum(2L, 9L)
      pipe <- subPipelineGen(depth - 1)
    } yield frame match {
      case 0 => WindowT(Some((Some(lo), Some(hi))), None, expanding = false, None, pipe)
      case 1 => WindowT(None, Some((Some(lo), Some(hi))), expanding = false, None, pipe)
      case 2 => WindowT(None, None, expanding = true, None, pipe)
      case 3 => WindowT(None, None, expanding = false, Some(roll), pipe)
    }),
    1 -> identGen.map(Append.apply),
    1 -> subPipelineGen(depth - 1).map(Loop.apply))

  private val funcGen: Gen[FuncDef] = for {
    name <- Gen.oneOf("fx", "fy")
    nParams <- Gen.chooseNum(1, 2)
    params <- Gen.listOfN(nParams, Gen.oneOf("p", "r"))
    body <- exprGen(1)
  } yield FuncDef(name, params, body)

  private val sstrOnlyGen: Gen[SStr] = fstrGen(1).map {
    case FStr(parts) => SStr(parts)
    case s: SStr     => s
    case other       => SStr(Seq(Right(other)))
  }

  private val letGen: Gen[LetDef] = for {
    name <- Gen.oneOf("base", "dim")
    body <- Gen.oneOf(
      sstrOnlyGen.map(LetSql.apply): Gen[LetBody],
      Gen.zip(identGen, subPipelineGen(1)).map { case (t, p) =>
        LetPipeline(From(t, None) +: p): LetBody
      })
  } yield LetDef(name, body)

  private val queryGen: Gen[Query] = for {
    funcs <- Gen.listOfN(1, funcGen).flatMap(fs => Gen.oneOf(Nil, fs))
    lets <- Gen.listOfN(1, letGen).flatMap(ls => Gen.oneOf(Nil, ls))
    table <- identGen
    alias <- Gen.option(nameGen)
    n <- Gen.chooseNum(1, 4)
    ts <- Gen.listOfN(n, transformGen(2))
  } yield Query(funcs, lets, From(table, alias) +: ts)

  test("parse(print(q)) == q over 400 random queries") {
    val qs = samples(queryGen, 400)
    assert(qs.size >= 350, s"generator should rarely fail, got ${qs.size}")
    qs.foreach { q =>
      val src = Printer.print(q)
      val back =
        try Parser.parse(src)
        catch {
          case e: Throwable =>
            fail(s"printed query failed to parse: ${e.getMessage}\n--- printed ---\n$src\n--- ast ---\n$q")
        }
      assert(back == q, s"\n--- printed ---\n$src\n--- expected ---\n$q\n--- got ---\n$back")
    }
  }

  test("printer round-trips the flagship and README-style queries verbatim at AST level") {
    val sources = Seq(
      """from invoices
        |filter total > 100
        |group [customer_id] (
        |aggregate [ct = count_rows, sum_total = sum total]
        |)
        |sort [-sum_total]
        |take 10""".stripMargin,
      """from lineitem
        |derive [disc_price = l_extendedprice * (1 - l_discount)]
        |group [l_returnflag, l_linestatus] (
        |aggregate [sum_qty = sum l_quantity, avg_price = average l_extendedprice]
        |)""".stripMargin)
    sources.foreach { src =>
      val ast = Parser.parse(src)
      assert(Parser.parse(Printer.print(ast)) == ast)
    }
  }
}
