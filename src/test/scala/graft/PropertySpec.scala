package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.prql.Graft

/** Property-based compiler checks (SURVEY §5): on random Chinook-like data,
  * PRQL-compiled results must equal the hand-written DataFrame formulation,
  * and algebraic laws (limit, union additivity, filter/derive commutation)
  * must hold.
  */
class PropertySpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  /** Deterministic sampling of a Gen (scalatestplus isn't in the offline
    * cache; fixed seeds keep runs reproducible). */
  private def samples[A](g: Gen[A], n: Int = 15): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    samples(g).foreach(f)
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    samples(g1).zip(samples(g2)).foreach { case (a, b) => f(a, b) }
  private def forAll[A, B, C](g1: Gen[A], g2: Gen[B], g3: Gen[C])(f: (A, B, C) => Unit): Unit =
    samples(g1).zip(samples(g2)).zip(samples(g3)).foreach { case ((a, b), c) => f(a, b, c) }

  private val rowGen: Gen[(Int, String, Double)] = for {
    id <- Gen.choose(1, 50)
    name <- Gen.oneOf("alpha", "beta", "gamma", "delta", "")
    value <- Gen.choose(-1000, 1000).map(_ / 10.0)
  } yield (id, name, value)

  private val tableGen: Gen[List[(Int, String, Double)]] =
    Gen.choose(0, 60).flatMap(n => Gen.listOfN(n, rowGen))

  private def toDf(rows: List[(Int, String, Double)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("value", DoubleType)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(
          rows.map(r => Row(r._1, r._2, r._3))).asJava),
      schema)
  }

  private def compile(prql: String, df: DataFrame): DataFrame =
    Graft.compile(prql, Map("t" -> df))(spark)

  test("canonicalUrl is idempotent: canon(canon(u)) == canon(u) on URL soup") {
    import org.apache.spark.sql.{functions => F}
    val urlGen: Gen[String] = for {
      scheme <- Gen.oneOf("http", "HTTPS", "ftp")
      host <- Gen.oneOf("Ex.COM", "a.b.example.org", "X9.net")
      port <- Gen.oneOf("", ":443", ":80", ":8080")
      path <- Gen.oneOf("", "/", "/p/1", "/a/b/c")
      q <- Gen.oneOf("", "?a=1", "?utm_source=x", "?utm_source=x&a=1",
        "?a=1&gclid=2&b=3", "?fbclid=only")
      frag <- Gen.oneOf("", "#f", "#a?b")
    } yield s"$scheme://$host$port$path$q$frag"
    import spark.implicits._
    val urls = samples(urlGen, 120).toList.toDF("url")
    val once = graft.ops.TextOps.canonicalUrl(F.col("url"))
    val bad = urls.select(F.col("url"), once.as("c1"),
        graft.ops.TextOps.canonicalUrl(once).as("c2"))
      .filter(F.col("c1") =!= F.col("c2")).collect()
    assert(bad.isEmpty, bad.take(5).mkString("\n"))
  }

  test("fused-native gram/shingle kernels match their relational formulas on random text") {
    // the oracle story for x25/x59/x67/x71 rests on these bit-parity
    // claims; fuzz them over whitespace-heavy, unicode, and degenerate
    // strings (the fixed-case pins live in OpsSpec)
    import org.apache.spark.sql.{functions => F, GraftExpr}
    import spark.implicits._
    val tokenGen = Gen.oneOf("word", "λéxème", "a", "日本語", "x1", "", " ", "\t", "\n  ")
    val textGen = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, tokenGen).map(_.mkString(" ")))
    val docs = samples(textGen, 60).toList.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

    // ShingleHashes ≡ explode(positions) → substr → xxhash64
    val n = 4
    val native = docs.select(F.col("doc_id"), F.explode(GraftExpr.column(
      graft.functions.ShingleHashes(GraftExpr.expression(F.col("text")), n))).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val clean = F.regexp_replace(F.lower(F.col("text")), "\\s+", " ")
    val rel = docs.select(F.col("doc_id"), clean.as("c"))
      .select(F.col("doc_id"), F.col("c"), F.explode(F.sequence(F.lit(1),
        F.greatest(F.length(F.col("c")) - (n - 1), F.lit(1)))).as("i"))
      .select(F.col("doc_id"), F.xxhash64(F.col("c").substr(F.col("i"), F.lit(n))).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(native == rel)

    // WordGramBuckets ≡ pmod(xxhash64(uni+bigram), nBuckets)
    val toks = F.filter(F.split(F.lower(F.trim(F.col("text"))), "\\s+"),
      t => F.length(t) > 0)
    val bi = F.transform(F.slice(toks, F.lit(1), F.greatest(F.size(toks) - 1, F.lit(0))),
      (t, i) => F.concat(t, F.lit(" "), F.element_at(toks, i + 2)))
    val nb = 32
    val gNative = docs.select(F.col("doc_id"), GraftExpr.column(
      graft.functions.WordGramBuckets(GraftExpr.expression(F.col("text")), nb)).as("b"))
      .as[(Long, Seq[Int])].collect().sortBy(_._1).toSeq
    val gRel = docs.select(F.col("doc_id"), F.transform(F.concat(toks, bi),
      g => F.pmod(F.xxhash64(g), F.lit(nb)).cast("int")).as("b"))
      .as[(Long, Seq[Int])].collect().sortBy(_._1).toSeq
    assert(gNative == gRel)

    // WordNGramHashes ≡ xxhash64 of space-joined sliding token windows
    val k = 3
    val wNative = docs.select(F.col("doc_id"), GraftExpr.column(
      graft.functions.WordNGramHashes(GraftExpr.expression(F.col("text")), k)).as("g"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
    val wRel = docs.select(F.col("doc_id"),
      F.when(F.size(toks) >= k,
        F.transform(F.sequence(F.lit(1), F.size(toks) - (k - 1)),
          i => F.xxhash64(F.concat_ws(" ", F.slice(toks, i, F.lit(k))))))
        .otherwise(F.array().cast("array<long>")).as("g"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
    assert(wNative == wRel)
  }

  test("dedupLines is idempotent on random multi-line corpora") {
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    val lineGen = Gen.oneOf("common line", "shared banner", "alpha", "beta",
      "gamma delta", "", "  COMMON LINE  ")
    val docGen = Gen.chooseNum(1, 5).flatMap(n =>
      Gen.listOfN(n, lineGen).map(_.mkString("\n")))
    val docs = samples(docGen, 40).toList.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val once = graft.ops.Curation.dedupLines(docs, "doc_id", "text")
    val twice = graft.ops.Curation.dedupLines(once, "doc_id", "text")
    val a = once.orderBy("doc_id").collect().map(_.toString).toSeq
    val b = twice.orderBy("doc_id").collect().map(_.toString).toSeq
    assert(a == b, "after one pass every non-blank normalized line is unique")
    // and post-state really is duplicate-free
    val dupes = once.select(F.posexplode(F.split(F.col("text"), "\n", -1)))
      .select(F.lower(F.trim(F.col("col"))).as("l"))
      .filter(F.length(F.col("l")) > 0)
      .groupBy("l").count().filter(F.col("count") > 1).count()
    assert(dupes == 0)
  }

  test("take n after sort == ordered head of the sorted relation") {
    forAll(tableGen, Gen.choose(0, 70)) { (rows, n) =>
      val df = toDf(rows)
      val got = compile(s"from t | sort [id, name, value] | take $n", df)
        .collect().map(_.toString).toSeq
      val exp = df.orderBy("id", "name", "value").limit(n)
        .collect().map(_.toString).toSeq
      assert(got == exp)
    }
  }

  test("append is row-count additive") {
    forAll(tableGen, tableGen) { (a, b) =>
      val da = toDf(a); val db = toDf(b)
      da.createOrReplaceTempView("pa"); db.createOrReplaceTempView("pb")
      val got = Graft.compile("from pa | append pb",
        Map("pa" -> da, "pb" -> db))(spark).count()
      assert(got == a.length + b.length)
    }
  }

  test("filter then derive == derive then filter when the filter ignores the derived column") {
    forAll(tableGen) { rows =>
      val df = toDf(rows)
      val a = compile("from t | filter value > 0.0 | derive [d = value * 2]", df)
      val b = compile("from t | derive [d = value * 2] | filter value > 0.0", df)
      assert(a.collect().map(_.toString).sorted.toSeq ==
        b.collect().map(_.toString).sorted.toSeq)
    }
  }

  test("group-aggregate equals the DataFrame formulation on random data") {
    forAll(tableGen) { rows =>
      val df = toDf(rows)
      val got = compile(
        "from t | group name (aggregate [total = sum value, n = count]) | sort name", df)
        .collect().map(_.toString).toSeq
      val exp = df.groupBy("name")
        .agg(org.apache.spark.sql.functions.sum("value").as("total"),
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"))
        .orderBy("name").collect().map(_.toString).toSeq
      assert(got == exp)
    }
  }

  test("take range a..b == drop(a-1).take(b-a+1) of the sorted relation") {
    forAll(tableGen, Gen.choose(1, 30), Gen.choose(0, 30)) { (rows, a, len) =>
      val df = toDf(rows)
      val b = a + len
      val got = compile(s"from t | sort [id, name, value] | take $a..$b", df)
        .collect().map(_.toString).toSeq
      val exp = df.orderBy("id", "name", "value").collect().map(_.toString)
        .slice(a - 1, b).toSeq
      assert(got == exp)
    }
  }

  // ---- operator-library laws on random data (round 10) ----

  test("law: cusumDrift is non-negative, and zero everywhere when v always <= K") {
    import org.apache.spark.sql.{functions => F}
    forAll(Gen.listOfN(30, Gen.choose(0L, 20L))) { vs =>
      val df = toDf(vs.zipWithIndex.map { case (v, i) =>
        (i, "g", v.toDouble) })
      val out = graft.ops.EventOps.cusumDrift(df, Seq("name"), F.col("id"),
        F.col("value"), target = 20L)
        .select("cusum").collect().map(_.getLong(0))
      assert(out.forall(_ >= 0L), out.mkString(","))
      assert(out.forall(_ == 0L), s"v <= K everywhere must never alarm: ${out.mkString(",")}")
    }
  }

  test("law: gini is scale-invariant in the masses and bounded by [0, 1)") {
    import org.apache.spark.sql.{functions => F}
    forAll(Gen.listOfN(12, Gen.choose(1L, 50L))) { xs =>
      val base = toDf(xs.zipWithIndex.map { case (x, i) => (i, "g", x.toDouble) })
      def g(mult: Long): Double =
        graft.ops.Stats.gini(
          base.withColumn("m", F.col("value").cast("long") * mult),
          Seq("name"), F.col("m"))
          .select("gini").collect().head.getDouble(0)
      val (g1, g3) = (g(1L), g(3L))
      assert(g1 >= 0.0 && g1 < 1.0, g1.toString)
      assert(g1 == g3, s"scaling every mass x3 must not move gini: $g1 vs $g3")
    }
  }

  test("law: rrfFuse of a ranking with ITSELF preserves that ranking's order") {
    import org.apache.spark.sql.{functions => F}
    forAll(Gen.choose(3, 12)) { n =>
      val r = toDf((1 to n).map(i => (i, "q", i.toDouble)).toList)
        .select(F.lit("q").as("q"), F.col("id").cast("string").as("i"),
          F.col("id").as("rk"))
      val fused = graft.ops.Similarity.rrfFuse(Seq(r, r), "q", "i", "rk",
        topK = n)
        .orderBy("fused_rank").select("item").collect().map(_.getString(0))
      assert(fused.toSeq == (1 to n).map(_.toString),
        s"self-fusion must be order-preserving: ${fused.mkString(",")}")
    }
  }

  test("law: hashSample(r1) is a SUBSET of hashSample(r2) when r1 <= r2 (nested samples)") {
    import org.apache.spark.sql.{functions => F}
    forAll(tableGen) { rows =>
      val df = toDf(rows)
      def ids(rate: Double) = graft.ops.Sampling.hashSample(df,
        F.concat_ws(":", F.col("id"), F.col("name")), rate)
        .select("id", "name").collect().map(_.toString).toSet
      val (s2, s5) = (ids(0.2), ids(0.5))
      assert(s2.subsetOf(s5),
        s"md5-interval samples must nest: ${(s2 -- s5).take(3)}")
    }
  }

  test("law: quantileNormalize preserves within-source order; calibrated ⊆ reference scores") {
    import org.apache.spark.sql.{functions => F}
    val rowGen = Gen.listOfN(40, Gen.zip(
      Gen.oneOf("a", "b", "c"), Gen.chooseNum(-1000L, 1000L)))
    forAll(rowGen) { rows =>
      import spark.implicits._
      val df = rows.zipWithIndex
        .map { case ((s, v), i) => (i.toLong, s, v) }
        .toDF("id", "src", "score")
      val out = graft.ops.Curation.quantileNormalize(df, "src", "score", "id")
        .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(0),
          r.getLong(3))) // (src, score, id, calibrated)
      val allScores = rows.map(_._2).toSet
      out.groupBy(_._1).foreach { case (_, g) =>
        // monotone: ranking by (score, id) never inverts after calibration
        val sorted = g.sortBy(t => (t._2, t._3))
        assert(sorted.map(_._4).sliding(2).forall(p =>
          p.length < 2 || p(0) <= p(1)), s"order inverted: $sorted")
      }
      // every calibrated value is a real score from the corpus (the
      // reference is a subset of the input), never an interpolation
      assert(out.forall(t => allScores.contains(t._4)), "synthetic value")
    }
  }

  test("law: bootstrapCI lo <= hi always; conf=0.99 interval contains conf=0.80's") {
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    val df = (1 to 120).map(i => (i.toLong, (i * 37 % 100).toLong))
      .toDF("id", "v")
    def ci(c: Double) = {
      val r = graft.ops.Stats.bootstrapCI(df, Nil, F.col("v"), F.col("id"),
        b = 100, conf = c).head()
      (r.getDouble(r.fieldIndex("ci_lo")), r.getDouble(r.fieldIndex("ci_hi")))
    }
    val (lo99, hi99) = ci(0.99)
    val (lo80, hi80) = ci(0.80)
    assert(lo99 <= hi99 && lo80 <= hi80)
    assert(lo99 <= lo80 && hi80 <= hi99,
      s"wider confidence must widen the interval: 99%=[$lo99,$hi99] 80%=[$lo80,$hi80]")
  }

  test("law: spearman is invariant under strictly monotone transforms of either axis") {
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    val gen = Gen.listOfN(30, Gen.zip(Gen.chooseNum(-50L, 50L),
      Gen.chooseNum(-50L, 50L)))
    forAll(gen) { rows =>
      if (rows.map(_._1).distinct.size > 1 && rows.map(_._2).distinct.size > 1) {
        val df = rows.toDF("x", "y")
        def rho(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
          graft.ops.Stats.spearman(df, x, y).head().getDouble(1)
        val base = rho(F.col("x"), F.col("y"))
        // 3x+7 and y³ are strictly increasing → identical ranks
        val warped = rho(F.col("x") * 3 + 7,
          F.col("y") * F.col("y") * F.col("y"))
        assert(base == warped, s"$base != $warped on $rows")
      }
    }
  }

  test("law: aucExact flips to 1-auc under label negation; monotone score maps are no-ops") {
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    val gen = Gen.listOfN(40, Gen.zip(Gen.chooseNum(0, 100), Gen.oneOf(true, false)))
    forAll(gen) { rows =>
      if (rows.exists(_._2) && rows.exists(!_._2)) {
        val df = rows.map { case (s, y) => (s / 100.0, y) }.toDF("s", "y")
        def auc(s: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
          graft.ops.Stats.aucExact(df, s, y).head().getDouble(2)
        val a = auc(F.col("s"), F.col("y"))
        val flipped = auc(F.col("s"), !F.col("y"))
        assert(math.abs(a + flipped - 1.0) < 2e-6, s"$a + $flipped != 1")
        val warped = auc(F.exp(F.col("s") * 5), F.col("y"))
        assert(a == warped, s"monotone map moved AUC: $a -> $warped")
      }
    }
  }

  test("law: cohensKappa is symmetric in its raters") {
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    val gen = Gen.listOfN(30, Gen.zip(Gen.oneOf(true, false), Gen.oneOf(true, false)))
    forAll(gen) { rows =>
      val df = rows.toDF("a", "b")
      val ab = graft.ops.Stats.cohensKappa(df, F.col("a"), F.col("b")).head()
      val ba = graft.ops.Stats.cohensKappa(df, F.col("b"), F.col("a")).head()
      assert(ab.isNullAt(5) == ba.isNullAt(5))
      if (!ab.isNullAt(5)) assert(ab.getDouble(5) == ba.getDouble(5))
    }
  }

  test("law: skyline2d is idempotent and dominates every dropped point") {
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    val gen = Gen.listOfN(40, Gen.zip(Gen.chooseNum(0L, 20L), Gen.chooseNum(0L, 20L)))
    forAll(gen) { pts =>
      if (pts.nonEmpty) {
        val df = pts.zipWithIndex
          .map { case ((x, y), i) => (i.toLong, x, y) }.toDF("id", "x", "y")
        val front = graft.ops.Stats.skyline2d(df, "id", F.col("x"), F.col("y"))
          .select("id", "x", "y").as[(Long, Long, Long)].collect().toSeq
        // idempotent: the frontier of the frontier is itself
        val again = graft.ops.Stats.skyline2d(front.toDF("id", "x", "y"),
          "id", F.col("x"), F.col("y"))
          .select("id", "x", "y").as[(Long, Long, Long)].collect().toSeq
        assert(again.toSet == front.toSet, s"not idempotent on $pts")
        // every dropped point is strictly dominated by some frontier point
        val frontSet = front.map(t => (t._2, t._3))
        pts.zipWithIndex.filterNot(p => front.exists(_._1 == p._2)).foreach {
          case ((x, y), _) =>
            assert(frontSet.exists(f => f._1 >= x && f._2 >= y &&
              (f._1 > x || f._2 > y)), s"($x,$y) dropped but undominated")
        }
      }
    }
  }

  test("law: temperatureMix at alpha=1 is the identity mixture (factor 1)") {
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    val gen = Gen.listOfN(50, Gen.oneOf("a", "b", "c", "d"))
    forAll(gen) { langs =>
      if (langs.nonEmpty) {
        val out = graft.ops.Sampling.temperatureMix(
          langs.toDF("lang"), F.col("lang"), alpha = 1.0).collect()
        out.foreach { r =>
          assert(math.abs(r.getDouble(2) - r.getDouble(3)) <= 2e-6, r)
          assert(math.abs(r.getDouble(4) - 1.0) <= 2e-6, r)
        }
      }
    }
  }

  test("law: psi is symmetric under swapping baseline and current") {
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    val gen = Gen.listOfN(60, Gen.zip(Gen.chooseNum(0, 99), Gen.oneOf(true, false)))
    forAll(gen) { rows =>
      if (rows.exists(_._2) && rows.exists(!_._2)) {
        val df = rows.map { case (s, b) => (s / 100.0, b) }.toDF("s", "b")
        def total(base: org.apache.spark.sql.Column) =
          graft.ops.Stats.psi(df, F.col("s"), base).head().getDouble(4)
        // (p−q)·ln(p/q) is invariant under p↔q
        assert(total(F.col("b")) == total(!F.col("b")))
      }
    }
  }

  test("law: mcc and the odds ratio are invariant under transposing the 2x2") {
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    val gen = Gen.listOfN(40, Gen.zip(Gen.oneOf(true, false), Gen.oneOf(true, false)))
    forAll(gen) { rows =>
      val df = rows.toDF("a", "b")
      val m1 = graft.ops.Stats.mcc(df, F.col("a"), F.col("b")).head()
      val m2 = graft.ops.Stats.mcc(df, F.col("b"), F.col("a")).head()
      assert(m1.isNullAt(4) == m2.isNullAt(4))
      if (!m1.isNullAt(4)) assert(m1.getDouble(4) == m2.getDouble(4))
      val o1 = graft.ops.Stats.oddsRatio(df, F.col("a"), F.col("b")).head()
      val o2 = graft.ops.Stats.oddsRatio(df, F.col("b"), F.col("a")).head()
      // OR = ad/bc survives the transpose (b and c swap); RR does not
      assert(o1.getDouble(5) == o2.getDouble(5) ||
        (o1.getDouble(5).isNaN && o2.getDouble(5).isNaN))
    }
  }

  test("law: weightedQuantile with unit weights is the classic order statistic") {
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    val gen = Gen.listOfN(30, Gen.chooseNum(0L, 50L))
    forAll(gen) { vs =>
      if (vs.nonEmpty) {
        val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("id", "v")
        val qs = Seq(0.25, 0.5, 0.9, 1.0)
        val got = graft.ops.Stats.weightedQuantile(df, Nil, F.col("v"),
            F.lit(1L), qs)
          .select("q", "value").as[(Double, Long)].collect().toMap
        val sorted = vs.sorted
        qs.foreach { q =>
          // smallest value whose 1-based rank reaches q·n
          val want = sorted(math.ceil(q * vs.size).toInt - 1)
          assert(got(q) == want, s"q=$q on $vs: ${got(q)} != $want")
        }
      }
    }
  }

  test("law: conformal q_hat grows with q; coverage tracks it") {
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    val df = (1L to 300L).map(i => (i, (i * 7 % 23).toDouble, 0.0))
      .toDF("id", "y", "pred")
    def at(q: Double) = {
      val r = graft.ops.Stats.conformalInterval(df, F.col("id"), F.col("y"),
        F.col("pred"), calibRate = 0.5, q = q).head()
      (r.getDouble(2), r.getDouble(3))
    }
    val (q80, c80) = at(0.8)
    val (q95, c95) = at(0.95)
    assert(q80 <= q95, s"$q80 > $q95")
    assert(c80 <= c95, s"$c80 > $c95")
  }

  test("law: kaplanMeier with zero censoring equals the empirical survivor function") {
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    val gen = Gen.listOfN(30, Gen.chooseNum(0L, 15L))
    forAll(gen) { durs =>
      if (durs.nonEmpty) {
        val df = durs.map(d => (d, 1)).toDF("dur", "ev")
        val n = durs.size.toDouble
        val got = graft.ops.Stats.kaplanMeier(df, F.col("dur"), F.col("ev"))
          .select("t", "survival").as[(Long, Double)].collect()
        got.foreach { case (t, s) =>
          val emp = durs.count(_ > t) / n
          assert(math.abs(s - emp) < 1e-6,
            s"S($t)=$s but empirical=$emp on $durs")
        }
      }
    }
  }

  test("law: logRank risk sets match kaplanMeier; mirrored arms give chi2=0; " +
      "arm swap is chi2-invariant") {
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    val gen = Gen.listOfN(25, Gen.zip(Gen.chooseNum(0L, 12L), Gen.oneOf(0, 1)))
    forAll(gen) { subj =>
      if (subj.exists(_._2 == 1)) {
        val df = subj.zipWithIndex
          .map { case ((d, e), i) => (d, e, i % 2 == 0) }
          .toDF("dur", "ev", "arm")
        val lr = graft.ops.Stats.logRank(df, F.col("dur"), F.col("ev"),
          F.col("arm"))
        // (t, n_risk, d) is the same risk-set collapse kaplanMeier does
        val km = graft.ops.Stats.kaplanMeier(df, F.col("dur"), F.col("ev"))
          .select("t", "n_risk", "d").as[(Long, Long, Long)].collect().toSet
        val got = lr.select("t", "n_risk", "d")
          .as[(Long, Long, Long)].collect().toSet
        assert(got == km, s"risk sets diverge on $subj")
        // relabeling the arms flips U's sign only: chi2 identical
        val sw = graft.ops.Stats.logRank(df, F.col("dur"), F.col("ev"),
            !F.col("arm")).select("chi2").as[Double].head()
        assert(sw == lr.select("chi2").as[Double].head(),
          s"arm swap changed chi2 on $subj")
        // duplicating every subject into BOTH arms: d1=d/2, n1=n/2 at
        // every t, so O-E vanishes termwise and chi2 is exactly 0
        val mirror = subj.flatMap { case (d, e) => Seq((d, e, true), (d, e, false)) }
          .toDF("dur", "ev", "arm")
        val mchi = graft.ops.Stats.logRank(mirror, F.col("dur"), F.col("ev"),
          F.col("arm")).select("chi2").as[Double].head()
        assert(mchi == 0.0, s"mirrored arms chi2=$mchi on $subj")
      }
    }
  }

  test("law: two-group rank family coheres — KW H = MW z², δ = 2·AUC − 1, " +
      "J + U1 = n1·n2") {
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    val gen = Gen.listOfN(24, Gen.zip(Gen.chooseNum(0L, 9L), Gen.oneOf("a", "b")))
    forAll(gen) { pts =>
      val gs = pts.map(_._2).toSet
      if (gs.size == 2) {
        val df = pts.map { case (v, g) => (g, v.toDouble) }.toDF("g", "v")
        val isA = F.col("g") === "a"
        // Kruskal-Wallis on 2 groups IS the Mann-Whitney test: Hc = z²
        val h = graft.ops.Stats.kruskalWallis(df, F.col("g"), F.col("v"))
          .select("h_corr").as[Double].head()
        val mw = graft.ops.Stats.mannWhitneyU(df, F.col("v"), isA)
          .select("u1", "z").as[(Double, Double)].head()
        if (!mw._2.isNaN && mw._2 != 0.0)
          assert(math.abs(h - mw._2 * mw._2) < 1e-4,
            s"Hc=$h vs z^2=${mw._2 * mw._2} on $pts")
        // Cliff's delta is the rescaled AUC of the same ranking
        val d = graft.ops.Stats.cliffsDelta(df, F.col("v"), isA)
          .select("delta").as[Double].head()
        val auc = graft.ops.Stats.aucExact(df, F.col("v"), isA)
          .select("auc").as[Double].head()
        assert(math.abs(d - (2.0 * auc - 1.0)) < 1e-5,
          s"delta=$d vs 2auc-1=${2 * auc - 1} on $pts")
        // Jonckheere's J counts b-beats-a (+½ ties); U1 counts the
        // complement, so they tile the n1·n2 pair grid exactly
        val j = graft.ops.Stats.jonckheereTerpstra(df, F.col("g"),
          F.col("v")).select("j").as[Double].head()
        val n1 = pts.count(_._2 == "a").toDouble
        val n2 = pts.count(_._2 == "b").toDouble
        assert(math.abs(j + mw._1 - n1 * n2) < 1e-6,
          s"J=$j U1=${mw._1} n1n2=${n1 * n2} on $pts")
      }
    }
  }

  test("law: agreement family coheres — complete 2-rater panels give " +
      "(1 − α) = (1 − κ)·(Nm−1)/(Nm); l_distinct matches kAnonymity") {
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    // N items, each rated by exactly 2 raters over 3 categories
    val gen = Gen.listOfN(10, Gen.zip(Gen.chooseNum(0L, 2L),
      Gen.chooseNum(0L, 2L)))
    forAll(gen) { pairs =>
      val rows = pairs.zipWithIndex.flatMap { case ((r1, r2), i) =>
        Seq((s"it$i", r1), (s"it$i", r2)) }
      val df = rows.toDF("it", "cat")
      val kap = graft.ops.Stats.fleissKappa(df, F.col("it"),
        F.col("cat"), m = 2).select("kappa").as[Option[Double]].head()
      val alp = graft.ops.Stats.krippAlphaNominal(df, F.col("it"),
        F.col("cat")).select("alpha").as[Option[Double]].head()
      (kap, alp) match {
        case (Some(k), Some(a)) =>
          val nm = 2.0 * pairs.size
          assert(math.abs((1.0 - a) - (1.0 - k) * (nm - 1.0) / nm) < 3e-6,
            s"kappa=$k alpha=$a on $pairs")
        case _ => // Pe = 1 (one category) NULLs kappa; alpha may too
      }
      // the l-diversity audit's distinct-l must agree with kAnonymity's
      val ld = graft.ops.Curation.lDiversityAudit(df, Seq("it"),
        F.col("cat")).select("it", "l_distinct")
        .as[(String, Long)].collect().toMap
      val ka = graft.ops.Curation.kAnonymityAudit(df, Seq("it"),
        F.col("cat")).select("it", "l").as[(String, Long)].collect().toMap
      assert(ld == ka, s"l mismatch on $pairs")
    }
  }

  test("law: adKSample is rank-based — invariant under strictly " +
      "monotone transforms; identical samples give 0") {
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    val gen = Gen.listOfN(20, Gen.zip(Gen.chooseNum(0L, 6L),
      Gen.oneOf("a", "b", "c")))
    forAll(gen) { pts =>
      if (pts.map(_._2).toSet.size >= 2) {
        val df = pts.map { case (v, g) => (g, v.toDouble) }.toDF("g", "v")
        def a2(vc: org.apache.spark.sql.Column): Double =
          graft.ops.Stats.adKSample(df, F.col("g"), vc, scale = 1L)
            .select("a2").as[Option[Double]].head().getOrElse(-1.0)
        val base = a2(F.col("v"))
        // affine and cubic maps preserve order and tie structure exactly
        val aff = a2(F.col("v") * 7.0 + 3.0)
        val cub = a2(F.col("v") * F.col("v") * F.col("v"))
        assert(math.abs(base - aff) < 1e-9, s"affine: $base vs $aff")
        assert(math.abs(base - cub) < 1e-9, s"cubic: $base vs $cub")
      }
      // two verbatim copies of the SAME value multiset are one
      // distribution -> statistic exactly 0 (every N·E − D·n_i cancels);
      // NULL only in the degenerate all-one-value corpus
      val doubled = (pts.map(p => ("a", p._1.toDouble)) ++
        pts.map(p => ("a2", p._1.toDouble))).toDF("g", "v")
      val z = graft.ops.Stats.adKSample(doubled, F.col("g"),
        F.col("v"), scale = 1L).select("a2").as[Option[Double]].head()
      z.foreach(v => assert(v == 0.0, s"identical copies: $v"))
    }
  }

  test("law: delongAucCi's point estimate IS aucExact on tied data") {
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    val gen = Gen.listOfN(16, Gen.zip(Gen.chooseNum(0L, 5L),
      Gen.oneOf(true, false)))
    forAll(gen) { pts =>
      if (pts.exists(_._2) && pts.exists(!_._2)) {
        val df = pts.map { case (v, y) => (v.toDouble, y) }.toDF("s", "y")
        val a1 = graft.ops.Stats.delongAucCi(df, F.col("s"), F.col("y"),
          scale = 1.0).select("auc").as[Double].head()
        val a2 = graft.ops.Stats.aucExact(df, F.col("s"), F.col("y"))
          .select("auc").as[Double].head()
        assert(math.abs(a1 - a2) < 2e-6, s"delong=$a1 exact=$a2 on $pts")
      }
    }
  }

  test("law: shape-metric invariances — JB ignores location/scale, " +
      "Theil ignores scale, HHI ignores relabeling") {
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    val gen = Gen.listOfN(12, Gen.chooseNum(1L, 50L))
    forAll(gen) { vs =>
      if (vs.distinct.length > 1) {
        val df = vs.map(_.toDouble).toDF("v")
        // JB on 10·x + 7 equals JB on x (skew/kurtosis are standardized);
        // quantized integers, so scaling by 10 stays exact
        val j1 = graft.ops.Stats.jarqueBera(df, F.col("v"))
          .select("skew", "kurt_x", "jb")
          .as[(Double, Double, Double)].head()
        val j2 = graft.ops.Stats.jarqueBera(
            df.select((F.col("v") * 10 + 7).as("v")), F.col("v"))
          .select("skew", "kurt_x", "jb")
          .as[(Double, Double, Double)].head()
        assert(math.abs(j1._3 - j2._3) < 2e-6 &&
          math.abs(j1._1 - j2._1) < 2e-6, s"JB not affine-stable: $j1 $j2")
        // Theil T/L and Atkinson are scale-free (relative inequality)
        val i1 = graft.ops.Stats.inequality(df, F.col("v"))
          .select("theil_t", "theil_l", "atkinson1")
          .as[(Double, Double, Double)].head()
        val i2 = graft.ops.Stats.inequality(
            df.select((F.col("v") * 4).as("v")), F.col("v"))
          .select("theil_t", "theil_l", "atkinson1")
          .as[(Double, Double, Double)].head()
        assert(math.abs(i1._1 - i2._1) < 2e-6 &&
          math.abs(i1._3 - i2._3) < 2e-6, s"Theil not scale-free: $i1 $i2")
      }
    }
    // HHI depends only on the count multiset, not the labels
    val a = Seq("x", "x", "y", "z", "z", "z").toDF("k")
    val b = Seq("p3", "p3", "p1", "p2", "p2", "p2").toDF("k")
    val h1 = graft.ops.Stats.concentration(a, F.col("k"))
      .select("hhi").as[Double].head()
    val h2 = graft.ops.Stats.concentration(b, F.col("k"))
      .select("hhi").as[Double].head()
    assert(h1 == h2, s"HHI label-dependent: $h1 vs $h2")
  }

  test("law: curve metrics cohere — perfect ranking saturates KS/PR-AUC/" +
      "MAP; prAuc floors at prevalence for a constant score") {
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    val perfect = Seq((0.9, true), (0.8, true), (0.3, false),
      (0.2, false)).toDF("s", "y")
    val ks = graft.ops.Stats.ksSeparation(perfect, F.col("s"), F.col("y"))
      .select("ks").as[Double].head()
    val pr = graft.ops.Stats.prAuc(perfect, F.col("s"), F.col("y"))
      .select("pr_auc").as[Double].head()
    assert(ks == 1.0 && pr == 1.0, s"perfect ranking: ks=$ks pr=$pr")
    // one tie-group of everything: precision is prevalence everywhere
    val flat = Seq((0.5, true), (0.5, false), (0.5, true), (0.5, false))
      .toDF("s", "y")
    val prFlat = graft.ops.Stats.prAuc(flat, F.col("s"), F.col("y"))
      .select("pr_auc", "baseline").as[(Double, Double)].head()
    assert(prFlat._1 == prFlat._2, s"flat score must read prevalence: $prFlat")
  }

  test("law: series tooling coheres — ccf lag 0 is Pearson of the " +
      "aligned series; pacf lag 1 equals acf lag 1; ariNmi is symmetric") {
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    val gen = Gen.listOfN(10, Gen.chooseNum(1L, 30L))
    forAll(gen, gen) { (ys, xs) =>
      if (ys.distinct.length > 1 && xs.distinct.length > 1) {
        def ser(vs: Seq[Long]) = vs.zipWithIndex
          .map { case (v, i) => ((i + 1).toLong, v) }.toDF("t", "v")
        val r0 = graft.ops.Stats.ccf(ser(ys), ser(xs), "t", "v",
            maxLag = 2)
          .filter(F.col("lag") === 0).select("r").as[Double].head()
        val joined = ys.zip(xs).map { case (y, x) =>
          (y.toDouble, x.toDouble) }.toDF("y", "x")
        val rp = joined.select(F.round(F.corr("y", "x"), 6))
          .as[Double].head()
        assert(math.abs(r0 - rp) < 2e-6, s"ccf(0)=$r0 pearson=$rp")
        val pa = graft.ops.Stats.pacf(ser(ys), "t", "v", maxLag = 2)
          .filter(F.col("lag") === 1)
          .select("acf", "pacf").as[(Double, Double)].head()
        assert(pa._1 == pa._2, s"pacf(1) must equal acf(1): $pa")
      }
    }
    val pairs = Seq(("a", "p"), ("a", "p"), ("b", "q"), ("b", "p"))
      .toDF("u", "w")
    val f = graft.ops.Stats.ariNmi(pairs, F.col("u"), F.col("w"))
      .select("ari", "nmi").as[(Double, Double)].head()
    val g = graft.ops.Stats.ariNmi(pairs, F.col("w"), F.col("u"))
      .select("ari", "nmi").as[(Double, Double)].head()
    assert(f == g, s"ariNmi not symmetric: $f vs $g")
  }

  test("law: lepage IS its components — z_w/z_ab match MW/AB, L = " +
      "z_w² + z_ab², p = exp(−L/2); BM p̂ = 1 − AUC") {
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    val gen = Gen.listOfN(20, Gen.zip(Gen.chooseNum(0L, 9L), Gen.oneOf(true, false)))
    forAll(gen) { pts =>
      if (pts.exists(_._2) && pts.exists(!_._2)) {
        val df = pts.map { case (v, c) => (v.toDouble, c) }.toDF("v", "c")
        val lep = graft.ops.Stats.lepage(df, F.col("v"), F.col("c"))
          .as[(Long, Long, Option[Double], Option[Double], Option[Double],
            Option[Double])].head()
        val zw = graft.ops.Stats.mannWhitneyU(df, F.col("v"), F.col("c"))
          .select("z").as[Option[Double]].head()
        val zab = graft.ops.Stats.ansariBradley(df, F.col("v"), F.col("c"))
          .select("z").as[Option[Double]].head()
        assert(lep._3 == zw && lep._4 == zab, s"components differ: $lep")
        (lep._3, lep._4, lep._5) match {
          case (Some(a), Some(b), Some(l)) =>
            assert(math.abs(l - (a * a + b * b)) < 1e-6, s"L law: $lep")
            assert(math.abs(lep._6.get - math.exp(-(a * a + b * b) / 2)) < 1e-8,
              s"p law: $lep")
          case _ => ()
        }
        // Brunner-Munzel's superiority estimate is the AUC complement
        val ph = graft.ops.Stats.brunnerMunzel(df, F.col("v"), F.col("c"))
          .select("p_hat").as[Double].head()
        val auc = graft.ops.Stats.aucExact(df, F.col("v"), F.col("c"))
          .select("auc").as[Double].head()
        assert(math.abs(ph - (1.0 - auc)) < 1e-5,
          s"p_hat=$ph vs 1-auc=${1.0 - auc} on $pts")
      }
    }
  }

  test("law: kuiper V is rotation-invariant on the wheel; CvM T is " +
      "invariant under a strictly increasing map") {
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    val gen = Gen.listOfN(16, Gen.chooseNum(0L, 7L))
    forAll(gen) { hs =>
      val base = graft.ops.Stats.kuiperUniform(hs.toDF("h"), F.col("h"),
        period = 8).select("v").as[Double].head()
      for (shift <- 1 to 7) {
        val rot = graft.ops.Stats.kuiperUniform(
          hs.map(h => (h + shift) % 8).toDF("h"), F.col("h"), period = 8)
          .select("v").as[Double].head()
        assert(rot == base, s"kuiper not rotation-invariant at $shift: " +
          s"$base vs $rot on $hs")
      }
    }
    val gen2 = Gen.listOfN(14, Gen.zip(Gen.chooseNum(0L, 9L), Gen.oneOf(true, false)))
    forAll(gen2) { pts =>
      if (pts.exists(_._2) && pts.exists(!_._2)) {
        val df = pts.map { case (v, c) => (v.toDouble, c) }.toDF("v", "c")
        val mapped = pts.map { case (v, c) => (v * 3.0 + 7.0, c) }
          .toDF("v", "c")
        val a = graft.ops.Stats.cvmTwoSample(df, F.col("v"), F.col("c"))
          .select("t").as[Double].head()
        val b = graft.ops.Stats.cvmTwoSample(mapped, F.col("v"), F.col("c"))
          .select("t").as[Double].head()
        assert(a == b, s"CvM not rank-based: $a vs $b on $pts")
      }
    }
  }

  test("law: katz on a cycle is symmetric; spectral entropy lives in " +
      "[0, 1]; rmst is bounded by tau; energy distance of a set with " +
      "itself is 0") {
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    val cyc = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
      .toDF("src", "dst")
    val k = graft.ops.Graph.katzCentrality(cyc, "src", "dst",
        alpha = 0.3, beta = 1.0, iters = 3, topN = 10)
      .select("katz").as[Double].collect().toSeq
    assert(k.distinct.size == 1, s"cycle katz must be uniform: $k")
    val gen = Gen.listOfN(12, Gen.chooseNum(1L, 30L))
    forAll(gen) { vs =>
      if (vs.distinct.length > 1) {
        val ser = vs.zipWithIndex.map { case (v, i) =>
          (i.toLong, v.toDouble) }.toDF("t", "v")
        val h = graft.ops.Stats.spectralEntropy(ser, "t", "v", maxK = 10)
          .select("h_norm").as[Option[Double]].head()
        h.foreach(x => assert(x >= -1e-9 && x <= 1.0 + 1e-9,
          s"h_norm out of [0,1]: $x on $vs"))
      }
      val subj = vs.zipWithIndex.map { case (v, i) =>
        (v, if (i % 3 == 0) 0 else 1) }.toDF("dur", "ev")
      val r = graft.ops.Stats.rmst(subj, F.col("dur"), F.col("ev"),
        tau = 20L).select("rmst").as[Double].head()
      assert(r > 0.0 && r <= 20.0, s"rmst out of (0, tau]: $r on $vs")
    }
    val x = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 2f)), (3L, Seq(3f, 3f)))
      .toDF("vec_id", "embedding")
    val e = graft.ops.Similarity.energyDistance(x, x, "vec_id",
      "embedding").select("energy").as[Double].head()
    assert(e == 0.0, s"E(X,X) must be 0: $e")
  }

  test("law: designEffect's ICC is icc1's ICC; bhattacharyya's " +
      "hellinger² = 1 − BC") {
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    val gen = Gen.listOfN(18, Gen.zip(Gen.oneOf("g1", "g2", "g3"),
      Gen.chooseNum(0L, 9L)))
    forAll(gen) { pts =>
      if (pts.map(_._1).distinct.size >= 2 &&
          pts.groupBy(_._1).forall(_._2.size >= 2)) {
        val df = pts.map { case (g, v) => (g, v.toDouble) }.toDF("g", "v")
        val de = graft.ops.Stats.designEffect(df, F.col("g"), F.col("v"),
          scale = 100L).select("icc").as[Option[Double]].head()
        val i1 = graft.ops.Stats.icc1(df, F.col("g"), F.col("v"))
          .select("icc").as[Option[Double]].head()
        (de, i1) match {
          case (Some(a), Some(b)) =>
            assert(math.abs(a - b) < 1e-4, s"icc mismatch: $a vs $b on $pts")
          case _ => ()
        }
        val bc = graft.ops.Stats.bhattacharyya(df, F.col("v"),
            F.col("g") === "g1", nBins = 5)
          .as[(Long, Long, Double, Option[Double], Double)].head()
        assert(math.abs(bc._5 * bc._5 - (1.0 - bc._3)) < 1e-5,
          s"hellinger law: $bc")
      }
    }
  }

  test("law: Quality censuses are total and coherent — random fact/dim " +
      "tables incl. NULL fks, duplicate pks, composite keys; empty and " +
      "single-row inputs census as zeros") {
    import spark.implicits._
    import org.apache.spark.sql.{functions => F}
    import graft.ops.Quality

    def riRow(fact: DataFrame, dim: DataFrame): Row =
      Quality.referentialIntegrity(fact, "fk", dim, "pk").collect()(0)
    def kuRow(df: DataFrame, keys: Seq[String]): Row =
      Quality.keyUniqueness(df, keys).collect()(0)

    val fkGen: Gen[List[Option[Int]]] = Gen.choose(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        1 -> Gen.const(Option.empty[Int]),
        5 -> Gen.choose(1, 12).map(Option(_)))))
    val pkGen: Gen[List[Int]] = Gen.choose(0, 15).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1, 12))) // duplicates ON PURPOSE
    forAll(fkGen, pkGen) { (fks, pks) =>
      val fact = fks.toDF("fk")
      val dim = pks.toDF("pk")
      val r = riRow(fact, dim)
      val pkSet = pks.toSet
      val matchedCounts = fks.flatten.filter(pkSet.contains)
        .groupBy(identity).map(_._2.size.toLong)
      assert(r.getAs[Long]("n_fact") == fks.size.toLong, s"n_fact on $fks")
      assert(r.getAs[Long]("n_null_fk") == fks.count(_.isEmpty).toLong)
      assert(r.getAs[Long]("n_orphan") ==
        fks.flatten.count(v => !pkSet.contains(v)).toLong, s"orphan on $fks/$pks")
      // duplicate pks collapse: n_dim counts DISTINCT keys (documented)
      assert(r.getAs[Long]("n_dim") == pkSet.size.toLong, s"n_dim on $pks")
      assert(r.getAs[Long]("n_childless") ==
        pkSet.count(p => !fks.flatten.contains(p)).toLong)
      assert(r.getAs[Long]("max_fanout") ==
        (if (matchedCounts.isEmpty) 0L else matchedCounts.max))
      val os = Option(r.getAs[java.lang.Double]("orphan_share"))
      if (fks.isEmpty) assert(os.isEmpty, "orphan_share must be NULL on 0 facts")
      else assert(math.abs(os.get - r.getAs[Long]("n_orphan").toDouble / fks.size) < 1e-6)
    }

    val rowsGen: Gen[List[(Option[Int], String)]] = Gen.choose(0, 40)
      .flatMap(n => Gen.listOfN(n, for {
        a <- Gen.frequency(1 -> Gen.const(Option.empty[Int]),
          4 -> Gen.choose(1, 5).map(Option(_)))
        b <- Gen.oneOf("x", "y", "z")
      } yield (a, b)))
    forAll(rowsGen) { rows =>
      val r = kuRow(rows.toDF("a", "b"), Seq("a", "b"))
      val byKey = rows.groupBy(identity).map(_._2.size.toLong).toSeq
      assert(r.getAs[Long]("n_rows") == rows.size.toLong)
      assert(r.getAs[Long]("n_keys") == byKey.size.toLong)
      assert(r.getAs[Long]("n_dup_keys") == byKey.count(_ > 1L).toLong)
      assert(r.getAs[Long]("dup_rows") == byKey.filter(_ > 1L).sum)
      assert(r.getAs[Long]("max_multiplicity") ==
        (if (byKey.isEmpty) 0L else byKey.max))
      val es = Option(r.getAs[java.lang.Double]("excess_share"))
      if (rows.isEmpty) assert(es.isEmpty)
      else assert(math.abs(es.get -
        (rows.size - byKey.size).toDouble / rows.size) < 1e-6)
    }

    // pinned edges the generators may not hit every run
    val emptyF = List.empty[Option[Int]].toDF("fk")
    val emptyD = List.empty[Int].toDF("pk")
    val re = riRow(emptyF, emptyD)
    assert((re.getAs[Long]("n_fact"), re.getAs[Long]("n_dim"),
      re.getAs[Long]("max_fanout")) == ((0L, 0L, 0L)), re)
    assert(re.isNullAt(re.fieldIndex("orphan_share")) &&
      re.isNullAt(re.fieldIndex("childless_share")), re)
    // all-NULL fk: missing linkage, never orphaned linkage
    val rn = riRow(List[Option[Int]](None, None).toDF("fk"),
      List(1).toDF("pk"))
    assert((rn.getAs[Long]("n_null_fk"), rn.getAs[Long]("n_orphan")) ==
      ((2L, 0L)), rn)
    // composite key with one column all-NULL: NULLs group as values
    val kn = kuRow(List((Option.empty[Int], "a"), (Option.empty[Int], "a"),
      (Option.empty[Int], "b")).toDF("a", "b"), Seq("a", "b"))
    assert((kn.getAs[Long]("n_keys"), kn.getAs[Long]("n_dup_keys"),
      kn.getAs[Long]("dup_rows")) == ((2L, 1L, 2L)), kn)
    // single row: trivially unique
    val k1 = kuRow(List((Option(1), "a")).toDF("a", "b"), Seq("a", "b"))
    assert((k1.getAs[Long]("n_rows"), k1.getAs[Long]("n_keys"),
      k1.getAs[Double]("excess_share")) == ((1L, 1L, 0.0)), k1)
    val k0 = kuRow(List.empty[(Option[Int], String)].toDF("a", "b"),
      Seq("a", "b"))
    assert((k0.getAs[Long]("n_rows"), k0.getAs[Long]("max_multiplicity")) ==
      ((0L, 0L)), k0)
  }

  test("law: sourceOverlapMatrix is a symmetric-shared full grid; " +
      "packingEfficiency matches an exact Scala replay of the bins") {
    import spark.implicits._
    import org.apache.spark.sql.{functions => F}

    val srcDocGen: Gen[List[(String, String)]] = Gen.choose(0, 50)
      .flatMap(n => Gen.listOfN(n, for {
        src <- Gen.oneOf("s1", "s2", "s3")
        txt <- Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff", "Aa  x", "zz")
      } yield (src, txt)))
    forAll(srcDocGen) { rows =>
      if (rows.nonEmpty) {
        val got = graft.ops.Dedup.sourceOverlapMatrix(
            rows.toDF("source", "text"), "source", "text")
          .as[(String, String, Long, Long, Double)].collect().toSeq
        def norm(t: String) =
          t.toLowerCase.replaceAll("\\s+", " ") // fingerprint normalization
        val fps = rows.map { case (s0, t) => (s0, norm(t)) }.distinct
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
        val srcs = fps.keySet.toSeq.sorted
        // full grid, ordered pairs only
        assert(got.size == srcs.size * (srcs.size - 1), got)
        val m = got.map(r => (r._1, r._2) -> r).toMap
        for (a <- srcs; b <- srcs if a != b) {
          val r = m((a, b))
          val shared = (fps(a) intersect fps(b)).size.toLong
          assert(r._3 == fps(a).size.toLong && r._4 == shared, r)
          // shared census is symmetric; containment is the directional
          assert(m((b, a))._4 == shared)
          assert(math.abs(r._5 - shared.toDouble / fps(a).size) < 1e-6)
        }
      }
    }

    val tokGen: Gen[List[Long]] = Gen.choose(1, 30)
      .flatMap(n => Gen.listOfN(n, Gen.choose(1L, 3000L)))
    forAll(tokGen) { toks =>
      val cap = 1024L
      val docs = toks.zipWithIndex.map { case (t, i) => ("g", i.toLong, t) }
        .toDF("src", "id", "tok")
      val got = graft.ops.Curation.packingEfficiency(
          docs, "src", "id", "tok", cap.toInt)
        .as[(String, Long, Long, Long, Long, Long, Long, Double, Double)]
        .head()
      // exact Scala replay: bin = pre-doc prefix sum / cap
      val bins = toks.scanLeft(0L)(_ + _).zip(toks)
        .map { case (pre, t) => (pre / cap, t) }
        .groupBy(_._1).map { case (b, v) => b -> v.map(_._2).sum }
      val waste = bins.values.map(bt => math.max(0L, cap - bt)).sum
      assert(got._2 == toks.size.toLong && got._3 == bins.size.toLong, got)
      assert(got._4 == toks.sum && got._6 == waste, got)
      assert(got._5 == bins.values.count(_ > cap).toLong, got)
      assert(got._7 == bins.values.max, got)
    }
  }

  test("law: DP releases — noise depends only on (seed, key): doubling " +
      "the data shifts noisy_n by exactly the count delta, and " +
      "pre-clamping values is a no-op for dpNoisyMean") {
    import org.apache.spark.sql.{functions => F}
    import graft.ops.Curation
    forAll(tableGen) { rows =>
      val df = toDf(rows)
      val c1 = Curation.dpNoisyCounts(df, Seq("name"), epsilon = 0.7)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      val c2 = Curation.dpNoisyCounts(df.unionAll(df), Seq("name"),
          epsilon = 0.7)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(c1.map(_._1).toSeq == c2.map(_._1).toSeq)
      c1.zip(c2).foreach { case ((k, n1, y1), (_, n2, y2)) =>
        assert(n2 == 2 * n1, s"count must double for $k")
        // same key -> same Laplace draw; only 6-dp rounding at the two
        // magnitudes can differ
        assert(math.abs((y2 - n2) - (y1 - n1)) < 2e-6,
          s"noise must be data-independent for $k: ${y1 - n1} vs ${y2 - n2}")
      }
      val lo = -50L; val hi = 50L
      val m1 = Curation.dpNoisyMean(df, Seq("name"), "value", lo, hi,
        epsilon = 1.3).collect().toSeq
      val pre = df.withColumn("value", F.greatest(F.lit(lo),
        F.least(F.lit(hi), F.col("value").cast("long"))).cast("double"))
      val m2 = Curation.dpNoisyMean(pre, Seq("name"), "value", lo, hi,
        epsilon = 1.3).collect().toSeq
      assert(m1 == m2, "clamping must be idempotent")
    }
  }

  test("law: compressionCensus is partitioning-invariant and conserves " +
      "docs and bytes") {
    import org.apache.spark.sql.{functions => F}
    import graft.ops.TextOps
    val textGen: Gen[List[String]] = Gen.choose(1, 25).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(
        "plain short prose", "x", "", "spam " * 50, "mixed 123 !?",
        "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa")))
    forAll(textGen) { texts =>
      import spark.implicits._
      val df = texts.zipWithIndex
        .map { case (t, i) => (s"g${i % 3}", t) }.toDF("g", "t")
      val a = TextOps.compressionCensus(df.repartition(7), Seq("g"), "t")
        .collect().toSeq
      val b = TextOps.compressionCensus(df.coalesce(1), Seq("g"), "t")
        .collect().toSeq
      assert(a == b, "census must not depend on partitioning")
      val nDocs = a.map(_.getAs[Long]("n_docs")).sum
      val bytes = a.map(_.getAs[Long]("total_bytes")).sum
      assert(nDocs == texts.size.toLong)
      assert(bytes == texts.map(_.getBytes("UTF-8").length.toLong).sum)
    }
  }

  test("law: olsFitQuantized over ln-ln points is partitioning-invariant " +
      "and agrees with olsFit to 5 dp") {
    import spark.implicits._
    import org.apache.spark.sql.{functions => F}
    import graft.ops.Stats
    val ptsGen: Gen[List[(Long, Long)]] = Gen.choose(3, 40).flatMap(n =>
      Gen.listOfN(n, for {
        a <- Gen.choose(1L, 5000000L); b <- Gen.choose(1L, 500000L)
      } yield (a, b)))
    forAll(ptsGen) { pts =>
      val df = pts.toDF("ct", "cy")
      def fit(d: org.apache.spark.sql.DataFrame) =
        Stats.olsFitQuantized(d, Nil,
          F.log(F.col("ct").cast("double")),
          F.log(F.col("cy").cast("double"))).collect().toSeq
      val a = fit(df.repartition(13))
      val b = fit(df.coalesce(1))
      val c = fit(df.repartition(3, F.col("cy")))
      assert(a == b && b == c,
        s"quantized OLS must not depend on partitioning: $a vs $b vs $c")
      // the quantization is a refinement, not a different estimator:
      // it agrees with the raw fit well inside the raw fit's own noise
      val raw = Stats.olsFit(df, Nil,
        F.log(F.col("ct").cast("double")),
        F.log(F.col("cy").cast("double"))).collect().toSeq
      for ((qr, rr) <- a.zip(raw); i <- 1 to 3) {
        val qv = Option(qr.get(i)).map(_.asInstanceOf[Double])
        val rv = Option(rr.get(i)).map(_.asInstanceOf[Double])
        (qv, rv) match {
          case (Some(q), Some(r)) =>
            assert(math.abs(q - r) < 1e-4,
              s"col $i: quantized $q vs raw $r")
          case _ => assert(qv.isEmpty == rv.isEmpty)
        }
      }
    }
  }

  test("law: neighborhoodFunction is idempotent under edge duplication " +
      "and monotone in h on random digraphs") {
    import spark.implicits._
    import org.apache.spark.sql.{functions => F}
    import graft.ops.Graph
    val edgeGen: Gen[List[(Long, Long)]] = Gen.choose(1, 18).flatMap(n =>
      Gen.listOfN(n, for {
        a <- Gen.choose(1L, 10L); b <- Gen.choose(1L, 10L) if a != b
      } yield (a, b)))
    samples(edgeGen, 4).foreach { es =>
      val e = es.toDF("src", "dst")
      val once = Graph.neighborhoodFunction(e, "src", "dst", hops = 2,
        p = 4).collect().toSeq
      val twice = Graph.neighborhoodFunction(e.unionAll(e), "src", "dst",
        hops = 2, p = 4).collect().toSeq
      assert(once == twice, "max-merge must be idempotent under edge dup")
      val nf = once.map(_.getAs[Long]("nf_milli"))
      assert(nf == nf.sorted, s"nf must be monotone in h: $nf")
      assert(once.last.getAs[Double]("frac_of_max") == 1.0)
    }
  }
}
