package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst expressions for the vector math in graft.ops.Similarity —
  * same tier-(b) rationale as [[MinHashSig]]: Spark's higher-order functions
  * (`zip_with`/`aggregate`) do NOT participate in whole-stage codegen; they
  * evaluate a boxed lambda per ELEMENT per row, and on an LSH candidate join
  * producing tens of millions of 64-dim pairs that interpreted path is the
  * dominant query cost (measured 3-10× on the x05 scale-stress). Each
  * expression here is one static tight-loop call that composes with codegen.
  *
  * Semantics (pinned vs the old HOF forms in OpsSpec):
  *  - element type may be float or double per side; elements are promoted to
  *    double BEFORE multiplying (matches the `::DOUBLE` oracle arithmetic).
  *  - length mismatch, null elements, NaN elements, and zero norms all yield
  *    NULL (the old `when(denom > 0, ...)` guard folded in — NULL, never
  *    NaN: Spark orders NaN above every double, so a NaN similarity would
  *    rank garbage vectors as everyone's top neighbor).
  */
object VecOps {

  /** NaN result encodes "NULL" at the expression layer. */
  def cosine(a: ArrayData, af: Boolean, b: ArrayData, bf: Boolean): Double = {
    val n = a.numElements()
    if (b.numElements() != n) return Double.NaN
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return Double.NaN
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom > 0.0) dot / denom else Double.NaN
  }

  def dot(a: ArrayData, af: Boolean, b: ArrayData, bf: Boolean): Double = {
    val n = a.numElements()
    if (b.numElements() != n) return Double.NaN
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return Double.NaN
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  /** Squared L2 distance Σ(x−y)² — the element-order LEFT FOLD of
    * (x−y)·(x−y) terms, bit-identical to the `zip_with`/`aggregate` HOF
    * form it replaces (and to DuckDB's `list_sum(list_transform(...))`
    * oracle arithmetic): same term values, same accumulation order, so
    * any 9-dp rounding downstream flips identically on both engines. */
  def l2distSq(a: ArrayData, af: Boolean, b: ArrayData, bf: Boolean): Double = {
    val n = a.numElements()
    if (b.numElements() != n) return Double.NaN
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return Double.NaN
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      s += d * d
      i += 1
    }
    s
  }

  def l2norm(a: ArrayData, af: Boolean): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return Double.NaN
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      s += x * x
      i += 1
    }
    math.sqrt(s)
  }

  /** Sign-LSH bits over `nPlanes` hyperplanes flattened row-major into
    * `planes` (length nPlanes·dim): bit i = (v · plane_i) > 0. One pass per
    * plane, no intermediate arrays. Dimension mismatch throws — a wrong-dim
    * vector would otherwise silently land every row in bucket 0 and turn
    * the bucket self-join quadratic. */
  def lshBits(a: ArrayData, af: Boolean, planes: Array[Double], nPlanes: Int, dim: Int): Long = {
    val n = a.numElements()
    if (n != dim)
      throw new IllegalArgumentException(s"embedding dimension must be $dim, got $n")
    var bits = 0L
    var p = 0
    while (p < nPlanes) {
      var s = 0.0
      val off = p * dim
      var i = 0
      while (i < dim) {
        val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
        s += x * planes(off + i)
        i += 1
      }
      if (s > 0.0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  /** Nearest-centroid index by squared euclidean distance — one tight loop
    * over a flattened centroid matrix (the [[lshBits]] shape). Per centroid
    * the distance is the element-order sequential sum Σ(x−c)², and strict
    * `<` keeps the FIRST minimum, so ties resolve to the lower cell id —
    * the exact argmin any engine replays with `ORDER BY dist, cell`.
    * Same input contract as [[lshBits]]: loud on dimension mismatch. */
  def nearestCell(a: ArrayData, af: Boolean, cents: Array[Double],
                  nCents: Int, dim: Int): Int = {
    val n = a.numElements()
    if (n != dim)
      throw new IllegalArgumentException(s"embedding dimension must be $dim, got $n")
    var best = 0.0
    var bestI = 0
    var c = 0
    while (c < nCents) {
      var s = 0.0
      val off = c * dim
      var i = 0
      while (i < dim) {
        val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
        val d = x - cents(off + i)
        s += d * d
        i += 1
      }
      if (c == 0 || s < best) { best = s; bestI = c }
      c += 1
    }
    bestI
  }

  /** Product-quantization encode: per subspace s (of `m`, each `dsub` wide),
    * the index of the nearest of `k` codewords — [[nearestCell]]'s argmin
    * (sequential Σ(x−c)², strict `<` keeps first ⇒ ties to lower code)
    * run per subvector against a flattened [m][k][dsub] codebook. */
  def pqEncode(a: ArrayData, af: Boolean, cb: Array[Double],
               m: Int, k: Int, dsub: Int): Array[Int] = {
    val n = a.numElements()
    if (n != m * dsub)
      throw new IllegalArgumentException(s"embedding dimension must be ${m * dsub}, got $n")
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0.0
      var bestJ = 0
      var j = 0
      while (j < k) {
        var d2 = 0.0
        val off = (s * k + j) * dsub
        var i = 0
        while (i < dsub) {
          val x = if (af) a.getFloat(s * dsub + i).toDouble
                  else a.getDouble(s * dsub + i)
          val d = x - cb(off + i)
          d2 += d * d
          i += 1
        }
        if (j == 0 || d2 < best) { best = d2; bestJ = j }
        j += 1
      }
      out(s) = bestJ
      s += 1
    }
    out
  }

  /** ADC distance: Σ_s lut[s·kk + codes[s]], s-ascending — the exact
    * addition order of the HOF/oracle formulation. Loud on a LUT sized
    * for a different (m, kk) AND on a per-subspace code ≥ kk — total-length
    * checks alone would let codes encoded at a larger k than the search
    * codebooks read the NEXT subspace's LUT entries and rank garbage. */
  def adcDist(codes: ArrayData, lut: ArrayData, kk: Int): Double = {
    val m = codes.numElements()
    if (lut.numElements() != m * kk)
      throw new IllegalArgumentException(
        s"ADC lut must have ${m * kk} entries, got ${lut.numElements()}")
    var d = 0.0
    var s = 0
    while (s < m) {
      val c = codes.getInt(s)
      if (c < 0 || c >= kk)
        throw new IllegalArgumentException(
          s"PQ code $c at subspace $s out of range for k=$kk codewords " +
            "(codes were encoded against a different codebook)")
      d += lut.getDouble(s * kk + c)
      s += 1
    }
    d
  }

  /** Int8 symmetric max-abs quantization in ONE pass:
    * `scale = max|x|/127`, `q[i] = floor(x/max|x|·127 + 0.5)` (int cast of
    * the floored double — identical op order to the HOF/oracle form),
    * `max_err = max|x − q·scale|`. Zero vector → (0.0, zeros, 0.0); empty
    * array → (null scale, [], 0.0) — both the HOF edge results. The HOF
    * pipeline evaluated FOUR interpreted lambda passes (plus CollapseProject
    * re-deriving v/m/q inside every consumer — ~8 array walks per row,
    * boxed); this is one tight loop that composes with whole-stage codegen.
    * NaN/null elements → null (the [[cosine]] convention — the HOF form
    * silently skipped them in the max, which would mis-scale the codes). */
  def quantizeInt8(a: ArrayData, af: Boolean): org.apache.spark.sql.catalyst.InternalRow = {
    val n = a.numElements()
    val q = new Array[Int](n)
    if (n == 0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](null, new GenericArrayData(q), 0.0))
    val v = new Array[Double](n)
    var m = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      if (java.lang.Double.isNaN(x)) return null
      v(i) = x
      val ax = math.abs(x)
      if (ax > m) m = ax
      i += 1
    }
    if (m == 0.0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0.0, new GenericArrayData(q), 0.0))
    val scale = m / 127.0
    var maxErr = 0.0
    i = 0
    while (i < n) {
      val code = Math.floor(v(i) / m * 127.0 + 0.5).toInt
      q(i) = code
      val err = Math.abs(v(i) - code.toDouble * scale)
      if (err > maxErr) maxErr = err
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, new GenericArrayData(q), maxErr))
  }

  /** SQ8 per-dimension scalar-quantization codes (FAISS
    * ScalarQuantizer/QT_8bit convention): per dim j with corpus range
    * [mn_j, mx_j], `c_j = clamp(floor((x_j − mn_j)/(mx_j − mn_j)·255 + 0.5),
    * 0, 255)` — floor(+0.5) is the [[quantizeInt8]] rounding, the clamp
    * covers out-of-train-range query vectors, and a degenerate dim
    * (mx == mn) encodes 0. Every step is a replayable IEEE op sequence:
    * sub, div, mul by 255.0, add 0.5, floor. Loud on dimension mismatch
    * (the [[lshBits]] contract). */
  def sq8Codes(a: ArrayData, af: Boolean, mn: Array[Double], mx: Array[Double]): Array[Int] = {
    val dim = mn.length
    val n = a.numElements()
    if (n != dim)
      throw new IllegalArgumentException(s"vector dimension must be $dim, got $n")
    val out = new Array[Int](dim)
    var j = 0
    while (j < dim) {
      val x = if (af) a.getFloat(j).toDouble else a.getDouble(j)
      val s = mx(j) - mn(j)
      out(j) =
        if (s > 0.0) {
          val c = Math.floor((x - mn(j)) / s * 255.0 + 0.5)
          if (c < 0.0) 0 else if (c > 255.0) 255 else c.toInt
        } else 0
      j += 1
    }
    out
  }

  /** SQ8 encode-then-decode in one pass: `dq_j = mn_j + c_j·(mx_j −
    * mn_j)/255` with c from [[sq8Codes]] — the reconstruction an SQ8 index
    * scores against (asymmetric: stored side quantized, query side exact).
    * Fused so the search path never materializes the int codes. */
  def sq8Dequant(a: ArrayData, af: Boolean, mn: Array[Double], mx: Array[Double]): Array[Double] = {
    val dim = mn.length
    val n = a.numElements()
    if (n != dim)
      throw new IllegalArgumentException(s"vector dimension must be $dim, got $n")
    val out = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      val x = if (af) a.getFloat(j).toDouble else a.getDouble(j)
      val s = mx(j) - mn(j)
      out(j) =
        if (s > 0.0) {
          val c0 = Math.floor((x - mn(j)) / s * 255.0 + 0.5)
          val c = if (c0 < 0.0) 0.0 else if (c0 > 255.0) 255.0 else c0
          mn(j) + c * s / 255.0
        } else mn(j)
      j += 1
    }
    out
  }

  /** Dense mat–vec `out[i] = Σ_j m[i·cols + j]·x[j]`, j-ascending per row —
    * the OPQ rotation step. Loud on dimension mismatch (the [[lshBits]]
    * contract: a wrong-dim vector must not silently produce garbage). */
  def matVec(a: ArrayData, af: Boolean, m: Array[Double],
             rows: Int, cols: Int): Array[Double] = {
    val n = a.numElements()
    if (n != cols)
      throw new IllegalArgumentException(s"vector dimension must be $cols, got $n")
    val out = new Array[Double](rows)
    var i = 0
    while (i < rows) {
      var s = 0.0
      val off = i * cols
      var j = 0
      while (j < cols) {
        val x = if (af) a.getFloat(j).toDouble else a.getDouble(j)
        s += m(off + j) * x
        j += 1
      }
      out(i) = s
      i += 1
    }
    out
  }
}

/** Fraction of positionwise-equal elements of two long arrays (MinHash
  * signature agreement → estimated Jaccard). Tight loop; null on length
  * mismatch or null elements. */
object SigOps {
  def eqFrac(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n == 0 || b.numElements() != n) return Double.NaN
    var eq = 0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return Double.NaN
      if (a.getLong(i) == b.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }
}

/** See [[SigOps.eqFrac]]. */
case class SigEqFrac(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<long> arguments, got $other")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sig_eq_frac"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val v = SigOps.eqFrac(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (v.isNaN) null else v
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val v = ctx.freshName("frac")
      s"""double $v = graft.functions.SigOps.eqFrac($a, $b);
         |if (Double.isNaN($v)) { ${ev.isNull} = true; } else { ${ev.value} = $v; }
         |""".stripMargin
    })

  protected override def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SigEqFrac =
    copy(left = newLeft, right = newRight)
}

private[functions] trait VecArrayArg { self: Expression =>
  protected def isFloatArray(dt: DataType): Boolean =
    dt.asInstanceOf[ArrayType].elementType == FloatType
  protected def checkVec(dt: DataType, side: String): TypeCheckResult = dt match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${self.prettyName} requires an array<float|double> $side argument, got $other")
  }
}

/** Cosine similarity — see [[VecOps]] for semantics. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with VecArrayArg {

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkVec(left.dataType, "left")
    if (l != TypeCheckResult.TypeCheckSuccess) l else checkVec(right.dataType, "right")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  private def lf = isFloatArray(left.dataType)
  private def rf = isFloatArray(right.dataType)

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val v = VecOps.cosine(a.asInstanceOf[ArrayData], lf, b.asInstanceOf[ArrayData], rf)
    if (v.isNaN) null else v
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val v = ctx.freshName("cos")
      s"""double $v = graft.functions.VecOps.cosine($a, $lf, $b, $rf);
         |if (Double.isNaN($v)) { ${ev.isNull} = true; } else { ${ev.value} = $v; }
         |""".stripMargin
    })

  protected override def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Dot product — see [[VecOps]] for semantics. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with VecArrayArg {

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkVec(left.dataType, "left")
    if (l != TypeCheckResult.TypeCheckSuccess) l else checkVec(right.dataType, "right")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def lf = isFloatArray(left.dataType)
  private def rf = isFloatArray(right.dataType)

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val v = VecOps.dot(a.asInstanceOf[ArrayData], lf, b.asInstanceOf[ArrayData], rf)
    if (v.isNaN) null else v
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val v = ctx.freshName("dot")
      s"""double $v = graft.functions.VecOps.dot($a, $lf, $b, $rf);
         |if (Double.isNaN($v)) { ${ev.isNull} = true; } else { ${ev.value} = $v; }
         |""".stripMargin
    })

  protected override def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance — see [[VecOps.l2distSq]] for semantics. The
  * nearest-neighbor kernel of [[graft.ops.Similarity.hopkinsStatistic]]:
  * its m×n broadcast scan evaluated ~800k interpreted HOF lambdas per
  * driver-bench run before this expression existed (VERDICT r13 #1 —
  * 144 s task CPU vs ~8 s with the codegen'd loop). */
case class L2DistSq(left: Expression, right: Expression)
    extends BinaryExpression with VecArrayArg {

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkVec(left.dataType, "left")
    if (l != TypeCheckResult.TypeCheckSuccess) l else checkVec(right.dataType, "right")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_l2dist_sq"

  private def lf = isFloatArray(left.dataType)
  private def rf = isFloatArray(right.dataType)

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val v = VecOps.l2distSq(a.asInstanceOf[ArrayData], lf, b.asInstanceOf[ArrayData], rf)
    if (v.isNaN) null else v
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val v = ctx.freshName("d2")
      s"""double $v = graft.functions.VecOps.l2distSq($a, $lf, $b, $rf);
         |if (Double.isNaN($v)) { ${ev.isNull} = true; } else { ${ev.value} = $v; }
         |""".stripMargin
    })

  protected override def withNewChildrenInternal(newLeft: Expression, newRight: Expression): L2DistSq =
    copy(left = newLeft, right = newRight)
}

/** L2 norm — see [[VecOps]] for semantics. */
case class L2Norm(child: Expression) extends UnaryExpression with VecArrayArg {

  override def checkInputDataTypes(): TypeCheckResult = checkVec(child.dataType, "")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_l2norm"

  private def cf = isFloatArray(child.dataType)

  protected override def nullSafeEval(a: Any): Any = {
    val v = VecOps.l2norm(a.asInstanceOf[ArrayData], cf)
    if (v.isNaN) null else v
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val v = ctx.freshName("nrm")
      s"""double $v = graft.functions.VecOps.l2norm($a, $cf);
         |if (Double.isNaN($v)) { ${ev.isNull} = true; } else { ${ev.value} = $v; }
         |""".stripMargin
    })

  protected override def withNewChildInternal(newChild: Expression): L2Norm =
    copy(child = newChild)
}

/** All sign-LSH bucket bits for one hash table in a single expression —
  * replaces nPlanes separate HOF dot products per row. Planes are a plan
  * reference object (shipped once per task with the serialized plan, not
  * re-parsed as literals). */
case class LshBits(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression with VecArrayArg {

  override def checkInputDataTypes(): TypeCheckResult = checkVec(child.dataType, "")
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bits"

  private def cf = isFloatArray(child.dataType)
  private val nPlanes = planes.length
  private val dim = if (planes.isEmpty) 0 else planes(0).length
  require(planes.forall(_.length == dim),
    s"ragged LSH plane matrix: every plane must have length $dim")
  @transient private lazy val flat: Array[Double] = planes.flatten

  protected override def nullSafeEval(a: Any): Any =
    VecOps.lshBits(a.asInstanceOf[ArrayData], cf, flat, nPlanes, dim)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshPlanes", flat, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VecOps.lshBits($a, $cf, $ref, $nPlanes, $dim)")
  }

  protected override def withNewChildInternal(newChild: Expression): LshBits =
    copy(child = newChild)
}

/** Nearest-centroid cell id for a vector column against a literal centroid
  * matrix — the coarse-quantizer assignment of SemDeDup/IVF as ONE
  * codegen'd tight loop. The HOF formulation (zip_with squared diffs +
  * aggregate fold, per centroid) evaluates an interpreted lambda per
  * ELEMENT per centroid: at N·nlist·dim ops the assignment went
  * super-linear in the 10× stress once nlist scaled with the corpus
  * (2.9 s → 22 s); this expression restores linear-in-N wall-clock.
  * Distance math and tie rule are identical ([[VecOps.nearestCell]]). */
case class NearestCell(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with VecArrayArg {

  override def checkInputDataTypes(): TypeCheckResult = checkVec(child.dataType, "")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_cell"

  private def cf = isFloatArray(child.dataType)
  private val nCents = centroids.length
  private val dim = if (centroids.isEmpty) 0 else centroids(0).length
  require(centroids.forall(_.length == dim),
    s"ragged centroid matrix: every centroid must have length $dim " +
      "(dims are taken from the first row; a ragged matrix would misalign " +
      "the flat buffer and score silently wrong distances)")
  @transient private lazy val flat: Array[Double] = centroids.flatten

  protected override def nullSafeEval(a: Any): Any =
    VecOps.nearestCell(a.asInstanceOf[ArrayData], cf, flat, nCents, dim)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cellCentroids", flat, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VecOps.nearestCell($a, $cf, $ref, $nCents, $dim)")
  }

  protected override def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

/** Product-quantization codes (Jégou et al. 2011) for a vector column
  * against a literal [m][k][dsub] codebook — all m subspace argmins in one
  * codegen'd loop ([[VecOps.pqEncode]]; the [[NearestCell]] rationale:
  * an HOF formulation pays an interpreted lambda per element per codeword).
  * Output: array<int> of m codes, 4× to 32× smaller at rest than the
  * float vector depending on (m, k) — the storage half of an ADC ANN
  * pipeline. */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with VecArrayArg {

  override def checkInputDataTypes(): TypeCheckResult = checkVec(child.dataType, "")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  private def cf = isFloatArray(child.dataType)
  private val m = codebooks.length
  private val k = if (codebooks.isEmpty) 0 else codebooks(0).length
  private val dsub = if (k == 0 || codebooks(0).isEmpty) 0 else codebooks(0)(0).length
  require(codebooks.forall(cb => cb.length == k && cb.forall(_.length == dsub)),
    s"ragged codebook: every subspace must be [$k][$dsub] " +
      "(dims are taken from the first row; a ragged codebook would misalign " +
      "the flat buffer and encode silently wrong codes)")
  @transient private lazy val flat: Array[Double] = codebooks.flatten.flatten

  protected override def nullSafeEval(a: Any): Any =
    new GenericArrayData(
      VecOps.pqEncode(a.asInstanceOf[ArrayData], cf, flat, m, k, dsub))

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", flat, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VecOps.pqEncode($a, $cf, $ref, $m, $k, $dsub))")
  }

  protected override def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** ADC distance between a codes column (array<int>) and a per-query LUT
  * column (array<double>, m·kk entries) — the per-CANDIDATE hot path of
  * PQ/IVFPQ search as one codegen'd loop instead of an interpreted
  * zip_with/aggregate lambda pair. Addition order identical to the HOF
  * form ([[VecOps.adcDist]]). */
case class AdcDist(left: Expression, right: Expression, kk: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(IntegerType, _) => right.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName lut must be array<double>, got $t")
    }
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName codes must be array<int>, got $t")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_dist"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.adcDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], kk)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecOps.adcDist($a, $b, $kk)")

  protected override def withNewChildrenInternal(newLeft: Expression, newRight: Expression): AdcDist =
    copy(left = newLeft, right = newRight)
}

/** Dense matrix–vector product `y[i] = Σ_j mat[i][j]·x[j]` against a
  * literal matrix — the rotation step of OPQ (Ge et al. 2013) as one
  * codegen'd loop (j-ascending accumulation, so a SQL
  * `list_sum(list_transform(...))` replays the exact IEEE sum). The matrix
  * ships once per task as a plan reference object (the [[LshBits]]
  * pattern), not re-parsed as 4096 literals per row. */
case class MatVec(child: Expression, mat: Array[Array[Double]])
    extends UnaryExpression with VecArrayArg {

  override def checkInputDataTypes(): TypeCheckResult = checkVec(child.dataType, "")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "mat_vec"

  private def cf = isFloatArray(child.dataType)
  private val rows = mat.length
  private val cols = if (mat.isEmpty) 0 else mat(0).length
  require(rows > 0 && mat.forall(_.length == cols),
    s"ragged matrix: every row must have length $cols " +
      "(a ragged matrix would misalign the flat buffer)")
  @transient private lazy val flat: Array[Double] = mat.flatten

  protected override def nullSafeEval(a: Any): Any =
    new GenericArrayData(
      VecOps.matVec(a.asInstanceOf[ArrayData], cf, flat, rows, cols))

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("matVecFlat", flat, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VecOps.matVec($a, $cf, $ref, $rows, $cols))")
  }

  protected override def withNewChildInternal(newChild: Expression): MatVec =
    copy(child = newChild)
}

/** Int8 max-abs quantization as one struct-returning pass — see
  * [[VecOps.quantizeInt8]] for the exact semantics and why the HOF
  * pipeline it replaces was ~8 interpreted array walks per row. */
case class QuantizeInt8(child: Expression)
    extends UnaryExpression with VecArrayArg {

  override def checkInputDataTypes(): TypeCheckResult = checkVec(child.dataType, "")
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("scale", DoubleType, nullable = true),
    org.apache.spark.sql.types.StructField("q",
      ArrayType(IntegerType, containsNull = false), nullable = false),
    org.apache.spark.sql.types.StructField("max_err", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "quantize_int8"

  private def cf = isFloatArray(child.dataType)

  protected override def nullSafeEval(a: Any): Any =
    VecOps.quantizeInt8(a.asInstanceOf[ArrayData], cf) // null on NaN/null elems

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val v = ctx.freshName("qrow")
      s"""org.apache.spark.sql.catalyst.InternalRow $v = graft.functions.VecOps.quantizeInt8($a, $cf);
         |if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v; }
         |""".stripMargin
    })

  protected override def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

/** Shared bounds plumbing for the SQ8 pair — per-dimension (min, max)
  * literals fit once on the corpus ([[graft.ops.Similarity.sqFit]]), shipped
  * per task as plan reference objects (the [[MatVec]] pattern). */
private[functions] trait Sq8Bounds extends VecArrayArg { self: UnaryExpression =>
  def mins: Array[Double]
  def maxs: Array[Double]
  require(mins.nonEmpty && mins.length == maxs.length,
    s"SQ8 bounds must be two equal non-empty arrays, got ${mins.length}/${maxs.length}")
  require(mins.indices.forall(j => mins(j) <= maxs(j)),
    "SQ8 bounds must satisfy min <= max per dimension (swapped bounds would " +
      "clamp every code to 0 and score garbage)")
  override def checkInputDataTypes(): TypeCheckResult = checkVec(child.dataType, "")
  protected def cf: Boolean = isFloatArray(child.dataType)
}

/** SQ8 codes (array<int>, one 0..255 code per dimension) for storage —
  * see [[VecOps.sq8Codes]]. At 100 TB this is the point: a 64-dim float
  * corpus stores 64 bytes/vector instead of 256/512. */
case class Sq8Encode(child: Expression, mins: Array[Double], maxs: Array[Double])
    extends UnaryExpression with Sq8Bounds {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "sq8_encode"

  protected override def nullSafeEval(a: Any): Any =
    new GenericArrayData(
      VecOps.sq8Codes(a.asInstanceOf[ArrayData], cf, mins, maxs))

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rmn = ctx.addReferenceObj("sq8Mins", mins, "double[]")
    val rmx = ctx.addReferenceObj("sq8Maxs", maxs, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VecOps.sq8Codes($a, $cf, $rmn, $rmx))")
  }

  protected override def withNewChildInternal(newChild: Expression): Sq8Encode =
    copy(child = newChild)
}

/** SQ8 encode→decode roundtrip (array<double>) — the reconstruction the
  * asymmetric search path scores with [[DotProduct]]; fused so codes never
  * materialize. See [[VecOps.sq8Dequant]]. */
case class Sq8Dequant(child: Expression, mins: Array[Double], maxs: Array[Double])
    extends UnaryExpression with Sq8Bounds {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sq8_dequant"

  protected override def nullSafeEval(a: Any): Any =
    new GenericArrayData(
      VecOps.sq8Dequant(a.asInstanceOf[ArrayData], cf, mins, maxs))

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rmn = ctx.addReferenceObj("sq8Mins", mins, "double[]")
    val rmx = ctx.addReferenceObj("sq8Maxs", maxs, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VecOps.sq8Dequant($a, $cf, $rmn, $rmx))")
  }

  protected override def withNewChildInternal(newChild: Expression): Sq8Dequant =
    copy(child = newChild)
}
