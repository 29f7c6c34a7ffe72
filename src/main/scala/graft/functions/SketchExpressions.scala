package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expressions for the document sketches — tier (b) of the
  * custom-operator preference order (compose > custom Expression > custom
  * plan > mapPartitions): a per-row tight loop replaces the relational
  * explode-shingles→64-min-aggregates plan, which at 100 TB removes ~1000×
  * row amplification through the aggregate machinery while producing
  * bit-identical signatures (OpsSpec cross-checks). doGenCode emits a static
  * call, so the expression composes with whole-stage codegen instead of
  * breaking the stage.
  */
case class MinHashSig(child: Expression, shingleSize: Int, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  protected override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextSketches.minhash(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], shingleSize, numHashes))

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TextSketches.minhash($c, $shingleSize, $numHashes))")

  protected override def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Winnowing (rolling-hash) fingerprint set as a native expression — see
  * [[MinHashSig]] docs for the shape rationale and
  * [[TextSketches.winnow]] for the algorithm. */
case class Winnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow"

  protected override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextSketches.winnow(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w))

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TextSketches.winnow($c, $k, $w))")

  protected override def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

/** Word-n-gram xxhash64 stream as a native expression — see
  * [[MinHashSig]] docs for the tier rationale and
  * [[TextSketches.wordNGramHashes]] for the algorithm and why the hash
  * choice is free (within-engine grouping key only). */
case class WordNGramHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, s"gram size must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_ngram_hashes"

  protected override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextSketches.wordNGramHashes(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n))

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TextSketches.wordNGramHashes($c, $n))")

  protected override def withNewChildInternal(newChild: Expression): WordNGramHashes =
    copy(child = newChild)
}

/** Character-shingle xxhash64 stream as a native expression — see
  * [[MinHashSig]] docs for the tier rationale and
  * [[TextSketches.shingleHashes]] for the algorithm and its bit-parity
  * contract with `xxhash64(substr(clean, i, n))`. */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, s"shingle size must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  protected override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextSketches.shingleHashes(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n))

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TextSketches.shingleHashes($c, $n))")

  protected override def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** DSIR uni+bigram bucket ids as a native expression — see [[MinHashSig]]
  * docs for the tier rationale and [[TextSketches.wordGramBuckets]] for
  * the algorithm and its bit-parity contract with
  * `pmod(xxhash64(gram), nBuckets)`. */
case class WordGramBuckets(child: Expression, nBuckets: Int)
    extends UnaryExpression {
  require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column, got ${child.dataType}")
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "word_gram_buckets"

  protected override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextSketches.wordGramBuckets(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], nBuckets))

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TextSketches.wordGramBuckets($c, $nBuckets))")

  protected override def withNewChildInternal(newChild: Expression): WordGramBuckets =
    copy(child = newChild)
}

/** MinHash signature over content-defined BYTE chunks as a native
  * expression — the binary-payload sibling of [[MinHashSig]]; see
  * [[ByteSketches.chunkMinhash]] for the gear-CDC algorithm and why a
  * relational formulation is structurally wrong for media payloads
  * (chunk-position explodes copy the binary into every generated row). */
case class ByteChunkMinHashSig(child: Expression, avgBits: Int, minLen: Int,
                               maxLen: Int, numHashes: Int)
    extends UnaryExpression {
  require(avgBits >= 4 && avgBits <= 20,
    s"avgBits must be in [4,20], got $avgBits")
  require(minLen >= 1 && minLen <= maxLen,
    s"need 1 <= minLen <= maxLen, got ($minLen, $maxLen)")
  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[org.apache.spark.sql.types.BinaryType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary column, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "byte_chunk_minhash_sig"

  protected override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ByteSketches.chunkMinhash(
      input.asInstanceOf[Array[Byte]], avgBits, minLen, maxLen, numHashes))

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.ByteSketches.chunkMinhash($c, $avgBits, $minLen, " +
        s"$maxLen, $numHashes))")

  protected override def withNewChildInternal(newChild: Expression): ByteChunkMinHashSig =
    copy(child = newChild)
}

/** 64-bit SimHash as a native expression — see [[MinHashSig]] docs. */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  protected override def nullSafeEval(input: Any): Any =
    TextSketches.simhash(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSketches.simhash($c)")

  protected override def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Jaro-Winkler similarity as a native binary expression — the
  * record-linkage string metric with DuckDB-pinned conventions
  * ([[TextSketches.jaroWinkler]]). A per-pair tight loop (O(|a|·window))
  * that stays inside whole-stage codegen via a static call; the
  * alternative — exploding character positions relationally — amplifies
  * every comparison by |a|·|b| rows, which is unusable on blocked
  * candidate pairs at corpus scale. */
case class JaroWinkler(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[StringType] &&
        right.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string columns, got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "jaro_winkler"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    TextSketches.jaroWinkler(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextSketches.jaroWinkler($a, $b)")

  protected override def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

/** Raw-DEFLATE compressed byte length as a native expression — see
  * [[MinHashSig]] docs for the tier rationale and
  * [[TextSketches.deflateLen]] for the codec pin (level 6, nowrap) and
  * the determinism contract. Evaluates in the scan task, so only the
  * per-doc (group, length) scalars ever reach an exchange. */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType}")
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "deflate_len"

  protected override def nullSafeEval(input: Any): Any =
    TextSketches.deflateLen(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSketches.deflateLen($c)")

  protected override def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}
