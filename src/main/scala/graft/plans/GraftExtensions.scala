package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{MinHashSig, SimHash64, Winnow}

/** Session extension registering the native sketch expressions as SQL
  * functions, so they are reachable from spark.sql(...) and PRQL s-strings:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   spark.sql("SELECT simhash64(text), minhash_sig(text, 5, 64) FROM docs")
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => args match {
        case Seq(text, n, k) => MinHashSig(text, intLit(n, "shingleSize"), intLit(k, "numHashes"))
        case Seq(text)       => MinHashSig(text, 5, 64)
        case _ => throw new IllegalArgumentException("minhash_sig(text[, shingleSize, numHashes])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("winnow"),
      new ExpressionInfo(classOf[Winnow].getName, "winnow"),
      (args: Seq[Expression]) => args match {
        case Seq(text, k, w) => Winnow(text, intLit(k, "k"), intLit(w, "w"))
        case Seq(text)       => Winnow(text, 10, 6) // keep in sync with Dedup.winnowPairs defaults
        case _ => throw new IllegalArgumentException("winnow(text[, k, w])")
      }))
  }
}
