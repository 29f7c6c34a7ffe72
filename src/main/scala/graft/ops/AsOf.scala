package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/** As-of (temporal point-in-time) join — for every left row, the single
  * most recent right row at or before the left row's timestamp within the
  * same key. The standard enrichment join of event pipelines (attach the
  * last config change / model version / quote to each observation); the
  * reference has no such operator and Spark has no built-in (extension
  * surface, like Dedup/Similarity).
  *
  * Spark-first shape — the naive lowering is a non-equi join
  * (`l.key = r.key AND l.ts >= r.ts` + rank-1 filter), which Spark plans as
  * a broadcast-nested-loop producing every (left × earlier-right) candidate
  * pair before discarding all but one: quadratic per key, unusable at
  * scale. Instead both sides are UNIONED and processed in ONE window pass:
  *
  *   - tag rows `__side` 0 (right) / 1 (left), align timestamps in `__ts`;
  *   - window over the key ordered by (`__ts`, `__side`, right payload):
  *     `last(payload, ignoreNulls)` carries the most recent right payload
  *     forward — right-before-left at equal timestamps makes the match
  *     inclusive (ts >= rts);
  *   - keep left rows; `how = "inner"` drops rows with no match.
  *
  * Cost: ONE shuffle + sort per side on the key — the merge-join plan an
  * ASOF-native engine (e.g. DuckDB's ASOF JOIN, the oracle) runs, with no
  * candidate-pair blow-up. At 100 TB this is the minimal movement for the
  * semantics (both sides must co-locate by key).
  *
  * Ties: several right rows on the same (key, ts) are resolved
  * deterministically — the greatest payload struct wins (they sort before
  * `last()` picks the final one). Payload columns must therefore be
  * orderable (no map columns); Spark rejects unorderable sorts loudly.
  *
  * @param left      probe side; every column is preserved
  * @param right     build side: keyCols ++ rightTs ++ payload
  * @param keyCols   equi-join key columns (same names both sides)
  * @param leftTs    left ordering column (any orderable type; both ts
  *                  columns must share comparison semantics — e.g. both
  *                  ns-longs or both µs-longs, see EventOps.tsCol)
  * @param rightTs   right ordering column
  * @param rightPrefix prefix for right-side output columns (ts + payload) —
  *                  avoids collisions with left names
  * @param how       "left" (default: unmatched left rows keep NULL right
  *                  columns) or "inner"
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTs: String, rightTs: String, rightPrefix: String = "r_",
               how: String = "left"): DataFrame = {
    require(how == "left" || how == "inner", s"how must be left|inner, got $how")
    require(keyCols.nonEmpty, "asofJoin needs at least one key column")
    val payloadCols = right.columns.filterNot(c => keyCols.contains(c) || c == rightTs)
    val rpFields = (rightTs +: payloadCols.toSeq)
    // one struct column carries the whole right payload through the window
    val rSide = right.select(
      keyCols.map(F.col) :+
        F.col(rightTs).as("__ts") :+
        F.lit(0).as("__side") :+
        F.struct(rpFields.map(F.col): _*).as("__rp"): _*)
    // the left side needs a NULL of the same struct type for the union
    val rpType = rSide.schema("__rp").dataType
    val lSide = left.select(
      keyCols.map(F.col) :+
        F.col(leftTs).as("__ts") :+
        F.lit(1).as("__side") :+
        F.lit(null).cast(rpType).as("__rp") :+
        F.struct(left.columns.map(F.col): _*).as("__lrow"): _*)
    val unioned = rSide.withColumn("__lrow",
        F.lit(null).cast(lSide.schema("__lrow").dataType))
      .unionByName(lSide)
    val w = Window.partitionBy(keyCols.map(F.col): _*)
      .orderBy(F.col("__ts").asc, F.col("__side").asc, F.col("__rp").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__match", F.last(F.col("__rp"), ignoreNulls = true).over(w))
      .filter(F.col("__side") === 1)
    val filtered = if (how == "inner") carried.filter(F.col("__match").isNotNull)
                   else carried
    val leftOut = left.columns.map(c => F.col("__lrow").getField(c).as(c))
    val rightOut = rpFields.map(c =>
      F.col("__match").getField(c).as(rightPrefix + c))
    filtered.select(leftOut ++ rightOut: _*)
  }
}
