package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Grouped statistical model fits over relational data. The operators here
  * follow the repo's sufficient-statistics rule: the corpus is touched in
  * ONE partial-aggregated pass that reduces to a few machine numbers per
  * group, and the model math runs on that tiny rollup — the same shape at
  * 60k rows and at 100 TB (only group-count rows cross the final shuffle).
  */
object Stats {

  /** Per-group simple OLS fit y = intercept + slope·x via the closed-form
    * sufficient statistics (n, Σx, Σy, Σxx, Σxy, Σyy):
    * {{{
    *   slope     = (nΣxy − ΣxΣy) / (nΣxx − Σx²)
    *   intercept = (ΣyΣxx − ΣxΣxy) / (nΣxx − Σx²)
    *   r²        = (nΣxy − ΣxΣy)² / ((nΣxx − Σx²)(nΣyy − Σy²))
    * }}}
    * The five sums partial-aggregate map-side (one scan, one shuffle of
    * 6 numbers per group); the ratios are computed from the SAME explicit
    * expression tree an oracle engine can replay, rather than engine
    * `regr_*` builtins whose internal accumulation (Welford vs naive)
    * differs across engines. Degenerate groups (zero x-variance) yield
    * NULL fit columns via nullif, not NaN/∞.
    *
    * The two-pass-free formula carries the usual cancellation caveat:
    * nΣxx − Σx² loses ~half the mantissa when x's spread is tiny relative
    * to its magnitude — center x upstream if fitting such data. Results
    * round to 6 dp.
    *
    * @return (groupCols…, n, slope, intercept, r2)
    */
  def olsFit(df: DataFrame, groupCols: Seq[String], x: Column,
             y: Column): DataFrame = {
    val agg = df
      .select(groupCols.map(F.col) :+ x.cast("double").as("__x") :+
        y.cast("double").as("__y"): _*)
      .groupBy(groupCols.map(F.col): _*)
      .agg(
        F.count(F.lit(1)).cast("double").as("__n"),
        F.sum("__x").as("__sx"), F.sum("__y").as("__sy"),
        F.sum(F.col("__x") * F.col("__x")).as("__sxx"),
        F.sum(F.col("__x") * F.col("__y")).as("__sxy"),
        F.sum(F.col("__y") * F.col("__y")).as("__syy"))
    val dx = F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    val dy = F.col("__n") * F.col("__syy") - F.col("__sy") * F.col("__sy")
    val cov = F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    agg.select(groupCols.map(F.col) :+
      F.col("__n").cast("long").as("n") :+
      F.round(cov / F.nullif(dx, F.lit(0.0)), 6).as("slope") :+
      F.round((F.col("__sy") * F.col("__sxx") - F.col("__sx") * F.col("__sxy")) /
        F.nullif(dx, F.lit(0.0)), 6).as("intercept") :+
      F.round(cov * cov / F.nullif(dx * dy, F.lit(0.0)), 6).as("r2"): _*)
  }
}
