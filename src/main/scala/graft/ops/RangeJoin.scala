package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Range (point-in-interval) join — every (point, interval) pair with
  * `start <= v < end`. The other join Spark has no native operator for
  * (besides [[AsOf]]): the naive lowering `p JOIN i ON v >= start AND
  * v < end` has no equi-key, so Spark plans a broadcast-nested-loop /
  * cartesian — O(|points| x |intervals|) comparisons, unusable at scale.
  *
  * Spark-first shape — BINNING, the standard interval-join decomposition
  * (DuckDB's PIECEWISE_MERGE_JOIN and Flink's interval join solve the same
  * problem engine-side; here it is expressed as a declarative plan Catalyst
  * can optimize):
  *
  *   - each point lands in exactly ONE bin: `floor(v / binWidth)`;
  *   - each interval replicates into every bin it overlaps (`sequence` +
  *     `explode` — bounded by ceil(span / binWidth) + 1 rows);
  *   - equi-join on the bin — a plain shuffle join Catalyst plans with
  *     partial pushdown, AQE skew handling, broadcast-if-small — then the
  *     exact `[start, end)` filter.
  *
  * Because a point appears in exactly one bin, a qualifying pair meets in
  * exactly one bin: NO dedup pass is needed (a dedup would be a second
  * full shuffle of the result).
  *
  * Tuning: `binWidth` trades interval replication (span / binWidth rows
  * per interval) against bin fan-in (points per bin joining all intervals
  * crossing that bin). Set it near the MEDIAN interval span; pathological
  * single-bin hotspots are ordinary equi-join skew, which AQE's skew-join
  * split already handles (GraftExtensions enables AQE everywhere).
  *
  * Empty or inverted intervals (start >= end) match nothing and are
  * dropped up front — `sequence(a, b)` would otherwise count DOWN for
  * a > b and replicate the interval into bins it never overlaps.
  */
object RangeJoin {

  def rangeJoin(points: DataFrame, valueCol: String,
                intervals: DataFrame, startCol: String, endCol: String,
                binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val v = F.col(valueCol).cast("double")
    val p = points.withColumn("__bin", F.floor(v / binWidth))
    val s = F.col(startCol).cast("double"); val e = F.col(endCol).cast("double")
    val i = intervals
      .filter(s < e)
      .withColumn("__bin",
        F.explode(F.sequence(F.floor(s / binWidth), F.floor(e / binWidth))))
    p.join(i, "__bin")
      .filter(v >= s && v < e)
      .drop("__bin")
  }
}
