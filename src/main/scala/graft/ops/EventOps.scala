package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/** Batch analytics over the `events` table (event_id, ts, user_id,
  * event_type, value, props). The parquet carries ns-precision timestamps,
  * read as long nanos (`nanosAsLong`); helpers convert explicitly.
  *
  * Scale notes: the hourly rollup is a single hash-shuffle on
  * (hour, event_type) with map-side partial aggregation; sessionization
  * shuffles once on user_id (the window partition) — both are the minimal
  * shuffle plans for their semantics.
  */
object EventOps {

  /** ns-epoch long → timestamp (µs truncation, SURVEY §1 accepted delta).
    * Integer division — `/` would round through double at 1e18 magnitudes. */
  def tsCol(nsCol: Column): Column =
    F.timestamp_micros(F.call_function("div", nsCol, F.lit(1000L)))

  /** Tumbling hourly rollup per event_type. */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withColumn("hour", F.date_format(tsCol(F.col("ts")), "yyyy-MM-dd HH"))
      .groupBy("hour", "event_type")
      .agg(F.count(F.lit(1)).as("n"), F.sum("value").as("total_value"))

  /** Gap-based sessionization: a new session starts when the user's
    * inter-event gap exceeds `gapMinutes`. Pure window composition:
    * flag = gap > threshold, session_seq = running sum of flags. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(F.col("ts").asc)
    // gap test at µs resolution (ns→µs truncation first), matching the µs-
    // native engines the oracle runs on — a raw-ns compare could place a
    // session boundary differently when timestamps carry sub-µs components
    val gapUs = gapMinutes.toLong * 60L * 1000L * 1000L
    val tsUs = F.expr("ts DIV 1000")
    val prev = F.lag(tsUs, 1).over(byUser)
    val newSession = F.when(prev.isNull || (tsUs - prev) > gapUs, 1L).otherwise(0L)
    events
      .withColumn("__new", newSession)
      .withColumn("session_seq",
        F.sum(F.col("__new")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }

  /** Per-session stats on top of [[sessionize]]. Duration is computed at µs
    * resolution (ns→µs truncation first) so it is bit-identical to engines
    * that are µs-native, e.g. the DuckDB oracle's epoch_us (SURVEY §1). */
  def sessionStats(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessionize(events, gapMinutes)
      .withColumn("__us", F.expr("ts DIV 1000")) // integer div — `/` would round through double
      .groupBy("user_id", "session_seq")
      .agg(
        F.count(F.lit(1)).as("n_events"),
        F.min("__us").as("start_us"),
        F.max("__us").as("end_us"),
        F.sum("value").as("total_value"))
      .withColumn("duration_sec",
        ((F.col("end_us") - F.col("start_us")) / 1000000L).cast("double"))
      .drop("start_us", "end_us")
}
