package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Deterministic sampling for training-data pipelines — extension surface
  * beyond the reference. `df.sample()` is seed-dependent PER PARTITIONING:
  * the same row can be kept in one run and dropped in the next when the
  * input splits differently, which breaks reproducibility guarantees and
  * incremental re-runs. Content-hash sampling decides from the ROW alone:
  * stable under repartitioning, re-runs, and engine versions, and any other
  * system (the DuckDB oracle included) selects the identical rows.
  */
object Sampling {

  /** Keep rows whose md5(key)-prefix falls in the first `rate` fraction of
    * the 16-bit hex space (granularity 1/65536 ≈ 0.0015%; md5 rather than
    * xxhash64 so external engines reproduce the exact subset). A pure
    * codegen'd filter: no shuffle, no state, pushes down past column
    * pruning like any predicate.
    *
    * @param key  deciding column — the content key (e.g. the text), NOT a
    *             monotonically-assigned id, so the choice survives re-keying
    * @param salt vary to draw an independent sample at the same rate
    *             (e.g. train/holdout splits: disjoint salts, disjoint logic)
    */
  def hashSample(df: DataFrame, key: Column, rate: Double, salt: String = ""): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    val thr = math.round(rate * 65536.0).toInt
    if (thr >= 65536) df
    else df.filter(
      F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 4) < F.lit(f"$thr%04x"))
  }
}
