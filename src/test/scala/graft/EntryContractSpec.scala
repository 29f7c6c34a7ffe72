package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** The harness contract every `SparkEntry.queries` entry must honor.
  *
  * The driver compare loads each entry's parquet into pandas, sorts by
  * every column, and hashes cell values — an array/struct/map column
  * crashes that sort with `unhashable type: 'numpy.ndarray'` and silently
  * voids the entry's correctness row (x80 in round 8). Catch that HERE,
  * in `sbt test`, not two hops later in the driver's pandas.
  *
  * Construction at sf0.001 is cheap: for declarative entries `.schema`
  * only runs analysis; the handful of fit-path entries (PQ/OPQ/k-means)
  * run their bounded driver-side collects, which at sf0.001 is sub-second
  * each.
  *
  * SIGN-OF-ZERO authoring contract (r17, SURVEY §8): any entry whose
  * rounded output can be a near-zero ratio/difference (r², correlation,
  * slope, divergence, signed delta) must canonicalize `-0.0` on BOTH
  * sides — Spark via `Quant.noNegZero`, oracle via a trailing `+ 0.0`
  * after the `round(...)`. The driver's hash distinguishes the sign of
  * zero (x222 was red for two rounds on exactly this); the local gate
  * (`scripts/oracle_check.py`) is sign-aware since r17, so a violation
  * surfaces in the verify run rather than at the driver.
  */
class EntryContractSpec extends AnyFunSuite {
  private val spark = SparkTest.session
  private val dir = "/root/testdata/sf0.001"

  test("every entry output column is scalar-typed (driver-hashable)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val bad = fn(spark, dir).schema.fields.filter(f => f.dataType match {
          case _: ArrayType | _: MapType | _: StructType => true
          case _ => false
        })
        bad.map(f => s"$name(${f.name}: ${f.dataType.simpleString})")
    }
    assert(offenders.isEmpty,
      s"non-scalar entry outputs — reshape with posexplode/concat_ws as " +
        s"x80/x63/x69 do: ${offenders.mkString(", ")}")
  }

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys without a query: $orphans")
  }

  test("entries without an oracle are exactly the documented rows-only set") {
    // Every rows-only entry is an xxhash64/LSH op whose math is pinned by
    // an md5 oracle twin or an OpsSpec equivalence (VERDICT r8). A NEW
    // entry that forgets its oracleSql would silently downgrade to a
    // rows-only driver check — fail HERE instead, and either add the SQL
    // or consciously extend this list with the twin that pins it.
    val rowsOnly = Set(
      "x02_minhash_pairs", "x03_simhash_pairs", "x04_ngram_jaccard",
      "x05_embed_neardup", "x07_knn_lsh", "x15_simhash_sstring",
      "x16_winnow_pairs", "x17_knn_ivf", "x18_frame_sample",
      "x57_minhash_delta", "x71_dsir_weights_prod",
      "x430_media_neardup", // md5 twin: x431_chunk_minhash_fixed
      "x441_compress_census") // census-plumbing twin: x442_compress_census_fixed; deflate codec pinned by OpsSpec replay
    val actual = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(actual == rowsOnly,
      s"unexpected rows-only entries (missing oracleSql?): ${actual -- rowsOnly}; " +
        s"stale list entries: ${rowsOnly -- actual}")
  }

  test("every rows-only entry names its oracle twin in SURVEY §8's twin " +
      "table, and the twin is itself hash-checked") {
    // The twin convention is a CONTRACT, not prose: a rows-only entry is
    // only acceptable because a hash-green twin replays its math. Parse
    // the SURVEY §8 twin table and require (a) one row per rows-only
    // entry, (b) every named twin exists in `queries` AND has its own
    // oracleSql (so the twin really is hash-checked, not rows-only too).
    val survey = scala.io.Source.fromFile("SURVEY.md", "UTF-8")
    val lines = try survey.getLines().toVector finally survey.close()
    val tableRows = lines
      .dropWhile(!_.startsWith("### Rows-only entries"))
      .takeWhile(l => !l.startsWith("### ") ||
        l.startsWith("### Rows-only entries"))
      .filter(l => l.startsWith("| x"))
      .map { l =>
        val cells = l.split("\\|").map(_.trim).filter(_.nonEmpty)
        cells(0) -> "x[0-9]+_[a-z0-9_]+".r.findAllIn(cells(1)).toSet
      }.toMap
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val undocumented = rowsOnly -- tableRows.keySet
    assert(undocumented.isEmpty,
      s"rows-only entries missing from the SURVEY twin table: $undocumented")
    val stale = tableRows.keySet -- rowsOnly
    assert(stale.isEmpty, s"twin-table rows no longer rows-only: $stale")
    for ((entry, twins) <- tableRows; twin <- twins) {
      assert(SparkEntry.queries.contains(twin),
        s"$entry names twin $twin which is not a queries entry")
      assert(SparkEntry.oracleSql.contains(twin),
        s"$entry names twin $twin which is itself rows-only — a twin " +
          "must be hash-checked")
    }
  }
}
