package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.io.File

/** `--from` equivalent: reads csv/json/parquet sources and registers them
  * under normalized table names. Name rules mirror the reference
  * (/root/reference/src/main.rs:287-323): `alias=path` split, extension
  * check, filename-minus-extension, spaces→underscores (main.rs:310),
  * schema-qualified DB tables keep the last dotted part (main.rs:313-317).
  */
object Registrar {

  // main.rs:25 lists csv/json/parquet/avro; orc is beyond-reference (the
  // Spark-native columnar sibling — reader/writer ship with the distro)
  val SupportedFileTypes = Set("csv", "json", "parquet", "avro", "orc")

  final case class SourceError(msg: String) extends RuntimeException(msg)

  /** `alias=path` or bare path → (tableName, path). */
  def standardiseSource(spec: String): (String, String) = {
    val (alias, path) = spec.split("=", 2) match {
      case Array(a, p) => (Some(a), p)
      case Array(p)    => (None, p)
    }
    val ext = extensionOf(path)
    val name = alias.getOrElse {
      if (ext.exists(SupportedFileTypes)) {
        val base = new File(path).getName
        base.substring(0, base.lastIndexOf('.')).replace(' ', '_') // main.rs:301-311
      } else if (path.contains(".")) path.split('.').last // main.rs:313-317
      else path
    }
    (name, path)
  }

  private def extensionOf(path: String): Option[String] = {
    val base = new File(path).getName
    val i = base.lastIndexOf('.')
    if (i < 0) None else Some(base.substring(i + 1).toLowerCase)
  }

  /** Read one source by extension — the register_csv/json/parquet dispatch
    * (/root/reference/src/backends/datafusion.rs:37-50), Spark-first. */
  def read(spark: SparkSession, path: String): DataFrame = extensionOf(path) match {
    case Some("csv") =>
      spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    case Some("json") => spark.read.json(path) // Spark's reader is NDJSON-native
    case Some("parquet") => spark.read.parquet(path)
    case Some("orc") => spark.read.orc(path) // beyond-reference, Spark-native
    case Some("avro") =>
      // Beyond-reference: pq DECLARES avro and never implements it (its
      // DataFusion branch is `unimplemented!` — /root/reference/src/main.rs:25,
      // datafusion.rs:47-49). The spark-avro datasource jar isn't bundled
      // with this distribution, but the avro container libraries are, so
      // the scan is implemented here: the [[AvroDataSource]] V2 connector
      // (column pruning pushed into the avro reader schema + sync-marker
      // byte-range splits); [[AvroScan.read]] is the hadoop-RDD fallback.
      spark.read.format(classOf[AvroDataSource].getName).load(path)
    case other => throw SourceError(s"unsupported source type: ${other.getOrElse("(none)")} ($path)")
  }

  /** Register a list of `--from` specs; returns name→DataFrame and creates
    * temp views (needed for s-string relation splices via spark.sql). */
  def registerAll(spark: SparkSession, specs: Seq[String]): Map[String, DataFrame] =
    specs.map { spec =>
      val (name, path) = standardiseSource(spec)
      val df = read(spark, path)
      df.createOrReplaceTempView(name)
      name -> df
    }.toMap

  /** All parquet tables in a testdata dir (TESTDATA.md layout). Memoized
    * per (session, dir): the dirs are immutable test fixtures, and without
    * the cache every compiled query re-lists the dir and re-reads parquet
    * footers — measurable overhead when a suite runs dozens of queries. */
  def loadParquetDir(spark: SparkSession, dir: String): Map[String, DataFrame] =
    dirCache.computeIfAbsent((spark, dir), { case (s, d) =>
      val files = Option(new File(d).listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.endsWith(".parquet"))
      files.map { f =>
        val name = f.getName.stripSuffix(".parquet")
        val df = s.read.parquet(f.getAbsolutePath)
        df.createOrReplaceTempView(name)
        name -> df
      }.toMap
    })

  private val dirCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Map[String, DataFrame]]()
}
