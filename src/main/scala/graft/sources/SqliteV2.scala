package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 over [[SqliteFile]] — `spark.read.format("graft-sqlite")
  * .option("table", t).load(path)`.
  *
  * The reference reaches sqlite through DuckDB's sqlite_scanner
  * (/root/reference/src/backends/duckdb.rs:75-83); this is the Spark-first
  * equivalent, built directly on the public file format. Two properties
  * make it scale-shaped rather than a driver-side convenience:
  *
  *  - **Subtree splits**: the driver reads only the table's interior
  *    b-tree fan-out ([[SqliteFile.subtreeRoots]] — a handful of 1-page
  *    reads) and hands each task a disjoint set of subtrees. A multi-GB
  *    sqlite file scans as dozens of parallel walks; rows never touch the
  *    driver.
  *  - **Column pruning** ([[SupportsPushDownRequiredColumns]]): sqlite is
  *    a row format, so pruning cannot skip I/O for inline rows, but the
  *    decode loop materializes only requested columns (unneeded ones cost
  *    one varint, not a text/blob decode — [[SqliteFile.decodeRecord]]).
  *
  * Filter pushdown is deliberately absent: table b-trees are keyed on
  * rowid only, and pages carry no min/max stats, so there is nothing to
  * prune with; Catalyst's post-scan filter is already optimal.
  */
class SqliteDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-sqlite"
  override def supportsExternalMetadata(): Boolean = true

  private def meta(options: CaseInsensitiveStringMap): SqliteFile.TableMeta = {
    val path = SqliteV2.pathOf(options)
    val table = Option(options.get("table")).getOrElse(
      throw SqliteFile.FormatError(
        "option 'table' is required (one sqlite db holds many tables); " +
          "use Connectors.registerSqlite to attach all of them"))
    val f = new SqliteFile(path, SqliteV2.sessionConf())
    try { f.checkSidecars(); f.table(table).requireSupported() }
    finally f.close()
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    meta(options).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new SqliteDsTable(properties.get("path"), properties.get("table"), schema)
}

final class SqliteDsTable(path: String, table: String, override val schema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-sqlite:$path#$table"
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SqliteScanBuilder(path, table, schema, options)
}

final class SqliteScanBuilder(path: String, table: String, fullSchema: StructType,
                              options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  import org.apache.spark.sql.sources._

  private var required: StructType = fullSchema
  private var lo: Long = Long.MinValue
  private var hi: Long = Long.MaxValue
  private var accepted: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // top-level scalar columns only (sqlite has no nested types), so the
    // requested schema can be used as-is
    required = requiredSchema
  }

  /** Rowid-range pushdown: comparisons on the table's `INTEGER PRIMARY
    * KEY` rowid-alias column tighten a [lo, hi] window that the scan uses
    * to descend only intersecting b-tree subtrees (the b-tree IS a rowid
    * index — fileformat2 §1.7), skipping whole pages. Every filter is
    * still returned for post-scan evaluation, so the pruning is purely an
    * I/O optimization and can never change results. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val aliasCol: Option[String] = {
      val f = new SqliteFile(path, SqliteV2.sessionConf())
      try f.table(table).columns.find(_.rowidAlias).map(_.name)
      finally f.close()
    }
    aliasCol.foreach { col =>
      def num(v: Any): Option[Long] = v match {
        case l: Long => Some(l)
        case i: Int => Some(i.toLong)
        case s: Short => Some(s.toLong)
        case b: Byte => Some(b.toLong)
        case _ => None
      }
      def absorb(f: Filter): Boolean = f match {
        case EqualTo(c, v) if c == col => num(v).exists { n =>
          lo = math.max(lo, n); hi = math.min(hi, n); true }
        case GreaterThan(c, v) if c == col && num(v).exists(_ < Long.MaxValue) =>
          num(v).exists { n => lo = math.max(lo, n + 1); true }
        case GreaterThanOrEqual(c, v) if c == col => num(v).exists { n =>
          lo = math.max(lo, n); true }
        case LessThan(c, v) if c == col && num(v).exists(_ > Long.MinValue) =>
          num(v).exists { n => hi = math.min(hi, n - 1); true }
        case LessThanOrEqual(c, v) if c == col => num(v).exists { n =>
          hi = math.min(hi, n); true }
        case In(c, vs) if c == col && vs.nonEmpty && vs.forall(num(_).isDefined) =>
          val ns = vs.flatMap(num)
          lo = math.max(lo, ns.min); hi = math.min(hi, ns.max); true
        case And(l, r) => absorb(l) | absorb(r)
        case _ => false
      }
      accepted = filters.filter(absorb)
    }
    filters // Spark re-applies everything; pruning is I/O-only
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan = {
    val target = Option(options.get("maxPartitions")).map(_.toInt).getOrElse(32)
    new SqliteV2Scan(path, table, required, target, lo, hi)
  }
}

/** A set of disjoint b-tree subtree roots walked by one task, restricted
  * to the pushed rowid window [lo, hi]. */
final case class SqlitePartition(path: String, table: String, roots: Seq[Int],
                                 lo: Long, hi: Long)
  extends InputPartition

final class SqliteV2Scan(path: String, table: String, required: StructType,
                         targetSplits: Int, lo: Long, hi: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val f = new SqliteFile(path, SqliteV2.sessionConf())
    try {
      f.checkSidecars()
      val t = f.table(table).requireSupported()
      val roots = f.subtreeRoots(t.rootPage, targetSplits, lo, hi)
      // round-robin the subtrees into ≤ target tasks; sibling subtrees are
      // similar-sized (b-trees balance), so this is also size-balanced
      val buckets = math.max(1, math.min(targetSplits, roots.size))
      (0 until buckets).map(b =>
        SqlitePartition(path, table, roots.zipWithIndex.collect {
          case (r, i) if i % buckets == b => r
        }, lo, hi): InputPartition).toArray
    } finally f.close()
  }

  override def description(): String =
    s"graft-sqlite $table" + (if (lo != Long.MinValue || hi != Long.MaxValue)
      s" rowid=[$lo,$hi]" else "")

  override def createReaderFactory(): PartitionReaderFactory =
    new SqliteReaderFactory(required)
}

final class SqliteReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SqlitePartition]
    new SqlitePartitionReader(sp, required)
  }
}

final class SqlitePartitionReader(p: SqlitePartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private val file = new SqliteFile(p.path, SqliteV2.sessionConf())
  private val meta = file.table(p.table)
  // positional projection: decode only required columns, emit in the
  // required order
  private val need = meta.columns.map(c => required.fieldNames.contains(c.name)).toArray
  private val outIdx = required.fieldNames.map(n => meta.columns.indexWhere(_.name == n))
  private val toCatalyst = CatalystTypeConverters.createToCatalystConverter(required)
  private val it = p.roots.iterator.flatMap(r => file.tableCells(r, p.lo, p.hi))
  private var current: InternalRow = _

  override def next(): Boolean =
    if (!it.hasNext) false
    else {
      val (rowid, payload) = it.next()
      val decoded = file.decodeRecord(rowid, payload, meta.columns, need)
      val row = new GenericRowWithSchema(outIdx.map(decoded(_)), required)
      current = toCatalyst(row).asInstanceOf[InternalRow]
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit = file.close()
}

object SqliteV2 {
  def pathOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw SqliteFile.FormatError("graft-sqlite needs a path: .load(\"/x.db\")"))

  /** Active session's hadoop conf when available (carries spark.hadoop.*
    * object-store credentials); executors fall back to a bare conf, which
    * serves file:// and default-FS reads. */
  def sessionConf(): org.apache.hadoop.conf.Configuration =
    SparkSession.getActiveSession.map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  /** One table as a DataFrame. */
  def read(spark: SparkSession, dbPath: String, table: String): DataFrame =
    spark.read.format(classOf[SqliteDataSource].getName)
      .option("table", table).load(dbPath)

  /** `sqlite://path` attach: with `--from` specs, register those tables;
    * with none, attach every supported user table (the reference's
    * sqlite_attach, duckdb.rs:75-83, attaches all). Unsupported tables
    * (WITHOUT ROWID / GENERATED) are skipped with a warning in attach-all
    * and fail loudly when requested explicitly. */
  def registerSqlite(spark: SparkSession, database: String,
                     specs: Seq[String]): Map[String, DataFrame] = {
    val dbPath = database.stripPrefix("sqlite://")
    val f = new SqliteFile(dbPath, spark.sparkContext.hadoopConfiguration)
    val all = try { f.checkSidecars(); f.tables() } finally f.close()
    val chosen: Seq[(String, String)] =
      if (specs.nonEmpty) specs.map { spec =>
        val (name, src) = Registrar.standardiseSource(spec)
        (name, src)
      } else all.flatMap { t =>
        t.unsupported match {
          case Some(why) =>
            System.err.println(s"[graft-sqlite] skipping table '${t.name}': $why")
            None
          case None => Some((t.name, t.name))
        }
      }
    chosen.map { case (view, table) =>
      val df = read(spark, dbPath, table)
      df.createOrReplaceTempView(view)
      view -> df
    }.toMap
  }
}
