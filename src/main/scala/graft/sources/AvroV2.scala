package graft.sources

import java.util.{Map => JMap}

import org.apache.avro.Schema
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** DataSource V2 Avro connector (`format("graft-avro")` / `.avro` via the
  * [[Registrar]]): the 100 TB-shaped version of [[AvroScan]].
  *
  * Why V2 instead of the hadoop-RDD bridge: at scale the two things that
  * matter for a row-format scan are (1) NOT decoding columns the query
  * doesn't read and (2) fanning one large file out across executors. Both
  * need connector integration:
  *
  *  - **Column pruning** ([[SupportsPushDownRequiredColumns]]): Catalyst
  *    hands the scan its required schema; the reader resolves the file
  *    against a SUBSET reader schema, so avro's schema resolution SKIPS
  *    the bytes of unselected fields instead of materializing them (the
  *    row-format analogue of parquet's column pruning — decode cost is
  *    the dominant term; a 2-column projection of a 50-field record no
  *    longer pays 50 field decodes). `.explain` shows the pruned
  *    ReadSchema on the scan node.
  *  - **Sync-marker splits**: avro container files are splittable at
  *    16-byte sync boundaries. Each [[AvroInputPartition]] is a byte
  *    range; the reader `sync(start)`s to the first block after its
  *    offset and stops once `pastSync(end)` — the standard contract that
  *    makes ranges partition the file exactly (every record read exactly
  *    once across partitions). One 10 GB file becomes ~80 parallel tasks
  *    at the default 128 MB split, instead of one.
  *
  * Filter pushdown is deliberately absent: avro blocks carry no min/max
  * stats, so there is nothing to prune with — Catalyst's post-scan filter
  * is already optimal.
  */
class AvroDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val conf = AvroV2.sessionConf(options)
    val files = AvroV2.listFiles(AvroV2.pathOf(options), conf)
    AvroScan.toStruct(AvroV2.headerSchema(files.head, conf))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new AvroTable(properties.get("path"), schema)
}

final class AvroTable(path: String, override val schema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-avro:$path"
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(path, schema, options)
}

final class AvroScanBuilder(path: String, fullSchema: StructType,
                            options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema

  /** Catalyst may hand NESTED-pruned structs here
    * (spark.sql.optimizer.nestedSchemaPruning.enabled, default true): a
    * `select("meta.n")` arrives as `meta: struct<n>`. The avro reader
    * resolves whole top-level fields — a subset READER record skips
    * unselected top-level fields byte-wise, but within a selected record
    * avro decodes every writer field — so widen each required top-level
    * field back to its full table type. Spark projects the nested subset
    * post-scan (it reads `Scan.readSchema()`, not its own request), and the
    * positional record→Row bridge stays aligned with the reader schema at
    * every nesting level. Pruning a nested-pruned schema as-is crashed the
    * converter (ArrayIndexOutOfBounds) or mis-mapped type-coincident
    * sibling fields. */
  override def pruneColumns(requiredSchema: StructType): Unit = {
    val byName = fullSchema.fields.map(f => f.name -> f).toMap
    required = StructType(requiredSchema.fields.map(f => byName.getOrElse(f.name, f)))
  }

  override def build(): Scan = {
    // Session hadoop conf + read options — NOT `new Configuration()`: the
    // session carries spark.hadoop.* (object-store credentials, defaultFS);
    // a bare conf only works on the local filesystem.
    val conf = AvroV2.sessionConf(options)
    val files = AvroV2.listFiles(path, conf)
    val writer = AvroV2.headerSchema(files.head, conf)
    val maxSplit = Option(options.get("maxSplitBytes")).map(_.toLong)
      .getOrElse(128L * 1024 * 1024)
    new AvroV2Scan(files.map(_.toString), writer.toString, required, maxSplit,
      new SerializableConf(conf))
  }
}

/** Byte range of one file; the reader syncs to the first avro block at or
  * after `start` and stops at the first block past `start + length`. */
final case class AvroInputPartition(path: String, start: Long, length: Long)
  extends InputPartition

final class AvroV2Scan(files: Seq[String], writerSchemaJson: String,
                       required: StructType, maxSplitBytes: Long,
                       conf: SerializableConf)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-avro [${required.fieldNames.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    files.flatMap { f =>
      val p = new Path(f)
      val len = p.getFileSystem(conf.value).getFileStatus(p).getLen
      (0L until len by maxSplitBytes).map(off =>
        AvroInputPartition(f, off, math.min(maxSplitBytes, len - off)))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(writerSchemaJson, required, conf)
}

final class AvroReaderFactory(writerSchemaJson: String, required: StructType,
                              conf: SerializableConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[AvroInputPartition]
    new AvroPartitionReader(p, writerSchemaJson, required, conf.value)
  }
}

final class AvroPartitionReader(part: AvroInputPartition,
                                writerSchemaJson: String, required: StructType,
                                hadoopConf: Configuration)
    extends PartitionReader[InternalRow] {

  private val writerSchema = new Schema.Parser().parse(writerSchemaJson)
  // Subset READER schema: avro schema resolution decodes only these fields
  // and skips the rest byte-wise — the pruning itself.
  private val readerSchema = AvroV2.projectSchema(writerSchema, required.fieldNames)
  private val reader = {
    val in = new FsInput(new Path(part.path), hadoopConf)
    val r = new DataFileReader[GenericRecord](in,
      new GenericDatumReader[GenericRecord](null, readerSchema))
    r.sync(part.start)
    r
  }
  private val toCatalyst =
    CatalystTypeConverters.createToCatalystConverter(required)
  private val fieldSchemas = readerSchema.getFields.asScala.map(_.schema()).toArray
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (!reader.hasNext || reader.pastSync(part.start + part.length)) return false
    val rec = reader.next()
    current = toCatalyst(AvroScan.recordToRow(rec, fieldSchemas))
      .asInstanceOf[InternalRow]
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}

/** Hadoop `Configuration` is not `Serializable`; this is the standard
  * write()/readFields() envelope so the SESSION conf (spark.hadoop.*
  * credentials, fs.defaultFS) reaches executor-side readers intact. */
final class SerializableConf(@transient private var conf: Configuration)
    extends Serializable {
  def value: Configuration = conf
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new Configuration(false)
    conf.readFields(in)
  }
}

private[sources] object AvroV2 {

  /** The active session's hadoop conf merged with per-read options — what
    * every driver-side file touch and every shipped reader must use. */
  def sessionConf(options: CaseInsensitiveStringMap): Configuration =
    org.apache.spark.sql.SparkSession.active.sessionState
      .newHadoopConfWithOptions(options.asCaseSensitiveMap().asScala.toMap)

  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    if (p == null)
      throw Registrar.SourceError("graft-avro needs a path: spark.read.format(\"graft-avro\").load(path)")
    p
  }

  def listFiles(path: String, conf: Configuration): Seq[Path] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (fs.getFileStatus(p).isDirectory) {
      val fls = fs.listStatus(p).map(_.getPath)
        .filter(_.getName.endsWith(".avro")).sortBy(_.getName).toSeq
      if (fls.isEmpty) throw Registrar.SourceError(s"no .avro files under $path")
      fls
    } else Seq(p)
  }

  def headerSchema(file: Path, conf: Configuration): Schema = {
    val in = new FsInput(file, conf)
    try {
      val r = DataFileReader.openReader(in, new GenericDatumReader[GenericRecord]())
      try r.getSchema finally r.close()
    } finally in.close()
  }

  /** Reader schema = writer record restricted to `names`, in `names` order
    * (the order Catalyst asked for). Unknown names fail loudly. */
  def projectSchema(writer: Schema, names: Array[String]): Schema = {
    val byName = writer.getFields.asScala.map(f => f.name() -> f).toMap
    val fields = names.map { n =>
      val f = byName.getOrElse(n,
        throw Registrar.SourceError(s"column $n not in avro schema ${writer.getName}"))
      new Schema.Field(f.name(), f.schema(), f.doc(), f.defaultVal())
    }
    Schema.createRecord(writer.getName, writer.getDoc, writer.getNamespace,
      false, java.util.Arrays.asList(fields: _*))
  }
}
