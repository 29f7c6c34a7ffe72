package graft.sources

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Distributed Avro sink — the write half of [[AvroDataSource]], again over
  * the avro libraries the Spark distribution bundles (no spark-avro jar).
  * Exceeds the reference surface (pq writes csv/json/parquet/table only).
  *
  * Schema mapping is the exact inverse of [[AvroScan]]'s reader mapping —
  * a written file reads back with the identical Spark schema (nullable
  * fields become [null, T] unions; timestamps as timestamp-micros, dates
  * as date logical types) — so write→read round-trips are type-stable.
  *
  * Scale shape: one task per partition via `saveAsNewAPIHadoopFile` +
  * `AvroKeyOutputFormat` — no driver funnel, no collect; the row→record
  * bridge parses the schema once per PARTITION, not per row. */
object AvroWrite {

  def write(df: DataFrame, path: String): Unit = {
    val structType = df.schema
    val avroSchema = sparkToAvro(structType, "spark_export")
    val schemaJson = avroSchema.toString
    val job = Job.getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, avroSchema)
    df.rdd.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      rows.map(r => (new AvroKey[GenericRecord](rowToRecord(r, structType, schema)),
        NullWritable.get()))
    }.saveAsNewAPIHadoopFile(
      path,
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }

  /** StructType → avro record schema; inverse of [[AvroScan]] branch for
    * branch. Loud on types avro can't hold faithfully. */
  def sparkToAvro(st: StructType, name: String): Schema = {
    val fields = st.fields.map { f =>
      val base = fieldSchema(f.dataType, s"${name}_${f.name}")
      val sch = if (f.nullable)
        Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base))
      else base
      new Schema.Field(f.name, sch, null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, "graft", false, java.util.Arrays.asList(fields: _*))
  }

  private def fieldSchema(dt: DataType, nested: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case DateType => LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case dt: DecimalType =>
      LogicalTypes.decimal(dt.precision, dt.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case ArrayType(et, containsNull) =>
      val elem = fieldSchema(et, nested + "_item")
      Schema.createArray(
        if (containsNull)
          Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), elem))
        else elem)
    case MapType(StringType, vt, valueContainsNull) =>
      val v = fieldSchema(vt, nested + "_value")
      Schema.createMap(
        if (valueContainsNull)
          Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), v))
        else v)
    case st: StructType => sparkToAvro(st, nested)
    case other =>
      throw Registrar.SourceError(s"avro sink cannot hold Spark type $other faithfully")
  }

  private[sources] def rowToRecord(row: Row, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    var i = 0
    while (i < st.fields.length) {
      rec.put(i, toAvro(row.get(i), st.fields(i).dataType,
        unwrap(schema.getFields.get(i).schema())))
      i += 1
    }
    rec
  }

  private def unwrap(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private def toAvro(v: Any, dt: DataType, s: Schema): Any = {
    if (v == null) return null
    dt match {
      case TimestampType =>
        val t = v.asInstanceOf[java.sql.Timestamp]
        // floorDiv, not /: pre-epoch getTime is negative and truncation
        // toward zero would shift fractional seconds +1s (read side uses
        // floorDiv too — the round-trip contract)
        Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
      case DateType =>
        v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt
      case dt: DecimalType =>
        // avro decimal = two's-complement big-endian unscaled value at the
        // schema's scale (inverse of the AvroScan read mapping)
        val bd = v.asInstanceOf[java.math.BigDecimal].setScale(dt.scale)
        java.nio.ByteBuffer.wrap(bd.unscaledValue().toByteArray)
      case BinaryType => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case ArrayType(et, _) =>
        val elem = unwrap(s.getElementType)
        v.asInstanceOf[scala.collection.Seq[Any]].map(toAvro(_, et, elem)).asJava
      case MapType(StringType, vt, _) =>
        val vs = unwrap(s.getValueType)
        v.asInstanceOf[scala.collection.Map[String, Any]]
          .map { case (k, mv) => k -> toAvro(mv, vt, vs) }.asJava
      case nested: StructType => rowToRecord(v.asInstanceOf[Row], nested, s)
      case ShortType => v.asInstanceOf[Short].toInt
      case ByteType => v.asInstanceOf[Byte].toInt
      case _ => v // boolean, int, long, float, double, string
    }
  }
}
