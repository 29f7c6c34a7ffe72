package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The decode step is STUBBED (this container has no image/audio libs —
  * builder prompt): [[decodeStub]] derives a deterministic fake feature
  * vector from the bytes. Everything around it — schema, encoders,
  * partitioning, batch shape (`mapPartitions` = one iterator per task, the
  * Scala analogue of `mapInPandas` batches) — is real and what matters at
  * 100 TB: media bytes never hit a shuffle; features (small) do.
  */
object Multimodal {

  /** Typed media row: bytes + metadata travel together. */
  final case class MediaRow(doc_id: Long, kind: String, width: Int, height: Int,
                            media: Array[Byte])
  final case class MediaFeatures(doc_id: Long, kind: String, width: Int, height: Int,
                                 n_bytes: Int, features: Array[Float])

  /** Synthesize a media table from `documents`: text bytes stand in for
    * encoded media; metadata is derived deterministically. In a real
    * pipeline this is the ingest boundary (`spark.read.format("binaryFile")`
    * or parquet with a binary column). */
  def synthesizeMedia(docs: DataFrame): DataFrame =
    docs.select(
      F.col("doc_id"),
      F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64(F.col("doc_id")), F.lit(3)) + 1).cast("int")).as("kind"),
      (F.pmod(F.xxhash64(F.col("doc_id"), F.lit(1)), F.lit(1920)) + 1L).cast("int").as("width"),
      (F.pmod(F.xxhash64(F.col("doc_id"), F.lit(2)), F.lit(1080)) + 1L).cast("int").as("height"),
      F.encode(F.col("text"), "UTF-8").as("media"))

  /** STUB decode: deterministic 16-bin byte histogram, L1-normalized.
    * A real implementation would decode image/audio per batch here (e.g.
    * javax.imageio / ffmpeg JNI), keeping the same signature: bytes in,
    * fixed-width float features out, one partition-iterator per task. */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xFF) >> 4) += 1f; i += 1 }
    val total = math.max(1, bytes.length).toFloat
    var j = 0
    while (j < 16) { hist(j) /= total; j += 1 }
    hist
  }

  /** Batched feature extraction over the media table. */
  def extractFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      // batch boundary: everything inside runs executor-side, once per task
      it.map { m =>
        MediaFeatures(m.doc_id, m.kind, m.width, m.height, m.media.length,
          decodeStub(m.media))
      }
    }
  }

  /** End-to-end: synthesize → extract → flat feature columns. */
  def mediaFeatures(docs: DataFrame)(implicit spark: SparkSession): DataFrame =
    extractFeatures(synthesizeMedia(docs)).toDF()
}
