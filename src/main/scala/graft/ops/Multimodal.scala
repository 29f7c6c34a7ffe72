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

  final case class ResizedMedia(doc_id: Long, kind: String, width: Int, height: Int,
                                media: Array[Byte])

  /** STUB resize: a real implementation decodes + scales pixels here; the
    * stub truncates/keeps bytes proportionally so output size tracks the
    * target dims deterministically. The plumbing is the point: bytes stay
    * inside one task (no shuffle), metadata columns update consistently. */
  def resize(media: DataFrame, maxW: Int, maxH: Int)(implicit spark: SparkSession): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val scale = math.min(1.0,
          math.min(maxW.toDouble / math.max(m.width, 1), maxH.toDouble / math.max(m.height, 1)))
        val nw = math.max(1, (m.width * scale).toInt)
        val nh = math.max(1, (m.height * scale).toInt)
        val nBytes = math.max(1, (m.media.length * scale * scale).toInt)
        ResizedMedia(m.doc_id, m.kind, nw, nh, java.util.Arrays.copyOf(m.media, nBytes))
      }
    }
  }

  final case class Frame(doc_id: Long, frame_idx: Int, ts_ms: Long, frame: Array[Byte])

  /** STUB frame sampling for `video` rows: one output row per sampled frame
    * (a real decoder emits actual frames at the same positions). This is
    * the row-EXPANSION shape of multimodal pipelines: one iterator in, n
    * rows out per video, all inside the task — the frames shuffle (small,
    * post-decode), the source bytes never do. */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000L, maxFrames: Int = 8)(
      implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.filter(_.kind == "video").flatMap { m =>
        // stub duration: 100 bytes ≈ 1ms of video
        val durMs = math.max(1L, m.media.length / 100L)
        val n = math.min(maxFrames.toLong, durMs / everyMs + 1).toInt
        (0 until n).iterator.map { i =>
          val ts = i * everyMs
          // stub frame: a deterministic slice standing in for the decoded frame
          val at = ((ts.toDouble / durMs) * m.media.length).toInt.min(math.max(m.media.length - 16, 0))
          Frame(m.doc_id, i, ts,
            java.util.Arrays.copyOfRange(m.media, at, math.min(at + 16, m.media.length)))
        }
      }
    }
  }

  /** Exact media dedup census — NOT a stub: content-hash (md5 of the
    * raw bytes) identical-payload dedup per kind, with the STORAGE
    * story a media dedup pass is actually run for:
    * {{{
    *   dup_share          = 1 − n_distinct / n_items
    *   bytes_saved_share  = 1 − distinct_bytes / total_bytes
    * }}}
    * The first pass over any crawled media corpus: re-hosted images and
    * re-uploaded clips duplicate at the BYTE level long before any
    * perceptual hash is needed, and the two shares say how much of the
    * corpus (by count and by storage) a trivial exact pass removes.
    *
    * Determinism: md5 is content-defined; counts/bytes exact longs; the
    * two shares one IEEE division each, 6-dp.
    *
    * Scale shape: media BYTES never shuffle — each scan task reduces a
    * row to (kind, 32-hex digest, byte length) and the (kind, digest)
    * collapse partial-aggregates map-side; the K-row kind rollup is
    * trivial. At 100 TB this is the shape that matters: the shuffle
    * carries ~48 B/item regardless of item size.
    *
    * @return per kind (kind, n_items, n_distinct, dup_share,
    *         total_bytes, distinct_bytes, bytes_saved_share) ordered by
    *         kind
    */
  /** NEAR-duplicate media candidate pairs — the approximate pass
    * [[mediaDedupCensus]] (exact bytes) cannot make: re-hosted payloads
    * with prepended/appended metadata, truncated downloads, and small
    * binary patches byte-differ but chunk-overlap. Each payload reduces
    * to a MinHash signature over its CONTENT-DEFINED chunk set (gear
    * CDC — [[graft.functions.ByteSketches]]: boundaries follow content,
    * so an insertion re-aligns instead of shifting every downstream
    * chunk the way fixed-width chunking would), then the standard
    * banded-LSH machinery ([[graft.ops.Dedup.minhashPairs]]'s, shared
    * via `candidatePairsFromSignatures`) generates candidates:
    * `est_jaccard` = fraction of equal signature positions ≈ chunk-set
    * Jaccard.
    *
    * What it catches / misses, honestly: byte-level chunk overlap finds
    * truncation, padding, container-metadata edits, and partial
    * corruption; a RE-ENCODE (new codec pass) rewrites every byte and
    * needs perceptual features post-decode — that tier sits behind the
    * decode stub ([[decodeStub]]) by design in this sandbox.
    *
    * Scale shape: media BYTES never shuffle and never amplify — the
    * signature is a native codegen'd one-pass expression
    * ([[graft.functions.ByteChunkMinHashSig]]) evaluated in the scan
    * task; only (id, numHashes×8 B) rows cross the wire (the x420
    * discipline, PlanQualitySpec-pinned). Banding, the broadcast
    * hot-bucket guard (`maxBucket` — constant-byte payloads chunk
    * identically and would go quadratic), and the threshold filter are
    * exactly [[graft.ops.Dedup.minhashPairs]]'s.
    *
    * Determinism: gear table, chunk hashes (xxhash64 seed 42), and the
    * Carter-Wegman family are all fixed-seed — signatures are bit-stable
    * across JVMs and partitionings. xxhash64-based, so rows-only at the
    * driver gate (md5 twin x431 pins the chunk-minhash math in DuckDB).
    *
    * @param avgBits  expected chunk size = 2^avgBits bytes (default 64 B
    *                 — ~8 chunks on a 500 B payload, ~16k on a 1 MB one)
    * @param maxBucket hot-bucket guard, as [[graft.ops.Dedup.minhashPairs]]
    * @return (a, b, est_jaccard) with a < b, est_jaccard ≥ threshold
    */
  def mediaNearDupPairs(media: DataFrame, idCol: String, bytesCol: String,
                        avgBits: Int = 6, numHashes: Int = 64,
                        bands: Int = 8, threshold: Double = 0.5,
                        maxBucket: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    import org.apache.spark.sql.GraftExpr
    val minLen = math.max(1 << (avgBits - 2), 1) // 2^avgBits/4 .. 4·2^avgBits
    val maxLen = 1 << (avgBits + 2)
    val sigged = media
      .filter(F.col(idCol).isNotNull && F.col(bytesCol).isNotNull)
      .select(F.col(idCol),
        GraftExpr.column(graft.functions.ByteChunkMinHashSig(
          GraftExpr.expression(F.col(bytesCol)), avgBits, minLen, maxLen,
          numHashes)).as("__sig"))
      .repartition(F.col(idCol)) // materialize signatures ONCE behind an
      // exchange for the multi-consumer candidate pipeline — and drop the
      // media bytes before anything wider than (id, sig) can shuffle
    graft.ops.Dedup.candidatePairsFromSignatures(sigged, idCol, bands,
      numHashes / bands, threshold, maxBucket)
  }

  def mediaDedupCensus(media: DataFrame, kindCol: String,
                       bytesCol: String): DataFrame = {
    val rows = media.select(F.col(kindCol).cast("string").as("kind"),
      F.md5(F.col(bytesCol)).as("__h"),
      F.length(F.col(bytesCol)).cast("long").as("__n"))
    // identical bytes ⇒ identical length: max() just picks the one value
    val per = rows.groupBy("kind", "__h")
      .agg(F.count(F.lit(1)).as("__c"), F.max("__n").as("__b"))
    per.groupBy("kind")
      .agg(F.sum("__c").as("n_items"),
        F.count(F.lit(1)).as("n_distinct"),
        F.sum(F.col("__c") * F.col("__b")).as("total_bytes"),
        F.sum("__b").as("distinct_bytes"))
      .select(F.col("kind"), F.col("n_items"), F.col("n_distinct"),
        F.round(F.lit(1.0) - F.col("n_distinct").cast("double") /
          F.col("n_items").cast("double"), 6).as("dup_share"),
        F.col("total_bytes"), F.col("distinct_bytes"),
        F.round(F.lit(1.0) - F.col("distinct_bytes").cast("double") /
          F.nullif(F.col("total_bytes").cast("double"), F.lit(0.0)), 6)
          .as("bytes_saved_share"))
      .orderBy("kind")
  }
}
