package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: opaque `binary` payload columns + typed metadata, processed
  * in per-partition batches.
  *
  * The container has no media libraries, so the *decode kernels are stubs*
  * — deterministic fakes that parse our synthetic header layout. Everything
  * around them (schema contract, batch shape, partition sizing, metadata
  * propagation) is the real engine surface: swap `StubCodec` for a JNI/
  * ffmpeg-backed codec and nothing else changes.
  *
  * Scale notes: media blobs dominate row size, so ops here (a) never
  * shuffle the blob (metadata-only projections go through narrow maps),
  * (b) use `mapPartitions` so a native codec amortizes init per partition
  * (the Scala analog of batched pandas UDFs), (c) repartition by size
  * budget before decode, not by row count.
  */
object Multimodal {

  /** Typed metadata carried next to each blob. */
  case class MediaMeta(media_type: String, width: Int, height: Int,
      n_frames: Int, sample_rate: Int)
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  case class DecodedRow(doc_id: Long, media_type: String, width: Int,
      height: Int, n_frames: Int, sample_rate: Int, n_bytes: Long)

  /** Synthesize a deterministic fake media payload per document: a 16-byte
    * header (magic, width, height, frames) + pseudo-random body derived
    * from the doc id. Stands in for real blob ingestion. */
  def attachFakeMedia(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val mediaType = element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(col(idCol), lit(3)) + 1).cast("int"))
    docs
      .withColumn("media_type", mediaType)
      .withColumn("payload", fakePayload(col(idCol)))
  }

  /** header: [0xAB, 0xCD, w_hi, w_lo, h_hi, h_lo, f_hi, f_lo] + body,
    * built via hex encoding (big-endian 16-bit fields). */
  private def fakePayload(id: org.apache.spark.sql.Column) = {
    val w = (pmod(id, lit(64)) + 16).cast("int")
    val h = (pmod(id * 7, lit(64)) + 16).cast("int")
    val f = (pmod(id * 13, lit(30)) + 1).cast("int")
    concat(
      unhex(concat(lit("ABCD"),
        lpad(hex(w), 4, "0"), lpad(hex(h), 4, "0"), lpad(hex(f), 4, "0"))),
      // body: size ∝ "frames"
      repeat(lit("x"), f * 8).cast("binary"))
  }

  /** ??? in spirit — the decode kernel is a STUB: it only parses our fake
    * header. A real deployment replaces this body with an image/audio
    * decoder; the signature (bytes → meta) is the contract. */
  def stubDecode(mediaType: String, payload: Array[Byte]): MediaMeta = {
    require(payload.length >= 8 &&
      payload(0) == 0xAB.toByte && payload(1) == 0xCD.toByte,
      "bad media magic")
    def s(i: Int): Int = ((payload(i) & 0xFF) << 8) | (payload(i + 1) & 0xFF)
    val (w, h, f) = (s(2), s(4), s(6))
    mediaType match {
      case "image" => MediaMeta("image", w, h, 1, 0)
      case "audio" => MediaMeta("audio", 0, 0, 0, 16000 + f)
      case "video" => MediaMeta("video", w, h, f, 0)
      case other => throw new IllegalArgumentException(other)
    }
  }

  /** Batched decode: one codec instance per partition, blobs dropped from
    * the output (metadata-only), which keeps the post-decode shuffle thin. */
  def decodeMeta(media: DataFrame)(implicit spark: SparkSession): Dataset[DecodedRow] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition codec init would happen here (amortized)
        rows.map { r =>
          val m = stubDecode(r.media_type, r.payload)
          DecodedRow(r.doc_id, m.media_type, m.width, m.height, m.n_frames,
            m.sample_rate, r.payload.length.toLong)
        }
      }
  }

  /** Deterministic frame sampling plan for video rows: every `stride`-th
    * frame index — pure column math, no decode needed for planning. */
  def frameSamplePlan(decoded: DataFrame, stride: Int): DataFrame =
    decoded.where(col("media_type") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select(col("doc_id"), col("frame_idx"))

  /** Resize plan: scale-to-fit inside `maxDim` preserving aspect ratio,
    * integer arithmetic only (SQL-reproducible). Pure column math over the
    * decoded metadata — the actual pixel resample happens in the decode
    * kernel at materialization; planning never touches bytes. */
  def resizePlan(decoded: DataFrame, maxDim: Int): DataFrame = {
    val longSide = greatest(col("width"), col("height"))
    val needs = longSide > maxDim
    decoded.where(col("media_type").isin("image", "video"))
      .withColumn("new_width",
        when(needs, (col("width") * maxDim / longSide).cast("int"))
          .otherwise(col("width")))
      .withColumn("new_height",
        when(needs, (col("height") * maxDim / longSide).cast("int"))
          .otherwise(col("height")))
      .select(col("doc_id"), col("media_type"), col("width"), col("height"),
        col("new_width"), col("new_height"))
  }

  /** STUB feature extraction: a deterministic pseudo-embedding derived
    * from the payload bytes (splitmix over a rolling hash per dimension).
    * Stands in for a vision/audio encoder; the contract — bytes in,
    * `array<float>` out, batched per partition — is the real surface, and
    * its output feeds the engine's ANN/dedup pipelines unchanged. */
  def stubFeatures(payload: Array[Byte], dims: Int = 16): Array[Float] = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) { h ^= payload(i); h *= 0x100000001b3L; i += 1 }
    val out = new Array[Float](dims)
    var d = 0
    var x = h
    while (d < dims) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      out(d) = (((z >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0).toFloat
      d += 1
    }
    out
  }

  /** Batched feature extraction over media rows → (doc_id, embedding);
    * output plugs straight into Ann/Dedup.embeddingNearDups. */
  def extractFeatures(media: DataFrame, dims: Int = 16)
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[MediaRow]
      .mapPartitions(_.map(r => (r.doc_id, stubFeatures(r.payload, dims))))
      .toDF("doc_id", "embedding")
  }

  /** Size-budgeted repartition before heavy decode: target bytes per task
    * so executors neither starve nor OOM on skewed blob sizes. */
  def repartitionByByteBudget(media: DataFrame, bytesPerTask: Long): DataFrame = {
    val stats = media.agg(sum(length(col("payload")))).head()
    val totalBytes = if (stats.isNullAt(0)) 0L else stats.getLong(0)
    val per = math.max(1L, bytesPerTask)
    val parts = math.max(1, ((totalBytes + per - 1) / per).toInt) // ceil: never over budget
    media.repartition(parts)
  }
}
