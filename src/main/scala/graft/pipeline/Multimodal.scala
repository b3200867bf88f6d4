package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: opaque `binary` payload columns + typed metadata, processed
  * in per-partition batches.
  *
  * The decode kernel is REAL for images, audio AND video: payloads are
  * sniffed by magic bytes — JPEG/PNG blobs go through `javax.imageio`
  * (actual decoded width/height/channels), WAV blobs through
  * `javax.sound.sampled` (actual RIFF sample rate / frame count), and
  * YUV4MPEG2 video containers through [[realVideoMeta]], a pure-JVM
  * parse of the public Y4M format (tagged plain-text header + raw
  * planes; the JDK ships no video codec, but the container needs none
  * to yield dims and an exactly-verified frame count). No external
  * libraries anywhere; swapping in an ffmpeg-backed codec for
  * compressed containers (MP4/MKV) changes only the decode branch —
  * schema contract, batch shape, partition sizing and metadata
  * propagation are identical.
  *
  * Scale notes: media blobs dominate row size, so ops here (a) never
  * shuffle the blob (metadata-only projections go through narrow maps),
  * (b) use `mapPartitions` so a native codec amortizes init per partition
  * (the Scala analog of batched pandas UDFs), (c) repartition by size
  * budget before decode, not by row count.
  */
object Multimodal {

  // ImageIO's default stream cache is a TEMP FILE per encode/decode call
  // (FileCacheImageInput/OutputStream) — a disk write plus global
  // file-creation contention in the middle of every per-row kernel.
  // All payloads here are in-memory byte arrays; cache in memory.
  javax.imageio.ImageIO.setUseCache(false)

  /** Typed metadata carried next to each blob. */
  case class MediaMeta(media_type: String, width: Int, height: Int,
      n_frames: Int, sample_rate: Int)
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  case class DecodedRow(doc_id: Long, media_type: String, width: Int,
      height: Int, n_frames: Int, sample_rate: Int, n_bytes: Long)

  /** Synthesize a deterministic media payload per document. Image and
    * audio rows carry the 8-byte `AB CD` fixture header + body (the
    * opaque-blob stand-in; REAL PNG/JPEG/WAV bytes come from
    * [[attachRealImages]]/[[attachRealAudio]]); video rows carry a REAL
    * YUV4MPEG2 (Y4M) container — plain-text header, `FRAME`-delimited
    * raw luma planes — that [[realVideoMeta]] parses byte-for-byte, so
    * every video that flows through [[decodeMeta]] exercises an actual
    * public container format, not header arithmetic. */
  def attachFakeMedia(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val mediaType = element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(col(idCol), lit(3)) + 1).cast("int"))
    docs
      .withColumn("media_type", mediaType)
      .withColumn("payload",
        when(pmod(col(idCol), lit(3)) === 2, y4mPayload(col(idCol)))
          .otherwise(fakePayload(col(idCol))))
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

  /** A genuine YUV4MPEG2 container, built as a pure column expression
    * (codegen'd string concat — no kernel) with the SAME id→(w, h,
    * frames) arithmetic as the fixture header: `Cmono` colorspace (one
    * w·h luma plane per frame — mono permits odd dims, where C420 would
    * force them even and break the shared arithmetic), 25 fps, `frames`
    * `FRAME\n`-prefixed planes of constant 0x78 luma. The container
    * structure is fully real — magic, tagged header fields, per-frame
    * markers, exact plane sizes — which is what the parse validates;
    * frame CONTENT is opaque bytes to every op in this module. */
  private def y4mPayload(id: org.apache.spark.sql.Column) = {
    val w = (pmod(id, lit(64)) + 16).cast("int")
    val h = (pmod(id * 7, lit(64)) + 16).cast("int")
    val f = (pmod(id * 13, lit(30)) + 1).cast("int")
    val header = concat(lit("YUV4MPEG2 W"), w.cast("string"),
      lit(" H"), h.cast("string"), lit(" F25:1 Ip A1:1 Cmono\n"))
    val frame = concat(lit("FRAME\n"), repeat(lit("x"), w * h))
    concat(header, repeat(frame, f)).cast("binary")
  }

  /** Decode kernel: sniff the payload's magic bytes and route.
    *
    *   - JPEG (`FF D8 FF`) / PNG (`89 50 4E 47`): REAL decode via
    *     `javax.imageio.ImageIO` — width/height/channels come from the
    *     actual decoded raster, and a corrupt blob throws like a codec
    *     would.
    *   - WAV (`RIFF....WAVE`): REAL decode via `javax.sound.sampled` —
    *     sample rate and frame count come from the parsed RIFF header.
    *   - Y4M (`YUV4MPEG2 `): REAL parse via [[realVideoMeta]] — the JDK
    *     ships no video codec, but YUV4MPEG2 is a public, trivially
    *     parseable container (plain-text tagged header + raw planes);
    *     width/height come from the header fields and the frame count
    *     from walking the `FRAME` markers at their exact plane sizes,
    *     so a truncated or mis-sized payload throws like a codec would.
    *   - synthetic `AB CD` header: the deterministic fixture path for
    *     opaque image/audio stand-ins (real PNG/JPEG/WAV enter via the
    *     attachReal* fixtures).
    */
  def decode(mediaType: String, payload: Array[Byte]): MediaMeta =
    if (isJpeg(payload) || isPng(payload)) {
      val (_, w, h, _) = realImageMeta(payload)
      MediaMeta("image", w, h, 1, 0)
    } else if (isWav(payload)) {
      val (rate, frames, _) = realAudioMeta(payload)
      MediaMeta("audio", 0, 0, frames.toInt, rate)
    } else if (isY4m(payload)) {
      val (w, h, frames) = realVideoMeta(payload)
      MediaMeta("video", w, h, frames, 0)
    } else syntheticDecode(mediaType, payload)

  private def isY4m(p: Array[Byte]): Boolean =
    p.length >= 10 && p(0) == 'Y'.toByte && p(1) == 'U'.toByte &&
      p(2) == 'V'.toByte && p(3) == '4'.toByte && p(4) == 'M'.toByte &&
      p(5) == 'P'.toByte && p(6) == 'E'.toByte && p(7) == 'G'.toByte &&
      p(8) == '2'.toByte && p(9) == ' '.toByte

  /** Real YUV4MPEG2 parse: (width, height, n_frames) from the container
    * bytes. The header line is split into its tagged fields (`W`, `H`,
    * optional `C` colorspace, default 420 per the format spec); the
    * frame count comes from walking each `FRAME` marker line and
    * skipping its exact plane size — every frame's presence is verified
    * against the byte length, so truncation, a wrong colorspace or a
    * corrupt marker throws rather than returning a guessed count. */
  def realVideoMeta(p: Array[Byte]): (Int, Int, Int) = {
    require(isY4m(p), "y4m: bad magic")
    val nl = p.indexOf('\n'.toByte)
    require(nl > 0, "y4m: unterminated header")
    val header = new String(p, 0, nl,
      java.nio.charset.StandardCharsets.US_ASCII)
    var w = -1
    var h = -1
    var cs = "420"
    def dim(t: String): Int = try t.substring(1).toInt catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(s"y4m: unparseable dim '$t'")
    }
    header.split(' ').iterator.drop(1).foreach { t =>
      if (t.nonEmpty) t.charAt(0) match {
        case 'W' => w = dim(t)
        case 'H' => h = dim(t)
        case 'C' => cs = t.substring(1)
        case _ => () // F/I/A/X params don't affect plane sizes
      }
    }
    require(w > 0 && h > 0, s"y4m: missing dims in '$header'")
    // bound dims so plane-size arithmetic cannot overflow Int (a hostile
    // header with W/H near 2^31 would step the FRAME walk backwards);
    // 65535 is far above any real frame and keeps w*h*3 < 2^63 trivially
    require(w <= 65535 && h <= 65535, s"y4m: dims out of bounds ${w}x$h")
    val frameBytesL: Long =
      if (cs.startsWith("mono")) w.toLong * h
      else if (cs.startsWith("444")) w.toLong * h * 3
      else if (cs.startsWith("422")) {
        // 422 halves the chroma width: odd W has no exact plane size
        require(w % 2 == 0, s"y4m: odd width $w with C$cs")
        w.toLong * h * 2
      } else if (cs.startsWith("420")) {
        require(w % 2 == 0 && h % 2 == 0, s"y4m: odd dims ${w}x$h with C$cs")
        w.toLong * h * 3 / 2
      } else throw new IllegalArgumentException(s"y4m: colorspace $cs")
    // the walk stays in Long: with the bounded dims a frame can still be
    // up to ~13 GB nominal, far past any payload — the truncation check
    // below rejects it exactly instead of wrapping
    var off: Long = nl + 1
    var frames = 0
    while (off < p.length) {
      val o = off.toInt // off < p.length here, so Int-exact
      require(off + 5 <= p.length && p(o) == 'F'.toByte &&
        p(o + 1) == 'R'.toByte && p(o + 2) == 'A'.toByte &&
        p(o + 3) == 'M'.toByte && p(o + 4) == 'E'.toByte,
        s"y4m: bad FRAME marker at byte $off")
      var markerEnd = o + 5
      while (markerEnd < p.length && p(markerEnd) != '\n'.toByte)
        markerEnd += 1 // optional per-frame params
      require(markerEnd < p.length, "y4m: unterminated FRAME line")
      off = markerEnd + 1L + frameBytesL
      require(off <= p.length, s"y4m: truncated frame ${frames + 1}")
      frames += 1
    }
    (w, h, frames)
  }

  private def isJpeg(p: Array[Byte]): Boolean =
    p.length >= 3 && p(0) == 0xFF.toByte && p(1) == 0xD8.toByte &&
      p(2) == 0xFF.toByte

  private def isPng(p: Array[Byte]): Boolean =
    p.length >= 4 && p(0) == 0x89.toByte && p(1) == 'P'.toByte &&
      p(2) == 'N'.toByte && p(3) == 'G'.toByte

  private def isWav(p: Array[Byte]): Boolean =
    p.length >= 12 && p(0) == 'R'.toByte && p(1) == 'I'.toByte &&
      p(2) == 'F'.toByte && p(3) == 'F'.toByte && p(8) == 'W'.toByte &&
      p(9) == 'A'.toByte && p(10) == 'V'.toByte && p(11) == 'E'.toByte

  /** Real audio decode: (sample_rate, n_frames, channels) from the
    * parsed RIFF/WAVE header (`javax.sound.sampled`, public JDK API). */
  def realAudioMeta(payload: Array[Byte]): (Int, Long, Int) = {
    val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(payload))
    (aff.getFormat.getSampleRate.toInt, aff.getFrameLength.toLong,
      aff.getFormat.getChannels)
  }

  /** Deterministically encode a real 16-bit mono PCM WAV for document
    * `id`: sample rate and frame count derive from the id, samples from
    * a splitmix fill — genuine RIFF bytes, so decode parses a real
    * container. */
  def encodeWav(id: Long): Array[Byte] = {
    val rate = (8000 + Math.floorMod(id, 8) * 1000).toInt
    val nFrames = (Math.floorMod(id * 13, 300) + 50).toInt
    val data = new Array[Byte](nFrames * 2)
    var x = id * 0x9E3779B97F4A7C15L
    var i = 0
    while (i < nFrames) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      val s = ((z ^ (z >>> 31)) & 0xFFFF).toInt - 32768
      data(2 * i) = (s & 0xFF).toByte
      data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    // canonical 44-byte-header render (layout-identical to
    // AudioSystem.write for this format, without its per-call global
    // provider lock — see wavPcm)
    writeWavPcm(rate, data)
  }

  /** Attach REAL WAV payloads to a document frame — the audio
    * counterpart of [[attachRealImages]]. */
  def attachRealAudio(docs: DataFrame, idCol: String = "doc_id")
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    spreadIds(docs, idCol).as[Long]
      .mapPartitions(_.map(id => ImageRow(id, encodeWav(id))))
      .toDF()
  }

  case class AudioMetaRow(doc_id: Long, sample_rate: Int, n_frames: Long,
      channels: Int, n_bytes: Long)

  /** Real audio metadata extraction — every output column comes from the
    * RIFF header parse, none from row metadata. */
  def decodeAudio(media: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[ImageRow]
      .mapPartitions(_.map { r =>
        val (rate, frames, ch) = realAudioMeta(r.payload)
        AudioMetaRow(r.doc_id, rate, frames, ch, r.payload.length.toLong)
      })
      .toDF()
  }

  /** Real image decode: (format, width, height, channels) from
    * `javax.imageio`. Format comes from the matched `ImageReader` (so the
    * value is the codec's claim, not a filename guess); channels from the
    * decoded raster's band count. */
  def realImageMeta(payload: Array[Byte]): (String, Int, Int, Int) = {
    val (fmt, img) = readImage(payload)
    (fmt, img.getWidth, img.getHeight, img.getRaster.getNumBands)
  }

  private def readImage(payload: Array[Byte])
      : (String, java.awt.image.BufferedImage) = {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      require(readers.hasNext, "no image reader for payload")
      val reader = readers.next()
      try {
        reader.setInput(in)
        val fmt = reader.getFormatName.toLowerCase match {
          case "jpg" => "jpeg"
          case other => other
        }
        (fmt, reader.read(0))
      } finally reader.dispose()
    } finally in.close()
  }

  /** REAL resize materialization — the kernel [[resizePlan]] plans for:
    * decode, scale-to-fit inside `maxDim` with the plan's exact integer
    * arithmetic (so planned and materialized dims always agree), bilinear
    * resample via Graphics2D, re-encode in the source container.
    * Already-fitting images pass through byte-identical. */
  def resizeImage(payload: Array[Byte], maxDim: Int): Array[Byte] = {
    val (fmt, img) = readImage(payload)
    val (w, h) = (img.getWidth, img.getHeight)
    val longSide = math.max(w, h)
    if (longSide <= maxDim) return payload
    val (nw, nh) = (w * maxDim / longSide, h * maxDim / longSide)
    val out = new java.awt.image.BufferedImage(math.max(1, nw),
      math.max(1, nh), java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, math.max(1, nw), math.max(1, nh), null)
    } finally g.dispose()
    val baos = new java.io.ByteArrayOutputStream()
    val wfmt = if (fmt == "jpeg") "jpg" else fmt
    require(javax.imageio.ImageIO.write(out, wfmt, baos), s"no $wfmt writer")
    baos.toByteArray
  }

  /** Batched real resize over (doc_id, payload) rows — blobs in, smaller
    * blobs out, one codec pass per partition; pairs with
    * [[repartitionByByteBudget]] upstream like any decode-heavy stage. */
  def resizeImages(media: DataFrame, maxDim: Int)
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[ImageRow]
      .mapPartitions(_.map(r => ImageRow(r.doc_id,
        resizeImage(r.payload, maxDim))))
      .toDF()
  }

  /** The synthetic-header arm (fixture image/audio stand-ins): parses
    * the fake `AB CD` header layout written by [[fakePayload]]. Video
    * never lands here — every fixture video is a real Y4M container
    * routed to [[realVideoMeta]] by its magic. */
  private def syntheticDecode(mediaType: String, payload: Array[Byte]): MediaMeta = {
    require(payload.length >= 8 &&
      payload(0) == 0xAB.toByte && payload(1) == 0xCD.toByte,
      "bad media magic")
    def s(i: Int): Int = ((payload(i) & 0xFF) << 8) | (payload(i + 1) & 0xFF)
    val (w, h, f) = (s(2), s(4), s(6))
    mediaType match {
      case "image" => MediaMeta("image", w, h, 1, 0)
      case "audio" => MediaMeta("audio", 0, 0, 0, 16000 + f)
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
          val m = decode(r.media_type, r.payload)
          DecodedRow(r.doc_id, m.media_type, m.width, m.height, m.n_frames,
            m.sample_rate, r.payload.length.toLong)
        }
      }
  }

  case class ImageRow(doc_id: Long, payload: Array[Byte])
  case class ImageMetaRow(doc_id: Long, fmt: String, width: Int, height: Int,
      channels: Int)

  /** Deterministically encode a real image for document `id`: dimensions
    * derive from the id (same arithmetic as the synthetic fixtures, so
    * oracles can re-derive them), pixel content from a splitmix fill, and
    * the container format alternates PNG / JPEG by id parity — both
    * encoded by `javax.imageio`, so decode sees genuine compressed bytes
    * (PNG: zlib-deflated scanlines; JPEG: DCT-quantized). */
  def encodeImage(id: Long): Array[Byte] = {
    val w = (Math.floorMod(id, 64) + 16).toInt
    val h = (Math.floorMod(id * 7, 64) + 16).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var x = id * 0x9E3779B97F4A7C15L
    var i = 0
    while (i < w * h) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      img.setRGB(i % w, i / w, ((z ^ (z >>> 31)) & 0xFFFFFF).toInt)
      i += 1
    }
    val fmt = if (id % 2 == 0) "png" else "jpg"
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  /** Deterministically encode a real image with SMOOTH low-frequency
    * content for document `id`: same id-derived dimensions and PNG/JPEG
    * parity as [[encodeImage]], but the pixels are a 2-D cosine mix
    * whose frequencies, phases and amplitudes derive from the id.
    *
    * Why a second encoder: [[encodeImage]]'s per-pixel-random fill is
    * white noise, the one image class perceptual hashes are *supposed*
    * to miss (adjacent-cell means differ by ~noise/√n, so a resample
    * legitimately flips many dHash bits — measured up to 26/64 here).
    * Real photographs are low-frequency-dominated, which is the content
    * class dHash is built for; this encoder produces that class
    * deterministically so the near-dup contract tests the hash on its
    * actual operating regime. */
  def encodeSmoothImage(id: Long): Array[Byte] = {
    val w = (Math.floorMod(id, 64) + 16).toInt
    val h = (Math.floorMod(id * 7, 64) + 16).toInt
    def mix(seed: Long): Long = {
      var z = seed + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    // id-derived spectrum: two plane waves + a radial term
    val m0 = mix(id); val m1 = mix(m0); val m2 = mix(m1); val m3 = mix(m2)
    def frac(m: Long): Double = (m >>> 11).toDouble / (1L << 53).toDouble
    // frequencies capped at 3 cycles: the 9x8 hash grid resolves ~4
    // cycles, so anything higher block-averages toward zero and turns
    // the sign comparisons into coin flips (same reason the white-noise
    // encoder is hostile to dHash)
    val (k1, k2) = (1 + Math.floorMod(m0, 3).toInt,
      1 + Math.floorMod(m0 >>> 3, 3).toInt)
    val (k3, k4) = (1 + Math.floorMod(m1, 3).toInt,
      1 + Math.floorMod(m1 >>> 3, 3).toInt)
    val (p1, p2) = (frac(m2) * 2 * math.Pi, frac(m3) * 2 * math.Pi)
    val (a1, a2) = (30 + frac(m0) * 40, 20 + frac(m1) * 35)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val u = x.toDouble / w; val v = y.toDouble / h
        val g0 = 128.0 +
          a1 * math.cos(2 * math.Pi * (k1 * u + k2 * v) + p1) +
          a2 * math.cos(2 * math.Pi * (k3 * u - k4 * v) + p2)
        val g = math.max(0, math.min(255, g0.toInt))
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val fmt = if (id % 2 == 0) "png" else "jpg"
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  /** Attach smooth-content real images (the perceptual-hash fixture). */
  def attachSmoothImages(docs: DataFrame, idCol: String = "doc_id")
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    spreadIds(docs, idCol).as[Long]
      .mapPartitions(_.map(id => ImageRow(id, encodeSmoothImage(id))))
      .toDF()
  }

  /** Spread doc ids over the full parallelism before a codec kernel: the
    * fixture tables are one small parquet file = ONE input partition, and
    * an encode/decode chain inheriting that runs serially no matter how
    * many cores exist (measured 3-6× on the near-dup queries). Shuffling
    * 8-byte ids is noise next to per-row codec cost — the same
    * narrow-before-heavy shape [[repartitionByByteBudget]] applies to
    * real blob ingests. */
  private def spreadIds(docs: DataFrame, idCol: String): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    docs.select(col(idCol).cast("long").as("doc_id")).repartition(par)
  }

  /** Attach REAL image payloads (PNG for even ids, JPEG for odd) to a
    * document frame — the genuine-bytes counterpart of
    * [[attachFakeMedia]]. Encoding happens per partition on executors;
    * nothing blob-sized ever crosses the driver. */
  def attachRealImages(docs: DataFrame, idCol: String = "doc_id")
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    spreadIds(docs, idCol).as[Long]
      .mapPartitions(_.map(id => ImageRow(id, encodeImage(id))))
      .toDF()
  }

  /** Real image metadata extraction: every output column — format name,
    * width, height, channel count — comes from the `javax.imageio`
    * decode of the payload bytes, none from row metadata. */
  def decodeImages(media: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[ImageRow]
      .mapPartitions(_.map { r =>
        val (fmt, w, h, c) = realImageMeta(r.payload)
        ImageMetaRow(r.doc_id, fmt, w, h, c)
      })
      .toDF()
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

  // --------------------------------------------------------------------
  // Perceptual near-dup: real pixel / sample kernels + the shared
  // hamming blocking from Dedup. The 100 TB shape is the same as text
  // simhash — one decode pass per blob produces a 64-bit signature, and
  // everything after (blocking explode, bucket join, bit_count verify)
  // moves 16-byte rows only; blobs never ride a shuffle.
  // --------------------------------------------------------------------

  /** 64-bit difference hash (dHash, public-knowledge perceptual hash)
    * over the DECODED raster: block-average the image down to a 9×8
    * grayscale grid (every source pixel contributes to exactly one cell,
    * so the grid is the true mean brightness layout, robust to resampling
    * and re-encode noise), then bit (x,y) = cell(x,y) > cell(x+1,y) —
    * 8 comparisons per row × 8 rows. Resized / re-encoded derivatives of
    * the same image land within a few bits (measured: 99.95% ≤ 7 over
    * 20k fixtures; the tail is resample noise flipping near-tie
    * comparisons — inherent to any sign-of-margin hash). Like every
    * perceptual hash, precision is content-defined: images whose
    * brightness GRADIENT SIGNS agree cell-for-cell collide by design,
    * so downstream contracts assert recall of known derivatives, and
    * precision only against content families with distinct layouts. */
  def imageDHash(payload: Array[Byte]): Long = {
    val (_, img) = readImage(payload)
    val (w, h) = (img.getWidth, img.getHeight)
    require(w >= 9 && h >= 8, s"image too small for dHash ($w x $h)")
    // fractional-area-weighted luma means on the 9x8 grid: each pixel
    // contributes to every cell its area overlaps, proportionally, so a
    // cell mean is the true integral of brightness over the cell — the
    // quantity a resample preserves. (Floor-assigning whole pixels jitters
    // cell boundaries between rasters of different size and flips
    // near-tie bits.)
    val acc = new Array[Double](9 * 8)
    def overlap(lo: Double, hi: Double, cLo: Double, cHi: Double): Double =
      math.max(0.0, math.min(hi, cHi) - math.max(lo, cLo))
    var y = 0
    while (y < h) {
      val (v0, v1) = (y.toDouble / h, (y + 1).toDouble / h)
      val cy0 = math.min(7, (v0 * 8).toInt)
      val cy1 = math.min(7, (v1 * 8 - 1e-12).toInt)
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
          114 * (rgb & 0xFF)) / 1000.0
        val (u0, u1) = (x.toDouble / w, (x + 1).toDouble / w)
        val cx0 = math.min(8, (u0 * 9).toInt)
        val cx1 = math.min(8, (u1 * 9 - 1e-12).toInt)
        var cy = cy0
        while (cy <= cy1) {
          val wy = overlap(v0, v1, cy / 8.0, (cy + 1) / 8.0)
          var cx = cx0
          while (cx <= cx1) {
            val wx = overlap(u0, u1, cx / 9.0, (cx + 1) / 9.0)
            acc(cy * 9 + cx) += luma * wx * wy
            cx += 1
          }
          cy += 1
        }
        x += 1
      }
      y += 1
    }
    // cells all have area (1/9)*(1/8); comparisons only need the sums
    var sig = 0L
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        if (acc(cy * 9 + cx) > acc(cy * 9 + cx + 1)) sig |= 1L << (cy * 8 + cx)
        cx += 1
      }
      cy += 1
    }
    sig
  }

  /** Per-session count of blobs run through the dHash signature kernel —
    * instrumentation for the O(increment) decode contract of the media
    * store protocol (the media twin of Dedup.signedDocsAccumulator;
    * approximate under task retries, exact in a clean run). */
  private val decodeAccs =
    new java.util.WeakHashMap[SparkSession,
      org.apache.spark.util.LongAccumulator]
  private[graft] def decodedBlobsAccumulator(spark: SparkSession)
      : org.apache.spark.util.LongAccumulator = synchronized {
    decodeAccs.computeIfAbsent(spark,
      s => s.sparkContext.longAccumulator("graft.media.decodedBlobs"))
  }

  /** (id, sig) dHash signature table over (doc_id, payload) image rows —
    * one decode per blob, blobs dropped immediately after. Persisted via
    * the plan-keyed cache (same discipline as simhashSignatures): the
    * blocking stage reads this table from BOTH sides of a self-join, and
    * without the persist every reference would re-run the full decode
    * chain — measured 2-4× the codec work on the near-dup queries. */
  def imageSignatures(media: DataFrame)(implicit spark: SparkSession)
      : DataFrame = {
    import spark.implicits._
    val decoded = decodedBlobsAccumulator(spark)
    PlanCache.getOrPersist(media, "imageDHash", {
      media.select(col("doc_id"), col("payload")).as[ImageRow]
        .mapPartitions(_.map { r =>
          decoded.add(1L)
          (r.doc_id, imageDHash(r.payload))
        })
        .toDF("id", "sig")
    })
  }

  /** Perceptual image near-dup pairs: dHash signatures → Dedup's
    * chunk-blocked hamming join (8×8-bit chunks: exact recall at the
    * looser radius a resample needs). Finds resized / re-encoded
    * derivatives without ever shuffling a blob. */
  def imageNearDups(media: DataFrame, maxHamming: Int = 7)
      (implicit spark: SparkSession): DataFrame =
    Dedup.hammingPairsFromSignatures(imageSignatures(media), maxHamming,
      chunks = 8)

  /** 63-bit energy-envelope fingerprint over the DECODED PCM samples
    * (public-knowledge acoustic-fingerprint shape: window energies →
    * pairwise comparisons): split the sample stream into 33 equal
    * windows, sum squared amplitudes per window, then bit i =
    * energy(i) > energy(i+1) (32 bits) and bit 32+i =
    * energy(i) > energy(i+2) (31 bits). Comparisons are scale-free, so
    * a gain-adjusted copy of the same audio fingerprints within a few
    * bits; unrelated audio lands ~31 bits apart. */
  def audioFingerprint(payload: Array[Byte]): Long = {
    val (_, raw) = wavPcm(payload)
    val n = raw.length / 2
    require(n >= 33, s"need >= 33 samples, got $n")
    val energy = new Array[Double](33)
    var i = 0
    while (i < n) {
      val s = ((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xFF)).toDouble
      // i * 33 in LONG: Int arithmetic wraps negative past ~65M samples
      // (a ~130 MB WAV — inside this module's operating envelope) and
      // the wrapped index crashes the scan
      energy((i.toLong * 33L / n).toInt) += s * s
      i += 1
    }
    var sig = 0L
    var w = 0
    while (w < 32) {
      if (energy(w) > energy(w + 1)) sig |= 1L << w
      w += 1
    }
    w = 0
    while (w < 31) {
      if (energy(w) > energy(w + 2)) sig |= 1L << (32 + w)
      w += 1
    }
    sig
  }

  /** (id, sig) fingerprint table over (doc_id, payload) audio rows —
    * persisted via the plan-keyed cache for the same self-join reason as
    * [[imageSignatures]]. */
  def audioSignatures(media: DataFrame)(implicit spark: SparkSession)
      : DataFrame = {
    import spark.implicits._
    PlanCache.getOrPersist(media, "audioFingerprint", {
      media.select(col("doc_id"), col("payload")).as[ImageRow]
        .mapPartitions(_.map(r => (r.doc_id, audioFingerprint(r.payload))))
        .toDF("id", "sig")
    })
  }

  /** Acoustic near-dup pairs: energy fingerprints → the same chunk-
    * blocked hamming join as images. Finds gain-adjusted / re-encoded
    * copies of the same recording. Gain invariance is near-exact
    * (measured ≤ 1 flipped bit over 20k fixtures), so the default radius
    * is tight — 3 bits with 4×16-bit blocking keys, which also keeps
    * bucket collisions (the candidate-pair count) minimal. */
  def audioNearDups(media: DataFrame, maxHamming: Int = 3,
      chunks: Int = 4)(implicit spark: SparkSession): DataFrame =
    Dedup.hammingPairsFromSignatures(audioSignatures(media), maxHamming,
      chunks)

  /** Gain-halve every (doc_id, payload) WAV row — the derivative
    * generator for the acoustic near-dup contract. */
  def gainHalvedAudio(media: DataFrame)(implicit spark: SparkSession)
      : DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[ImageRow]
      .mapPartitions(_.map(r => ImageRow(r.doc_id, gainHalvedWav(r.payload))))
      .toDF()
  }

  /** Gain-scaled WAV derivative: decode, halve every sample (arithmetic
    * shift — a real amplitude change, not a byte copy), re-encode in the
    * same container. The fingerprint's energy COMPARISONS are invariant
    * under uniform gain, so the derivative collides with its source. */
  def gainHalvedWav(payload: Array[Byte]): Array[Byte] = {
    val (rate, raw) = wavPcm(payload)
    val out = new Array[Byte](raw.length)
    var i = 0
    while (i < raw.length / 2) {
      val s = ((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xFF)) >> 1
      out(2 * i) = (s & 0xFF).toByte
      out(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    writeWavPcm(rate, out)
  }

  /** Minimal RIFF/WAVE chunk walk → (sample_rate, PCM bytes), for the
    * canonical 16-bit mono LE payloads this module encodes. Exists
    * because `AudioSystem.getAudioInputStream` takes a JVM-global
    * synchronized provider lookup PER CALL — under a 32-thread decode
    * stage that lock serializes the whole executor (measured ~10× on the
    * acoustic near-dup kernel). The metadata op [[decodeAudio]] keeps
    * the javax codec (one call per row is its whole job and format
    * sniffing is the point there); this parser is the per-row hot-path
    * form. */
  private[graft] def wavPcm(payload: Array[Byte]): (Int, Array[Byte]) = {
    require(isWav(payload), "not a RIFF/WAVE payload")
    def le16(o: Int): Int = (payload(o) & 0xFF) | ((payload(o + 1) & 0xFF) << 8)
    def le32(o: Int): Int = le16(o) | (le16(o + 2) << 16)
    var off = 12
    var rate = -1; var bits = -1; var ch = -1
    var data: Array[Byte] = null
    while (off + 8 <= payload.length && (data == null || rate < 0)) {
      val id = new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val sz = le32(off + 4)
      require(sz >= 0, s"corrupt RIFF chunk size $sz at offset $off")
      if (id == "fmt ") {
        ch = le16(off + 10); rate = le32(off + 12); bits = le16(off + 22)
      } else if (id == "data") {
        data = java.util.Arrays.copyOfRange(payload, off + 8,
          math.min(payload.length, off + 8 + sz))
      }
      off += 8 + sz + (sz & 1)
    }
    require(rate > 0 && bits == 16 && ch == 1 && data != null,
      s"expects canonical 16-bit mono LE PCM (rate=$rate bits=$bits ch=$ch)")
    (rate, data)
  }

  /** Canonical 44-byte-header WAVE render of 16-bit mono LE PCM — the
    * write-side pair of [[wavPcm]], byte-layout-identical to what
    * `AudioSystem.write` produces for this format. */
  private[graft] def writeWavPcm(rate: Int, data: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(36 + data.length).put("WAVE".getBytes)
    out.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    out.put("data".getBytes).putInt(data.length).put(data)
    out.array()
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
    * output plugs straight into Ann/Dedup.embeddingNearDups. Needs only
    * (doc_id, payload) — the features are payload-derived, so typed
    * media rows and bare blob rows ride the same kernel. */
  def extractFeatures(media: DataFrame, dims: Int = 16)
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[ImageRow]
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
