package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Multimodal, Packing}

/** Perceptual near-dup (image dHash, audio energy fingerprint), the
  * generalized hamming blocking behind them, and exact-BPE packing. */
class PerceptualSpec extends SparkSpec {
  import spark.implicits._
  implicit val s: org.apache.spark.sql.SparkSession = spark

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("imageDHash: bilinear-resized derivatives stay within radius 7") {
    (0L until 200L).foreach { id =>
      val p = Multimodal.encodeSmoothImage(id)
      val h = ham(Multimodal.imageDHash(p),
        Multimodal.imageDHash(Multimodal.resizeImage(p, 48)))
      assert(h <= 7, s"id=$id resample moved dHash $h bits")
    }
  }

  test("imageDHash: area-weighted means are raster-size independent " +
      "(hash survives a lossless 2x upscale)") {
    // nearest-neighbor 2x upscale preserves every cell's true mean
    // exactly, so the hash must be identical — this is what fractional-
    // area weighting buys over floor-assigning pixels to cells
    (0L until 20L).foreach { id =>
      val p = Multimodal.encodeSmoothImage(id * 31 + 7)
      val (_, img) = {
        val in = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(p))
        val r = javax.imageio.ImageIO.getImageReaders(in).next()
        r.setInput(in); ("x", r.read(0))
      }
      val up = new java.awt.image.BufferedImage(img.getWidth * 2,
        img.getHeight * 2, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until up.getHeight; x <- 0 until up.getWidth)
        up.setRGB(x, y, img.getRGB(x / 2, y / 2))
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(up, "png", baos)
      assert(Multimodal.imageDHash(p) ===
        Multimodal.imageDHash(baos.toByteArray))
    }
  }

  test("imageNearDups recovers every planted resized derivative") {
    val ids = (0L until 60L).toDF("doc_id")
    val orig = Multimodal.attachSmoothImages(ids)
    val deriv = Multimodal.resizeImages(orig, maxDim = 48)
      .select((col("doc_id") + 1000L).as("doc_id"), col("payload"))
    val pairs = Multimodal.imageNearDups(orig.unionByName(deriv))
      .where(col("id_b") === col("id_a") + 1000L)
      .select("id_a").as[Long].collect().toSet
    assert(pairs === (0L until 60L).toSet)
  }

  test("audioFingerprint: gain-halving flips at most one bit; " +
      "unrelated clips stay far") {
    val sigs = (0L until 150L).map { id =>
      val p = Multimodal.encodeWav(id)
      val f = Multimodal.audioFingerprint(p)
      assert(ham(f, Multimodal.audioFingerprint(Multimodal.gainHalvedWav(p)))
        <= 1, s"id=$id gain change moved the fingerprint")
      f
    }
    for (i <- sigs.indices; j <- (i + 1) until sigs.length)
      assert(ham(sigs(i), sigs(j)) > 3, s"clips $i/$j collide")
  }

  test("audioNearDups output is exactly the planted gain-halved pairs") {
    val ids = (0L until 80L).toDF("doc_id")
    val orig = Multimodal.attachRealAudio(ids)
    val deriv = Multimodal.gainHalvedAudio(orig)
      .select((col("doc_id") + 1000L).as("doc_id"), col("payload"))
    val pairs = Multimodal.audioNearDups(orig.unionByName(deriv))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === (0L until 80L).map(i => (i, i + 1000L)).toSet)
  }

  test("hammingPairsFromSignatures: 8-chunk blocking finds a radius-7 " +
      "pair that defeats every 16-bit chunk") {
    // 7 flipped bits, one in each of the 8-bit chunks 0..6: all four
    // 16-bit chunks differ (each covers two 8-bit chunks, at least one
    // dirty), but 8-bit chunk 7 still matches — only chunks=8 blocking
    // can recall this pair, which is why the perceptual radius needs it
    val dirty = (0 until 7).map(c => 1L << (c * 8)).reduce(_ | _)
    val sigs = Seq((1L, 0L), (2L, dirty)).toDF("id", "sig")
    val found = Dedup.hammingPairsFromSignatures(sigs, maxHamming = 7,
      chunks = 8).select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect()
    assert(found.toSeq === Seq((1L, 2L, 7)))
    // and the pigeonhole guard refuses a radius its chunk count can't
    // serve exactly
    intercept[IllegalArgumentException] {
      Dedup.hammingPairsFromSignatures(sigs, maxHamming = 7, chunks = 4)
    }
    intercept[IllegalArgumentException] {
      Dedup.hammingPairsFromSignatures(sigs, maxHamming = 3, chunks = 7)
    }
  }

  test("incrementalHammingPairs == full pairs restricted to touching-new") {
    def mix(seed: Long): Long = {
      var z = seed + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    // stored corpus 0..79; new batch = 80..99 (fresh) plus 100..119
    // (signatures 2 bits away from stored ids 0..19 — planted near-dups
    // that must surface through the store join)
    val stored = (0L until 80L).map(i => (i, mix(i)))
    val fresh = (80L until 100L).map(i => (i, mix(i))) ++
      (0L until 20L).map(i => (i + 100L, mix(i) ^ 5L))
    val sStored = stored.toDF("id", "sig")
    val sNew = fresh.toDF("id", "sig")
    val full = Dedup.hammingPairsFromSignatures(
      sStored.unionByName(sNew), maxHamming = 7, chunks = 8)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    val newIds = fresh.map(_._1).toSet
    val incr = Dedup.incrementalHammingPairs(sNew, sStored,
      maxHamming = 7, chunks = 8)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(incr === full.filter(p => newIds(p._1) || newIds(p._2)))
    assert(incr.exists(p => p._1 < 20L && p._2 == p._1 + 100L && p._3 == 2),
      "planted store-adjacent pairs missing")
  }

  test("image store protocol decodes only the increments (O(batch))") {
    val root = java.nio.file.Files.createTempDirectory("imgstore").toString
    val ids = (0L until 60L).toDF("doc_id")
    val media = Multimodal.attachSmoothImages(ids)
    // onboard: corpus signatures into the store — the one-time decode
    Multimodal.imageSignatures(media).write.parquet(s"$root/sigs")
    val acc = Multimodal.decodedBlobsAccumulator(spark)
    val before = acc.value
    // two 30-blob increments of resized derivatives, each decoded once,
    // joined against the STORE (never the corpus blobs)
    val found = scala.collection.mutable.Set.empty[Long]
    Seq(0L, 30L).foreach { lo =>
      val batch = Multimodal.resizeImages(
        Multimodal.attachSmoothImages(
          ids.where(col("doc_id") >= lo && col("doc_id") < lo + 30)),
        maxDim = 48)
        .select((col("doc_id") + 1000L).as("doc_id"), col("payload"))
        .localCheckpoint(true)
      val sigsNew = Multimodal.imageSignatures(batch)
      found ++= Dedup.incrementalHammingPairs(sigsNew,
          spark.read.parquet(s"$root/sigs"), maxHamming = 7, chunks = 8)
        .where(col("id_b") === col("id_a") + 1000L)
        .select("id_a").as[Long].collect()
      sigsNew.write.mode("append").parquet(s"$root/sigs")
    }
    assert(found === (0L until 60L).toSet)
    // ONLY the two 30-blob increments went through the decode kernel —
    // the stored corpus was never re-decoded
    assert(acc.value - before === 60L)
  }

  test("packChunks with a BPE counter packs on exact token counts") {
    import graft.functions.Bpe
    // "ab" fuses to 1 token under the merges table; whitespace counting
    // would call it 1 word too — so use "a b"-vs-merge divergence:
    // text "ab ab" = BPE 3 (ab, space, ab) vs whitespace 2
    val model = Bpe.Model(Seq(("a", "b"), ("ab", Bpe.EndOfWord)))
    val docs = Seq((0L, "g", "ab ab"), (1L, "g", "ab ab ab"))
      .toDF("doc_id", "lang", "text")
    val packed = Packing.packChunks(docs, budgetTokens = 4,
      tokenCounter = Bpe.tokenCount(model))
      .select("doc_id", "n_tokens", "tok_offset", "chunk_id")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // doc 0: 3 tokens at offset 0 (chunk 0); doc 1: 5 tokens at offset 3
    // (chunk 0 — straddles into 1 but is tagged where it starts)
    assert(packed.toSeq === Seq((0L, 3L, 0L, 0L), (1L, 5L, 3L, 0L)))
  }
}
