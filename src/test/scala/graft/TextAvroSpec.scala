package graft

import graft.functions.{AvroCodec, TextFunctions => TF}
import graft.model.VersionedSchemaSet
import graft.pipeline.Multimodal

import org.apache.spark.sql.functions._

class TextAvroSpec extends SparkSpec {
  import spark.implicits._

  test("token counts and occurrences") {
    val df = Seq("the quick brown fox", "a a a", "one").toDF("text")
    val got = df.select(
      TF.tokenCount($"text").as("n"),
      TF.occurrences($"text", "a").as("a_cnt"))
      .as[(Int, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(4, 3, 1))
    assert(got(1)._2 == 3)
  }

  test("repetition signals: duplicate-token and top-bigram fractions") {
    val df = Seq(
      "a b c d",        // all unique: dup 0, every bigram unique → 1/3
      "a a a a",        // dup 3/4, bigram "a a" ×3 of 3 → 1.0
      "x y x y x",      // dup 3/5; "x y" ×2 of 4 → 0.5
      "solo").toDF("text")
    val got = df.select(
      TF.duplicateTokenFraction($"text").as("d"),
      TF.topBigramFraction($"text").as("b"))
      .as[(Double, Double)].collect().toSeq
    assert(got(0) == ((0.0, 1.0 / 3)))
    assert(got(1) == ((0.75, 1.0)))
    assert(got(2) == ((0.6, 0.5)))
    assert(got(3) == ((0.0, 0.0)))
  }

  test("langId picks the language with most marker hits") {
    val df = Seq(
      "the cat and the dog of a house",
      "der hund und die katze und das haus",
      "le chat et la maison les arbres",
      "nothing matching here xyz").toDF("text")
    val got = df.select(TF.langId($"text")).as[String].collect().toSeq
    assert(got == Seq("en", "de", "fr", "und"))
  }

  test("quality score is in [0,1] and rewards longer stopword-rich text") {
    val df = Seq(
      ("short", "xy"),
      ("good", ("the data and " * 30).trim)).toDF("k", "text")
    val m = df.select($"k", TF.qualityScore($"text").as("q"))
      .as[(String, Double)].collect().toMap
    assert(m.values.forall(q => q >= 0.0 && q <= 1.0))
    assert(m("good") > m("short"))
  }

  test("PII scrub redacts emails/phones/IPs and counts them") {
    val df = Seq(
      ("mail a.b+c@sub.example.org mid x@y.io end", 2, 0, 0),
      ("ping 192.168.0.1 and 10.0.0.255 done", 0, 0, 2),
      ("call +1 (555) 123-4567 or +44 (020) 555-1234", 0, 2, 0),
      ("clean text with no identifiers at all", 0, 0, 0))
      .toDF("text", "e", "p", "i")
    val c = TF.piiCounts(col("text"))
    val got = df.select(TF.scrubPii(col("text")).as("s"),
      c.getField("n_emails").as("ne"), c.getField("n_phones").as("np"),
      c.getField("n_ips").as("ni"), col("e"), col("p"), col("i")).collect()
    got.foreach { r =>
      assert(r.getInt(1) == r.getInt(4) && r.getInt(2) == r.getInt(5) &&
        r.getInt(3) == r.getInt(6), r.toString)
    }
    assert(got(0).getString(0) == "mail <EMAIL> mid <EMAIL> end")
    assert(got(1).getString(0) == "ping <IP> and <IP> done")
    assert(got(2).getString(0) == "call <PHONE> or <PHONE>")
    assert(got(3).getString(0) == "clean text with no identifiers at all")
  }

  test("URL extraction and domain normalization") {
    val df = Seq(
      "a https://WWW.Example.com/Path/x b http://sub.site.net c",
      "bare text, no links").toDF("text")
    val got = df.select(TF.extractUrls(col("text")).as("u")).collect()
    assert(got(0).getSeq[String](0) ==
      Seq("https://WWW.Example.com/Path/x", "http://sub.site.net"))
    assert(got(1).getSeq[String](0).isEmpty)
    val doms = df.select(explode(TF.extractUrls(col("text"))).as("u"))
      .select(TF.domainOf(col("u"))).collect().map(_.getString(0)).toSeq
    assert(doms == Seq("example.com", "sub.site.net"))
  }

  test("fingerprints are deterministic and content-addressed") {
    val df = Seq("same text", "same text", "other").toDF("text")
    val fps = df.select(TF.fingerprintHex($"text")).as[String].collect().toSeq
    assert(fps(0) == fps(1) && fps(0) != fps(2))
    assert(fps.forall(_.length == 32))
  }

  test("avro payload encode/decode roundtrip (registry schema)") {
    val schema = VersionedSchemaSet.eventPayloadV1.schemaJson
    val df = Seq((1L, 10L, "click", 1.5, """{"k":1}"""), (2L, 20L, "view", 2.5, null))
      .toDF("event_id", "user_id", "event_type", "value", "props")
    val enc = AvroCodec.encodeEventPayload(schema)
    val dec = AvroCodec.decodeEventPayload(schema)
    val back = df
      .withColumn("payload", enc(struct($"event_id", $"user_id", $"event_type", $"value", $"props")))
      .withColumn("rec", dec($"payload"))
      .select($"rec.event_id", $"rec.event_type", $"rec.value", $"rec.props")
      .as[(Option[Long], Option[String], Option[Double], Option[String])]
      .collect().toSeq
    assert(back(0) == ((Some(1L), Some("click"), Some(1.5), Some("""{"k":1}"""))))
    assert(back(1) == ((Some(2L), Some("view"), Some(2.5), None)))
  }

  test("multimodal decode: fake image/audio headers + real Y4M video") {
    implicit val s = spark
    val media = Multimodal.attachFakeMedia(Seq(0L, 1L, 2L, 5L).toDF("doc_id"))
    val decoded = Multimodal.decodeMeta(media).collect().map(r => r.doc_id -> r).toMap
    assert(decoded(0L).media_type == "image" && decoded(0L).width == 16 &&
      decoded(0L).n_frames == 1)
    assert(decoded(1L).media_type == "audio" && decoded(1L).sample_rate == 16014)
    // video rows are REAL YUV4MPEG2 containers: dims and frame count
    // come from realVideoMeta walking the actual FRAME markers
    assert(decoded(2L).media_type == "video" && decoded(2L).n_frames == 27 &&
      decoded(2L).width == 18 && decoded(2L).height == 30)
    // doc 5: w=21, h=51, f=6 → 38-byte header + 6×('FRAME\n' + 21·51)
    assert(decoded(5L).n_bytes == 38L + 6 * (6 + 21 * 51))
    val raw = media.where($"doc_id" === 5L).collect().head
      .getAs[Array[Byte]]("payload")
    assert(new String(raw.take(10), "US-ASCII") == "YUV4MPEG2 ")
    assert(Multimodal.realVideoMeta(raw) == ((21, 51, 6)))
    // a truncated container fails like a codec, not silently
    intercept[Exception] {
      Multimodal.realVideoMeta(raw.take(raw.length - 1))
    }
    // and so does a corrupt frame marker
    val bad = raw.clone(); bad(40) = 'Q'.toByte
    intercept[Exception] { Multimodal.realVideoMeta(bad) }
  }

  test("realVideoMeta parses all four Y4M colorspaces and frame params") {
    def y4m(header: String, frames: Seq[(String, Int)]): Array[Byte] = {
      val sb = new StringBuilder(header).append('\n')
      frames.foreach { case (params, planeBytes) =>
        sb.append("FRAME").append(params).append('\n')
        sb.append("x" * planeBytes)
      }
      sb.toString.getBytes("US-ASCII")
    }
    // default colorspace per the spec is 420 when no C tag is present
    assert(Multimodal.realVideoMeta(
      y4m("YUV4MPEG2 W4 H2 F25:1", Seq(("", 12), ("", 12)))) == ((4, 2, 2)))
    assert(Multimodal.realVideoMeta(
      y4m("YUV4MPEG2 W4 H2 C420jpeg", Seq(("", 12)))) == ((4, 2, 1)))
    assert(Multimodal.realVideoMeta(
      y4m("YUV4MPEG2 W3 H3 C444", Seq(("", 27)))) == ((3, 3, 1)))
    assert(Multimodal.realVideoMeta(
      y4m("YUV4MPEG2 W4 H2 C422", Seq(("", 16)))) == ((4, 2, 1)))
    // per-frame parameters between FRAME and the newline are legal
    assert(Multimodal.realVideoMeta(
      y4m("YUV4MPEG2 W2 H2 Cmono", Seq((" Xparam", 4), ("", 4)))) == ((2, 2, 2)))
    // wrong plane size for the declared colorspace fails loudly
    intercept[Exception] {
      Multimodal.realVideoMeta(y4m("YUV4MPEG2 W4 H2 C444", Seq(("", 12))))
    }
    // unknown colorspace fails loudly rather than guessing a size
    intercept[Exception] {
      Multimodal.realVideoMeta(y4m("YUV4MPEG2 W4 H2 C999", Seq(("", 12))))
    }
    // missing dims fail
    intercept[Exception] {
      Multimodal.realVideoMeta(y4m("YUV4MPEG2 W4", Seq(("", 4))))
    }
    // hostile dims that would overflow Int plane math are rejected up
    // front (not wrapped into a backwards FRAME walk)
    intercept[Exception] {
      Multimodal.realVideoMeta(
        y4m("YUV4MPEG2 W65536 H65536 C444", Seq(("", 4))))
    }
    // unparseable dims fail with the codec-style message, not a raw
    // NumberFormatException from substring math
    val e = intercept[IllegalArgumentException] {
      Multimodal.realVideoMeta(y4m("YUV4MPEG2 Wx H2", Seq(("", 4))))
    }
    assert(e.getMessage.contains("unparseable dim"))
    // odd dims under chroma-subsampled colorspaces have no exact plane
    // size — rejected, never silently truncated
    intercept[Exception] {
      Multimodal.realVideoMeta(y4m("YUV4MPEG2 W3 H2 C420", Seq(("", 9))))
    }
    intercept[Exception] {
      Multimodal.realVideoMeta(y4m("YUV4MPEG2 W4 H3 C420", Seq(("", 18))))
    }
    intercept[Exception] {
      Multimodal.realVideoMeta(y4m("YUV4MPEG2 W3 H2 C422", Seq(("", 12))))
    }
    // odd HEIGHT is legal for 422 (chroma subsamples width only)
    assert(Multimodal.realVideoMeta(
      y4m("YUV4MPEG2 W4 H3 C422", Seq(("", 24)))) == ((4, 3, 1)))
  }

  test("real image encode → javax.imageio decode roundtrips dims/format") {
    implicit val s = spark
    val meta = Multimodal.decodeImages(
      Multimodal.attachRealImages(Seq(0L, 1L, 2L, 63L, 100L).toDF("doc_id")))
      .as[(Long, String, Int, Int, Int)].collect().map(r => r._1 -> r).toMap
    // dims derive from id; fmt alternates png/jpeg by parity; 3 channels
    assert(meta(0L) == ((0L, "png", 16, 16, 3)))
    assert(meta(1L) == ((1L, "jpeg", 17, 23, 3)))
    assert(meta(2L) == ((2L, "png", 18, 30, 3)))
    assert(meta(63L) == ((63L, "jpeg", 79, 73, 3)))
    assert(meta(100L) == ((100L, "png", 52, 76, 3)))
    // the payloads are genuine containers: magic bytes are PNG / JFIF
    val raw = Multimodal.attachRealImages(Seq(4L, 5L).toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    assert(raw(4L).take(4).sameElements(Array(0x89, 'P', 'N', 'G').map(_.toByte)))
    assert((raw(5L)(0) & 0xFF) == 0xFF && (raw(5L)(1) & 0xFF) == 0xD8)
    // decodeMeta's sniffing kernel routes real image bytes too
    val viaMeta = Multimodal.decodeMeta(
      Multimodal.attachRealImages(Seq(7L).toDF("doc_id"))
        .withColumn("media_type", lit("image"))).collect().head
    assert(viaMeta.width == 23 && viaMeta.height == 65 && viaMeta.n_frames == 1)
    // corrupt bytes fail like a codec, not silently
    intercept[Exception] {
      Multimodal.decode("image", Array[Byte](0xFF.toByte, 0xD8.toByte,
        0xFF.toByte, 1, 2, 3))
    }
  }

  test("real WAV encode → javax.sound decode roundtrips rate/frames") {
    implicit val s = spark
    val meta = Multimodal.decodeAudio(
      Multimodal.attachRealAudio(Seq(0L, 5L, 23L).toDF("doc_id")))
      .as[(Long, Int, Long, Int, Long)].collect().map(r => r._1 -> r).toMap
    assert(meta(0L) == ((0L, 8000, 50L, 1, 44 + 100L)))
    assert(meta(5L) == ((5L, 13000, 115L, 1, 44 + 230L)))
    assert(meta(23L) == ((23L, 15000, 349L, 1, 44 + 698L)))
    // the sniffing kernel routes real WAV bytes to the RIFF parse
    val viaMeta = Multimodal.decodeMeta(
      Multimodal.attachRealAudio(Seq(5L).toDF("doc_id"))
        .withColumn("media_type", lit("audio"))).collect().head
    assert(viaMeta.sample_rate == 13000 && viaMeta.n_frames == 115)
    // truncated RIFF fails like a codec, not silently
    intercept[Exception] {
      Multimodal.realAudioMeta("RIFF    WAVE".getBytes)
    }
  }

  test("real resize materializes the plan's exact dims; small images pass through") {
    implicit val s = spark
    // id 63 → 79×73 (needs resize to 48×44); id 0 → 16×16 (passes through)
    val media = Multimodal.attachRealImages(Seq(63L, 0L).toDF("doc_id"))
    val out = Multimodal.decodeImages(Multimodal.resizeImages(media, maxDim = 48))
      .as[(Long, String, Int, Int, Int)].collect().map(r => r._1 -> r).toMap
    assert(out(63L) == ((63L, "jpeg", 48, 73 * 48 / 79, 3))) // 48×44
    assert(out(0L) == ((0L, "png", 16, 16, 3)))
    // pass-through is byte-identical (no decode/re-encode generation loss)
    val before = media.where($"doc_id" === 0L).collect().head
      .getAs[Array[Byte]]("payload")
    val after = Multimodal.resizeImages(
        media.where($"doc_id" === 0L), maxDim = 48)
      .collect().head.getAs[Array[Byte]]("payload")
    assert(before.sameElements(after))
  }

  test("frame sample plan strides over video frames only") {
    implicit val s = spark
    val media = Multimodal.attachFakeMedia(Seq(2L, 0L).toDF("doc_id"))
    val plan = Multimodal.frameSamplePlan(
      Multimodal.decodeMeta(media).toDF(), stride = 10)
    // doc 2 is video with 27 frames → frames 0,10,20; doc 0 is image
    assert(plan.select("frame_idx").as[Int].collect().toSet == Set(0, 10, 20))
  }

  test("multimodal feature extraction feeds the embedding dedup pipeline") {
    implicit val s = spark
    val ids = (0L until 40L).toDF("doc_id")
    val media = Multimodal.attachFakeMedia(ids)
    // plant exact duplicates: same payloads under shifted ids
    val dup = Multimodal.attachFakeMedia(
      ids.select(($"doc_id" + 1000L).as("orig")).select(($"orig" - 1000L).as("doc_id")))
      .select(($"doc_id" + 1000L).as("doc_id"), $"media_type", $"payload")
    val feats = Multimodal.extractFeatures(media.unionByName(dup), dims = 16)
    assert(feats.count() == 80)
    val pairs = graft.pipeline.Dedup.embeddingNearDups(
      feats, vecCol = "embedding", idCol = "doc_id",
      numPlanes = 8, cosineThreshold = 0.999)
    // every planted twin (i, i+1000) must surface with cosine ≈ 1
    val found = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0L until 40L).foreach(i => assert(found.contains((i, i + 1000L))))
  }

  test("resize plan preserves aspect and never upscales") {
    implicit val s = spark
    val media = Multimodal.attachFakeMedia((0L until 60L).toDF("doc_id"))
    val plan = Multimodal.resizePlan(
      Multimodal.decodeMeta(media).toDF(), maxDim = 48)
    val rows = plan.as[(Long, String, Int, Int, Int, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, w, h, nw, nh) =>
      assert(nw <= 48 || w <= math.max(w, h) && math.max(nw, nh) <= math.max(w, h))
      assert(math.max(nw, nh) <= math.max(48, math.min(w, h)))
      assert(nw <= w && nh <= h) // never upscale
    }
  }
}
