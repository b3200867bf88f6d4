package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.{AvroCodec, DbusV2}
import graft.model.VersionedSchemaSet
import graft.sources.ChangeFeed
import graft.sources.relay.DbusV2Log

/** DbusEventV2 envelope fidelity — mirrors TestDbusEventV2 (roundtrip all
  * key types, flags, parts) and DbusEventCorrupter-driven corruption
  * detection (databus-core/.../test/DbusEventCorrupter.java:1). */
class DbusV2Spec extends SparkSpec {
  import DbusV2._

  private val md5 = Array.tabulate[Byte](16)(_.toByte)
  private val payload = "payload-bytes".getBytes("UTF-8")
  private val meta = Array[Byte](9, 8, 7)

  private def sample(opcode: Int = OpUpsert): Event = Event(
    sequence = 12345678L, timestampNs = 1700000000000000000L,
    sourceId = 42, partitionId = 7, opcode = opcode,
    keyLong = Some(987654321L),
    metadata = Some(Part(DigestCrc32, Array[Byte](1, 2, 3, 4), 3, meta)),
    payload = Some(Part(DigestMd5, md5, 2, payload)))

  test("long-key roundtrip preserves every field") {
    val bytes = encode(sample())
    assert(bytes(0) == Version)
    assert(java.nio.ByteBuffer.wrap(bytes).getInt(1) == Magic)
    assert(validate(bytes).isEmpty)
    val e = decode(bytes)
    assert(e.sequence == 12345678L && e.timestampNs == 1700000000000000000L)
    assert(e.sourceId == 42 && e.partitionId == 7 && e.opcode == OpUpsert)
    assert(e.keyLong.contains(987654321L) && e.keyString.isEmpty)
    assert(e.metadata.get.data.toSeq == meta.toSeq)
    assert(e.metadata.get.schemaVersion == 3)
    assert(e.metadata.get.digestType == DigestCrc32)
    assert(e.payload.get.data.toSeq == payload.toSeq)
    assert(e.payload.get.digest.toSeq == md5.toSeq)
    assert(e.payload.get.schemaVersion == 2)
    // fixed header is exactly 45 bytes + 8-byte long key
    assert(java.nio.ByteBuffer.wrap(bytes).getInt(HeaderLenOffset) == 45 + 8)
  }

  test("string-key and schema-key roundtrips") {
    val sk = sample().copy(keyLong = None,
      keyString = Some("member:123".getBytes("UTF-8")))
    val dk = decode(encode(sk))
    assert(dk.keyString.get.toSeq == "member:123".getBytes("UTF-8").toSeq)

    val pk = sample().copy(keyLong = None,
      keyPart = Some(Part(DigestMd5, md5, 1, Array[Byte](5, 6))))
    val dp = decode(encode(pk))
    assert(dp.keyPart.get.data.toSeq == Seq[Byte](5, 6))
  }

  test("an arbitrary nested generic payload rides the wire opaquely and resolves by digest") {
    // the engine never deserializes payloads in the serving path — so ANY
    // registered source's record (here the nested orders_nested shape)
    // must roundtrip bit-exactly through a DbusEventV2 envelope and
    // resolve its writer schema from the digest it carries
    import graft.functions.GenericAvroCodec
    import graft.model.VersionedSchemaSet
    val vs = VersionedSchemaSet.orderWithItemsV1
    val df = spark.range(1).selectExpr(
      """named_struct(
        'o_orderkey', 7L, 'o_urgent', true, 'o_bucket', 3,
        'o_rate', CAST(1.5 AS FLOAT), 'o_totalprice', 99.25D,
        'o_blob', CAST('BB' AS BINARY), 'o_clob', 'clob',
        'o_date_ms', 86400000L,
        'items', array(named_struct('l_linenumber', 1,
          'l_quantity', 2.0D, 'l_returnflag', 'R'))) AS rec""")
    val enc = GenericAvroCodec.encode(vs.schemaJson)
    val payloadBytes = df.select(enc(org.apache.spark.sql.functions.col("rec"))
      .as("p")).head().getAs[Array[Byte]](0)
    val ev = sample().copy(payload = Some(Part(DigestMd5, vs.digest, 1,
      payloadBytes)))
    val back = decode(encode(ev))
    assert(back.payload.get.data.toSeq == payloadBytes.toSeq)
    // digest → schema resolution through the default registry set
    val resolved = VersionedSchemaSet.default
      .getByDigest(back.payload.get.digest)
    assert(resolved.exists(_.sourceName == "orders_nested"))
    // client-side decode of the served bytes reproduces the record
    val dec = GenericAvroCodec.decode(resolved.get.schemaJson)
    val row = spark.createDataset(Seq(back.payload.get.data))(
        org.apache.spark.sql.Encoders.BINARY).toDF("p")
      .select(dec(org.apache.spark.sql.functions.col("p")).as("r"))
      .select("r.o_orderkey", "r.o_clob", "r.items").head()
    assert(row.getLong(0) == 7L && row.getString(1) == "clob")
    assert(row.getSeq[org.apache.spark.sql.Row](2).head.getInt(0) == 1)
  }

  test("delete opcode, flags, and EOW control marker") {
    val del = decode(encode(sample(OpDelete)))
    assert(del.opcode == OpDelete)
    val flagged = decode(encode(sample().copy(replicated = true, trace = true)))
    assert(flagged.replicated && flagged.trace)

    val eow = eowMarker(sequence = 500L, partitionId = 3)
    assert(validate(eow).isEmpty)
    val e = decode(eow)
    assert(e.isControl && e.isEow && e.sequence == 500L && e.partitionId == 3)
    assert(e.opcode == OpControl && e.payload.isEmpty && e.metadata.isEmpty)
  }

  test("corruption toggles are detected and are involutions") {
    def corruptAndRestore(label: String, toggle: Array[Byte] => Unit,
        expectErr: String): Unit = {
      val bytes = encode(sample())
      toggle(bytes)
      assert(validate(bytes).contains(expectErr), s"$label detection")
      toggle(bytes) // involution: toggling twice restores the event
      assert(validate(bytes).isEmpty, s"$label restore")
    }
    corruptAndRestore("HEADERCRC", toggleHeaderCrc(_), "header_crc")
    corruptAndRestore("PAYLOAD", togglePayloadByte(_), "body_crc")
    // the stored bodyCrc and totalLen fields both sit inside the
    // header-CRC-covered region [13, headerLen) — DbusEventV2.java:39 —
    // so corrupting either surfaces as a header CRC mismatch first
    corruptAndRestore("PAYLOADCRC", toggleBodyCrc(_), "header_crc")
    corruptAndRestore("LENGTH", toggleLength(_), "header_crc")
  }

  test("generative: random events re-encode to identical bytes") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genPart: Gen[Part] = for {
      digType <- Gen.oneOf(DigestMd5, DigestCrc32)
      ver <- Gen.choose(0, 1023)
      data <- Gen.choose(0, 64).flatMap(n =>
        Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)))
    } yield Part(digType,
      Array.tabulate[Byte](if (digType == DigestMd5) 16 else 4)(i => (ver + i).toByte),
      ver.toShort, data.toArray)
    val genEvent: Gen[Event] = for {
      seq <- Gen.choose(0L, Long.MaxValue / 2)
      ts <- Gen.choose(0L, Long.MaxValue / 2)
      srcId <- Gen.oneOf(Gen.choose(1, 1000), Gen.const(EowSrcId))
      partId <- Gen.choose(0, 500)
      op <- Gen.oneOf(OpUpsert, OpDelete)
      keyKind <- Gen.choose(0, 2)
      keyL <- Gen.choose(Long.MinValue, Long.MaxValue)
      keyS <- Gen.alphaNumStr
      keyP <- genPart
      metaOpt <- Gen.option(genPart)
      payloadOpt <- Gen.option(genPart)
      repl <- Gen.oneOf(true, false)
      trace <- Gen.oneOf(true, false)
    } yield Event(seq, ts, srcId, partId.toShort, op,
      keyLong = if (keyKind == 0) Some(keyL) else None,
      keyString = if (keyKind == 1) Some(keyS.getBytes("UTF-8")) else None,
      keyPart = if (keyKind == 2) Some(keyP) else None,
      metadata = metaOpt, payload = payloadOpt,
      replicated = repl, trace = trace)
    (0 until 200).foreach { i =>
      val e = genEvent(Gen.Parameters.default, Seed(1000L + i)).get
      val bytes = encode(e)
      assert(validate(bytes).isEmpty, s"trial $i invalid")
      val d = decode(bytes)
      val reenc = encode(d)
      assert(java.util.Arrays.equals(bytes, reenc),
        s"trial $i re-encode differs")
      assert(d.sequence == e.sequence && d.timestampNs == e.timestampNs &&
        d.sourceId == e.sourceId && d.partitionId == e.partitionId)
      assert(d.replicated == e.replicated && d.trace == e.trace)
      // total length recorded in the header equals the byte count
      assert(eventLength(bytes, 0) == bytes.length)
    }
  }

  test("dbusv2 segment log roundtrips the envelope through the wire format") {
    val dir = Files.createTempDirectory("dbusv2log").toString
    val raw = ChangeFeed.raw(spark, sf()).limit(200)
    val schema = VersionedSchemaSet.eventPayloadV1.schemaJson
    val enc = AvroCodec.encodeEventPayload(schema)
    val envelope = ChangeFeed.envelope(raw).withColumn("payload",
      enc(struct(
        col("seq").as("event_id"), col("key_long").as("user_id"),
        ChangeFeed.registry.nameCol(col("source_id")).as("event_type"),
        col("value"), col("props"))))
    DbusV2Log.write(envelope, dir, numSegments = 4)

    // segment names carry the scn band; EOW markers are present on disk
    val segs = graft.sources.relay.RelayBinaryLog.listSegments(dir)
    assert(segs.nonEmpty && segs.forall(_.path.endsWith(".dbusv2")))

    val back = DbusV2Log.read(spark, dir)
    val want = envelope.select("scn", "seq", "ts_us", "source_id",
      "partition_id", "opcode", "key_long", "value")
    val got = back.select("scn", "seq", "ts_us", "source_id",
      "partition_id", "opcode", "key_long", "value")
    assert(got.count() == 200)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("mixed-SOURCE segment log: per-event schema_id rides the payload part") {
    import graft.functions.GenericAvroCodec
    val dir = Files.createTempDirectory("dbusv2mixedsrc").toString
    val vsEv = VersionedSchemaSet.eventPayloadV1
    val vsOrd = VersionedSchemaSet.orderWithItemsV1
    val encEv = AvroCodec.encodeEventPayload(vsEv.schemaJson)
    val encOrd = GenericAvroCodec.encode(vsOrd.schemaJson)
    val raw = ChangeFeed.raw(spark, sf()).limit(100)
    // even seq = events payload, odd seq = nested orders payload — each
    // row stamps its own writer-schema digest
    val envelope = ChangeFeed.envelope(raw)
      .withColumn("payload",
        when(col("seq") % 2 === 0, encEv(struct(
          col("seq").as("event_id"), col("key_long").as("user_id"),
          ChangeFeed.registry.nameCol(col("source_id")).as("event_type"),
          col("value"), col("props"))))
        .otherwise(encOrd(struct(
          col("seq").as("o_orderkey"),
          (col("value") > 50.0).as("o_urgent"),
          col("source_id").as("o_bucket"),
          col("value").cast("float").as("o_rate"),
          col("value").as("o_totalprice"),
          col("props").cast("binary").as("o_blob"),
          col("props").as("o_clob"),
          col("ts_us").as("o_date_ms"),
          array().cast("array<struct<l_linenumber:int,l_quantity:double,l_returnflag:string>>")
            .as("items")))))
      .withColumn("schema_id",
        when(col("seq") % 2 === 0, lit(vsEv.digest)).otherwise(lit(vsOrd.digest)))
    DbusV2Log.write(envelope, dir, numSegments = 2)

    // every wire event carries ITS OWN digest; both resolve from the
    // default registry and the nested payloads client-decode intact
    val segs = graft.sources.relay.RelayBinaryLog.listSegments(dir)
    def walk(path: String): Seq[Event] = {
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path))
      val out = scala.collection.mutable.ArrayBuffer.empty[Event]
      var off = 0
      while (off < bytes.length) {
        out += decode(bytes, off)
        off += eventLength(bytes, off)
      }
      out.toSeq
    }
    val events = segs.flatMap(s => walk(s.path))
      .filter(_.sourceId != EowSrcId)
    assert(events.nonEmpty)
    // every wire event's digest resolves; per-event seq lives in the
    // metadata part (sequence carries the window scn), so assert each
    // event against ITS seq rather than scn parity
    events.foreach { e =>
      val seq = java.nio.ByteBuffer.wrap(e.metadata.get.data).getLong(0)
      val resolved = VersionedSchemaSet.default
        .getByDigest(e.payload.get.digest)
      assert(resolved.isDefined)
      val expect = if (seq % 2 == 0) "events" else "orders_nested"
      assert(resolved.get.sourceName == expect)
    }
    val names = events.map(e => VersionedSchemaSet.default
      .getByDigest(e.payload.get.digest).get.sourceName).toSet
    assert(names == Set("events", "orders_nested"))
    // client decode of one nested payload through its resolved schema
    val ordEv = events.find(e => VersionedSchemaSet.default
      .getByDigest(e.payload.get.digest).get.sourceName == "orders_nested").get
    val rec = AvroCodec.deserialize(ordEv.payload.get.data,
      vsOrd.schema, vsOrd.schema)
    assert(rec.get("o_orderkey") != null)
  }

  test("graft-relay DataSource serves .dbusv2 segments with band pruning") {
    val dir = Files.createTempDirectory("dbusv2src").toString
    val raw = ChangeFeed.raw(spark, sf()).limit(300)
    val schema = VersionedSchemaSet.eventPayloadV1.schemaJson
    val enc = AvroCodec.encodeEventPayload(schema)
    val envelope = ChangeFeed.envelope(raw).withColumn("payload",
      enc(struct(
        col("seq").as("event_id"), col("key_long").as("user_id"),
        ChangeFeed.registry.nameCol(col("source_id")).as("event_type"),
        col("value"), col("props"))))
    DbusV2Log.write(envelope, dir, numSegments = 4)

    val df = spark.read.format("graft-relay").option("path", dir).load()
    assert(df.count() == 300)
    val banded = df.where(col("scn") > 100 && col("scn") <= 200)
    val want = envelope.where(col("scn") > 100 && col("scn") <= 200).count()
    assert(banded.count() == want)
  }

  test("column pruning reaches the wire reader (payload decode skipped)") {
    val dir = Files.createTempDirectory("dbusv2prune").toString
    val raw = ChangeFeed.raw(spark, sf()).limit(200)
    val schema = VersionedSchemaSet.eventPayloadV1.schemaJson
    val enc = AvroCodec.encodeEventPayload(schema)
    val envelope = ChangeFeed.envelope(raw).withColumn("payload",
      enc(struct(
        col("seq").as("event_id"), col("key_long").as("user_id"),
        ChangeFeed.registry.nameCol(col("source_id")).as("event_type"),
        col("value"), col("props"))))
    graft.sources.relay.DbusV2Log.write(envelope, dir, numSegments = 2)

    val df = spark.read.format("graft-relay").option("path", dir).load()
    val slim = df.select("scn", "key_long", "source_id")
    // the scan's read schema is the pruned projection, not all 9 columns
    val scanDesc = slim.queryExecution.executedPlan.toString
    assert(scanDesc.contains("ReadSchema=scn,key_long,source_id") ||
      !scanDesc.contains("props"), s"pruning not visible in:\n$scanDesc")
    // and the values are correct without touching the payload
    import org.apache.spark.sql.functions.sum
    val got = slim.agg(sum("key_long")).head().getLong(0)
    val want = envelope.agg(sum("key_long")).head().getLong(0)
    assert(got == want)
    assert(slim.count() == 200)
  }

  test("corrupt byte inside a segment fails the read (CRC contract)") {
    val dir = Files.createTempDirectory("dbusv2corrupt").toString
    val raw = ChangeFeed.raw(spark, sf()).limit(50)
    val schema = VersionedSchemaSet.eventPayloadV1.schemaJson
    val enc = AvroCodec.encodeEventPayload(schema)
    val envelope = ChangeFeed.envelope(raw).withColumn("payload",
      enc(struct(
        col("seq").as("event_id"), col("key_long").as("user_id"),
        ChangeFeed.registry.nameCol(col("source_id")).as("event_type"),
        col("value"), col("props"))))
    DbusV2Log.write(envelope, dir, numSegments = 1)
    val seg = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".dbusv2")).head
    // flip one payload byte mid-file
    val bytes = Files.readAllBytes(seg.toPath)
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x55).toByte
    Files.write(seg.toPath, bytes)
    val ex = intercept[Exception] {
      DbusV2Log.readSegment(seg.getAbsolutePath).length
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(m =>
      m.contains("corrupt") || m.contains("crc") || m.contains("magic")))
  }
}
