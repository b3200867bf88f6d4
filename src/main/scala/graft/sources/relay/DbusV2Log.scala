package graft.sources.relay

import java.io.{BufferedInputStream, DataInputStream, EOFException, FileInputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.functions.{AvroCodec, DbusV2}
import graft.model.VersionedSchemaSet

/** Wire-format segment log: files of concatenated [[DbusV2]] envelopes —
  * the reference's exact DbusEventV2 serialization (DbusEventV2.java:33-72)
  * as the relay's on-disk format, EOW control marker terminating each
  * transaction window (DbusEvent.java:79). Segment names carry the scn
  * band (`seg-<minScn>-<maxScn>-<uuid>.dbusv2`) exactly like the engine's
  * `.dbus` segments, so the graft-relay DataSource prunes them by offset
  * band before opening (ScnIndex-at-the-listing, ScnIndex.java:623).
  *
  * Events store: sequence = window scn; per-event seq rides the metadata
  * part (8 bytes big-endian — the reference's metadata DbusEventPart is
  * the engine-metadata carrier, DbusEventPart.java:41); payload part =
  * Avro-binary with the writer-schema MD5 digest, resolved back through
  * the [[VersionedSchemaSet]] on read (DbusEventAvroDecoder's
  * schema-by-digest contract). */
object DbusV2Log {

  /** Write an envelope frame (scn, seq, ts_us, source_id, partition_id,
    * opcode, key_long, payload:binary [, key_string, meta]) into `.dbusv2`
    * segments under `dir`. Distributed: range-partitioned on scn (whole
    * windows per segment), EOW marker after every window.
    *
    * Key kind per event mirrors DbusEventKey (DbusEventKey.java:30-35): a
    * non-null `key_string` writes a STRING-keyed envelope (UTF-8 bytes);
    * otherwise `key_long` writes a LONG key. The metadata part's data is
    * `seq(8 BE) ++ meta` — the engine's per-event position always rides
    * first, any user metadata follows (DbusEventPart is an opaque
    * schema-versioned carrier, DbusEventPart.java:41).
    *
    * An optional `schema_id` (16-byte MD5) column sets each event's
    * payload-part digest — a mixed-SOURCE log carries every payload with
    * its own writer schema (the per-event digest contract,
    * DbusEventAvroDecoder.getGenericRecord); rows without one default to
    * the fixture `events` schema. */
  def write(envelope: DataFrame, dir: String, numSegments: Int = 8): Unit = {
    import envelope.sparkSession.implicits._
    new java.io.File(dir).mkdirs()
    def opt(name: String, typ: String) =
      if (envelope.columns.contains(name)) col(name).cast(typ)
      else org.apache.spark.sql.functions.lit(null).cast(typ)
    envelope.select(col("scn"), col("seq"), col("ts_us"), col("source_id"),
        col("partition_id").cast("int"), col("opcode"), col("key_long"),
        col("payload"), opt("key_string", "string"), opt("meta", "binary"),
        opt("key_schema", "binary"), opt("schema_id", "binary"))
      .as[(Long, Long, Long, Int, Int, String, Long, Array[Byte], String, Array[Byte], Array[Byte], Array[Byte])]
      .repartitionByRange(numSegments, col("scn"))
      .sortWithinPartitions("scn", "seq")
      .foreachPartition {
          (it: Iterator[(Long, Long, Long, Int, Int, String, Long, Array[Byte], String, Array[Byte], Array[Byte], Array[Byte])]) =>
        if (it.hasNext) {
          val tmp = java.io.File.createTempFile("seg", ".tmp",
            new java.io.File(dir))
          val out = new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(tmp), 1 << 16)
          val digest = VersionedSchemaSet.eventPayloadV1.digest
          var minScn = Long.MaxValue
          var maxScn = Long.MinValue
          var openScn = Long.MinValue
          var lastPart = 0
          it.foreach { case (scn, seq, tsUs, srcId, partId, op, key, payload, keyStr, userMeta, keySchema, schemaId) =>
            if (openScn != Long.MinValue && scn != openScn)
              out.write(DbusV2.eowMarker(openScn, lastPart.toShort))
            openScn = scn; lastPart = partId
            minScn = math.min(minScn, scn); maxScn = math.max(maxScn, scn)
            val metaLen = 8 + (if (userMeta == null) 0 else userMeta.length)
            val metaBuf = java.nio.ByteBuffer.allocate(metaLen).putLong(seq)
            if (userMeta != null) metaBuf.put(userMeta)
            val meta = metaBuf.array()
            out.write(DbusV2.encode(DbusV2.Event(
              sequence = scn, timestampNs = tsUs * 1000L, sourceId = srcId,
              partitionId = partId.toShort,
              opcode = if (op == "DELETE") DbusV2.OpDelete else DbusV2.OpUpsert,
              keyLong = if (keyStr == null && keySchema == null) Some(key)
                else None,
              keyString = Option(keyStr).map(_.getBytes("UTF-8")),
              keyPart = Option(keySchema).map(k =>
                DbusV2.Part(DbusV2.DigestCrc32, new Array[Byte](4), 1, k)),
              metadata = Some(DbusV2.Part(DbusV2.DigestCrc32,
                new Array[Byte](4), 1, meta)),
              payload = Some(DbusV2.Part(DbusV2.DigestMd5,
                if (schemaId != null) schemaId else digest, 1,
                payload)))))
          }
          if (openScn != Long.MinValue)
            out.write(DbusV2.eowMarker(openScn, lastPart.toShort))
          out.close()
          val name = s"seg-$minScn-$maxScn-${java.util.UUID.randomUUID.toString
            .replace("-", "").take(12)}.dbusv2"
          require(tmp.renameTo(new java.io.File(dir, name)),
            s"segment rename failed for $name")
        }
        ()
      }
  }

  /** Parsed wire event in the relay envelope shape (value/props decoded
    * from the Avro payload via digest lookup). `keyLong` is always set:
    * the key itself for LONG keys, the parse-as-long-else-`String.hashCode`
    * coercion for STRING/SCHEMA keys (KeyModFilter.java:55-70). `meta` is
    * the user slice of the metadata part (bytes after the engine's 8-byte
    * seq prefix), null when empty. */
  case class WireRec(scn: Long, seq: Long, tsUs: Long, sourceId: Int,
      partitionId: Int, opcode: String, keyLong: Long, value: Double,
      props: String, keyString: String = null,
      keySchema: Array[Byte] = null, meta: Array[Byte] = null)

  /** Iterate the data events of one `.dbusv2` segment file inside the
    * (startScn, endScn] band, validating every envelope (CRC contract:
    * corrupt events throw, matching readEvents' InvalidEventException
    * path). Control/EOW events are skipped. `decodePayload=false` keeps
    * the payload opaque (no Avro decode — the zero-deserialization
    * passthrough for projections that don't touch value/props). */
  def readSegment(file: String, startScn: Long = Long.MinValue,
      endScn: Long = Long.MaxValue,
      schemas: VersionedSchemaSet = VersionedSchemaSet.default,
      decodePayload: Boolean = true)
      : Iterator[WireRec] = {
    val in = new DataInputStream(new BufferedInputStream(
      new FileInputStream(file), 1 << 16))
    new Iterator[WireRec] {
      private var nextRec: WireRec = advance()

      private def advance(): WireRec = {
        while (true) {
          val header = new Array[Byte](DbusV2.FixedHeaderLen)
          try in.readFully(header)
          catch { case _: EOFException => in.close(); return null }
          val total = DbusV2.eventLength(header, 0)
          val bytes = java.util.Arrays.copyOf(header, total)
          in.readFully(bytes, DbusV2.FixedHeaderLen,
            total - DbusV2.FixedHeaderLen)
          DbusV2.validate(bytes).foreach { err =>
            in.close()
            throw new IllegalStateException(s"corrupt dbusv2 event: $err")
          }
          val e = DbusV2.decode(bytes)
          if (!e.isControl && e.sequence > startScn && e.sequence <= endScn) {
            // per-event seq rides the first 8 bytes of the metadata part
            // when present; the rest is user metadata. An event without
            // one serves its window scn (still a valid position).
            val (seq, userMeta) = e.metadata match {
              case Some(m) if m.data.length >= 8 =>
                (java.nio.ByteBuffer.wrap(m.data).getLong,
                  if (m.data.length > 8)
                    java.util.Arrays.copyOfRange(m.data, 8, m.data.length)
                  else null)
              case Some(m) => (e.sequence, if (m.data.isEmpty) null else m.data)
              case None => (e.sequence, null)
            }
            // string/schema keys: parsed-as-long else hashCode — the
            // reference's numeric-key coercion (KeyModFilter.java:55-70);
            // schema keys coerce their part data the same way (engine
            // extension — the reference never mod-partitions schema keys)
            val keyStr = e.keyString.map(new String(_, "UTF-8"))
            val key = e.keyLong.getOrElse {
              val ks = keyStr.getOrElse(
                new String(e.keyPart.map(_.data).getOrElse(Array.emptyByteArray), "UTF-8"))
              try ks.toLong catch { case _: NumberFormatException => ks.hashCode.toLong }
            }
            val (value, props) = e.payload match {
              case _ if !decodePayload => (0.0, null)
              case Some(payloadPart) =>
                val writer = schemas.getByDigest(payloadPart.digest).getOrElse(
                  throw new IllegalStateException(
                    "unknown payload schema digest"))
                val rec = AvroCodec.deserialize(payloadPart.data,
                  writer.schema, writer.schema)
                def d(f: String): Double = Option(rec.get(f))
                  .map(_.asInstanceOf[java.lang.Double].doubleValue)
                  .getOrElse(0.0)
                def s(f: String): String =
                  Option(rec.get(f)).map(_.toString).orNull
                (d("value"), s("props"))
              case None => (0.0, null) // payload-less data event (deletes)
            }
            return WireRec(e.sequence, seq, e.timestampNs / 1000L, e.sourceId,
              e.partitionId.toInt,
              if (e.opcode == DbusV2.OpDelete) "DELETE" else "UPSERT",
              key, value, props, keyStr.orNull,
              e.keyPart.map(_.data).orNull, userMeta)
          }
        }
        null // unreachable
      }

      override def hasNext: Boolean = nextRec != null
      override def next(): WireRec = {
        val r = nextRec; nextRec = advance(); r
      }
    }
  }

  /** Batch read of a `.dbusv2` segment dir as the envelope DataFrame —
    * one task per segment (the same parallelism contract as the
    * graft-relay source). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val segs = RelayBinaryLog.listSegments(dir)
      .filter(_.path.endsWith(".dbusv2")).map(_.path)
    spark.sparkContext.parallelize(segs, math.max(1, segs.size))
      .flatMap(p => readSegment(p))
      .toDF()
      .select(col("scn"), col("seq"), col("tsUs").as("ts_us"),
        col("sourceId").as("source_id"), col("partitionId").as("partition_id"),
        col("opcode"), col("keyLong").as("key_long"), col("value"),
        col("props"), col("keyString").as("key_string"),
        col("keySchema").as("key_schema"), col("meta"))
  }
}
