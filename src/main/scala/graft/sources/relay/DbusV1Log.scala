package graft.sources.relay

import java.io.{BufferedInputStream, DataInputStream, EOFException, FileInputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.functions.{AvroCodec, DbusV1, DbusV2}
import graft.model.VersionedSchemaSet

/** Wire-format segment log of concatenated [[DbusV1]] envelopes — the
  * reference's exact legacy DbusEventV1 serialization
  * (DbusEventV1.java:166-183) as an on-disk relay format, EOW marker
  * terminating each transaction window. Segment names carry the scn band
  * (`seg-<minScn>-<maxScn>-<uuid>.dbusv1`) so the graft-relay DataSource
  * prunes by offset band before opening, exactly like `.dbus`/`.dbusv2`.
  *
  * V1 has no metadata DbusEventPart, so there is no carrier for the
  * engine's per-event seq: when the payload is decoded, `seq` is
  * recovered from the Avro record's own `event_id`; under a projection
  * that skips the payload the reader *forces* the decode whenever `seq`
  * is requested, so the served envelope is identical across projections
  * (V1 consumers in the reference order by (sequence, buffer position) —
  * the same information). The 16-byte schemaId slot carries the payload
  * writer-schema MD5 digest (DbusEventV1.java:178), resolved back through
  * the [[VersionedSchemaSet]] on read. */
object DbusV1Log {

  /** Write an envelope frame (scn, seq, ts_us, source_id, partition_id,
    * opcode, key_long, payload:binary [, key_string]) into `.dbusv1`
    * segments under `dir`. Key kind per event: non-null `key_string` →
    * STRING key (UTF-8), else LONG (V1 has no SCHEMA keys,
    * KeyTypeNotImplementedException in the reference). */
  def write(envelope: DataFrame, dir: String, numSegments: Int = 8): Unit = {
    import envelope.sparkSession.implicits._
    new java.io.File(dir).mkdirs()
    def opt(name: String, typ: String) =
      if (envelope.columns.contains(name)) col(name).cast(typ)
      else org.apache.spark.sql.functions.lit(null).cast(typ)
    envelope.select(col("scn"), col("seq"), col("ts_us"), col("source_id"),
        col("partition_id").cast("int"), col("opcode"), col("key_long"),
        col("payload"), opt("key_string", "string"))
      .as[(Long, Long, Long, Int, Int, String, Long, Array[Byte], String)]
      .repartitionByRange(numSegments, col("scn"))
      .sortWithinPartitions("scn", "seq")
      .foreachPartition {
          (it: Iterator[(Long, Long, Long, Int, Int, String, Long, Array[Byte], String)]) =>
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
          it.foreach { case (scn, _, tsUs, srcId, partId, op, key, payload, keyStr) =>
            if (openScn != Long.MinValue && scn != openScn)
              out.write(DbusV1.eowMarker(openScn, lastPart.toShort))
            openScn = scn; lastPart = partId
            minScn = math.min(minScn, scn); maxScn = math.max(maxScn, scn)
            out.write(DbusV1.encode(DbusV1.Event(
              sequence = scn, timestampNs = tsUs * 1000L,
              sourceId = srcId.toShort,
              physicalPartitionId = partId.toShort,
              logicalPartitionId = partId.toShort,
              opcode = if (op == "DELETE") DbusV2.OpDelete else DbusV2.OpUpsert,
              schemaId = digest,
              keyLong = if (keyStr == null) Some(key) else None,
              keyString = Option(keyStr).map(_.getBytes("UTF-8")),
              value = payload)))
          }
          if (openScn != Long.MinValue)
            out.write(DbusV1.eowMarker(openScn, lastPart.toShort))
          out.close()
          val name = s"seg-$minScn-$maxScn-${java.util.UUID.randomUUID.toString
            .replace("-", "").take(12)}.dbusv1"
          require(tmp.renameTo(new java.io.File(dir, name)),
            s"segment rename failed for $name")
        }
        ()
      }
  }

  /** Iterate the data events of one `.dbusv1` segment inside the
    * (startScn, endScn] band, validating every envelope. Control/EOW
    * events are skipped. With `decodePayload=false` the payload stays
    * opaque and `seq` falls back to the window scn (see object doc). */
  def readSegment(file: String, startScn: Long = Long.MinValue,
      endScn: Long = Long.MaxValue,
      schemas: VersionedSchemaSet = VersionedSchemaSet.default,
      decodePayload: Boolean = true)
      : Iterator[DbusV2Log.WireRec] = {
    val in = new DataInputStream(new BufferedInputStream(
      new FileInputStream(file), 1 << 16))
    new Iterator[DbusV2Log.WireRec] {
      private var nextRec: DbusV2Log.WireRec = advance()

      private def advance(): DbusV2Log.WireRec = {
        while (true) {
          val header = new Array[Byte](DbusV1.LongKeyOffset)
          try in.readFully(header)
          catch { case _: EOFException => in.close(); return null }
          val total = DbusV1.eventLength(header, 0)
          val bytes = java.util.Arrays.copyOf(header, total)
          in.readFully(bytes, DbusV1.LongKeyOffset,
            total - DbusV1.LongKeyOffset)
          DbusV1.validate(bytes).foreach { err =>
            in.close()
            throw new IllegalStateException(s"corrupt dbusv1 event: $err")
          }
          val e = DbusV1.decode(bytes)
          if (e.opcode != DbusV2.OpControl && e.sourceId >= 0 &&
              e.sequence > startScn && e.sequence <= endScn) {
            val keyStr = e.keyString.map(new String(_, "UTF-8"))
            // string keys: parsed-as-long else hashCode — the reference's
            // numeric-key coercion (KeyModFilter.java:55-70)
            val key = e.keyLong.getOrElse {
              val ks = keyStr.getOrElse("")
              try ks.toLong catch { case _: NumberFormatException => ks.hashCode.toLong }
            }
            var seq = e.sequence
            var value = 0.0
            var props: String = null
            if (decodePayload && e.value.nonEmpty) {
              val writer = schemas.getByDigest(e.schemaId).getOrElse(
                throw new IllegalStateException("unknown schemaId digest"))
              val rec = AvroCodec.deserialize(e.value, writer.schema,
                writer.schema)
              seq = Option(rec.get("event_id"))
                .map(_.asInstanceOf[java.lang.Long].longValue)
                .getOrElse(e.sequence)
              value = Option(rec.get("value"))
                .map(_.asInstanceOf[java.lang.Double].doubleValue)
                .getOrElse(0.0)
              props = Option(rec.get("props")).map(_.toString).orNull
            }
            return DbusV2Log.WireRec(e.sequence, seq, e.timestampNs / 1000L,
              e.sourceId.toInt, e.physicalPartitionId.toInt,
              if (e.opcode == DbusV2.OpDelete) "DELETE" else "UPSERT",
              key, value, props, keyStr.orNull, null, null)
          }
        }
        null // unreachable
      }

      override def hasNext: Boolean = nextRec != null
      override def next(): DbusV2Log.WireRec = {
        val r = nextRec; nextRec = advance(); r
      }
    }
  }
}
