package graft.functions

import java.nio.ByteBuffer
import java.util.zip.CRC32

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** The reference's exact DbusEventV1 binary envelope — encode / decode /
  * validate — plus the V2→V1 wire down-conversion the server applies when
  * a consumer registers `max-event-version=1`
  * (ReadEventsRequestProcessor.java:125-128;
  * DbusEventBuffer.convertToDifferentVersion, DbusEventBuffer.java:2411-2416).
  *
  * Layout (DbusEventV1.java:166-183, offsets :186-220; big-endian is this
  * engine's canonical order — the reference parameterizes the buffer's
  * order and V1 attribute bytes are order-swapped, DbusEventV1.java:238-247):
  * {{{
  *   version(1)=0 | headerCrc(4) | length(4) | attributes(2) |
  *   sequence(8) | physicalPartitionId(2) | logicalPartitionId(2) |
  *   nanoTimestamp(8) | srcId(2, SHORT) | schemaId(16) | valueCrc(4) |
  *   key(8)  OR  keyLen(4)+keyBytes | value(N)
  * }}}
  * Attribute masks (DbusEventV1.java:225-229): UPSERT 0x1 | DELETE 0x2 |
  * TRACE 0x4 | KEY_TYPE_STRING 0x8 | EXT_REPL 0x100. The end-of-period
  * marker uses EMPTY attributes, srcId -2, long key 0, no value
  * (serializeEndOfPeriodMarker, DbusEventV1.java:308-328).
  *
  * CRCs (serializeFullEvent :420-455, applyCrc :652-657): valueCrc =
  * CRC32 of the value bytes (long keys) or of keyBytes+value (string
  * keys — DbusEventV1.java:514-517); headerCrc = CRC32 of
  * [Length .. key-incl] for long keys ([Length .. keyLen-incl] for string
  * keys) — i.e. it covers the already-written valueCrc. Both stored as
  * the unsigned low 32 bits.
  *
  * V1 differences from [[DbusV2]] that the down-conversion must respect:
  * srcId narrows to short, there is no metadata part (it is dropped), no
  * per-part digests, and SCHEMA keys do not exist
  * (DbusEventV1.serializeEvent throws KeyTypeNotImplementedException).
  */
object DbusV1 {

  val Version: Byte = 0 // DbusEventFactory.DBUS_EVENT_V1

  // offsets (DbusEventV1.java:186-220)
  val HeaderCrcOffset = 1
  val LengthOffset = 5
  val AttributesOffset = 9
  val SequenceOffset = 11
  val PhysicalPartitionIdOffset = 19
  val LogicalPartitionIdOffset = 21
  val TimestampOffset = 23
  val SrcIdOffset = 31
  val SchemaIdOffset = 33
  val ValueCrcOffset = 49
  val LongKeyOffset = 53
  val LongKeyValueOffset = 61
  val StringKeyLengthOffset = 53
  val StringKeyOffset = 57

  val LongKeyHeaderSize = LongKeyValueOffset - LengthOffset // 56
  val StringKeyHeaderSize = StringKeyOffset - LengthOffset // 52

  // attribute masks (DbusEventV1.java:225-229)
  val UpsertMask = 0x0001
  val DeleteMask = 0x0002
  val TraceMask = 0x0004
  val KeyTypeStringMask = 0x0008
  val ExtReplMask = 0x0100

  /** EOW marker srcId (DbusEventInternalWritable.EOPMarkerSrcId). */
  val EowSrcId: Short = -2

  case class Event(
      sequence: Long, timestampNs: Long, sourceId: Short,
      physicalPartitionId: Short, logicalPartitionId: Short,
      opcode: Int, // DbusV2.OpUpsert / OpDelete / OpControl (EOW = control)
      schemaId: Array[Byte],
      keyLong: Option[Long] = None,
      keyString: Option[Array[Byte]] = None,
      value: Array[Byte] = Array.emptyByteArray,
      trace: Boolean = false, replicated: Boolean = false) {
    require(schemaId.length == 16, "schemaId must be 16 bytes")
    def isEow: Boolean = sourceId == EowSrcId
  }

  private def crc32(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new CRC32
    c.update(bytes, off, len)
    c.getValue.toInt
  }

  def encode(e: Event): Array[Byte] = {
    val keyBytes = e.keyString
    val totalLen = keyBytes match {
      case None => LongKeyValueOffset + e.value.length
      case Some(k) => StringKeyOffset + k.length + e.value.length
    }
    val out = new Array[Byte](totalLen)
    val b = ByteBuffer.wrap(out)
    b.put(Version)
    b.putInt(0) // headerCrc placeholder
    b.putInt(totalLen)
    // EOW markers carry EMPTY attributes — no opcode bit
    // (serializeEndOfPeriodMarker uses EmptyAttributes)
    var attrs = if (e.isEow || e.opcode == DbusV2.OpControl) 0
      else if (e.opcode == DbusV2.OpDelete) DeleteMask else UpsertMask
    if (keyBytes.isDefined) attrs |= KeyTypeStringMask
    if (e.trace) attrs |= TraceMask
    if (e.replicated) attrs |= ExtReplMask
    b.putShort(attrs.toShort)
    b.putLong(e.sequence)
    b.putShort(e.physicalPartitionId)
    b.putShort(e.logicalPartitionId)
    b.putLong(e.timestampNs)
    b.putShort(e.sourceId)
    b.put(e.schemaId, 0, 16)
    b.putInt(0) // valueCrc placeholder
    keyBytes match {
      case None =>
        b.putLong(e.keyLong.getOrElse(
          throw new IllegalArgumentException("event has no key")))
        b.put(e.value)
        // value CRC covers the value only (serializeFullEvent:449-452)
        b.putInt(ValueCrcOffset,
          crc32(out, LongKeyValueOffset, e.value.length))
        b.putInt(HeaderCrcOffset, crc32(out, LengthOffset, LongKeyHeaderSize))
      case Some(k) =>
        b.putInt(k.length)
        b.put(k)
        b.put(e.value)
        // string keys: CRC covers key bytes + value (:514-517)
        b.putInt(ValueCrcOffset,
          crc32(out, StringKeyOffset, k.length + e.value.length))
        b.putInt(HeaderCrcOffset,
          crc32(out, LengthOffset, StringKeyHeaderSize))
    }
    out
  }

  /** EOW marker: empty attributes, srcId -2, long key 0, no value; both
    * partition ids carry the partition (DbusEventV1.java:319-328). */
  def eowMarker(sequence: Long, partitionId: Short, timestampNs: Long = 0L)
      : Array[Byte] =
    encode(Event(sequence, timestampNs, EowSrcId, partitionId, partitionId,
      DbusV2.OpControl, new Array[Byte](16), keyLong = Some(0L)))

  /** Total event length at `off`. */
  def eventLength(bytes: Array[Byte], off: Int): Int =
    ByteBuffer.wrap(bytes, off + LengthOffset, 4).getInt

  /** None = intact; Some(reason) mirrors scanHeader/scanEvent
    * (DbusEventV1.java:726-760,768-800). */
  def validate(bytes: Array[Byte], off: Int = 0): Option[String] = {
    if (bytes.length - off < LongKeyOffset) return Some("truncated_header")
    val b = ByteBuffer.wrap(bytes, off, bytes.length - off).slice()
    if (b.get(0) != Version) return Some("bad_version")
    val totalLen = b.getInt(LengthOffset)
    if (totalLen < LongKeyOffset || totalLen > bytes.length - off)
      return Some("bad_length")
    val isString = (b.getShort(AttributesOffset) & KeyTypeStringMask) != 0
    val headerLen = if (isString) StringKeyHeaderSize else LongKeyHeaderSize
    if (b.getInt(HeaderCrcOffset) !=
        crc32(bytes, off + LengthOffset, headerLen))
      return Some("header_crc")
    val (valOff, valLen) =
      if (isString) {
        val klen = b.getInt(StringKeyLengthOffset)
        if (klen < 0 || StringKeyOffset + klen > totalLen)
          return Some("bad_key_len")
        (StringKeyOffset, totalLen - StringKeyOffset) // key + value together
      } else (LongKeyValueOffset, totalLen - LongKeyValueOffset)
    if (b.getInt(ValueCrcOffset) != crc32(bytes, off + valOff, valLen))
      return Some("value_crc")
    None
  }

  /** Strict decode (call [[validate]] first for untrusted bytes). */
  def decode(bytes: Array[Byte], off: Int = 0): Event = {
    val b = ByteBuffer.wrap(bytes, off, bytes.length - off).slice()
    require(b.get(0) == Version, "not a V1 event")
    val totalLen = b.getInt(LengthOffset)
    val attrs = b.getShort(AttributesOffset) & 0xFFFF
    val seq = b.getLong(SequenceOffset)
    val pPart = b.getShort(PhysicalPartitionIdOffset)
    val lPart = b.getShort(LogicalPartitionIdOffset)
    val tsNs = b.getLong(TimestampOffset)
    val srcId = b.getShort(SrcIdOffset)
    val schemaId = new Array[Byte](16)
    b.position(SchemaIdOffset); b.get(schemaId)
    val opcode =
      if ((attrs & DeleteMask) != 0) DbusV2.OpDelete
      else if ((attrs & UpsertMask) != 0) DbusV2.OpUpsert
      else DbusV2.OpControl // empty attributes = EOW/control
    if ((attrs & KeyTypeStringMask) != 0) {
      val klen = b.getInt(StringKeyLengthOffset)
      val k = new Array[Byte](klen)
      b.position(StringKeyOffset); b.get(k)
      val v = new Array[Byte](totalLen - StringKeyOffset - klen)
      b.get(v)
      Event(seq, tsNs, srcId, pPart, lPart, opcode, schemaId,
        keyString = Some(k), value = v,
        trace = (attrs & TraceMask) != 0,
        replicated = (attrs & ExtReplMask) != 0)
    } else {
      val key = b.getLong(LongKeyOffset)
      val v = new Array[Byte](totalLen - LongKeyValueOffset)
      b.position(LongKeyValueOffset); b.get(v)
      Event(seq, tsNs, srcId, pPart, lPart, opcode, schemaId,
        keyLong = Some(key), value = v,
        trace = (attrs & TraceMask) != 0,
        replicated = (attrs & ExtReplMask) != 0)
    }
  }

  /** V2→V1 wire down-conversion — what the relay applies per event when
    * the client's registration caps the event version at V1
    * (DbusEventBuffer.convertToDifferentVersion:2411-2416). Drops the
    * metadata part, narrows srcId to short, keeps the payload part's
    * schema digest as V1's schemaId; SCHEMA keys cannot be represented
    * (KeyTypeNotImplementedException in the reference) and throw. */
  def fromV2(v2: DbusV2.Event): Event = {
    require(v2.keyPart.isEmpty,
      "SCHEMA keys are not representable in DbusEventV1")
    require(v2.sourceId >= Short.MinValue && v2.sourceId <= Short.MaxValue,
      s"sourceId ${v2.sourceId} does not fit V1's short srcId")
    Event(
      sequence = v2.sequence, timestampNs = v2.timestampNs,
      sourceId = v2.sourceId.toShort,
      physicalPartitionId = v2.partitionId,
      logicalPartitionId = v2.partitionId,
      opcode = if (v2.isControl) DbusV2.OpControl else v2.opcode,
      schemaId = v2.payload.map(_.digest).filter(_.length == 16)
        .getOrElse(new Array[Byte](16)),
      keyLong = v2.keyLong, keyString = v2.keyString,
      value = v2.payload.map(_.data).getOrElse(Array.emptyByteArray),
      trace = v2.trace, replicated = v2.replicated)
  }

  // ---- column codec surface ----

  /** Decoded envelope struct (column shape of [[decode]]). */
  case class DecodedV1(
      sequence: Long, ts_ns: Long, source_id: Int,
      physical_partition_id: Int, logical_partition_id: Int,
      opcode: String, key_long: Option[Long], key_string: Option[Array[Byte]],
      schema_id: Array[Byte], payload: Array[Byte],
      total_len: Int, replicated: Boolean, trace: Boolean)

  /** Strict decode to a struct column. */
  val decodeUdf: Column => Column = {
    val f = udf { (bytes: Array[Byte]) =>
      val e = decode(bytes)
      DecodedV1(e.sequence, e.timestampNs, e.sourceId.toInt,
        e.physicalPartitionId.toInt, e.logicalPartitionId.toInt,
        if (e.opcode == DbusV2.OpControl) "CONTROL"
        else if (e.opcode == DbusV2.OpDelete) "DELETE" else "UPSERT",
        e.keyLong, e.keyString, e.schemaId, e.value,
        eventLength(bytes, 0), e.replicated, e.trace)
    }
    bytes => f(bytes)
  }

  /** V2 wire bytes → V1 wire bytes as a column (the `/stream`
    * max-event-version=1 serve path). */
  val downConvertUdf: Column => Column = {
    val f = udf { (v2Bytes: Array[Byte]) =>
      encode(fromV2(DbusV2.decode(v2Bytes)))
    }
    bytes => f(bytes)
  }

  /** Validation error as a nullable string column (null = intact). */
  val errorUdf: Column => Column = {
    val f = udf { (bytes: Array[Byte]) => validate(bytes) }
    bytes => f(bytes)
  }
}
