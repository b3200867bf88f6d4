package graft

import graft.functions.{DbusV1, DbusV2}

/** DbusEventV1 envelope fidelity — exact layout offsets
  * (DbusEventV1.java:186-220), both key kinds, CRC coverage rules
  * (value-only for long keys, key+value for string keys), the
  * empty-attributes EOW marker, and the V2→V1 wire down-conversion
  * (DbusEventBuffer.convertToDifferentVersion:2411-2416). */
class DbusV1Spec extends SparkSpec {
  import DbusV1._

  private val schemaId = Array.tabulate[Byte](16)(i => (i * 3).toByte)
  private val value = "v1-payload".getBytes("UTF-8")

  private def sample(opcode: Int = DbusV2.OpUpsert): Event = Event(
    sequence = 424242L, timestampNs = 1700000000000000123L,
    sourceId = 17, physicalPartitionId = 3, logicalPartitionId = 5,
    opcode = opcode, schemaId = schemaId,
    keyLong = Some(111222333L), value = value)

  test("long-key roundtrip preserves every field and exact offsets") {
    val bytes = encode(sample())
    assert(bytes(0) == Version)
    // exact layout: total = 61 + value, key at 53, value at 61
    assert(eventLength(bytes, 0) == LongKeyValueOffset + value.length)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    assert(bb.getLong(SequenceOffset) == 424242L)
    assert(bb.getShort(PhysicalPartitionIdOffset) == 3)
    assert(bb.getShort(LogicalPartitionIdOffset) == 5)
    assert(bb.getLong(TimestampOffset) == 1700000000000000123L)
    assert(bb.getShort(SrcIdOffset) == 17)
    assert(bb.getLong(LongKeyOffset) == 111222333L)
    assert(validate(bytes).isEmpty)
    val e = decode(bytes)
    assert(e.sequence == 424242L && e.timestampNs == 1700000000000000123L)
    assert(e.sourceId == 17 && e.physicalPartitionId == 3 &&
      e.logicalPartitionId == 5 && e.opcode == DbusV2.OpUpsert)
    assert(e.keyLong.contains(111222333L) && e.keyString.isEmpty)
    assert(e.schemaId.toSeq == schemaId.toSeq && e.value.toSeq == value.toSeq)
    assert(!e.trace && !e.replicated)
  }

  test("string-key roundtrip; CRC covers key+value for string keys") {
    val sk = sample().copy(keyLong = None,
      keyString = Some("member:99".getBytes("UTF-8")))
    val bytes = encode(sk)
    assert(eventLength(bytes, 0) == StringKeyOffset + 9 + value.length)
    assert(validate(bytes).isEmpty)
    val e = decode(bytes)
    assert(e.keyString.get.toSeq == "member:99".getBytes("UTF-8").toSeq)
    assert(e.keyLong.isEmpty && e.value.toSeq == value.toSeq)
    // flipping a KEY byte must break the VALUE crc (string-key rule,
    // DbusEventV1.java:514-517) while the header crc stays valid
    bytes(StringKeyOffset) = (bytes(StringKeyOffset) ^ 0x55).toByte
    assert(validate(bytes).contains("value_crc"))
  }

  test("long-key corruption: value byte breaks value_crc, header byte breaks header_crc") {
    val b1 = encode(sample())
    b1(LongKeyValueOffset) = (b1(LongKeyValueOffset) ^ 0x55).toByte
    assert(validate(b1).contains("value_crc"))
    val b2 = encode(sample())
    b2(SequenceOffset) = (b2(SequenceOffset) ^ 0x55).toByte
    assert(validate(b2).contains("header_crc"))
    val b3 = encode(sample())
    // the long KEY is covered by the HEADER crc (LongKeyHeaderSize spans
    // through the key, DbusEventV1.java:219-220)
    b3(LongKeyOffset) = (b3(LongKeyOffset) ^ 0x55).toByte
    assert(validate(b3).contains("header_crc"))
  }

  test("delete + flags roundtrip") {
    val del = decode(encode(sample(DbusV2.OpDelete)))
    assert(del.opcode == DbusV2.OpDelete)
    val fl = decode(encode(sample().copy(trace = true, replicated = true)))
    assert(fl.trace && fl.replicated)
  }

  test("EOW marker: empty attributes, srcId -2, long key 0, no value") {
    val bytes = eowMarker(sequence = 700L, partitionId = 4)
    assert(validate(bytes).isEmpty)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    assert(bb.getShort(AttributesOffset) == 0) // EmptyAttributes
    val e = decode(bytes)
    assert(e.isEow && e.sequence == 700L)
    assert(e.physicalPartitionId == 4 && e.logicalPartitionId == 4)
    assert(e.opcode == DbusV2.OpControl && e.value.isEmpty)
    assert(e.keyLong.contains(0L))
  }

  test("V2→V1 down-conversion maps fields, drops metadata, rejects schema keys") {
    val md5 = Array.tabulate[Byte](16)(_.toByte)
    val v2 = DbusV2.Event(
      sequence = 555L, timestampNs = 1000L, sourceId = 9, partitionId = 2,
      opcode = DbusV2.OpDelete, keyLong = Some(77L),
      metadata = Some(DbusV2.Part(DbusV2.DigestCrc32,
        new Array[Byte](4), 1, Array[Byte](1, 2))),
      payload = Some(DbusV2.Part(DbusV2.DigestMd5, md5, 2, value)),
      trace = true)
    val v1 = fromV2(v2)
    assert(v1.sequence == 555L && v1.sourceId == 9 && v1.opcode == DbusV2.OpDelete)
    assert(v1.physicalPartitionId == 2 && v1.logicalPartitionId == 2)
    assert(v1.schemaId.toSeq == md5.toSeq) // payload digest becomes schemaId
    assert(v1.value.toSeq == value.toSeq && v1.trace)
    val wire = encode(v1)
    assert(validate(wire).isEmpty)
    assert(decode(wire).keyLong.contains(77L))

    val schemaKeyed = v2.copy(keyLong = None,
      keyPart = Some(DbusV2.Part(DbusV2.DigestCrc32,
        new Array[Byte](4), 1, Array[Byte](3))))
    intercept[IllegalArgumentException](fromV2(schemaKeyed))
    val wideSrc = v2.copy(sourceId = 100000)
    intercept[IllegalArgumentException](fromV2(wideSrc))
  }

  test("string-keyed V2 event down-converts with key preserved") {
    val v2 = DbusV2.Event(
      sequence = 1L, timestampNs = 2L, sourceId = 3, partitionId = 1,
      opcode = DbusV2.OpUpsert, keyString = Some("k-9".getBytes("UTF-8")),
      payload = Some(DbusV2.Part(DbusV2.DigestMd5,
        Array.tabulate[Byte](16)(_.toByte), 1, value)))
    val v1 = decode(encode(fromV2(v2)))
    assert(v1.keyString.get.toSeq == "k-9".getBytes("UTF-8").toSeq)
  }
}
