package graft.sources.relay

import java.io.{BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, FileInputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The engine's own binary event-log segment format — the storage the
  * custom relay DataSource (V2) reads.
  *
  * Modeled on the reference envelope (DbusEventV2.java:33-72: magic,
  * length, CRC, timestamp, sourceId, partitionId, sequence, key, payload)
  * without copying its exact layout: one segment file is an scn-ordered
  * run of length-prefixed records, terminated per transaction window by an
  * end-of-window control record (DbusEvent.isEndOfPeriodMarker,
  * DbusEvent.java:79), and the file NAME carries the segment's scn band
  * (`seg-<minScn>-<maxScn>-<uuid>.dbus`) so readers prune whole segments
  * by offset range before opening them — the ScnIndex skip-scan
  * (ScnIndex.java:623) moved into the listing.
  *
  * Record layout (big-endian):
  *   magic(4) = 0x47524654 | bodyLen(4) | body | crc32(4 of body)
  *   body = scn(8) seq(8) tsUs(8) sourceId(4) partitionId(4) opcode(1)
  *          keyLong(8) value(8, double bits) propsLen(4) propsUtf8(n)
  *          [keyStrLen(4) keyStrUtf8(n) metaLen(4) metaBytes(n)]
  *   opcode: 0 = EOW control, 1 = UPSERT, 2 = DELETE
  *
  * The bracketed tail is optional (len -1 = null); readers treat a body
  * that ends after props as an all-null tail, so pre-string-key segments
  * stay readable. For string-keyed records `keyLong` carries the
  * reference's numeric coercion (parse-as-long else Java `String.hashCode`,
  * KeyModFilter.java:55-70) computed at write time, so every downstream
  * filter is pure long arithmetic.
  */
object RelayBinaryLog {

  val Magic = 0x47524654 // "GRFT"
  val OpEow: Byte = 0
  val OpUpsert: Byte = 1
  val OpDelete: Byte = 2

  case class Rec(scn: Long, seq: Long, tsUs: Long, sourceId: Int,
      partitionId: Int, opcode: Byte, keyLong: Long, value: Double,
      props: String, keyString: String = null, meta: Array[Byte] = null)

  /** Segment descriptor parsed from a file name. */
  case class Segment(path: String, minScn: Long, maxScn: Long)

  // `.dbus` = the engine's own record format below; `.dbusv2`/`.dbusv1` =
  // segments of reference-layout DbusEventV2/V1 envelopes (DbusV2Log /
  // DbusV1Log) — all carry the scn band in the name and serve through the
  // same DataSource
  private val SegName = """seg-(-?\d+)-(-?\d+)-[0-9a-f]+\.(dbus|dbusv2|dbusv1)""".r

  def listSegments(dir: String): Seq[Segment] = {
    val d = new java.io.File(dir)
    if (!d.isDirectory) Seq.empty
    else d.listFiles().toSeq.flatMap { f =>
      f.getName match {
        case SegName(lo, hi, _) => Some(Segment(f.getAbsolutePath, lo.toLong, hi.toLong))
        case _ => None
      }
    }.sortBy(_.minScn)
  }

  def writeRecord(out: DataOutputStream, r: Rec): Unit = {
    // len -1 encodes NULL (distinct from an empty value's 0) so the
    // roundtrip preserves null vs "" exactly
    val props = if (r.props == null) Array.emptyByteArray
      else r.props.getBytes(StandardCharsets.UTF_8)
    val propsLen = if (r.props == null) -1 else props.length
    val keyStr = if (r.keyString == null) Array.emptyByteArray
      else r.keyString.getBytes(StandardCharsets.UTF_8)
    val keyStrLen = if (r.keyString == null) -1 else keyStr.length
    val meta = if (r.meta == null) Array.emptyByteArray else r.meta
    val metaLen = if (r.meta == null) -1 else meta.length
    val bodyLen = 8 + 8 + 8 + 4 + 4 + 1 + 8 + 8 + 4 + props.length +
      4 + keyStr.length + 4 + meta.length
    val body = java.nio.ByteBuffer.allocate(bodyLen)
    body.putLong(r.scn).putLong(r.seq).putLong(r.tsUs)
      .putInt(r.sourceId).putInt(r.partitionId).put(r.opcode)
      .putLong(r.keyLong).putDouble(r.value)
      .putInt(propsLen).put(props)
      .putInt(keyStrLen).put(keyStr)
      .putInt(metaLen).put(meta)
    val crc = new CRC32
    crc.update(body.array())
    out.writeInt(Magic)
    out.writeInt(bodyLen)
    out.write(body.array())
    out.writeInt(crc.getValue.toInt)
  }

  /** Read one record; returns null at clean EOF; throws on corruption. */
  def readRecord(in: DataInputStream): Rec = {
    val magic = try in.readInt() catch { case _: EOFException => return null }
    require(magic == Magic, f"bad magic 0x$magic%08x")
    val bodyLen = in.readInt()
    val body = new Array[Byte](bodyLen)
    in.readFully(body)
    val storedCrc = in.readInt()
    val crc = new CRC32
    crc.update(body)
    require(crc.getValue.toInt == storedCrc, "crc mismatch")
    val b = java.nio.ByteBuffer.wrap(body)
    val scn = b.getLong; val seq = b.getLong; val tsUs = b.getLong
    val srcId = b.getInt; val partId = b.getInt; val op = b.get
    val key = b.getLong; val value = b.getDouble
    val plen = b.getInt
    val props = if (plen < 0) null
      else { val p = new Array[Byte](plen); b.get(p)
        new String(p, StandardCharsets.UTF_8) }
    // optional tail (records from pre-string-key segments end here)
    var keyString: String = null
    var meta: Array[Byte] = null
    if (b.remaining() >= 4) {
      val klen = b.getInt
      if (klen >= 0) { val k = new Array[Byte](klen); b.get(k)
        keyString = new String(k, StandardCharsets.UTF_8) }
      val mlen = b.getInt
      if (mlen >= 0) { meta = new Array[Byte](mlen); b.get(meta) }
    }
    Rec(scn, seq, tsUs, srcId, partId, op, key, value, props, keyString, meta)
  }

  /** Write an envelope DataFrame into segment files under `dir`:
    * range-partitioned by scn (so segments hold disjoint bands),
    * scn/seq-ordered within a segment, EOW control record after each
    * window. Executors write their own segment — no driver collect. */
  def write(envelope: DataFrame, dir: String, numSegments: Int = 8): Unit = {
    import envelope.sparkSession.implicits._
    new java.io.File(dir).mkdirs()
    // key_string / meta are optional in the input frame (nulls when absent)
    def opt(name: String, typ: String) =
      if (envelope.columns.contains(name)) col(name).cast(typ)
      else org.apache.spark.sql.functions.lit(null).cast(typ)
    envelope.select(col("scn"), col("seq"), col("ts_us"), col("source_id"),
        col("partition_id").cast("int"), col("opcode"), col("key_long"),
        col("value"), col("props"),
        opt("key_string", "string"), opt("meta", "binary"))
      .as[(Long, Long, Long, Int, Int, String, Long, Double, String, String, Array[Byte])]
      // range-partition on scn ALONE: the range partitioner keys whole
      // windows, so one transaction window can never split across two
      // segments (the EOW-per-window and disjoint-band invariants depend
      // on this)
      .repartitionByRange(numSegments, col("scn"))
      .sortWithinPartitions("scn", "seq")
      .foreachPartition { (it: Iterator[(Long, Long, Long, Int, Int, String, Long, Double, String, String, Array[Byte])]) =>
        if (it.hasNext) {
          val tmp = java.io.File.createTempFile("seg", ".tmp", new java.io.File(dir))
          val out = new DataOutputStream(new BufferedOutputStream(
            new FileOutputStream(tmp), 1 << 16))
          var minScn = Long.MaxValue
          var maxScn = Long.MinValue
          var openScn = Long.MinValue
          var lastSeq = 0L
          it.foreach { case (scn, seq, tsUs, srcId, partId, op, key, value, props, keyStr, meta) =>
            if (openScn != Long.MinValue && scn != openScn)
              writeRecord(out, Rec(openScn, lastSeq, 0L, -1, -1, OpEow, 0L, 0.0, null))
            openScn = scn; lastSeq = seq
            minScn = math.min(minScn, scn); maxScn = math.max(maxScn, scn)
            val opByte = if (op == "DELETE") OpDelete else OpUpsert
            writeRecord(out, Rec(scn, seq, tsUs, srcId, partId, opByte, key,
              value, props, keyStr, meta))
          }
          if (openScn != Long.MinValue)
            writeRecord(out, Rec(openScn, lastSeq, 0L, -1, -1, OpEow, 0L, 0.0, null))
          out.close()
          val name = s"seg-$minScn-$maxScn-${java.util.UUID.randomUUID.toString.replace("-", "").take(12)}.dbus"
          require(tmp.renameTo(new java.io.File(dir, name)),
            s"segment rename failed for $name")
        }
        ()
      }
  }

  /** Min/max scn across segments (the /bufferInfo analog). */
  def bufferInfo(dir: String): Option[(Long, Long)] = {
    val segs = listSegments(dir)
    if (segs.isEmpty) None
    else Some((segs.map(_.minScn).min, segs.map(_.maxScn).max))
  }
}
