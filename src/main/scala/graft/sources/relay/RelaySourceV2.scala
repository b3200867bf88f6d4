package graft.sources.relay

import java.io.{BufferedInputStream, DataInputStream, FileInputStream}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Consumer checkpoint is older than the log's retention window — the
  * bootstrap trigger (reference: ScnNotFoundException →
  * RelayPullThread.java:96-121 transitions to BOOTSTRAP). */
class ScnNotFoundException(msg: String) extends RuntimeException(msg)

/** `format("graft-relay")` — the relay as a first-class Spark DataSource
  * (V2), batch + micro-batch streaming.
  *
  * This is the custom source SURVEY §4 calls for: offsets are SCNs
  * (transaction-window ids), so a micro-batch is always a whole number of
  * windows — the WINDOW_AT_TIME delivery mode (DbusEventBuffer.java:
  * 2199-2202) enforced by the offset algebra instead of runtime
  * coordination. Planning prunes segment files by their scn band before
  * opening them (ScnIndex skip-scan at the listing level); each segment is
  * one InputPartition, so scan parallelism = segment count.
  *
  * Options:
  *  - `path`        (required) segment directory written by RelayBinaryLog
  *  - `startingScn` first offset (exclusive); default = earliest available
  *  - `failOnFallOff` if true and `startingScn` predates retention, throw
  *    [[ScnNotFoundException]] (callers switch to bootstrap, §3.3);
  *    default false = clamp to earliest (the flexible checkpoint).
  *  - `maxSegmentsPerBatch` cap on segments admitted per micro-batch (the
  *    `/stream` `size` budget analog; rate control A6). Default 4.
  */
class RelaySourceV2 extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-relay"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RelaySourceV2.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RelayTable(properties.get("path"))
}

object RelaySourceV2 {
  /** Envelope served by the source. Key model mirrors the reference's
    * DbusEventKey (LONG | STRING | SCHEMA, DbusEventKey.java:30-35):
    * `key_long` is always set — for STRING keys it carries the reference's
    * numeric coercion (parsed-as-long else Java `String.hashCode`,
    * KeyModFilter.java:55-70) so the serving filters (KeyMod/KeyRange)
    * apply to every key kind as pure pushable arithmetic; `key_string`
    * carries the UTF-8 text of STRING keys (null for LONG); `key_schema`
    * carries a SCHEMA key's part data (null otherwise); `meta` carries the
    * event's metadata DbusEventPart payload (DbusEventPart.java:41) when
    * present. */
  val schema: StructType = StructType(Seq(
    StructField("scn", LongType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("ts_us", LongType, nullable = false),
    StructField("source_id", IntegerType, nullable = false),
    StructField("partition_id", IntegerType, nullable = false),
    StructField("opcode", StringType, nullable = false),
    StructField("key_long", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("props", StringType, nullable = true),
    StructField("key_string", StringType, nullable = true),
    StructField("key_schema", BinaryType, nullable = true),
    StructField("meta", BinaryType, nullable = true)))
}

private[relay] class RelayTable(path: String) extends Table with SupportsRead {
  require(path != null, "graft-relay requires a path option")
  override def name(): String = s"graft-relay:$path"
  override def schema(): StructType = RelaySourceV2.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RelayScan(path, options)
}

private[relay] class RelayScan(path: String, options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
  import org.apache.spark.sql.sources._

  // column pruning reaches the segment readers: a projection that skips
  // value/props lets the .dbusv2 reader skip the per-event Avro payload
  // decode entirely (the dominant cost of the wire path)
  private var required: StructType = RelaySourceV2.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // scn band accepted from pushed predicates — segment pruning at planning
  // time, exactly the ScnIndex role (batch analog of the streaming offset
  // band). Bounds are (lo, hi] to match the checkpoint contract.
  private var scnLo = Long.MinValue
  private var scnHi = Long.MaxValue
  private var accepted: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    accepted = filters.filter {
      case GreaterThan("scn", _: Long) | GreaterThanOrEqual("scn", _: Long) |
           LessThan("scn", _: Long) | LessThanOrEqual("scn", _: Long) |
           EqualTo("scn", _: Long) => true
      case _ => false
    }
    // v - 1 underflows at Long.MinValue and would invert the band into
    // prune-everything; skip the bound there (degenerate-but-correct, the
    // residual re-check keeps semantics) — mirrors the overflow guards in
    // plans/Rules.scala ImpliedScnBandPushdown
    accepted.foreach {
      case GreaterThan("scn", v: Long) => scnLo = math.max(scnLo, v)
      case GreaterThanOrEqual("scn", v: Long) =>
        if (v != Long.MinValue) scnLo = math.max(scnLo, v - 1)
      case LessThan("scn", v: Long) =>
        if (v != Long.MinValue) scnHi = math.min(scnHi, v - 1)
      case LessThanOrEqual("scn", v: Long) => scnHi = math.min(scnHi, v)
      case EqualTo("scn", v: Long) =>
        if (v != Long.MinValue) scnLo = math.max(scnLo, v - 1)
        scnHi = math.min(scnHi, v)
      case _ =>
    }
    // keep accepted filters in the residual too (cheap re-check; pruning
    // is segment-granular, rows inside a segment still need the predicate)
    filters
  }

  /** Report the accepted scn band so explain/metrics show the pushdown
    * (they stay in the residual as well — the push is inexact). */
  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan = this
  override def readSchema(): StructType = required
  override def description(): String =
    s"RelayScan($path, scnBand=($scnLo, $scnHi], " +
      s"ReadSchema=${required.fieldNames.mkString(",")})"

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      RelayBinaryLog.listSegments(path)
        .filter(s => s.maxScn > scnLo && s.minScn <= scnHi)
        .map(s => RelayPartition(s.path, scnLo, scnHi,
          required.fieldNames.toSeq))
        .toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new RelayReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new RelayMicroBatchStream(path, options, required.fieldNames.toSeq)
}

/** Offset = high-watermark scn, JSON `{"scn":N}` (Checkpoint.windowScn). */
private[graft] case class RelayOffset(scn: Long) extends Offset {
  override def json(): String = s"""{"scn":$scn}"""
}

private[graft] object RelayOffset {
  private val Re = """\{"scn":(-?\d+)\}""".r
  def parse(json: String): RelayOffset = json match {
    case Re(v) => RelayOffset(v.toLong)
    case other => throw new IllegalArgumentException(s"bad relay offset: $other")
  }
}

private[graft] class RelayMicroBatchStream(path: String,
    options: CaseInsensitiveStringMap,
    fields: Seq[String] = RelaySourceV2.schema.fieldNames.toSeq)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private val maxSegments = options.getInt("maxSegmentsPerBatch", 4)

  // Trigger.AvailableNow: capture the log head once, then emit bounded
  // batches until it is reached (drain-and-stop at a fixed target even if
  // producers keep appending segments behind us)
  private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(
      RelayBinaryLog.bufferInfo(path).map(_._2).getOrElse(-1L))

  override def initialOffset(): Offset = {
    val earliest = RelayBinaryLog.bufferInfo(path).map(_._1 - 1).getOrElse(-1L)
    val wanted = Option(options.get("startingScn")).map(_.toLong)
    wanted match {
      case Some(scn) if scn < earliest =>
        if (options.getBoolean("failOnFallOff", false))
          throw new ScnNotFoundException(
            s"startingScn $scn predates retention (earliest retained window ${earliest + 1})")
        else RelayOffset(earliest)
      case Some(scn) => RelayOffset(scn)
      case None => RelayOffset(earliest)
    }
  }

  override def latestOffset(): Offset = {
    val head = RelayBinaryLog.bufferInfo(path).map(_._2).getOrElse(-1L)
    RelayOffset(head)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[RelayOffset].scn
    val hi = end.asInstanceOf[RelayOffset].scn
    // window-budgeted band: never split a window (scn) across batches
    RelayBinaryLog.listSegments(path)
      .filter(s => s.maxScn > lo && s.minScn <= hi)
      .map(s => RelayPartition(s.path, lo, hi, fields))
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new RelayReaderFactory
  override def deserializeOffset(json: String): Offset = RelayOffset.parse(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  // ---- admission control (A6 rate limiting: the `/stream` size budget):
  // each micro-batch admits at most `maxSegmentsPerBatch` segments (or the
  // ReadLimit's file cap if the trigger passes one), always whole segments
  // = whole windows. Note: the cap bounds the segments used to CHOOSE the
  // end offset; when scn bands from separate write() invocations
  // interleave, planInputPartitions admits every segment overlapping the
  // band, so the cap is a lower bound on admission, not an upper bound. ----
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    import org.apache.spark.sql.connector.read.streaming.{ReadAllAvailable, ReadMaxFiles}
    val s = start.asInstanceOf[RelayOffset]
    val pending = RelayBinaryLog.listSegments(path)
      .filter(_.maxScn > s.scn).sortBy(_.maxScn)
    if (pending.isEmpty) s
    else {
      val cap = limit match {
        case _: ReadAllAvailable => pending.size
        case f: ReadMaxFiles => f.maxFiles()
        case _ => maxSegments
      }
      val next = pending.take(math.max(1, cap)).map(_.maxScn).max
      RelayOffset(availableNowTarget.fold(next)(math.min(next, _)))
    }
  }
  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.maxFiles(maxSegments)
  override def reportLatestOffset(): Offset = latestOffset()
}

/** One segment file restricted to the (startScn, endScn] band, emitting
  * only the pruned `fields` (in requested order). */
private[relay] case class RelayPartition(file: String, startScn: Long,
    endScn: Long,
    fields: Seq[String] = RelaySourceV2.schema.fieldNames.toSeq)
    extends InputPartition

private[relay] class RelayReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RelayPartition]
    if (p.file.endsWith(".dbusv2")) new DbusV2PartitionReader(p)
    else if (p.file.endsWith(".dbusv1")) new DbusV1PartitionReader(p)
    else new RelayPartitionReader(p)
  }
}

/** Reader over a segment of reference-layout DbusEventV2 envelopes —
  * CRC-validated decode + schema-by-digest Avro payload resolution
  * (DbusV2Log.readSegment does both). A projection that needs neither
  * `value` nor `props` skips the per-event Avro decode entirely (the
  * relay's zero-deserialization passthrough, recovered via column
  * pruning). */
private[relay] object RelayProjection {
  /** Field name → index in the full envelope schema. */
  val index: Map[String, Int] =
    RelaySourceV2.schema.fieldNames.zipWithIndex.toMap

  // opcode strings are a tiny closed set — intern them once per JVM so the
  // hot loop never re-encodes (UTF8String.fromString was a measurable
  // per-event cost in the 300k+ events/s range)
  val Upsert: UTF8String = UTF8String.fromString("UPSERT")
  val Delete: UTF8String = UTF8String.fromString("DELETE")
}

private[relay] class DbusV2PartitionReader(p: RelayPartition)
    extends PartitionReader[InternalRow] {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  private val needsPayload =
    p.fields.contains("value") || p.fields.contains("props")
  private val it = DbusV2Log.readSegment(p.file, p.startScn, p.endScn,
    decodePayload = needsPayload)
  private val proj = p.fields.map(RelayProjection.index).toArray
  // one mutable row reused across get() calls — the scan copies rows into
  // unsafe format before buffering, so reuse is safe (same contract the
  // built-in file-source readers rely on) and removes the per-event
  // InternalRow + IndexedSeq allocation the r2 bench flagged
  private val row = new GenericInternalRow(proj.length)
  private var rec: DbusV2Log.WireRec = _

  override def next(): Boolean = {
    if (!it.hasNext) return false
    rec = it.next()
    true
  }

  override def get(): InternalRow = {
    var i = 0
    while (i < proj.length) {
      val v: Any = proj(i) match {
        case 0 => rec.scn
        case 1 => rec.seq
        case 2 => rec.tsUs
        case 3 => rec.sourceId
        case 4 => rec.partitionId
        case 5 => if (rec.opcode == "DELETE") RelayProjection.Delete
          else RelayProjection.Upsert
        case 6 => rec.keyLong
        case 7 => rec.value
        case 8 =>
          if (rec.props == null) null else UTF8String.fromString(rec.props)
        case 9 => if (rec.keyString == null) null
          else UTF8String.fromString(rec.keyString)
        case 10 => rec.keySchema
        case 11 => rec.meta
      }
      row.update(i, v)
      i += 1
    }
    row
  }

  override def close(): Unit = ()
}

/** Reader over a segment of legacy DbusEventV1 envelopes. V1 carries no
  * metadata part, so the per-event seq lives only in the Avro payload —
  * a projection requesting `seq` forces the payload decode so the served
  * rows are identical across projections (DbusV1Log doc). */
private[relay] class DbusV1PartitionReader(p: RelayPartition)
    extends PartitionReader[InternalRow] {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  private val needsPayload = p.fields.contains("value") ||
    p.fields.contains("props") || p.fields.contains("seq")
  private val it = DbusV1Log.readSegment(p.file, p.startScn, p.endScn,
    decodePayload = needsPayload)
  private val proj = p.fields.map(RelayProjection.index).toArray
  private val row = new GenericInternalRow(proj.length)
  private var rec: DbusV2Log.WireRec = _

  override def next(): Boolean = {
    if (!it.hasNext) return false
    rec = it.next()
    true
  }

  override def get(): InternalRow = {
    var i = 0
    while (i < proj.length) {
      val v: Any = proj(i) match {
        case 0 => rec.scn
        case 1 => rec.seq
        case 2 => rec.tsUs
        case 3 => rec.sourceId
        case 4 => rec.partitionId
        case 5 => if (rec.opcode == "DELETE") RelayProjection.Delete
          else RelayProjection.Upsert
        case 6 => rec.keyLong
        case 7 => rec.value
        case 8 =>
          if (rec.props == null) null else UTF8String.fromString(rec.props)
        case 9 => if (rec.keyString == null) null
          else UTF8String.fromString(rec.keyString)
        case 10 => null // V1 has no SCHEMA key kind
        case 11 => null // V1 has no metadata part
      }
      row.update(i, v)
      i += 1
    }
    row
  }

  override def close(): Unit = ()
}

private[relay] class RelayPartitionReader(p: RelayPartition)
    extends PartitionReader[InternalRow] {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  private val in = new DataInputStream(new BufferedInputStream(
    new FileInputStream(p.file), 1 << 16))
  private val proj = p.fields.map(RelayProjection.index).toArray
  private val row = new GenericInternalRow(proj.length)
  private var rec: RelayBinaryLog.Rec = _

  override def next(): Boolean = {
    while (true) {
      rec = RelayBinaryLog.readRecord(in)
      if (rec == null) return false
      // skip control records (EOW) and rows outside the offset band
      if (rec.opcode != RelayBinaryLog.OpEow &&
          rec.scn > p.startScn && rec.scn <= p.endScn) return true
    }
    false
  }

  override def get(): InternalRow = {
    var i = 0
    while (i < proj.length) {
      val v: Any = proj(i) match {
        case 0 => rec.scn
        case 1 => rec.seq
        case 2 => rec.tsUs
        case 3 => rec.sourceId
        case 4 => rec.partitionId
        case 5 => if (rec.opcode == RelayBinaryLog.OpDelete)
          RelayProjection.Delete else RelayProjection.Upsert
        case 6 => rec.keyLong
        case 7 => rec.value
        case 8 =>
          if (rec.props == null) null else UTF8String.fromString(rec.props)
        case 9 => if (rec.keyString == null) null
          else UTF8String.fromString(rec.keyString)
        case 10 => null // .dbus has no schema-key kind
        case 11 => rec.meta
      }
      row.update(i, v)
      i += 1
    }
    row
  }

  override def close(): Unit = in.close()
}
