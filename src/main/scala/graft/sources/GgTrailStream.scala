package graft.sources

import java.io.{BufferedInputStream, File, FileInputStream}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `format("graft-ggtrail")` — streaming tail of a GoldenGate-style XML
  * trail directory (S5, the continuous form of [[GoldenGateTrail.read]]).
  *
  * Reference: GoldenGateEventProducer tails the newest trail file as the
  * extract process appends to it, rolling to the next file on rotation
  * (databus2-relay/.../relay/GoldenGateEventProducer.java:104,645);
  * TrailFilePositionSetter seeks the start position for a requested SCN by
  * regex-scanning the trail files (TrailFilePositionSetter.java:1).
  *
  * Spark-first re-expression as a micro-batch DataSource V2:
  *
  *  - **Offsets are per-file counts of COMPLETE `dbupdate` elements.** The
  *    driver discovers progress with a raw byte scan for `</dbupdate>`
  *    close tags (a trailing half-written element has no close tag, and
  *    XML-escaped content cannot contain one) — no XML parsing on the
  *    driver, and the scan is incremental: only bytes appended since the
  *    last trigger are re-scanned (minus a small boundary carry), so
  *    driver work per trigger is O(new bytes), like the reference's tailer.
  *  - **Concurrent appends are safe**: an element half-written at offset
  *    capture time has no close tag yet, so it is beyond the batch's end
  *    offset; the executor-side parser runs truncation-tolerant and the
  *    element is delivered by the next trigger once complete. A file only
  *    ever appends (GG trail contract), so update indexes are stable and
  *    delivery is exactly-once per element.
  *  - **SCN seek** (`sinceScn` option): at stream start the position
  *    setter skips, per file, the leading run of complete updates with
  *    scn <= sinceScn (whole files entirely below are skipped outright) —
  *    the TrailFilePositionSetter protocol. The readers additionally
  *    filter `scn > sinceScn` row-level so the guarantee holds even for a
  *    mis-ordered trail.
  *
  * At 100 TB: one input partition per trail file with new data (the GG
  * unit of concurrent append — same grain as the batch reader), each task
  * pull-parsing from a stream at constant memory. Rotated (closed) files
  * are skipped entirely once consumed; only the live tail file is
  * re-parsed from its start each trigger, and GG rotates trails at a
  * bounded size, so per-trigger executor work is bounded by the rotation
  * size, not the trail history.
  *
  * Options: `path` (required trail dir), `sinceScn` (exclusive SCN seek).
  */
class GgTrailSourceV2 extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-ggtrail"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GgTrailSourceV2.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GgTrailTable(properties.get("path"))
}

object GgTrailSourceV2 {
  /** One row per parsed `dbupdate` — the [[TrailUpdate]] shape, so
    * [[GoldenGateTrail.toEnvelope]] applies unchanged to the stream. */
  val schema: StructType = StructType(Seq(
    StructField("scn", LongType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("table", StringType, nullable = true),
    StructField("opType", StringType, nullable = true),
    StructField("txnTimestamp", StringType, nullable = true),
    StructField("columns", MapType(StringType, StringType), nullable = true)))

  private[graft] val CloseTag = "</dbupdate>".getBytes("UTF-8")

  /** Count `</dbupdate>` close tags that END strictly after byte position
    * `endAfter`, scanning from byte `from`. Callers pass
    * `from = endAfter - |tag| + 1` so a tag straddling the old EOF is seen
    * exactly once and tags fully inside the already-counted prefix are
    * excluded. Buffered streaming scan — O(bytes scanned), constant
    * memory. The tag has no repeated prefix beyond '<', so the
    * mismatch fallback state is 0 or (b == '<' → 1). */
  private[graft] def countCloseTags(file: File, from: Long,
      endAfter: Long = 0L): Long = {
    val in = new BufferedInputStream(new FileInputStream(file), 1 << 16)
    try {
      val start = math.max(0L, from)
      var toSkip = start
      while (toSkip > 0) {
        val n = in.skip(toSkip)
        if (n <= 0) return 0L
        toSkip -= n
      }
      var pos = start
      var count = 0L
      var matched = 0
      var b = in.read()
      while (b >= 0) {
        pos += 1
        if (b == CloseTag(matched)) {
          matched += 1
          if (matched == CloseTag.length) {
            if (pos > endAfter) count += 1
            matched = 0
          }
        } else matched = if (b == CloseTag(0)) 1 else 0
        b = in.read()
      }
      count
    } finally in.close()
  }

  /** Trail files of a dir in GG rotation order (lexicographic names). */
  private[graft] def trailFiles(dir: String): Seq[File] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".xml")).sortBy(_.getName).toSeq

  /** TrailFilePositionSetter (TrailFilePositionSetter.java:1): per file,
    * how many leading complete updates have scn <= sinceScn (files wholly
    * below contribute their full count). One driver parse at stream start
    * only; per-trigger progress never re-runs this. */
  private[graft] def seek(dir: String, sinceScn: Long): Map[String, Long] =
    trailFiles(dir).map { f =>
      val it = new TolerantTrailIterator(f)
      try {
        var skipped = 0L
        var stop = false
        while (!stop && it.hasNext) {
          if (it.next().scn <= sinceScn) skipped += 1 else stop = true
        }
        f.getAbsolutePath -> skipped
      } finally it.close()
    }.toMap
}

/** Truncation-tolerant pull-parse of one trail file from its start; close()
  * releases the stream even when the iterator is abandoned early (slice /
  * seek stop mid-file). */
private[sources] final class TolerantTrailIterator(f: File)
    extends Iterator[TrailUpdate] with AutoCloseable {
  private val in = new BufferedInputStream(new FileInputStream(f), 1 << 16)
  private val it = {
    val xf = javax.xml.stream.XMLInputFactory.newInstance()
    xf.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    xf.setProperty(
      javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    GoldenGateTrail.parseTrailReader(
      xf.createXMLStreamReader(in, "UTF-8"),
      onClose = () => in.close(),
      tolerateTruncation = true)
  }
  override def hasNext: Boolean = it.hasNext
  override def next(): TrailUpdate = it.next()
  override def close(): Unit =
    try in.close() catch { case _: Throwable => () }
}

private[sources] class GgTrailTable(path: String) extends Table with SupportsRead {
  require(path != null, "graft-ggtrail requires a path option")
  override def name(): String = s"graft-ggtrail:$path"
  override def schema(): StructType = GgTrailSourceV2.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GgTrailScan(path, options)
}

private[sources] class GgTrailScan(path: String,
    options: CaseInsensitiveStringMap) extends ScanBuilder with Scan {
  override def build(): Scan = this
  override def readSchema(): StructType = GgTrailSourceV2.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GgTrailMicroBatchStream(path,
      Option(options.get("sinceScn")).map(_.toLong))
}

/** Offset = `{"<abs file path>":updatesConsumed,...}`. Paths are local
  * filesystem paths (no quotes/backslashes), so plain quoting suffices. */
private[graft] case class GgTrailOffset(counts: Map[String, Long]) extends Offset {
  override def json(): String =
    counts.toSeq.sortBy(_._1)
      .map { case (f, n) => s""""$f":$n""" }.mkString("{", ",", "}")
}

private[graft] object GgTrailOffset {
  private val Entry = """"([^"]+)":(\d+)""".r
  def parse(json: String): GgTrailOffset =
    GgTrailOffset(Entry.findAllMatchIn(json)
      .map(m => m.group(1) -> m.group(2).toLong).toMap)
}

private[graft] class GgTrailMicroBatchStream(path: String,
    sinceScn: Option[Long]) extends MicroBatchStream {
  import GgTrailSourceV2._

  // (length, completeUpdates) per file at the last scan — appends-only
  // contract lets each trigger rescan just the new bytes
  private val cache = scala.collection.mutable.Map.empty[String, (Long, Long)]

  override def initialOffset(): Offset =
    GgTrailOffset(sinceScn.map(seek(path, _)).getOrElse(Map.empty))

  override def latestOffset(): Offset = {
    val counts = trailFiles(path).map { f =>
      val p = f.getAbsolutePath
      val len = f.length()
      val n = cache.get(p) match {
        case Some((prevLen, prevN)) if prevLen == len => prevN
        case prev =>
          // incremental rescan: only bytes appended since the last trigger
          // (plus a |tag|-1 boundary carry) are read; tags fully inside
          // the counted prefix are excluded by the endAfter threshold
          val (prevLen, prevN) = prev.getOrElse((0L, 0L))
          val carry = math.max(0L, prevLen - (CloseTag.length - 1))
          prevN + countCloseTags(f, carry, endAfter = prevLen)
      }
      cache(p) = (len, n)
      p -> n
    }.toMap
    GgTrailOffset(counts)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GgTrailOffset].counts
    val e = end.asInstanceOf[GgTrailOffset].counts
    e.toSeq.sortBy(_._1).flatMap { case (file, endN) =>
      val startN = s.getOrElse(file, 0L)
      if (endN > startN)
        Some(GgTrailPartition(file, startN, endN,
          sinceScn.getOrElse(Long.MinValue)))
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GgTrailReaderFactory
  override def deserializeOffset(json: String): Offset = GgTrailOffset.parse(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Updates [startIdx, endIdx) of one trail file, row-filtered to
  * scn > sinceScn. */
private[sources] case class GgTrailPartition(file: String, startIdx: Long,
    endIdx: Long, sinceScn: Long) extends InputPartition

private[sources] class GgTrailReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GgTrailPartition]
    new GgTrailPartitionReader(p)
  }
}

private[sources] class GgTrailPartitionReader(p: GgTrailPartition)
    extends PartitionReader[InternalRow] {

  // parse from the file start, emit the [startIdx, endIdx) slice: index
  // positions are stable under append, and a live tail file is bounded by
  // GG's rotation size, so the re-parse cost per trigger is bounded.
  // Iterator.slice takes Int — a trail file beyond 2^31 updates cannot be
  // addressed, so FAIL loudly rather than silently dropping the tail
  // (rotation bounds make the limit unreachable in practice)
  require(p.endIdx <= Int.MaxValue && p.startIdx <= Int.MaxValue,
    s"trail slice [${p.startIdx}, ${p.endIdx}) exceeds Int.MaxValue " +
      s"updates in one file (${p.file}) — rotate the trail")
  private val raw = new TolerantTrailIterator(new java.io.File(p.file))
  private val it = raw
    .slice(p.startIdx.toInt, p.endIdx.toInt)
    .filter(_.scn > p.sinceScn)

  private val row = new GenericInternalRow(6)
  private var u: TrailUpdate = _

  override def next(): Boolean = {
    if (!it.hasNext) return false
    u = it.next()
    true
  }

  override def get(): InternalRow = {
    row.update(0, u.scn)
    row.update(1, u.seq)
    row.update(2, UTF8String.fromString(u.table))
    row.update(3, UTF8String.fromString(u.opType))
    row.update(4, UTF8String.fromString(u.txnTimestamp))
    val ks = u.columns.keys.toArray
    row.update(5, ArrayBasedMapData(
      ks.map(k => UTF8String.fromString(k): Any),
      ks.map(k => UTF8String.fromString(u.columns(k)): Any)))
    row
  }

  override def close(): Unit = raw.close()
}
