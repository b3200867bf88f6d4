package graft.sources

import java.sql.{Connection, DriverManager, ResultSet, Types}
import java.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1, live form — the txlog capture running against an actual JDBC
  * database, the reference's prescribed operating mode
  * (OracleTxlogEventReader.java:155 opens a connection per poll cycle and
  * runs the sy$view ⋈ sy$txlog query with `tx.scn > lastScn`, :613-704).
  *
  * Two entry points:
  *  - [[JdbcTxlogCapture.read]] — batch incremental pull:
  *    `spark.read.jdbc` over the reference's capture query with the
  *    sinceScn bound inlined, optionally split into `numPartitions`
  *    even scn bands so executors pull ranges in parallel;
  *  - `format("graft-jdbc-capture")` — the capture as a MicroBatchStream
  *    (SURVEY §2.1's Spark mapping for S1): offsets are high-watermark
  *    SCNs, `latestOffset` polls `max(scn)` from the txlog, and each
  *    micro-batch runs the capture query banded to `(start, end]` — the
  *    reference's poll loop re-expressed as streaming offset algebra.
  *
  * The fixture DB is embedded Derby (on the Spark classpath); any JDBC
  * url works — table names are caller-supplied and pre-quoted, since
  * `sy$…` needs quoting on dialects that reserve `$` (Derby) and not on
  * Oracle.
  */
object JdbcTxlogCapture {

  /** The reference capture query (skip-infinity-scn variant,
    * OracleTxlogEventReader.java:621-645) with bounds inlined for JDBC
    * subquery pushdown: `(lo, hi]` on tx.scn. */
  def boundCaptureQuery(viewTable: String, txlogTable: String,
      sinceScn: Long, untilScn: Long = Long.MaxValue): String =
    s"select tx.scn scn, tx.ts event_timestamp, src.* " +
      s"from $viewTable src, $txlogTable tx " +
      s"where src.txn=tx.txn and tx.scn > $sinceScn and tx.scn <= $untilScn"

  /** Txn-chunked capture (resumable pages of `chunk` transactions).
    * The reference pages with `row_number() OVER (ORDER BY tx.scn) <= ?`
    * (OracleTxlogEventReader.java:692-704; that Oracle-dialect text is
    * what [[TxlogCapture.chunkedCaptureQuery]] generates); this bound
    * form uses the equivalent portable shape — cap scn at the chunk-th
    * smallest pending scn via FETCH FIRST — which runs on any SQL:2008
    * dialect incl. embedded Derby (no window functions there). Ties on
    * the boundary scn admit the whole transaction window, the same
    * never-split-a-window contract as [[TxlogCapture.captureChunked]]. */
  def boundChunkedQuery(viewTable: String, txlogTable: String,
      sinceScn: Long, chunk: Long): String =
    s"SELECT tx.scn scn, tx.ts event_timestamp, src.* " +
      s"FROM $viewTable src, $txlogTable tx " +
      s"WHERE src.txn=tx.txn AND tx.scn > $sinceScn AND tx.scn <= " +
      s"(SELECT max(b.scn) FROM (SELECT t2.scn FROM $txlogTable t2 " +
      s"WHERE t2.scn > $sinceScn ORDER BY t2.scn " +
      s"FETCH FIRST $chunk ROWS ONLY) b)"

  /** Incremental batch pull through `spark.read.jdbc`. With
    * `numPartitions` > 1 the scn tail `(sinceScn, max(scn)]` is split
    * into even bands and each executor pulls its own range — the
    * seeder-style parallel first-capture; steady-state polls leave it at
    * 1 (the tail is small by definition). */
  def read(spark: SparkSession, url: String, viewTable: String,
      txlogTable: String, sinceScn: Long, numPartitions: Int = 1)
      : DataFrame = {
    val props = new java.util.Properties()
    if (numPartitions <= 1) {
      spark.read.jdbc(url,
        s"(${boundCaptureQuery(viewTable, txlogTable, sinceScn)}) src", props)
    } else {
      val hi = maxScn(url, txlogTable)
      if (hi <= sinceScn)
        spark.read.jdbc(url,
          s"(${boundCaptureQuery(viewTable, txlogTable, sinceScn)}) src",
          props)
      else {
        val bounds = (0 to numPartitions).map(i =>
          sinceScn + (hi - sinceScn) * i / numPartitions)
        val queries = bounds.sliding(2).map { case Seq(lo, h) =>
          s"(${boundCaptureQuery(viewTable, txlogTable, lo, h)}) src"
        }.toSeq
        queries.map(q => spark.read.jdbc(url, q, props))
          .reduce(_ unionByName _)
      }
    }
  }

  /** Chunked batch pull (first `chunk` transactions after sinceScn). */
  def readChunked(spark: SparkSession, url: String, viewTable: String,
      txlogTable: String, sinceScn: Long, chunk: Long): DataFrame =
    spark.read.jdbc(url,
      s"(${boundChunkedQuery(viewTable, txlogTable, sinceScn, chunk)}) src",
      new java.util.Properties())

  /** Control-plane poll: the txlog high-watermark (reference getMaxScn,
    * OracleTxlogEventReader.java:562-585). */
  def maxScn(url: String, txlogTable: String): Long = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement()
        .executeQuery(s"SELECT max(tx.scn) FROM $txlogTable tx")
      if (rs.next() && rs.getObject(1) != null) rs.getLong(1) else -1L
    } finally conn.close()
  }

  /** Output schema of the capture query, discovered from JDBC metadata
    * (a zero-row probe of the exact query shape). */
  def captureSchema(url: String, viewTable: String, txlogTable: String)
      : StructType = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        boundCaptureQuery(viewTable, txlogTable, Long.MaxValue - 1,
          Long.MaxValue))
      val md = rs.getMetaData
      StructType((1 to md.getColumnCount).map { i =>
        val dt = md.getColumnType(i) match {
          case Types.BIGINT => LongType
          case Types.INTEGER | Types.SMALLINT | Types.TINYINT => IntegerType
          case Types.DOUBLE | Types.FLOAT | Types.REAL => DoubleType
          case Types.DECIMAL | Types.NUMERIC => DoubleType
          case Types.TIMESTAMP => TimestampType
          case Types.VARCHAR | Types.CHAR | Types.CLOB | Types.LONGVARCHAR =>
            StringType
          case other => throw new IllegalArgumentException(
            s"unsupported JDBC type $other for column ${md.getColumnName(i)}")
        }
        StructField(md.getColumnLabel(i).toLowerCase, dt,
          md.isNullable(i) != java.sql.ResultSetMetaData.columnNoNulls)
      })
    } finally conn.close()
  }
}

/** `format("graft-jdbc-capture")` — S1 as a Spark streaming source.
  * Options: `url`, `view` (pre-quoted view table), `txlog` (pre-quoted
  * txlog table), `startingScn` (exclusive; default -1 = everything),
  * `maxScnPerBatch` (admission cap on scn advance per micro-batch,
  * default unbounded), `numPartitions` (scn-band split per batch). */
class JdbcCaptureSourceV2 extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-jdbc-capture"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JdbcTxlogCapture.captureSchema(options.get("url"),
      options.get("view"), options.get("txlog"))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new JdbcCaptureTable(schema, properties.get("url"),
      properties.get("view"), properties.get("txlog"))
}

private[sources] class JdbcCaptureTable(schema0: StructType, url: String,
    view: String, txlog: String) extends Table with SupportsRead {
  require(url != null && view != null && txlog != null,
    "graft-jdbc-capture requires url, view, txlog options")
  override def name(): String = s"graft-jdbc-capture:$url/$view"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new JdbcCaptureScan(schema0, url, view, txlog, options)
}

private[sources] class JdbcCaptureScan(schema0: StructType, url: String,
    view: String, txlog: String, options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan {
  override def build(): Scan = this
  override def readSchema(): StructType = schema0
  override def description(): String = s"JdbcCaptureScan($view ⋈ $txlog)"

  override def toBatch: org.apache.spark.sql.connector.read.Batch =
    new org.apache.spark.sql.connector.read.Batch {
      override def planInputPartitions(): Array[InputPartition] =
        JdbcCaptureStream.bandedPartitions(url, view, txlog,
          Option(options.get("startingScn")).map(_.toLong).getOrElse(-1L),
          JdbcTxlogCapture.maxScn(url, txlog),
          options.getInt("numPartitions", 1))
      override def createReaderFactory(): PartitionReaderFactory =
        new JdbcCaptureReaderFactory(schema0)
    }

  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new JdbcCaptureStream(schema0, url, view, txlog, options)
}

/** Offset = txlog high-watermark scn. */
private[graft] case class ScnOffset(scn: Long) extends Offset {
  override def json(): String = s"""{"scn":$scn}"""
}
private[graft] object ScnOffset {
  private val Re = """\{"scn":(-?\d+)\}""".r
  def parse(json: String): ScnOffset = json match {
    case Re(v) => ScnOffset(v.toLong)
    case other =>
      throw new IllegalArgumentException(s"bad scn offset: $other")
  }
}

private[sources] object JdbcCaptureStream {
  /** Split `(lo, hi]` into up to n even scn bands (empty when nothing
    * pending). */
  def bandedPartitions(url: String, view: String, txlog: String, lo: Long,
      hi: Long, n: Int): Array[InputPartition] =
    if (hi <= lo) Array.empty
    else {
      val parts = math.max(1, n)
      val bounds = (0 to parts).map(i => lo + (hi - lo) * i / parts).distinct
      bounds.sliding(2).collect { case Seq(a, b) if b > a =>
        JdbcCapturePartition(url, view, txlog, a, b): InputPartition
      }.toArray
    }
}

private[sources] class JdbcCaptureStream(schema0: StructType, url: String,
    view: String, txlog: String, options: CaseInsensitiveStringMap)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private val startScn =
    Option(options.get("startingScn")).map(_.toLong).getOrElse(-1L)
  private val maxScnPerBatch =
    Option(options.get("maxScnPerBatch")).map(_.toLong)
  private val numPartitions = options.getInt("numPartitions", 1)

  // AvailableNow: pin the head once, drain to it in bounded batches even
  // if the database keeps committing behind us
  private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(JdbcTxlogCapture.maxScn(url, txlog))

  override def initialOffset(): Offset = ScnOffset(startScn)
  override def latestOffset(): Offset =
    ScnOffset(availableNowTarget.getOrElse(JdbcTxlogCapture.maxScn(url, txlog)))

  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : Offset = {
    val s = start.asInstanceOf[ScnOffset].scn
    val head = availableNowTarget.getOrElse(JdbcTxlogCapture.maxScn(url, txlog))
    val capped = maxScnPerBatch.fold(head)(m => math.min(head, s + m))
    ScnOffset(math.max(s, capped))
  }
  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
  override def reportLatestOffset(): Offset = latestOffset()

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] =
    JdbcCaptureStream.bandedPartitions(url, view, txlog,
      start.asInstanceOf[ScnOffset].scn, end.asInstanceOf[ScnOffset].scn,
      numPartitions)

  override def createReaderFactory(): PartitionReaderFactory =
    new JdbcCaptureReaderFactory(schema0)
  override def deserializeOffset(json: String): Offset = ScnOffset.parse(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One scn band `(lo, hi]` of the capture query. */
private[sources] case class JdbcCapturePartition(url: String, view: String,
    txlog: String, lo: Long, hi: Long) extends InputPartition

private[sources] class JdbcCaptureReaderFactory(schema0: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[JdbcCapturePartition]
    new JdbcCaptureReader(p, schema0)
  }
}

/** Executor-side JDBC pull of one scn band: opens its own connection
  * (the reference's per-cycle connection, OracleTxlogEventReader.java:155)
  * and streams the ResultSet straight into InternalRows. */
private[sources] class JdbcCaptureReader(p: JdbcCapturePartition,
    schema0: StructType) extends PartitionReader[InternalRow] {
  private var conn: Connection = _
  private var rs: ResultSet = _
  private def ensureOpen(): Unit = if (conn == null) {
    conn = DriverManager.getConnection(p.url)
    rs = conn.createStatement().executeQuery(
      JdbcTxlogCapture.boundCaptureQuery(p.view, p.txlog, p.lo, p.hi))
  }
  override def next(): Boolean = { ensureOpen(); rs.next() }
  override def get(): InternalRow = {
    val row = new Array[Any](schema0.length)
    var i = 0
    while (i < schema0.length) {
      val v = schema0.fields(i).dataType match {
        case LongType => rs.getLong(i + 1)
        case IntegerType => rs.getInt(i + 1)
        case DoubleType => rs.getDouble(i + 1)
        case TimestampType =>
          val ts = rs.getTimestamp(i + 1)
          if (ts == null) null else DateTimeUtils.fromJavaTimestamp(ts)
        case StringType =>
          val s = rs.getString(i + 1)
          if (s == null) null else UTF8String.fromString(s)
        case other => throw new IllegalArgumentException(
          s"unsupported type $other")
      }
      row(i) = if (rs.wasNull()) null else v
      i += 1
    }
    InternalRow.fromSeq(row.toIndexedSeq)
  }
  override def close(): Unit = {
    if (rs != null) rs.close()
    if (conn != null) conn.close()
  }
}
