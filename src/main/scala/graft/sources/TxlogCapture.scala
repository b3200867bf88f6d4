package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1 — the txlog capture operator: how the CDC feed itself is
  * materialized from a source-of-truth database.
  *
  * Reference: OracleTxlogEventReader polls
  * `SELECT tx.scn scn, tx.ts event_timestamp, src.* FROM sy$<view> src,
  * sy$txlog tx WHERE src.txn = tx.txn AND tx.scn > ?` with three variants
  * (skip-infinity-scn, getScn, txn-chunked with `row_number() OVER (ORDER
  * BY TX.SCN)`) — databus2-relay/.../db/OracleTxlogEventReader.java:613-704.
  *
  * Spark-first split:
  *  - [[captureQuery]]/[[chunkedCaptureQuery]] generate the *pushdown SQL*
  *    for a JDBC source (`spark.read.jdbc(query)`) — the reference's query
  *    shapes minus Oracle-isms, parameterized by sinceScn;
  *  - [[capture]] runs the same join declaratively over already-loaded
  *    frames (txlog ⋈ source-view on txn), which is the form the engine
  *    uses when the txlog is itself a table/stream. Catalyst handles the
  *    equi-join (broadcast when the polled window is small — it always is,
  *    since `scn > sinceScn` bounds it to the new tail).
  */
object TxlogCapture {

  /** Plain incremental capture query (skip-infinity-scn variant,
    * OracleTxlogEventReader.java:621-645). `?` = sinceScn. */
  def captureQuery(eventView: String, schema: String = ""): String =
    s"select tx.scn scn, tx.ts event_timestamp, src.* " +
      s"from ${schema}sy$$$eventView src, ${schema}sy$$txlog tx " +
      s"where src.txn=tx.txn and tx.scn > ? and tx.scn < ${Long.MaxValue}"

  /** Txn-chunked capture (resumable pages of `chunkSize` transactions,
    * OracleTxlogEventReader.java:692-704 shape). `?` = (sinceScn, chunk). */
  def chunkedCaptureQuery(eventView: String, schema: String = ""): String =
    s"SELECT scn, event_timestamp, src.* FROM ${schema}sy$$$eventView src, " +
      s"( SELECT tx.scn scn, tx.ts event_timestamp, tx.txn, " +
      s"row_number() OVER (ORDER BY TX.SCN) r FROM ${schema}sy$$txlog tx " +
      s"WHERE tx.scn > ? AND tx.scn < ${Long.MaxValue}) t " +
      s"WHERE src.txn = t.txn AND r <= ?"

  /** Declarative capture: join the txlog tail onto the source view.
    * `txlog`: (txn, scn, ts); `srcView`: (txn, <columns>). A steady-state
    * poll cycle's tail is small, so it broadcasts by default — but an
    * initial capture (sinceScn < 0) or a long-downtime catch-up has an
    * unbounded tail, so the hint is dropped there and AQE picks the join
    * (a first capture is a seeder-shaped full scan, B7). Callers can
    * force either way via `broadcastTail`. */
  def capture(srcView: DataFrame, txlog: DataFrame, sinceScn: Long,
      broadcastTail: Option[Boolean] = None): DataFrame = {
    val tail = txlog.where(col("scn") > sinceScn)
      .select(col("txn"), col("scn"), col("ts").as("event_timestamp"))
    val doBroadcast = broadcastTail.getOrElse(sinceScn >= 0)
    srcView.join(if (doBroadcast) broadcast(tail) else tail, "txn")
  }

  /** Chunked declarative capture: first `chunkTxns` transactions after
    * sinceScn. The chunk boundary (the chunkTxns-th smallest scn) comes
    * from a distributed top-K (`orderBy.limit` plans as
    * TakeOrderedAndProject — per-partition heaps, no single-partition
    * window sort), then the tail is the banded filter below it. Ties on
    * scn admit the whole window — correct for the capture contract: a
    * transaction window is never split (SURVEY §7.4). */
  def captureChunked(srcView: DataFrame, txlog: DataFrame, sinceScn: Long,
      chunkTxns: Int): DataFrame = {
    val tail0 = txlog.where(col("scn") > sinceScn)
    val bound = tail0.select(col("scn")).orderBy(col("scn")).limit(chunkTxns)
      .agg(max(col("scn"))).head()
    val banded = if (bound.isNullAt(0)) tail0
      else tail0.where(col("scn") <= bound.getLong(0))
    val tail = banded.select(col("txn"), col("scn"),
      col("ts").as("event_timestamp"))
    srcView.join(broadcast(tail), "txn")
  }
}

/** S7 — deterministic synthetic event generator (load/testing).
  *
  * Reference: DatabusEventRandomProducer.startGeneration(eventsPerSec,
  * duration…) + the `/genDataEvents` relay command
  * (databus-core/.../util/DatabusEventRandomProducer.java:93-131;
  * GenerateDataEventsRequestProcessor.java:131-157).
  *
  * Batch form is seed-deterministic arithmetic over `sequence()` (oracle-
  * reproducible); streaming form rides the `rate` source (rowsPerSecond =
  * eventsPerSec, A6 rate control).
  */
object SyntheticFeed {

  /** One shared envelope projection over a seq column — the batch and
    * streaming forms differ ONLY in where seq/ts come from, so the
    * synthetic distribution can never silently diverge between them
    * (the batch form is the streaming form's oracle). */
  private def project(seqCol: org.apache.spark.sql.Column,
      tsCol: org.apache.spark.sql.Column, numSources: Int,
      numKeys: Long, windowSize: Int): Seq[org.apache.spark.sql.Column] = Seq(
    (seqCol - seqCol % windowSize).as("scn"),
    seqCol.as("seq"),
    tsCol.as("ts_us"),
    ((seqCol * 2654435761L) % numSources + 1).cast("int").as("source_id"),
    (((seqCol * 1103515245L + 12345L) % numKeys) % 4).cast("int")
      .as("partition_id"),
    when((seqCol * 31L) % 10 === 0, "DELETE").otherwise("UPSERT").as("opcode"),
    ((seqCol * 1103515245L + 12345L) % numKeys).as("key_long"),
    ((seqCol * 7919L % 10000L) / lit(100.0)).as("value"),
    lit(null).cast("string").as("props"))

  /** Deterministic batch of n events: LCG-ish column arithmetic — same
    * output everywhere, no RNG state. */
  def generate(spark: SparkSession, n: Long, numSources: Int = 5,
      numKeys: Long = 1000L, windowSize: Int = 10): DataFrame =
    spark.range(0, n).toDF("seq").select(project(col("seq"),
      lit(1700000000000000L) + col("seq") * 1000000L,
      numSources, numKeys, windowSize): _*)

  /** Streaming form at a target events/sec (rate source → envelope). */
  def stream(spark: SparkSession, eventsPerSec: Int, numSources: Int = 5,
      numKeys: Long = 1000L, windowSize: Int = 10): DataFrame = {
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", eventsPerSec).load()
    rate.select(project(col("value"), unix_micros(col("timestamp")),
      numSources, numKeys, windowSize): _*)
  }
}
