package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{LogicalSource, SourceRegistry}

/** Turns the driver's `events` parquet table into the engine's CDC change
  * feed (the envelope DataFrame) — the role the reference's event producers
  * play when they append captured rows into the relay buffer
  * (OracleTxlogEventReader.readEventsFromAllSources →
  * DbusEventBuffer.appendEvent; databus2-relay/.../db/OracleTxlogEventReader
  * .java:155, DbusEventBuffer.java:1705).
  *
  * Mapping (FIXTURES.md §6): each `events` row is one captured change.
  *  - `seq`          = event_id — unique, monotone (buffer offset analog)
  *  - `scn`          = event_id - event_id % windowSize — the transaction
  *                     window id; all rows of one commit batch share it
  *                     (DbusEventBuffer.java:1982 endEvents(windowScn))
  *  - `partition_id` = key mod nPartitions — physical partition routing
  *                     (DbusHashPartitionRouter.java:1 shape, arithmetic mod
  *                     so external oracles can reproduce it)
  *  - `source_id`    = registry id of event_type (the logical source/table)
  *  - `opcode`       = DELETE for the `error` type, else UPSERT
  *                     (DbusOpcode.java:22-26)
  *  - `ts_ns`        = event timestamp as ns-since-epoch
  *
  * Everything is a pure column expression: at 100 TB this is a narrow
  * map over the parquet scan — no shuffle, no UDF, fully codegen'd, and
  * filters on scn/source_id/partition_id push down to the scan because the
  * columns are thin arithmetic over scanned columns.
  */
object ChangeFeed {

  /** Rows per transaction window (commit batch). */
  val WindowSize = 10

  /** Physical partitions of the feed (DbusEventBufferMult timeline count). */
  val NumPartitions = 4

  /** The catalog of logical sources captured by the feed
    * (SourceIdNameRegistry.java:1 analog). */
  val registry: SourceRegistry = SourceRegistry(Seq(
    LogicalSource(1, "click"),
    LogicalSource(2, "view"),
    LogicalSource(3, "purchase"),
    LogicalSource(4, "signup"),
    LogicalSource(5, "error")))

  def raw(spark: SparkSession, sfDir: String): DataFrame = {
    // Generator vintages differ on the ts column's physical type:
    // TIMESTAMP(NANOS) (rejected by Spark's reader unless the legacy conf
    // maps it to LongType ns-since-epoch), TIMESTAMP(MICROS) with or
    // without UTC adjustment. Set the nanos conf unconditionally (it only
    // affects NANOS files) and let [[envelope]] normalize per-type.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
  }

  /** source name → id as a column expression (a broadcast-free CASE chain;
    * the registry is tiny and constant-folded by Catalyst). */
  def sourceIdCol(eventType: Column): Column = registry.idCol(eventType)

  def opcodeCol(eventType: Column): Column =
    when(eventType === "error", lit("DELETE")).otherwise(lit("UPSERT"))

  /** The envelope projection of the raw feed. Column set mirrors
    * graft.model.DbusEvent (snake_case at the DataFrame surface). */
  def envelope(raw: DataFrame): DataFrame =
    raw.select(
      (col("event_id") - col("event_id") % WindowSize).as("scn"),
      col("event_id").as("seq"),
      tsMicrosCol(raw).as("ts_us"),
      sourceIdCol(col("event_type")).as("source_id"),
      (col("user_id") % NumPartitions).cast("int").as("partition_id"),
      opcodeCol(col("event_type")).as("opcode"),
      col("user_id").as("key_long"),
      col("value").as("value"),
      col("props").as("props"))

  def envelope(spark: SparkSession, sfDir: String): DataFrame =
    envelope(raw(spark, sfDir))

  /** `ts` normalized to µs-since-epoch (LongType), whatever the physical
    * type the generator wrote: LongType is legacy-nanos (exact integer
    * division by 1000); TIMESTAMP is unix_micros; TIMESTAMP_NTZ is
    * µs since the NTZ epoch via timestampdiff — deliberately timezone-
    * independent (NO cast through TimestampType, which would re-interpret
    * the wall-clock value in the session zone), matching how DuckDB's
    * epoch_us reads the same naive column in the oracle. µs is the
    * portable envelope resolution — external engines and parquet
    * TIMESTAMP readers generally are µs-native. */
  private def tsMicrosCol(raw: DataFrame): Column =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
      case _ => unix_micros(col("ts"))
    }
}
