package graft.model

import org.apache.spark.sql.types._

/** Opcode of a change event.
  *
  * Reference: databus-core/.../core/DbusOpcode.java:22-26 (UPSERT | DELETE);
  * control events carry opcode 0 (DbusEventV2.java:103-105).
  */
object DbusOpcode {
  val Upsert = "UPSERT"
  val Delete = "DELETE"
  /** Control rows (EOW markers, checkpoint events, SCN regress) have no opcode. */
  val Control: String = null
  val all: Seq[String] = Seq(Upsert, Delete)
}

/** Key type of an event key.
  *
  * Reference: databus-core/.../core/DbusEventKey.java:30-35
  * (LONG | STRING | SCHEMA).
  */
object DbusKeyType {
  val KeyLong = "LONG"
  val KeyString = "STRING"
  val KeySchema = "SCHEMA"
}

/** Event envelope flags.
  *
  * Reference: DbusEventV2.java:103-110 (replicated / trace / has-metadata /
  * has-payload bits; control = opcode 0); DbusEvent.java:79
  * (isEndOfPeriodMarker).
  */
case class DbusFlags(
    replicated: Boolean = false,
    traceOn: Boolean = false,
    eow: Boolean = false,
    control: Boolean = false)

/** The unit of data in the engine — one captured change event.
  *
  * Spark-native re-expression of the reference's binary event envelope
  * (databus-core/.../core/DbusEventV2.java:33-72: version, magic, CRCs,
  * attributes, nanoTimestamp, sourceId, partitionId, sequence, key,
  * metadata part, payload part). Instead of a hand-rolled binary layout we
  * model the envelope as a columnar row — Tungsten's UnsafeRow/parquet
  * encoding replaces the custom ring-buffer byte format, and CRC/mmap
  * concerns disappear (parquet checksums / checkpoint files cover them).
  *
  *  - `scn`    — commit sequence number of the transaction *window* this
  *               event belongs to (all events of one source transaction
  *               share it; DbusEventBuffer.java:1982 endEvents(windowScn)).
  *  - `seq`    — unique, monotone within a partition; orders events inside
  *               a window (the reference uses physical buffer offsets;
  *               Checkpoint.java:66-68 windowOffset).
  *  - `opcode` — UPSERT | DELETE | null (null = control event).
  *  - payload is kept as Avro-binary `BinaryType` until the consumer edge
  *    (zero-copy passthrough fidelity: DbusEventBuffer.java:2235-2420 never
  *    deserializes payloads on the relay).
  */
case class DbusEvent(
    scn: Long,
    seq: Long,
    timestampNs: Long,
    sourceId: Int,
    partitionId: Short,
    opcode: String,
    keyType: String,
    keyLong: Option[Long],
    keyBytes: Option[Array[Byte]],
    schemaId: Array[Byte],
    payload: Array[Byte],
    metadata: Option[Array[Byte]] = None,
    flags: DbusFlags = DbusFlags()) {

  def isControl: Boolean = flags.control
  def isEndOfWindow: Boolean = flags.eow
}

object DbusEvent {
  /** StructType mirror of the case class, for DataFrame-level use. */
  val schema: StructType = StructType(Seq(
    StructField("scn", LongType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("timestampNs", LongType, nullable = false),
    StructField("sourceId", IntegerType, nullable = false),
    StructField("partitionId", ShortType, nullable = false),
    StructField("opcode", StringType, nullable = true),
    StructField("keyType", StringType, nullable = false),
    StructField("keyLong", LongType, nullable = true),
    StructField("keyBytes", BinaryType, nullable = true),
    StructField("schemaId", BinaryType, nullable = true),
    StructField("payload", BinaryType, nullable = true),
    StructField("metadata", BinaryType, nullable = true),
    StructField("flags", StructType(Seq(
      StructField("replicated", BooleanType, nullable = false),
      StructField("traceOn", BooleanType, nullable = false),
      StructField("eow", BooleanType, nullable = false),
      StructField("control", BooleanType, nullable = false))), nullable = false)))
}

/** A logical source = one captured table/view (name + int id).
  *
  * Reference: databus-core/.../data_model/LogicalSource.java:1; the
  * name↔id mapping lives in SourceIdNameRegistry.java:1.
  */
case class LogicalSource(id: Int, name: String)

/** Registry of logical sources (name↔id), the engine's catalog of
  * registered CDC tables. Reference: SourceIdNameRegistry.java:1. */
case class SourceRegistry(sources: Seq[LogicalSource]) {
  private val byName = sources.map(s => s.name -> s).toMap
  private val byId = sources.map(s => s.id -> s).toMap
  def idOf(name: String): Int = byName(name).id
  def nameOf(id: Int): String = byId(id).name
  def ids: Seq[Int] = sources.map(_.id)
  def contains(name: String): Boolean = byName.contains(name)

  /** name column → id column (-1 for unknown): the single CASE fold every
    * envelope projection shares (constant-folded by Catalyst). */
  def idCol(nameCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sources.foldLeft(org.apache.spark.sql.functions.lit(-1)) { (acc, s) =>
      org.apache.spark.sql.functions.when(nameCol === s.name,
        org.apache.spark.sql.functions.lit(s.id)).otherwise(acc)
    }

  /** id column → name column (null for unknown): the inverse CASE fold. */
  def nameCol(idCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sources.foldLeft(
        org.apache.spark.sql.functions.lit(null).cast("string")) { (acc, s) =>
      org.apache.spark.sql.functions.when(idCol === s.id,
        org.apache.spark.sql.functions.lit(s.name)).otherwise(acc)
    }
}
