package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P16 — event integrity checksums.
  *
  * Reference: every event carries headerCrc/bodyCrc validated on read and
  * append (util/ByteBufferCRC32.java:1; DbusEventV2.java:136-166). In the
  * columnar engine parquet page checksums cover storage corruption; this
  * operator reproduces the *end-to-end* application-level check for
  * payload bytes crossing process boundaries (e.g. the Avro payload column).
  */
object Integrity {

  /** CRC32 of a binary column (crc32 is codegen'd). */
  def bodyCrc(payload: Column): Column = crc32(payload)

  /** Stamp a payload CRC onto the envelope. */
  def withCrc(envelope: DataFrame, payloadCol: String = "payload"): DataFrame =
    envelope.withColumn("body_crc", bodyCrc(col(payloadCol)))

  /** Validate stamped CRCs; returns rows that FAIL (empty = healthy).
    * The reference throws on mismatch during the scan — callers can
    * `require(validate(df).isEmpty)` for the same contract. */
  def validate(envelope: DataFrame, payloadCol: String = "payload",
      crcCol: String = "body_crc"): DataFrame =
    // null-safe inequality: a null payload or never-stamped crc is a
    // failure, not a silently-passing row
    envelope.where(!(bodyCrc(col(payloadCol)) <=> col(crcCol)))
}

/** P15 — transport/storage compression knobs (CompressUtil.java:12-14 gzip
  * of /register responses). Columnar equivalent: codec selection on the
  * event-log files. */
object Compression {
  /** Session-level default codec for event-log writes. */
  def setCodec(spark: org.apache.spark.sql.SparkSession, codec: String): Unit =
    spark.conf.set("spark.sql.parquet.compression.codec", codec)
  val Gzip = "gzip"
  val Snappy = "snappy"
  val Zstd = "zstd"
}
