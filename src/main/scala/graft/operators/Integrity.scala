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

/** P15 — transport/storage compression (CompressUtil.java:12-14: gzip of
  * /register responses, `compress=true` request param). Columnar
  * equivalent is codec selection on the event-log files; the row-level
  * gzip codec covers the wire-payload case (a payload column compressed
  * before leaving the engine, exactly the reference's response gzip). */
object Compression {
  /** Session-level default codec for event-log writes. */
  def setCodec(spark: org.apache.spark.sql.SparkSession, codec: String): Unit =
    spark.conf.set("spark.sql.parquet.compression.codec", codec)
  val Gzip = "gzip"
  val Snappy = "snappy"
  val Zstd = "zstd"

  /** Gzip a binary column (CompressUtil.compress analog). */
  val gzip: Column => Column = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else {
        val out = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(out)
        gz.write(bytes); gz.close()
        out.toByteArray
      }
    }
    c => f(c)
  }

  /** Gunzip a binary column (CompressUtil.uncompress analog). */
  val gunzip: Column => Column = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](1 << 14)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        in.close()
        out.toByteArray
      }
    }
    c => f(c)
  }
}
