package graft.sources

import java.io.File

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** B9 — the Avro-file bootstrap variant: seed/serve a snapshot from Avro
  * container files with (file, record-offset) resumability.
  *
  * Reference: BootstrapAvroFileEventReader / BootstrapAvroFileSeederMain
  * (databus-bootstrap-utils/.../BootstrapAvroFileEventReader.java:1);
  * checkpoints carry `snapshot_file_record_offset`
  * (Checkpoint.java:116-118,196-199).
  *
  * The distribution's Spark build has no spark-avro module, so the
  * container-file IO rides the bundled avro jars inside `mapPartitions` —
  * one writer/reader per task, one container file per partition (the same
  * parallel grain the reference's per-file readers use). Local-filesystem
  * paths here; the IO seam is the `File` handle, swappable for an HDFS
  * stream at scale.
  */
object AvroFileBootstrap {

  case class SnapshotRow(id: Long, scn: Long, srckey: Long, payload: Array[Byte])
  case class PositionedRow(file: String, recordOffset: Long, id: Long,
      scn: Long, srckey: Long, payload: Array[Byte])

  val rowSchemaJson: String =
    """{"type":"record","name":"SnapshotRow","namespace":"graft.bootstrap",
      |"fields":[
      |{"name":"id","type":"long"},{"name":"scn","type":"long"},
      |{"name":"srckey","type":"long"},{"name":"payload","type":"bytes"}
      |]}""".stripMargin.replaceAll("\n", "")

  /** Seed: write the snapshot frame as `numFiles` Avro container files
    * (`part-NNNNN.avro`), rows id-ordered within each file. */
  def writeSnapshot(snapshot: Dataset[SnapshotRow], dir: String,
      numFiles: Int): Unit = {
    val d = new File(dir)
    d.mkdirs()
    // clear previous part files: a re-seed with fewer partitions must not
    // leave stale files that a later read would serve alongside the new
    // snapshot
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".avro")).foreach(_.delete())
    val schemaJson = rowSchemaJson
    snapshot
      .repartitionByRange(numFiles, col("id"))
      .sortWithinPartitions("id")
      .mapPartitions { rows =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val schema = new Schema.Parser().parse(schemaJson)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        val f = new File(dir, f"part-$pid%05d.avro")
        w.create(schema, f)
        var n = 0L
        rows.foreach { r =>
          val rec = new GenericData.Record(schema)
          rec.put("id", r.id); rec.put("scn", r.scn); rec.put("srckey", r.srckey)
          rec.put("payload", java.nio.ByteBuffer.wrap(r.payload))
          w.append(rec); n += 1
        }
        w.close()
        Iterator.single(n)
      }(org.apache.spark.sql.Encoders.scalaLong)
      .collect()
  }

  /** Serve: read the snapshot dir in parallel (one task per container
    * file), resuming after checkpoint (`afterFile`, `afterRecordOffset`) —
    * earlier files are pruned driver-side, the partial file skips records
    * (the reference's block+record offset seek). */
  def readSnapshot(spark: SparkSession, dir: String, afterFile: String = "",
      afterRecordOffset: Long = -1L): Dataset[PositionedRow] = {
    import spark.implicits._
    val files = Option(new File(dir).listFiles()).getOrElse(
        throw new IllegalStateException(s"snapshot dir missing/unreadable: $dir"))
      .filter(_.getName.endsWith(".avro")).map(_.getName).sorted
      .filter(f => afterFile.isEmpty || f >= afterFile)
      .toSeq
    val schemaJson = rowSchemaJson
    spark.createDataset(files).repartition(math.max(files.size, 1))
      .flatMap { fname =>
        val schema = new Schema.Parser().parse(schemaJson)
        val r = new DataFileReader[GenericRecord](
          new File(dir, fname), new GenericDatumReader[GenericRecord](schema))
        val skip = if (fname == afterFile) afterRecordOffset else -1L
        // close on task completion even if the iterator is abandoned
        // (limit/take/failure) — otherwise the container handle leaks
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            try r.close() catch { case _: Throwable => () }))
        new Iterator[PositionedRow] {
          private var idx = -1L
          private var nextRow: PositionedRow = null
          private def advance(): Unit = {
            nextRow = null
            while (nextRow == null && r.hasNext) {
              val rec = r.next()
              idx += 1
              if (idx > skip) {
                val buf = rec.get("payload").asInstanceOf[java.nio.ByteBuffer]
                val bytes = new Array[Byte](buf.remaining()); buf.get(bytes)
                nextRow = PositionedRow(fname, idx,
                  rec.get("id").asInstanceOf[Long],
                  rec.get("scn").asInstanceOf[Long],
                  rec.get("srckey").asInstanceOf[Long], bytes)
              }
            }
            if (nextRow == null) r.close()
          }
          advance()
          override def hasNext: Boolean = nextRow != null
          override def next(): PositionedRow = {
            val out = nextRow; advance(); out
          }
        }
      }
  }
}
