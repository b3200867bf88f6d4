package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Checkpoint
import graft.operators.{AllowAllFilter, Bootstrap, DbusFilter}

/** The relay event-log on disk + its streaming read path.
  *
  * Reference mapping: the relay's ring buffer + mmap persistence
  * (DbusEventBuffer.java:1277,1540 saveBufferMetaInfo; EventLogWriter/
  * EventLogReader, S8) becomes a directory of *window-aligned* parquet
  * files; the `/stream` pull loop (K1) becomes a Structured Streaming file
  * source over that directory.
  *
  * Window atomicity (SURVEY.md §7.4 hard part #1): the reference's
  * WINDOW_AT_TIME mode guarantees a transaction window is never split
  * across deliveries (DbusEventBuffer.java:2199-2202). Spark-first
  * re-expression: encode the invariant in the *storage layout* — every
  * file contains only whole SCN windows (writer range-partitions on scn),
  * so any micro-batch (a set of files) contains only whole windows. No
  * custom source needed; the built-in file source's listing/offset log
  * provides the SCN-ordered replay + checkpointing.
  */
object RelayStream {

  /** Envelope schema at the streaming surface (file sources need an
    * explicit schema). Key model: `key_long` always set (for STRING keys
    * it is the reference's parse-as-long-else-`String.hashCode` coercion,
    * KeyModFilter.java:55-70, so serving filters stay pure arithmetic);
    * `key_string`/`key_schema`/`meta` are nullable and read as null from
    * event logs written before they existed (parquet fills missing
    * columns). */
  val schema: StructType = StructType(Seq(
    StructField("scn", LongType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("ts_us", LongType, nullable = true),
    StructField("source_id", IntegerType, nullable = false),
    StructField("partition_id", IntegerType, nullable = false),
    StructField("opcode", StringType, nullable = true),
    StructField("key_long", LongType, nullable = true),
    StructField("value", DoubleType, nullable = true),
    StructField("props", StringType, nullable = true),
    StructField("key_string", StringType, nullable = true),
    StructField("key_schema", BinaryType, nullable = true),
    StructField("meta", BinaryType, nullable = true)))

  /** Persist an envelope DataFrame as a window-aligned event log.
    *
    * `filesHint` controls granularity (≈ windows per file). ONE
    * distributed job writes every segment: `repartitionByRange(scn)`
    * keys whole windows, so no transaction window ever splits across
    * files, and task k owns the k-th scn band. The file source lists
    * oldest-mtime-first, so after the write the driver stamps mtimes in
    * part-number order (part number == range-partition task == scn band) —
    * a metadata-only loop over ≤ filesHint files, replacing the old
    * sequential one-coalesced-job-per-chunk + `Thread.sleep` harness.
    * (For strict-order serving prefer the graft-relay V2 source, whose
    * offsets are scn bands and need no mtime convention at all.)
    */
  def writeEventLog(envelope: DataFrame, dir: String, filesHint: Int = 8,
      partitionByTimeline: Boolean = false): Unit = {
    // listing + stamping via the Hadoop FileSystem API (StoreFs), so
    // logs on any URI scheme stamp their generations — a java.io.File
    // walk sees nothing under file:/hdfs:/s3a: roots and would
    // silently skip the stamp the source's admission order relies on
    import graft.pipeline.StoreFs
    val before = StoreFs.listFileStatusesRecursive(dir)
      .filter(_._2.startsWith("part-"))
    val beforePaths = before.map(_._1).toSet
    val w = envelope
      .repartitionByRange(filesHint, col("scn"))
      .sortWithinPartitions("partition_id", "scn", "seq")
      .write.mode("append")
    // hive-partition the log by physical partition: per-timeline
    // subscriptions then prune whole directories at the scan
    // (DbusEventBufferMult one-buffer-per-partition analog)
    (if (partitionByTimeline) w.partitionBy("partition_id") else w)
      .parquet(dir)
    // Stamp only this write's files, in part-number order, from a base
    // strictly above every earlier generation's stamp — append batches
    // stay ordered even when issued within the same millisecond.
    val base = math.max(System.currentTimeMillis(),
      before.map(_._3).foldLeft(0L)(math.max) + 2)
    StoreFs.listFileStatusesRecursive(dir)
      .filter(f => f._2.startsWith("part-") && !beforePaths.contains(f._1))
      .foreach { case (path, name, _) =>
        val k = name match { case PartNum(n) => n.toLong; case _ => 0L }
        // StoreFs.setModificationTime throws on failure: silently
        // keeping write-time mtimes would let the source admit parts
        // out of sequence order
        StoreFs.setModificationTime(path, base + k * 2)
      }
  }

  private val PartNum = """part-(\d+)-.*""".r

  /** Compact an appended event log back to `filesHint` scn-banded
    * segments — the small-file remedy for an append-heavy stream (every
    * micro-batch append adds a file generation; a day of 10 s triggers is
    * ~8,640 generations, and scan/listing cost grows with file count, not
    * data size). Window alignment and per-band ordering are
    * re-established by the same `repartitionByRange(scn)` write
    * discipline.
    *
    * CONCURRENCY CONTRACT: the appending stream must be QUIESCED for the
    * duration of the call. The rewrite snapshots the source file list at
    * read time, so a file appended after that listing would be deleted
    * with the old generation — compaction detects any such late file
    * after the swap and fails (restoring the original dir) rather than
    * lose it. Readers: the swap is two renames, so there is a
    * microseconds-wide window where the dir is absent; a reader that
    * lists in that window fails cleanly and retries (no torn mix of
    * generations is ever visible — a listing sees old, new, or nothing).
    *
    * Content-preserving: the compacted log serves byte-identical events
    * (CompactSpec proves set equality; ordering is re-derived from scn
    * bands exactly as the original write did). */
  def compactEventLog(spark: SparkSession, dir: String,
      filesHint: Int = 8): Unit = {
    // maintenance I/O through the Hadoop FileSystem API (StoreFs): the
    // event log is a serving store, and at scale it lives on whatever
    // URI scheme the data plane writes — java.io.File renames would
    // silently fail there (same hazard class as the tombstone probe)
    import graft.pipeline.StoreFs
    require(StoreFs.isDirectory(dir), s"compactEventLog: no log at $dir")
    val tmp = s"$dir.compact-tmp"
    val old = s"$dir.compact-old"
    StoreFs.deleteRecursive(tmp)
    StoreFs.deleteRecursive(old)
    // snapshot the file list, then materialize from EXACTLY those files
    // (not the dir) so the compacted generation's provenance is the list
    // we can re-check after the swap
    def listData(d: String): Set[String] =
      StoreFs.listFileNamesRecursive(d, ".parquet").toSet
    val snapshotFiles = listData(dir)
    val snapshot = spark.read.schema(schema).parquet(dir)
    writeEventLog(snapshot, tmp, filesHint)
    // swap: source -> .compact-old, tmp -> source
    if (!StoreFs.rename(dir, old))
      throw new java.io.IOException(s"compactEventLog: cannot move $dir aside")
    if (!StoreFs.rename(tmp, dir)) {
      StoreFs.rename(old, dir) // restore
      throw new java.io.IOException(s"compactEventLog: swap failed for $dir")
    }
    // late-append detection: any data file in the retired generation that
    // was NOT in the read-time snapshot was appended mid-compaction —
    // roll back instead of silently deleting it with .compact-old
    val late = listData(old) -- snapshotFiles
    if (late.nonEmpty) {
      StoreFs.rename(dir, tmp)
      StoreFs.rename(old, dir)
      StoreFs.deleteRecursive(tmp)
      throw new IllegalStateException(
        s"compactEventLog: ${late.size} file(s) were appended during " +
          s"compaction (stream not quiesced): ${late.take(3).mkString(", ")}…" +
          " — original log restored")
    }
    StoreFs.deleteRecursive(old)
    ()
  }

  /** Min/max SCN available in the log — `/bufferInfo` for the persisted
    * buffer; also the retention boundary for fall-off detection. */
  def bufferInfo(spark: SparkSession, dir: String): (Long, Long) = {
    val r = spark.read.schema(schema).parquet(dir).agg(min("scn"), max("scn")).head()
    if (r.isNullAt(0))
      throw new IllegalStateException(s"bufferInfo: event log at $dir is empty")
    (r.getLong(0), r.getLong(1))
  }

  /** Open the streaming read of the event log after a checkpoint, with
    * server-side filters pushed into the scan.
    *
    * `maxFilesPerTrigger` is the batch-size budget (the `size` param of
    * `/stream`, §2.10; rate control A6). Each micro-batch = whole files =
    * whole windows.
    */
  def read(spark: SparkSession, dir: String,
      cp: Checkpoint = Checkpoint.flexible,
      filter: DbusFilter = AllowAllFilter,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
      .where(graft.operators.Relay.afterCheckpoint(cp))
      .where(filter.toColumnFor(schema.fieldNames.toSeq))

  /** Event-time windowed stats with a watermark — the streaming analog of
    * the A3 totals for wall-clock dashboards (events/sec, per-source
    * volumes over tumbling windows).
    *
    * The reference needs no event-time watermark for its own semantics
    * (log order IS commit order, SURVEY §2.7) — this is an *added*
    * analytics op, so it uses the standard Structured Streaming watermark
    * contract: state for a window is evicted once the watermark passes its
    * end, bounding state size regardless of stream length; events later
    * than `lateness` are dropped. Works identically on a batch frame
    * (watermark is a no-op there), which is how the oracle checks it.
    */
  def windowedStats(envelope: DataFrame, windowDur: String = "1 minute",
      lateness: String = "30 seconds"): DataFrame = {
    import org.apache.spark.sql.functions._
    envelope
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", lateness)
      .groupBy(window(col("event_time"), windowDur).as("w"),
        col("source_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("opcode") === "DELETE", 1L).otherwise(0L)).as("n_deletes"),
        min(col("scn")).as("min_scn"), max(col("scn")).as("max_scn"))
      .select(col("w.start").as("win_start"), col("source_id"),
        col("n_events"), col("n_deletes"), col("min_scn"), col("max_scn"))
  }

  /** Streaming exact dedup: upgrades the relay's at-least-once delivery
    * to effectively-once per event id. `dropDuplicatesWithinWatermark`
    * bounds the dedup state by the watermark horizon — duplicates arriving
    * within `lateness` of each other collapse, and state ages out instead
    * of growing with the stream (the unbounded-state hazard of plain
    * dropDuplicates on a stream). Batch frames pass through the same
    * code path with watermarking a no-op, which is how the oracle checks
    * it. */
  def dedupStream(envelope: DataFrame, idCols: Seq[String] = Seq("seq"),
      lateness: String = "10 minutes"): DataFrame = {
    val timed = envelope
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", lateness)
    (if (timed.isStreaming)
      timed.dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)
    else timed.dropDuplicates(idCols.head, idCols.tail: _*))
      .drop("event_time")
  }

  /** Fall-off detection + bootstrap switchover (§3.3): if the consumer's
    * checkpoint predates the log's retention window (`ScnNotFoundException`
    * → BOOTSTRAP in the reference, RelayPullThread.java:96-121), first
    * materialize state via snapshot+catchup up to the log's current head,
    * then stream online from there.
    *
    * Returns (bootstrapStateOrNone, onlineStream, resumeCheckpoint).
    */
  def streamWithBootstrap(spark: SparkSession, dir: String, cp: Checkpoint,
      filter: DbusFilter = AllowAllFilter, maxFilesPerTrigger: Int = 1)
      : (Option[DataFrame], DataFrame, Checkpoint) = {
    val (minScn, maxScn) = bufferInfo(spark, dir)
    val fellOff = !cp.isFlexible && cp.windowScn < minScn
    if (!fellOff) (None, read(spark, dir, cp, filter, maxFilesPerTrigger), cp)
    else {
      // BOOTSTRAP: snapshot consistent at minScn + catchup to maxScn
      val log = spark.read.schema(schema).parquet(dir)
        .where(filter.toColumnFor(schema.fieldNames.toSeq))
      val state = Bootstrap.snapshotPlusCatchup(log, startScn = minScn,
        targetScn = maxScn)
      val resumeCp = Checkpoint.online(maxScn)
      (Some(state), read(spark, dir, resumeCp, filter, maxFilesPerTrigger), resumeCp)
    }
  }
}
