package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ingest-once partitioned table store — the engine's serving layout.
  *
  * The reference never serves queries off the source database: events are
  * ingested once into the relay's indexed buffer and all reads hit that
  * layout (DbusEventBuffer.appendEvent + ScnIndex,
  * databus-core/.../core/DbusEventBuffer.java:1705, ScnIndex.java:94); the
  * bootstrap side likewise re-materializes the stream into serving tables
  * (BootstrapApplierThread.java:242). This object is the Spark-native
  * analog: each source table is rewritten exactly once per (dataset, table)
  * into a multi-file parquet layout that is range-partitioned and sorted on
  * the table's natural access key, then every query reads the store.
  *
  * Why this matters at both ends of the scale spectrum:
  *  - at 100 TB the ingest layout IS the performance model — range
  *    partitioning on the probe key gives partition pruning (the ScnIndex
  *    skip-scan, §2.2 K2, for free from parquet min/max stats), and many
  *    files give full scan parallelism;
  *  - the driver's testdata ships each table as ONE parquet file with ONE
  *    row group, which caps every scan at one core no matter the cluster —
  *    exactly the anti-pattern the store exists to fix.
  *
  * The rewrite runs once per dataset directory (guarded by a _SUCCESS
  * marker, written atomically via tmp-dir + rename), so repeated sessions
  * (verify, bench, tests) reuse the layout from disk.
  */
object Store {

  /** Version segment: bump when the serving layout changes so stale
    * copies from older code self-invalidate across rounds. */
  val Root = "/tmp/graft_store/v1"

  /** Serving layout per table: (range-partition cols, within-file sort).
    * Keys chosen by dominant access pattern: facts by their band/filter
    * column, corpus tables by id (the candidate-pair fetch key). Tables
    * not listed (small dims) are broadcast-sized — reading the source file
    * directly is already optimal. */
  private val layouts: Map[String, (Seq[String], Seq[String])] = Map(
    "lineitem"   -> (Seq("l_shipdate"), Seq("l_shipdate")),
    "orders"     -> (Seq("o_orderdate"), Seq("o_orderdate")),
    "documents"  -> (Seq("doc_id"), Seq("doc_id")),
    "embeddings" -> (Seq("vec_id"), Seq("vec_id")))

  /** Files per table scale with source bytes (~1 MB of source per file,
    * floor 2) so small SFs don't shatter into files whose per-task
    * overhead exceeds their scan cost; capped at the session's
    * parallelism — on a production cluster that cap is the executor
    * count, not 32. */
  private def numFiles(srcBytes: Long, cap: Int): Int =
    math.max(2, math.min(cap, (srcBytes / (1 << 20)).toInt))

  private def key(sfDir: String): String =
    sfDir.replaceAll("[^A-Za-z0-9._-]", "_")

  /** Read `name` through the store (ingesting on first access). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    layouts.get(name) match {
      case None => spark.read.parquet(s"$sfDir/$name.parquet")
      case Some((rangeCols, sortCols)) =>
        val dest = s"$Root/${key(sfDir)}/$name"
        ensure(spark, dest, s"$sfDir/$name.parquet", rangeCols, sortCols,
          spark.read.parquet(s"$sfDir/$name.parquet"))
        spark.read.parquet(dest)
    }

  /** The materialized event log: the envelope projection of the raw events
    * feed, range-partitioned by scn and sorted (scn, seq) within files —
    * the relay buffer + ScnIndex layout. scn/source_id/partition_id are
    * real stored columns here, so checkpoint-band and subscription
    * predicates push down to the parquet scan (in the raw table they are
    * arithmetic over other columns and cannot). */
  def eventLog(spark: SparkSession, sfDir: String): DataFrame = {
    val dest = s"$Root/${key(sfDir)}/eventlog"
    ensure(spark, dest, s"$sfDir/events.parquet", Seq("scn"), Seq("scn", "seq"),
      ChangeFeed.envelope(ChangeFeed.raw(spark, sfDir)))
    spark.read.parquet(dest)
  }

  /** Directory of the materialized event log (ensured first) — for
    * path-addressed consumers (streaming reads, dtail, the dispatcher). */
  def eventLogDir(spark: SparkSession, sfDir: String): String = {
    eventLog(spark, sfDir)
    s"$Root/${key(sfDir)}/eventlog"
  }

  /** Bucketed serving table: rows hash-clustered into `nBuckets` files by
    * `bucketKey` at write time, registered in the session catalog so joins
    * and aggregations on the key run with NO exchange on either side —
    * the co-located-join layout a 100 TB deployment would maintain for its
    * hottest join edge (lineitem⋈orders on orderkey here). The data is
    * written once (bucketed saveAsTable); later sessions re-register the
    * existing files with matching bucket metadata via DDL. */
  def bucketedTable(spark: SparkSession, sfDir: String, name: String,
      bucketKey: String, nBuckets: Int): DataFrame = {
    val tbl = s"graft_${key(sfDir)}_${name}_$bucketKey$nBuckets"
      .replaceAll("[^A-Za-z0-9_]", "_").toLowerCase
    if (!spark.catalog.tableExists(tbl)) this.synchronized {
      if (!spark.catalog.tableExists(tbl)) {
        val loc = Paths.get(s"$Root/bucketed/$tbl")
        val src = spark.read.parquet(s"$sfDir/$name.parquet")
        // build under cross-process lock, into a tmp location via a tmp
        // catalog name, promoted by atomic rename — readers only ever see
        // a complete bucketed layout (see ensure's locking notes)
        ProcessLock.exclusive(s"$loc.lock") {
          if (!Files.exists(loc.resolve("_SUCCESS"))) {
            val pid = ProcessHandle.current.pid
            val tmpLoc = Paths.get(s"$loc.tmp.$pid")
            val tmpTbl = s"${tbl}_tmp_$pid"
            src.write.mode("overwrite")
              .option("path", tmpLoc.toString)
              .bucketBy(nBuckets, bucketKey)
              .sortBy(bucketKey)
              .format("parquet")
              .saveAsTable(tmpTbl)
            // explicit-path tables are external: DROP keeps the files
            spark.sql(s"DROP TABLE $tmpTbl")
            if (!Files.exists(tmpLoc.resolve("_SUCCESS")))
              Files.createFile(tmpLoc.resolve("_SUCCESS"))
            Files.createDirectories(loc.getParent)
            if (Files.exists(loc))
              org.apache.commons.io.FileUtils.deleteDirectory(loc.toFile)
            Files.move(tmpLoc, loc, StandardCopyOption.ATOMIC_MOVE)
          }
        }
        val schema = src.schema.map(f =>
          s"`${f.name}` ${f.dataType.sql}").mkString(", ")
        spark.sql(
          s"""CREATE TABLE $tbl ($schema) USING PARQUET
             |CLUSTERED BY ($bucketKey) SORTED BY ($bucketKey)
             |INTO $nBuckets BUCKETS
             |LOCATION '${loc.toString}'""".stripMargin)
      }
    }
    spark.table(tbl)
  }

  /** Build-once with cross-process exclusion: the promoted-marker check
    * runs inside an exclusive [[ProcessLock]], so concurrent JVMs (verify,
    * bench, tests) serialize on the build and a promoted dir (one carrying
    * `_SUCCESS`) is never deleted — only crashed, never-promoted partials
    * are cleaned up, and only while holding the lock (no reader can be
    * inside them: readers only enter after this returns). */
  private def ensure(spark: SparkSession, dest: String, srcFile: String,
      rangeCols: Seq[String], sortCols: Seq[String], df: => DataFrame): Unit = {
    if (Files.exists(Paths.get(dest, "_SUCCESS"))) return
    this.synchronized {
      ProcessLock.exclusive(s"$dest.lock") {
        if (!Files.exists(Paths.get(dest, "_SUCCESS"))) {
          import org.apache.spark.sql.functions.col
          val n = numFiles(Files.size(Paths.get(srcFile)),
            spark.sparkContext.defaultParallelism)
          val tmp = s"$dest.tmp.${ProcessHandle.current.pid}"
          df.repartitionByRange(n, rangeCols.map(col): _*)
            .sortWithinPartitions(sortCols.map(col): _*)
            .write.mode("overwrite").parquet(tmp)
          Files.createDirectories(Paths.get(dest).getParent)
          if (Files.exists(Paths.get(dest)))
            org.apache.commons.io.FileUtils.deleteDirectory(
              new java.io.File(dest)) // crashed partial from a dead process
          Files.move(Paths.get(tmp), Paths.get(dest),
            StandardCopyOption.ATOMIC_MOVE)
        }
      }
    }
  }
}
