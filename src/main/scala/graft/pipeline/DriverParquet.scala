package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan, Repartition}
import org.apache.spark.sql.types.StructType

/** Driver-path parquet writer for DRIVER-LOCAL tables (optimization
  * guide §5 "the driver should do almost no data work" — and launching
  * a distributed job to write one row is the inverse failure: every
  * one-row quant_stats/codebook/books write costs a full Spark job —
  * scheduler round-trip, task launch, commit protocol, ~60–100 ms of
  * scale-INDEPENDENT latency — for rows the driver is already holding
  * in the query plan as a LocalRelation).
  *
  * Byte-compatibility: rows go through Spark's own
  * [[ParquetWriteSupport]] — the exact WriteSupport the distributed
  * writer uses — with the session's effective write configuration
  * (legacy format, timestamp type, rebase modes, compression codec),
  * so the emitted file is what a one-task `df.write.parquet` would have
  * produced: same logical types, same codec, a Spark-style
  * `part-00000-<uuid>.c000.<codec>.parquet` name and a `_SUCCESS`
  * marker (the layout checks treat marker files as layout, and the
  * DuckDB oracle reads the stores — the byte-compat gate).
  *
  * Scope: only frames whose OPTIMIZED plan collapses to a
  * [[LocalRelation]] (possibly under coalesce/repartition nodes — the
  * usual `Seq(...).toDF.coalesce(1)` shape). Anything touching
  * distributed inputs returns None and takes the normal writer. */
private[graft] object DriverParquet {

  /** The frame's driver-local rows, when the whole plan is one
    * LocalRelation (unwrapping coalesce/repartition — they only affect
    * file count, and a local write is always one file). */
  private def localRows(df: DataFrame): Option[(StructType, Seq[InternalRow])] = {
    def unwrap(p: LogicalPlan): Option[LocalRelation] = p match {
      case l: LocalRelation => Some(l)
      case r: Repartition => unwrap(r.child)
      case _ => None
    }
    unwrap(df.queryExecution.optimizedPlan).map { l =>
      (org.apache.spark.sql.catalyst.types.DataTypeUtils
        .fromAttributes(l.output), l.data)
    }
  }

  /** Write `df` to `dir` as one parquet part file ON THE DRIVER if it
    * is driver-local; returns false (writing nothing) otherwise. The
    * caller owns directory semantics (publish writes into a fresh
    * reserved generation dir, so "overwrite" is vacuous here). */
  def writeIfLocal(df: DataFrame, dir: String): Boolean =
    localRows(df) match {
      case None => false
      case Some((schema, rows)) =>
        val spark = df.sparkSession
        val sqlConf = spark.sessionState.conf
        // Spark's OWN write preparation and writer factory — the exact
        // code path a distributed parquet write runs per task, minus
        // the job: prepareWrite stamps the session's write
        // configuration (legacy format, timestamp type, rebase modes,
        // field ids, codec) onto the job conf and returns the
        // OutputWriterFactory whose instances the write tasks use
        val job = org.apache.hadoop.mapreduce.Job.getInstance(
          spark.sessionState.newHadoopConf())
        val factory = org.apache.spark.sql.execution.datasources.parquet
          .ParquetUtils.prepareWrite(sqlConf, job, schema,
            new org.apache.spark.sql.execution.datasources.parquet
              .ParquetOptions(Map.empty[String, String], sqlConf))
        val attempt = new org.apache.hadoop.mapreduce.task
          .TaskAttemptContextImpl(job.getConfiguration,
            new org.apache.hadoop.mapreduce.TaskAttemptID(
              new org.apache.hadoop.mapreduce.TaskID(
                new org.apache.hadoop.mapreduce.JobID("graftdriver", 0),
                org.apache.hadoop.mapreduce.TaskType.MAP, 0), 0))
        StoreFs.mkdirs(dir)
        val file = s"$dir/part-00000-${java.util.UUID.randomUUID}" +
          s"-c000${factory.getFileExtension(attempt)}"
        val writer = factory.newInstance(file, schema, attempt)
        try rows.foreach(writer.write)
        finally writer.close()
        // the distributed writer's commit marker — layout parity for
        // the fsck marker checks and human inspection
        StoreFs.createExclusive(s"$dir/_SUCCESS")
        true
    }
}
