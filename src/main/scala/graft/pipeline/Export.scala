package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sharded dataset export — the write stage every training-data pipeline
  * ends in: deterministic shard assignment (same doc always lands in the
  * same shard, across reruns and engines), one file per shard, and a
  * manifest computed from the WRITTEN data so "what the trainer will
  * read" is proven, not assumed.
  *
  * Shard = `minstd(id, salt) mod numShards` — the engine's MINSTD hash
  * stream ([[Sampling.minstd]]), integer-exact and SQL-re-derivable, so
  * an external system can compute any document's shard without reading
  * the manifest.
  *
  * Scale shape: `repartition(numShards, shard)` before `partitionBy`
  * is the one shuffle, and it is the point — without it a partitionBy
  * write emits up to inputPartitions × shards files (the small-files
  * problem that kills downstream training reads at 100 TB); with it,
  * exactly one file per shard per write. The manifest is a readback
  * aggregate over the written parquet — column-pruned to the id/token
  * columns, one scan. */
object Export {

  /** Write `docs` sharded under `dir` and return the manifest (shard,
    * n_docs, n_tokens, min_id, max_id) computed by reading the written
    * data back. */
  /** Deterministic shard assignment + the repartition-before-partitionBy
    * small-files discipline, shared by every export format — a doc's
    * shard is the same across parquet and JSONL exports BY CONSTRUCTION
    * because both writers go through this one derivation. */
  private def sharded(docs: DataFrame, numShards: Int, idCol: String,
      salt: Long): DataFrame = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    docs
      .withColumn("shard",
        pmod(Sampling.minstd(col(idCol), salt), lit(numShards.toLong)))
      // RANGE partition on the shard value: hash repartition collides
      // shard values into shared tasks (birthday bound leaves ~1/e of
      // writer slots idle at numShards=parallelism), serializing part
      // of the write; range boundaries over numShards distinct values
      // give ~one shard per task. One file per shard holds either way
      // (partitionBy splits by value within a task).
      .repartitionByRange(numShards, col("shard"))
  }

  def writeShards(docs: DataFrame, dir: String, numShards: Int,
      idCol: String = "doc_id", textCol: String = "text",
      salt: Long = 0L)(implicit spark: SparkSession): DataFrame = {
    sharded(docs, numShards, idCol, salt)
      .write.partitionBy("shard").mode("overwrite").parquet(dir)
    manifest(spark.read.parquet(dir), idCol, textCol)
  }

  /** Write `docs` as sharded JSONL — the interchange format LLM data
    * tooling speaks (one JSON object per line; tokenizer trainers, eval
    * harnesses and dataset hubs all ingest it). Same deterministic shard
    * assignment and same repartition-before-partitionBy discipline as
    * [[writeShards]]: exactly one .json file per shard per write, never
    * inputPartitions × shards small files. */
  def writeJsonlShards(docs: DataFrame, dir: String, numShards: Int,
      idCol: String = "doc_id", salt: Long = 0L): Unit =
    sharded(docs, numShards, idCol, salt)
      .write.partitionBy("shard").mode("overwrite").json(dir)

  /** Read a JSONL dataset with an EXPLICIT schema (DDL string). Schema
    * inference would cost an extra full scan at 100 TB and silently
    * widens/narrows types between shards; an export's reader states what
    * it expects and malformed lines surface as nulls per Spark's
    * PERMISSIVE mode rather than failing the scan. */
  def readJsonl(spark: SparkSession, dir: String, schemaDdl: String): DataFrame =
    spark.read.schema(schemaDdl).json(dir)

  /** Manifest over a sharded dataset (already containing `shard`). */
  def manifest(sharded: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    sharded.groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col(textCol), graft.functions.TextFunctions.WsPlus)).cast("long")).as("n_tokens"),
        min(col(idCol)).cast("long").as("min_id"),
        max(col(idCol)).cast("long").as("max_id"))
}
