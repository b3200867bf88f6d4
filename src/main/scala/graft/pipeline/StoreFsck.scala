package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Integrity audit (fsck) for the persisted store layouts — the
  * operational tool that turns each store's DOCUMENTED failure windows
  * into detectable findings instead of silent corruption.
  *
  * Every check here corresponds to a real, stated hazard:
  *   - `appendToPostingsIndex` commits postings and doclens as two
  *     separate file jobs — a crash between them leaves docs indexed
  *     without length norms (the scaladoc'd crash-consistency caveat);
  *   - a blind re-append after a foreachBatch retry double-counts a
  *     batch (the hazard the batch-addressed writes exist to prevent —
  *     fsck detects it when some other writer blind-appended anyway);
  *   - the compaction GC clears the tombstone set LAST, so a crash in
  *     the window leaves tombstones naming already-purged ids (a
  *     serving no-op by design, but the operator should see the state);
  *   - an ANN cell row pointing at a centroid the codebook doesn't
  *     have, or one vector assigned to two cells, breaks retrieval's
  *     probe accounting.
  *
  * Output is a (check_name, n_bad) frame — n_bad 0 on a healthy store. Every
  * check is a distributed aggregate/anti-join over the store tables
  * (model-sized for ANN, index-sized for postings, never corpus-sized);
  * run it like compaction: a maintenance pass, not a serving-path cost.
  * Reference analogue: the event-level integrity discipline
  * (DbusEventCorrupter / CRC checks, DbusEvent.java:52-79) lifted to
  * store-level invariants.
  */
object StoreFsck {

  private def finding(name: String, bad: DataFrame): DataFrame =
    bad.agg(count(lit(1)).as("n_bad")).select(lit(name).as("check_name"),
      col("n_bad").cast("long").as("n_bad"))

  /** Audit a [[Retrieval.writePostingsIndex]]-layout store. Reads RAW
    * tables (tombstones included as their own subject, not applied as a
    * filter — fsck inspects the store, not the serving view). */
  def postingsStore(spark: SparkSession, dir: String): DataFrame = {
    val postings = spark.read.parquet(s"$dir/postings")
    val doclens = spark.read.parquet(s"$dir/doclens")
    val pDocs = postings.select("doc_id").distinct()
    val dDocs = doclens.select("doc_id").distinct()
    val tomb = Tombstones.readOpt(spark, dir)
      .map(_.select(col("id").as("doc_id")).distinct())
      .getOrElse(dDocs.limit(0))
    finding("postings_without_doclens", pDocs.join(dDocs, Seq("doc_id"),
        "left_anti"))
      // dl > 0 only: an empty doc legally has norms but no postings
      .unionByName(finding("doclens_without_postings",
        dDocs.join(doclens, Seq("doc_id")).where(col("dl") > 0)
          .select("doc_id").distinct()
          .join(pDocs, Seq("doc_id"), "left_anti")))
      .unionByName(finding("duplicate_postings",
        postings.groupBy("token", "doc_id", "pos")
          .agg(count(lit(1)).as("c")).where(col("c") > 1)))
      .unionByName(finding("duplicate_doclens",
        doclens.groupBy("doc_id").agg(count(lit(1)).as("c"))
          .where(col("c") > 1)))
      .unionByName(finding("negative_positions",
        postings.where(col("pos") < 0)))
      .unionByName(finding("tombstones_of_absent_ids",
        tomb.join(dDocs, Seq("doc_id"), "left_anti")))
  }

  /** Filesystem-level layout artifacts a crashed maintenance pass
    * leaves behind: `<table>.compact.<pid>` (compaction wrote its tmp,
    * crashed before the swap — dead bytes, safe to delete) and
    * `<table>.old.<pid>` (crashed between promote and backup delete —
    * the swap SUCCEEDED, the backup is reclaimable space; if the live
    * table is also missing, the crash hit between displace and
    * promote, and recovery is renaming the backup back). One directory
    * listing — store roots hold a handful of entries; this check runs
    * even on a store whose tables no longer read. */
  def layoutArtifacts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val names = Option(new java.io.File(dir).listFiles)
      .map(_.toSeq.filter(_.isDirectory).map(_.getName))
      .getOrElse(Seq.empty)
    Seq(
      ("orphan_compact_tmp_dirs",
        names.count(_.matches(".*\\.compact\\.\\d+$")).toLong),
      ("orphan_backup_dirs",
        names.count(_.matches(".*\\.old\\.\\d+$")).toLong))
      .toDF("check_name", "n_bad")
  }

  /** Audit an [[Ann.writeIndex]]-layout store (codebook + cells). */
  def annStore(spark: SparkSession, dir: String): DataFrame = {
    val cells = spark.read.parquet(s"$dir/cells")
    val codebook = spark.read.parquet(s"$dir/codebook")
    finding("cells_with_unknown_centroid",
        cells.select("cell_id").distinct()
          .join(codebook.select(col("id").as("cell_id")).distinct(),
            Seq("cell_id"), "left_anti"))
      .unionByName(finding("vectors_in_multiple_cells",
        cells.select("id", "cell_id").distinct()
          .groupBy("id").agg(count(lit(1)).as("c")).where(col("c") > 1)))
      .unionByName(finding("duplicate_cell_rows",
        cells.groupBy("id", "cell_id").agg(count(lit(1)).as("c"))
          .where(col("c") > 1)))
  }
}
