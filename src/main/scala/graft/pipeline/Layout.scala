package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional storage layout: Z-order (Morton-curve) clustering
  * for tables that are filtered on TWO key columns at once.
  *
  * The problem it solves at 100 TB: a table sorted on one column gives
  * parquet min/max footer pruning for that column only — a box query
  * `a BETWEEN .. AND b BETWEEN ..` over a billion-row table sorted by
  * `a` still scans every file the `a`-range touches, because each of
  * those files spans the full `b` domain. Sorting by the bit-interleaved
  * [[graft.functions.ZorderKey]] instead clusters rows along the
  * Z-curve, so every file covers a small RECTANGLE of (a, b) space and
  * its footer (min, max) is tight in BOTH dimensions — the scan planner
  * then skips every file whose rectangle misses the query box, for
  * either or both predicates. This is the engine-level form of a lake
  * OPTIMIZE ZORDER maintenance pass, expressed as a plain
  * repartition-by-range + in-file sort on a codegen'd key (no custom
  * writer; Catalyst/DSv2 pruning machinery does the rest unmodified).
  *
  * Same discipline as every layout op here (the Store rewrite, postings
  * compaction): rewrite ONCE on the cluster key, serve many scans.
  * Reference analogue: the buffer's two-level (scn, index) access
  * discipline, ScnIndex.java:94 — re-expressed as lake file layout.
  */
object Layout {

  /** The 62-bit Morton key of two non-negative LONG columns (loud
    * failure outside [0, 2^31) — see [[graft.functions.ZorderKey]]). */
  def zorderKey(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.zorder_key(a, b)

  /** Rewrite `df` into `numFiles` parquet files clustered on the
    * Z-curve of (`colA`, `colB`): range-partition by the Morton key
    * (equal-count rectangles, skew-proof the way every range write here
    * is) and sort within each file so row-group stats are tight too.
    * The key is layout metadata, not data — it is dropped before write,
    * and the files carry the caller's schema unchanged. */
  def zorderWrite(df: DataFrame, dir: String, colA: String, colB: String,
      numFiles: Int = 8): Unit = {
    require(numFiles > 0, s"zorderWrite: numFiles $numFiles")
    df.withColumn("__zkey", zorderKey(col(colA), col(colB)))
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode("overwrite").parquet(dir)
  }

  /** Per-file (min, max) bounding rectangles of a written layout in the
    * two layout dimensions — the footer ranges the scan planner prunes
    * against, surfaced as a frame so a layout's clustering quality is
    * MEASURABLE (files whose rectangle misses a query box are exactly
    * the files a predicate scan skips). One row per file; cost is one
    * pass over the layout. */
  def fileBounds(spark: org.apache.spark.sql.SparkSession, dir: String,
      colA: String, colB: String): DataFrame =
    spark.read.parquet(dir)
      .select(input_file_name().as("file"), col(colA), col(colB))
      .groupBy("file")
      .agg(min(colA).as("a_min"), max(colA).as("a_max"),
        min(colB).as("b_min"), max(colB).as("b_max"))

  /** The N-dimensional Morton key (3 or 4 non-negative LONG columns;
    * bit budget 21/15 bits per dim — loud failure outside it, see
    * [[graft.functions.ZorderKeyN]]). */
  def zorderKeyN(cols: Column*): Column =
    graft.functions.GraftFunctions.zorder_key_n(cols: _*)

  /** [[zorderWrite]] generalized to 3-4 layout dimensions: every file's
    * footer range is a small N-BOX of the key space, so an N-predicate
    * box query prunes on every dimension at once. Same rewrite shape
    * (range-partition + in-file sort on the key, key dropped before
    * write); the per-dim bit budget shrinks (21 bits for 3 dims, 15
    * for 4), so dimensions wider than the budget must be bucketed by
    * the caller first — loudly enforced, never masked. */
  def zorderWriteN(df: DataFrame, dir: String, cols: Seq[String],
      numFiles: Int = 8): Unit = {
    require(numFiles > 0, s"zorderWriteN: numFiles $numFiles")
    require(cols.size >= 3 && cols.size <= 4,
      s"zorderWriteN: 3 or 4 layout columns expected, got $cols" +
        " (use zorderWrite for 2)")
    df.withColumn("__zkey", zorderKeyN(cols.map(col): _*))
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode("overwrite").parquet(dir)
  }

  /** [[fileBounds]] for an N-dim layout: one row per file with
    * `<col>_min`/`<col>_max` per layout dimension — the N-box the scan
    * planner prunes against. */
  def fileBoundsN(spark: org.apache.spark.sql.SparkSession, dir: String,
      cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(c).as(s"${c}_min"), max(c).as(s"${c}_max")))
    spark.read.parquet(dir)
      .select((input_file_name().as("file") +: cols.map(col)): _*)
      .groupBy("file")
      .agg(aggs.head, aggs.tail: _*)
  }
}
