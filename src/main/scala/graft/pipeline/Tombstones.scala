package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Takedown (delete) discipline for the persisted append-only stores
  * (positional postings, ANN cells, signature tables): a store records
  * deletions as TOMBSTONES — an id-set side table under
  * `<store>/tombstones` — and every read anti-joins it, so a takedown
  * is O(request) regardless of store size and never rewrites stored
  * rows. Compaction is the GC: it physically drops tombstoned rows
  * during its rewrite and clears the tombstone set, resetting the read
  * side to a plain scan.
  *
  * This is the missing half of the append-only store protocol: append
  * handles growth, tombstones handle the takedown/right-to-be-forgotten
  * request that would otherwise force a full index rebuild. Reference
  * analogue: databus models deletes as first-class events rather than
  * buffer rewrites (DbusOpcode.java:22-26's DELETE opcode), and defers
  * physical removal to a maintenance pass
  * (databus-bootstrap-producer/.../BootstrapDBCleaner.java:1).
  *
  * Replay/idempotency: a tombstone set is a SEMANTIC SET — appending
  * the same id twice changes nothing an anti-join can observe, so the
  * blind `mode(append)` write is naturally replay-safe (unlike the
  * count-bearing stores, which need batch-addressed overwrite writes —
  * see `appendToPostingsIndexBatch`). GC deduplicates physically.
  *
  * Scale shape: takedown sets are request-sized (ids only, 8 bytes a
  * row — a million-doc purge is megabytes), so the read-side anti-join
  * broadcasts; a set grown too large to broadcast is exactly the signal
  * to run the compaction GC, which empties it.
  */
object Tombstones {

  private def dirOf(storeDir: String) = s"$storeDir/tombstones"

  /** Record a takedown: append `ids` to the store's tombstone set.
    * Driver-sized form — legal/compliance requests arrive by the
    * handful; a bulk purge uses [[appendDf]]. */
  def append(spark: SparkSession, storeDir: String, ids: Seq[Long]): Unit = {
    require(ids.nonEmpty, "Tombstones.append: empty id set")
    import spark.implicits._
    appendDf(ids.toDF("id"), storeDir)
  }

  /** Bulk takedown: `ids` must carry exactly one LONG-castable column
    * (any name). One narrow file per request keeps the set
    * one-listing-cheap until GC. A value that does not cast (or a null)
    * FAILS the request loudly — a silently-null tombstone would record
    * the legal-erasure request as a no-op (anti-joins never match null)
    * while the caller believes it succeeded; the extra request-sized
    * check job is the price of that guarantee. */
  def appendDf(ids: DataFrame, storeDir: String): Unit = {
    require(ids.columns.length == 1,
      s"Tombstones.appendDf: one id column expected, got ${ids.columns.toSeq}")
    val cast = ids.select(col(ids.columns.head).cast("long").as("id"))
    require(cast.where(col("id").isNull).isEmpty,
      "Tombstones.appendDf: null or non-LONG-castable ids — the takedown" +
        " would silently never match; fix the id column before recording")
    cast.coalesce(1).write.mode("append").parquet(dirOf(storeDir))
  }

  /** The store's tombstone set, or None when no takedown was ever
    * recorded (the common case — reads stay plain scans). */
  def readOpt(spark: SparkSession, storeDir: String): Option[DataFrame] = {
    val d = new java.io.File(dirOf(storeDir))
    if (d.isDirectory && d.listFiles.exists(_.getName.endsWith(".parquet")))
      Some(spark.read.parquet(dirOf(storeDir)).select("id"))
    else None
  }

  /** The live rows of a store table: `rows` minus the tombstoned ids.
    * No tombstones ⇒ `rows` unchanged (zero plan overhead); otherwise
    * one BROADCAST anti-join on the id — the takedown set is
    * request-sized by construction, never corpus-sized. */
  def filterLive(rows: DataFrame, storeDir: String, idCol: String)
      : DataFrame =
    readOpt(rows.sparkSession, storeDir) match {
      case None => rows
      case Some(t) =>
        // re-select in the original order: a USING join moves the key
        // column first, and the read surface's column order is part of
        // its contract (schema-stable whether or not takedowns exist)
        rows.join(broadcast(t.withColumnRenamed("id", idCol)),
            Seq(idCol), "left_anti")
          .select(rows.columns.map(col).toSeq: _*)
    }

  /** Drop the tombstone set — the LAST step of a compaction GC, after
    * every store table has been rewritten without the tombstoned rows.
    * Ordering is the crash-safety: a crash before this point leaves the
    * set applied to already-purged tables, and an anti-join of absent
    * ids is a no-op — the store serves correctly at every intermediate
    * state. */
  def clear(storeDir: String): Unit = {
    val d = new java.io.File(dirOf(storeDir))
    if (d.exists) org.apache.commons.io.FileUtils.deleteDirectory(d)
  }
}
