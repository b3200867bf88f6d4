package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-distribution monitoring: detect DRIFT between a reference
  * corpus and an incoming batch before the batch pollutes training data
  * (a vocabulary shift, a new boilerplate source, an encoding bug —
  * production ingestion pipelines gate on exactly this signal).
  *
  * The statistic is the classic Pearson chi-square over `buckets` hashed
  * token buckets: both corpora reduce to one (bucket, count) table each
  * (≤ `buckets` rows regardless of corpus size — the same scale shape as
  * [[Weighting.importanceWeights]]'s distributions), expected batch
  * counts follow the reference shares, and each bucket's contribution
  * `(observed − expected)² / expected` is emitted per bucket so an alarm
  * can point at WHICH part of the distribution moved, not just that it
  * did. Everything after the two token scans is bucket-table-sized
  * arithmetic.
  */
object Monitor {

  private def bucketCounts(df: DataFrame, textCol: String, buckets: Int,
      cntName: String): DataFrame =
    df.select(explode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as("tok"))
      .select(Weighting.md5Bucket(col("tok"), buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as(cntName))

  private val BucketsMetaKey = "graft.monitor.buckets"

  /** The reference corpus reduced to its (bucket, cnt_ref) distribution —
    * the table a monitoring deployment computes ONCE per reference
    * snapshot and persists; every incoming batch then drifts against the
    * stored table via [[tokenDriftFromCounts]] without ever re-scanning
    * the reference (the signature-store discipline, applied to
    * monitoring). ≤ `buckets` rows regardless of corpus size. The bucket
    * count is stamped into the column metadata (it survives a parquet
    * roundtrip), so a mismatched consumer fails loudly. */
  def referenceDistribution(reference: DataFrame, textCol: String = "text",
      buckets: Int = 256): DataFrame = {
    val md = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong(BucketsMetaKey, buckets.toLong).build()
    bucketCounts(reference, textCol, buckets, "cnt_ref")
      .select(col("bucket").as("bucket", md), col("cnt_ref"))
  }

  /** Per-bucket drift rows between `reference` and `batch`:
    * (bucket, cnt_ref, cnt_batch, expected_e6, chi2_contrib_e6).
    *
    * `expected` = reference share × batch total; emitted (like the
    * contribution) as integer MICRO-units (×1e6, floored) so the oracle
    * comparison is exact — floating division order never differs because
    * each value is a single division/multiplication chain on integers,
    * floored. Buckets the reference never saw get expected 0 and, by
    * convention, contribute `cnt_batch² × 1e6` (expected clamped to 1
    * token) — a loud, finite alarm instead of a division by zero. An
    * EMPTY reference corpus degrades the same way on purpose: totals
    * coalesce to 0, every batch bucket alarms at `cnt_batch² × 1e6` — a
    * broken reference feed must trip the monitor, never NULL it into
    * silence. */
  def tokenDrift(reference: DataFrame, batch: DataFrame,
      textCol: String = "text", buckets: Int = 256): DataFrame =
    tokenDriftFromCounts(referenceDistribution(reference, textCol, buckets),
      batch, textCol, buckets)

  /** Drift of `batch` against an already-computed reference distribution
    * ((bucket, cnt_ref) — see [[referenceDistribution]]); output contract
    * as [[tokenDrift]]. Only the batch is scanned. If `refCounts` carries
    * the bucket-count stamp, a `buckets` mismatch (which would misalign
    * every bucket silently) is rejected up front. */
  def tokenDriftFromCounts(refCounts: DataFrame, batch: DataFrame,
      textCol: String = "text", buckets: Int = 256): DataFrame = {
    refCounts.schema.fields.find(_.name == "bucket")
      .filter(_.metadata.contains(BucketsMetaKey))
      .map(_.metadata.getLong(BucketsMetaKey))
      .foreach(b => require(b == buckets.toLong,
        s"refCounts was bucketed with $b buckets but the batch side uses " +
          s"$buckets — the chi-square would misalign every bucket"))
    val bat = bucketCounts(batch, textCol, buckets, "cnt_batch")
    // bucket tables are tiny; the full-outer alignment and the scalar
    // totals cross-join cost nothing at any corpus scale. sum() over an
    // empty side is NULL — coalesce both totals to 0.
    val totals = refCounts.agg(coalesce(sum(col("cnt_ref")), lit(0L))
        .as("total_ref"))
      .crossJoin(bat.agg(coalesce(sum(col("cnt_batch")), lit(0L))
        .as("total_batch")))
    val aligned = refCounts.join(bat, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("cnt_ref"), lit(0L)).as("cnt_ref"),
        coalesce(col("cnt_batch"), lit(0L)).as("cnt_batch"))
      .crossJoin(broadcast(totals))
    // expected = cnt_ref / total_ref * total_batch, in exact micro-units:
    // floor((cnt_ref * total_batch * 1e6) / total_ref) — one integer
    // multiply chain and one floored division, bit-identical anywhere.
    // total_ref = 0 (empty reference) short-circuits to expected 0 so
    // the 0.0/0 → NaN chain can never reach the floor.
    val expRaw = when(col("total_ref") === 0L, lit(0.0)).otherwise(
      col("cnt_ref").cast("double") * col("total_batch") / col("total_ref"))
    val expectedE6 = when(col("total_ref") === 0L, lit(0L)).otherwise(
      floor((col("cnt_ref") * col("total_batch")).cast("double") * 1e6
        / col("total_ref")).cast("long"))
    val expTok = greatest(expRaw, lit(1.0))
    val diff = col("cnt_batch").cast("double") - expRaw
    aligned
      .withColumn("expected_e6", expectedE6)
      .withColumn("chi2_contrib_e6",
        floor(diff * diff / expTok * 1e6).cast("long"))
      .select("bucket", "cnt_ref", "cnt_batch", "expected_e6",
        "chi2_contrib_e6")
  }
}
