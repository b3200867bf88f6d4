package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Frequency-sketch operators for heavy-hitter analytics over columns too
  * wide to group exactly (token vocabularies, URL hosts, key spaces).
  *
  * [[heavyHitters]] is EXACT despite using a sketch: per-partition
  * Misra-Gries summaries produce a candidate set that provably contains
  * every item with global frequency > n/k (pigeonhole over the merge: an
  * item below n_p/k in every partition sums below n/k globally), then one
  * broadcast-semi recount pass computes exact counts for candidates only.
  * Total cost: one narrow scan + one recount over candidate rows — the
  * full-vocabulary shuffle of a plain groupBy never happens.
  */
object Sketches {

  /** Per-partition Misra-Gries summary with `k` counters: the classic
    * decrement-all step amortizes to O(1) per element. */
  private def misraGries(it: Iterator[String], k: Int)
      : Iterator[String] = {
    val counters = new java.util.HashMap[String, Long](k * 2)
    it.foreach { v =>
      if (v != null) {
        val c = counters.getOrDefault(v, 0L) // stored counts are always >= 1
        if (c > 0L) counters.put(v, c + 1)
        else if (counters.size < k) counters.put(v, 1L)
        else {
          // decrement every counter; drop zeros
          val e = counters.entrySet().iterator()
          while (e.hasNext) {
            val en = e.next()
            if (en.getValue <= 1L) e.remove() else en.setValue(en.getValue - 1)
          }
        }
      }
    }
    import scala.jdk.CollectionConverters._
    counters.keySet().iterator().asScala
  }

  /** Exact items whose frequency exceeds `minShareBp` basis points of the
    * column's row count. `sketchK` must exceed 10000/minShareBp (default
    * gives 2× margin at 1%) — the superset guarantee needs k > 1/share.
    *
    * Scale shape: stage 1 scans once and emits ≤ k candidate strings per
    * partition (driver-collected — bounded by k × partitions, not
    * vocabulary); stage 2 recounts exactly via a broadcast semi-join +
    * map-side-combined count on candidate rows only. */
  def heavyHitters(df: DataFrame, valueCol: String, minShareBp: Int = 100,
      sketchK: Int = 2000): DataFrame = {
    require(minShareBp > 0 && sketchK.toLong * minShareBp > 10000L,
      s"sketchK=$sketchK too small for minShareBp=$minShareBp " +
        "(superset guarantee needs k > 10000/minShareBp)")
    import df.sparkSession.implicits._
    val vals = df.select(col(valueCol).cast("string").as("v"))
    val candidates = vals.as[String]
      .mapPartitions(it => misraGries(it, sketchK))
      .distinct().toDF("v")
    val total = vals.count()
    vals.join(broadcast(candidates), Seq("v"), "left_semi")
      .groupBy(col("v").as(valueCol))
      .agg(count(lit(1)).as("cnt"))
      // integer-exact share test: cnt/total > bp/10000
      .where(col("cnt") * 10000L > lit(total) * minShareBp)
  }
}
