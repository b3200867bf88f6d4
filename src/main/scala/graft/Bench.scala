package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{DbusKeyFilter, KeyModFilter}
import graft.sources.ChangeFeed

/** Per-round benchmark: every SparkEntry query timed at the given SF, plus
  * the relay-pipeline throughput (events/sec through source → filter →
  * ordered dispatch — the BASELINE.md "thousands of events/sec/server"
  * comparison point). Prints ONE JSON line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the session (JVM/codegen/file-listing) outside any timer so the
    // first measured query isn't charged Spark startup.
    spark.range(1000).selectExpr("sum(id)").collect()
    ChangeFeed.envelope(spark, sfDir).limit(10).collect()

    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // relay pipeline throughput: envelope → mod-filter → per-partition
    // ordered scan, fully consumed
    val t0 = System.nanoTime()
    val filtered = graft.operators.Relay.streamOrdered(
      ChangeFeed.envelope(spark, sfDir),
      filter = DbusKeyFilter("MOD", Seq(KeyModFilter(4, 0, 3))))
    val nEvents = filtered.count()
    val pipeSec = (System.nanoTime() - t0) / 1e9
    val eventsPerSec = if (pipeSec > 0) nEvents / pipeSec else 0.0

    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""relay_events_per_sec":${eventsPerSec.round},"relay_events":$nEvents,""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
