package graft.streaming

import org.apache.spark.sql.SparkSession

import graft.model.Checkpoint
import graft.sources.ChangeFeed

/** dtail CLI (K4) — tail a relay event log to the console.
  *
  * Reference: databus-tools/databus-dtail-impl/.../Dtail.java:48,516 and
  * DtailCliBase.java:34-60 (BOB/EOB/SCN start, max events, output format).
  *
  * Usage: runMain graft.streaming.DtailMain
  *          <eventLogDir | sfDir> [BOB|EOB|<scn>] [numEvents] [format]
  *   - format ∈ JSON | AVRO_JSON | AVRO_BIN | EVENT_INFO | NOOP
  *   - if given an sfDir (contains events.parquet), builds a temp event log
  *     from it first (demo mode).
  */
object DtailMain {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val scnSpec = if (args.length > 1) args(1) else "BOB"
    val numEvents = if (args.length > 2) args(2).toLong else 20L
    val fmt = if (args.length > 3) args(3) else "JSON"

    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val logDir =
      if (new java.io.File(s"$src/events.parquet").exists()) {
        val d = java.nio.file.Files.createTempDirectory("dtail-log").toString
        RelayStream.writeEventLog(ChangeFeed.envelope(spark, src), d)
        println(s"[dtail] built event log from $src at $d")
        d
      } else src

    val (minScn, maxScn) = RelayStream.bufferInfo(spark, logDir)
    println(s"[dtail] bufferInfo: minScn=$minScn maxScn=$maxScn")
    Dtail.tail(spark, logDir, scnSpec, fmt, maxEvents = numEvents)
      .awaitTermination()
    spark.stop()
  }
}
