package graft

import org.apache.spark.sql.SparkSession

/** Driver-style t1 smoke: a *plain* session (no special confs — the driver
  * owns its own session) → SparkEntry.entry → rows > 0. Guards against
  * entry depending on session-level settings it didn't set itself. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"SMOKE entry rows=$n ${if (n > 0) "OK" else "EMPTY!"}")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
