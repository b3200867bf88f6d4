package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev-only: run a query once warm, then re-run it with a job listener and
  * print every Spark job's wall time + the driver-side gaps between jobs.
  * Harness-heavy queries (store build + appends + compaction + serve) spend
  * their time across dozens of jobs; this attributes the wall to them.
  * Usage: runMain graft.JobProbe <queryName> [queryName ...]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      Bench.force(fn(spark, dir)) // warm pass: JIT + fixture onboarding
      val jobs = mutable.ArrayBuffer[(Int, Long, Long, String)]()
      val starts = mutable.Map[Int, (Long, String)]()
      val listener = new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit =
          starts(js.jobId) = (js.time,
            Option(js.properties)
              .flatMap(p => Option(p.getProperty("callSite.short")))
              .getOrElse(""))
        override def onJobEnd(je: SparkListenerJobEnd): Unit =
          starts.remove(je.jobId).foreach { case (t0, d) =>
            jobs.synchronized { jobs += ((je.jobId, t0, je.time, d)) }
          }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      Bench.force(fn(spark, dir))
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(200) // let the listener bus drain
      val sorted = jobs.sortBy(_._2).toSeq
      println(f"== $name wall=$wall%.2f s, jobs=${sorted.size}")
      var prevEnd = 0L
      var jobSum = 0.0
      sorted.foreach { case (id, s, e, d) =>
        val gap = if (prevEnd == 0) 0.0 else (s - prevEnd) / 1e3
        prevEnd = math.max(prevEnd, e)
        jobSum += (e - s) / 1e3
        val desc = if (d.length > 60) d.take(60) else d
        println(f"  job $id%4d ${(e - s) / 1e3}%7.3f s  gap=$gap%7.3f s  $desc")
      }
      println(f"  jobs total=$jobSum%.2f s, driver-side = ${wall - jobSum}%.2f s")
    }
    spark.stop()
  }
}
