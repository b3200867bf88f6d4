package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: print warm time + join/exchange/scan skeleton of a query plan. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { name =>
      val q = SparkEntry.queries(name)(spark, dir)
      q.count()
      val t0 = System.nanoTime(); q.count()
      println(f"== $name warm ${(System.nanoTime() - t0) / 1e9}%.2f")
      println(q.queryExecution.executedPlan.toString.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Exchange") || l.contains("FileScan") ||
          l.contains("Aggregate") || l.contains("Sort")).mkString("\n"))
    }
    spark.stop()
  }
}
