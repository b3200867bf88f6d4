package graft

import org.apache.spark.sql.SparkSession

/** Dev-only timing harness: runs the named queries (or all) twice each and
  * prints cold/warm seconds — separates JIT/codegen warm-up from real cost
  * when hunting bench regressions. Not part of the driver contract. */
object BenchDev {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted else args.toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").collect()
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      def once(): Double = {
        val t0 = System.nanoTime()
        // Bench.force, not count(): count() lets the optimizer prune
        // left-join subtrees and under-times semdedup-shaped queries
        Bench.force(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once(); val warm = once()
      println(f"$n%-24s cold=$cold%7.2f warm=$warm%7.2f")
    }
    spark.stop()
  }
}
