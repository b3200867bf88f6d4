package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch probe for perf investigations (not part of the contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("q1_agg", "q3_join", "q5_join", "q_merge_txn",
      "q_apply_log", "q_dedup_minhash", "q_dedup_simhash", "q_ann_brute",
      "q_sessionize", "q_rollup", "q_topk_orders", "q_filter_keymod")
    // warm everything twice
    (1 to 2).foreach(_ => names.foreach(n =>
      try SparkEntry.queries(n)(spark, dir).count() catch { case _: Throwable => () }))
    def pass(label: String): Unit = {
      val t0 = System.nanoTime()
      val per = names.map { n =>
        val q0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).count()
        n -> (System.nanoTime() - q0) / 1e9
      }
      println(f"$label total ${(System.nanoTime() - t0) / 1e9}%.2f :: " +
        per.map { case (n, t) => f"$n=$t%.2f" }.mkString(" "))
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    pass("aqe-on ")
    pass("aqe-on ")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    pass("aqe-off")
    pass("aqe-off")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    pass("aqe-on ")
    spark.stop()
  }
}
