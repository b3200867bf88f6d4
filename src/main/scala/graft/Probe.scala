package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch probe for perf investigations (not part of the contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // pair recall of the LSH-blocked within-cell search on the banded
    // near-dup corpus — the measurement behind q_semdedup_recall's floor
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val corpus = graft.sources.WireFixtures.nearDupBandCorpus(spark, dir)
      val t = 0.95
      val exact = graft.pipeline.Semantic.withinCellDupPairs(
        corpus, k = 8, iters = 3, cosineThreshold = t).count()
      val lsh = graft.pipeline.Semantic.withinCellDupPairs(
        corpus, k = 8, iters = 3, cosineThreshold = t,
        intraCellPlanes = 8, intraCellTables = 4).count()
      val lo = graft.pipeline.Semantic.withinCellDupPairs(
        corpus, k = 8, iters = 3, cosineThreshold = t,
        intraCellPlanes = 16, intraCellTables = 1).count()
      println(f"[pairs] dir=$dir t=$t exact=$exact lsh=$lsh " +
        f"recall=${if (exact > 0) lsh.toDouble / exact else -1.0}%.4f " +
        f"starved=$lo starvedRecall=${
          if (exact > 0) lo.toDouble / exact else -1.0}%.4f")
    }
    spark.stop()
  }
}
