package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Dev-only: measure the FIXED cost of one AvailableNow foreachBatch drain
  * (query start → microbatch → commit → termination) with a trivial feed
  * and a no-op body — the floor under every *_stream bench query. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("streamprobe").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(s"$root/feed")
    def drain(cp: String): Double = {
      val t0 = System.nanoTime()
      val q = spark.readStream.schema("id LONG, v STRING")
        .parquet(s"$root/feed")
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) => b.count(); () }
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 6).foreach { i =>
      val t = drain(s"$root/cp$i")
      println(f"drain $i (fresh cp): $t%.3f s")
    }
    // resumed drains off one checkpoint (the harness pattern)
    val cp = s"$root/cpR"
    (1 to 3).foreach { i =>
      val t = drain(cp)
      println(f"drain resume $i:    $t%.3f s")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    spark.stop()
  }
}
