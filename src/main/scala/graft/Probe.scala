package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch probe for perf investigations (not part of the contract). */
object Probe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.pipeline.Dedup
    import graft.functions.VectorFunctions

    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val corpus = docs.unionByName(
      docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))

    // minhash banded rows → bucket sizes
    val banded = time("banded rows") {
      val d = corpus.as[(Long, String)].mapPartitions { it =>
        it.map { case (id, text) =>
          val toks = text.split("\\s+")
          (id, toks.length)
        }
      }.toDF("id", "ntoks")
      d.agg(count(lit(1)), min("ntoks"), max("ntoks"), avg("ntoks")).show()
      d
    }

    // real bucket profile
    val pairsDf = Dedup.minhashLshPairs(corpus, jaccardThreshold = 0.5)
    // reconstruct the banded internals: count collisions
    // quick: count candidate pairs
    time("minhash pairs count")(println(pairsDf.count()))

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val withDups = emb.unionByName(
      emb.select((col("id") + 1000000L).as("id"), col("vec")))
    val sig = VectorFunctions.hyperplaneBuckets(withDups, "id", "vec", 12, 3)
      .select("id", "table", "bucket")
    time("emb bucket profile") {
      sig.groupBy("table", "bucket").count()
        .agg(count(lit(1)).as("n_buckets"), max("count").as("max_bucket"),
          avg("count").as("avg_bucket")).show()
    }
    time("emb pair count") {
      val a = sig.select(col("id").as("id_a"), col("table"), col("bucket"))
      val b = sig.select(col("id").as("id_b"), col("table"), col("bucket"))
      println(a.join(b, Seq("table", "bucket")).where(col("id_a") < col("id_b")).count())
    }
    spark.stop()
  }
}
