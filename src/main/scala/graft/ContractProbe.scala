package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Dev-only: re-measure the two CORPUS-DEPENDENT contract bounds
  * (COVERAGE.md caveat) on a given dataset dir — the validation a new
  * corpus must run before trusting q_dedup_simhash's hamming bound and
  * q_dedup_embedding's "no natural ≥0.99 cosine pair" assumption.
  *
  *   1. simhash: distribution of hamming(sig_a, sig_b) over the
  *      exact-Jaccard ≥ 0.9 ground-truth pair set (same LSH-candidates →
  *      n-gram-verify derivation as the driver contract query);
  *   2. embeddings: census of natural (distinct-id) cosine ≥ 0.99 pairs
  *      by exhaustive scan — brute force on purpose: the validation must
  *      not depend on the recall of the structure it validates.
  *
  * Usage: runMain graft.ContractProbe [dataDir]   (default ScaleProbe.DerivedDir)
  */
object ContractProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(graft.ScaleProbe.DerivedDir)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // --- simhash hamming bound over exact-Jaccard ≥ 0.9 pairs ---
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val corpus = d.unionByName(
      d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val cand = Dedup.minhashLshPairs(corpus, jaccardThreshold = 0.5)
    val truth = Dedup.ngramJaccardVerify(corpus, cand.select("id_a", "id_b"))
      .where(col("jaccard") >= 0.9)
    val sigs = Dedup.simhashSignatures(corpus)
    val ham = truth
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("h"))
    val st = ham.agg(count(lit(1)).as("pairs"), max(col("h")).as("max_h"),
      expr("percentile(h, 0.99)").as("p99"),
      sum(when(col("h") > 16, 1L).otherwise(0L)).as("over_16")).head()
    println(s"[contract] simhash dir=$dir pairs=${st.getLong(0)} " +
      s"max_hamming=${st.get(1)} p99=${st.get(2)} over_bound_16=${st.getLong(3)}")

    // --- natural near-twin embedding census (brute force) ---
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("id"), col("embedding").as("vec"))
    val cos = graft.functions.VectorFunctions.cosine(col("vec"), col("cvec"))
    val near = e.join(
        broadcast(e.select(col("id").as("cid"), col("vec").as("cvec"))),
        col("id") < col("cid") && cos >= 0.99)
      .agg(count(lit(1)).as("n")).head().getLong(0)
    println(s"[contract] embeddings dir=$dir natural_pairs_ge_0.99=$near")
    spark.stop()
  }
}
