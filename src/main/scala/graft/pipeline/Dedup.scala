package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorFunctions}

/** Document deduplication family for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design (the whole point of these ops at 100 TB):
  *  - no pairwise O(n²) step ever touches the full corpus — candidate
  *    generation is always a bucket equi-join (shuffle on short keys),
  *    verification runs only inside buckets;
  *  - signatures are computed as codegen'd higher-order-function
  *    expressions over the scan (no UDF, no python);
  *  - representatives are chosen with min/max aggregates, not sorts.
  */
object Dedup {

  /** Exact dedup by content hash: one hash-shuffle on a 16-byte key.
    * Output: one row per distinct content with the representative (min) id
    * and the duplicate count. */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id")
      : DataFrame =
    docs.groupBy(md5(col(textCol).cast("binary")).as("content_hash"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("dup_count"))

  /** Keep only the representative row per distinct content (the "dedup and
    * keep one" materialization). */
  def exactKeepOne(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol).cast("binary"))).orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** Word n-gram shingles of a document (distinct). */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextFunctions.tokens(text)
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** MinHash signature: for hash function j, min over shingles of
    * xxhash64(j, shingle). k independent functions via seed mixing —
    * standard broadcast-free construction. */
  def minhashSignature(shingleArr: Column, k: Int = 64): Column =
    array((0 until k).map { j =>
      array_min(transform(shingleArr, s => xxhash64(lit(j), s)))
    }: _*)

  /** MinHash + banded LSH near-dup candidate pairs with exact-Jaccard
    * verification.
    *
    * Pipeline: shingle → k-minhash → split into `bands` bands of `k/bands`
    * rows → per-band bucket id = hash(band slice) → self-equi-join on
    * (band, bucket) → distinct candidate pairs → verify estimated Jaccard =
    * matching minhash fraction ≥ threshold.
    *
    * Shuffle profile at scale: explode to `bands` rows per doc (narrow),
    * one shuffle on (band, bucket), then the join output is only
    * collision-sized. The full signature rides along (k longs) instead of
    * the document text, so shuffle bytes stay bounded.
    */
  def minhashLshPairs(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", shingleN: Int = 3, k: Int = 64,
      bands: Int = 16, jaccardThreshold: Double = 0.5): DataFrame = {
    val rows = k / bands
    // Materialize shingles as their own projection so the k minhash
    // transforms reference one computed array instead of inlining the
    // shingle expression k times (CollapseProject keeps non-cheap aliases
    // un-inlined when referenced repeatedly).
    val sig = docs
      .select(col(idCol).as("id"), shingles(col(textCol), shingleN).as("sh"))
      .select(col("id"), minhashSignature(col("sh"), k).as("sig"))
    val banded = sig.select(col("id"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bucket",
        xxhash64(col("band"), concat_ws(",",
          transform(slice(col("sig"), col("band") * rows + 1, lit(rows)),
            v => v.cast("string")))))
    val a = banded.select(col("id").as("id_a"), col("sig").as("sig_a"),
      col("band"), col("bucket"))
    val b = banded.select(col("id").as("id_b"), col("sig").as("sig_b"),
      col("band"), col("bucket"))
    val cand = a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b").distinct()
    cand.withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
          when(x === y, lit(1)).otherwise(lit(0))), v => v === 1))
          .cast("double") / k)
      .where(col("est_jaccard") >= jaccardThreshold)
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 6).as("est_jaccard"))
  }

  /** Exact n-gram Jaccard for a (small) candidate pair set: join shingle
    * arrays back and compute |∩|/|∪| with array intersections. Verification
    * stage only — never run on the full cross product. */
  def ngramJaccardVerify(docs: DataFrame, pairs: DataFrame,
      textCol: String = "text", idCol: String = "doc_id", shingleN: Int = 3)
      : DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      shingles(col(textCol), shingleN).as("sh"))
    pairs
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash over word tokens: per bit, sum ±1 votes of each token's
    * xxhash64 bit, sign → bit. Near-dups = hamming distance ≤ `maxHamming`
    * among bucket collisions on 4 16-bit chunks (each chunk is an exact-
    * match blocking key — standard simhash blocking).
    *
    * `tokenHashes` must be a *materialized* `array<long>` column (hash each
    * token once); the 64 per-bit votes then fold over the precomputed
    * array instead of re-hashing per bit. */
  def simhashFromHashes(tokenHashes: Column): Column = {
    val bits = (0 until 64).map { bit =>
      val votes = aggregate(tokenHashes, lit(0L), (acc, h) =>
        acc + when(shiftright(h, bit).bitwiseAND(1L) === 1L, lit(1L))
          .otherwise(lit(-1L)))
      when(votes > 0, lit(1L)).otherwise(lit(0L)) * lit(1L) * pow2(bit)
    }
    bits.reduce(_ + _)
  }

  def tokenHashes(text: Column): Column =
    transform(TextFunctions.tokens(text), t => xxhash64(t))

  private def pow2(bit: Int): Column = lit(if (bit >= 63) Long.MinValue else 1L << bit)

  /** SimHash near-dup pairs via 16-bit chunk blocking + hamming verify. */
  def simhashPairs(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", maxHamming: Int = 3): DataFrame = {
    val sigs = docs
      .select(col(idCol).as("id"), tokenHashes(col(textCol)).as("th"))
      .select(col("id"), simhashFromHashes(col("th")).as("sig"))
    val chunked = sigs.select(col("id"), col("sig"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("sig"), c * 16).bitwiseAND(0xFFFFL).as("key"))
      }: _*)).as("blk"))
      .select(col("id"), col("sig"), col("blk.chunk"), col("blk.key"))
    val a = chunked.select(col("id").as("id_a"), col("sig").as("sig_a"),
      col("chunk"), col("key"))
    val b = chunked.select(col("id").as("id_b"), col("sig").as("sig_b"),
      col("chunk"), col("key"))
    a.join(b, Seq("chunk", "key")).where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b").distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Embedding-cosine near-dup: hyperplane-LSH buckets then cosine verify
    * inside buckets. Same blocking discipline as minhash — the cross
    * product only ever materializes within a bucket. `tables` independent
    * hash tables (different hyperplane seeds) control recall: a true
    * near-dup that straddles one table's hyperplane still collides in
    * another (miss probability decays exponentially in tables). */
  def embeddingNearDups(emb: DataFrame, vecCol: String = "embedding",
      idCol: String = "vec_id", numPlanes: Int = 12, tables: Int = 3,
      cosineThreshold: Double = 0.95): DataFrame = {
    val sig = emb.select(col(idCol).as("id"), col(vecCol).as("vec"),
      explode(array((0 until tables).map { t =>
        struct(lit(t).as("table"),
          VectorFunctions.signatureToBucket(
            VectorFunctions.hyperplaneSignature(col(vecCol), numPlanes,
              seed = 42L + t * 1000L)).as("bucket"))
      }: _*)).as("tb"))
      .select(col("id"), col("vec"), col("tb.table"), col("tb.bucket"))
    val a = sig.select(col("id").as("id_a"), col("vec").as("vec_a"),
      col("table"), col("bucket"))
    val b = sig.select(col("id").as("id_b"), col("vec").as("vec_b"),
      col("table"), col("bucket"))
    a.join(b, Seq("table", "bucket")).where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "vec_a", "vec_b").distinct()
      .withColumn("cosine", VectorFunctions.cosine(col("vec_a"), col("vec_b")))
      .where(col("cosine") >= cosineThreshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}
