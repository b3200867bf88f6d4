package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Frequency-sketch operators for heavy-hitter analytics over columns too
  * wide to group exactly (token vocabularies, URL hosts, key spaces).
  *
  * [[heavyHitters]] is EXACT despite using a sketch: per-partition
  * Misra-Gries summaries produce a candidate set that provably contains
  * every item with global frequency > n/k (pigeonhole over the merge: an
  * item below n_p/k in every partition sums below n/k globally), then one
  * broadcast-semi recount pass computes exact counts for candidates only.
  * Total cost: one narrow scan + one recount over candidate rows — the
  * full-vocabulary shuffle of a plain groupBy never happens.
  */
object Sketches {

  /** Per-partition Misra-Gries summary with `k` counters: the classic
    * decrement-all step amortizes to O(1) per element. */
  private def misraGries(it: Iterator[String], k: Int)
      : Iterator[String] = {
    val counters = new java.util.HashMap[String, Long](k * 2)
    it.foreach { v =>
      if (v != null) {
        val c = counters.getOrDefault(v, 0L) // stored counts are always >= 1
        if (c > 0L) counters.put(v, c + 1)
        else if (counters.size < k) counters.put(v, 1L)
        else {
          // decrement every counter; drop zeros
          val e = counters.entrySet().iterator()
          while (e.hasNext) {
            val en = e.next()
            if (en.getValue <= 1L) e.remove() else en.setValue(en.getValue - 1)
          }
        }
      }
    }
    import scala.jdk.CollectionConverters._
    counters.keySet().iterator().asScala
  }

  /** Exact items whose frequency exceeds `minShareBp` basis points of the
    * column's row count. `sketchK` must exceed 10000/minShareBp (default
    * gives 2× margin at 1%) — the superset guarantee needs k > 1/share.
    *
    * Scale shape: stage 1 scans once and emits ≤ k candidate strings per
    * partition (driver-collected — bounded by k × partitions, not
    * vocabulary); stage 2 recounts exactly via a broadcast semi-join +
    * map-side-combined count on candidate rows only. */
  def heavyHitters(df: DataFrame, valueCol: String, minShareBp: Int = 100,
      sketchK: Int = 2000): DataFrame = {
    require(minShareBp > 0 && sketchK.toLong * minShareBp > 10000L,
      s"sketchK=$sketchK too small for minShareBp=$minShareBp " +
        "(superset guarantee needs k > 10000/minShareBp)")
    import df.sparkSession.implicits._
    val vals = df.select(col(valueCol).cast("string").as("v"))
    val candidates = vals.as[String]
      .mapPartitions(it => misraGries(it, sketchK))
      .distinct().toDF("v")
    val total = vals.count()
    vals.join(broadcast(candidates), Seq("v"), "left_semi")
      .groupBy(col("v").as(valueCol))
      .agg(count(lit(1)).as("cnt"))
      // integer-exact share test: cnt/total > bp/10000
      .where(col("cnt") * 10000L > lit(total) * minShareBp)
  }

  /** Document-level co-occurrence with pointwise mutual information —
    * the classic word-association statistic (Church & Hanks 1990) a
    * corpus-forensics pass runs to surface collocations, templated
    * boilerplate and topic structure. Doc-frequency based: `n_a` = docs
    * containing token a, `n_ab` = docs containing both, PMI over a
    * corpus of `N` docs in integer 1e-4 units —
    * `floor(log2((n_ab·N) / (n_a·n_b)) · 10000 + 1e-6)` (the
    * charEntropy nudge convention, so external engines reproduce the
    * floor bit-for-bit on non-boundary values).
    *
    * Scale shape: the vocabulary is capped at `topV` by doc frequency
    * (ties → lexicographic) — the restricted-vocab discipline every
    * co-occurrence miner applies, and the bound that makes the plan
    * safe at 100 TB: the per-doc pair explode is ≤ V²/2 rows, and the
    * pair aggregate has AT MOST V² distinct keys, so map-side partial
    * aggregation collapses the shuffle to vocab-sized regardless of
    * corpus size. The vocab (≤ V rows by construction) collects to the
    * driver once — the Ann-codebook pattern — so the membership gate is
    * an isin filter and the count lookups a literal map, with ONE
    * aggregate over the persisted distinct-token table; the only
    * corpus-sized operations are the distinct-token explode and the
    * doc-keyed self-join of (doc, token) rows for vocab tokens only.
    * The cap is not silent: emitted
    * rows carry `n_a`/`n_b`, and a token outside the top-V simply has
    * no rows — `topV` is the caller's explicit knob. */
  def cooccurrencePmi(docs: DataFrame, topV: Int = 100,
      minPairDocs: Long = 1L, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(topV > 1, s"cooccurrencePmi: topV must be > 1 (got $topV)")
    // distinct tokens per doc, persisted: three consumers (doc-frequency
    // aggregate + both sides of the pair join)
    val docTokens = PlanCache.getOrPersist(docs,
      s"coocc-dtok|$textCol|$idCol",
      docs.select(col(idCol).cast("long").as("doc_id"),
          explode(array_distinct(split(col(textCol),
            graft.functions.TextFunctions.WsPlus))).as("token"))
        .where(length(col("token")) > 0))
    // the vocab is ≤ topV rows BY CONSTRUCTION — collect it once on
    // the driver (the Ann codebook pattern) instead of re-running the
    // corpus-token aggregate for every downstream consumer: the gate
    // becomes an isin filter and the count lookups a literal map, so
    // the whole statistic costs ONE aggregate over the persisted
    // distinct-token table plus the bounded pair aggregate
    val vocabRows = docTokens.groupBy(col("token"))
      .agg(count(lit(1)).as("n")) // rows are distinct per doc ⇒ doc freq
      .orderBy(col("n").desc, col("token"))
      .limit(topV)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val nOf = typedlit(vocabRows.toMap)
    val dv = docTokens
      .where(col("token").isin(vocabRows.map(_._1).toSeq: _*))
    val tot = docs.agg(
      countDistinct(col(idCol)).as("n_docs_total"))
    dv.select(col("doc_id"), col("token").as("token_a"))
      .join(dv.select(col("doc_id"), col("token").as("token_b")), "doc_id")
      .where(col("token_a") < col("token_b"))
      .groupBy(col("token_a"), col("token_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minPairDocs)
      .crossJoin(tot) // 1-row scalar, broadcast by construction
      .select(col("token_a"), col("token_b"), col("n_ab"),
        element_at(nOf, col("token_a")).as("n_a"),
        element_at(nOf, col("token_b")).as("n_b"),
        col("n_docs_total"))
      .select(col("token_a"), col("token_b"), col("n_ab"),
        col("n_a"), col("n_b"),
        floor(log2((col("n_ab") * col("n_docs_total")).cast("double") /
            (col("n_a") * col("n_b")).cast("double")) * 10000 + 1e-6)
          .cast("long").as("pmi_e4"))
  }
}
