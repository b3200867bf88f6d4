package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact byte-pair-encoding tokenization with an explicit merges table —
  * the tokenizer-faithful counterpart of
  * [[TextFunctions.bpeishTokenCount]]'s regex proxy, for pipelines whose
  * budgets must count what a trainer's tokenizer counts
  * (mixToBudget/packChunks).
  *
  * Public-knowledge algorithm (Sennrich, Haddow & Birch 2016, "Neural
  * Machine Translation of Rare Words with Subword Units"): training
  * greedily records the most frequent adjacent symbol pair over a
  * word-frequency table; encoding replays the merges by rank until none
  * applies.
  *
  * Scale shape: training aggregates the corpus to its word-frequency
  * table FIRST (one shuffle; vocabulary-sized, not corpus-sized — at
  * 100 TB this is the only pass that sees the corpus) and runs the
  * classic in-memory merge loop over that table on the driver, which is
  * exactly how the reference implementations train. Encoding is a
  * per-partition kernel over the broadcast-serialized ranks map with a
  * per-task word→tokens memo, so hot words (Zipf mass) tokenize once per
  * task. The merge loop is data-dependent iteration — not expressible as
  * a codegen'd SQL primitive — so this is the documented exception to
  * the functions-not-UDFs rule; the planted-count and corpus-roundtrip
  * driver queries hash-oracle it end to end.
  */
object Bpe {

  /** End-of-word marker appended to each word's symbol sequence (the
    * Sennrich `</w>`, as a NUL character so it can never collide with a
    * merged symbol built from real text). Input text containing NUL is
    * outside the contract: decode strips every marker occurrence, so a
    * NUL-carrying document would not round-trip (loudly — the roundtrip
    * oracle hashes full text). */
  val EndOfWord = "\u0000"

  /** Training-time vocabulary-cap accounting: how much of the corpus the
    * `maxVocabWords` frequency cap excluded from merge voting — the
    * "no silent caps" contract. `droppedOccurrences / totalOccurrences`
    * is the token mass the merge statistics never saw; the Zipf argument
    * for the cap predicts it stays tiny, and this makes that claim
    * checkable per corpus instead of assumed. */
  case class VocabStats(totalWords: Long, totalOccurrences: Long,
      keptWords: Long, keptOccurrences: Long) {
    def droppedWords: Long = totalWords - keptWords
    def droppedOccurrences: Long = totalOccurrences - keptOccurrences
  }

  case class Model(merges: Seq[(String, String)],
      vocabStats: Option[VocabStats] = None) {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** Per-deserialized-instance (= per task) word→tokens memo: Zipf-hot
      * words pay the merge loop once per task, not once per occurrence. */
    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]

    /** Greedy merge replay for one word: chars + end-of-word marker,
      * then repeatedly merge every non-overlapping occurrence (leftmost
      * first) of the lowest-rank pair present. */
    def encodeWord(word: String): Seq[String] = {
      val hit = memo.get(word)
      if (hit != null) return hit
      var syms: Vector[String] =
        word.map(_.toString).toVector :+ EndOfWord
      var done = false
      while (!done && syms.length > 1) {
        var bestRank = Int.MaxValue
        var i = 0
        while (i < syms.length - 1) {
          val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < bestRank) bestRank = r
          i += 1
        }
        if (bestRank == Int.MaxValue) done = true
        else {
          val (a, b) = merges(bestRank)
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
              out += a + b; j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out.result()
        }
      }
      if (memo.size > 100000) memo.clear() // bound the per-task memo
      memo.put(word, syms)
      syms
    }

    /** Whitespace-preserving pre-tokenization: non-space runs get the
      * merge loop, whitespace runs pass through as single atomic tokens
      * — so decode is exact concatenation and the corpus roundtrip
      * hash-oracles byte-for-byte. */
    def encode(text: String): Seq[String] =
      Segments.findAllIn(text).flatMap { seg =>
        if (isWs(seg.charAt(0))) Iterator.single(seg)
        else encodeWord(seg).iterator
      }.toSeq

    def decode(tokens: Seq[String]): String =
      tokens.mkString("").replace(EndOfWord, "")

    def tokenCount(text: String): Long = {
      var n = 0L
      Segments.findAllIn(text).foreach { seg =>
        if (isWs(seg.charAt(0))) n += 1
        else n += encodeWord(seg).length
      }
      n
    }
  }

  /** The SAME whitespace set [[TextFunctions.Ws]] spells as a regex —
    * segment classification must agree with the [[Segments]] split
    * (Character.isWhitespace would call U+000B whitespace, but the RE2
    * set puts it in a word run: a run STARTING with U+000B would then
    * count 1 instead of going through the merge loop). */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  private val Segments = (graft.functions.TextFunctions.WsPlus + "|" + graft.functions.TextFunctions.NonWs + "+").r

  /** Exact-BPE token count as a column (whitespace runs count 1 token
    * each, like any byte-faithful tokenizer's space handling). */
  def tokenCount(model: Model)(text: Column): Column = {
    val f = udf((t: String) => if (t == null) 0L else model.tokenCount(t))
    f(text)
  }

  /** encode→decode roundtrip as a column — the identity on NUL-free
    * text; hashes against the raw column in the driver oracle. */
  def roundtrip(model: Model)(text: Column): Column = {
    val f = udf((t: String) =>
      if (t == null) null else model.decode(model.encode(t)))
    f(text)
  }

  /** Train `numMerges` merges on a corpus: ONE distributed aggregation
    * reduces the corpus to its word-frequency table (capped at
    * `maxVocabWords` by frequency — the untrained tail is Zipf dust that
    * can never win a merge vote), then the classic driver-side greedy
    * loop. Deterministic: ties break to the lexicographically smallest
    * pair, and the frequency cap ties break by word. The cap is NOT
    * silent: the returned model carries [[VocabStats]] with the exact
    * word count and occurrence mass the cap dropped, so a caller can
    * assert the Zipf assumption (dropped mass ≈ 0) on their corpus. */
  def train(corpus: DataFrame, textCol: String, numMerges: Int,
      maxVocabWords: Int = 50000): Model = {
    // word-frequency table persisted (vocabulary-sized — orders of
    // magnitude below the corpus) because TWO driver reads consume it:
    // the capped top-k feeding the merge loop, and the total-mass
    // aggregate that makes the cap LOUD (Model.vocabStats) instead of
    // a silent truncation
    val wordFreq = graft.pipeline.PlanCache.getOrPersist(corpus,
      s"bpe-wordfreq|$textCol",
      corpus
        .select(explode(split(col(textCol), TextFunctions.WsPlus)).as("w"))
        .where(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("n")))
    val totals = wordFreq.agg(count(lit(1)).as("words"),
      coalesce(sum(col("n")), lit(0L)).as("occ")).head()
    val freqRows = wordFreq
      .orderBy(col("n").desc, col("w"))
      .limit(maxVocabWords)
      .collect()
    val stats = VocabStats(
      totalWords = totals.getLong(0),
      totalOccurrences = totals.getLong(1),
      keptWords = freqRows.length.toLong,
      keptOccurrences = freqRows.iterator.map(_.getLong(1)).sum)
    // words as mutable symbol sequences alongside their frequencies
    val words = freqRows.map { r =>
      (r.getString(0).map(_.toString).toArray :+ EndOfWord, r.getLong(1))
    }
    val merges = Seq.newBuilder[(String, String)]
    var made = 0
    var exhausted = false
    while (made < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        var best: (String, String) = null
        var bestN = -1L
        counts.foreach { case (pair, n) =>
          if (n > bestN || (n == bestN &&
              Ordering[(String, String)].lt(pair, best))) {
            best = pair; bestN = n
          }
        }
        merges += best
        made += 1
        var wi = 0
        while (wi < words.length) {
          val (syms, n) = words(wi)
          // in-place pair collapse, leftmost-first non-overlapping
          val out = Array.newBuilder[String]
          var j = 0
          var changed = false
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == best._1 &&
                syms(j + 1) == best._2) {
              out += best._1 + best._2; j += 2; changed = true
            } else { out += syms(j); j += 1 }
          }
          if (changed) words(wi) = (out.result(), n)
          wi += 1
        }
      }
    }
    Model(merges.result(), Some(stats))
  }

  /** Persist the merges table — (rank, a, b), the whole model — as the
    * shipped artifact a deployment trains once and serves everywhere
    * (same discipline as the ANN index store / minhash signature
    * store). */
  def save(model: Model, spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "a", "b")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  def load(spark: SparkSession, dir: String): Model =
    Model(spark.read.parquet(dir)
      .select("rank", "a", "b").collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq)
}
