package graft

import graft.functions.Bpe

import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val W = Bpe.EndOfWord

  test("training derives the hand-computed merge sequence") {
    // freq table: "ab"×3, "abc"×2. Pair votes round 1: (a,b)=5 wins;
    // round 2: (ab,\0)=3; round 3: (ab,c)=2 ties (c,\0)=2, lexicographic
    // pair order breaks to (ab,c); round 4: (abc,\0)=2; then exhausted —
    // asking for more merges than exist must stop, not loop.
    val corpus = Seq("ab ab abc", "ab abc").toDF("text")
    val m = Bpe.train(corpus, "text", numMerges = 10)
    assert(m.merges == Seq(
      ("a", "b"), ("ab", W), ("ab", "c"), ("abc", W)))
  }

  test("encoding replays merges by rank, not discovery order") {
    val model = Bpe.Model(Seq(
      ("e", "r"), ("er", W), ("l", "o"), ("lo", "w"),
      ("low", "er" + W), ("r", "e")))
    assert(model.encodeWord("lower") == Seq("lower" + W))
    assert(model.encodeWord("low") == Seq("low", W))
    assert(model.encodeWord("er") == Seq("er" + W))
    assert(model.encodeWord("re") == Seq("re", W))
    assert(model.encodeWord("wide") == Seq("w", "i", "d", "e", W))
    // merge applies to ALL occurrences in a word, leftmost first
    assert(model.encodeWord("erer") == Seq("er", "er" + W))
    // counts include whitespace runs as single tokens
    assert(model.tokenCount("lower low  er") == 1 + 1 + 2 + 1 + 1)
  }

  test("vocab cap reports the exact dropped word/occurrence mass") {
    // 4 distinct words: zz×5, yy×3, xx×2, w×1 (11 occurrences). Cap at 2
    // keeps {zz, yy} (8 occ) and must LOUDLY report dropping 2 words / 3
    // occurrences — the "no silent caps" contract on Bpe.train.
    val corpus = Seq("zz zz yy xx w", "zz zz zz yy yy xx").toDF("text")
    val m = Bpe.train(corpus, "text", numMerges = 2, maxVocabWords = 2)
    val st = m.vocabStats.get
    assert(st == Bpe.VocabStats(
      totalWords = 4, totalOccurrences = 11,
      keptWords = 2, keptOccurrences = 8))
    assert(st.droppedWords == 2 && st.droppedOccurrences == 3)
    // uncapped training on the same corpus drops nothing
    val full = Bpe.train(corpus, "text", numMerges = 2).vocabStats.get
    assert(full.droppedWords == 0 && full.droppedOccurrences == 0)
    assert(full.keptOccurrences == 11)
  }

  test("roundtrip is exact on messy whitespace and unseen chars") {
    val model = Bpe.Model(Seq(("a", "b")))
    for (t <- Seq("a  b\n\tc", "ab ba", "", "  ", "xyζω!", "a\nb\r\nc"))
      assert(model.decode(model.encode(t)) == t, s"roundtrip of '$t'")
  }

  test("trained model persists and reloads identically (merges table)") {
    val corpus = Seq("low low low lower lower widest").toDF("text")
    val m = Bpe.train(corpus, "text", numMerges = 8)
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    Bpe.save(m, spark, dir)
    val back = Bpe.load(spark, dir)
    assert(back.merges == m.merges)
    // the column API agrees with the kernel on the corpus
    val got = corpus.select(Bpe.tokenCount(back)($"text")).as[Long].head()
    assert(got == m.tokenCount("low low low lower lower widest"))
  }

  test("trained merges compress the corpus it was trained on") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text").limit(200)
    val model = Bpe.train(docs, "text", numMerges = 100)
    assert(model.merges.size == 100)
    val counts = docs.select(
      Bpe.tokenCount(model)($"text").as("bpe"),
      (length($"text") + lit(1)).as("upper"))
      .agg(sum($"bpe"), sum($"upper")).head()
    // token count is strictly below the no-merge ceiling (chars + eow
    // per word ≤ chars+1 bound is loose; 100 merges must bite hard)
    assert(counts.getLong(0) < counts.getLong(1) / 2)
    // and the roundtrip holds on real text
    val bad = docs.where(
      Bpe.roundtrip(model)($"text") =!= $"text").count()
    assert(bad == 0)
  }
}
