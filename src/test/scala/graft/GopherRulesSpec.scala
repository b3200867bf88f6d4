package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Bit-parity of the fused [[graft.functions.GopherRules]] kernel with
  * the declarative rule battery it replaced
  * ([[TextFunctions.gopherRulesDeclarative]]) — the swap is a
  * performance change ONLY: same tokenization (Spark `split` with the
  * default limit -1, leading/trailing empty tokens included), same
  * code-point lengths, same sorted-run bigram mode, same NaN punct
  * semantics on the empty document, same non-overlapping stopword
  * counts, and a NULL document yields the same struct of NULL fields.
  * The DuckDB oracle for q_gopher_rules re-derives every verdict bit,
  * so parity here keeps oracle parity there. */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  /** Every rule edge in one handful of documents. (The empty document
    * is deliberately NOT here: under the session's default ANSI mode
    * the declarative battery's punct ratio raises DIVIDE_BY_ZERO on
    * length 0, so it has no answer to compare — the dedicated test
    * below pins that divergence and the kernel's oracle-matching
    * verdict.) */
  private val edgeDocs: Seq[String] = Seq(
    " ",                         // ws-only: ["", ""]
    "   \t\n  ",                 // ws-run-only
    " leading ws",               // leading empty token
    "trailing ws ",              // trailing empty token
    "one",                       // single token, no bigrams
    "two toks",                  // exactly one bigram (mode frac = 1)
    "a a a a a a a a a a",       // degenerate repetition, all-dup
    "the and of a the and of a", // all stopwords, repeated bigrams
    "x y x y x y z w q r s t",   // clear mode bigram among others
    ("the quick brown fox jumps over the lazy dog " * 5).trim,
    "punct!!! ,,,, ;;; ((())) [][]{} --- ??? ::: '''\"\"\"",
    "unicode éèê café naïve 你好" +
      " 😀😀 mixed",   // BMP accents, CJK, emoji
    "verticaltab is not whitespace here",
    "  double  spaced   runs\tand\ttabs\nnewlines\ftoo\r",
    Seq.tabulate(60)(i => s"w$i").mkString(" "))  // len_ok band member

  test("kernel == declarative battery on edge cases and the corpus") {
    val docs = edgeDocs.toDF("text")
      .unionByName(spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("text")))
    val cmp = docs.select(
      TextFunctions.gopherRules(col("text")).as("f"),
      TextFunctions.gopherRulesDeclarative(col("text")).as("d"))
    val n = cmp.count()
    assert(n > edgeDocs.size, "corpus rows missing from the fixture")
    val mismatched = cmp.where(not(col("f") <=> col("d"))).collect()
    assert(mismatched.isEmpty,
      s"${mismatched.length} parity mismatches, first: " +
        mismatched.headOption.map(_.toString).getOrElse(""))
  }

  test("empty document: kernel keeps the oracle's IEEE verdict where " +
    "the declarative battery raises ANSI DIVIDE_BY_ZERO") {
    // declarative: length('') = 0 -> 0/0 under ANSI mode throws
    val e = intercept[Exception] {
      Seq("").toDF("text")
        .select(TextFunctions.gopherRulesDeclarative(col("text")).as("r"))
        .collect()
    }
    assert(e.getMessage.contains("DIVIDE_BY_ZERO"), e.getMessage.take(120))
    // kernel: 0/0 = NaN (IEEE, DuckDB's float semantics); NaN fails
    // <= maxPunct, so punct_ok is FALSE — the same verdict the oracle
    // derives — and the scan survives degenerate rows at 100 TB
    val r = Seq("").toDF("text")
      .select(TextFunctions.gopherRules(col("text")).as("r"))
      .head().getStruct(0)
    assert(!r.getBoolean(4), "punct_ok must be false on the empty doc")
    assert(!r.getBoolean(0), "one empty token fails minTokens")
    assert(!r.getBoolean(6))
  }

  test("null document -> struct of NULL fields, not a NULL struct") {
    val one = Seq(Option.empty[String]).toDF("text")
      .select(TextFunctions.gopherRules(col("text")).as("r"))
    val row = one.head()
    assert(!row.isNullAt(0), "fused kernel returned a NULL struct")
    val r = row.getStruct(0)
    (0 until 7).foreach(i => assert(r.isNullAt(i), s"field $i not null"))
    // and identical to the declarative battery's null behavior
    val d = Seq(Option.empty[String]).toDF("text")
      .select(TextFunctions.gopherRulesDeclarative(col("text")).as("r"))
      .head()
    assert(!d.isNullAt(0) && (0 until 7).forall(d.getStruct(0).isNullAt))
  }

  test("kernel == declarative under interpreted eval (codegen off)") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val cmp = edgeDocs.toDF("text").select(
        TextFunctions.gopherRules(col("text")).as("f"),
        TextFunctions.gopherRulesDeclarative(col("text")).as("d"))
      assert(cmp.where(not(col("f") <=> col("d"))).count() == 0)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("thresholds ride the expression: a tightened battery flips rules") {
    import graft.functions.GraftFunctions
    val tight = GraftFunctions.gopher_rules(col("text"),
      minTokens = 1L, maxTokens = 3L, minMeanLen = 0.0, maxMeanLen = 99.0,
      maxDupFrac = 1.0, maxTopBigram = 1.0, maxPunct = 1.0,
      stopwords = Seq("zebra"))
    val r = Seq("the and of a").toDF("text")
      .select(tight.as("r")).head().getStruct(0)
    assert(!r.getBoolean(0), "4 tokens must fail maxTokens = 3")
    assert(!r.getBoolean(5), "no 'zebra' marker -> stop_ok false")
    assert(!r.getBoolean(6), "keep must be the conjunction")
  }
}
