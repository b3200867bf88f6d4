package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DSIR-style hashed n-gram importance selection (the
  * importance-resampling family of data-selection methods: score raw web
  * documents by how much more likely their hashed n-gram features are
  * under a small curated target corpus than under the raw corpus itself,
  * then keep the high-ratio docs).
  *
  * The feature space is `buckets` hashed word-bigram buckets. Both
  * distributions reduce to one tiny (bucket, count) table each — at most
  * `buckets` rows regardless of corpus size — so scoring a 100 TB raw
  * corpus is: one map-side gram explode, two BROADCAST joins against the
  * bucket tables, one groupBy(doc_id). No corpus-sized shuffle beyond the
  * per-doc aggregation, and the target corpus (small by definition) is
  * read twice at most.
  *
  * Integer-exact contract (what makes the op externally re-derivable):
  * instead of summing floating log-ratios — whose accumulation order
  * differs across engines — the score keeps the integer numerator and
  * denominator separately: `sum_target` = Σ per-gram target-bucket
  * counts, `sum_raw` = Σ per-gram raw-bucket counts, and the selection
  * `sum_target * total_raw > sum_raw * total_target` is the
  * cross-multiplied form of "average target likelihood ratio of this
  * doc's grams exceeds 1" — every quantity a BIGINT, bit-identical in any
  * engine. (At extreme corpus sizes move the comparison to DECIMAL:
  * `sum_target ≤ n_grams_doc · total_target`, so the product is bounded
  * by n_grams_doc · total_target · total_raw.)
  *
  * The bucket hash is md5-based so plain SQL reproduces it verbatim —
  * see [[md5Bucket]].
  */
object Weighting {

  /** Hashed feature bucket in [0, `buckets`): the top 15 hex chars (60
    * bits, always non-negative) of md5(gram), mod the bucket count.
    * DuckDB reproduces it as
    * `CAST(CONCAT('0x', substr(md5(g), 1, 15)) AS BIGINT) % buckets`. */
  def md5Bucket(gram: Column, buckets: Int): Column =
    conv(substring(md5(gram.cast("binary")), 1, 15), 16, 10)
      .cast("long") % buckets

  /** Word-bigram list of `textCol` (whitespace tokenization — the same
    * `split('\\s+')` every text op here uses). Empty for docs with fewer
    * than two tokens (slice length 0 on both sides).
    *
    * Deliberately `zip_with(slice, slice)` and NOT
    * `transform(sequence(1, n-1), i -> element_at(toks, i) ...)`: the
    * lambda body embeds the full `split` subtree, so the indexed form
    * re-tokenizes the document once PER GRAM — O(tokens²) per doc (a
    * measured 20× slowdown at sf0.1). The two slices evaluate the split
    * a constant number of times per row. */
  def wordBigrams(text: Column): Column = {
    val toks = graft.functions.TextFunctions.tokens(text)
    val n = size(toks)
    zip_with(slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
      (a, b) => concat(a, lit(" "), b))
  }

  /** One row per (doc, gram) with its feature bucket; a doc with no
    * grams keeps exactly one row with a null gram/bucket (a doc row is
    * never silently dropped). */
  private def docGramBuckets(docs: DataFrame, textCol: String,
      idCol: String, buckets: Int): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        wordBigrams(col(textCol)).as("grams"))
      .select(col("doc_id"), explode_outer(col("grams")).as("gram"))
      .withColumn("bucket",
        when(col("gram").isNotNull, md5Bucket(col("gram"), buckets)))

  /** Per-stratum EXACT-quantile thresholding: keep rows whose score sits
    * at or above their stratum's `qBp`-basis-point quantile (qBp = 5000 ⇒
    * per-stratum median). The quality-calibration stage of a filtering
    * pipeline: a fixed global score cutoff over-prunes low-resource
    * strata, so the cutoff adapts per stratum instead.
    *
    * Exact and integer-decided: `cnt_below` is rank−1 over the stratum
    * (ties share a rank in every SQL engine, so tied scores decide
    * identically), and selection is `cnt_below · 10000 ≥ qBp · n` — no
    * floating quantile interpolation, re-derivable externally.
    *
    * Scale shape: one shuffle (the per-stratum window); the per-stratum
    * sort is the honest cost of exactness — swap in percentile_approx
    * when a sketch suffices. A skew-heavy stratum pre-splits by hash
    * range exactly like [[Sampling.shuffleOrder]]'s buckets. */
  def quantileThreshold(df: DataFrame, scoreCol: String, stratumCol: String,
      qBp: Int, idCol: String = "doc_id"): DataFrame =
    quantileThresholdKeeping(df.select(col(idCol), col(stratumCol),
      col(scoreCol)), scoreCol, stratumCol, qBp)

  /** [[quantileThreshold]] preserving EVERY input column — the
    * pipeline-composition form. Carrying payload columns (text) through
    * the stratum window means a downstream stage keyed on the SAME
    * stratum (e.g. [[Sampling.mixToBudget]]'s per-domain window) sees
    * its required hash distribution already satisfied and plans a sort
    * with NO new exchange — and the id-keyed join that would otherwise
    * re-attach the payload to the selected ids disappears entirely.
    * One shuffle for two window stages instead of a window + join +
    * window chain. */
  def quantileThresholdKeeping(df: DataFrame, scoreCol: String,
      stratumCol: String, qBp: Int): DataFrame = {
    val byScore = Window.partitionBy(col(stratumCol)).orderBy(col(scoreCol))
    val whole = Window.partitionBy(col(stratumCol))
    df.withColumn("cnt_below", rank().over(byScore).cast("long") - 1L)
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("selected",
        col("cnt_below") * 10000L >= lit(qBp.toLong) * col("n"))
  }

  /** [[quantileThresholdKeeping]]'s SELECTED SET at AGGREGATE cost —
    * the rank folded into the stratum aggregate. The insight: the exact
    * gate's `cnt_below` (rank−1) counts rows with strictly SMALLER
    * scores, so selection is a property of the score VALUE, not the
    * row — every row of a value decides identically. The per-stratum
    * boundary value therefore derives from a (stratum, score) COUNT
    * table: map-side-combined aggregate (the shuffle carries distinct
    * (stratum, score) pairs — score-domain-sized under the engine's
    * rounded/e4 score conventions, never corpus-sized), a cumulative
    * window over those narrow rows, and a broadcast of the per-stratum
    * minimum selected value back over the corpus. The corpus itself is
    * NEVER sorted and never shuffles — the exact form's per-stratum
    * sort-window (its documented honest cost) disappears for pipelines
    * that don't consume the per-row rank.
    *
    * Row-identical selection to [[quantileThresholdKeeping]] by
    * construction (same integer cross-multiplied decision, applied to
    * values); strata where no value qualifies (e.g. a single-valued
    * stratum below the target) keep their rows with selected = false,
    * exactly like the rank form. */
  def quantileSelectByValue(df: DataFrame, scoreCol: String,
      stratumCol: String, qBp: Int): DataFrame = {
    require(qBp > 0 && qBp < 10000, s"qBp must be in (0,10000): $qBp")
    val counts = df.groupBy(col(stratumCol), col(scoreCol))
      .agg(count(lit(1)).as("__c"))
    val below = Window.partitionBy(col(stratumCol)).orderBy(col(scoreCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val whole = Window.partitionBy(col(stratumCol))
    val cuts = counts
      .withColumn("__below", coalesce(sum(col("__c")).over(below), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(whole))
      .where(col("__below") * 10000L >= lit(qBp.toLong) * col("__n"))
      .groupBy(col(stratumCol))
      .agg(min(col(scoreCol)).as("__cutoff"))
    df.join(broadcast(cuts), Seq(stratumCol), "left")
      .withColumn("selected",
        col("__cutoff").isNotNull && col(scoreCol) >= col("__cutoff"))
      .drop("__cutoff")
  }

  /** SKETCH-quantile threshold — the 100 TB scale path for the quality
    * gate [[quantileThreshold]] serves exactly. The exact form pays a
    * per-stratum SORT (the rank window); this form runs Spark's
    * mergeable Greenwald-Khanna sketch (`percentile_approx`) as ONE
    * hash aggregate — partials merge map-side, nothing corpus-sized
    * shuffles, no sort anywhere — then broadcasts the per-stratum
    * cutoffs back over the corpus.
    *
    * The price is a BOUNDED rank error: GK guarantees the returned
    * cutoff's true rank is within n/accuracy of the target. Because the
    * sketch's merge order is partition-order-dependent, the selected
    * SET is not bit-stable across runs — so the operator surfaces the
    * CONTRACT instead: [[quantileSketchContract]] recomputes each
    * cutoff's true rank with one exact aggregate (a count, not a sort)
    * and emits the per-stratum bound check the driver oracle pins. The
    * established discipline for approximation operators here (HLL,
    * LSH, IVF): deterministic ground truth + a guarantee boolean. */
  def quantileSketchThreshold(df: DataFrame, scoreCol: String,
      stratumCol: String, qBp: Int, accuracy: Int = 10000): DataFrame = {
    require(qBp > 0 && qBp < 10000, s"qBp must be in (0,10000): $qBp")
    require(accuracy > 0, s"accuracy must be positive: $accuracy")
    val cuts = df.groupBy(col(stratumCol))
      .agg(percentile_approx(col(scoreCol), lit(qBp / 10000.0),
        lit(accuracy)).as("cutoff"))
    df.join(broadcast(cuts), Seq(stratumCol))
      .withColumn("selected", col(scoreCol) >= col("cutoff"))
  }

  /** The guarantee check for [[quantileSketchThreshold]]: per stratum,
    * the returned cutoff VALUE must occupy a sorted position within
    * n/accuracy (+1 integer slack) of the target rank qBp·n/10000 —
    * under ties the value occupies the position RANGE
    * (count_below, count_below + count_eq], so the check is that this
    * range overlaps the tolerance band (the honest GK statement; a
    * strict |count_below − target| test would false-alarm on coarse
    * integer scores where one value carries many rows). Both counts
    * are exact single-pass aggregates — no sort. Emits
    * (stratum, n, within_bound); the boolean is the contract an oracle
    * can require to be uniformly true even though the cutoff itself is
    * merge-order-dependent. */
  def quantileSketchContract(df: DataFrame, scoreCol: String,
      stratumCol: String, qBp: Int, accuracy: Int = 10000): DataFrame = {
    val gated = quantileSketchThreshold(df, scoreCol, stratumCol, qBp,
      accuracy)
    val eps = col("n") / lit(accuracy.toLong) + lit(1L)
    val target = (lit(qBp.toLong) * col("n")) / lit(10000L)
    gated.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col(scoreCol) < col("cutoff"), 1L).otherwise(0L))
          .as("below"),
        sum(when(col(scoreCol) === col("cutoff"), 1L).otherwise(0L))
          .as("ties"))
      .select(col(stratumCol), col("n"),
        (col("below") <= target + eps &&
          col("below") + col("ties") >= target - eps).as("within_bound"))
  }

  /** Per-stratum quantile BUCKET labels (the CCNet head/middle/tail
    * artifact): each row gets the label of the band its score's exact
    * per-stratum rank falls in. `cutsBp` are ascending basis-point
    * boundaries — `Seq(3333, 6666)` with labels `("tail","middle",
    * "head")` reproduces CCNet's tertiles (higher score → later label).
    * Same integer cross-multiplied rank decision as
    * [[quantileThreshold]] — no float quantile interpolation, tied
    * scores land in the same bucket in every engine. One shuffle (the
    * per-stratum window). */
  def quantileBuckets(df: DataFrame, scoreCol: String, stratumCol: String,
      cutsBp: Seq[Int], labels: Seq[String],
      idCol: String = "doc_id"): DataFrame = {
    require(labels.size == cutsBp.size + 1,
      s"need ${cutsBp.size + 1} labels for ${cutsBp.size} cuts")
    require(cutsBp == cutsBp.sorted && cutsBp.forall(c => c > 0 && c < 10000),
      s"cuts must be ascending in (0,10000): $cutsBp")
    val byScore = Window.partitionBy(col(stratumCol)).orderBy(col(scoreCol))
    val whole = Window.partitionBy(col(stratumCol))
    val ranked = df.select(col(idCol), col(stratumCol), col(scoreCol))
      .withColumn("cnt_below", rank().over(byScore).cast("long") - 1L)
      .withColumn("n", count(lit(1)).over(whole))
    val label = cutsBp.zip(labels.init).foldRight(lit(labels.last): Column) {
      case ((cut, l), acc) =>
        when(col("cnt_below") * 10000L < lit(cut.toLong) * col("n"), lit(l))
          .otherwise(acc)
    }
    ranked.withColumn("bucket", label)
  }

  /** Score every doc of `raw` against the `target` distribution. Returns
    * one row per raw doc: (doc_id, n_grams, sum_target, sum_raw,
    * selected). Docs with no grams are never selected (their average
    * ratio is vacuously 0 > 0 = false). */
  def importanceWeights(raw: DataFrame, target: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      buckets: Int = 1024): DataFrame = {
    // ONE gram explode + md5 pass over the 100 TB side: the per-(doc,
    // bucket) multiplicity table is everything downstream needs — the
    // raw distribution is a cheap rollup of it, and the per-doc sums
    // weight each bucket's broadcast count by the multiplicity `c`
    // (Σ_grams cnt[bucket(g)] ≡ Σ_buckets c·cnt — exact integers).
    // Persisted via PlanCache: ≤ `buckets` rows per doc, far below the
    // raw gram stream, and it feeds both consumers. The earlier form
    // exploded + hashed the corpus TWICE (distribution pass + per-doc
    // pass); this is the md5 kernel's cost halved.
    val rawB = PlanCache.getOrPersist(raw,
      s"dsir-raw-docbuckets|$buckets|$textCol|$idCol",
      docGramBuckets(raw, textCol, idCol, buckets)
        .groupBy("doc_id", "bucket").agg(count(lit(1)).as("c")))
    val tgtG = docGramBuckets(target, textCol, idCol, buckets)
    // the two distributions: ≤ `buckets` rows each — broadcast dims.
    // Persisted (PlanCache): each feeds BOTH the per-gram join and the
    // totals row.
    val rawCnt = PlanCache.getOrPersist(raw,
      s"dsir-raw-dist|$buckets|$textCol|$idCol",
      rawB.where(col("bucket").isNotNull)
        .groupBy("bucket").agg(sum(col("c")).as("cnt_raw")))
    val tgtCnt = PlanCache.getOrPersist(target,
      s"dsir-target-dist|$buckets|$textCol|$idCol",
      tgtG.where(col("gram").isNotNull)
        .groupBy("bucket").agg(count(lit(1)).as("cnt_target")))
    // sum() over an empty distribution is NULL — coalesce to 0 so a
    // gram-less target (or raw) corpus yields selected=false everywhere
    // instead of NULL-poisoning every selection decision
    val totals = rawCnt
      .agg(coalesce(sum(col("cnt_raw")), lit(0L)).as("total_raw"))
      .crossJoin(tgtCnt
        .agg(coalesce(sum(col("cnt_target")), lit(0L)).as("total_target")))
    rawB
      .join(broadcast(tgtCnt), Seq("bucket"), "left")
      .join(broadcast(rawCnt), Seq("bucket"), "left")
      .groupBy("doc_id")
      .agg(
        sum(when(col("bucket").isNotNull, col("c")).otherwise(0L))
          .as("n_grams"),
        sum(coalesce(col("cnt_target"), lit(0L)) * col("c")).as("sum_target"),
        sum(coalesce(col("cnt_raw"), lit(0L)) * col("c")).as("sum_raw"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("n_grams"), col("sum_target"), col("sum_raw"),
        (col("sum_target") * col("total_raw") >
          col("sum_raw") * col("total_target")).as("selected"))
  }
}
