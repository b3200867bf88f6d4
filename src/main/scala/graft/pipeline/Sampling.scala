package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and ordering for training-data pipelines.
  *
  * Everything here is driven by an integer-exact per-key hash stream
  * (MINSTD/Lehmer), NOT an RNG: the same row always samples the same way
  * under the same salt, so pipelines are resumable and re-runs are
  * reproducible across engines — a property `rand(seed)` cannot give
  * (it is plan- and partitioning-dependent), and the reason external
  * systems can re-derive every decision in plain SQL.
  *
  * Scale shape: [[hashSample]] / [[stratifiedSample]] are map-only
  * (codegen'd predicate on the scan — no shuffle, no state);
  * [[shuffleOrder]] is the one genuinely global operation, implemented as
  * an exact distributed rank (hash-uniform fixed-width buckets + one
  * count job + per-bucket window), never a single-partition sort.
  */
object Sampling {

  private val M = 2147483647L // 2^31 - 1 (Mersenne prime)

  /** MINSTD (Lehmer) hash of a non-negative integer key:
    * `((key + salt) mod M) * 48271 mod M`, M = 2^31 − 1. The product is
    * bounded by (M−1)·48271 ≈ 1.04e14, so the arithmetic is exact in any
    * 64-bit integer engine — external SQL reproduces it verbatim. */
  def minstd(key: Column, salt: Long = 0L): Column =
    pmod(pmod(key + lit(salt), lit(M)) * lit(48271L), lit(M))

  /** Uniform bucket in [0, 10000) — basis points of the key's hash. */
  def hashBp(key: Column, salt: Long = 0L): Column =
    pmod(minstd(key, salt), lit(10000L))

  /** Deterministic Bernoulli sample: keep rows whose hash stream lands
    * under `rateBp` basis points (rateBp = 500 ⇒ ~5%). Map-only. */
  def hashSample(df: DataFrame, keyCol: String, rateBp: Int,
      salt: Long = 0L): DataFrame =
    df.where(hashBp(col(keyCol), salt) < lit(rateBp.toLong))

  /** Stratified variant: a per-stratum basis-point rate (e.g. upsample a
    * rare language, downsample boilerplate-heavy sources). Unlisted
    * strata fall back to `defaultBp`. Still map-only: the rate lookup is
    * a codegen'd CASE chain, not a join. */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
      ratesBp: Map[String, Int], defaultBp: Int = 0,
      salt: Long = 0L): DataFrame = {
    val rate = ratesBp.toSeq.sortBy(_._1).foldLeft(lit(defaultBp.toLong)) {
      case (acc, (s, r)) =>
        when(col(stratumCol) === s, lit(r.toLong)).otherwise(acc)
    }
    df.where(hashBp(col(keyCol), salt) < rate)
  }

  /** Deterministic global training order: rank every row by
    * (minstd(key), key) — a reproducible corpus shuffle. `order_idx` is
    * the exact 0-based global rank.
    *
    * Scale shape: the hash is uniform on [0, M), so FIXED-WIDTH hash
    * ranges give balanced buckets without a quantile pass; one count job
    * computes bucket offsets (numBuckets rows to the driver), then a
    * per-bucket window sorts locally — the global sort never lands on one
    * task. Ties are impossible across buckets (bucket is a function of
    * the hash) and broken within a bucket by the key. */
  /** Token-budget domain mixing: fill each domain's token budget with a
    * deterministic, reproducible document subset (the "data mixture"
    * stage of a pretraining pipeline — e.g. 100 B tokens of web, 20 B of
    * code, 5 B of a rare language). Documents visit in MINSTD-hash order
    * (the same reproducible corpus shuffle [[shuffleOrder]] uses), each
    * carrying its whitespace token count; a doc is selected iff the token
    * mass BEFORE it in its domain's hash order is still strictly under
    * the domain's budget — so the first doc to cross the budget line is
    * the last one selected and the decision is integer-exact (external
    * SQL re-derives every row from the same window sum).
    *
    * Scale shape: one shuffle — the per-domain window (partitionBy
    * domain). Domains are few and the window needs no global sort across
    * domains; a skew-heavy domain can be pre-split by hash range and the
    * per-range cumulative offsets merged the way [[shuffleOrder]] merges
    * bucket offsets. Budgets arrive as a literal CASE chain, not a join.
    *
    * Returns (doc_id, domain, n_tokens, cum_before, selected) — one row
    * per input doc. */
  def mixToBudget(df: DataFrame, idCol: String, domainCol: String,
      textCol: String, budgetTokens: Map[String, Long],
      defaultBudget: Long = 0L, salt: Long = 0L): DataFrame = {
    val budget = budgetTokens.toSeq.sortBy(_._1).foldLeft(lit(defaultBudget)) {
      case (acc, (d, b)) => when(col("domain") === d, lit(b)).otherwise(acc)
    }
    val w = Window.partitionBy(col("domain"))
      .orderBy(col("__h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol).cast("long").as("doc_id"),
        col(domainCol).as("domain"),
        size(split(col(textCol), graft.functions.TextFunctions.WsPlus)).cast("long").as("n_tokens"))
      .withColumn("__h", minstd(col("doc_id"), salt))
      .withColumn("cum_before",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("selected", col("cum_before") < budget)
      .select("doc_id", "domain", "n_tokens", "cum_before", "selected")
  }

  /** Square-root temperature apportionment of a total token budget
    * across domains (τ = 1/2 — the standard multilingual rebalancing:
    * sampling ∝ mass^τ lifts rare domains without letting the biggest
    * one dominate). budget_d ∝ √(domain token mass), largest-remainder
    * rounded so budgets sum EXACTLY to `totalBudget`; feed the result
    * straight into [[mixToBudget]].
    *
    * Integer-exact across engines, per the module discipline: the weight
    * is floor(√(mass·10⁶)) — `mass·10⁶` is exactly representable below
    * 2⁵³ (domains up to ~9·10⁹ tokens) and sqrt is IEEE-correctly-
    * rounded in every engine, so floor lands identically; apportionment
    * runs in BigInt with (remainder desc, domain) tie-ordering. External
    * SQL re-derives every budget bit-for-bit. Driver-side on purpose:
    * the grouped mass table is one row per domain — the same altitude
    * as the CASE chain of budgets it produces. */
  def sqrtTemperatureBudgets(df: DataFrame, domainCol: String,
      textCol: String, totalBudget: Long): Map[String, Long] = {
    require(totalBudget >= 0, s"negative budget $totalBudget")
    val masses = df.groupBy(col(domainCol).as("domain"))
      .agg(sum(size(split(col(textCol), graft.functions.TextFunctions.WsPlus)).cast("long")).as("mass"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    require(masses.nonEmpty, "no domains to apportion across")
    val weights = masses.map { case (d, m) =>
      require(m * 1000000L >= 0 && m <= 9000000000L,
        s"domain $d mass $m exceeds the exact-sqrt envelope")
      (d, math.floor(math.sqrt(m.toDouble * 1e6)).toLong)
    }
    val totalW = weights.map(_._2).sum
    require(totalW > 0, "all domains empty")
    val base = weights.map { case (d, wi) =>
      val prod = BigInt(totalBudget) * BigInt(wi)
      (d, (prod / totalW).toLong, (prod % totalW).toLong)
    }
    val leftover = totalBudget - base.map(_._2).sum
    val bumped = base.sortBy { case (d, _, r) => (-r, d) }
      .take(leftover.toInt).map(_._1).toSet
    base.map { case (d, b, _) => d -> (b + (if (bumped(d)) 1L else 0L)) }
      .toMap
  }

  /** Keep at most `k` rows per group, deterministically: rank within
    * each group by `orderCols` (callers append a unique id as the final
    * tiebreaker — ties without one would make the kept set
    * partition-order-dependent) and keep ranks 1..k. The per-domain
    * document cap every web corpus applies (bound the influence of any
    * single host) is `capPerGroup(docs, "domain", quality.desc, doc_id)`.
    *
    * Scale shape: one hash shuffle on the group key + a per-partition
    * sort — no global sort, no driver state; group cardinality (hosts)
    * is the parallelism, so skewed mega-domains bound their own
    * partition but nothing else's. */
  def capPerGroup(df: DataFrame, groupCol: String, k: Int,
      orderCols: Column*): DataFrame = {
    require(k > 0, s"capPerGroup: k must be positive, got $k")
    require(orderCols.nonEmpty, "capPerGroup: need at least one order column")
    val w = Window.partitionBy(col(groupCol)).orderBy(orderCols: _*)
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .drop("__rk")
  }

  def shuffleOrder(df: DataFrame, keyCol: String, salt: Long = 0L,
      numBuckets: Int = 0): DataFrame = {
    val n =
      if (numBuckets > 0) numBuckets
      else math.max(2, df.sparkSession.sparkContext.defaultParallelism)
    val width = M / n + 1
    val withH = df
      .withColumn("__h", minstd(col(keyCol), salt))
      .withColumn("__bkt", expr(s"__h div $width"))
    val counts = withH.groupBy(col("__bkt")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _)).toMap
    val offCol = counts.map(_._1).foldLeft(lit(0L)) { (acc, b) =>
      when(col("__bkt") === b, lit(offsets(b))).otherwise(acc)
    }
    val w = Window.partitionBy(col("__bkt"))
      .orderBy(col("__h"), col(keyCol))
    withH
      .withColumn("order_idx",
        row_number().over(w).cast("long") + offCol - 1L)
      .drop("__h", "__bkt")
  }
}
