package graft

import org.apache.spark.sql.functions._

import graft.operators.Bootstrap
import graft.pipeline.{Dedup, Sampling}

/** Sampling / ordering / span-dedup / snapshot-diff operators. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hashSample is deterministic and near the nominal rate") {
    val df = spark.range(100000).toDF("id")
    val a = Sampling.hashSample(df, "id", rateBp = 1000, salt = 5L)
    val b = Sampling.hashSample(df, "id", rateBp = 1000, salt = 5L)
    val na = a.count()
    assert(na === b.count()) // same rows, not just same count
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    assert(math.abs(na - 10000L) < 500, s"rate off: $na/100000 at 10%")
    // a different salt samples a genuinely different subset
    val c = Sampling.hashSample(df, "id", rateBp = 1000, salt = 6L)
    assert(a.intersect(c).count() < na)
  }

  test("stratifiedSample applies per-stratum rates with default fallback") {
    val df = spark.range(30000)
      .select(col("id"), (col("id") % 3).cast("string").as("grp"))
    val s = Sampling.stratifiedSample(df, "id", "grp",
      ratesBp = Map("0" -> 5000, "1" -> 500), defaultBp = 0)
    val byGrp = s.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byGrp("0") - 5000L) < 400)
    assert(math.abs(byGrp("1") - 500L) < 150)
    assert(!byGrp.contains("2")) // defaultBp = 0 drops the stratum
  }

  test("sqrtTemperatureBudgets: exact sum, √-flattening, largest-remainder") {
    // masses 90000 / 10000 / 2500 tokens: weights ∝ 300/100/50 → a 36×
    // mass gap compresses to a 6× budget gap (τ = 1/2), and budgets sum
    // EXACTLY to the total despite flooring
    val docs = Seq.tabulate(900)(i => (i.toLong, "big", ("w " * 99).trim)) ++
      Seq.tabulate(100)(i => (900L + i, "mid", ("w " * 99).trim)) ++
      Seq.tabulate(25)(i => (1000L + i, "rare", ("w " * 99).trim))
    val df = docs.toDF("doc_id", "lang", "text")
    val b = Sampling.sqrtTemperatureBudgets(df, "lang", "text",
      totalBudget = 1000L)
    assert(b.values.sum === 1000L)
    // hand apportionment: weights floor(sqrt(mass*1e6)) = 300000000? no —
    // exact: w=floor(sqrt(9e10))=300000, floor(sqrt(1e10))=100000,
    // floor(sqrt(25e8))=50000; W=450000; bases 666/222/111 rem sums to
    // 999 → one leftover goes to the largest remainder
    assert(b("big") + b("mid") + b("rare") === 1000L)
    assert(b("big") === 667L && b("mid") === 222L && b("rare") === 111L)
    // proportional (τ=1) would have given big 878 of 1000 — the √
    // temperature lifts the rare domain ~4×
    assert(b("rare") > 1000L * 2500 / 102500)
  }

  test("shuffleOrder is the exact global rank over (hash, key)") {
    val df = spark.range(5000).toDF("id")
    val got = Sampling.shuffleOrder(df, "id", salt = 3L, numBuckets = 7)
    // reference: single-partition window over the same sort key
    val h = Sampling.minstd(col("id"), 3L)
    val ref = df.select(col("id"), h.as("h"))
      .withColumn("order_idx",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("h"), col("id"))).cast("long") - 1L)
      .select("id", "order_idx")
    assert(got.select("id", "order_idx").except(ref).isEmpty)
    assert(ref.except(got.select("id", "order_idx")).isEmpty)
    // order_idx is a permutation of 0..n-1
    assert(got.agg(min("order_idx"), max("order_idx"),
      countDistinct("order_idx")).as[(Long, Long, Long)].head() ===
      ((0L, 4999L, 5000L)))
  }

  test("spanDedup keeps only corpus-wide first occurrences of spans") {
    // doc 1: spans A B; doc 2: spans B C (B repeats); doc 3 = copy of doc 1
    val a = (1 to 20).map(i => s"a$i").mkString(" ")
    val b = (1 to 20).map(i => s"b$i").mkString(" ")
    val c = (1 to 7).map(i => s"c$i").mkString(" ") // short tail span
    val docs = Seq(
      (1L, s"$a $b"), (2L, s"$b $c"), (3L, s"$a $b")
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, spanTokens = 20)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0) === ((1L, 2L, 2L, s"$a $b")))   // first owner keeps all
    assert(out(1) === ((2L, 2L, 1L, c)))          // B dropped, C kept
    assert(out(2) === ((3L, 2L, 0L, "")))         // exact copy loses all
  }

  test("trainCentroids: WCSS non-increasing, codebook converges on planted clusters") {
    import graft.pipeline.Ann
    // two tight planted clusters around (0,0,..) and (10,10,..)
    val pts = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 0.0f else 10.0f
      (i.toLong, Seq.fill(8)(base + (i % 5) * 0.01f))
    }
    val df = pts.toDF("id", "vec")
    val (codebook, wcss) = Ann.trainCentroids(df, k = 2, iters = 4)
    assert(codebook.length === 2 && wcss.length === 4)
    wcss.sliding(2).foreach { case Seq(p, n) =>
      assert(n <= p * (1 + 1e-9) + 1e-9, s"WCSS increased: $p -> $n")
    }
    // after convergence the two centroids sit near the planted means
    val means = codebook.map(_._2.head).sorted
    assert(math.abs(means(0) - 0.02f) < 0.5 && math.abs(means(1) - 10.02f) < 0.5)
  }

  test("decontaminateBloom is bit-identical to the exact path") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select("doc_id", "text")
    val eval = docs.where(col("doc_id") < 20)
    val exact = Dedup.decontaminate(docs, eval).select("doc_id")
    val bloom = Dedup.decontaminateBloom(docs, eval).select("doc_id")
    assert(exact.except(bloom).isEmpty && bloom.except(exact).isEmpty)
    assert(exact.count() > 0)
  }

  test("decontaminateBloom clamps numBits to the session maxNumBits cap") {
    // The giant-holdout regime: optimal bits exceed
    // runtime.bloomFilter.maxNumBits. Spark's BloomFilterAggregate
    // silently Math.min-clamps numBits/estimatedNumItems against the
    // session caps in its lazy accessors (no analysis error), so the risk
    // is an invisibly degraded fpp, not a failure. Shrink the cap so a
    // fixture-sized gram set is already over it — same code path as ~7M
    // grams against the 64M-bit default — and require the over-cap run to
    // stay bit-identical to the exact path (false positives die in the
    // confirming join).
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select("doc_id", "text")
    val eval = docs.where(col("doc_id") < 20)
    val confKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    spark.conf.set(confKey, "64")
    try {
      val exact = Dedup.decontaminate(docs, eval).select("doc_id")
      val bloom = Dedup.decontaminateBloom(docs, eval).select("doc_id")
      assert(exact.except(bloom).isEmpty && bloom.except(exact).isEmpty)
      assert(exact.count() > 0)
    } finally spark.conf.unset(confKey)
  }

  test("slidingChunks: coverage, overlap, and clipping") {
    import graft.pipeline.Packing
    val text = (1 to 50).map(i => s"w$i").mkString(" ") // 50 tokens
    val out = Packing.slidingChunks(Seq((7L, text)).toDF("doc_id", "text"),
        window = 20, stride = 15)
      .orderBy("chunk_idx")
      .as[(Long, Int, Long, Long, String)].collect()
    // chunks start at 0, 15, 30 — ceil((50-20)/15)+1 = 3
    assert(out.map(_._3).toSeq === Seq(0L, 15L, 30L))
    assert(out.map(_._4).toSeq === Seq(20L, 20L, 20L))
    // adjacent chunks overlap by window - stride = 5 tokens
    assert(out(0)._5.split(" ").takeRight(5).toSeq ===
      out(1)._5.split(" ").take(5).toSeq)
    // the final chunk ends exactly at the document end
    assert(out(2)._5.split(" ").last === "w50")
    // short doc: one clipped chunk
    val short = Packing.slidingChunks(Seq((1L, "a b c")).toDF("doc_id", "text"),
      window = 20, stride = 15).as[(Long, Int, Long, Long, String)].collect()
    assert(short.length === 1 && short(0)._4 === 3L && short(0)._5 === "a b c")
  }

  test("heavyHitters equals the exact grouped count above threshold") {
    import graft.pipeline.Sketches
    // skewed stream: token t0 at ~30%, t1 at ~5%, long tail below 1%
    val vals = (0 until 20000).map { i =>
      if (i % 10 < 3) "t0" else if (i % 20 == 3) "t1" else s"tail${i % 3000}"
    }
    val df = vals.toDF("token").repartition(8)
    val got = Sketches.heavyHitters(df, "token", minShareBp = 100)
      .as[(String, Long)].collect().toMap
    val exact = df.groupBy("token").count()
      .where(col("count") * 10000L > 20000L * 100)
      .as[(String, Long)].collect().toMap
    assert(got === exact)
    assert(got.contains("t0") && got.contains("t1"))
  }

  test("cooccurrencePmi: closed-form doc-frequency PMI, vocab cap, zero case") {
    import graft.pipeline.Sketches
    // N=4; n_a=n_b=3, n_c=2, n_x=1. topV=3 excludes x entirely.
    // PMI(a,b) = log2(2·4/9) ≈ -0.169925 → -1700 in 1e-4 units
    // PMI(a,c) = PMI(b,c) = log2(4/6) ≈ -0.584963 → -5850
    val df = Seq((0L, "a b"), (1L, "a b"), (2L, "a c"), (3L, "b c x"))
      .toDF("doc_id", "text")
    val got = Sketches.cooccurrencePmi(df, topV = 3)
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("a", "b", 2L, 3L, 3L, -1700L),
      ("a", "c", 1L, 3L, 2L, -5850L),
      ("b", "c", 1L, 3L, 2L, -5850L)))
    // exact-integer boundary: n_ab·N == n_a·n_b → PMI exactly 0, and
    // the +1e-6 nudge must keep the floor at 0, not -1
    val zero = Seq((0L, "p q"), (1L, "p"), (2L, "q"), (3L, "z"))
      .toDF("doc_id", "text")
    val z = Sketches.cooccurrencePmi(zero, topV = 2)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(z === Seq(("p", "q", 1L, 2L, 2L, 0L)))
  }

  test("incremental minhash pairs + old-batch pairs = full-batch pairs") {
    val d = spark.read.parquet(sf() + "/documents.parquet")
      .select("doc_id", "text").where(col("doc_id") < 60)
    val fresh = d.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val full = Dedup.minhashLshPairs(d.unionByName(fresh),
      jaccardThreshold = 0.5).select("id_a", "id_b")
    val oldOnly = Dedup.minhashLshPairs(d, jaccardThreshold = 0.5)
      .select("id_a", "id_b")
    val inc = Dedup.incrementalMinhashPairs(fresh, d, jaccardThreshold = 0.5)
      .select("id_a", "id_b")
    val combined = oldOnly.unionByName(inc).distinct()
    assert(combined.except(full).isEmpty && full.except(combined).isEmpty)
    assert(inc.count() > 0)
    // incremental emits no old-old pair
    assert(inc.where(col("id_a") < 1000000L && col("id_b") < 1000000L).isEmpty)
  }

  test("persisted-signature protocol signs only the increments (O(batch))") {
    val root = java.nio.file.Files.createTempDirectory("sigstore").toString
    val d = spark.read.parquet(sf() + "/documents.parquet")
      .select("doc_id", "text").where(col("doc_id") < 60)
    val nOld = d.count()
    // batch-path reference output, materialized EAGERLY so its signature
    // work (d + full fresh set) lands before the accumulator snapshot
    val expected = Dedup.incrementalMinhashPairs(
      d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")), d,
      jaccardThreshold = 0.5).select("id_a", "id_b").localCheckpoint(true)
    val acc = Dedup.signedDocsAccumulator(spark)
    val before = acc.value
    // onboard: corpus signatures into the store (PlanCache hit — no re-sign)
    Dedup.minhashSignatures(d, "text", "doc_id", 3, 64)
      .write.parquet(s"$root/sigs")
    // two increments, each signed once, banded against the STORE
    var got: org.apache.spark.sql.DataFrame = null
    Seq(0L, 30L).foreach { lo =>
      val batch = d.where(col("doc_id") >= lo && col("doc_id") < lo + 30)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        .localCheckpoint(true)
      val sigsNew = Dedup.minhashSignatures(batch, "text", "doc_id", 3, 64)
      val pairs = Dedup.incrementalPairsFromSignatures(sigsNew,
        spark.read.parquet(s"$root/sigs"), jaccardThreshold = 0.5)
        .select("id_a", "id_b").localCheckpoint(true)
      sigsNew.write.mode("append").parquet(s"$root/sigs")
      got = if (got == null) pairs else got.unionByName(pairs)
    }
    // union over increments = the batch incremental edge set: increment 1
    // emits old×f1 + f1×f1, increment 2 (store now holds f1) emits
    // old×f2 + f1×f2 + f2×f2; old×old never re-emitted
    val gotD = got.distinct()
    assert(gotD.except(expected).isEmpty && expected.except(gotD).isEmpty)
    // ONLY the two 30-doc increments went through the signature kernel —
    // the stored corpus was never re-signed
    assert(acc.value - before == nOld)
  }

  test("quantizedTopK with full re-rank equals exact brute force") {
    import graft.pipeline.Ann
    val all = spark.read.parquet(sf() + "/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = all.where(col("id") < 5)
    val n = all.count().toInt
    val exact = Ann.bruteForceTopK(queries, all, k = 5)
    val quant = Ann.quantizedTopK(queries, all, k = 5, rerank = n)
    assert(quant.except(exact).isEmpty && exact.except(quant).isEmpty)
    // and with a tight rerank budget the twin contract still holds
    val withTwins = all.unionByName(
      all.select((col("id") + 1000000L).as("id"), col("vec")))
    val top1 = Ann.quantizedTopK(queries, withTwins, k = 1, rerank = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    top1.foreach { case (q, nb) => assert(nb === q + 1000000L) }
  }

  test("snapshotDiff emits the minimal UPSERT/DELETE stream") {
    val before = Seq(
      (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, null, 40L)
    ).toDF("k", "s", "v")
    val after = Seq(
      (1L, "a", 10L),       // unchanged — absent from the diff
      (2L, "b2", 20L),      // value change -> UPSERT
      (4L, "d", 40L),       // null -> value change -> UPSERT
      (5L, "e", 50L),       // insert -> UPSERT
      (6L, null, 60L)       // insert carrying a legit NULL -> UPSERT(null)
    ).toDF("k", "s", "v")
    val got = Bootstrap.snapshotDiff(before, after, Seq("k"))
      .orderBy("k").as[(Long, String, String, Long)].collect()
    assert(got === Array(
      (2L, "UPSERT", "b2", 20L),
      (3L, "DELETE", "c", 30L),
      (4L, "UPSERT", "d", 40L),
      (5L, "UPSERT", "e", 50L),
      (6L, "UPSERT", null, 60L)))
  }

  test("snapshotDiff round-trips: applying the diff reproduces `after`") {
    val before = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val after = Seq((1L, "a2"), (3L, "c"), (9L, "z")).toDF("k", "v")
    val diff = Bootstrap.snapshotDiff(before, after, Seq("k"))
    val applied = before.join(diff.select(col("k")), Seq("k"), "left_anti")
      .unionByName(diff.where(col("opcode") === "UPSERT").drop("opcode"))
    assert(applied.except(after).isEmpty && after.except(applied).isEmpty)
  }
}
