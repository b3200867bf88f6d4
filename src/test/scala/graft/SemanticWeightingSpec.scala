package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Sampling, Semantic, Weighting}

/** Semantic dedup (SemDeDup shape), soft dedup weighting, DSIR-style
  * importance selection, and token-budget domain mixing. */
class SemanticWeightingSpec extends SparkSpec {
  import spark.implicits._

  test("semanticDedup drops exactly the higher-id member of a twin pair") {
    // three well-separated base vectors + an exact copy of each
    val base = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 1.0f)))
    val vecs = (base ++ base.map { case (id, v) => (id + 100L, v) })
      .toDF("id", "vec")
    val out = Semantic.semanticDedup(vecs, k = 2, iters = 2,
        cosineThreshold = 0.99)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out.size === 6)
    assert(Seq(0L, 1L, 2L).forall(out(_)), "originals must be kept")
    assert(Seq(100L, 101L, 102L).forall(!out(_)), "copies must drop")
  }

  test("semanticDedup LSH path: twins still drop, distinct vectors survive") {
    val base = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 1.0f)))
    val vecs = (base ++ base.map { case (id, v) => (id + 100L, v) })
      .toDF("id", "vec")
    val out = graft.pipeline.Semantic.semanticDedup(vecs, k = 2, iters = 2,
        cosineThreshold = 0.99, intraCellPlanes = 6, intraCellTables = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(Seq(0L, 1L, 2L).forall(out(_)))
    assert(Seq(100L, 101L, 102L).forall(!out(_)))
  }

  test("semanticDedupHier: twins co-locate through both codebook levels") {
    // 24 signed pseudo-random vectors, max pairwise cosine 0.77 (checked
    // offline) — no accidental near-pair can cross the 0.99 threshold,
    // and coarse cells exceed kSub so the sub-training path runs
    val base = (0L until 24L).map { i =>
      (i, Seq.tabulate(8)(d =>
        (((i * 37 + d * d * 11 + i * d * 5) % 29) - 14).toFloat))
    }
    val vecs = (base ++ base.map { case (id, v) => (id + 100L, v) })
      .toDF("id", "vec")
    val out = Semantic.semanticDedupHier(vecs, kCoarse = 2, kSub = 3,
        iters = 2, cosineThreshold = 0.99)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out.size === 48)
    // every twin pair: lower id kept, +100 copy dropped — identical
    // vectors share the coarse argmin AND the sub argmin, so the pair
    // meets in one leaf whatever the training state
    (0L until 24L).foreach { i =>
      assert(out(i), s"original $i must be kept")
      assert(!out(i + 100L), s"copy ${i + 100L} must drop")
    }
    // sampled training (the 100 TB regime: codebooks from a hash-sample,
    // assignment over everything) — the planted contract is
    // codebook-independent, so the outcome is identical
    val outS = Semantic.semanticDedupHier(vecs, kCoarse = 2, kSub = 3,
        iters = 2, cosineThreshold = 0.99, trainSampleCap = 8)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    (0L until 24L).foreach { i =>
      assert(outS(i) && !outS(i + 100L), s"sampled-training twin $i")
    }
    // thin-cell skip branch: kCoarse=12 over 25 vectors leaves coarse
    // cells at ≤ kSub members (average ~2) that skip sub-training and
    // pair-search as their own leaf — nothing may drop (no dups) and
    // the far-off singleton survives
    val lone = (Seq((999L, Seq.fill(8)(-50f))) ++ base)
      .toDF("id", "vec")
    val kept2 = Semantic.semanticDedupHier(lone, kCoarse = 12, kSub = 3,
        iters = 2)
      .where(col("kept")).select("doc_id").as[Long].collect().toSet
    assert(kept2.contains(999L), "singleton leaf must survive")
    assert(kept2.size === 25, "no dups in the corpus — everything kept")
  }

  test("semanticDedup keeps a representative of every near-dup relation") {
    // a chain of identical vectors: greedy lowest-id-wins keeps only the
    // minimum (all three share a cell and pairwise cosine 1.0)
    val vecs = Seq((7L, Seq(1.0f, 2.0f)), (8L, Seq(1.0f, 2.0f)),
      (9L, Seq(1.0f, 2.0f)), (50L, Seq(-3.0f, 1.0f)))
      .toDF("id", "vec")
    val kept = Semantic.semanticDedup(vecs, k = 2, iters = 1)
      .where(col("kept")).select("doc_id").as[Long].collect().toSet
    assert(kept === Set(7L, 50L))
  }

  test("softDedupWeights: floor(10000/csize), singletons at 10000") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Semantic.softDedupWeights(docs, pairs)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(out(1L) === ((1L, 3L, 3333L)))
    assert(out(2L) === ((1L, 3L, 3333L)))
    assert(out(3L) === ((1L, 3L, 3333L)))
    assert(out(4L) === ((4L, 1L, 10000L))) // no dup edge → singleton
    assert(out(5L) === ((5L, 2L, 5000L)))
    assert(out(6L) === ((5L, 2L, 5000L)))
  }

  test("md5Bucket matches the DuckDB hex-cast derivation") {
    // DuckDB: CAST(CONCAT('0x', substr(md5('hello'),1,15)) AS BIGINT)
    //       = 419982666956583591
    val v = spark.range(1)
      .select(conv(substring(md5(lit("hello").cast("binary")), 1, 15), 16, 10)
        .cast("long").as("v"))
      .head().getLong(0)
    assert(v === 419982666956583591L)
    val b = spark.range(1)
      .select(Weighting.md5Bucket(lit("hello"), 1024).as("b"))
      .head().getLong(0)
    assert(b === 419982666956583591L % 1024)
  }

  test("importanceWeights: target-like docs selected, others not") {
    // target distribution = gram "a b"; doc 1 is pure target grams, doc 2
    // shares none, doc 3 has a single token (no grams — never selected)
    val raw = Seq(
      (1L, "a b a b a b"),
      (2L, "x y x y"),
      (3L, "solo")).toDF("doc_id", "text")
    val target = Seq((10L, "a b a b")).toDF("doc_id", "text")
    val out = Weighting.importanceWeights(raw, target, buckets = 64)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    // doc 1: grams [a b, b a, a b, b a, a b]; target has [a b, b a, a b]
    //   → every gram's bucket is populated in the target
    assert(out(1L)._1 === 5L && out(1L)._4, s"doc1: ${out(1L)}")
    // doc 2's grams never occur in the target corpus (sum_target = 0
    //   barring md5 bucket collisions at 64 buckets — none for these);
    //   sum_raw: grams [x y, y x, x y] meet raw counts 2 + 1 + 2 = 5
    assert(out(2L) === ((3L, 0L, 5L, false)), s"doc2: ${out(2L)}")
    assert(out(3L) === ((0L, 0L, 0L, false)), s"doc3: ${out(3L)}")
  }

  test("importanceWeights selection is the cross-multiplied ratio test") {
    val raw = Seq((1L, "a b c d"), (2L, "c d e f")).toDF("doc_id", "text")
    val target = Seq((10L, "a b")).toDF("doc_id", "text")
    val rows = Weighting.importanceWeights(raw, target, buckets = 256)
      .collect()
    // total_raw = 6 grams, total_target = 1 gram
    rows.foreach { r =>
      val (st, sr, sel) = (r.getLong(2), r.getLong(3), r.getBoolean(4))
      assert(sel === (st * 6L > sr * 1L),
        s"doc ${r.getLong(0)}: st=$st sr=$sr sel=$sel")
    }
  }

  test("substringDupStats flags shifted duplicates the span grid misses") {
    // doc 2 repeats doc 1's 6-token phrase OFFSET by two tokens — a
    // 20-token fixed span grid would never align them; a 4-token sliding
    // window must. doc 3 shares nothing; doc 4 is too short for windows.
    val docs = Seq(
      (1L, "the quick brown fox jumps high over all walls today"),
      (2L, "xx yy the quick brown fox jumps high zz ww vv uu"),
      (3L, "completely different words in this document right here now ok"),
      (4L, "tiny doc")).toDF("doc_id", "text")
    val out = graft.pipeline.Dedup.substringDupStats(docs, windowTokens = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    // doc 1: 10 tokens → 7 windows; shared 6-token run ⇒ 3 dup windows
    assert(out(1L) === ((10L, 7L, 3L, true)), s"doc1: ${out(1L)}")
    // doc 2: 12 tokens → 9 windows; same 3 shared windows at offset 2
    assert(out(2L) === ((12L, 9L, 3L, true)), s"doc2: ${out(2L)}")
    assert(out(3L) === ((10L, 7L, 0L, false)), s"doc3: ${out(3L)}")
    assert(out(4L) === ((2L, 0L, 0L, false)), s"doc4: ${out(4L)}")
  }

  test("quantileThreshold: exact per-stratum median, ties decide together") {
    val df = Seq(
      (1L, "a", 0.1), (2L, "a", 0.2), (3L, "a", 0.3), (4L, "a", 0.4),
      (5L, "b", 0.5), (6L, "b", 0.5), (7L, "b", 0.9))
      .toDF("doc_id", "lang", "score")
    val out = graft.pipeline.Weighting
      .quantileThreshold(df, "score", "lang", qBp = 5000)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4),
        r.getBoolean(5)))).toMap
    // stratum a (n=4): cnt_below 0,1,2,3 → selected iff cnt_below*1e4 >= 5000*4
    assert(!out(1L)._3 && !out(2L)._3 && out(3L)._3 && out(4L)._3)
    // stratum b: the 0.5 tie shares rank 1 → cnt_below 0 for both → both out
    assert(out(5L) === ((0L, 3L, false)))
    assert(out(6L) === ((0L, 3L, false)))
    assert(out(7L) === ((2L, 3L, true)))
  }

  test("quantileSketchThreshold: bound holds, selection tracks exact, no sort") {
    import graft.pipeline.Weighting
    // 1000 distinct scores in one stratum + a coarse tied stratum
    val df = ((1 to 1000).map(i => (i.toLong, "a", i.toDouble)) ++
      (1001 to 1100).map(i => (i.toLong, "b", (i % 3).toDouble)))
      .toDF("doc_id", "lang", "score")
    val contract = Weighting.quantileSketchContract(
        df, "score", "lang", qBp = 5000, accuracy = 100)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(contract("a") == ((1000L, true)) && contract("b") == ((100L, true)))
    // selection is within the rank tolerance of the exact gate: stratum
    // a's exact median keeps 501; the sketch keeps 501 ± n/accuracy
    val kept = Weighting.quantileSketchThreshold(
        df.where(col("lang") === "a"), "score", "lang", qBp = 5000,
        accuracy = 100)
      .where(col("selected")).count()
    assert(math.abs(kept - 501L) <= 1000L / 100L + 1L, s"kept $kept")
    // the scale claim: the sketch path plans NO sort (one mergeable
    // aggregate + broadcast join), unlike the exact window gate
    val sketchPlan = Weighting.quantileSketchThreshold(
      df, "score", "lang", qBp = 5000).queryExecution.executedPlan.toString
    assert(!sketchPlan.contains("Sort"), s"sketch path must not sort:\n$sketchPlan")
    val exactPlan = Weighting.quantileThreshold(df, "score", "lang", 5000)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Sort"))
  }

  test("Pca.topComponent recovers a planted dominant direction") {
    // 200 vectors in R^4: component 2 has variance ~400, others ~1.
    // Deterministic fixture (no RNG): component j = ±small lattice noise.
    val rows = (0 until 200).map { i =>
      Seq((i % 7 - 3).toFloat, (i % 5 - 2).toFloat,
        ((i % 2) * 2 - 1) * (20.0f + (i % 3)), (i % 3 - 1).toFloat)
    }.map(Tuple1(_))
    val df = rows.toDF("vec")
    val (v, ray) = graft.pipeline.Pca.topComponent(df, "vec", iters = 4)
    assert(math.abs(v(2)) > 0.99, s"component: ${v.toSeq}")
    assert(math.abs(v(0)) < 0.2 && math.abs(v(3)) < 0.2)
    // power-iteration invariant
    ray.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a * (1 - 1e-9) - 1e-9, s"rayleigh dropped: $ray")
    }
    // the unit-norm contract
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
  }

  test("Pca.topComponents: deflation recovers two planted axes in order") {
    // variance: dim 2 ≈ 400, dim 0 ≈ 100, dims 1/3 ≈ 1-4. Signs for
    // dims 0 and 2 flip on INDEPENDENT schedules ((i/2)%2 vs i%2) —
    // sharing one sign factor would correlate the axes and make the true
    // top component a mixed direction, not the planted axis
    val rows = (0 until 200).map { i =>
      Seq((((i / 2) % 2) * 2 - 1) * (10.0f + (i % 5)),
        (i % 5 - 2).toFloat,
        ((i % 2) * 2 - 1) * (20.0f + (i % 3)),
        (i % 3 - 1).toFloat)
    }.map(Tuple1(_))
    val df = rows.toDF("vec")
    val comps = graft.pipeline.Pca.topComponents(df, c = 2, iters = 4)
    assert(math.abs(comps(0)._1(2)) > 0.99, s"c1: ${comps(0)._1.toSeq}")
    assert(math.abs(comps(1)._1(0)) > 0.99, s"c2: ${comps(1)._1.toSeq}")
    assert(comps(0)._2 >= comps(1)._2, "eigenvalue estimates out of order")
    // components are orthogonal (deflation removed the first direction)
    val ip = comps(0)._1.zip(comps(1)._1).map { case (a, b) => a * b }.sum
    assert(math.abs(ip) < 0.05, s"not orthogonal: $ip")
  }

  test("tokenDrift: zero drift on identical corpora, loud on novel tokens") {
    val ref = Seq((1L, "aa bb cc dd"), (2L, "aa bb cc dd")).toDF("doc_id", "text")
    val same = graft.pipeline.Monitor.tokenDrift(ref, ref, buckets = 64)
      .collect()
    // identical distribution: expected == observed in every bucket
    same.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"counts differ: $r")
      assert(r.getLong(4) === 0L, s"nonzero contrib: $r")
    }
    // a batch of entirely novel tokens: every batch bucket alarms with
    // the clamped-expected convention cnt² × 1e6
    val novel = Seq((3L, "zz yy xx ww")).toDF("doc_id", "text")
    val drift = graft.pipeline.Monitor.tokenDrift(ref, novel, buckets = 64)
      .collect()
    val alarms = drift.filter(r => r.getLong(2) > 0 && r.getLong(1) == 0)
    assert(alarms.nonEmpty)
    alarms.foreach { r =>
      val c = r.getLong(2)
      assert(r.getLong(3) === 0L) // expected 0 from an unseen bucket
      assert(r.getLong(4) === c * c * 1000000L, s"clamped contrib: $r")
    }
    // an EMPTY reference must alarm loudly, not NULL the monitor into
    // silence: every batch bucket contributes cnt² × 1e6
    val emptyRef = ref.where(col("doc_id") < 0)
    val broken = graft.pipeline.Monitor.tokenDrift(emptyRef, novel, buckets = 64)
      .collect()
    assert(broken.nonEmpty)
    broken.foreach { r =>
      assert(!r.isNullAt(3) && !r.isNullAt(4), s"NULL drift row: $r")
      val c = r.getLong(2)
      assert(r.getLong(4) === c * c * 1000000L, s"empty-ref contrib: $r")
    }
  }

  test("tokenDriftFromCounts rejects a bucket-count mismatch, even via parquet") {
    val ref = Seq((1L, "aa bb cc")).toDF("doc_id", "text")
    val dist = graft.pipeline.Monitor.referenceDistribution(ref, buckets = 128)
    // direct frame: mismatch caught
    intercept[IllegalArgumentException] {
      graft.pipeline.Monitor.tokenDriftFromCounts(dist, ref, buckets = 256)
    }
    // the stamp survives a parquet roundtrip (the persisted-store path)
    val dir = java.nio.file.Files.createTempDirectory("refdist").toString
    dist.write.parquet(s"$dir/d")
    val reloaded = spark.read.parquet(s"$dir/d")
    intercept[IllegalArgumentException] {
      graft.pipeline.Monitor.tokenDriftFromCounts(reloaded, ref, buckets = 256)
    }
    // matching count passes and equals the direct derivation
    val viaStore = graft.pipeline.Monitor
      .tokenDriftFromCounts(reloaded, ref, buckets = 128).collect().toSet
    val direct = graft.pipeline.Monitor
      .tokenDrift(ref, ref, buckets = 128).collect().toSet
    assert(viaStore === direct)
  }

  test("mixToBudget fills each domain budget in hash order, integer-exact") {
    val docs = Seq(
      (1L, "en", "one two three"), // 3 tokens
      (2L, "en", "four five"), // 2
      (3L, "en", "six seven eight nine"), // 4
      (4L, "de", "zehn elf")).toDF("doc_id", "lang", "text") // 2
    val out = Sampling.mixToBudget(docs, "doc_id", "lang", "text",
      budgetTokens = Map("en" -> 5L), defaultBudget = 0L, salt = 11L)
    val rows = out.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    assert(rows.size === 4)
    // hash order within en is deterministic; re-derive it here
    val h = (id: Long) => ((id + 11L) % 2147483647L) * 48271L % 2147483647L
    val enOrder = Seq(1L, 2L, 3L).sortBy(id => (h(id), id))
    val toks = Map(1L -> 3L, 2L -> 2L, 3L -> 4L)
    var cum = 0L
    enOrder.foreach { id =>
      assert(rows(id)._3 === cum, s"cum_before of $id")
      assert(rows(id)._4 === (cum < 5L), s"selected of $id")
      cum += toks(id)
    }
    // default budget 0 → nothing selected in de
    assert(rows(4L)._4 === false && rows(4L)._3 === 0L)
    // budget binds: at least one en doc selected, at least one not
    val enSel = Seq(1L, 2L, 3L).map(rows(_)._4)
    assert(enSel.contains(true) && enSel.contains(false))
  }

  test("semanticDecontaminate drops exactly the eval-similar train rows") {
    val train = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)), // leaked: exact eval twin
      (1L, Seq(0.0f, 1.0f, 0.0f)), // leaked: near-eval (cos ≈ 0.9998)
      (2L, Seq(0.0f, 0.0f, 1.0f)), // clean
      (3L, Seq(0.6f, 0.8f, 0.0f))) // clean (cos 0.6/0.8 vs evals)
      .toDF("id", "vec")
    val eval = Seq(
      (100L, Seq(1.0f, 0.0f, 0.0f)),
      (101L, Seq(0.02f, 1.0f, 0.0f)))
      .toDF("id", "vec")
    val kept = Semantic.semanticDecontaminate(
      train.withColumn("text", concat(lit("doc "), col("id"))), eval,
      cosineThreshold = 0.99)
    assert(kept.select("id").as[Long].collect().sorted.toSeq === Seq(2L, 3L))
    // survivors keep EVERY train column (the Dedup.decontaminate shape)
    assert(kept.columns.toSet === Set("id", "vec", "text"))
    // plan shape: one broadcast nested-loop LEFT ANTI — no shuffle of
    // the train side, no materialized contaminated-id set
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") &&
      plan.contains("LeftAnti"), s"unexpected plan:\n$plan")
  }

  test("semanticDecontaminate with an empty eval set keeps everything") {
    val train = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)))
      .toDF("id", "vec")
    val eval = train.where(col("id") < 0)
    assert(Semantic.semanticDecontaminate(train, eval, 0.99).count() === 2L)
  }

  test("semdedup pair-recall floor discriminates: a concentrated" +
      " plane budget falls below it") {
    // the BANDED near-dup corpus q_semdedup_recall measures on (the
    // natural corpus is isotropic — no organic near-dup mass — and
    // exact twins collide in every table with probability 1, so only
    // a controlled cosine band can measure a plane/table choice)
    val corpus =
      graft.sources.WireFixtures.nearDupBandCorpus(spark, sf())
    def pairs(planes: Int, tables: Int) =
      Semantic.withinCellDupPairs(corpus, k = 8, iters = 3,
        cosineThreshold = 0.95, intraCellPlanes = planes,
        intraCellTables = tables)
    val exact = pairs(0, 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    // SUBSET property: LSH blocking can only narrow cell co-membership
    // — what makes |lsh| / |exact| a true recall
    val regime = pairs(8, 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(regime.subsetOf(exact),
      "LSH pairs must be a subset of the exact within-cell pairs")
    val regimeRecall = regime.size.toDouble / exact.size
    // the deployment regime clears the pinned floor (0.93; measured
    // 0.9697-0.9724 across sf0.001/0.01/0.1, see SparkEntry)...
    assert(regimeRecall >= 0.93,
      s"regime recall $regimeRecall under the pinned floor")
    // ...and a 16-plane single-table configuration — same total plane
    // budget, concentrated instead of spread — lands FAR below it
    // (measured ≈ 0.44-0.46): the floor discriminates exactly the
    // plane/table interaction planted twins cannot see
    val starved = pairs(16, 1).count().toDouble / exact.size
    assert(starved < 0.93 && starved < regimeRecall,
      s"starved-config recall $starved does not discriminate the floor")
  }
}
