package graft

import graft.pipeline.{Ann, Dedup, VersionedStore}
import graft.functions.{VectorFunctions => VF}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-dup + ANN pipelines on corpora with *planted* duplicates and
  * near-duplicates (generative fixtures per FIXTURES.md §7). */
class DedupAnnSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private val vocab = Vector("spark", "data", "query", "join", "scan", "merge",
    "sort", "hash", "table", "row", "column", "filter", "group", "window",
    "stream", "batch", "key", "value", "fast", "slow")

  private def doc(n: Int): String =
    Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  /** 40 base docs; 10 exact copies; 10 near copies (one token changed). */
  private lazy val corpus: DataFrame = {
    val base = (0 until 40).map(i => (i.toLong, doc(60)))
    val exact = base.take(10).map { case (i, t) => (i + 100L, t) }
    val near = base.slice(10, 20).map { case (i, t) =>
      val toks = t.split(" "); toks(30) = "CHANGED"
      (i + 200L, toks.mkString(" "))
    }
    (base ++ exact ++ near).toDF("doc_id", "text")
  }

  test("exact dedup finds exactly the planted exact copies") {
    val groups = Dedup.exact(corpus)
    assert(groups.count() == 50) // 60 docs, 10 are copies
    assert(groups.where($"dup_count" === 2).count() == 10)
    val kept = Dedup.exactKeepOne(corpus)
    assert(kept.count() == 50)
    // representative = min id (the original, not the copy)
    assert(kept.where($"doc_id" >= 100 && $"doc_id" < 200).count() == 0)
  }

  test("minhash LSH recovers exact and near duplicates") {
    val pairs = Dedup.minhashLshPairs(corpus, jaccardThreshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0 until 10).foreach { i =>
      assert(pairs.contains((i.toLong, i + 100L)), s"missing exact pair $i")
    }
    (10 until 20).foreach { i =>
      assert(pairs.contains((i.toLong, i + 200L)), s"missing near pair $i")
    }
  }

  test("connected components: transitive closure with min-id labels") {
    // chain 1-2, 2-3 (diameter 2, forces >1 propagation round), triangle
    // 10-11-12, isolated pair 20-21 — identical answers from the driver
    // union-find fast path and the forced distributed loop
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("id_a", "id_b")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
    val fast = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val dist = Dedup.connectedComponents(pairs, maxDriverEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(fast == want && dist == want)
  }

  test("connected components: empty edge list and long chain both converge") {
    assert(Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")).isEmpty)
    // a 12-vertex path needs ~11 propagation rounds — exercises maxIter
    // headroom and lineage truncation on the distributed loop, and path
    // compression on the union-find
    val chain = (0L until 11L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val want = (0L to 11L).map(_ -> 0L).toMap
    assert(Dedup.connectedComponents(chain)
      .as[(Long, Long)].collect().toMap == want)
    assert(Dedup.connectedComponents(chain, maxDriverEdges = 0L)
      .as[(Long, Long)].collect().toMap == want)
  }

  test("keep-one-per-component over LSH pairs keeps one doc per cluster") {
    val pairs = Dedup.minhashLshPairs(corpus, jaccardThreshold = 0.5)
    val kept = Dedup.keepOnePerComponent(corpus, pairs)
    // every planted exact (≥100) and near (≥200) copy collapses onto its
    // base doc; bases and non-duplicated docs survive
    val ids = kept.select("doc_id").as[Long].collect().toSet
    assert(ids.forall(_ < 100L))
    assert((0L until 40L).toSet.subsetOf(ids))
  }

  test("exact jaccard verification separates exact from near dups") {
    val cand = Dedup.minhashLshPairs(corpus, jaccardThreshold = 0.3)
      .select("id_a", "id_b")
    val verified = Dedup.ngramJaccardVerify(corpus, cand)
    val exact = verified.where($"jaccard" === 1.0)
      .select("id_a").as[Long].collect().toSet
    assert((0L until 10L).toSet.subsetOf(exact))
    val near = verified.where($"id_b" >= 200 && $"id_b" < 300)
    assert(near.count() >= 10)
    assert(near.agg(min("jaccard")).head().getDouble(0) > 0.5)
    assert(near.agg(max("jaccard")).head().getDouble(0) < 1.0)
  }

  test("simhash blocks exact copies at hamming 0 and near copies low") {
    val pairs = Dedup.simhashPairs(corpus, maxHamming = 6)
    val exactPairs = pairs.where($"id_b" === $"id_a" + 100)
    assert(exactPairs.count() == 10)
    assert(exactPairs.agg(max("hamming")).head().getInt(0) == 0)
  }

  private def vec(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(16)(r.nextFloat() * 2 - 1)
  }

  private lazy val vectors: DataFrame = {
    val base = (0 until 30).map(i => (i.toLong, vec(i)))
    // near-dups: tiny perturbation of first 5
    val near = (0 until 5).map { i =>
      val v = vec(i).clone(); v(0) = v(0) + 0.01f
      (i + 100L, v)
    }
    (base ++ near).toDF("id", "vec")
  }

  test("brute-force ANN: perturbed twin is the top neighbor") {
    val top = Ann.bruteForceTopK(vectors.where($"id" < 5), vectors, k = 1)
    val got = top.select("query_id", "neighbor_id").as[(Long, Long)]
      .collect().toMap
    (0L until 5L).foreach(i => assert(got(i) == i + 100L))
  }

  test("embedding near-dup LSH finds the planted twins") {
    val pairs = Dedup.embeddingNearDups(vectors, vecCol = "vec", idCol = "id",
      numPlanes = 8, cosineThreshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0L until 5L).foreach(i => assert(pairs.contains((i, i + 100L))))
  }

  test("lsh ANN candidates are a subset ranked like brute force") {
    val brute = Ann.bruteForceTopK(vectors.where($"id" < 5), vectors, k = 3)
      .select("query_id", "neighbor_id", "cosine")
    val lsh = Ann.lshTopK(vectors.where($"id" < 5), vectors, k = 3,
      numPlanes = 6, tables = 6)
    // every lsh hit's cosine equals the brute-force cosine for that pair
    val joined = lsh.alias("l").join(brute.alias("b"),
      Seq("query_id", "neighbor_id"))
      .where(abs($"l.cosine" - $"b.cosine") > 1e-9)
    assert(joined.count() == 0)
    // twins (cosine ≈ 1) must be found even by LSH
    assert(lsh.where($"neighbor_id" === $"query_id" + 100).count() == 5)
  }

  test("ivf ANN with planted centroids recovers twins") {
    val centroids = (0 until 4).map(i => (i.toLong, vec(1000 + i)))
      .toDF("id", "vec")
    val got = Ann.ivfTopK(vectors.where($"id" < 5), vectors, centroids,
      k = 1, nProbe = 4)
    val m = got.select("query_id", "neighbor_id").as[(Long, Long)]
      .collect().toMap
    (0L until 5L).foreach(i => assert(m(i) == i + 100L))
  }

  test("ivf+quantized ANN composition still recovers twins at rank 1") {
    val centroids = (0 until 4).map(i => (i.toLong, vec(1000 + i)))
      .toDF("id", "vec")
    val got = Ann.ivfQuantizedTopK(vectors.where($"id" < 5), vectors,
      centroids, k = 1, nProbe = 4, rerank = 10)
    val rows = got.select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
    assert(rows.length == 5)
    rows.foreach { case (q, n, cos) =>
      assert(n == q + 100L, s"query $q retrieved $n")
      // the fixture's planted neighbors are PERTURBED near-twins
      // (cosine ≈ 0.99999), not exact copies — the exact-twin
      // cosine-1.0 contract is the driver query's, on real twins
      assert(cos > 0.999, s"near-twin cosine $cos")
    }
  }

  test("PQ/ADC ANN recovers planted near-twins at rank 1") {
    val got = Ann.pqTopK(vectors.where($"id" < 5), vectors, k = 1,
      m = 4, ksub = 8, iters = 2, rerank = 20)
    val rows = got.select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
    assert(rows.length == 5)
    rows.foreach { case (q, n, cos) =>
      assert(n == q + 100L, s"query $q retrieved $n")
      assert(cos > 0.999, s"near-twin cosine $cos")
    }
  }

  test("PQ: exact twin encodes to the query's own code word and ranks 1 at 1.0") {
    val base = vectors.where($"id" < 30)
    val withTwins = base.unionByName(
      base.where($"id" < 5).select(($"id" + 1000L).as("id"), $"vec"))
    val got = Ann.pqTopK(base.where($"id" < 5), withTwins, k = 1,
      m = 4, ksub = 8, iters = 2, rerank = 10)
    val rows = got.select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
    assert(rows.length == 5)
    rows.foreach { case (q, n, cos) =>
      assert(n == q + 1000L && cos == 1.0, s"query $q -> ($n, $cos)")
    }
  }

  test("persisted IVF index: store-served retrieval matches in-memory") {
    val dir = java.nio.file.Files.createTempDirectory("annstore").toString
    Ann.writeIndex(vectors, dir, k = 4, iters = 2)
    // the store renders both tables (one published generation) with the
    // schema the loaders expect
    val gen = VersionedStore.tableRoot(dir)
    assert(spark.read.parquet(s"$gen/codebook").count() == 4)
    val cells = spark.read.parquet(s"$gen/cells")
    assert(cells.columns.sorted.toSeq == Seq("cell_id", "id", "q", "scale"))
    assert(cells.count() == vectors.count())
    val q = vectors.where($"id" < 5)
    val (codebook, _) = Ann.trainCentroids(vectors, k = 4, iters = 2)
    val centroids = Ann.centroidsDf(spark, codebook)
    // store-served results are bit-identical to the in-memory paths
    // (same codebook — the store just made the memo durable)
    val memQ = Ann.ivfQuantizedTopK(q, vectors, centroids, k = 3,
      nProbe = 2, rerank = 10).collect().toSet
    val stoQ = Ann.ivfQuantizedTopKFromStore(q, vectors, dir, k = 3,
      nProbe = 2, rerank = 10).collect().toSet
    assert(stoQ == memQ)
    val memF = Ann.ivfTopK(q, vectors, centroids, k = 3, nProbe = 2)
      .collect().toSet
    val stoF = Ann.ivfTopKFromStore(q, vectors, dir, k = 3, nProbe = 2)
      .collect().toSet
    assert(stoF == memF)
    // twins still surface at rank 1 through the store
    val top = Ann.ivfQuantizedTopKFromStore(q, vectors, dir, k = 1,
      nProbe = 4, rerank = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    (0L until 5L).foreach(i => assert(top(i) == i + 100L))
  }

  test("pqTopK: a >rerank-way ADC tie still keeps the planted twin") {
    // duplicate-heavy degenerate corpus: every vector identical, so all
    // candidates collapse into one code word and tie at the minimal ADC
    // sum. The per-partition heap must evict SMALLEST ids on ties
    // (inverted id component) so the twin — largest id by the planted
    // convention — always survives into the exact re-rank.
    val v = Array.tabulate(8)(i => (i + 1).toFloat)
    val corpus = ((0 until 30).map(i => (i.toLong, v)) :+ (1000000L, v))
      .toDF("id", "vec").repartition(1) // one heap sees the whole tie
    val queries = Seq((555000L, v)).toDF("id", "vec")
    val ids = Ann.pqTopK(queries, corpus, k = 31, m = 4, ksub = 4,
      iters = 1, rerank = 4)
      .select("neighbor_id").as[Long].collect().toSet
    assert(ids.contains(1000000L),
      s"planted twin evicted from a ${31}-way tie (kept: $ids)")
  }

  test("ivfQuantizedTopK: a >rerank-way approx tie still keeps the twin") {
    // same degenerate shape as the pqTopK tie test, exercised on the
    // int8 rerank cut: identical vectors quantize to identical codes,
    // every approx score ties, and the cut must keep the LARGEST ids
    // so the planted twin reaches the exact re-rank
    val v = Array.tabulate(8)(i => (i + 1).toFloat)
    val corpus = ((0 until 30).map(i => (i.toLong, v)) :+ (1000000L, v))
      .toDF("id", "vec")
    val queries = Seq((555000L, v)).toDF("id", "vec")
    val (codebook, _) = Ann.trainCentroids(corpus, k = 2, iters = 1)
    val ids = Ann.ivfQuantizedTopK(queries, corpus,
      Ann.centroidsDf(spark, codebook), k = 31, nProbe = 2, rerank = 4)
      .select("neighbor_id").as[Long].collect().toSet
    assert(ids.contains(1000000L),
      s"planted twin cut from a 31-way approx tie (kept: $ids)")
  }

  test("incremental index append: frozen codebook, identical serving") {
    val dir = java.nio.file.Files.createTempDirectory("annincr").toString
    val base = vectors.where($"id" < 100L)
    val batch = vectors.where($"id" >= 100L) // the twins arrive LATER
    Ann.writeIndex(base, dir, k = 4, iters = 2)
    val gen = VersionedStore.tableRoot(dir)
    assert(spark.read.parquet(s"$gen/cells").count() == base.count())
    Ann.appendToIndex(batch, dir)
    val cells = spark.read.parquet(s"$gen/cells")
    assert(cells.count() == vectors.count())
    assert(cells.select("id").distinct().count() == vectors.count())
    // serving from the incrementally-built store is bit-identical to the
    // in-memory path under the SAME (base-trained, frozen) codebook —
    // the append changed nothing about how rows are assigned or scored
    val q = vectors.where($"id" < 5)
    val (codebook, _) = Ann.trainCentroids(base, k = 4, iters = 2)
    val mem = Ann.ivfQuantizedTopK(q, vectors,
      Ann.centroidsDf(spark, codebook), k = 3, nProbe = 2, rerank = 10)
      .collect().toSet
    val sto = Ann.ivfQuantizedTopKFromStore(q, vectors, dir, k = 3,
      nProbe = 2, rerank = 10).collect().toSet
    assert(sto == mem)
    // and the appended twins still surface at rank 1
    val top = Ann.ivfQuantizedTopKFromStore(q, vectors, dir, k = 1,
      nProbe = 4, rerank = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    (0L until 5L).foreach(i => assert(top(i) == i + 100L))
  }

  test("bulk index append parallelizes the write without changing serving") {
    val dir = java.nio.file.Files.createTempDirectory("annbulk").toString
    val base = vectors.where($"id" < 100L)
    val batch = vectors.where($"id" >= 100L)
    Ann.writeIndex(base, dir, k = 4, iters = 2)
    // a backfill batch must not serialize through one task: numFiles > 1
    // clusters the append by cell_id across that many files
    Ann.appendToIndex(batch, dir, numFiles = 3)
    val gen = VersionedStore.tableRoot(dir)
    val appended = new java.io.File(s"$gen/cells").listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(appended > 4 + 1,
      s"bulk append did not fan out (cells/ has $appended part files)")
    val cells = spark.read.parquet(s"$gen/cells")
    assert(cells.count() == vectors.count())
    // identical serving to the single-file append protocol
    val q = vectors.where($"id" < 5)
    val top = Ann.ivfQuantizedTopKFromStore(q, vectors, dir, k = 1,
      nProbe = 4, rerank = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    (0L until 5L).foreach(i => assert(top(i) == i + 100L))
  }

  test("rebalanceCells: oversized cells split in place, serving and invariants hold") {
    import graft.pipeline.{StoreFsck, Tombstones}
    val dir = java.nio.file.Files.createTempDirectory("annreb").toString
    // 2 cells over 35 vectors — both far over a maxCellSize of 10, the
    // frozen-codebook hot-region shape rebalancing exists for
    Ann.writeIndex(vectors, dir, k = 2, iters = 2)
    val q = vectors.where($"id" < 5)
    def top1(nProbe: Int = 4) = Ann.ivfQuantizedTopKFromStore(q, vectors,
        dir, k = 1, nProbe = nProbe, rerank = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val pre = top1()
    (0L until 5L).foreach(i => assert(pre(i) == i + 100L))

    val report = Ann.rebalanceCells(spark, dir, vectors, maxCellSize = 10L,
      splitFactor = 2, iters = 2)
    assert(report.map(_._1).toSet.size == 2 &&
      report.forall(_._2 > 10L), s"both cells were oversized: $report")
    val cells = spark.read.parquet(s"${VersionedStore.tableRoot(dir)}/cells")
    assert(cells.count() == vectors.count(), "rebalance moved rows, never drops")
    val bookIds = spark.read.parquet(s"${VersionedStore.tableRoot(dir)}/codebook")
      .select("id").as[Long].collect().toSet
    report.foreach { case (cid, _) =>
      assert(!bookIds.contains(cid), s"split parent $cid still in codebook") }
    assert(cells.select("cell_id").distinct().as[Long].collect()
      .forall(bookIds.contains), "cells reference unknown centroids")
    // the store's structural invariants all hold post-swap
    assert(StoreFsck.annStore(spark, dir)
      .as[(String, Long)].collect().toMap.values.forall(_ == 0L))
    // serving contract unchanged (4 sub-cells, all probed at nProbe=4)
    assert(top1() == pre, "rebalance changed retrieval")

    // a balanced store is a measured no-op
    assert(Ann.rebalanceCells(spark, dir, vectors, maxCellSize = 100L).isEmpty)

    // the rewrite subsumes takedown GC: tombstoned rows leave the store
    // and the tombstone set clears (compactIndexCells' contract)
    Ann.tombstoneVectors(spark, dir, Seq(29L))
    val report2 = Ann.rebalanceCells(spark, dir, vectors, maxCellSize = 5L,
      splitFactor = 2, iters = 2)
    assert(report2.nonEmpty)
    val after = spark.read.parquet(s"${VersionedStore.tableRoot(dir)}/cells")
    assert(after.count() == vectors.count() - 1)
    assert(after.where($"id" === 29L).isEmpty)
    assert(Tombstones.readOpt(spark, VersionedStore.tableRoot(dir)).isEmpty,
      "tombstone overlay must be gone after the rewrite")
    // 8 sub-cells now — probe them all; a near-dup twin may sit one
    // sub-cell over from its query after a fine split
    assert(top1(nProbe = 8) == pre, "GC-subsuming rebalance changed retrieval")
  }

  test("mergeCells: dead and thin centroids absorbed, serving exact, codebook shrinks") {
    import graft.pipeline.{StoreFsck, Tombstones}
    val dir = java.nio.file.Files.createTempDirectory("annmrg").toString
    // 4 orthogonal families of identical pairs; init picks ids 0-3 (the
    // k lowest), so Lloyd's lands one cell per direction, 2 members each
    val base = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f)),
      (2L, Seq(0f, 0f, 1f, 0f)), (3L, Seq(0f, 0f, 0f, 1f)))
    val all = base.toDF("id", "vec")
    val withTwins = all.unionByName(
      all.select(($"id" + 100L).as("id"), $"vec"))
    Ann.writeIndex(withTwins, dir, k = 4, iters = 2)
    // takedown empties family 3's cell → a DEAD centroid every probe
    // still ranks; merge must drop it without touching any member
    Ann.tombstoneVectors(spark, dir, Seq(3L, 103L))
    val report = Ann.mergeCells(spark, dir, withTwins, minCellSize = 2L)
    assert(report == Seq((3L, 0L)), s"expected one dead centroid: $report")
    def book() = spark.read
      .parquet(s"${VersionedStore.tableRoot(dir)}/codebook")
      .select("id").as[Long].collect().toSet
    assert(book() == Set(0L, 1L, 2L), "codebook must shrink")
    assert(StoreFsck.annStore(spark, dir).where(col("n_bad") > 0).isEmpty)
    // the rewrite subsumed takedown GC: overlay gone, rows purged
    assert(Tombstones.readOpt(spark, VersionedStore.tableRoot(dir)).isEmpty)
    assert(Ann.readCells(spark, dir).count() == 6L)
    // serving exact over all surviving cells: twins stay rank-1
    val top = Ann.ivfQuantizedTopKFromStore(all.where($"id" < 3), withTwins,
        dir, k = 1, nProbe = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    (0L until 3L).foreach(i => assert(top(i) == i + 100L))
    // a balanced store is a measured no-op
    assert(Ann.mergeCells(spark, dir, withTwins, minCellSize = 2L).isEmpty)
    // THIN (nonzero) cell: family 2 loses its original; the lone twin
    // reassigns to its nearest surviving centroid in one fused job
    Ann.tombstoneVectors(spark, dir, Seq(2L))
    val report2 = Ann.mergeCells(spark, dir, withTwins, minCellSize = 2L)
    assert(report2 == Seq((2L, 1L)), s"expected one thin cell: $report2")
    assert(book() == Set(0L, 1L))
    val moved = Ann.readCells(spark, dir).where($"id" === 102L)
      .select("cell_id").as[Long].collect().toSeq
    assert(moved.length == 1 && Set(0L, 1L).contains(moved.head))
    assert(StoreFsck.annStore(spark, dir).where(col("n_bad") > 0).isEmpty)
    // a floor no cell reaches is a retrain, not a merge — loud
    intercept[IllegalArgumentException] {
      Ann.mergeCells(spark, dir, withTwins, minCellSize = 100L)
    }
  }

  test("persisted PQ index: frozen-book appends, takedowns, loud book validation") {
    import graft.pipeline.Tombstones
    val dir = java.nio.file.Files.createTempDirectory("pqstore").toString
    // dim 8 (m=4 → 2-dim slices), 8 base vectors with distinct slices
    val base = (0L until 8L).map { i =>
      (i, Array.tabulate(8)(d => ((i * 7 + d * 3) % 11 + 1).toFloat))
    }.toDF("id", "vec")
    Ann.writePqIndex(base, dir, m = 4, ksub = 4, iters = 2)
    assert(VersionedStore.isVersioned(dir))
    // twins of ids 0-3 arrive LATER under the frozen books
    val twins = base.where($"id" < 4)
      .select(($"id" + 100L).as("id"), $"vec")
    Ann.appendToPqIndex(twins, dir)
    val gen = VersionedStore.tableRoot(dir)
    assert(spark.read.parquet(s"$gen/codes").count() == 12L)
    // identical vectors encode to identical code words → the twin is
    // the minimal-ADC candidate and rank-1 after the exact re-rank
    val all = base.unionByName(twins)
    def top1() = Ann.pqTopKFromStore(base.where($"id" < 4), all, dir,
        k = 1, rerank = 4)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, c) => q -> ((n, c)) }.toMap
    val served = top1()
    (0L until 4L).foreach(i => assert(served(i) == ((i + 100L, 1.0))))
    // takedown: query 0's twin leaves candidate scoring entirely
    Ann.tombstoneVectorsDf(Seq(100L).toDF("id"), dir)
    val after = top1()
    assert(after(0L)._1 != 100L)
    (1L until 4L).foreach(i => assert(after(i) == ((i + 100L, 1.0))))
    // a books table with a sparse cell-id range must fail the load —
    // silent LUT misalignment would mis-rank everything downstream
    val bad = java.nio.file.Files.createTempDirectory("pqbad").toString
    VersionedStore.publish(bad, Map(
      "books" -> spark.read.parquet(s"$gen/books").where($"id" =!= 2L),
      "codes" -> spark.read.parquet(s"$gen/codes")))
    intercept[IllegalArgumentException] { Ann.readPqBooks(spark, bad) }
  }

  test("persisted IVF-PQ index: residual codes, frozen-quantizer appends, takedowns") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    // 4 orthogonal-ish families in dim 8 (m=4 → 2-dim residual slices)
    val base = (0L until 8L).map { i =>
      (i, Array.tabulate(8)(d =>
        (if (d / 2 == (i % 4)) 10f else 0f) + ((i * 3 + d) % 5).toFloat))
    }.toDF("id", "vec")
    Ann.writeIvfPqIndex(base, dir, k = 4, m = 4, ksub = 4, iters = 2)
    assert(VersionedStore.isVersioned(dir))
    val gen = VersionedStore.tableRoot(dir)
    // the triple landed together: coarse codebook, residual books, cells
    assert(spark.read.parquet(s"$gen/codebook").count() == 4L)
    assert(spark.read.parquet(s"$gen/books")
      .select("subspace").distinct().count() == 4L)
    val cells = spark.read.parquet(s"$gen/cells")
    assert(cells.count() == 8L &&
      cells.columns.sorted.toSeq == Seq("cell_id", "codes", "id"))
    // twins arrive later under BOTH frozen quantizers: same cell, same
    // residual code word as their originals
    val twins = base.where($"id" < 4)
      .select(($"id" + 100L).as("id"), $"vec")
    Ann.appendToIvfPqIndex(twins, dir)
    val byId = spark.read.parquet(s"$gen/cells")
      .select("id", "cell_id", "codes")
      .as[(Long, Long, Seq[Int])].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    (0L until 4L).foreach(i => assert(byId(i) == byId(i + 100L),
      s"twin $i drifted: ${byId(i)} vs ${byId(i + 100L)}"))
    // serving: planted twins rank-1 at cosine 1.0 through the store
    val all = base.unionByName(twins)
    def top1() = Ann.ivfPqTopKFromStore(base.where($"id" < 4), all, dir,
        k = 1, nProbe = 2, rerank = 4)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, c) => q -> ((n, c)) }.toMap
    val served = top1()
    (0L until 4L).foreach(i => assert(served(i) == ((i + 100L, 1.0)),
      s"query $i: ${served(i)}"))
    // takedown leaves candidate generation immediately; fsck's ANN
    // structural checks hold on the coded cells table too
    Ann.tombstoneVectorsDf(Seq(100L).toDF("id"), dir)
    assert(top1()(0L)._1 != 100L)
    assert(graft.pipeline.StoreFsck.annStore(spark, dir)
      .where(col("n_bad") > 0).isEmpty)
  }

  test("vector functions: cosine/dot/norm identities") {
    val df = Seq((Array(1f, 0f, 0f), Array(0f, 2f, 0f)),
      (Array(1f, 1f, 0f), Array(1f, 1f, 0f))).toDF("a", "b")
    val got = df.select(
      VF.cosine($"a", $"b").as("cos"),
      VF.dot($"a", $"b").as("dot"),
      VF.norm2($"a").as("na"),
      VF.l2sq($"a", $"b").as("l2"))
      .as[(Double, Double, Double, Double)].collect()
    assert(math.abs(got(0)._1) < 1e-12 && got(0)._2 == 0.0 && got(0)._3 == 1.0)
    assert(math.abs(got(1)._1 - 1.0) < 1e-12 && got(1)._2 == 2.0)
    assert(got(0)._4 == 5.0)
  }

  test("native dot_product == HOF dot on float and double arrays") {
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 40).map(i =>
      (i.toLong, Array.fill(13)(rnd.nextFloat() * 2 - 1),
        Array.fill(13)(rnd.nextDouble() * 2 - 1)))
    val df = vecs.toDF("id", "f", "d")
    // float × float
    val ff = df.select((VF.dotNative($"f", $"f") === VF.dot($"f", $"f"))
      .as("eq")).as[Boolean].collect()
    assert(ff.forall(identity))
    // double × double (PCA's centered-vector shape)
    val dd = df.select((VF.dotNative($"d", $"d") === VF.dot($"d", $"d"))
      .as("eq")).as[Boolean].collect()
    assert(dd.forall(identity))
    // mixed float × double
    val fd = df.select(VF.dotNative($"f", $"d").as("n"),
      VF.dot($"f", $"d").as("h")).as[(Double, Double)].collect()
    fd.foreach { case (n, h) => assert(n == h, s"$n != $h") }
  }

  test("native cosine_sim expression: codegen == interpreted == HOF == kernel") {
    import graft.functions.{GraftFunctions, VectorFunctions}
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 50).map(i =>
      (i.toLong, Array.fill(17)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("id", "vec")
    val pairs = df.select($"id".as("id_a"), $"vec".as("vec_a"))
      .crossJoin(df.select($"id".as("id_b"), $"vec".as("vec_b")))
      .where($"id_a" < $"id_b")
    // native (codegen'd in the join stage) vs interpreted HOF reference
    val mismatch = pairs.select($"id_a", $"id_b",
        GraftFunctions.cosine_sim($"vec_a", $"vec_b").as("nat"),
        VectorFunctions.cosineHof($"vec_a", $"vec_b").as("hof"))
      .where(abs($"nat" - $"hof") > 1e-12).count()
    assert(mismatch == 0)
    // bit-exact twin of the scala kernel (same accumulation order)
    val byId = vecs.toMap
    val nat = pairs.select($"id_a", $"id_b",
        GraftFunctions.cosine_sim($"vec_a", $"vec_b").as("nat"))
      .as[(Long, Long, Double)].collect()
    nat.foreach { case (a, b, c) =>
      assert(c == VectorFunctions.cosineKernel(byId(a), byId(b)))
    }
    // SQL surface via registration
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("cosvecs")
    val viaSql = spark.sql(
      "SELECT cosine_sim(a.vec, b.vec) FROM cosvecs a JOIN cosvecs b ON a.id = 0 AND b.id = 1")
      .as[Double].head()
    assert(viaSql == VectorFunctions.cosineKernel(byId(0L), byId(1L)))
    // null propagation
    val withNull = Seq((Array(1f, 2f), null.asInstanceOf[Array[Float]]))
      .toDF("a", "b")
    assert(withNull.select(GraftFunctions.cosine_sim($"a", $"b"))
      .collect().head.isNullAt(0))
  }

  test("decontamination drops exactly the train docs overlapping eval") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different sentence with unique words here"),
      (3L, "shares the quick brown fox fragment with eval"),
      (4L, "another clean document nothing in common at all")
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "watch the quick brown fox run")).toDF("doc_id", "text")
    // 3-grams of eval include "the quick brown"/"quick brown fox" → docs 1,3
    val clean = graft.pipeline.Dedup.decontaminate(train, eval)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(2L, 4L))
    val flagged = graft.pipeline.Dedup.contaminatedIds(train, eval)
      .as[Long].collect().toSet
    assert(flagged == Set(1L, 3L))
  }

  test("sequence packing: offsets are cumulative, chunks split on budget") {
    val docs = Seq(
      ("en", 1L, "a b c d"),        // 4 tokens, offset 0, chunk 0
      ("en", 2L, "e f g"),          // 3 tokens, offset 4, chunk 0
      ("en", 3L, "h i"),            // offset 7 → chunk 1 (budget 6)
      ("fr", 10L, "un deux trois")  // separate group restarts at 0
    ).toDF("lang", "doc_id", "text")
    val packed = graft.pipeline.Packing.packChunks(docs, budgetTokens = 6L)
      .select("lang", "doc_id", "n_tokens", "tok_offset", "chunk_id")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(packed == Set(
      ("en", 1L, 4L, 0L, 0L), ("en", 2L, 3L, 4L, 0L),
      ("en", 3L, 2L, 7L, 1L), ("fr", 10L, 3L, 0L, 0L)))
    val stats = graft.pipeline.Packing.chunkStats(
      graft.pipeline.Packing.packChunks(docs, 6L))
    assert(stats.where($"lang" === "en" && $"chunk_id" === 0)
      .select("n_docs").as[Long].head() == 2L)
  }

  test("native expressions compose when used twice in one projection") {
    import graft.functions.GraftFunctions._
    // two instances of each expression in a single codegen'd projection —
    // regression for fixed variable names colliding in generated Java
    val df = Seq((Array(1f, 2f, 3f), Array(3f, 2f, 1f), "ab", "cd"))
      .toDF("a", "b", "s1", "s2")
    val row = df.select(
      cosine_sim($"a", $"b").as("c1"), cosine_sim($"b", $"a").as("c2"),
      l2sq($"a", $"b").as("d1"), l2sq($"b", $"a").as("d2"),
      fnv_hash64($"s1").as("h1"), fnv_hash64($"s2").as("h2")).head()
    assert(row.getDouble(0) == row.getDouble(1))
    assert(row.getDouble(2) == 8.0 && row.getDouble(3) == 8.0)
    assert(row.getLong(4) != row.getLong(5))
  }
}
