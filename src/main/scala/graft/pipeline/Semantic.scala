package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic (embedding-space) deduplication policies.
  *
  * Two complementary treatments of the same near-duplicate evidence:
  *  - [[semanticDedup]] — SemDeDup-shaped hard dedup: k-means-cluster the
  *    embedding space, search for near-duplicate pairs ONLY within each
  *    cluster, keep the lowest-id member of every near-dup relation.
  *  - [[softDedupWeights]] — soft dedup: nothing is dropped; each doc is
  *    down-weighted by the size of its near-dup component (weight
  *    1/|component|), so a cluster of n copies contributes one document's
  *    worth of training mass in aggregate.
  */
object Semantic {

  /** SemDeDup-style semantic deduplication (the k-means-then-intra-cluster
    * pairwise search published for web-scale embedding dedup): train a
    * codebook over the embeddings, assign every vector to its nearest
    * centroid with the fused argmin projection (one scan, no shuffle —
    * [[Ann.nearestCellExpr]]), then compare pairs only WITHIN a cell. The
    * cross product never leaves a cell, so the pair search costs
    * Σ|cell|² instead of N²; `k` is the knob that bounds cell size.
    * CAVEAT the round-13 sf10 probe measured: the flat assignment
    * evaluates k distances per row, so growing k ∝ N to hold cell size
    * constant makes the ASSIGNMENT pass O(N·k) — quadratic overall
    * (80→800 cells at 10× rows ran 121×). The scale-honest
    * configurations at 100 TB are [[semanticDedupHier]] (two-level
    * codebook, √k distances per row) or a FIXED moderate k with
    * `intraCellPlanes > 0` (LSH-blocked pair search inside hot cells —
    * linear assignment, bucket-bounded pairs). Drop policy is greedy
    * lowest-id-wins: a doc is dropped iff
    * some lower-id doc in its cell has cosine ≥ `cosineThreshold`. For
    * EXACT-duplicate groups (the planted-twin contract) this keeps
    * exactly the minimum id. Note the policy is deliberately greedy, not
    * component-based: similarity is not transitive, so on a chain
    * A~B~C with A≁C both B and C drop (each has a lower similar
    * neighbor) and C's only surviving "representative" is A, which it
    * does not resemble directly — the aggressive end of the dedup
    * spectrum. Callers needing a guaranteed direct representative per
    * relation should feed the within-cell pairs to
    * [[Dedup.keepOnePerComponent]] (keep-min per connected component)
    * instead.
    *
    * `intraCellPlanes > 0` switches the within-cell pair search to
    * hyperplane-LSH blocking INSIDE each cell (join key (cell, table,
    * bucket) instead of the cell alone) — the hot-cell escape hatch for
    * corpora where even k ∝ N leaves some cells too big for an all-pairs
    * block. Identical vectors collide in every table, so the
    * planted-twin/exact-duplicate contract is unchanged; near-pairs
    * below cosine 1 trade a little recall for bucket-bounded cost,
    * exactly like [[Dedup.embeddingNearDups]] (whose bucketing kernel
    * and verify join this path reuses).
    *
    * Scale shape: BOTH candidate paths carry ids only through the wide
    * (cell- or bucket-keyed) pair join; vectors enter exactly one
    * id-keyed linear join at verify time ([[Dedup.embeddingCosineVerify]]),
    * so the shuffle that can go quadratic never carries an embedding.
    * The final exclusion join is a plain (unhinted) left join: at web
    * scale the drop set is proportional to duplicate mass, which is
    * routinely 30-50% of the corpus — corpus-order, NOT broadcastable by
    * assumption. AQE picks broadcast from measured sizes when the drop
    * set really is small, and falls back to a shuffled join when it
    * isn't; forcing the hint here would OOM exactly the workloads this
    * module targets.
    *
    * Returns one row per input doc: (doc_id, kept). Codebook training is
    * memoized per corpus plan ([[Ann.trainCentroids]]); assignment is
    * computed once and reused for both join sides through [[PlanCache]].
    */
  def semanticDedup(vecs: DataFrame, idCol: String = "id",
      vecCol: String = "vec", k: Int = 8, iters: Int = 4,
      cosineThreshold: Double = 0.99, intraCellPlanes: Int = 0,
      intraCellTables: Int = 4): DataFrame = {
    val base = vecs.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
    val (codebook, _) = Ann.trainCentroids(base, k, iters)
    val cells = PlanCache.getOrPersist(base, s"semdedup-cells|$k|$iters",
      base.withColumn("cell_id", Ann.nearestCellExpr(codebook, col("vec"))))
    dedupWithinCells(cells, cosineThreshold, intraCellPlanes,
      intraCellTables)
  }

  /** TWO-LEVEL (hierarchical) semantic dedup — the configuration that
    * stays near-linear when the cell-count knob must grow with the
    * corpus. [[semanticDedup]]'s flat assignment evaluates k distances
    * per row, so the "k ∝ N / targetCellSize" regime that bounds the
    * within-cell pair pass makes the ASSIGNMENT pass O(N·k) = O(N²/c) —
    * the round-13 sf1→sf10 probe measured exactly that (k 80→800 at 10×
    * rows: 121×). Here the codebook is a tree: `kCoarse` top-level
    * centroids over the corpus, then one `kSub`-centroid sub-codebook
    * trained per coarse cell ON ITS MEMBERS ONLY, leaf id = coarse ×
    * kSub + sub. Assignment costs kCoarse + kSub distances per row —
    * √k-shaped when kCoarse = kSub = √k — and training costs the same
    * per scan (each sub-training's corpus is one cell), so kCoarse·kSub
    * leaves at 10× data cost ~3× per row instead of 10×. The per-cell
    * training loop is codebook-bounded driver orchestration (the
    * [[Ann.rebalanceCells]] discipline), each iteration's jobs
    * cell-sized.
    *
    * The dedup contract is [[semanticDedup]]'s, unchanged: identical
    * vectors share the coarse argmin AND the sub argmin (both
    * deterministic expressions), so twins land in one leaf and the
    * greedy lowest-id-wins policy keeps exactly the minimum id of every
    * exact-duplicate group — the planted-twin oracle holds under any
    * training state. Near-dup recall differs from flat k-means only
    * through cell boundaries (a near-pair split across leaves is missed
    * by EITHER method; the tree's boundaries are just drawn elsewhere).
    * Thin coarse cells (≤ kSub members) skip sub-training — the coarse
    * cell is already pair-searchable as one leaf.
    *
    * TRAINING runs on a deterministic hash-SAMPLE of each slice
    * (`trainSampleCap` rows, [[Sampling.hashSample]] — codebooks are
    * corpus statistics, the sampling discipline [[Ann.trainCentroids]]
    * prescribes at 100 TB): the per-cell training loop's cost is then
    * bounded by kCoarse × cap regardless of corpus size, and only the
    * single fused ASSIGNMENT projection ever scans everything. Sampling
    * moves centroids, never the contract (identical vectors still share
    * every argmin under whatever codebook trained). Cap 0 trains on
    * full slices (exact fixture parity). */
  def semanticDedupHier(vecs: DataFrame, idCol: String = "id",
      vecCol: String = "vec", kCoarse: Int = 16, kSub: Int = 16,
      iters: Int = 3, cosineThreshold: Double = 0.99,
      intraCellPlanes: Int = 0, intraCellTables: Int = 4,
      trainSampleCap: Int = 0): DataFrame = {
    require(kCoarse > 0 && kSub > 0,
      s"semanticDedupHier: kCoarse $kCoarse, kSub $kSub")
    require(trainSampleCap == 0 || trainSampleCap >= math.max(kCoarse, kSub),
      s"semanticDedupHier: trainSampleCap $trainSampleCap below the" +
        " codebook sizes — training would see fewer rows than centroids")
    val base = vecs.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("vec"))
    // deterministic training sample: basis-point rate from the frame's
    // size (one count, driver-held) — hash-stable, so every run trains
    // the same codebook
    def sampled(df: DataFrame, n: Long, cap: Long): DataFrame =
      if (trainSampleCap == 0 || n <= cap) df
      else Sampling.hashSample(df, "id",
        math.max(1, (cap * 10000L / n).toInt))
    val nAll = base.count()
    val (coarse, _) =
      Ann.trainCentroids(sampled(base, nAll, trainSampleCap), kCoarse,
        iters)
    val coarseCells = PlanCache.getOrPersist(base,
      s"semdedup-hier|$kCoarse|$kSub|$iters|$trainSampleCap",
      base.withColumn("c", Ann.nearestCellExpr(coarse, col("vec"))))
    // codebook-bounded rows (one per coarse cell) — driver-collectable
    val counts = coarseCells.groupBy("c").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // ONE materialized training pool for every sub-training (~kCoarse ×
    // cap rows, mass-proportional per cell): without it each of the
    // kCoarse per-cell trainings re-scans the full corpus just to
    // sample its slice — a √k × N = N^1.5 term the round-13 sf10 probe
    // measured before this pool existed. Per-cell training reads then
    // cost pool-sized scans; the full corpus is scanned once here and
    // once by the leaf assignment, like every store build in the engine
    val trainPool =
      if (trainSampleCap == 0) coarseCells
      else PlanCache.getOrPersist(base,
        s"semdedup-hier-pool|$kCoarse|$kSub|$iters|$trainSampleCap",
        sampled(coarseCells, nAll, trainSampleCap.toLong * kCoarse))
    // pool rows per cell (codebook-bounded) — a cell whose pool slice
    // is thinner than kSub falls back to the unsplit branch rather than
    // training a degenerate book
    val poolCounts =
      if (trainSampleCap == 0) counts
      else trainPool.groupBy("c").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val leafPlan = coarse.map(_._1).filter(counts.contains).map { cid =>
      val slice = coarseCells.where(col("c") === cid)
        .select(col("id"), col("vec"))
      if (counts(cid) <= kSub.toLong ||
        poolCounts.getOrElse(cid, 0L) < kSub.toLong)
        // too thin to split: the coarse cell IS the leaf
        slice.withColumn("cell_id", lit(cid * kSub.toLong))
      else {
        val (sub, _) = Ann.trainCentroids(
          trainPool.where(col("c") === cid).select(col("id"), col("vec")),
          kSub, iters)
        slice.withColumn("cell_id",
          lit(cid * kSub.toLong) + Ann.nearestCellExpr(sub, col("vec")))
      }
    }.reduce(_ unionByName _)
    // persisted like the flat path's cells frame — the dedup tail
    // evaluates its cells input several times (both pair-join sides,
    // the verify fetch, the exclusion join), and re-executing the
    // kCoarse-branch union per use would re-run every leaf assignment
    // each time
    val leaves = PlanCache.getOrPersist(base,
      s"semdedup-hier-leaves|$kCoarse|$kSub|$iters|$trainSampleCap",
      leafPlan)
    dedupWithinCells(leaves, cosineThreshold, intraCellPlanes,
      intraCellTables)
  }

  /** The VERIFIED within-cell near-duplicate pair set of
    * [[semanticDedup]]'s configuration — the dedup decision's evidence,
    * exposed as data. (id_a < id_b), every pair exact-cosine-confirmed
    * at `cosineThreshold`; the candidate stage is all-pairs-per-cell
    * under `intraCellPlanes = 0` and hyperplane-LSH-blocked inside each
    * cell above it. Because LSH blocking only ever NARROWS the
    * candidate set (a bucket collision is a subset of cell
    * co-membership) and both configurations confirm at the same
    * threshold, the LSH pair set is a SUBSET of the exact one over the
    * same cells — which makes `|lsh| / |exact|` a true pair-recall, the
    * organic quality gate q_semdedup_recall pins (the semdedup analogue
    * of [[Ann.recallAtK]]: planted-twin invariants can't see a
    * plane/table configuration that quietly drops natural near-pairs;
    * this measures it against ground truth). Cell assignment is
    * memoized per (corpus plan, k, iters) through [[PlanCache]], so the
    * exact and LSH measurements of one gate share one training and one
    * assignment. */
  def withinCellDupPairs(vecs: DataFrame, idCol: String = "id",
      vecCol: String = "vec", k: Int = 8, iters: Int = 4,
      cosineThreshold: Double = 0.99, intraCellPlanes: Int = 0,
      intraCellTables: Int = 4): DataFrame = {
    val base = vecs.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("vec"))
    val (codebook, _) = Ann.trainCentroids(base, k, iters)
    val cells = PlanCache.getOrPersist(base, s"semdedup-cells|$k|$iters",
      base.withColumn("cell_id", Ann.nearestCellExpr(codebook, col("vec"))))
    verifiedPairs(cells, cosineThreshold, intraCellPlanes, intraCellTables)
  }

  /** Candidate generation + exact verify — [[dedupWithinCells]]' first
    * two stages, shared with [[withinCellDupPairs]] so the gate always
    * measures exactly the pairs the dedup acts on. */
  private def verifiedPairs(cells: DataFrame, cosineThreshold: Double,
      intraCellPlanes: Int, intraCellTables: Int): DataFrame = {
    val candidates =
      if (intraCellPlanes <= 0) {
        // within-cell pair search: the join key is the cell id alone, so
        // the only rows that ever meet are cluster-mates. Candidate rows
        // are id-only — the Σ|cell|² product carries two longs per row,
        // never the vectors (those join once, id-keyed, at verify)
        cells.select(col("cell_id"), col("id").as("id_a"))
          .join(cells.select(col("cell_id"), col("id").as("id_b")), "cell_id")
          .where(col("id_a") < col("id_b"))
          .select("id_a", "id_b")
      } else {
        // one single-pass kernel scan builds all tables' buckets
        // (VectorFunctions.hyperplaneBuckets — the designated hot path,
        // not per-table interpreted HOF scans); cell_id rejoins on the
        // persisted cells frame, narrow rows only
        val bucketed = graft.functions.VectorFunctions
          .hyperplaneBuckets(cells.select("id", "vec"), "id", "vec",
            intraCellPlanes, intraCellTables)
          .select("id", "table", "bucket")
          .join(cells.select(col("id"), col("cell_id")), "id")
        bucketed
          .select(col("cell_id"), col("table"), col("bucket"),
            col("id").as("id_a"))
          .join(bucketed.select(col("cell_id"), col("table"), col("bucket"),
            col("id").as("id_b")), Seq("cell_id", "table", "bucket"))
          .where(col("id_a") < col("id_b"))
          .select("id_a", "id_b").distinct()
      }
    Dedup.embeddingCosineVerify(cells.select("id", "vec"),
      candidates, cosineThreshold)
  }

  /** The shared dedup tail: within-cell candidate pairs (all-pairs per
    * cell, or hyperplane-LSH-blocked inside each cell), exact cosine
    * verify, greedy lowest-id-wins exclusion. `cells` carries
    * (id, vec, cell_id); both entry points land here so the flat and
    * hierarchical assignments can never drift on policy. */
  private def dedupWithinCells(cells: DataFrame, cosineThreshold: Double,
      intraCellPlanes: Int, intraCellTables: Int): DataFrame = {
    val dropped = verifiedPairs(cells, cosineThreshold, intraCellPlanes,
        intraCellTables)
      .select(col("id_b").as("id")).distinct()
    // plain left join — the drop set is duplicate-mass-sized, which at
    // web scale can be a large fraction of the corpus; AQE broadcasts it
    // only when its measured size permits (see scaladoc)
    cells.select("id")
      .join(dropped.withColumn("dup", lit(true)), Seq("id"), "left")
      .select(col("id").as("doc_id"), col("dup").isNull.as("kept"))
  }

  /** Soft deduplication: down-weight near-duplicates instead of dropping
    * them (the "one document's worth of mass per component" policy some
    * pretraining pipelines prefer over hard dedup — repeated text still
    * appears, but no cluster dominates the loss). Each doc's weight is
    * `1/|near-dup component|`, emitted integer-exactly as basis points
    * (`weight_bp = floor(10000 / csize)`) so external engines re-derive
    * the exact value. Docs with no dup edge are singletons at weight
    * 10000.
    *
    * `pairs` is the verified near-dup edge set ((id_a, id_b), e.g. the
    * MinHash-LSH → exact-Jaccard pipeline's output); components come from
    * [[Dedup.connectedComponents]]. Scale shape: the label table has one
    * row per doc that appears in ANY dup relation — duplicate mass, which
    * at web scale can be 30-50% of the corpus, so the weight join is a
    * plain (unhinted) left join and AQE broadcasts only when the measured
    * label-side size permits, shuffling otherwise (same policy as
    * [[Dedup.keepOnePerComponent]]'s anti-join). */
  def softDedupWeights(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val comp = Dedup.connectedComponents(pairs)
    val sizes = comp.groupBy("component").agg(count(lit(1)).as("csize"))
    val labeled = comp.join(sizes, "component")
      .select(col("id").as("doc_id"), col("component"), col("csize"))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(labeled, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"),
        coalesce(col("csize"), lit(1L)).as("csize"),
        floor(lit(10000.0) / coalesce(col("csize"), lit(1L)))
          .cast("long").as("weight_bp"))
  }

  /** Embedding-space decontamination: drop every train row whose vector
    * reaches cosine ≥ `cosineThreshold` against ANY eval vector — the
    * semantic analog of [[Dedup.decontaminate]]'s n-gram overlap scrub.
    * The n-gram test catches verbatim leaks; this one catches the
    * paraphrased / re-rendered / translated-and-back leaks whose surface
    * form changed but whose embedding did not.
    *
    * Plan shape: eval sets are small by construction (benchmarks are
    * KB–MB, the corpus is TB), so this is ONE broadcast nested-loop
    * anti-join — the train corpus scans once, each row short-circuits on
    * its first contaminating eval match, nothing shuffles and no
    * intermediate contaminated-id set materializes. The cosine runs as
    * the native codegen expression inside the join condition. For an
    * eval set too big to broadcast, pre-block with
    * [[Dedup.embeddingNearDups]]'s hyperplane tables and anti-join the
    * verified pair ids instead (the decontaminateBloom discipline). */
  def semanticDecontaminate(train: DataFrame, eval: DataFrame,
      cosineThreshold: Double, vecCol: String = "vec"): DataFrame = {
    // anti-join the ORIGINAL train frame (like Dedup.decontaminate):
    // surviving rows keep every column — text, metadata, all of it
    require(!train.columns.contains("__eval_vec"),
      "semanticDecontaminate: train must not carry a __eval_vec column")
    val e = eval.select(col(vecCol).as("__eval_vec"))
    train.join(broadcast(e),
        graft.functions.VectorFunctions.cosine(col(vecCol),
          col("__eval_vec")) >= cosineThreshold,
        "left_anti")
  }

  /** [[semanticDecontaminate]] for eval stores too big to broadcast —
    * the large-eval-set regime where the broadcast nested-loop anti-join
    * stops being an option (a 100M-row eval store is corpus-shaped, not
    * benchmark-shaped). Same output contract: drop every train row whose
    * vector reaches cosine ≥ `cosineThreshold` against ANY eval vector,
    * surviving rows keep every column.
    *
    * Plan shape (the [[Dedup.decontaminateBloom]] discipline — a cheap
    * candidate prefilter, then an EXACT confirming test, so the filter
    * can only cost recall, never precision):
    *   1. both sides bucket through the one-pass hyperplane-LSH kernel
    *      ([[graft.functions.VectorFunctions.hyperplaneBuckets]],
    *      `tables` independent tables of `numPlanes` planes, shared
    *      seeds) — ids only ride the (table, bucket) shuffle, vectors
    *      never enter the wide join;
    *   2. candidate (train, eval) pairs re-join their vectors id-keyed
    *      (linear, narrow) and confirm with the native exact-cosine
    *      kernel at the SAME threshold — a bucket collision below the
    *      threshold is discarded, so false candidates cannot drop a row;
    *   3. confirmed train ids anti-join the original frame (plain,
    *      unhinted: contaminated mass is workload-dependent; AQE picks
    *      broadcast when the measured size permits).
    *
    * Identical vectors collide in every table, so exact-copy leaks are
    * caught with probability 1 and the planted-twin fixture is
    * bit-identical to the BNLJ path. Near-but-not-identical pairs trade
    * bounded recall for never materializing |train|×|eval|: at the
    * default 8 tables × 12 planes a cosine-0.99 pair (angle ≈ 8°)
    * collides in ≥ 1 table with prob ≈ 1 − (1 − 0.955¹²)⁸ ≈ 0.999.
    * Raise `tables` to push recall; each table is one more narrow
    * id-row per input, the exact confirm stays pair-bounded.
    *
    * Requires an id column on `train` (the anti-join key — the BNLJ
    * variant needs none because it never materializes candidates). */
  def semanticDecontaminateLsh(train: DataFrame, eval: DataFrame,
      cosineThreshold: Double, idCol: String = "id",
      vecCol: String = "vec", numPlanes: Int = 12, tables: Int = 8)
      : DataFrame = {
    require(train.columns.contains(idCol),
      s"semanticDecontaminateLsh: train needs id column '$idCol'")
    val t = train.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("vec"))
    // eval rows get a synthetic join id; persisted so the bucket pass
    // and the confirm fetch see the SAME id assignment
    // (monotonically_increasing_id is partition-dependent, not stable
    // across re-evaluations of an unpersisted plan)
    val e = PlanCache.getOrPersist(eval, s"semdecon-eval|$vecCol",
      eval.select(col(vecCol).as("vec"))
        .withColumn("eid", monotonically_increasing_id()))
    val tBuckets = graft.functions.VectorFunctions
      .hyperplaneBuckets(t, "id", "vec", numPlanes, tables)
      .select("id", "table", "bucket")
    val eBuckets = graft.functions.VectorFunctions
      .hyperplaneBuckets(e.select(col("eid").as("id"), col("vec")),
        "id", "vec", numPlanes, tables)
      .select(col("id").as("eid"), col("table"), col("bucket"))
    val candidates = tBuckets.join(eBuckets, Seq("table", "bucket"))
      .select("id", "eid").distinct()
    val contaminated = candidates
      .join(t, Seq("id"))
      .join(e.select(col("eid"), col("vec").as("__eval_vec")), Seq("eid"))
      .where(graft.functions.VectorFunctions.cosine(col("vec"),
        col("__eval_vec")) >= cosineThreshold)
      .select(col("id")).distinct()
    train.join(contaminated.select(col("id").as(idCol)), Seq(idCol),
      "left_anti")
  }
}
