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
    * Σ|cell|² instead of N²; `k` is the knob that bounds cell size (at
    * 100 TB pick k ∝ N / targetCellSize — the within-cell join shuffles
    * both sides once on cell_id and each cell's block is a bounded
    * in-partition product; for very hot cells, compose with the
    * hyperplane-LSH blocking of [[Dedup.embeddingNearDups]] inside the
    * cell). Drop policy is greedy lowest-id-wins: a doc is dropped iff
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
    val dropped = Dedup.embeddingCosineVerify(cells.select("id", "vec"),
        candidates, cosineThreshold)
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
