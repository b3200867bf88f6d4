package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics over crawl-scale corpora — the host-graph
  * quality signals web pipelines compute before document-level curation
  * (a page's host PageRank is a standard quality prior; Common Crawl
  * publishes exactly this ranking per crawl).
  *
  * PageRank here is computed in FIXED-POINT INTEGER arithmetic: ranks
  * are bigint micro-units (1e-6 of a unit of rank mass), per-edge
  * contributions use integer division, and the damping multiply is an
  * integer scale-then-divide. Every step is order-independent (bigint
  * sums commute exactly; float sums do not), so the result is
  * bit-identical across partitionings, task retries, AQE re-plans and
  * engines — which makes it hash-oracle-able and, more importantly,
  * REPRODUCIBLE: re-running the curation pipeline over the same crawl
  * yields the same quality prior, bit for bit. The price is bounded
  * truncation — each node loses < outdeg micro-units per round to the
  * integer division, a relative error < outdeg × 1e-6 per round against
  * the real-valued recurrence — a deliberate trade for determinism at
  * 100 TB, where a float PageRank is only reproducible to a tolerance.
  */
object Graph {

  /** Fixed-point PageRank over a directed edge list.
    *
    * `edges` needs (srcCol, dstCol) integer columns; duplicates and
    * self-loops are removed here (a crawl's link extractor emits both).
    * Runs EXACTLY `iters` rounds — no convergence test, because a
    * data-dependent round count would make the output depend on float
    * tolerances; rank curves at damping 0.85 settle to stable orderings
    * in a handful of rounds and callers pick the count.
    *
    * Recurrence (all bigint):
    * {{{
    *   r0(v)   = unit
    *   rk(v)   = base + (dampingNum * Σ_{u→v} (rk-1(u) div outdeg(u)))
    *                    div dampingDen
    *   base    = (dampingDen - dampingNum) * unit div dampingDen
    * }}}
    * Dangling nodes (no out-edges) absorb mass rather than
    * redistributing it — the standard simplification when the rank is a
    * relative quality prior, not a probability distribution; it keeps
    * every round a single join + aggregate.
    *
    * Scale shape: the degree-annotated edge list is computed once,
    * repartitioned by src and persisted — each round then shuffles ONLY
    * the (node, rank) table (16 B rows) to the edges' partitioning,
    * aggregates contributions with a map-side-combined sum on dst, and
    * left-joins back to the node set. Per-round lineage is cut with an
    * eager `localCheckpoint` (same discipline as the connected-components
    * loop: round N's plan must not replay rounds 1..N-1, and Janino never
    * sees an iteration-deep tree). Nothing wider than two longs ever
    * shuffles; a 10^8-host graph is ~GBs of rank table per round.
    *
    * Output: (node, rank) — rank in micro-units of `unit`. Every node
    * that appears as a src or dst is present.
    *
    * Subcritical graphs take a bounded DRIVER fast path (the
    * connected-components trade, same default ceiling): when the
    * deduplicated edge list fits `maxDriverEdges`, one collect + the
    * in-memory integer recurrence replaces `iters` distributed rounds of
    * fixed job overhead. Because the arithmetic is integer fixed-point,
    * the two paths are BIT-IDENTICAL (spec-asserted) — choosing by size
    * never changes a result. `maxDriverEdges = 0` forces the
    * distributed loop (the 100 TB host-graph path, probed in
    * SCALING.md). */
  def pageRank(edges: DataFrame, iters: Int = 5,
      dampingNum: Long = 85L, dampingDen: Long = 100L,
      unit: Long = 1000000L,
      srcCol: String = "src", dstCol: String = "dst",
      maxDriverEdges: Long = 4000000L): DataFrame = {
    require(iters >= 0, s"pageRank: negative iteration count $iters")
    require(dampingDen > 0 && dampingNum >= 0 && dampingNum <= dampingDen,
      s"pageRank: damping $dampingNum/$dampingDen outside [0,1]")
    require(unit > 0, s"pageRank: non-positive unit $unit")
    val spark = edges.sparkSession
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
    if (maxDriverEdges > 0) {
      // count rides the same scan the collect would; for subcritical
      // graphs the persist below never happens
      import spark.implicits._
      val collected = e.limit(
          math.min(maxDriverEdges + 1, Int.MaxValue.toLong).toInt)
        .as[(Long, Long)].collect()
      if (collected.length <= maxDriverEdges) {
        return pageRankReference(collected.toSeq, iters, dampingNum,
            dampingDen, unit)
          .toSeq.toDF("node", "rank")
      }
      // fell past the ceiling: fall through to the distributed loop
      // (the limit-probe scan is the one redundant pass, paid only by
      // graphs within 1 row of the ceiling — real supercritical graphs
      // stop the limit early)
    }
    // persist the deduped edge list first: outdeg, the degree join and
    // the node set all read it — unpersisted, each would re-run the
    // distinct's shuffle over the raw edges
    val eP = e.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val outdeg = eP.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // degree-annotated edges: the loop-invariant side, partitioned by the
    // join key once so per-round joins shuffle only the rank table
    val eDeg = eP.join(outdeg, "src")
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = eP.select(col("src").as("node"))
      .unionByName(eP.select(col("dst").as("node")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize BOTH loop invariants before freeing the edge cache —
    // an unmaterialized eDeg would re-run the distinct from raw edges
    // on its first loop use once eP is gone
    eDeg.count()
    nodes.count()
    eP.unpersist() // eDeg/nodes hold everything the loop needs
    val base = (dampingDen - dampingNum) * unit / dampingDen
    var ranks = nodes.withColumn("rank", lit(unit)).localCheckpoint(true)
    var i = 0
    while (i < iters) {
      val contribs = eDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("rank div outdeg").as("contrib"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("contrib")).as("inflow"))
      val next = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"($dampingNum * coalesce(inflow, 0L)) " +
            s"div $dampingDen")).as("rank"))
        .localCheckpoint(true)
      PlanCache.freeLocalCheckpoint(ranks)
      ranks = next
      i += 1
    }
    eDeg.unpersist()
    nodes.unpersist()
    ranks
  }

  /** In-memory reference of the identical integer recurrence, for
    * generative spec-equivalence on small graphs (the distributed loop
    * must match this map-for-map). */
  private[graft] def pageRankReference(edges: Seq[(Long, Long)], iters: Int,
      dampingNum: Long = 85L, dampingDen: Long = 100L,
      unit: Long = 1000000L): Map[Long, Long] = {
    val e = edges.filter { case (s, d) => s != d }.distinct
    val outdeg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val base = (dampingDen - dampingNum) * unit / dampingDen
    var ranks = nodes.map(_ -> unit).toMap
    for (_ <- 0 until iters) {
      val inflow = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => ranks(s) / outdeg(s) }.sum
      }
      ranks = nodes.map { n =>
        n -> (base + dampingNum * inflow.getOrElse(n, 0L) / dampingDen)
      }.toMap
    }
    ranks
  }
}
