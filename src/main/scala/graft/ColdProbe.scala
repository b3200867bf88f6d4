package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: COLD-START cost of the store-backed families (SCALING.md's
  * min-of-2 explicitly measures the warm steady state; this puts the
  * 100 TB first-touch cost on record). Per family: the persisted store
  * dir is deleted and the plan cache cleared, then the serving query is
  * timed COLD (store onboarding + first serve in one number — exactly
  * what a fresh deployment pays) and again WARM (store on disk, plan
  * cache populated — the steady state every later query pays).
  *
  * JVM/codegen warm-up runs first at sf0.001 (the Bench methodology) so
  * the first measured family doesn't absorb Janino/JIT costs.
  *
  * Usage: runMain graft.ColdProbe [sfDir]   (default /root/testdata/sf0.1)
  */
object ColdProbe {

  /** (store-dir suffix under WireFixtures' per-SF root, serving query) */
  private val Families = Seq(
    "ann_index_k8i3g" -> "q_ann_store",
    "ann_index_incr_k8i3g" -> "q_ann_store_incr",
    "postings_index_g" -> "q_postings_incr",
    "winnow_fp_k8w8" -> "q_winnow_incr",
    "cdc_chunks_k8d32" -> "q_cdc_incr",
    "image_sigs_dhash9x8" -> "q_image_incr",
    "lm_bigram_t80g" -> "q_lm_store",
    // takedown stores: cold = index build + tombstone write + first
    // tombstone-filtered serve — the fresh-deployment path of the
    // takedown wave
    "postings_takedown_m7r2g" -> "q_phrase_delete",
    "ann_takedown_k8i3g" -> "q_ann_delete",
    "minhash_takedown_m7r2g" -> "q_dedup_delete")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      Bench.force(SparkEntry.queries(name)(spark, dir))
      (System.nanoTime() - t0) / 1e9
    }

    // JVM warm-up at the smallest SF (codegen, shuffle machinery, the
    // store writers themselves)
    Families.foreach { case (_, q) =>
      try run(q, "/root/testdata/sf0.001") catch { case _: Throwable => () }
    }

    println(f"${"family"}%-22s ${"cold(build+serve)"}%18s ${"warm"}%8s")
    Families.foreach { case (suffix, q) =>
      val storeDir = graft.sources.WireFixtures.storePath(sfDir, suffix)
      // Demote-then-delete under the SAME ProcessLock writeOnce's
      // promotion protocol uses ("a promoted dir is never deleted"):
      // the _SUCCESS marker drops first, so a concurrent builder
      // waiting on the lock sees an unpromoted partial and rebuilds
      // rather than reading a dir mid-delete or re-promoting over it.
      // (A reader already PAST writeOnce can still race the delete —
      // the probe assumes no concurrent servers, which is its dev-only
      // contract; the lock closes the builder race, the real one.)
      // ProcessLock's contract: hold a JVM-local monitor around it —
      // FileChannel.lock throws OverlappingFileLockException on
      // same-JVM contention. writeOnce synchronizes on WireFixtures,
      // so the probe takes the SAME monitor to serialize with any
      // in-JVM builder before taking the cross-process lock.
      graft.sources.WireFixtures.synchronized {
        graft.sources.ProcessLock.exclusive(s"$storeDir.lock") {
          if (graft.pipeline.StoreFs.isDirectory(storeDir)) {
            graft.pipeline.StoreFs.deleteRecursive(s"$storeDir/_SUCCESS")
            graft.pipeline.StoreFs.deleteRecursive(storeDir)
          }
        }
      }
      graft.pipeline.PlanCache.clear()
      val cold = run(q, sfDir)
      val warm = run(q, sfDir)
      println(f"$suffix%-22s $cold%18.2f $warm%8.2f")
    }
    spark.stop()
  }
}
