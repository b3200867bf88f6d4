package graft.pipeline

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Idempotent persist for derived signature tables.
  *
  * The LSH pipelines materialize a per-doc signature table that several
  * downstream branches read (both sides of the collision self-join, the
  * per-pair verify fetch). A bare `df.persist()` is wrong for a library:
  * every invocation builds a fresh `mapPartitions` lambda, so Spark's
  * CacheManager sees a *different* plan each call and caches it again —
  * repeated queries leak storage memory until the executor thrashes.
  *
  * This cache keys on the *canonicalized input plan* + operator parameters
  * (which are stable across invocations) and hands back the same persisted
  * DataFrame instance, so N calls cost one materialization and one cache
  * entry. At production scale the equivalent is writing the signature
  * table to storage once per corpus snapshot and reading it back.
  *
  * Caveat: the key is the plan, not the data — if the files under an
  * identical plan change in place, call [[clear]] to drop stale
  * signatures (normal pipelines write immutable snapshot dirs).
  */
private[graft] object PlanCache {

  private val cache = new ConcurrentHashMap[String, DataFrame]

  def getOrPersist(input: DataFrame, params: String,
      build: => DataFrame): DataFrame = {
    val key = input.sparkSession.hashCode().toString + "|" + params + "|" +
      input.queryExecution.analyzed.canonicalized.toString
    cache.computeIfAbsent(key, _ => build.persist(StorageLevel.MEMORY_AND_DISK))
  }

  /** Drop every cached signature table (tests / memory pressure). */
  def clear(): Unit = {
    cache.values.forEach(df => try df.unpersist() catch { case _: Throwable => () })
    cache.clear()
  }
}
