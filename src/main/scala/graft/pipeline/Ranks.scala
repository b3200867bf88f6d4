package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global row_number stamping for frames already cut to a bounded size
  * (post-`limit(k)` serving results, codebook-sized store metadata).
  *
  * A bare `Window.orderBy(...)` is semantically right for these — the
  * frame is k rows by construction, so "move all data to a single
  * partition" is free — but WindowExec cannot see that construction and
  * logs its single-partition WARN on every evaluation, hundreds of
  * times per bench run, which trains operators to ignore the one
  * instance that will someday be a real unpartitioned window over a
  * corpus. Stamping through a CONSTANT BUCKET keeps the plan honest
  * (one hash partition carrying the whole — bounded — frame, exactly
  * what the bare window did) while making the partitioning explicit,
  * so the warning never fires and stays meaningful where it should.
  *
  * The bucket is derived from a column (`pmod(hash(key), 1)` — zero for
  * every row) rather than written as `lit(0)` because the optimizer's
  * `EliminateWindowPartitions` folds literal partition keys back to the
  * empty spec, which would silently resurrect the WARN; a key-derived
  * constant is not foldable, so the single-bucket spec survives
  * optimization. Correctness does not depend on the bucket VALUE, only
  * on it being identical for all rows.
  *
  * ONLY for provably bounded frames — stamping a corpus-sized frame
  * through this serializes it exactly like the bare window would, just
  * without the warning. Every call site must be downstream of a
  * `limit`/top-k cut or on driver-bounded metadata (the PlansSpec-
  * pinned shapes). */
object Ranks {

  /** `row_number()` over the TOTAL order `order`, evaluated in one
    * constant bucket derived from `bucketKey` (any non-null column of
    * the frame — conventionally the tie-break key). */
  def globalRowNumber(bucketKey: Column, order: Column*): Column =
    row_number().over(
      Window.partitionBy(pmod(hash(bucketKey), lit(1))).orderBy(order: _*))
}
