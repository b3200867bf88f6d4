package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch-addressed FORGET LOG — the streaming half of exact model
  * unlearning ([[Classifier.unlearn]] / [[LangModel.unlearn]]).
  *
  * Count-model unlearning is SUBTRACTION, and subtraction is not
  * idempotent: an at-least-once foreachBatch replay that re-subtracted
  * a forget batch would corrupt the model silently (the tombstone set's
  * re-append argument does NOT apply). So the streaming protocol never
  * mutates the saved model per trigger. Instead each micro-batch's
  * forget rows (the full training rows — unlearning re-counts their
  * text) land in their own `batch=<id>` partition with OVERWRITE
  * semantics: a replayed trigger rewrites its partition rather than
  * doubling it — the same batch-addressed discipline as the
  * count-bearing postings/df stores. Serving composes lazily:
  * `unlearn(model, read(log))` — exact (row-identical to retraining on
  * train ∖ all-forgotten-so-far, by unlearn's algebra), O(model +
  * forget-log) per serve, never O(corpus).
  *
  * The log is GC'd like a tombstone set: once a maintenance pass folds
  * it into a re-saved model (subtract once, durably), [[clear]] resets
  * serving to a plain model load. Crash between fold-save and clear is
  * NOT serve-safe (the log would subtract twice) — so the fold must
  * write a NEW model generation and retire the old root+log together
  * (snapshot rotation, the codebook-retrain discipline), not rewrite in
  * place. [[foldInto]] implements exactly that.
  *
  * Reference analogue: deletes ride the stream as first-class opcodes
  * and the bootstrap side applies them to its materialized state in a
  * maintenance pass, never in the serving path
  * (databus-core/.../DbusOpcode.java:22-26,
  * databus-bootstrap-producer/.../BootstrapDBCleaner.java:1).
  */
object ForgetLog {

  /** Record one micro-batch of forget rows (idempotent under replay:
    * same batchId ⇒ same partition, overwritten). Rows must carry the
    * columns the model's `unlearn` re-counts (text + label for NB,
    * text for the LM) — the CDC DELETE payload. */
  def appendBatch(batch: DataFrame, dir: String, batchId: Long): Unit =
    batch.coalesce(1).write.mode("overwrite").parquet(s"$dir/batch=$batchId")

  /** All forget rows recorded so far, or None when nothing was ever
    * forgotten (serving stays a plain model load — zero overhead).
    * Hadoop-FS probe ([[StoreFs]]) for the same reason as
    * [[Tombstones.readOpt]]: a silently-empty log on a non-local URI
    * would serve an un-unlearned model. */
  def readOpt(spark: SparkSession, dir: String): Option[DataFrame] =
    if (StoreFs.listNames(dir).exists(_.startsWith("batch=")))
      Some(spark.read.parquet(dir).drop("batch"))
    else None

  /** Drop the log — ONLY as the last step of [[foldInto]]-style
    * rotation, after the folded model generation is durably promoted. */
  def clear(dir: String): Unit = StoreFs.deleteRecursive(dir)

  /** Fold the log into a NEW model generation, with the ORDERING
    * enforced by the signature: `saveFolded` persists the unlearned
    * model to a fresh root (durable, not yet serving), `promote` flips
    * the serving pointer to it, and ONLY THEN does the log clear.
    *
    * The contract that makes every crash state safe is that a forget
    * log is PAIRED WITH ONE MODEL GENERATION (this `dir` belongs to the
    * root being folded; the folded generation starts with its own,
    * absent, log path) — serving always composes a root with ITS OWN
    * log, never another generation's. Then: a crash before `promote` →
    * the old (root, full log) pair serves consistently and the folded
    * root is re-foldable dead bytes; between `promote` and `clear` →
    * the folded root serves with its empty log (the old log is already
    * dead bytes, not a double-subtraction input); after `clear` → the
    * folded steady state, old log gone.
    *
    * The promote callback is REQUIRED, not advisory: the previous
    * caller-side "flip afterwards" contract let clear run first, and a
    * crash (or just the window) between clear and a later flip served
    * the OLD root with an EMPTY log — an un-unlearned model, the exact
    * compliance failure this protocol exists to prevent. The
    * old-generation retire stays with the caller. A no-op when nothing
    * was ever forgotten (`promote` is not called — there is nothing to
    * switch to). */
  def foldInto(spark: SparkSession, dir: String)(
      saveFolded: DataFrame => Unit)(promote: () => Unit): Unit = {
    readOpt(spark, dir) match {
      case None => ()
      case Some(log) =>
        saveFolded(log)
        promote()
        clear(dir)
    }
  }
}
