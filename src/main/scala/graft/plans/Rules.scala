package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rules for the engine (tier (c) of the extension
  * ladder: compose > Expression > Rule/Strategy > mapPartitions).
  *
  * [[ImpliedScnBandPushdown]] — the capture-path envelope derives the
  * transaction-window id as `scn = seq - seq % W` (ChangeFeed; the
  * reference computes windowScn the same way when batching commits,
  * DbusEventBuffer.endEvents, DbusEventBuffer.java:1982). A checkpoint
  * predicate `scn > c` therefore filters on *derived* arithmetic, which
  * parquet cannot use — the scan reads everything and filters late. But
  * the window algebra implies hard bounds on the underlying column:
  *
  *   scn = seq - seq % W  ⇒  scn ≤ seq < scn + W
  *   so   scn >  c  ⇒  seq >  c
  *        scn ≥  c  ⇒  seq ≥  c
  *        scn <  c  ⇒  seq <  c + W - 1   (seq ≤ scn + W - 1 < c + W - 1)
  *        scn ≤  c  ⇒  seq <  c + W
  *
  * The rule conjoins those implied predicates (keeping the original, which
  * still filters exactly), and Catalyst's own pushdown then drives them
  * into the scan — checkpoint-band reads on the raw feed prune row groups
  * exactly like reads on the materialized event log.
  *
  * Soundness for ANY seq sign (Java remainder keeps the dividend's sign):
  * seq ≥ 0 gives scn ≤ seq < scn + W; seq < 0 gives scn - W < seq ≤ scn.
  * Combined: `scn - W < seq < scn + W` always — the implied bounds below
  * are widened by one window so they hold regardless of sign. Bounds whose
  * `c ± W` would overflow Long are skipped (no predicate, still correct).
  */
object ImpliedScnBandPushdown extends Rule[LogicalPlan] {

  /** Matches `attr - (attr % W)` (the window-scn shape) → (attr, W). */
  private def windowScnOf(e: Expression): Option[(Expression, Long)] = e match {
    case Subtract(a, Remainder(a2, Literal(w: Long, _), _), _)
        if a.semanticEquals(a2) && w > 0 => Some((a, w))
    case Subtract(a, Remainder(a2, Literal(w: Int, _), _), _)
        if a.semanticEquals(a2) && w > 0 => Some((a, w.toLong))
    case _ => None
  }

  private def lower(a: Expression, c: Long, w: Long,
      t: org.apache.spark.sql.types.DataType): Seq[Expression] =
    // scn > c  ⇒  seq > scn - W > c - W
    if (c < Long.MinValue + w) Seq.empty
    else Seq(GreaterThan(a, Literal(c - w, t)))

  private def upper(a: Expression, c: Long, w: Long,
      t: org.apache.spark.sql.types.DataType): Seq[Expression] =
    // scn < c  ⇒  seq < scn + W < c + W
    if (c > Long.MaxValue - w) Seq.empty
    else Seq(LessThan(a, Literal(c + w, t)))

  private def implied(cond: Expression): Seq[Expression] = cond match {
    case And(l, r) => implied(l) ++ implied(r)
    case GreaterThan(e, Literal(c: Long, t)) =>
      windowScnOf(e).toSeq.flatMap { case (a, w) => lower(a, c, w, t) }
    case GreaterThanOrEqual(e, Literal(c: Long, t)) =>
      windowScnOf(e).toSeq.flatMap { case (a, w) => lower(a, c, w, t) }
    case LessThan(e, Literal(c: Long, t)) =>
      windowScnOf(e).toSeq.flatMap { case (a, w) => upper(a, c, w, t) }
    case LessThanOrEqual(e, Literal(c: Long, t)) =>
      windowScnOf(e).toSeq.flatMap { case (a, w) => upper(a, c, w, t) }
    case EqualTo(e, Literal(c: Long, t)) =>
      // two separate conjuncts (a composite And would never match the
      // flattened conjunct list and the fixed-point batch would re-add it
      // forever)
      windowScnOf(e).toSeq.flatMap { case (a, w) =>
        lower(a, c, w, t) ++ upper(a, c, w, t)
      }
    // mirrored literal-first forms
    case GreaterThan(lit: Literal, e) => implied(LessThan(e, lit))
    case LessThan(lit: Literal, e) => implied(GreaterThan(e, lit))
    case GreaterThanOrEqual(lit: Literal, e) => implied(LessThanOrEqual(e, lit))
    case LessThanOrEqual(lit: Literal, e) => implied(GreaterThanOrEqual(e, lit))
    case _ => Seq.empty
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val extra = implied(cond)
        .filterNot(e => cond.semanticEquals(e))
        .filter(_.references.subsetOf(child.outputSet))
      if (extra.isEmpty) f
      else {
        val already = splitConjuncts(cond)
        val fresh = extra.filterNot(e => already.exists(_.semanticEquals(e)))
        if (fresh.isEmpty) f
        else Filter(fresh.foldLeft(cond)(And(_, _)), child)
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}

object GraftRules {
  /** Install the engine's optimizer rules on a live session (the
    * extension-free path; `GraftExtensions` covers `spark.sql.extensions`
    * configured sessions). Idempotent. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(ImpliedScnBandPushdown))
      spark.experimental.extraOptimizations = cur :+ ImpliedScnBandPushdown
  }
}
