package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization — the canonical stateful analytics op a
  * training-data/event pipeline needs (SURVEY §2.7 flags
  * `mapGroupsWithState` for exactly this class of added operators).
  *
  * Batch form: two window functions over one shuffle on the key — a gap
  * marker (lag) and a running sum that becomes the session ordinal. Fully
  * declarative, scales as one hash partition by key.
  *
  * Streaming form: `flatMapGroupsWithState` with processing-time timeout —
  * per-key open-session state of constant size (start, last, count).
  */
object Sessions {

  /** Assign `session_seq` (0-based per key) and return per-event rows.
    * `gap` in the same unit as `tsCol`. */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      gap: Long): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    events
      .withColumn("__new_session",
        when(col(tsCol) - lag(col(tsCol), 1).over(byKey) > gap, 1L)
          .otherwise(lit(0L)))
      .withColumn("session_seq",
        sum(col("__new_session")).over(
          byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_session")
  }

  /** Collapse to one row per session: bounds + event count. */
  def sessionSummary(events: DataFrame, keyCol: String, tsCol: String,
      gap: Long): DataFrame =
    sessionize(events, keyCol, tsCol, gap)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))

  // ---- streaming form ----

  case class SessionEvent(key: Long, ts: Long)
  case class SessionState(start: Long, last: Long, n: Long)
  case class SessionOut(key: Long, session_start: Long, session_end: Long,
      n_events: Long)

  /** Streaming sessionizer: emits a session when the gap elapses — either
    * observed in arriving data (always) or via processing-time state
    * timeout (`useTimeout`, for keys that go silent; leave off in
    * synchronous tests — timeout-triggered batches re-arm forever under
    * `processAllAvailable`). At-scale state is one small record per open
    * key. */
  def sessionizeStream(events: Dataset[SessionEvent], gapMs: Long,
      useTimeout: Boolean = true): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (useTimeout) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), timeoutConf) {
        (key, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(key, s.start, s.last, s.n))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.ts - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, e.ts, s.n + 1))
                case Some(s) =>
                  closed ::= SessionOut(key, s.start, s.last, s.n)
                  cur = Some(SessionState(e.ts, e.ts, 1))
                case None =>
                  cur = Some(SessionState(e.ts, e.ts, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (useTimeout) state.setTimeoutDuration(gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}

/** As-of join — for each probe row, the latest build row with matching key
  * and build-time ≤ probe-time (backward direction, inclusive).
  *
  * Spark lacks this operator; the reference's bootstrap stitch is the
  * as-of shape (SURVEY J3: snapshot(asOf) + changes band). Implementation
  * follows preference (a) — composition: tag + union + one window with
  * `last(ignoreNulls)` over (key, time). ONE shuffle on the key, no range
  * cross-product, state per partition bounded by the window frame — this
  * is the plan a custom SparkPlan would produce anyway, minus the
  * maintenance burden.
  */
object AsOfJoin {

  /** `probe asof-left-join build`: result = probe columns + `asofCols`
    * from the latest matching build row (null when none). Time columns
    * must share a unit. */
  def asofBackward(probe: DataFrame, build: DataFrame, keyCol: String,
      probeTs: String, buildTs: String, asofCols: Seq[String]): DataFrame = {
    val probeTagged = probe
      .withColumn("__t", col(probeTs).cast("long"))
      .withColumn("__is_probe", lit(1))
      .withColumn("__ord", lit(1)) // probe sorts after build at equal t
    val buildTagged =
      build.select((Seq(col(keyCol), col(buildTs).cast("long").as("__t")) ++
        asofCols.map(c => col(c).as(s"__b_$c"))): _*)
        .withColumn("__is_probe", lit(0))
        .withColumn("__ord", lit(0))
    val unioned = probeTagged.unionByName(buildTagged, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__t"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = asofCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"__b_$c"), ignoreNulls = true).over(w))
    }
    filled.where(col("__is_probe") === 1)
      .drop(("__t" +: "__is_probe" +: "__ord" +: asofCols.map(c => s"__b_$c")): _*)
  }
}
