package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level boilerplate removal (the CCNet / RefinedWeb "line-wise
  * dedup" stage): a line that recurs across many documents — cookie
  * banners, nav menus, "subscribe" calls-to-action, copyright footers —
  * is template chrome, not content, and is stripped from EVERY document
  * it appears in while each document's unique lines survive in order.
  *
  * Scale shape (100 TB):
  *   - The corpus explodes into lines ONCE (plan-cache-persisted inside
  *     [[stripFrequentLines]]); the frequency aggregate, the anti-join
  *     and the per-doc line counts all read that one frame. The
  *     aggregate itself is a hash agg keyed by the line string with
  *     map-side partial combine — boilerplate is by definition massively
  *     repeated, so partials collapse most of the volume before the
  *     shuffle (same Zipf absorption argument as the vocab/heavy-hitter
  *     aggregates).
  *   - The frequent-line SET (lines above the document-share threshold)
  *     is tiny relative to the corpus — that is what "boilerplate"
  *     means — so the strip join is a broadcast-shaped left-anti join;
  *     no hint is forced, AQE picks broadcast from the measured size
  *     (the Semantic-join discipline).
  *   - Reassembly is one corpus-sized shuffle (group kept lines back
  *     into documents). That shuffle is inherent to any order-preserving
  *     rewrite and is the same width as the input — nothing is amplified.
  *   - The doc-share threshold is integer cross-multiplied
  *     (`n_docs * 10000 >= shareBp * N`), never a float division, so the
  *     cut is exact and external engines reproduce it verbatim.
  *
  * Blank/whitespace-only lines are never counted and never stripped:
  * removing them would collapse paragraph structure, and "empty" is not
  * boilerplate. Frequency is per-DOCUMENT (count distinct doc), so a
  * single pathological document repeating one line a million times
  * cannot promote that line into the global strip set.
  */
object Lines {

  /** (doc_id, pos, line) exploded view; `pos` is the 0-based line index
    * within the document (split with limit -1: trailing empty lines are
    * real lines). NULL text coalesces to "" FIRST — split(NULL) is NULL
    * and posexplode(NULL) yields zero rows, which would silently drop
    * the document from every downstream frame (strip output, the
    * share-threshold denominator); a NULL-text doc must instead survive
    * as one empty line, exactly like an empty-text doc. */
  def explodeLines(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(coalesce(col(textCol), lit("")), "\n", -1))
          .as(Seq("pos", "line")))

  /** Non-blank lines present in at least `shareBp` basis points of all
    * documents: (line, n_docs). The threshold compares
    * `n_docs * 10000 >= shareBp * N` in exact integer arithmetic. */
  def frequentLines(docs: DataFrame, shareBp: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    frequentFromLines(explodeLines(docs, idCol, textCol), shareBp)

  /** The frequency threshold over an ALREADY-EXPLODED (doc_id, pos,
    * line) frame — shared by [[frequentLines]] and [[stripFrequentLines]]
    * so the strip can reuse ONE exploded scan for both the aggregate and
    * the anti-join. Total-document count comes from the exploded frame
    * itself (every document yields ≥ 1 line row, split keeps trailing
    * empties, so distinct doc_id = document count). */
  private def frequentFromLines(lines: DataFrame, shareBp: Int): DataFrame = {
    require(shareBp > 0 && shareBp <= 10000, s"shareBp in (0,10000]: $shareBp")
    val total = lines.agg(countDistinct(col("doc_id")).as("__n_total"))
    lines
      .where(trim(col("line")) =!= "")
      .groupBy(col("line"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .crossJoin(total) // 1-row scalar, broadcast by construction
      .where(col("n_docs") * lit(10000L) >= lit(shareBp.toLong) * col("__n_total"))
      .select(col("line"), col("n_docs"))
  }

  /** Collapse every run of identical consecutive lines to its first
    * occurrence (the `uniq` rule: "repeat me\nrepeat me\nrepeat me" →
    * one line; multiple blank lines → one blank line) — the within-
    * document counterpart of [[stripFrequentLines]]' cross-document
    * rule.
    *
    * Scale shape: the entire op is a higher-order `filter` over the
    * split array — a pure per-row projection, ZERO shuffles, linear in
    * the scan. No corpus statistics are needed, so unlike the frequency
    * strip there is no aggregate and no join. */
  def collapseRepeatedLines(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val arr = split(col(textCol), "\n", -1)
    // pair every line with its predecessor by zipping against the
    // 1-shifted array (null-padded head = "no predecessor"), keep run
    // heads (predecessor null or different), drop the null markers.
    // zip_with's lambda binds only its own variables — an indexed
    // filter lambda referencing the outer array expression mis-binds
    // under Catalyst's lambda resolution (observed: element_at probing
    // a different row's array length)
    val shifted = concat(array(lit(null).cast("string")),
      slice(arr, lit(1), size(arr) - 1))
    val marked = zip_with(arr, shifted,
      (x, p) => when(p.isNull.or(x =!= p), x))
    val kept = filter(marked, x => x.isNotNull)
    docs.select(col(idCol).cast("long").as("doc_id"),
      concat_ws("\n", kept).as("text"),
      (size(arr) - size(kept)).cast("long").as("n_collapsed"))
  }

  /** Strip every frequent line from every document, preserving the order
    * of surviving lines. Output: (doc_id, text, n_kept, n_dropped) — a
    * document whose every line was boilerplate survives with empty text
    * (dropping rows would silently change corpus membership; the caller
    * decides what to do with empty husks). */
  def stripFrequentLines(docs: DataFrame, shareBp: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // ONE exploded scan feeds the frequency aggregate, the anti-join AND
    // the per-doc line counts (persisted via the plan-keyed cache — the
    // earlier form exploded the corpus twice and scanned it a third time
    // for line counts; Catalyst does not share duplicated explode
    // subtrees across separate consumers)
    val lines = PlanCache.getOrPersist(docs, s"lines|$idCol|$textCol",
      explodeLines(docs, idCol, textCol))
    val freq = frequentFromLines(lines, shareBp).select("line")
    val kept = lines.join(freq, Seq("line"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line"))).as("text"),
        count(lit(1)).as("n_kept"))
    lines.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("__n_lines"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text"), lit("")).as("text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }
}
