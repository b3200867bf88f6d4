package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sequence packing for LLM pretraining: concatenate documents (in id
  * order, within a group) and split the token stream into fixed-length
  * context windows — the concat-and-chunk layout that turns a document
  * corpus into training blocks. Each doc is tagged with its absolute
  * token offset and the chunk its first token lands in.
  *
  * Scale shape: one partitioned window (cumulative token count) per
  * group — groups (language, source, shard) bound the sort width, so no
  * global single-partition sort; token counts are codegen'd column
  * expressions. For a single giant group, pre-shard with a salt column
  * and use [[graft.operators.Bootstrap.seederChunks]]-style offset
  * composition instead.
  */
object Packing {

  /** (group, doc_id, n_tokens, tok_offset, chunk_id) per document:
    * `tok_offset` = tokens before this doc inside its group's stream,
    * `chunk_id` = tok_offset / budget.
    *
    * `tokenCounter` plugs in the tokenizer the downstream trainer uses:
    * the default is the codegen'd whitespace count; pass
    * `Bpe.tokenCount(model)` to pack against EXACT merges-table BPE
    * counts, so context windows hold what the trainer will actually see
    * (approximate counts mis-place every chunk boundary after the first
    * drifted doc). The window shuffle is identical either way — only the
    * per-row count expression changes. */
  def packChunks(docs: DataFrame, budgetTokens: Long,
      groupCol: String = "lang", idCol: String = "doc_id",
      textCol: String = "text",
      tokenCounter: Column => Column = TextFunctions.tokenCount(_))
      : DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
    val nTokens = tokenCounter(col(textCol)).cast("long")
    docs
      .select(col(groupCol), col(idCol), nTokens.as("n_tokens"))
      .withColumn("tok_offset",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("chunk_id", expr(s"tok_offset div $budgetTokens"))
  }

  /** Chunk-level view: how many docs and tokens land in each context
    * window (straddling docs count toward the chunk they start in). */
  def chunkStats(packed: DataFrame, groupCol: String = "lang"): DataFrame =
    packed.groupBy(col(groupCol), col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        min(col("tok_offset")).as("first_offset"))

  /** Sliding context windows WITHIN each document: `window` tokens per
    * chunk advancing by `stride` (stride < window ⇒ overlap — the RAG /
    * long-context training layout where adjacent chunks share context).
    * Chunk starts are 0, stride, 2·stride, … while start < n_tokens; the
    * last chunk clips at the document end. Emits one row per chunk with
    * its token span and text.
    *
    * Scale shape: a single narrow explode (documents → chunks), no
    * shuffle at all — chunk extraction is a codegen'd slice per row. */
  def slidingChunks(docs: DataFrame, window: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window (got window=$window stride=$stride)")
    val toks = TextFunctions.tokens(col(textCol))
    // number of chunks = ceil(max(n - window, 0) / stride) + 1
    val nChunks = (ceil(greatest(col("n_tokens") - window, lit(0))
      .cast("double") / stride).cast("int") + 1)
    docs
      .select(col(idCol).as("doc_id"), toks.as("t"),
        size(toks).as("n_tokens"))
      .select(col("doc_id"), col("t"), col("n_tokens"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => i * stride)))
      .select(col("doc_id"),
        col("pos").as("chunk_idx"),
        col("col").cast("long").as("tok_start"),
        least(lit(window), col("n_tokens") - col("col")).cast("long")
          .as("tok_len"),
        concat_ws(" ", slice(col("t"), col("col") + 1, lit(window)))
          .as("chunk_text"))
  }
}
