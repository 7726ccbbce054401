package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking: split each document into fixed-size
  * token windows with a configurable stride (overlap = chunk − stride) —
  * the preprocessing step behind both RAG passage indexes and
  * long-document training sets (a 50k-token doc becomes ~50k/stride
  * training windows rather than one truncated example).
  *
  * Scale shape: pure per-row explode — no shuffle at all; output row count
  * is `ceil(tokens/stride)` per doc, bounded by the text itself. Window
  * starts come from `sequence(0, n−1, stride)` so every token is covered;
  * the final window is allowed to run short rather than re-reading tail
  * tokens twice.
  */
object Chunking {

  /** One row per (doc, window): `(doc_id, chunk_idx, chunk_text,
    * n_chunk_tokens)`. `chunk_idx` is 0-based in document order.
    */
  def slidingChunks(df: DataFrame, id: Column, text: Column,
      chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(strideTokens >= 1 && strideTokens <= chunkTokens,
      s"strideTokens must be in [1, chunkTokens], got $strideTokens")
    val toks = TextAnalysis.tokens(text)
    df.select(id.as("doc_id"), toks.as("__toks"),
        size(toks).as("__n"))
      .select(col("doc_id"), col("__toks"), col("__n"),
        posexplode(sequence(lit(0), col("__n") - 1, lit(strideTokens))))
      .select(col("doc_id"), col("pos").as("chunk_idx"),
        concat_ws(" ", slice(col("__toks"), col("col") + 1, lit(chunkTokens)))
          .as("chunk_text"),
        least(lit(chunkTokens), col("__n") - col("col"))
          .as("n_chunk_tokens"))
  }
}
