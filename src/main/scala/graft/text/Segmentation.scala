package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Topic segmentation (TextTiling, Hearst 1997, in its block-comparison
  * form): slice each document into fixed-width token blocks, score every
  * BOUNDARY between adjacent blocks by the cosine of their term-count
  * vectors (low similarity = vocabulary shift = topic boundary), then
  * turn raw similarity into a DEPTH score — how far the boundary sits
  * below its neighborhood's similarity peaks on both sides, so a uniform
  * low-cohesion document does not fire on every gap, only on genuine
  * valleys. This is the content-aware complement to fixed-window
  * chunking ([[Chunking.slidingChunks]]): a RAG/pretraining chunker that
  * cuts at depth maxima keeps topics intact instead of splitting them
  * mid-thought.
  */
object Segmentation {

  /** Per-document boundary table: `(doc_id, boundary, sim, depth)` where
    * boundary b sits between token blocks b and b+1 (so a doc with k
    * blocks yields k−1 rows; docs under 2 blocks yield none — nothing to
    * cut). `sim` is the round-6 cosine of the adjacent blocks' term
    * vectors; `depth` is Hearst's gap depth with the ±2 neighborhood
    * peak (clamped at the document edges to the boundary itself, so
    * edge boundaries are scored by the side that exists).
    *
    * Determinism: term counts are integers, so dot products and squared
    * norms are EXACT longs; the only float ops are one sqrt and one
    * division per boundary, identical on both engines, rounded at 6
    * before the depth arithmetic (which therefore compares identical
    * doubles cross-engine).
    *
    * Scale shape: one tokenize+posexplode pass (output-proportional)
    * into a PERSISTED (doc, block, term) count frame — three consumers
    * (both join sides of the dot products, the norms) read it without
    * re-tokenizing the corpus (the [[graft.dedup.Dedup.nearDuplicates]]
    * gram-frame discipline; at 100 TB swap the persist for an explicit
    * checkpoint/table exactly as that operator documents); then a
    * SELF-equi-join on (doc, block+1, term) for the dot products —
    * keyed, never cartesian; a term appearing in both of two adjacent
    * blocks is the only thing that meets — and per-DOC windows over the
    * boundary table, which is |tokens|/w rows, partitioned by a
    * high-cardinality key. Nothing global, nothing quadratic.
    */
  def boundaries(df: DataFrame, id: Column, text: Column,
      w: Int = 20): DataFrame = {
    require(w >= 2, s"block width must be >= 2 tokens, got $w")
    val tc = df.select(id.cast("long").as("doc_id"),
        posexplode(TextAnalysis.tokens(text)).as(Seq("pos", "term")))
      .filter(col("term") =!= "")
      .withColumn("blk", (col("pos") / w).cast("long"))
      .groupBy(col("doc_id"), col("blk"), col("term"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // boundary b joins block b (left) with block b+1 (shifted to key b)
    val dot = tc.alias("a")
      .join(tc.select(col("doc_id"), (col("blk") - 1L).as("blk"),
        col("term"), col("c").as("cb")).alias("b"),
        Seq("doc_id", "blk", "term"))
      .groupBy(col("doc_id"), col("blk"))
      .agg(sum(col("c") * col("cb")).as("dot"))
    val nn = tc.groupBy(col("doc_id"), col("blk"))
      .agg(sum(col("c") * col("c")).as("nn"))
    val sims = nn.select(col("doc_id"), col("blk"), col("nn").as("n1"))
      .join(nn.select(col("doc_id"), (col("blk") - 1L).as("blk"),
        col("nn").as("n2")), Seq("doc_id", "blk"))
      .join(dot, Seq("doc_id", "blk"), "left")
      .select(col("doc_id"), col("blk").as("boundary"),
        round(coalesce(col("dot"), lit(0L)).cast("double") /
          sqrt((col("n1") * col("n2")).cast("double")), 6).as("sim"))
    val ord = Window.partitionBy(col("doc_id")).orderBy(col("boundary"))
    def peak(off1: Column, off2: Column): Column =
      greatest(coalesce(off1, col("sim")), coalesce(off2, col("sim")))
    val peakL = peak(lag(col("sim"), 1).over(ord),
      lag(col("sim"), 2).over(ord))
    val peakR = peak(lead(col("sim"), 1).over(ord),
      lead(col("sim"), 2).over(ord))
    sims.withColumn("depth",
      round(greatest(peakL - col("sim"), lit(0.0)) +
        greatest(peakR - col("sim"), lit(0.0)), 6))
  }

  /** Per-document cut report over [[boundaries]]: boundary count, the
    * deepest valley (ties to the earliest boundary), its depth, and the
    * doc's minimum inter-block similarity — the table a chunking policy
    * reads to decide WHERE to cut and whether the doc is single-topic
    * (max depth ≈ 0) at all. One grouped aggregate over the boundary
    * table; the argmax is a max-of-struct, no second pass.
    */
  def cutReport(df: DataFrame, id: Column, text: Column,
      w: Int = 20): DataFrame =
    boundaries(df, id, text, w)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_boundaries"),
        max(struct(col("depth"), (-col("boundary")).as("nb")))
          .as("__best"),
        round(min(col("sim")), 6).as("min_sim"))
      .select(col("doc_id"), col("n_boundaries"),
        (-col("__best.nb")).cast("long").as("top_boundary"),
        col("__best.depth").as("top_depth"), col("min_sim"))
}
