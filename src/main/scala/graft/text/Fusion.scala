package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — combining a lexical ranking
  * ([[Bm25.topKBatch]]) with a semantic one (the ANN tier in
  * [[graft.similarity.Similarity]]) is the standard production retrieval
  * shape: BM25 catches exact terminology ANN smooths over, embeddings
  * catch paraphrase BM25 is blind to.
  *
  * Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR '09) needs
  * only the RANKS, not the incomparable raw scores:
  * `rrf(d) = Σ_rankers 1/(c + rank_r(d))`, `c = 60` per the paper. A doc
  * missing from one ranker contributes 0 from it — no score
  * normalization, no tuning.
  */
object Fusion {

  /** Fuse two per-query rankings, each carrying `(query_id, doc_id, rnk)`
    * (any extra columns ignored), into the top-`k` per query by RRF
    * score (rounded at 6 for cross-engine-stable ordering, doc-id ties
    * ascending).
    *
    * Scale shape: both inputs are already workload-sized (queries × k
    * rows — the OUTPUT of retrieval, never a corpus); the fusion is one
    * full-outer equi-join on (query, doc) plus the bounded-heap top-k
    * merge. Fusing R rankers is a fold of this pairwise form.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, c: Double = 60.0): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    require(k >= 1, s"k must be >= 1, got $k")
    require(c > 0.0, s"rrf constant must be positive, got $c")
    def contrib(df: DataFrame, out: String): DataFrame =
      df.select(col("query_id"), col("doc_id"),
        (lit(1.0) / (lit(c) + col("rnk").cast("double"))).as(out))
    val fused = contrib(a, "__ra")
      .join(contrib(b, "__rb"), Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        round(coalesce(col("__ra"), lit(0.0)) + coalesce(col("__rb"), lit(0.0)), 6)
          .as("rrf_score"))
    val agg = graft.plans.TopKByScore(
      ColumnBridge.expression(col("rrf_score")),
      ColumnBridge.expression(col("doc_id")), k)
    fused.groupBy(col("query_id"))
      .agg(ColumnBridge.column(agg.toAggregateExpression()).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.id").as("doc_id"),
        col("t.score").as("rrf_score"), (col("pos") + 1).cast("int").as("rnk"))
  }
}
