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

  /** Truncated rank-biased overlap (Webber, Moffat & Zobel, TOIS 2010)
    * between two per-query top-`k` rankings — the AGREEMENT meter for the
    * rankings [[rrfFuse]] fuses: "how much do lexical and semantic
    * retrieval see the same list?", top-weighted so swapping ranks 1–2
    * costs far more than 9–10 (which plain set overlap can't express).
    *
    * RBO@k = (1−p) Σ_{d=1..k} p^{d−1}·|A₁..d ∩ B₁..d|/d. An item in both
    * lists at ranks (ra, rb) is inside both depth-d prefixes iff
    * d ≥ max(ra, rb), so each shared item contributes the closed tail
    * (1−p)·Σ_{d=max(ra,rb)}^{k} p^{d−1}/d independently — one equi-join
    * on (query, doc) and a ≤ k-term generated-sequence fold per matched
    * row, no prefix materialization. `p` defaults to 0.5: every power is
    * an exact binary double, so both engines fold identical terms in
    * identical ascending-d order and the sum is bit-reproducible.
    *
    * Scale shape: workload-sized like [[rrfFuse]] — inputs are retrieval
    * OUTPUTS (queries × k rows); one inner join plus a per-query sum.
    * Queries in `a` with zero overlap emit rbo = 0, overlap = 0.
    */
  def rbo(a: DataFrame, b: DataFrame, k: Int, p: Double = 0.5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(p > 0.0 && p < 1.0, s"p must be in (0, 1), got $p")
    def side(df: DataFrame, out: String): DataFrame =
      df.select(col("query_id"), col("doc_id"),
        col("rnk").cast("int").as(out)).filter(col(out) <= k)
    val shared = side(a, "__ra").join(side(b, "__rb"),
        Seq("query_id", "doc_id"))
      .withColumn("__m", greatest(col("__ra"), col("__rb")))
      .withColumn("__w", aggregate(
        sequence(col("__m"), lit(k)), lit(0.0),
        (acc, dd) => acc +
          pow(lit(p), dd.cast("double") - 1.0) / dd.cast("double")))
    side(a, "__ra").select(col("query_id")).distinct()
      .join(shared.groupBy(col("query_id"))
          .agg(count(lit(1)).as("overlap"), sum(col("__w")).as("__ws")),
        Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("overlap"), lit(0L)).as("overlap"),
        round(coalesce(col("__ws"), lit(0.0)) * (1.0 - p), 6).as("rbo"))
  }
}
