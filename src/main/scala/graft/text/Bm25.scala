package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval over a document corpus — the lexical half of a
  * training-data curation stack (topic routing, targeted corpus slicing,
  * "find everything about X before sampling"). The reference has no search
  * tier; this is north-star LLM-pipeline surface, same family as TF-IDF
  * ([[TfIdf]]) but with the saturating term-frequency and length
  * normalization that make it usable as a ranking function.
  *
  * Scale shape: the query-term filter lands IMMEDIATELY after the explode,
  * so the only (doc, term) frame that ever shuffles is |docs matching any
  * query term| × |query terms| — not the corpus vocabulary. Document
  * frequency is an aggregate of that already-filtered frame (≤ |query
  * terms| rows) and joins back as a broadcast; corpus size N and average
  * document length avgdl are one scalar aggregate cross-joined as a
  * broadcast. Top-k plans as TakeOrderedAndProject (per-partition heaps,
  * one merge), never a global sort.
  */
object Bm25 {

  /** `idf = ln(1 + (N - df + 0.5)/(df + 0.5))` over columns `__n`/`__df` —
    * ONE definition shared by [[topK]] and [[topKBatch]] (both DuckDB
    * oracles mirror this exact tree, so the two entry points must not
    * drift).
    */
  private def idf: Column = log(lit(1.0) +
    (col("__n").cast("double") - col("__df").cast("double") + lit(0.5)) /
      (col("__df").cast("double") + lit(0.5)))

  /** `tf_norm = cnt·(k1+1)/(cnt + k1·(1 − b + b·dl/avgdl))` over columns
    * `cnt`/`doc_len`/`__avgdl`; same sharing rationale as [[idf]].
    */
  private def tfNorm(k1: Double, b: Double): Column =
    (col("cnt").cast("double") * lit(k1 + 1.0)) /
      (col("cnt").cast("double") + lit(k1) *
        (lit(1.0 - b) + lit(b) * (col("doc_len").cast("double") / col("__avgdl"))))

  /** Top-`k` documents for `queryTerms` under BM25 with the standard
    * `idf` and saturating `tf_norm` above. Ties break on doc_id so output
    * is deterministic. Emits `(doc_id, score, n_matched)`.
    */
  def topK(df: DataFrame, id: Column, text: Column, queryTerms: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    val terms = queryTerms.map(_.toLowerCase).distinct
    // (doc, query-term) counts: the isin filter sits directly on the
    // exploded column, so non-query terms never reach the aggregate
    // materialized once: tc feeds BOTH the df aggregate and the scored
    // join; it is match-sized (docs matching a query term × |terms|), not
    // corpus-sized, so the checkpoint is cheap and the corpus explode is
    // guaranteed to run a single time instead of relying on Catalyst
    // exchange reuse to dedup the shared subtree
    val tc = df.select(id.as("doc_id"),
        TextAnalysis.tokenCount(text).as("doc_len"),
        explode(TextAnalysis.tokens(text)).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("doc_len"), col("term"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    // corpus stats over ALL docs (not just matches): N and avgdl
    val stats = df.agg(count(lit(1)).as("__n"),
      avg(TextAnalysis.tokenCount(text).cast("double")).as("__avgdl"))
    val docFreq = tc.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    tc.join(broadcast(docFreq), "term")
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(round(sum(idf * tfNorm(k1, b)), 6).as("score"),
        count(lit(1)).as("n_matched"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Batch retrieval: top-`k` documents for EVERY query in a query table
    * (`query_id`, `query_text`) in one corpus pass — the production shape
    * of [[topK]], whose literal `isin` filter only fits a handful of ad-hoc
    * terms. The query table explodes to (query_id, term) pairs (tiny: a
    * query workload, not a corpus), broadcasts into the corpus token
    * stream as a semi-filtering equi-join, and per-(query, doc) scores
    * aggregate on the one shuffle. Document frequency here is corpus-wide
    * df of each query term (matching [[topK]]'s semantics); the top-k per
    * query merges through the bounded-heap aggregate, never a global sort.
    */
  def topKBatch(df: DataFrame, id: Column, text: Column, queries: DataFrame,
      queryId: Column, queryText: Column, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    require(k >= 1, s"k must be >= 1, got $k")
    // distinct (query, term) pairs; a term shared by two queries scores
    // each query independently
    val qTerms = queries.select(queryId.as("query_id"),
        explode(TextAnalysis.tokens(queryText)).as("term"))
      .distinct()
      .localCheckpoint(true)
    // materialized once, same rationale as [[topK]]'s tc: the frame feeds
    // both the corpus-wide df aggregate and the scored join, and it is
    // match-sized (query-term hits), never corpus-sized
    val tc = df.select(id.as("doc_id"),
        TextAnalysis.tokenCount(text).as("doc_len"),
        explode(TextAnalysis.tokens(text)).as("term"))
      .join(broadcast(qTerms), "term")
      .groupBy(col("query_id"), col("doc_id"), col("doc_len"), col("term"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val stats = df.agg(count(lit(1)).as("__n"),
      avg(TextAnalysis.tokenCount(text).cast("double")).as("__avgdl"))
    // corpus-wide df per term (not per query): distinct (doc, term) from
    // the already-filtered frame
    val docFreq = tc.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("__df"))
    val scored = tc.join(broadcast(docFreq), "term")
      .crossJoin(broadcast(stats))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(idf * tfNorm(k1, b)), 6).as("score"))
    val agg = graft.plans.TopKByScore(
      ColumnBridge.expression(col("score")),
      ColumnBridge.expression(col("doc_id")), k)
    scored.groupBy(col("query_id"))
      .agg(ColumnBridge.column(agg.toAggregateExpression()).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.id").as("doc_id"),
        col("t.score").as("score"), (col("pos") + 1).cast("int").as("rnk"))
  }
}
