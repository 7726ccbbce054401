package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Inverted-index construction: per-term posting lists with document and
  * collection frequency — the artifact behind [[Bm25]]-style retrieval when
  * the index is SERVED rather than recomputed per query, and the standard
  * layout for search over a frozen training corpus.
  *
  * Scale shape: the (doc, term) frame from [[TfIdf.termCounts]] aggregates
  * once per term. The posting list itself is built by
  * [[graft.plans.TopKByScore]] keyed on negated doc id, so each map task
  * ships AT MOST `maxPostings` ids per term across the shuffle — a
  * `collect_list` + `slice` formulation would ship every (term, doc)
  * pairing of the corpus into one reducer per term before truncating,
  * which is exactly the unbounded-group hazard the bounded heap exists to
  * kill. Posting ids are delta-encoded (first id absolute, then gaps), the
  * standard compression substrate for index serving.
  */
object Postings {

  /** `(term, doc_freq, term_freq, pos, delta)`: for each term with at least
    * `minDf` distinct documents, the first `maxPostings` doc ids in
    * ascending order, delta-encoded (`pos` 0 carries the absolute first
    * id, later positions the gap to the previous id). `doc_freq`/
    * `term_freq` are the FULL corpus counts, not truncated to the emitted
    * prefix.
    */
  def postingLists(df: DataFrame, id: Column, text: Column,
      maxPostings: Int, minDf: Long): DataFrame = {
    require(maxPostings >= 1, s"maxPostings must be >= 1, got $maxPostings")
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    val tc = TfIdf.termCounts(df, id, text)
    val heap = graft.plans.TopKByScore(
      ColumnBridge.expression(-col("doc_id").cast("double")),
      ColumnBridge.expression(col("doc_id").cast("long")), maxPostings)
    val lists = tc.groupBy(col("term"))
      .agg(count(lit(1)).as("doc_freq"),
        sum(col("cnt")).as("term_freq"),
        ColumnBridge.column(heap.toAggregateExpression()).as("__topk"))
      .filter(col("doc_freq") >= minDf)
      // heap order is score desc = doc_id asc — already posting order
      .withColumn("__ids", transform(col("__topk"), t => t.getField("id")))
    lists.select(col("term"), col("doc_freq"), col("term_freq"),
      posexplode(transform(col("__ids"), (x, i) =>
        when(i === 0, x).otherwise(x - element_at(col("__ids"), i))))
        .as(Seq("pos", "delta")))
  }
}
