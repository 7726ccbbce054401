package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TfIdf

/** Sparse all-pairs document similarity over TF-IDF vectors — the lexical
  * complement to the embedding-space candidate generators
  * ([[Similarity.cosineCandidates]] buckets dense vectors; this pairs
  * documents through the inverted term index). The DISCO/prefix-filtering
  * insight makes it tractable: terms with document frequency above
  * `maxDf` are dropped BEFORE pairing, which (a) caps every term's pair
  * fan-out at maxDf², making the self-join cost structural rather than
  * data-dependent — a stop word can never go quadratic — and (b) removes
  * exactly the terms that carry the least discrimination (their IDF ≈ 0
  * contribution is what full-vector cosine would have ignored anyway).
  * Cosine is computed over the surviving rare-term subspace.
  *
  * Determinism: weights quantize to integers at 10⁻⁴ (the
  * [[graft.analytics.Aggregates.fixedPointAvg]] construction), so the
  * per-pair product sums and per-doc norm sums are exact at any shuffle
  * merge order — and the quantization scale CANCELS in the cosine ratio,
  * leaving ~10⁻⁴-relative agreement with unquantized weights.
  *
  * Scale shape: one tokenize pass → (doc, term) counts; df as a
  * vocabulary-sized aggregate; the pair stream shuffles (term) then
  * (doc_a, doc_b) with map-side partials; norms are a doc-sized aggregate
  * broadcast-joined back. Nothing exceeds Σ_t min(df_t, maxDf)² pair rows.
  */
object SparsePairs {

  /** `(doc_a < doc_b, cosine)` for pairs sharing at least one term with
    * `df <= maxDf`, scored over that rare-term subspace, kept at
    * `cosine >= threshold` (rounded to 6 dp).
    */
  def tfidfPairs(df: DataFrame, id: Column, text: Column, maxDf: Long,
      threshold: Double): DataFrame = {
    require(maxDf >= 2, s"maxDf must be >= 2, got $maxDf")
    require(threshold >= 0.0 && threshold <= 1.0,
      s"threshold must be in [0,1], got $threshold")
    val tc = TfIdf.termCounts(df, id, text).localCheckpoint(true)
    val docFreq = tc.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    val nDocs = df.agg(count(lit(1)).as("__n"))
    // quantized rare-term weights: round(tfidf * 1e4) — exact integers
    val w = tc.join(docFreq.filter(col("__df") <= maxDf), "term")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"),
        round((col("cnt").cast("double") / col("doc_len").cast("double")) *
          log(col("__n").cast("double") / col("__df").cast("double")) * 1e4)
          .as("__w"))
      .localCheckpoint(true)
    val norms = w.groupBy(col("doc_id"))
      .agg(sqrt(sum(col("__w") * col("__w"))).as("__norm"))
    val a = w.select(col("term"), col("doc_id").as("doc_a"), col("__w").as("__wa"))
    val b = w.select(col("term"), col("doc_id").as("doc_b"), col("__w").as("__wb"))
    a.join(b, Seq("term")).filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(col("__wa") * col("__wb")).as("__dot"))
      .join(norms.select(col("doc_id").as("doc_a"), col("__norm").as("__na")), "doc_a")
      .join(norms.select(col("doc_id").as("doc_b"), col("__norm").as("__nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(col("__dot") / (col("__na") * col("__nb")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
