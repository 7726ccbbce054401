package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-class naive-Bayes / log-likelihood-ratio quality classifier — the
  * "train a cheap linear classifier on labeled seed sets, score the whole
  * crawl" pattern (GPT-3's WebText-vs-CommonCrawl filter, CCNet's quality
  * buckets; ref `Solar_Processing.py` has no analog — this is the
  * LLM-curation tier). Unlike [[graft.sampling.Importance]] (which scores a
  * corpus against a single target LM and its OWN counts), this trains a
  * standalone per-term weight table from POSITIVE and NEGATIVE seed sets and
  * scores a third, disjoint corpus against it — including tokens the model
  * has never seen.
  *
  * Model: per term `w`, `llr(w) = ln p(w|pos) − ln p(w|neg)` with add-one
  * smoothing over the UNION vocabulary `V` of both seed sets:
  * `p(w|pos) = (c_pos(w)+1)/(t_pos+|V|)`. A scored token absent from `V`
  * gets the smoothed-zero constant `ln((t_neg+|V|)/(t_pos+|V|))` (both
  * numerators are 1). A document's score is the MEAN token llr; positive
  * means "looks like the positive seeds".
  *
  * Scale shape: each seed set is tokenized exactly once into a
  * vocabulary-sized frequency frame; the model is their one full-outer
  * join. Seed sets are small by construction (curated samples), so the
  * model frame broadcasts into the corpus token stream — the corpus is ONE
  * tokenize→explode pass with a broadcast probe and a per-doc aggregate,
  * no corpus-side vocabulary shuffle at all (cheaper than DSIR, which must
  * join the corpus's own frequency frame). The three smoothing scalars
  * ride in one broadcast cross-join.
  */
object Classifier {

  /** Train the weight table from labeled seed sets. Emits one row per
    * union-vocabulary term: `(term, llr)`, with `llr` left as an exact
    * double. [[trainLlr]] and [[scoreLlr]] both evaluate [[llrCol]], the
    * single source of truth for the smoothed ratio — the two faces cannot
    * drift.
    */
  def trainLlr(pos: DataFrame, neg: DataFrame, text: Column): DataFrame = {
    val m = model(pos, neg, text)
    val s = scalars(m)
    m.select(col("term"), llrCol(s).as("llr"))
  }

  /** Score a corpus against a [[trainLlr]]-equivalent model built from the
    * given seed sets. Emits `(doc_id, llr_score, n_tokens, is_positive)`
    * for every corpus document; out-of-vocabulary tokens contribute the
    * smoothed-zero constant, so empty-intersection docs still score (they
    * land exactly on the prior odds, not on null).
    */
  def scoreLlr(corpus: DataFrame, id: Column, text: Column,
      pos: DataFrame, neg: DataFrame): DataFrame = {
    val m = model(pos, neg, text)
    val s = scalars(m)
    // the model is seed-vocabulary-sized (curated samples, not the crawl):
    // broadcast it so the corpus token stream is probed at the scan and
    // the only corpus shuffle is the per-doc aggregate. A corpus term
    // absent from the model leaves BOTH count columns null via the left
    // join (in-vocab rows carry non-null counts, zero where one side
    // lacks the term) — the OOV test below relies on that.
    corpus.select(id.as("doc_id"),
        explode(TextAnalysis.tokens(text)).as("term"))
      .join(broadcast(m), Seq("term"), "left")
      .withColumn("__llr",
        when(col("__cp").isNull && col("__cn").isNull, oovCol(s))
          .otherwise(llrCol(s)))
      .groupBy(col("doc_id"))
      .agg(round(avg(col("__llr")), 6).as("llr_score"),
        count(lit(1)).as("n_tokens"))
      .withColumn("is_positive", col("llr_score") > 0.0)
  }

  /** Union-vocabulary model frame `(term, __cp, __cn)` in ONE aggregation:
    * the two seed sets union with a side tag and tokenize in the same
    * job, and the per-side counts are conditional aggregates — no
    * separate per-side count frames, no full-outer join. Checkpointed
    * eagerly: it feeds the scalar totals and the scoring/weight
    * projection and must not re-tokenize. `localCheckpoint` blocks live
    * on executors and are lost on executor failure (unlike a reliable
    * checkpoint) — acceptable for seed-sized frames, but rerun training
    * rather than relying on recovery under dynamic allocation.
    */
  private def model(pos: DataFrame, neg: DataFrame, text: Column): DataFrame =
    pos.select(lit(true).as("__pos"), explode(TextAnalysis.tokens(text)).as("term"))
      .unionByName(neg.select(lit(false).as("__pos"),
        explode(TextAnalysis.tokens(text)).as("term")))
      .groupBy(col("term"))
      .agg(count(when(col("__pos"), 1)).as("__cp"),
        count(when(!col("__pos"), 1)).as("__cn"))
      .localCheckpoint(true)

  /** Collected smoothing constants: total pos/neg tokens and the union
    * vocabulary size. ONE action over the checkpointed model frame — it
    * doubles as the fail-fast check (a seed set that is empty, or
    * tokenizes to nothing, shows up as a zero total; every llr would then
    * be the same constant and the classifier a coin — surface the bad
    * label filter instead). Totals are token counts, far below 2^53, so
    * folding them into double literals is exact.
    */
  private case class Scalars(tp: Long, tn: Long, v: Long)

  private def scalars(m: DataFrame): Scalars = {
    val r = m.agg(sum(col("__cp")).as("__tp"), sum(col("__cn")).as("__tn"),
        count(lit(1)).as("__v"))
      .head()
    val s = Scalars(
      if (r.isNullAt(0)) 0L else r.getLong(0),
      if (r.isNullAt(1)) 0L else r.getLong(1),
      r.getLong(2))
    require(s.tp > 0 && s.tn > 0,
      "LLR training needs positive AND negative seed sets with at least one token each")
    s
  }

  /** The per-term smoothed ratio ln p(w|pos) − ln p(w|neg) over a model row
    * (`__cp`, `__cn`, either nullable from the full-outer join). Shared by
    * [[trainLlr]] and [[scoreLlr]]. The folded double denominators equal
    * the previous column-arithmetic form bit-for-bit (exact long→double
    * conversions, same addition), so the x79 oracle is unchanged.
    */
  private def llrCol(s: Scalars): Column =
    log((coalesce(col("__cp"), lit(0L)).cast("double") + lit(1.0)) /
        lit(s.tp.toDouble + s.v.toDouble)) -
      log((coalesce(col("__cn"), lit(0L)).cast("double") + lit(1.0)) /
        lit(s.tn.toDouble + s.v.toDouble))

  /** Smoothed-zero constant for tokens outside the union vocabulary: both
    * add-one numerators are 1, so the ratio collapses to
    * ln((t_neg+|V|)/(t_pos+|V|)).
    */
  private def oovCol(s: Scalars): Column =
    log(lit(s.tn.toDouble + s.v.toDouble) / lit(s.tp.toDouble + s.v.toDouble))
}
