package graft.sampling

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-selection importance weighting (DSIR-style, arXiv:2302.03169):
  * score every source document by how much more likely its tokens are
  * under a TARGET domain's unigram distribution than under the source
  * corpus's own — the standard cheap way to up-sample "looks like the
  * domain I care about" text out of a web-scale crawl without a trained
  * classifier.
  *
  * `weight(d) = mean over tokens w of [ ln p_target(w) − ln p_source(w) ]`
  * with add-one smoothing over the SOURCE vocabulary (target-unseen terms
  * get count 0 and stay finite through the smoothing).
  *
  * Scale shape: one tokenize+explode pass per corpus; both frequency
  * frames are vocabulary-sized aggregates; the source token stream joins
  * its own frequency frame on the shuffle it already needs, picks up the
  * (much smaller) target frequencies via a second vocabulary-keyed join,
  * and the three scalars (totals + vocab size) ride in as one broadcast
  * cross-join. Nothing rescans text; no stage's shuffle exceeds the token
  * frame that feeds the per-doc mean.
  */
object Importance {

  /** Per-source-document log-likelihood ratio under target vs source
    * unigram LMs. Emits `(doc_id, log_ratio, n_tokens)`; positive means
    * "more target-like than average source text".
    */
  def logRatioWeights(source: DataFrame, target: DataFrame,
      id: Column, text: Column): DataFrame = {
    val tokS = source.select(id.as("doc_id"),
      explode(TextAnalysis.tokens(text)).as("term"))
    val tokT = target.select(explode(TextAnalysis.tokens(text)).as("term"))
    val freqS = tokS.groupBy(col("term")).agg(count(lit(1)).as("__cs"))
    // materialized once: the vocabulary frame feeds both the scalar
    // totals and the broadcast join — without this the target corpus
    // would tokenize twice
    val freqT = tokT.groupBy(col("term")).agg(count(lit(1)).as("__ct"))
      .localCheckpoint(true)
    // fail fast: an empty target (bad domain-sample filter) would flow
    // null totals through log() and emit null weights for EVERY doc —
    // garbage the pipeline would proceed on instead of surfacing
    require(!freqT.isEmpty,
      "importance weighting needs a non-empty target corpus")
    // smoothing denominator constants: source vocab size (one row each)
    val scal = freqS.agg(sum(col("__cs")).as("__ts"),
        count(lit(1)).as("__v"))
      .crossJoin(broadcast(freqT.agg(sum(col("__ct")).as("__tt"))))
    val pT = (coalesce(col("__ct"), lit(0L)).cast("double") + lit(1.0)) /
      (col("__tt").cast("double") + col("__v").cast("double"))
    val pS = (col("__cs").cast("double") + lit(1.0)) /
      (col("__ts").cast("double") + col("__v").cast("double"))
    // the target is by construction a small domain sample, so its
    // vocabulary frame broadcasts — the token stream shuffles ONCE (for
    // its own frequency join), never a second time
    tokS.join(freqS, "term")
      .join(broadcast(freqT), Seq("term"), "left")
      .crossJoin(broadcast(scal))
      .groupBy(col("doc_id"))
      .agg(round(avg(log(pT) - log(pS)), 6).as("log_ratio"),
        count(lit(1)).as("n_tokens"))
  }

  /** Freshness-decayed sample weights with the Kish effective-sample-size
    * diagnostic, per group: weight = 2^(−age/halfLife) (exp of a single
    * Scala-literal rate, shared with the oracle), then
    * `ess = (Σw)² / Σw²` — the number of EQUAL-WEIGHT rows this weighted
    * group is worth. Recency weighting is a standard curation knob; ESS
    * is what keeps it honest: a source whose ess_ratio collapses is one
    * whose data is effectively all stale, and a downstream average over
    * it carries far less evidence than its row count claims.
    *
    * One grouped aggregate (three map-side-combinable sums), per-row exp
    * — |groups|-sized output, rounds at 6 dp (the sums are merge-order
    * aggregates; exp is within 1 ulp on both engines).
    */
  /** Freshness decay weight 2^(−age/halfLife) — the shared builder
    * behind [[freshnessEss]] and the `freshness_weight` SQL function so
    * the two surfaces can never drift: ln(0.5)/halfLife is the same IEEE
    * double division whether Catalyst constant-folds it (literal
    * halfLife) or the driver computes it, and `SUM(w)²/SUM(w·w)` over
    * this column IS the x203 Kish ESS in pure SQL. Null (no weight, not
    * a sign-flipped one) when halfLife ≤ 0 — the public SQL surface has
    * no `require` to catch it.
    */
  def freshnessWeight(ageDays: Column, halfLifeDays: Column): Column = {
    val hl = halfLifeDays.cast("double")
    when(hl > 0.0, exp(lit(math.log(0.5)) / hl * ageDays.cast("double")))
  }

  def freshnessEss(df: DataFrame, group: Column, ageDays: Column,
      halfLifeDays: Double): DataFrame = {
    require(halfLifeDays > 0, s"halfLifeDays must be > 0, got $halfLifeDays")
    val w = freshnessWeight(ageDays, lit(halfLifeDays))
    df.select(group.as("group"), w.as("__w"))
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n"),
        sum(col("__w")).as("__sw"),
        sum(col("__w") * col("__w")).as("__sw2"))
      .select(col("group"), col("n"),
        round(col("__sw"), 6).as("sum_w"),
        // weights can underflow exp to exactly 0 at extreme ages — an
        // all-zero-weight group reads NULL, not an ANSI crash
        round(when(col("__sw2") =!= 0.0,
          col("__sw") * col("__sw") / col("__sw2")), 6).as("ess"),
        round(when(col("__sw2") =!= 0.0,
          col("__sw") * col("__sw") / col("__sw2") /
            col("n").cast("double")), 6).as("ess_ratio"))
  }

  /** Clipped-importance-sampling diagnostics per group: clip weights at
    * their per-group p-quantile and report the Kish ESS before and
    * after — the standard variance/bias dial read before any weighted
    * estimate is trusted. A handful of huge weights can collapse ESS to
    * single digits while the row count claims thousands; clipping trades
    * a bounded bias (`mass_ratio`, the kept fraction of total weight —
    * the estimate can shift by at most 1 − mass_ratio of its range) for
    * the variance the ESS gain measures. `clipped_frac` says how many
    * rows actually hit the ceiling — a high gain from clipping 0.1 % of
    * rows is the classic heavy-tail signature.
    *
    * Determinism: weights round at 6 on entry; the clip threshold is the
    * exact per-group percentile of those rounded weights, itself rounded
    * at 6 (quantile_cont ↔ exact percentile, the a08 pairing), so
    * `least(w, clip)` compares identical doubles cross-engine. Sums
    * round at 6 on output (the [[freshnessEss]] discipline).
    *
    * Scale shape: one exact-percentile pass and one moments pass —
    * two keyed shuffles (percentile_approx at the 100 TB tier, as
    * [[graft.analytics.Aggregates.describe]] documents); the
    * |groups|-sized clip frame joins back on the group key.
    */
  def clippedEss(df: DataFrame, group: Column, weight: Column,
      p: Double = 0.95): DataFrame = {
    require(p > 0 && p < 1, s"p must be in (0,1), got $p")
    val v = df.select(group.as("group"),
        round(weight.cast("double"), 6).as("__w"))
      .filter(col("__w").isNotNull)
    val clip = v.groupBy(col("group"))
      .agg(count(lit(1)).as("n"),
        round(percentile(col("__w"), lit(p)), 6).as("clip"))
    v.join(clip, Seq("group"))
      .withColumn("__wc", least(col("__w"), col("clip")))
      .groupBy(col("group"))
      .agg(max(col("n")).as("n"), max(col("clip")).as("clip"),
        sum(col("__w")).as("__sw"),
        sum(col("__w") * col("__w")).as("__sw2"),
        sum(col("__wc")).as("__sc"),
        sum(col("__wc") * col("__wc")).as("__sc2"),
        sum(when(col("__w") > col("clip"), 1L).otherwise(0L))
          .as("n_clipped"))
      .select(col("group"), col("n"), col("clip"),
        // an all-zero-weight group has no ESS or mass ratio — NULL, not
        // an ANSI divide-by-zero crash
        round(when(col("__sw2") =!= 0.0,
          col("__sw") * col("__sw") / col("__sw2")), 6).as("ess_raw"),
        round(when(col("__sc2") =!= 0.0,
          col("__sc") * col("__sc") / col("__sc2")), 6).as("ess_clipped"),
        col("n_clipped"),
        round(col("n_clipped").cast("double") / col("n").cast("double"),
          6).as("clipped_frac"),
        round(when(col("__sw") =!= 0.0, col("__sc") / col("__sw")), 6)
          .as("mass_ratio"))
  }
}
