package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-quality measurement over scored corpora — the evaluation
  * tier a quality-gate pipeline needs before it trusts a score column:
  * ranking power (AUC) and probability honesty (reliability table / ECE).
  * A filter threshold chosen from an uncalibrated or non-discriminating
  * score silently reshapes the corpus (x103's gate-bias audit measures the
  * damage; these two measure the score itself).
  *
  * Both work on a QUANTIZED score domain (6 decimals — the repo-wide
  * rounding grain): after `groupBy(score)` the frames are bounded by the
  * score domain (≤ 2·10⁶ distinct values for a [0,1] probability), not by
  * the corpus, so the ordered pass that ranking needs runs over a
  * vocabulary-sized frame at any corpus size.
  */
object Evaluation {

  /** Area under the ROC curve via the Mann-Whitney rank-sum with midrank
    * tie handling — exact, not trapezoid-approximated: AUC =
    * (R⁺ − P(P+1)/2) / (P·N) where R⁺ is the positives' rank sum using
    * average ranks for tied scores.
    *
    * Scale shape: one corpus aggregate to per-score (n, positives) blocks
    * — the only corpus-sized pass, map-side combinable — then one ordered
    * window over the bounded score domain. All rank arithmetic is LONG in
    * half-rank units (2·rank is always integral, ties included), so the
    * rank sum is exact at any accumulation order; the single division at
    * the end is the only floating step.
    *
    * `label` must be 0/1 (booleans cast); rows with a null score or label
    * are excluded and reported in `n_null` so a gate can assert on them.
    */
  def auc(df: DataFrame, score: Column, label: Column): DataFrame = {
    val s = round(score.cast("double"), 6)
    val y = label.cast("int")
    val rows = df.select(s.as("__s"), y.as("__y"))
    val blocks = rows
      .filter(col("__s").isNotNull && col("__y").isNotNull)
      .withColumn("__y", when(col("__y") === 0 || col("__y") === 1, col("__y"))
        .otherwise(raise_error(concat(lit("auc: label must be 0/1, got "),
          col("__y").cast("string")))))
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__p"))
    val before = Window.orderBy(col("__s").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = blocks
      .withColumn("__cum", coalesce(sum(col("__n")).over(before), lit(0L)))
      // midrank of the tied block in HALF-RANK units: 2·cum + n + 1
      .withColumn("__rp2", col("__p") * (lit(2L) * col("__cum") + col("__n") + 1L))
    val nulls = rows.filter(col("__s").isNull || col("__y").isNull)
      .agg(count(lit(1)).as("n_null"))
    ranked
      .agg(sum(col("__rp2")).as("__rp2"), sum(col("__p")).as("n_pos"),
        sum(col("__n") - col("__p")).as("n_neg"))
      .crossJoin(broadcast(nulls))
      .select(col("n_pos"), col("n_neg"), col("n_null"),
        round((col("__rp2") - col("n_pos") * (col("n_pos") + 1L)).cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")), 6).as("auc"))
  }

  /** Per-group [[auc]] — the fairness/robustness slice: a score with a
    * healthy global AUC can still rank NOISE inside one source or
    * language (Simpson's reversal), and that group is exactly where a
    * global threshold does silent damage. Groups where one class is
    * absent report a null AUC (undefined, not 0.5 — the caller decides).
    *
    * Same shape as [[auc]] with the window partitioned by group: the
    * per-(group, score) aggregate is the only corpus-sized pass, and each
    * window partition is one group's bounded score domain.
    */
  def aucBy(df: DataFrame, group: Column, score: Column,
      label: Column): DataFrame = {
    val s = round(score.cast("double"), 6)
    val blocks = df
      .select(group.as("grp"), s.as("__s"), label.cast("int").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
      .withColumn("__y", when(col("__y") === 0 || col("__y") === 1, col("__y"))
        .otherwise(raise_error(concat(lit("aucBy: label must be 0/1, got "),
          col("__y").cast("string")))))
      .groupBy(col("grp"), col("__s"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__p"))
    val before = Window.partitionBy(col("grp")).orderBy(col("__s").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    blocks
      .withColumn("__cum", coalesce(sum(col("__n")).over(before), lit(0L)))
      .withColumn("__rp2", col("__p") * (lit(2L) * col("__cum") + col("__n") + 1L))
      .groupBy(col("grp"))
      .agg(sum(col("__p")).as("n_pos"), sum(col("__n") - col("__p")).as("n_neg"),
        sum(col("__rp2")).as("__rp2"))
      .select(col("grp"), col("n_pos"), col("n_neg"),
        round(when(col("n_pos") > 0 && col("n_neg") > 0,
          (col("__rp2") - col("n_pos") * (col("n_pos") + 1L)).cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg"))), 6).as("auc"))
  }

  /** NDCG@k of a ranking against graded relevance: per query, the
    * discounted cumulative gain of the retrieved top-k
    * (`Σ (2^rel − 1) / log₂(pos + 1)`) normalized by the ideal DCG (the
    * same sum over the k highest-relevance documents) — the standard
    * graded retrieval metric that recall@k flattens (recall treats a
    * rank-1 hit and a rank-10 hit alike; NDCG does not). Queries with no
    * relevant documents report a null NDCG (undefined, not 0).
    *
    * `ranked` is `(query_id, doc_id, rnk)` (any ranker — BM25, ANN, RRF);
    * `rels` is `(query_id, doc_id, rel)` with rel ≥ 0, docs absent from
    * `rels` counting as rel 0. Both are match-sized, not corpus-sized.
    *
    * Determinism: dcg and idcg are rounded at 6 BEFORE the ndcg division,
    * so both engines divide identical quantities; rel ties in the ideal
    * ordering cannot change idcg (equal rel ⇒ equal gain at the swapped
    * positions' boundary — the sum only depends on the rel multiset of
    * the top k, and the (rel desc, doc_id) order pins that multiset).
    *
    * Scale: the ideal window partitions per query over that query's
    * relevant set; a query whose relevant set is corpus-sized (stopword
    * queries) should pre-cap `rels` with the bounded-heap top-k
    * ([[graft.plans.TopKByScore]]) before calling.
    */
  def ndcg(ranked: DataFrame, rels: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    def gain(rel: Column, pos: Column): Column =
      (pow(lit(2.0), rel.cast("double")) - 1.0) /
        log2(pos.cast("double") + 1.0)
    val dcg = ranked.filter(col("rnk") <= k)
      .join(rels, Seq("query_id", "doc_id"), "left")
      .groupBy(col("query_id"))
      .agg(round(sum(gain(coalesce(col("rel"), lit(0L)), col("rnk"))), 6)
        .as("dcg"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("doc_id"))
    val ideal = rels.withColumn("__pos", row_number().over(w))
      .filter(col("__pos") <= k)
      .groupBy(col("query_id"))
      .agg(round(sum(gain(col("rel"), col("__pos"))), 6).as("idcg"))
    dcg.join(ideal, Seq("query_id"), "left")
      .select(col("query_id"), col("dcg"), col("idcg"),
        round(when(col("idcg") > 0, col("dcg") / col("idcg")), 6).as("ndcg"))
  }

  /** Reliability table: equal-width probability bins with per-bin count,
    * mean predicted confidence, observed positive rate, the |gap|, and the
    * bin's ECE contribution (`n/N · gap` — the table sums to the expected
    * calibration error). The "is 0.9 really 90%?" audit behind choosing a
    * quality-gate threshold from a classifier probability.
    *
    * Binning is INTEGER arithmetic on the 1e-6-quantized score
    * (`pu·bins / 10⁶`, clamped to the top bin at p = 1.0), so a boundary
    * score lands in the same bin on every engine — `floor(p·bins)` on
    * doubles does not guarantee that (0.3·10 floors to 2 in IEEE). Mean
    * confidence divides the exact integer micro-unit sum, so it is
    * accumulation-order-independent too. One corpus aggregate; everything
    * after is |bins| rows.
    */
  def calibration(df: DataFrame, prob: Column, label: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val pu = round(prob.cast("double") * 1e6, 0).cast("long")
    val guarded = when(pu.between(0L, 1000000L), pu)
      .otherwise(raise_error(concat(
        lit("calibration: probability outside [0,1]: "), prob.cast("string"))))
    // pu·bins ≤ 10⁷ is exactly representable, and the true quotient is
    // never within 1e-7 (relative) of an integer it isn't equal to, so
    // the double division + floor is the exact integer division on both
    // engines (long `/` in Spark is double division — floor pins it)
    val bin = least(floor(guarded * bins / lit(1000000L)), lit(bins - 1L))
      .cast("int")
    val perBin = df
      .select(bin.as("bin"), guarded.as("__pu"), label.cast("int").as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__pu")).as("__su"),
        sum(col("__y")).as("__pos"))
    val total = perBin.agg(sum(col("n")).as("__tot"))
    perBin.crossJoin(broadcast(total))
      .select(col("bin"), col("n"),
        round(col("__su").cast("double") / (col("n") * 1e6), 6).as("mean_conf"),
        round(col("__pos").cast("double") / col("n"), 6).as("pos_rate"),
        round(abs(col("__su").cast("double") / (col("n") * 1e6) -
          col("__pos").cast("double") / col("n")), 6).as("gap"),
        round(abs(col("__su").cast("double") / (col("n") * 1e6) -
          col("__pos").cast("double") / col("n")) *
          col("n").cast("double") / col("__tot"), 6).as("ece_term"))
  }

  /** Per-group Cohen's kappa between two categorical labelings — the
    * chance-corrected agreement that tells a labeling pipeline whether
    * two annotators (a heuristic vs a gold column, two classifier
    * versions, model vs human) agree BEYOND what their marginal label
    * rates would produce by luck. Raw accuracy flatters any pair that
    * both emit the majority label; kappa is the honest version (0 =
    * chance, 1 = perfect, < 0 = systematic disagreement).
    *
    * Exact-integer formulation: with per-cell counts n_ab over the label
    * grid, `kappa = (N·Σn_kk − Σ_k row_k·col_k) / (N² − Σ_k row_k·col_k)`
    * — every term a long (budget: N² < 2⁶³, i.e. groups up to ~3·10⁹
    * rows), so the single final division is the only floating step and
    * the result is bit-identical at any partitioning. Null kappa when
    * the denominator is 0 (both raters constant and identical — 0/0).
    *
    * Scale shape: ONE corpus-sized aggregate to (group, a, b) cells
    * (map-side combinable); marginals, the diagonal, and the expected
    * term are |groups|·|labels|-sized frames joined on the group key.
    */
  def kappaBy(df: DataFrame, group: Column, raterA: Column,
      raterB: Column): DataFrame = {
    val cells = df.select(group.as("grp"), raterA.cast("string").as("a"),
        raterB.cast("string").as("b"))
      .groupBy(col("grp"), col("a"), col("b")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val n = cells.groupBy(col("grp")).agg(sum(col("c")).as("n"))
    val diag = cells.filter(col("a") === col("b"))
      .groupBy(col("grp")).agg(sum(col("c")).as("agree"))
    // rename the self-join keys on one side: both marginals descend from
    // `cells`, so df("grp") === df2("grp") would resolve to the SAME
    // attribute (a trivially-true predicate, not a join key)
    val rows = cells.groupBy(col("grp").as("__rg"), col("a").as("__rl"))
      .agg(sum(col("c")).as("ra"))
    val cols = cells.groupBy(col("grp"), col("b")).agg(sum(col("c")).as("cb"))
    val exp = rows.join(cols, col("__rg") === col("grp") &&
        col("__rl") === col("b"))
      .groupBy(col("grp")).agg(sum(col("ra") * col("cb")).as("e"))
    // left joins: a group can lack any agreeing cell (agree = 0) or any
    // label present in BOTH marginals (e = 0 — raters' label sets disjoint)
    n.join(diag, Seq("grp"), "left").na.fill(0L, Seq("agree"))
      .join(exp, Seq("grp"), "left").na.fill(0L, Seq("e"))
      .select(col("grp").as("group"), col("n"), col("agree"),
        round(col("agree").cast("double") / col("n"), 6).as("po"),
        round(col("e").cast("double") / (col("n") * col("n")), 6).as("pe"),
        when(col("n") * col("n") - col("e") =!= 0L,
          round((col("n") * col("agree") - col("e")).cast("double") /
            (col("n") * col("n") - col("e")).cast("double"), 6))
          .as("kappa"))
  }

  /** Krippendorff's alpha (nominal) over LONG-FORMAT ratings `(item,
    * rating)` — the agreement coefficient [[kappaBy]] can't be: any
    * number of raters, MISSING ratings allowed (items keep whatever
    * subset of raters labeled them), one number for the whole labeling
    * campaign. α = 1 − D_o/D_e with observed disagreement
    * D_o = Σᵢ (mᵢ² − Σ_c nᵢ_c²)/(mᵢ−1) / N and expected
    * D_e = (N² − Σ_c N_c²)/(N(N−1)), over items with mᵢ ≥ 2 ratings
    * (single-rating items carry no agreement information and are
    * excluded from BOTH sides, per the estimator).
    *
    * Everything is integer until the two final divisions: per-item and
    * per-class counts, their squares, and N are exact longs (square
    * budget: Σnᵢ_c² < 2⁶³ holds to ~3·10⁹ ratings per item/class).
    *
    * Scale shape: one (item, rating) count aggregate (map-side
    * combinable), an item-sized moment frame, a |classes|-sized marginal
    * — no window, no join wider than item count. α = null when D_e = 0
    * (every kept rating identical — agreement is undefined, not 1).
    */
  def krippendorffAlpha(df: DataFrame, item: Column,
      rating: Column): DataFrame = {
    val d = (x: Column) => x.cast("double")
    val c = df.select(item.as("i"), rating.cast("string").as("r"))
      .groupBy(col("i"), col("r")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // feeds item moments AND class marginals
    val items = c.groupBy(col("i"))
      .agg(sum(col("c")).as("m"), sum(col("c") * col("c")).as("s2"))
      .filter(col("m") >= 2L)
    val kept = c.join(items.select(col("i")), Seq("i"))
    val classes = kept.groupBy(col("r")).agg(sum(col("c")).as("nc"))
      .agg(sum(col("nc") * col("nc")).as("sc2"))
    val obs = items.agg(count(lit(1)).as("n_items"), sum(col("m")).as("nn"),
      sum(d(col("m") * col("m") - col("s2")) / d(col("m") - 1)).as("__do"))
    obs.crossJoin(broadcast(classes))
      .withColumn("__de_num", col("nn") * col("nn") - col("sc2"))
      .select(col("n_items"), col("nn").as("n_ratings"),
        when(col("__de_num") > 0L && col("nn") >= 2L,
          round(lit(1.0) - (col("__do") / d(col("nn"))) /
            (d(col("__de_num")) / (d(col("nn")) * d(col("nn") - 1))), 6))
          .as("alpha"))
  }

  /** CUPED variance reduction (Deng et al., WSDM 2013): adjust a per-unit
    * experiment metric `y` by its pre-period covariate `x`,
    * yᶜᵛ = y − θ(x − x̄) with θ = cov(x,y)/var(x) fitted on the POOLED
    * units (the unbiasedness condition — θ must not depend on variant),
    * and report per-variant means and variances before/after. The
    * variance ratio is the fraction of A/B sample size the covariate
    * buys back; on typical user metrics (pre-period activity predicts
    * post) it's 30–70 %.
    *
    * Two bounded passes over the UNIT frame (not events — the caller
    * aggregates units first): one moment aggregate for θ and x̄, then
    * one broadcast-apply + per-variant aggregate. θ and x̄ are rounded
    * at 6 before the apply so every engine adjusts with identical
    * constants; `avg`/`var_samp` run on those identical per-unit values.
    * Degenerate var(x) = 0 → θ = 0 (no adjustment), not a divide error.
    */
  def cuped(units: DataFrame, variant: Column, x: Column,
      y: Column): DataFrame = {
    val d = (c: Column) => c.cast("double")
    val u = units.select(variant.as("variant"), d(x).as("x"), d(y).as("y"))
      .localCheckpoint(true) // unit-sized; feeds theta AND the apply
    val fit = u.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .select(round(col("sx") / d(col("n")), 6).as("__xbar"),
        round(when(col("sxx") - col("sx") * col("sx") / d(col("n")) > 0.0,
          (col("sxy") - col("sx") * col("sy") / d(col("n"))) /
            (col("sxx") - col("sx") * col("sx") / d(col("n"))))
          .otherwise(lit(0.0)), 6).as("__theta"))
    u.crossJoin(broadcast(fit))
      .withColumn("__adj", col("y") - col("__theta") * (col("x") - col("__xbar")))
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("y")), 6).as("mean_y"),
        round(avg(col("__adj")), 6).as("mean_y_cuped"),
        round(var_samp(col("y")), 6).as("var_y"),
        round(var_samp(col("__adj")), 6).as("var_y_cuped"),
        round(max(col("__theta")), 6).as("theta"))
  }

  /** Split-conformal quality gate: a DISTRIBUTION-FREE lower bound on a
    * per-document quality score, calibrated on a held-out hash split —
    * the principled version of "flag everything below 0.3" (Vovk et al.'s
    * split conformal prediction, lower-tail form). The threshold is the
    * ⌊α·(n_cal+1)⌋-th smallest calibration score, which guarantees
    * P(new score < threshold) ≤ α for exchangeable data WITHOUT any
    * distributional assumption on the score — so a per-group flag rate
    * far above α is a calibrated drift alarm (that group's quality
    * distribution shifted), not a tuning artifact.
    *
    * Deterministic: scores are rounded at 6 before everything, the split
    * is the x19 hash-bucket discipline (`Sampling.hashBucket`, salt
    * "conformal"), and the order statistic is exact — computed on the
    * round-6 score JUMP SPINE (groupBy score + one cumulative window:
    * the post-aggregate window contract, |distinct scores| bounded by
    * quantization, never corpus rows). k = ⌊α·(n_cal+1)⌋ is computed in
    * IEEE double on BOTH engines — the oracle writes
    * `CAST(0.1 AS DOUBLE)` because a bare DuckDB `0.1` literal is an
    * exact DECIMAL whose product can floor differently from the double
    * product (0.29·100 = 28.999…996 in double → k=28, but exactly 29 in
    * decimal — a coincidence of rounding at α=0.1 must not become the
    * template; EvaluationSpec pins the diverging case).
    * If k < 1 the bound is vacuous: threshold is null, nothing flagged.
    *
    * Scale: one narrow projection read twice (calibration spine, eval
    * apply), a spine-sized window, a 1-row threshold broadcast, one
    * grouped aggregate — no corpus-sized sort or collect anywhere.
    */
  def conformalGate(df: DataFrame, id: Column, group: Column, score: Column,
      alpha: Double = 0.1,
      calBuckets: Int = graft.sampling.Sampling.Buckets / 5): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1), got $alpha")
    require(calBuckets >= 1 && calBuckets < graft.sampling.Sampling.Buckets,
      s"calBuckets must be in [1, ${graft.sampling.Sampling.Buckets}), got $calBuckets")
    // null scores are EXCLUDED on both splits (documented): Spark sorts
    // nulls first while DuckDB sorts them last, so a null entering the
    // spine would silently shift the order statistic — and a null is not
    // a quality observation the bound can cover anyway
    val s = df.select(group.as("grp"),
      round(score.cast("double"), 6).as("__s"),
      (graft.sampling.Sampling.hashBucket(id, "conformal") < calBuckets)
        .as("__cal"))
      .filter(col("__s").isNotNull)
    val cal = s.filter(col("__cal"))
    val n = cal.agg(count(lit(1)).as("__n"))
    val wc = Window.orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val thr = cal.groupBy(col("__s")).agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(wc))
      .crossJoin(broadcast(n))
      .withColumn("__k", floor(lit(alpha) * (col("__n") + 1L).cast("double"))
        .cast("long"))
      .filter(col("__k") >= 1L && col("__cum") >= col("__k"))
      .agg(min(col("__s")).as("thr")) // empty → null thr → vacuous gate
    s.filter(!col("__cal"))
      .crossJoin(broadcast(thr))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__s") < col("thr"), 1L).otherwise(0L)).as("n_flagged"),
        min(col("thr")).as("thr"))
      .select(col("grp").as("group"), col("n_docs"), col("n_flagged"),
        round(col("n_flagged").cast("double") /
          col("n_docs").cast("double"), 6).as("flag_rate"),
        col("thr"))
  }

  /** Mondrian (group-conditional) split-conformal gate — [[conformalGate]]
    * with a SEPARATE calibration threshold per group: the k_g-th smallest
    * calibration score WITHIN group g, k_g = ⌊α·(n_cal_g+1)⌋, guaranteeing
    * P(new score < thr_g | group g) ≤ α per group (Vovk's Mondrian
    * taxonomy, one cell per group). This is the form a per-SOURCE quality
    * gate actually wants: under the global gate a source whose score
    * distribution is legitimately lower than the corpus mix alarms
    * forever; here each source is calibrated against itself, so its alarm
    * fires only when ITS OWN distribution shifts between the calibration
    * and evaluation splits.
    *
    * The price of conditioning is per-group calibration mass: a group
    * with n_cal_g < ⌈1/α⌉−1 has k_g < 1 and a VACUOUS gate (null
    * threshold, nothing flagged) — reported, not hidden, so thin sources
    * read as "uncalibratable", never as "clean". A group present only in
    * the evaluation split gets the same null-threshold row via the left
    * join. Same determinism contract as the global gate: round-6 scores,
    * nulls excluded on both splits, the x19 hash split (salt "conformal"
    * — THE SAME salt, so the global and Mondrian faces gate the identical
    * calibration/eval partition and their flag rates are comparable), and
    * k_g in IEEE double on both engines.
    *
    * Scale: identical shuffle shape to [[conformalGate]] except the
    * cumulative window is PARTITIONED BY group (per-group spine chunks —
    * strictly more parallel than the global gate's single spine sort, and
    * off the unpartitioned-window audit entirely); thresholds join back
    * group-keyed instead of via a 1-row broadcast.
    */
  def mondrianGate(df: DataFrame, id: Column, group: Column, score: Column,
      alpha: Double = 0.1,
      calBuckets: Int = graft.sampling.Sampling.Buckets / 5): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1), got $alpha")
    require(calBuckets >= 1 && calBuckets < graft.sampling.Sampling.Buckets,
      s"calBuckets must be in [1, ${graft.sampling.Sampling.Buckets}), got $calBuckets")
    val s = df.select(group.as("grp"),
      round(score.cast("double"), 6).as("__s"),
      (graft.sampling.Sampling.hashBucket(id, "conformal") < calBuckets)
        .as("__cal"))
      .filter(col("__s").isNotNull)
    val cal = s.filter(col("__cal"))
    val n = cal.groupBy(col("grp")).agg(count(lit(1)).as("__n"))
    val wc = Window.partitionBy(col("grp")).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val thr = cal.groupBy(col("grp"), col("__s")).agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(wc))
      .join(n, Seq("grp"))
      .withColumn("__k", floor(lit(alpha) * (col("__n") + 1L).cast("double"))
        .cast("long"))
      .filter(col("__k") >= 1L && col("__cum") >= col("__k"))
      .groupBy(col("grp")).agg(min(col("__s")).as("thr"))
    s.filter(!col("__cal"))
      .join(thr, Seq("grp"), "left") // null thr → vacuous gate for that group
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__s") < col("thr"), 1L).otherwise(0L)).as("n_flagged"),
        min(col("thr")).as("thr"))
      .select(col("grp").as("group"), col("n_docs"), col("n_flagged"),
        round(col("n_flagged").cast("double") /
          col("n_docs").cast("double"), 6).as("flag_rate"),
        col("thr"))
  }

  /** Cumulative Poisson(1) CDF thresholds c₀..c₅ (weights cap at 6; the
    * tail past 6 is < 10⁻⁴). Shared with the SQL oracle as decimal
    * strings so both engines draw identical weights.
    */
  private[graft] val PoissonCdf: Seq[Double] = {
    val e1 = math.exp(-1.0)
    // cₖ = e⁻¹·Σ_{j≤k} 1/j!  (term_j = e⁻¹/j!)
    Seq.iterate((e1, e1, 1), 6) { case (cum, term, j) =>
      (cum + term / j, term / j, j + 1)
    }.map(_._1)
  }

  /** Wald SPRT source-vetting gate (Sequential Probability Ratio Test,
    * Wald 1945): walk each group's rows in a deterministic order,
    * accumulating the log-likelihood ratio of defect rate p1 (bad) vs p0
    * (acceptable); the FIRST crossing of ln((1−β)/α) rejects the source,
    * of ln(β/(1−α)) accepts it, and the row ordinal at the crossing is
    * the sample the decision actually cost. This is the sample-efficient
    * alternative to fixed-n per-source audits: a clearly bad feed is
    * rejected after a handful of documents instead of a full scan's
    * worth, with guaranteed error rates (α, β).
    *
    * Scale shape: one cumulative window PARTITIONED by group (never
    * global), then a per-group aggregate plus two rn-equi-joins back to
    * the checkpointed walk (first crossing, final row). LLR constants
    * are Scala doubles shared textually with the oracle, and the ordered
    * cumulative sum is order-deterministic, so crossings agree
    * bit-for-bit across engines.
    */
  def sprtGate(df: DataFrame, group: Column, ordinal: Column,
      defect: Column, p0: Double = 0.3, p1: Double = 0.5,
      alpha: Double = 0.05, beta: Double = 0.05): DataFrame = {
    require(0 < p0 && p0 < p1 && p1 < 1, s"need 0 < p0 < p1 < 1: ($p0, $p1)")
    require(0 < alpha && alpha < 1 && 0 < beta && beta < 1,
      s"alpha/beta must be in (0,1): ($alpha, $beta)")
    val lrD = math.log(p1 / p0)
    val lrO = math.log((1 - p1) / (1 - p0))
    val thrA = math.log((1 - beta) / alpha)
    val thrB = math.log(beta / (1 - alpha))
    val w = Window.partitionBy(col("__g")).orderBy(col("__o"))
    val rows = df.select(group.as("__g"), ordinal.as("__o"),
        when(defect, lit(lrD)).otherwise(lit(lrO)).as("__l"))
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__cum", sum(col("__l")).over(w))
      .localCheckpoint(true) // walked three times below
    val agg = rows.groupBy(col("__g"))
      .agg(count(lit(1)).as("n_docs"),
        min(when(col("__cum") >= thrA || col("__cum") <= thrB,
          col("__rn"))).as("n_seen"))
    val firstCross = rows.select(col("__g"), col("__rn").as("n_seen"),
      (col("__cum") >= thrA).as("__isrej"))
    val finals = rows.select(col("__g"), col("__rn").as("n_docs"),
      round(col("__cum"), 6).as("llr_final"))
    agg
      .join(firstCross, Seq("__g", "n_seen"), "left")
      .join(finals, Seq("__g", "n_docs"))
      .select(col("__g").as("group"), col("n_docs"), col("n_seen"),
        when(col("n_seen").isNull, lit("undecided"))
          .when(col("__isrej"), lit("reject"))
          .otherwise(lit("accept")).as("decision"),
        col("llr_final"))
  }

  /** Clustering-agreement panel: Adjusted Rand Index and Normalized
    * Mutual Information between two discrete assignments (ground-truth
    * labels vs a clustering, or two clustering runs) — the chance-corrected
    * complement to x105's purity, which a degenerate all-one-cluster
    * assignment can game but ARI (0 in expectation under chance) cannot.
    *
    * Everything derives from the CONTINGENCY frame (|A-values|×|B-values|
    * cells — model-sized, never corpus rows): pair counts Σ k(k−1)/2 stay
    * exact longs until the final double arithmetic (the k(k−1) products
    * are halved in double to dodge long overflow past n ≈ 3·10⁹ pairs);
    * the entropy/MI sums run over the same bounded frame, rounded 6.
    * One corpus pass, three spine aggregates, 1-row broadcast combines.
    */
  def clusterAgreement(df: DataFrame, a: Column, b: Column): DataFrame = {
    val ct = df.groupBy(a.as("__a"), b.as("__b"))
      .agg(count(lit(1)).as("nij"))
      .localCheckpoint(true) // model-sized; feeds 4 aggregates below
    val pairs2 = (k: Column) => k * (k - lit(1L))
    val ma = ct.groupBy(col("__a")).agg(sum(col("nij")).as("ai"))
    val mb = ct.groupBy(col("__b")).agg(sum(col("nij")).as("bj"))
    val tot = ct.agg(sum(col("nij")).as("n"))
    val d = (c: Column) => c.cast("double")
    val nD = d(col("n"))
    val sij = ct.agg((sum(pairs2(col("nij"))).cast("double") / 2.0).as("sij"))
    val sa = ma.agg(count(lit(1)).as("n_classes"),
      (sum(pairs2(col("ai"))).cast("double") / 2.0).as("sa"))
    val sb = mb.agg(count(lit(1)).as("n_clusters"),
      (sum(pairs2(col("bj"))).cast("double") / 2.0).as("sb"))
    val mi = ct.join(ma, Seq("__a")).join(mb, Seq("__b"))
      .crossJoin(broadcast(tot))
      .agg(sum((d(col("nij")) / nD) *
        log(nD * d(col("nij")) / (d(col("ai")) * d(col("bj"))))).as("mi"))
    val ha = ma.crossJoin(broadcast(tot))
      .agg((-sum((d(col("ai")) / nD) * log(d(col("ai")) / nD))).as("ha"))
    val hb = mb.crossJoin(broadcast(tot))
      .agg((-sum((d(col("bj")) / nD) * log(d(col("bj")) / nD))).as("hb"))
    val c2n = nD * (nD - 1.0) / 2.0
    val ea = col("sa") * col("sb") / c2n
    val denom = (col("sa") + col("sb")) / 2.0 - ea
    val hsum = col("ha") + col("hb")
    tot.crossJoin(broadcast(sij)).crossJoin(broadcast(sa))
      .crossJoin(broadcast(sb)).crossJoin(broadcast(mi))
      .crossJoin(broadcast(ha)).crossJoin(broadcast(hb))
      .select(col("n"), col("n_classes"), col("n_clusters"),
        when(denom =!= 0.0, round((col("sij") - ea) / denom, 6)).as("ari"),
        when(hsum =!= 0.0, round(lit(2.0) * col("mi") / hsum, 6)).as("nmi"))
  }

  /** The hash-seeded Poisson(1) bootstrap weight as a standalone Column —
    * `replicate` may be any integer column, so
    * `SUM(bootstrap_weight(id, b) * x) GROUP BY b` IS the bootstrap on
    * the SQL surface. Same md5 stream and CDF thresholds as
    * [[bootstrapCi]] (which pre-projects one md5 per 4 replicates for
    * throughput; parity is spec-pinned).
    */
  def poissonWeight(id: Column, replicate: Column): Column = {
    val rep = replicate.cast("long")
    val g = floor(rep.cast("double") / 4.0).cast("long")
    val slot = pmod(rep, lit(4L)).cast("int")
    val h = md5(concat_ws("", lit("boot"), g.cast("string"), lit(":"),
      id.cast("string")))
    poissonFromUniform(
      conv(h.substr(slot * lit(8) + lit(1), lit(8)), 16, 10)
        .cast("long").cast("double") / lit(4294967296.0))
  }

  /** Poisson(1) inverse-CDF at a uniform: the single definition behind
    * [[poissonWeight]] and [[bootstrapCi]]'s pre-projected stream, so
    * the SQL-surface function and the audit cannot drift. when() chains
    * evaluate first-match, so fold from the LAST threshold backwards —
    * the result nests when(u<c0,0).otherwise(when(u<c1,1)…).
    */
  private def poissonFromUniform(u: Column): Column =
    PoissonCdf.zipWithIndex.reverse.foldLeft(lit(6L): Column) {
      case (acc, (c, j)) => when(u < lit(c), j.toLong).otherwise(acc)
    }

  /** Poisson-bootstrap confidence interval for a corpus mean (Chamandy et
    * al., "Estimating Uncertainty for Massive Data Streams", Google 2012):
    * every row joins replicate b with a deterministic hash-seeded
    * Poisson(1) weight, so `replicates` resampled means come out of ONE
    * map-side-combinable aggregate — no per-replicate pass, no shuffle of
    * the corpus, no RNG state (re-runs and engines agree bit-for-bit).
    * The interval is the 2nd/(B−1)th order statistic of the replicate
    * means — the ~94% percentile interval at B = 32 — the error bar every
    * corpus-level datacard number should carry but almost never does.
    *
    * The 32 uniforms per row cost 8 md5s (4 × 32-bit slices each),
    * projected once; weights follow by inverting the Poisson(1) CDF at
    * literal thresholds shared with the oracle. Integer `value`s keep the
    * weighted sums exact (longs), so replicate means are
    * order-independent.
    */
  def bootstrapCi(df: DataFrame, id: Column, value: Column,
      replicates: Int = 32): DataFrame = {
    require(replicates >= 4 && replicates % 4 == 0,
      s"replicates must be a positive multiple of 4, got $replicates")
    val groups = replicates / 4
    val hexed = df.select(value.cast("long").as("__x") +:
      (0 until groups).map(g => md5(concat_ws("",
        lit(s"boot$g:"), id.cast("string"))).as(s"__h$g")): _*)
    def weightChain(b: Int): Column =
      poissonFromUniform(
        conv(substring(col(s"__h${b / 4}"), (b % 4) * 8 + 1, 8), 16, 10)
          .cast("long").cast("double") / lit(4294967296.0))
    val aggs =
      (0 until replicates).flatMap { b =>
        val w = weightChain(b)
        Seq(sum(w * col("__x")).as(s"__sx$b"), sum(w).as(s"__sw$b"))
      } :+ sum(col("__x")).as("__tx")
    val one = hexed.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val means = array_sort(array((0 until replicates).map(b =>
      round(col(s"__sx$b").cast("double") /
        col(s"__sw$b").cast("double"), 6)): _*))
    one.select(col("n_rows"),
      round(col("__tx").cast("double") / col("n_rows").cast("double"), 6)
        .as("mean"),
      element_at(means, 2).as("ci_lo"),
      element_at(means, replicates - 1).as("ci_hi"))
  }

  /** Per-group pass-rate gate with a Wilson score interval: n, passes,
    * p̂, and the 95 % Wilson bounds, gating on `wilson_lo ≥ tau` — the
    * small-sample-honest form of "is this source's quality rate credibly
    * above τ". A raw p̂ ≥ τ cut waves through a 3-for-3 source (p̂ = 1.0
    * on no evidence) and blocks a 490/1000 one; the Wilson lower bound
    * orders both correctly, has no ±∞/collapse at p̂ ∈ {0, 1} (unlike the
    * Wald interval), and needs no resampling (unlike x183's bootstrap).
    *
    * Closed form per group — one grouped count, per-row arithmetic,
    * |groups|-sized output; z enters as a Scala double literal the
    * oracle interpolates, sqrt is correctly rounded on both engines.
    * The gate compares the UNROUNDED bound; outputs round at 6 dp.
    */
  /** Wilson score interval (center, half-width) from counts — the shared
    * builder behind [[wilsonGate]] and the `wilson_lo` SQL function so
    * the two surfaces can never drift. z² is a double PRODUCT (z*z, not
    * pow) so a SQL caller passing the same z reproduces the gate bit for
    * bit. Unrounded; callers round for publication.
    */
  private[graft] def wilsonCenterHalf(k: Column, n: Column,
      z: Column): (Column, Column) = {
    val nd = n.cast("double")
    val ph = k.cast("double") / nd
    val zd = z.cast("double")
    val z2 = zd * zd
    val denom = lit(1.0) + z2 / nd
    val center = (ph + z2 / (lit(2.0) * nd)) / denom
    val half = zd *
      sqrt(ph * (lit(1.0) - ph) / nd + z2 / (lit(4.0) * nd * nd)) / denom
    (center, half)
  }

  /** Wilson lower bound for k successes of n at critical value z —
    * the `wilson_lo` SQL scalar ([[wilsonGate]]'s gating statistic). */
  def wilsonLower(k: Column, n: Column, z: Column): Column = {
    val (center, half) = wilsonCenterHalf(k, n, z)
    center - half
  }

  def wilsonGate(df: DataFrame, group: Column, pass: Column, tau: Double,
      z: Double = 1.96): DataFrame = {
    require(tau > 0 && tau < 1, s"tau must be in (0,1), got $tau")
    require(z > 0, s"z must be > 0, got $z")
    val g = df.groupBy(group.as("group"))
      .agg(count(lit(1)).as("n"),
        sum(when(pass, 1L).otherwise(0L)).as("k"))
    val nd = col("n").cast("double")
    val ph = col("k").cast("double") / nd
    val (center, half) = wilsonCenterHalf(col("k"), col("n"), lit(z))
    g.select(col("group"), col("n"), col("k"),
      round(ph, 6).as("p_hat"),
      round(center - half, 6).as("wilson_lo"),
      round(center + half, 6).as("wilson_hi"),
      (center - half >= tau).as("passed"))
  }

  /** Classifier operating-point table: for every candidate threshold
    * (each distinct score, rule "predict positive when score ≥ t"), the
    * full confusion matrix plus precision/recall/F1 and Youden's J —
    * ending with flags on the F1-argmax and J-argmax rows. AUC (x125)
    * says whether the score CAN rank; this says WHERE to cut it, which
    * is the number a production gate actually needs (F1-max when both
    * error kinds cost alike, J-max when class balance shifts between
    * calibration and deployment).
    *
    * Scale shape: one grouped count onto the |distinct scores| jump
    * spine (the x125/x171 discipline — scores round at 6 dp upstream, so
    * the spine is bounded), one cumulative window over THAT spine (an
    * unpartitioned window over spine rows, never corpus rows — the
    * allowlisted class), two 1-row broadcast combines (totals, maxima).
    * Flags compare ROUNDED metrics so cross-engine ties are exact.
    * A NULL label counts as a NEGATIVE (coalesced to false after the
    * boolean cast) — the same semantics as the oracle's
    * `CASE WHEN ... THEN 1 ELSE 0`, so the engines agree even when the
    * label expression can be null.
    */
  def operatingPoints(df: DataFrame, score: Column, label: Column): DataFrame = {
    val spine = df.select(score.as("threshold"),
      coalesce(label.cast("boolean"), lit(false)).as("__y"))
      .groupBy(col("threshold"))
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("__p"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("__ng"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("threshold").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val tot = spine.agg(sum(col("__p")).as("__tp_all"),
      sum(col("__ng")).as("__tn_all"))
    val m = spine
      .withColumn("tp", sum(col("__p")).over(w))
      .withColumn("fp", sum(col("__ng")).over(w))
      .crossJoin(broadcast(tot))
      .withColumn("fn", col("__tp_all") - col("tp"))
      .withColumn("tn", col("__tn_all") - col("fp"))
      .withColumn("prec", round(col("tp").cast("double") /
        (col("tp") + col("fp")).cast("double"), 6))
      .withColumn("rec", round(col("tp").cast("double") /
        col("__tp_all").cast("double"), 6))
      .withColumn("f1", round(lit(2.0) * col("tp").cast("double") /
        (lit(2.0) * col("tp").cast("double") + col("fp").cast("double") +
          col("fn").cast("double")), 6))
      .withColumn("youden", round(col("tp").cast("double") /
        col("__tp_all").cast("double") - col("fp").cast("double") /
        col("__tn_all").cast("double"), 6))
    val best = m.agg(max(col("f1")).as("__bf"), max(col("youden")).as("__bj"))
    m.crossJoin(broadcast(best))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"), col("tn"),
        col("prec"), col("rec"), col("f1"), col("youden"),
        (col("f1") === col("__bf")).as("best_f1"),
        (col("youden") === col("__bj")).as("best_youden"))
  }

  /** B-cubed precision/recall/F1 — the standard ENTITY-RESOLUTION
    * evaluation, judging each RECORD by the purity/completeness of its
    * own cluster: precision_i = |pred_i ∩ truth_i| / |pred_i|, recall_i
    * the mirror, averaged over records. ARI/NMI (x184) score the
    * partition as a whole and can look healthy while one mega-cluster
    * swallows the tail; B-cubed charges every record inside the bad
    * merge individually — which is why ER literature reports it.
    *
    * Everything derives from the (pred, truth) CONTINGENCY frame: a
    * record in cell (p, t) scores c(p,t)/|p| precision, so the cell
    * contributes c²/|p| — no per-record pass survives the first
    * aggregate. Scale: one grouped count (bounded by |pred|·|truth|
    * OVERLAPPING cells ≤ records), two marginal aggregates, one scalar
    * combine. F1 from the unrounded averages, all three rounded at 6.
    */
  def bcubed(assign: DataFrame, pred: Column, truth: Column): DataFrame = {
    val ct = assign.select(pred.as("__p"), truth.as("__t"))
      .groupBy(col("__p"), col("__t")).agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val ps = ct.groupBy(col("__p")).agg(sum(col("__c")).as("__ps"))
    val ts = ct.groupBy(col("__t")).agg(sum(col("__c")).as("__ts"))
    val nPred = ps.agg(count(lit(1)).as("n_pred_entities"))
    val nTruth = ts.agg(count(lit(1)).as("n_truth_entities"))
    val terms = ct.join(ps, Seq("__p")).join(ts, Seq("__t"))
      .agg(sum(col("__c")).as("__n"),
        sum(col("__c").cast("double") * col("__c").cast("double") /
          col("__ps").cast("double")).as("__sp"),
        sum(col("__c").cast("double") * col("__c").cast("double") /
          col("__ts").cast("double")).as("__sr"))
    val p = col("__sp") / col("__n").cast("double")
    val r = col("__sr") / col("__n").cast("double")
    terms.crossJoin(broadcast(nPred)).crossJoin(broadcast(nTruth))
      .select(col("__n").as("n_records"),
        col("n_pred_entities"), col("n_truth_entities"),
        round(p, 6).as("bcubed_precision"),
        round(r, 6).as("bcubed_recall"),
        round(lit(2.0) * p * r / (p + r), 6).as("bcubed_f1"))
  }
}
