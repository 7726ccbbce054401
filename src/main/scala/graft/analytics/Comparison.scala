package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J6: API-vs-PREDICTION comparison table (ref `Wind_Genration.py:437-454`):
  * for each key, take the latest row per data source, unpivot the parameter
  * columns, and emit per-parameter (api, real-time, difference) rows with
  * prettified labels (D23).
  *
  * Scale shape: one window per (key, source) to pick latest rows (P14), then
  * an explode of a fixed small parameter list over those few rows — the wide
  * raw frame is reduced to |keys|×|sources| rows before any unpivot.
  */
object Comparison {

  def sourceDiff(df: DataFrame, key: String, sourceCol: String,
      apiSource: String, rtSource: String, params: Seq[String],
      order: Seq[Column]): DataFrame = {
    val latest = Ranking.lastPerKey(df,
      Seq(col(key), col(sourceCol)), order)
    val long = latest.select(col(key), col(sourceCol),
        explode(array(params.map(p =>
          struct(lit(p).as("p"), col(p).cast("double").as("v"))): _*)).as("kv"))
      .select(col(key), col(sourceCol),
        col("kv.p").as("param"), col("kv.v").as("value"))
    val api = long.filter(col(sourceCol) === apiSource)
      .select(col(key), col("param"), col("value").as("api_value"))
    val rt = long.filter(col(sourceCol) === rtSource)
      .select(col(key), col("param"), col("value").as("rt_value"))
    api.join(rt, Seq(key, "param"))
      .select(col(key),
        initcap(regexp_replace(col("param"), "_", " ")).as("parameter"),
        col("api_value"), col("rt_value"),
        (col("rt_value") - col("api_value")).as("difference"))
  }

  /** Corpus snapshot diff — the data-versioning primitive behind "what
    * changed between yesterday's crawl and today's": every doc id in
    * either snapshot labeled `added` / `removed` / `changed` / `unchanged`
    * by its content fingerprint ([[graft.text.TextAnalysis.fingerprint]]
    * — md5 of normalized text, so whitespace/case churn is not a change).
    *
    * Scale shape: each side reduces to (id, 32-byte fingerprint) in its
    * scan projection; one full-outer equi-join on the id carries those
    * narrow rows only — document text never crosses the shuffle. Emitting
    * `unchanged` rows keeps the output a total function of the id union
    * (filter them out when only the delta matters).
    */
  def snapshotDiff(before: DataFrame, after: DataFrame,
      id: Column, text: Column): DataFrame = {
    // presence flags, not fingerprint nullness, drive the membership
    // verdict: a present doc with null text must read changed/unchanged
    // (null-safe compare), never added/removed
    def fp(df: DataFrame, out: String, mark: String): DataFrame =
      df.select(id.as("doc_id"),
        graft.text.TextAnalysis.fingerprint(text).as(out),
        lit(true).as(mark))
    fp(before, "__fb", "__pb")
      .join(fp(after, "__fa", "__pa"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("__pb").isNull, lit("added"))
          .when(col("__pa").isNull, lit("removed"))
          .when(col("__fa") <=> col("__fb"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Two-sample Kolmogorov–Smirnov drift audit: for each group (feed,
    * source, day), the KS statistic `sup_x |F_group(x) − F_rest(x)|`
    * between the group's distribution of `v` and the REST of the corpus —
    * the standard "did this feed's length/score profile move?" alarm,
    * complementing the binned PSI gate (x85) with a bin-free statistic
    * that's sensitive anywhere in the CDF.
    *
    * `v` must be DISCRETE (integer, or pre-quantized by the caller —
    * the bounded-domain discipline): the sup over x is attained at jump
    * points, so evaluating both ECDFs at every distinct value of `v` is
    * exact. Everything is integer counts until the final two divisions.
    *
    * Scale shape: one aggregate to the (group, v) count frame; the
    * distinct-v spine and the |groups|-sized totals frame derive from it;
    * the grid is |groups|·|distinct v| — bounded by the caller's
    * quantization, never by corpus size. The per-group running sums
    * window on the group key (one |grid|-sized shuffle). Groups covering
    * the whole corpus emit a null KS (no rest to compare against).
    */
  def ksDrift(df: DataFrame, group: Column, v: Column): DataFrame = {
    val c = df.select(group.as("grp"), v.cast("long").as("v"))
      .groupBy(col("grp"), col("v")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    // pooled cumulative on the |distinct v| spine BEFORE the grid fan-out
    // (a single-partition window, but over a caller-bounded frame)
    val wAll = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val spine = c.groupBy(col("v")).agg(sum(col("c")).as("cv"))
      .withColumn("cum_all", sum(col("cv")).over(wAll))
    val totals = c.groupBy(col("grp")).agg(sum(col("c")).as("n"))
    val grand = c.agg(sum(col("c")).as("nn"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // full grid: every group evaluated at every jump point of the POOLED
    // sample (sum over a |groups|×|v| frame, not the corpus)
    val grid = totals.select(col("grp"), col("n"))
      .crossJoin(broadcast(spine.select(col("v"), col("cum_all"))))
      .join(c, Seq("grp", "v"), "left")
      .na.fill(0L, Seq("c"))
    grid
      .withColumn("cum_g", sum(col("c")).over(wCum))
      .crossJoin(broadcast(grand))
      .withColumn("__d",
        abs(col("cum_g").cast("double") / col("n").cast("double") -
          (col("cum_all") - col("cum_g")).cast("double") /
            when(col("nn") > col("n"), (col("nn") - col("n")).cast("double"))))
      .groupBy(col("grp").as("group"))
      .agg(max(col("n")).as("n"), round(max(col("__d")), 6).as("ks"))
  }

  /** Welch's unequal-variance t per group vs rest-of-corpus over an
    * integer metric — the EFFECT-SIZE companion to [[ksDrift]]: KS says
    * "the distributions differ somewhere", Welch t says "the MEANS differ,
    * by this many standard errors, in this direction" — the number a
    * drift dashboard thresholds on.
    *
    * Exactness: the corpus reduces to per-group `(n, Σx, Σx²)` longs in
    * ONE map-side-combinable aggregate; rest-of-corpus moments are the
    * grand totals minus the group's (no second scan), and every floating
    * op happens on those exact sums in one deterministic expression —
    * sample variance s² = (Σx² − (Σx)²/n)/(n−1), t = (m₁−m₂)/√(s₁²/n₁ +
    * s₂²/n₂), Welch–Satterthwaite df. Overflow budget: Σx² < 2⁶³ — holds
    * for |x| ≤ 10⁶ up to ~10¹⁰ rows per group; quantize wider metrics
    * first. Groups (or rests) with < 2 rows, or two constant sides, emit
    * null t (zero pooled standard error).
    */
  def welchT(df: DataFrame, group: Column, v: Column): DataFrame = {
    val g = df.select(group.as("grp"), v.cast("long").as("v"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        sum(col("v") * col("v")).as("ss"))
      .localCheckpoint(true)
    val tot = g.agg(sum(col("n")).as("tn"), sum(col("s")).as("ts"),
      sum(col("ss")).as("tss"))
    val d = (c: Column) => c.cast("double")
    val withRest = g.crossJoin(broadcast(tot))
      .withColumn("n2", col("tn") - col("n"))
      .withColumn("m1", d(col("s")) / d(col("n")))
      // `when` guards, not bare divisions: ANSI mode turns /0 into an
      // error, and a 1-row group (n−1 = 0) or a group holding the whole
      // corpus (n2 = 0) must flow through as null instead
      .withColumn("m2", when(col("n2") > 0,
        d(col("ts") - col("s")) / d(col("n2"))))
      .withColumn("v1", when(col("n") >= 2,
        (d(col("ss")) - d(col("s")) * d(col("s")) / d(col("n"))) /
          d(col("n") - 1)))
      .withColumn("v2", when(col("n2") >= 2,
        (d(col("tss") - col("ss")) -
          d(col("ts") - col("s")) * d(col("ts") - col("s")) / d(col("n2"))) /
          d(col("n2") - 1)))
      .withColumn("se2", col("v1") / d(col("n")) + col("v2") / d(col("n2")))
    withRest.select(col("grp").as("group"), col("n"),
      round(col("m1"), 6).as("mean"),
      round(col("m2"), 6).as("mean_rest"),
      when(col("n") >= 2 && col("n2") >= 2 && col("se2") > 0.0,
        round((col("m1") - col("m2")) / sqrt(col("se2")), 6)).as("t"),
      // the df denominator vanishes only when BOTH variances do (= se2 0),
      // so the same guard covers it
      when(col("n") >= 2 && col("n2") >= 2 && col("se2") > 0.0,
        round(col("se2") * col("se2") /
          (col("v1") * col("v1") / (d(col("n")) * d(col("n")) * d(col("n") - 1)) +
           col("v2") * col("v2") / (d(col("n2")) * d(col("n2")) * d(col("n2") - 1))),
          6)).as("df"))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) per group vs rest-of-corpus over
    * an integer metric — the RANK companion to [[welchT]]: Welch asks
    * "do the means differ?", this asks "does one side stochastically
    * dominate?" without assuming any moment exists, so a heavy-tailed
    * length/score metric can't fake or hide a shift through outliers.
    *
    * Exactness: pooled midranks are computed on the |distinct v| spine
    * in DOUBLED integer units (2·midrank = 2·cum_before + t + 1 — always
    * a whole number, so no float enters until the final z), the group's
    * doubled rank-sum is one integer dot product over the (group, v)
    * count grid, and the tie correction Σ(t³ − t) stays in longs.
    * U = R − n₁(n₁+1)/2; z uses the tie-corrected variance
    * n₁n₂/12 · ((N+1) − Σ(t³−t)/(N(N−1))). Overflow budget: doubled
    * rank-sums are bounded by 2N² and tie cubes by t³ — both < 2⁶³ up
    * to N ≈ 2·10⁹ rows per audit scope; shard the audit (e.g. per day)
    * past that, as a rank statistic over more rows than that answers
    * nothing a sample wouldn't. Degenerate emissions: a group covering
    * the whole corpus, or a corpus with one distinct value, has no rest
    * or no variance → null z.
    */
  def mannWhitney(df: DataFrame, group: Column, v: Column): DataFrame = {
    val c = df.select(group.as("grp"), v.cast("long").as("v"))
      .groupBy(col("grp"), col("v")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    // pooled spine: per distinct v, total count, cumulative count BEFORE
    // this value, and the doubled midrank (integer by construction)
    val wAll = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val spine = c.groupBy(col("v")).agg(sum(col("c")).as("cv"))
      .withColumn("cum_before", coalesce(sum(col("cv")).over(wAll), lit(0L)))
      .withColumn("mr2", lit(2L) * col("cum_before") + col("cv") + lit(1L))
    val ties = spine.agg(sum(col("cv") * col("cv") * col("cv") - col("cv"))
      .as("tsum"), sum(col("cv")).as("nn"))
    val d = (x: Column) => x.cast("double")
    c.join(spine.select(col("v"), col("mr2")), Seq("v"))
      .groupBy(col("grp"))
      .agg(sum(col("c")).as("n"), sum(col("c") * col("mr2")).as("r2"))
      .crossJoin(broadcast(ties))
      .withColumn("n2", col("nn") - col("n"))
      // R = r2/2 (undoubling), U = R − n(n+1)/2; 2U = r2 − n(n+1) stays
      // an exact integer in longs, halved only on emission
      .withColumn("u",
        d(col("r2") - col("n") * (col("n") + lit(1L))) / 2.0)
      .select(col("grp").as("group"), col("n"), col("u"), col("n2"),
        col("tsum"), col("nn"))
      .withColumn("var_u", when(col("n2") > 0 && col("nn") > 1,
        d(col("n")) * d(col("n2")) / 12.0 *
          ((d(col("nn")) + 1.0) - d(col("tsum")) /
            (d(col("nn")) * (d(col("nn")) - 1.0)))))
      .select(col("group"), col("n"),
        round(col("u"), 6).as("u"),
        when(col("var_u") > 0.0,
          round((col("u") - d(col("n")) * d(col("n2")) / 2.0) /
            sqrt(col("var_u")), 6)).as("z"))
  }

  /** 1-D Wasserstein (earth-mover's) distance per group vs rest-of-corpus
    * over an integer metric — the MAGNITUDE companion to [[ksDrift]]: KS
    * reports the worst single CDF gap (scale-free, saturates at 1), W₁
    * reports the total probability mass × distance that must move to turn
    * one distribution into the other, in the metric's own units — the
    * number that says a feed's length profile shifted "by about 40
    * characters", not just "significantly".
    *
    * Exactness: W₁ = ∫|F₁(x) − F₂(x)|dx over the pooled jump spine —
    * each spine interval contributes |cum₁/n₁ − cum₂/n₂|·(vₙₑₓₜ − v),
    * with all cumulative counts in longs (same grid as [[ksDrift]]) and
    * only the final per-interval products in double. Same bounded-domain
    * discipline: `v` must be integer/pre-quantized, the grid is
    * |groups|·|distinct v|, never corpus-sized.
    */
  def wassersteinDrift(df: DataFrame, group: Column, v: Column): DataFrame = {
    val c = df.select(group.as("grp"), v.cast("long").as("v"))
      .groupBy(col("grp"), col("v")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val wAll = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val spine = c.groupBy(col("v")).agg(sum(col("c")).as("cv"))
      .withColumn("cum_all", sum(col("cv")).over(wAll))
      .withColumn("gap",
        lead(col("v"), 1).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("v"))) - col("v"))
    val totals = c.groupBy(col("grp")).agg(sum(col("c")).as("n"))
    val grand = c.agg(sum(col("c")).as("nn"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val d = (x: Column) => x.cast("double")
    totals.select(col("grp"), col("n"))
      .crossJoin(broadcast(spine.select(col("v"), col("cum_all"), col("gap"))))
      .join(c, Seq("grp", "v"), "left")
      .na.fill(0L, Seq("c"))
      .withColumn("cum_g", sum(col("c")).over(wCum))
      .crossJoin(broadcast(grand))
      .withColumn("__term", when(col("gap").isNotNull && col("nn") > col("n"),
        abs(d(col("cum_g")) / d(col("n")) -
          d(col("cum_all") - col("cum_g")) / d(col("nn") - col("n"))) *
          d(col("gap"))).otherwise(lit(0.0)))
      .groupBy(col("grp").as("group"))
      .agg(max(col("n")).as("n"),
        when(max(col("nn")) > max(col("n")),
          round(sum(col("__term")), 6)).as("w1"))
  }

  /** [[ksDrift]] with a DECISION layer: asymptotic two-sample KS p-values
    * and a Benjamini–Hochberg step-up at FDR `alpha` — the answer to
    * "WHICH of my 500 feeds actually drifted?", where thresholding raw
    * KS statistics ignores sample size and per-feed α·500 testing drowns
    * the dashboard in false alarms.
    *
    * p from the Kolmogorov asymptotic series 2Σ(−1)ᵏ⁻¹e^(−2k²λ²)
    * truncated at three terms (error < e^(−32λ²), i.e. < 10⁻⁶ for every
    * p < 0.88 — tiny-λ sums can exceed [0,1] so the value is clamped),
    * with λ² = n·n_rest/(n+n_rest)·D². The p is ROUNDED TO 6 before the
    * BH comparison on both engines so the accept/reject decision is
    * bit-identical. BH: rank the m testable groups by (p, group), reject
    * every rank ≤ max{i : p_i ≤ α·i/m}. Whole-corpus groups have no
    * test: null p, null decision, excluded from m.
    *
    * Scale shape: [[ksDrift]]'s grid plus one |groups|-row single-
    * partition window — the BH sort is over GROUPS, never rows.
    */
  def ksFdr(df: DataFrame, group: Column, v: Column,
      alpha: Double = 0.05): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1), got $alpha")
    val ks = ksDrift(df, group, v).localCheckpoint(true)
    val tot = ks.agg(sum(col("n")).as("nn"))
    val d = (x: Column) => x.cast("double")
    val withP = ks.crossJoin(broadcast(tot))
      .withColumn("__l2", d(col("n")) * d(col("nn") - col("n")) / d(col("nn"))
        * col("ks") * col("ks"))
      .withColumn("p", when(col("ks").isNotNull, round(
        least(lit(1.0), greatest(lit(0.0),
          lit(2.0) * (exp(lit(-2.0) * col("__l2"))
            - exp(lit(-8.0) * col("__l2"))
            + exp(lit(-18.0) * col("__l2"))))), 6)))
    val m = withP.agg(count(col("p")).as("m"))
    val wRank = org.apache.spark.sql.expressions.Window
      .orderBy(col("p").asc_nulls_last, col("group").asc)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    withP.crossJoin(broadcast(m))
      .withColumn("__i", row_number().over(wRank))
      .withColumn("__ok", when(col("p").isNotNull &&
        col("p") <= lit(alpha) * d(col("__i")) / d(col("m")), col("__i"))
        .otherwise(lit(0)))
      .withColumn("__imax", max(col("__ok")).over(wAll))
      .select(col("group"), col("n"), col("ks"), col("p"),
        when(col("p").isNotNull, col("__i") <= col("__imax"))
          .as("rejected"))
  }

  /** Entropy-regularized optimal-transport PLAN between two groups'
    * distributions of a quantized metric (Cuturi's Sinkhorn iterations) —
    * the ACTIONABLE companion to [[wassersteinDrift]]: W₁ says source A's
    * length profile sits 40 characters from source B's; the transport
    * plan says WHICH mass moves WHERE — `mass` on cell (va, vb) is the
    * fraction of the corpus to re-sample from A's bucket va when matching
    * B's bucket vb, i.e. the curation recipe itself.
    *
    * Algorithm: kernel K = exp(−|va−vb|/eps) on the two value spines,
    * then `iters` rounds of alternating marginal scalings
    * u ← a / Kv, v ← b / Kᵀu (Sinkhorn's theorem: converges to the unique
    * coupling with the prescribed marginals for any positive kernel).
    * Determinism across engines: kernel cells, both marginals, and every
    * scaling vector are rounded at 6 per step (the x170 power-iteration
    * discipline — both engines re-synchronize to identical vectors each
    * round), and a kernel row whose round-6 sum is 0 (all cells beyond
    * ~14·eps) scales to 0 instead of dividing (same CASE in both).
    *
    * Scale: the spines are |distinct quantized v| (caller pre-buckets —
    * the [[ksDrift]] contract), so the kernel is spine², broadcast-sized;
    * each iteration is one spine²-frame aggregate per side. Everything is
    * checkpointed per round (the mmr/hits lineage discipline), so the
    * plan depth is constant in `iters`.
    */
  def sinkhornPlan(df: DataFrame, group: Column, v: Column,
      groupA: String, groupB: String, eps: Double = 2.0,
      iters: Int = 5): DataFrame = {
    require(eps > 0.0, s"eps must be > 0, got $eps")
    require(iters >= 1 && iters <= 50, s"iters must be in [1,50], got $iters")
    val d = (x: Column) => x.cast("double")
    val (a, b, k) = sinkhornSetup(df, group, v, groupA, groupB, eps)
    var u = a.select(col("va"), lit(1.0).as("u"))
    var vv = b.select(col("vb"), lit(0.0).as("uv")) // overwritten round 1
    for (_ <- 1 to iters) {
      val step = sinkhornStep(k, a, b, u)
      u = step._1; vv = step._2
    }
    k.join(u, Seq("va")).join(vv, Seq("vb"))
      .select(col("va"), col("vb"),
        round(col("u") * col("kij") * col("uv"), 6).as("mass"))
      .filter(col("mass") > 0.0)
      .withColumn("cell_cost",
        round(col("mass") * abs(d(col("va")) - d(col("vb"))), 6))
  }

  /** Convergence meter for [[sinkhornPlan]]: after each alternating-scaling
    * round, the coupling's worst marginal deviation per side —
    * `res_a = max_i |Σ_j u·K·v − wa_i|`, `res_b` likewise over columns
    * (round 6, the repo grain). Sinkhorn's fixed iteration count is
    * otherwise a silent dial: a plan face alone cannot show whether 5
    * rounds CONVERGED or merely STOPPED, and a non-converged coupling's
    * `mass` column is not yet a re-sampling recipe. The u-side residual is
    * ~0 by construction after every u-update (u is computed to satisfy
    * the row marginals exactly, up to round-6 of the scaling vector) —
    * EXCEPT for rows the zero-sum guard killed, whose deviation pins at
    * wa_i and correctly reads "this mass is unreachable at this eps"; the
    * v-side residual is the live convergence signal and must shrink
    * monotonically-ish toward the rounding floor (spec-asserted).
    *
    * Scale: the iterates are [[sinkhornPlan]]'s own (checkpointed,
    * spine-bounded); each round adds two spine²-frame aggregates and a
    * 1-row×1-row broadcast combine. Output is `iters` rows.
    */
  def sinkhornResiduals(df: DataFrame, group: Column, v: Column,
      groupA: String, groupB: String, eps: Double = 2.0,
      iters: Int = 5): DataFrame = {
    require(eps > 0.0, s"eps must be > 0, got $eps")
    require(iters >= 1 && iters <= 50, s"iters must be in [1,50], got $iters")
    val (a, b, k) = sinkhornSetup(df, group, v, groupA, groupB, eps)
    var u = a.select(col("va"), lit(1.0).as("u"))
    var out: DataFrame = null
    for (i <- 1 to iters) {
      val (u2, vv) = sinkhornStep(k, a, b, u)
      u = u2
      val p = k.join(u2, Seq("va")).join(vv, Seq("vb"))
        .select(col("va"), col("vb"),
          (col("u") * col("kij") * col("uv")).as("__m"))
      val ra = p.groupBy(col("va")).agg(sum(col("__m")).as("__r"))
        .join(a, Seq("va"))
        .agg(max(abs(col("__r") - col("wa"))).as("__ra"))
      val rb = p.groupBy(col("vb")).agg(sum(col("__m")).as("__c"))
        .join(b, Seq("vb"))
        .agg(max(abs(col("__c") - col("wb"))).as("__rb"))
      val row = ra.crossJoin(broadcast(rb))
        .select(lit(i).as("iter"), round(col("__ra"), 6).as("res_a"),
          round(col("__rb"), 6).as("res_b"))
      out = if (out == null) row else out.unionByName(row)
    }
    out
  }

  /** The value-spine count frame both Sinkhorn faces start from — grouped
    * (grp, v) counts of the two compared groups. Exposed pre-checkpoint
    * for the unit-level plan audit.
    */
  private[graft] def sinkhornCounts(df: DataFrame, group: Column, v: Column,
      groupA: String, groupB: String): DataFrame =
    df.select(group.as("grp"), v.cast("long").as("v"))
      .filter(col("grp") === groupA || col("grp") === groupB)
      .groupBy(col("grp"), col("v")).agg(count(lit(1)).as("c"))

  /** One side's round-6 probability marginal over its value spine — the
    * 1-row total rides a broadcast nested-loop combine, never a
    * CartesianProduct. Exposed PRE-checkpoint: in the composed faces this
    * frame executes eagerly inside `localCheckpoint` during construction,
    * so the whole-query plan audit never sees its join — the unit-level
    * assertion on this builder (PlanAuditSpec) is the gate for that
    * blind spot.
    */
  private[graft] def sinkhornMarginalFrame(c: DataFrame, g: String,
      vName: String, wName: String): DataFrame = {
    val d = (x: Column) => x.cast("double")
    val side = c.filter(col("grp") === g)
    val tot = side.agg(sum(col("c")).as("__t"))
    side.crossJoin(broadcast(tot))
      .select(col("v").as(vName),
        round(d(col("c")) / d(col("__t")), 6).as(wName))
  }

  /** The spine² kernel K = exp(−|va−vb|/eps), round 6 — the vb spine is
    * broadcast (spine-sized by the ksDrift pre-bucket contract), so the
    * full pairing is a broadcast nested-loop join, never a
    * CartesianProduct. Exposed pre-checkpoint for the same audit reason
    * as [[sinkhornMarginalFrame]].
    */
  private[graft] def sinkhornKernelFrame(a: DataFrame, b: DataFrame,
      eps: Double): DataFrame = {
    val d = (x: Column) => x.cast("double")
    a.select(col("va")).crossJoin(broadcast(b.select(col("vb"))))
      .select(col("va"), col("vb"),
        round(exp(-abs(d(col("va")) - d(col("vb"))) / eps), 6).as("kij"))
  }

  /** Checkpointed construction shared by [[sinkhornPlan]] and
    * [[sinkhornResiduals]]: counts → per-side marginals → kernel, each
    * round-6 and eagerly checkpointed (the kernel is re-read every
    * iteration; the marginals feed every scaling round).
    */
  private def sinkhornSetup(df: DataFrame, group: Column, v: Column,
      groupA: String, groupB: String,
      eps: Double): (DataFrame, DataFrame, DataFrame) = {
    val c = sinkhornCounts(df, group, v, groupA, groupB)
      .localCheckpoint(true) // spine-sized; feeds both marginals
    val a = sinkhornMarginalFrame(c, groupA, "va", "wa").localCheckpoint(true)
    val b = sinkhornMarginalFrame(c, groupB, "vb", "wb").localCheckpoint(true)
    val k = sinkhornKernelFrame(a, b, eps).localCheckpoint(true)
    (a, b, k)
  }

  /** One alternating-scaling round (v-update from the incoming u, then
    * u-update from the fresh v), each scaling vector round-6 re-
    * synchronized and checkpointed — returns (u', v').
    */
  private def sinkhornStep(k: DataFrame, a: DataFrame, b: DataFrame,
      u: DataFrame): (DataFrame, DataFrame) = {
    val vv = k.join(u, Seq("va"))
      .groupBy(col("vb")).agg(sum(col("kij") * col("u")).as("__s"))
      .join(b, Seq("vb"))
      .select(col("vb"), when(col("__s") > 0.0,
        round(col("wb") / col("__s"), 6)).otherwise(lit(0.0)).as("uv"))
      .localCheckpoint(true)
    val u2 = k.join(vv, Seq("vb"))
      .groupBy(col("va")).agg(sum(col("kij") * col("uv")).as("__s"))
      .join(a, Seq("va"))
      .select(col("va"), when(col("__s") > 0.0,
        round(col("wa") / col("__s"), 6)).otherwise(lit(0.0)).as("u"))
      .localCheckpoint(true)
    (u2, vv)
  }
}
