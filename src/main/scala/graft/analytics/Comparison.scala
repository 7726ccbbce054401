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
}
