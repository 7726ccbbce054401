package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Correlation / trend / pivot operators (SURVEY.md §2.4, A10-A13).
  */
object Correlation {

  /** A10: pairwise Pearson correlation per group
    * (ref `Solar_Dashboard.py:452` etc.). `corr` is a declarative aggregate
    * — partial-aggregated map-side like any sum.
    */
  def corrByGroup(df: DataFrame, key: Column, x: Column, y: Column,
      outName: String = "corr"): DataFrame =
    df.groupBy(key).agg(round(corr(x, y), 6).as(outName))

  /** A12: linear trend fit (OLS degree 1) via regr_slope/regr_intercept
    * (ref `np.polyfit(x,y,1)`, `Solar_Dashboard.py:441-450`).
    */
  def linearTrend(df: DataFrame, key: Column, x: Column, y: Column): DataFrame =
    df.groupBy(key).agg(
      round(regr_slope(y, x), 6).as("slope"),
      round(regr_intercept(y, x), 6).as("intercept"))

  /** A13: long→wide pivot (ref `pivot_table(index=ts, columns=station)`,
    * `Solar_Dashboard.py:381-385`). Passing the distinct pivot values
    * explicitly skips the extra distinct-collection job Spark otherwise
    * runs before planning the pivot.
    */
  def pivotWide(df: DataFrame, index: Column, pivotCol: Column, values: Seq[String],
      agg: Column): DataFrame =
    df.groupBy(index).pivot(pivotCol, values).agg(agg)

  /** Autocorrelation function per key: Pearson correlation of the value
    * series with itself at lags `1..maxLag`, ordered by `order` within each
    * key (pass a tie-breaking column — e.g. an id — after the timestamp so
    * the series order, and therefore the ACF, is deterministic). The
    * seasonality/persistence probe that sits beside the A12 trend fit and
    * the a28 seasonal baseline: a sensor whose lag-1 ACF collapses has lost
    * temporal coherence (stuck or noisy), and a strong lag-k peak exposes a
    * periodic process.
    *
    * Scale shape: ONE window pass computes all `maxLag` lagged columns (the
    * per-key sort is paid once, not per lag), an inline stack turns them
    * into (key, lag, v, lv) rows, and `corr` is a declarative aggregate —
    * partial-aggregated map-side. The window partitions by key, so skew is
    * bounded by the largest single key's row count — the same contract as
    * every per-key window in the library (a key too big for one partition
    * needs time-bucketed pre-aggregation first, not a different ACF).
    */
  def autocorrelation(df: DataFrame, key: Column, order: Seq[Column],
      value: Column, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__k")).orderBy((1 to order.size).map(i => col(s"__o$i")): _*)
    val base = df.select(
      (key.as("__k") +: order.zipWithIndex.map { case (o, i) => o.as(s"__o${i + 1}") } :+
        value.cast("double").as("__v")): _*)
    val lagged = base.select(
      col("__k"), col("__v"),
      array((1 to maxLag).map(l =>
        struct(lit(l).as("lag"), lag(col("__v"), l).over(w).as("lv"))): _*).as("__ls"))
    lagged
      .select(col("__k"), col("__v"), explode(col("__ls")).as("__e"))
      .filter(col("__e.lv").isNotNull)
      .groupBy(col("__k").as("key"), col("__e.lag").as("lag"))
      .agg(round(corr(col("__v"), col("__e.lv")), 6).as("acf"),
        count(lit(1)).as("n_pairs"))
  }

  /** A11: correlation matrix across keys aligned on a time bucket
    * (ref station×station corr, `Wind_Dashboard.py:629-648`).
    *
    * Implementation: aggregate to one value per (bucket, key), self-join on
    * the bucket, then one `corr` per key pair. The self-join input is the
    * *aggregated* frame (|buckets|×|keys| rows), so the quadratic blow-up is
    * over the small key domain, never over raw data — the 100 TB-safe shape
    * of a correlation matrix.
    *
    * The bucket mean is [[Aggregates.fixedPointAvg]] (`valueScale` must
    * cover the data's decimal precision) so the matrix is deterministic
    * under any partitioning — the same merge-order rule as every other mean
    * in the library; downstream `corr` would otherwise carry last-ulp
    * jitter from the partial-sum merge order.
    */
  def corrMatrix(df: DataFrame, bucket: Column, key: Column, value: Column,
      valueScale: Int): DataFrame = {
    val g = df.groupBy(bucket.as("b"), key.as("k"))
      .agg(Aggregates.fixedPointAvg(value, valueScale).as("v"))
    val a = g.select(col("b"), col("k").as("key_a"), col("v").as("va"))
    val b = g.select(col("b"), col("k").as("key_b"), col("v").as("vb"))
    a.join(b, "b")
      .groupBy(col("key_a"), col("key_b"))
      .agg(round(corr(col("va"), col("vb")), 6).as("corr"))
  }

  /** Spearman rank correlation per group: Pearson `corr` over AVERAGE
    * (mid-) ranks — the tie-corrected textbook form, so monotone-but-
    * nonlinear relationships score 1.0 where [[corrByGroup]] (Pearson on
    * raw values) understates them, and heavy-tailed metrics (doc length,
    * dup counts) can't let a few outliers own the statistic.
    *
    * The inputs should be EXACT-COMPARABLE values (integers, or floats
    * produced by a deterministic round — the repo's round-6 scores
    * qualify): ranks change discontinuously under last-ulp jitter, so
    * ranking raw float aggregates would be engine-dependent. Mid-rank is
    * `minRank + (ties − 1)/2`, computed from one `rank()` window plus a
    * tie-count window per metric — two sorts per group key, then a single
    * declarative `corr` aggregate (map-side partials as usual).
    */
  def spearmanByGroup(df: DataFrame, key: Column, x: Column, y: Column): DataFrame = {
    val base = df.select(key.as("grp"), x.as("__x"), y.as("__y"))
    def midRank(c: String): Column = {
      val wr = org.apache.spark.sql.expressions.Window
        .partitionBy(col("grp")).orderBy(col(c))
      val wt = org.apache.spark.sql.expressions.Window
        .partitionBy(col("grp"), col(c))
      rank().over(wr).cast("double") +
        (count(lit(1)).over(wt).cast("double") - 1.0) / 2.0
    }
    base
      .withColumn("__rx", midRank("__x"))
      .withColumn("__ry", midRank("__y"))
      .groupBy(col("grp").as("group"))
      .agg(count(lit(1)).as("n"),
        round(corr(col("__rx"), col("__ry")), 6).as("spearman"))
  }

  /** Theil–Sen slope per group: the MEDIAN of all pairwise slopes
    * (yⱼ−yᵢ)/(xⱼ−xᵢ) over xᵢ < xⱼ — the robust companion to the OLS
    * fits ([[trendByGroup]], zipf/heaps): a single wild point moves OLS
    * arbitrarily but shifts a median of O(n²) slopes by one order
    * statistic (29 % breakdown). Pairs with equal x are excluded (no
    * slope exists), per the standard estimator.
    *
    * The caller BOUNDS the per-group point count (the repo's
    * bounded-domain discipline: fit curves, rank heads, bucketed
    * profiles — never raw corpora): the pair frame is |group|·n²/2 rows
    * and the per-group median sort is over exactly that. Slopes are
    * rounded at 6 BEFORE the median so both engines order the same
    * multiset; the median of an even count is the mean of the two middle
    * order statistics (the DuckDB `median` convention, restated with a
    * rank window here).
    */
  def theilSenByGroup(df: DataFrame, key: Column, x: Column,
      y: Column): DataFrame = {
    val base = df.select(key.as("grp"), x.cast("double").as("__x"),
      y.cast("double").as("__y"))
    val pairs = base
      .join(base.select(col("grp"), col("__x").as("__x2"),
        col("__y").as("__y2")), Seq("grp"))
      .filter(col("__x") < col("__x2"))
      .select(col("grp"), round((col("__y2") - col("__y")) /
        (col("__x2") - col("__x")), 6).as("__s"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("__s"))
    val counted = pairs
      .withColumn("__rn", row_number().over(wr))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))))
    counted
      .filter(col("__rn") === floor((col("__n") + 1) / 2).cast("int") ||
        col("__rn") === floor((col("__n") + 2) / 2).cast("int"))
      .groupBy(col("grp").as("group"))
      .agg(max(col("__n")).as("n_pairs"),
        round(avg(col("__s")), 6).as("ts_slope"))
  }
}
