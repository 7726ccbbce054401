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
}
