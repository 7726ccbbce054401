package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dashboard alert rule (ref `Solar_Generation.py:289-290`,
  * `Wind_Genration.py:26,430-431`): flag stations whose LATEST reading is
  * below the power threshold (solar < 100 kW, wind < 5 kW).
  *
  * Shape: P14 latest-per-key (one window keyed by station) then a flag
  * column — the alert scan never touches more than |stations| rows after
  * the window.
  */
object Alerts {

  val SolarThresholdKw = 100.0
  val WindThresholdKw = 5.0

  def lowPower(df: DataFrame, key: Seq[Column], order: Seq[Column],
      power: Column, thresholdKw: Double): DataFrame =
    Ranking.lastPerKey(df, key, order)
      .withColumn("alert", power < thresholdKw)
      .withColumn("threshold_kW", lit(thresholdKw))

  /** Per-group z-score outliers: rows whose `value` sits more than
    * `threshold` sample standard deviations from the group mean — the
    * statistical anomaly screen behind sensor-fault detection (and, on the
    * corpus side, metric-outlier document filtering).
    *
    * Shape: one grouped aggregate to |groups| rows of (mean, stddev), then
    * a broadcast join back and a narrow filter — the detail table is
    * scanned twice but shuffled never (group stats move, not rows). Mean
    * and stddev are plain doubles: their merge-order noise (~1 ulp) is
    * microscopic against any meaningful threshold margin, the same
    * contract as the corr/regression operators. Groups with zero variance
    * (stddev 0 or null for singletons) produce no outliers.
    */
  def zscoreOutliers(df: DataFrame, group: Column, value: Column,
      threshold: Double): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    val stats = df.groupBy(group.as("__g"))
      .agg(avg(value).as("__mu"), stddev(value).as("__sd"))
    df.join(broadcast(stats), group === col("__g"))
      .filter(col("__sd") > 0.0 &&
        abs((value - col("__mu")) / col("__sd")) > threshold)
      .drop("__g", "__mu", "__sd")
  }

  /** SEASONAL-baseline outliers: z-score against the (group × hour-of-day)
    * profile instead of the flat group mean — a reading that is normal at
    * noon can be a fault at 3 am, and [[zscoreOutliers]]'s all-day baseline
    * cannot see it (solar output being the canonical case: the daily cycle
    * IS the signal). The profile key is derived, so any seasonality column
    * works (hour, day-of-week) by passing a different `season` expression.
    *
    * Shape: one grouped aggregate to |groups × seasons| rows (bounded:
    * ≤ 24·|groups| for hourly), broadcast back, narrow filter — rows never
    * shuffle, the [[zscoreOutliers]] discipline. Zero-variance and
    * singleton cells emit nothing.
    */
  def seasonalOutliers(df: DataFrame, group: Column, season: Column,
      value: Column, threshold: Double): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    val stats = df.groupBy(group.as("__g"), season.as("__s"))
      .agg(avg(value).as("__mu"), stddev(value).as("__sd"))
    df.join(broadcast(stats), group === col("__g") && season === col("__s"))
      .filter(col("__sd") > 0.0 &&
        abs((value - col("__mu")) / col("__sd")) > threshold)
      .drop("__g", "__s", "__mu", "__sd")
  }

  /** Per-group ROBUST (median/MAD) outliers: rows whose `value` sits more
    * than `threshold` scaled median-absolute-deviations from the group
    * median — the screen [[zscoreOutliers]] cannot be: a cluster of
    * extreme readings inflates the mean and stddev enough to hide itself
    * (masking), while the median and MAD barely move. The 1.4826 factor
    * makes MAD consistent with the stddev of a normal distribution, so
    * `threshold` reads in the same sigma-like units as the z-score's.
    *
    * Shape: two grouped EXACT-percentile aggregates (median, then the
    * median of absolute deviations), each reduced to |groups| rows and
    * broadcast back — group stats move, rows never shuffle, the
    * [[zscoreOutliers]] discipline. Groups with MAD 0 (over half the
    * group identical) or null values produce no outliers.
    */
  def madOutliers(df: DataFrame, group: Column, value: Column,
      threshold: Double): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    val med = df.groupBy(group.as("__g"))
      .agg(percentile(value, lit(0.5)).as("__med"))
    val withMed = df.join(broadcast(med), group === col("__g"))
    val mad = withMed.groupBy(col("__g").as("__g2"))
      .agg(percentile(abs(value - col("__med")), lit(0.5)).as("__mad"))
    withMed.join(broadcast(mad), col("__g") === col("__g2"))
      .filter(col("__mad") > 0.0 &&
        abs(value - col("__med")) > lit(threshold * 1.4826) * col("__mad"))
      .drop("__g", "__g2", "__med", "__mad")
  }

  /** Local-peak detector: rows strictly greater than BOTH neighbors in
    * the per-key time order, at or above `minHeight` — the
    * peak-load/spike-event extractor (demand peaks, power surges) that
    * complements [[rateSpikes]] (a peak can build slowly enough that no
    * single step trips the rate rule). First/last rows of a key have only
    * one neighbor and are never peaks — an endpoint "peak" is a window
    * artifact, not a detected event.
    *
    * Scale shape: one per-key window (lag + lead share the single sort),
    * narrow filter; output is peak-sized.
    */
  def localPeaks(df: DataFrame, key: Column, order: Seq[Column], id: Column,
      value: Column, minHeight: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__k"))
      .orderBy((1 to order.size).map(i => col(s"__o$i").asc): _*)
    val base = df.select(
      (id.as("id") +: key.as("__k") +: value.cast("double").as("__v") +:
        order.zipWithIndex.map { case (o, i) => o.as(s"__o${i + 1}") }): _*)
    base
      .withColumn("__pv", lag(col("__v"), 1).over(w))
      .withColumn("__nv", lead(col("__v"), 1).over(w))
      .filter(col("__pv").isNotNull && col("__nv").isNotNull &&
        col("__v") > col("__pv") && col("__v") > col("__nv") &&
        col("__v") >= minHeight)
      .select(col("id"), col("__k").as("key"), col("__v").as("value"))
  }

  /** Rate-of-change screen: per key, the first difference of the value
    * series divided by the elapsed seconds to the previous reading, with a
    * spike flag at `|rate| > threshold` — the physical-plausibility rule
    * (a temperature cannot move 50°/minute) that catches transients the
    * LEVEL-based screens above are blind to: a reading can be inside the
    * group's z-score and MAD bands and still be an impossible jump.
    *
    * Emits every row that HAS a predecessor (`dt_us` exact integer micros,
    * `rate` per second, `is_spike`), not just the alarms, so downstream
    * dashboards can threshold differently without a rescan. Events at
    * duplicate timestamps (dt 0) are rate-null and never flagged — a rate
    * across zero elapsed time is undefined, not infinite.
    *
    * Shape: one per-key window (sort paid once, same contract as the
    * sessionize/gap operators) and a narrow projection — no joins, no
    * second scan. The flag compares the UNROUNDED rate; per-row arithmetic
    * on exact integer micros and raw doubles is deterministic, so the flag
    * can't flip under partitioning.
    */
  def rateSpikes(df: DataFrame, key: Column, time: Column, order: Seq[Column],
      id: Column, value: Column, threshold: Double): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__k"))
      .orderBy(col("__us").asc +: (1 to order.size).map(i => col(s"__o$i").asc): _*)
    val base = df.select(
      (id.as("id") +: key.as("__k") +: unix_micros(time).as("__us") +:
        value.cast("double").as("__v") +:
        order.zipWithIndex.map { case (o, i) => o.as(s"__o${i + 1}") }): _*)
    val stepped = base.select(col("id"), col("__k").as("key"),
      (col("__us") - lag(col("__us"), 1).over(w)).as("dt_us"),
      (col("__v") - lag(col("__v"), 1).over(w)).as("__dv"))
    val rate = when(col("dt_us") > 0,
      col("__dv") / (col("dt_us").cast("double") / 1.0e6))
    stepped
      .filter(col("dt_us").isNotNull)
      .select(col("id"), col("key"), col("dt_us"),
        round(rate, 6).as("rate"),
        coalesce(abs(rate) > threshold, lit(false)).as("is_spike"))
  }
}
