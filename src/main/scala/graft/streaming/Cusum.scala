package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Two-sided CUSUM drift detection — the sequential change-detector behind
  * sensor-calibration drift alarms (the reference's dashboards threshold
  * LEVELS, e.g. `Solar_Generation.py:289-290`; CUSUM catches the slow mean
  * SHIFT a level threshold misses until far too late). Data-curation twin:
  * detecting quality-score drift across a crawl ordered by fetch time.
  *
  * The recursions
  * {{{
  *   hi_i = max(0, hi_{i-1} + (x_i - target - slack))
  *   lo_i = max(0, lo_{i-1} - (x_i - target) - slack)
  * }}}
  * look inherently sequential, but each unrolls to the closed form
  * `hi_i = S_i - min(0, min_{j<=i} S_j)` with `S` the running sum of the
  * drift increments — so the batch face is two stacked linear window
  * passes (running sum, then running min), one shuffle on the key, no
  * sequential fold and no `mapPartitions`. The streaming face carries the
  * two live statistics per key through `flatMapGroupsWithState` — O(1)
  * state per key, the [[Ewma]] pattern.
  */
object Cusum {

  case class Reading(station_id: String, timestamp: java.sql.Timestamp, value: Double)
  case class Scored(station_id: String, timestamp: java.sql.Timestamp,
      value: Double, cusum_hi: Double, cusum_lo: Double, drift: Boolean)

  /** Batch CUSUM per key, scoring every row. `target` is the in-control
    * mean, `slack` the half dead-band k (drift smaller than `slack` per
    * observation never accumulates), `threshold` the alarm level h. Pass
    * `order` columns making (key, order) unique — the running sums (and so
    * the scores) are order-deterministic only then.
    *
    * Scale shape: ONE shuffle on `key`; both window passes use running
    * frames (no full-partition buffering); a hot key serializes in one
    * task — the [[graft.analytics.Sessions.sessionize]] caveat.
    */
  def batch(df: DataFrame, key: Column, order: Seq[Column], value: Column,
      target: Double, slack: Double, threshold: Double): DataFrame = {
    require(slack >= 0, s"slack must be >= 0, got $slack")
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    val w = Window.partitionBy(key).orderBy(order.map(_.asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sHi = sum(value - lit(target) - lit(slack)).over(w)
    val sLo = sum(lit(target) - value - lit(slack)).over(w)
    // min over j <= i includes S_i itself: when S_i is the running minimum
    // and negative, the score is exactly 0 — the max(0, ·) clamp.
    val base = df.withColumn("__sh", sHi).withColumn("__sl", sLo)
    val hi = col("__sh") - least(min(col("__sh")).over(w), lit(0.0))
    val lo = col("__sl") - least(min(col("__sl")).over(w), lit(0.0))
    base
      .withColumn("cusum_hi", round(hi, 6))
      .withColumn("cusum_lo", round(lo, 6))
      .withColumn("drift", hi > threshold || lo > threshold)
      .drop("__sh", "__sl")
  }

  /** Streaming CUSUM via `flatMapGroupsWithState`: state is the pair of
    * live statistics, emitting one scored record per input. Exactly the
    * recursion the batch closed form unrolls — CusumSpec asserts the two
    * faces agree row-for-row.
    */
  def streaming(spark: SparkSession, input: Dataset[Reading],
      target: Double, slack: Double, threshold: Double): Dataset[Scored] = {
    import spark.implicits._
    input
      .groupByKey(_.station_id)
      .flatMapGroupsWithState[(Double, Double), Scored](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Reading], state: GroupState[(Double, Double)]) =>
          val sorted = rows.toSeq.sortBy(_.timestamp.getTime)
          var (hi, lo) = state.getOption.getOrElse((0.0, 0.0))
          val out = sorted.map { r =>
            hi = math.max(0.0, hi + (r.value - target - slack))
            lo = math.max(0.0, lo + (target - r.value - slack))
            Scored(key, r.timestamp, r.value,
              math.rint(hi * 1e6) / 1e6, math.rint(lo * 1e6) / 1e6,
              hi > threshold || lo > threshold)
          }
          state.update((hi, lo))
          out.iterator
      }
  }
}
