package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** EWMA smoothing — the reference's one genuinely stateful per-key operator
  * (ref `producer_wind.py:218-228`: `0.35·new + 0.65·prev` against the
  * previously *emitted* value, i.e. a recursive filter, not a moving
  * average).
  *
  * Batch form: the recursion unrolls to a closed-form weighted sum
  * e_n = Σ_{k=2..n} α(1−α)^{n−k}·x_k + (1−α)^{n−1}·x_1, computed with one
  * window (row_number + count) — no sequential scan, fully parallel per key.
  *
  * Streaming form: `flatMapGroupsWithState` carrying the previous smoothed
  * value per key — O(1) state per key, watermark-free because state is one
  * double (no growth), emitting one smoothed record per input.
  */
object Ewma {

  case class Reading(station_id: String, timestamp: java.sql.Timestamp, value: Double)
  case class Smoothed(station_id: String, timestamp: java.sql.Timestamp,
      value: Double, ewma: Double)

  /** Batch EWMA, running value per row: repartition on the key, sort within
    * partitions, sequential fold per key run. One shuffle total; the fold is
    * the only non-declarative op in the engine and is inherent to a
    * recursive filter (each output depends on the previous output).
    */
  def batchRunning(spark: SparkSession, df: Dataset[Reading],
      alpha: Double = 0.35): Dataset[Smoothed] = {
    import spark.implicits._
    df.repartition(col("station_id"))
      .sortWithinPartitions(col("station_id"), col("timestamp"))
      .mapPartitions { rows =>
        var curKey: String = null
        var prev = 0.0
        var has = false
        rows.map { r =>
          if (r.station_id != curKey) { curKey = r.station_id; has = false }
          val e = if (has) alpha * r.value + (1 - alpha) * prev else r.value
          prev = e; has = true
          Smoothed(r.station_id, r.timestamp, r.value, e)
        }
      }
  }

  /** Batch EWMA final value per key via the closed-form weighted sum.
    * Weights (1−α)^{n−k} ≤ 1 underflow gracefully for old rows, so this is
    * numerically stable at any history length and fully declarative (one
    * window + one aggregate, no sequential scan).
    */
  def batchFinal(df: DataFrame, key: String, order: Seq[String], valueCol: String,
      alpha: Double = 0.35): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(order.map(col): _*)
    val wk = Window.partitionBy(col(key))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wk))
      .withColumn("__w",
        when(col("__rn") === 1, pow(lit(1 - alpha), col("__n") - 1))
          .otherwise(lit(alpha) * pow(lit(1 - alpha), col("__n") - col("__rn"))))
      .groupBy(col(key))
      .agg(round(sum(col("__w") * col(valueCol)), 6).as("ewma"))
  }

  /** Streaming EWMA via flatMapGroupsWithState (SURVEY.md T6/D22). */
  def streaming(spark: SparkSession, input: Dataset[Reading],
      alpha: Double = 0.35): Dataset[Smoothed] = {
    import spark.implicits._
    input
      .groupByKey(_.station_id)
      .flatMapGroupsWithState[Double, Smoothed](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Reading], state: GroupState[Double]) =>
          // micro-batches can carry several rows per key: fold in event order
          val sorted = rows.toSeq.sortBy(_.timestamp.getTime)
          var prev = state.getOption
          val out = sorted.map { r =>
            val e = prev.fold(r.value)(p => alpha * r.value + (1 - alpha) * p)
            prev = Some(e)
            Smoothed(key, r.timestamp, r.value, e)
          }
          prev.foreach(state.update)
          out.iterator
      }
  }
}
