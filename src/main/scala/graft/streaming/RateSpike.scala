package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of [[graft.analytics.Alerts.rateSpikes]]: the
  * physical-plausibility screen (|Δvalue/Δt| above threshold) evaluated
  * live on the sensor stream. Alarms about impossible jumps are precisely
  * the alerts that are worthless a batch-cycle later, so this is the
  * member of the alert family that most wants a streaming twin (the
  * [[Ewma]]/[[Cusum]]/[[Sessionize]] pattern).
  *
  * State per key is the last (micros, value) pair — O(1), no watermark
  * needed (late data would need one; this matches the batch face, which
  * also assumes per-key time order). The first reading of a key emits
  * nothing (no predecessor — same rule as the batch face's null-lag
  * filter), and a duplicate timestamp emits a rate-null, unflagged record
  * (a rate across zero elapsed time is undefined, not infinite).
  */
object RateSpike {

  case class Reading(station_id: String, timestamp: java.sql.Timestamp, value: Double)
  case class Rated(station_id: String, timestamp: java.sql.Timestamp,
      value: Double, dt_us: Long, rate: Option[Double], is_spike: Boolean)

  def streaming(spark: SparkSession, input: Dataset[Reading],
      threshold: Double): Dataset[Rated] = {
    require(threshold > 0, "threshold must be positive")
    import spark.implicits._
    input
      .groupByKey(_.station_id)
      .flatMapGroupsWithState[(Long, Double), Rated](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Reading], state: GroupState[(Long, Double)]) =>
          val sorted = rows.toSeq.sortBy(r => FunnelStream.micros(r.timestamp))
          var prev = state.getOption
          val out = sorted.flatMap { r =>
            // full-precision micros (FunnelStream.micros): getTime*1000
            // would truncate sub-ms parts and break the exact unix_micros
            // batch parity on microsecond dt/ties
            val us = FunnelStream.micros(r.timestamp)
            val rec = prev.map { case (pUs, pV) =>
              val dt = us - pUs
              val rate =
                if (dt > 0) Some((r.value - pV) / (dt.toDouble / 1.0e6)) else None
              Rated(key, r.timestamp, r.value, dt,
                rate.map(x => math.rint(x * 1e6) / 1e6),
                rate.exists(x => math.abs(x) > threshold))
            }
            prev = Some((us, r.value))
            rec
          }
          state.update(prev.get)
          out.iterator
      }
  }
}
