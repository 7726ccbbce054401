package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of [[graft.analytics.Sessions.sessionize]]: per-EVENT
  * session labeling (1-based `session_idx` per key, in event-time order)
  * over an unbounded stream, completing the dual-face pattern [[Ewma]] and
  * [[Cusum]] already follow (batch window formulation + O(1)-state
  * `flatMapGroupsWithState` twin).
  *
  * This is deliberately NOT `session_window` (that face exists —
  * [[graft.analytics.Sessions.sessionAgg]] — and emits one row per
  * *session*): labeling each event with its session index is what a
  * training-data pipeline needs to carry episode identity onto every
  * interaction record before per-episode feature extraction.
  *
  * State per key is two longs (last event-time micros, current index), so
  * state size is O(keys) and never grows with stream length — no watermark
  * needed for state hygiene. Correctness contract matches the other
  * recursive faces: within a micro-batch rows are sorted by event time;
  * ACROSS micro-batches arrival must respect per-key event order (true for
  * an ordered log replay / Kafka partition-per-key). An event arriving
  * late, after a later event of the same key was already labeled, would by
  * then have a batch-face label that streaming cannot retroactively fix —
  * the inherent append-mode limit, same as streaming EWMA.
  */
object Sessionize {

  case class Event(station_id: String, timestamp: java.sql.Timestamp, value: Double)
  case class Labeled(station_id: String, timestamp: java.sql.Timestamp,
      value: Double, session_idx: Long)

  /** (lastMicros, currentIdx) carried per key across micro-batches. */
  def streaming(spark: SparkSession, input: Dataset[Event],
      gapSeconds: Long): Dataset[Labeled] = {
    require(gapSeconds > 0, "gapSeconds must be positive")
    import spark.implicits._
    val gapMicros = gapSeconds * 1000000L
    input
      .groupByKey(_.station_id)
      .flatMapGroupsWithState[(Long, Long), Labeled](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Event], state: GroupState[(Long, Long)]) =>
          // java.sql.Timestamp.getTime is millis; the batch face compares
          // unix_micros. Millis→micros keeps the same gap decisions because
          // the comparison is a subtraction against a micro-scaled gap.
          val sorted = rows.toSeq.sortBy(_.timestamp.getTime)
          var (last, idx) = state.getOption.getOrElse((Long.MinValue, 0L))
          val out = sorted.map { e =>
            val t = e.timestamp.getTime * 1000L
            if (idx == 0L || t - last > gapMicros) idx += 1
            last = t
            Labeled(key, e.timestamp, e.value, idx)
          }
          state.update((last, idx))
          out.iterator
      }
  }
}
