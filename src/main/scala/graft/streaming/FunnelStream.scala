package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of [[graft.analytics.Funnel.funnel]]: per-entity ordered
  * stage progression tracked live — "did this user reach checkout" is a
  * question dashboards ask continuously, not once a day. Emits one record
  * per STAGE TRANSITION (the entity advancing from stage i to i+1 at its
  * earliest qualifying event), so downstream per-stage counts are a
  * trivial aggregate of the transition stream.
  *
  * State per entity is `(stageIdx, qualifyingMicros)` — O(1), the
  * [[Ewma]]/[[Cusum]]/[[RateSpike]] contract. Semantics match the batch
  * face exactly: stage i+1 qualifies at-or-after (`>=`) the entity's
  * earliest qualifying stage-i timestamp, and because events are processed
  * in timestamp order within each micro-batch and state carries the
  * minimum qualifying time forward, the transition set is identical to the
  * batch computation on the same data (FunnelStreamSpec asserts this
  * across a mid-entity micro-batch split). An entity can advance through
  * SEVERAL stages inside one batch (view and click in the same batch must
  * not cost a batch of latency).
  *
  * Caveat shared with every streaming face here: late (out-of-order
  * across batches) events can under-count transitions that batch replay
  * would find; the batch face is the reconciliation path.
  */
object FunnelStream {

  case class Event(entity: Long, timestamp: java.sql.Timestamp, step: String)
  case class Transition(entity: Long, stage_idx: Int, stage: String,
      timestamp: java.sql.Timestamp)

  /** Full-precision epoch micros. `getTime * 1000` truncates the
    * sub-millisecond part a `java.sql.Timestamp` carries in `getNanos`,
    * silently breaking the exact `unix_micros` parity with the batch face
    * on microsecond-resolution ties (`>=` qualification) — so micros are
    * derived from (epoch second, nanos) exactly, matching Catalyst's own
    * Timestamp→micros conversion.
    */
  private[streaming] def micros(t: java.sql.Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.getNanos / 1000L

  def streaming(spark: SparkSession, input: Dataset[Event],
      stages: Seq[String]): Dataset[Transition] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages, s"funnel stages must be distinct: $stages")
    import spark.implicits._
    val stageArr = stages.toArray
    input
      .groupByKey(_.entity)
      .flatMapGroupsWithState[(Int, Long), Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (entity: Long, rows: Iterator[Event], state: GroupState[(Int, Long)]) =>
          // same-instant events process in STAGE order: the batch face
          // lets a same-timestamp view→click chain count (>=), so the
          // stream must see the earlier stage first to take both
          val sorted = rows.toSeq.sortBy(e =>
            (micros(e.timestamp), stageArr.indexOf(e.step)))
          var (idx, qualUs) = state.getOption.getOrElse((0, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
          sorted.foreach { e =>
            val us = micros(e.timestamp)
            if (idx < stageArr.length && e.step == stageArr(idx) &&
                (idx == 0 || us >= qualUs)) {
              idx += 1
              qualUs = us
              out += Transition(entity, idx, stageArr(idx - 1), e.timestamp)
            }
          }
          state.update((idx, qualUs))
          out.iterator
      }
  }
}
