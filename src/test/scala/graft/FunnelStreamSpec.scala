package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.FunnelStream
import graft.streaming.FunnelStream.{Event, Transition}

/** Streaming funnel must produce per-stage reach identical to the batch
  * face across micro-batch boundaries (the RateSpike/Cusum parity
  * contract).
  */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) = Timestamp.valueOf(f"2025-01-01 10:00:$i%02d")

  private def tsUs(i: Int, us: Int) = {
    val t = Timestamp.valueOf(f"2025-01-01 10:00:$i%02d")
    t.setNanos(us * 1000); t
  }

  private val stages = Seq("view", "click", "purchase")
  // u1 completes in order with the view/click split across batches; u2
  // clicked before viewing (stops at view); u3 view+click at the SAME
  // instant (both must count); u4 never views; u5 clicked 300 MICROseconds
  // before viewing — a millisecond-truncating micros conversion would see
  // a same-instant tie and wrongly count the click (the ADVICE sub-ms
  // parity hazard)
  private val events = Seq(
    Event(1L, ts(1), "view"), Event(1L, ts(20), "click"),
    Event(1L, ts(30), "purchase"),
    Event(2L, ts(1), "click"), Event(2L, ts(2), "view"),
    Event(3L, ts(5), "view"), Event(3L, ts(5), "click"),
    Event(4L, ts(9), "purchase"),
    Event(5L, tsUs(6, 200), "click"), Event(5L, tsUs(6, 500), "view"))

  test("transition stream matches the batch funnel stage counts across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = FunnelStream.streaming(spark, input.toDS(), stages)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(events.filter(_.timestamp.getTime <= ts(10).getTime): _*)
      q.processAllAvailable()
      input.addData(events.filter(_.timestamp.getTime > ts(10).getTime): _*)
      q.processAllAvailable()
      val trans = spark.table("funnel_out").as[Transition].collect()
      val streamCounts = trans.groupBy(_.stage_idx).map { case (i, ts) =>
        (i.toLong, ts.map(_.entity).toSet)
      }
      val batch = graft.analytics.Funnel.funnel(
          events.toDF().withColumnRenamed("timestamp", "ts"),
          col("entity"), col("ts"), col("step"), stages)
        .collect().map(r => r.getInt(0).toLong -> r.getLong(2)).toMap
      assert(streamCounts.view.mapValues(_.size.toLong).toMap === batch)
      // spot semantics: u3's same-instant chain counted; u2 stopped at
      // view; u5's 300 µs-early click must NOT count (micros precision)
      assert(streamCounts(2L).contains(3L) && !streamCounts(2L).contains(2L)
        && !streamCounts(2L).contains(5L))
      assert(streamCounts(1L).contains(5L))
      // u1 advanced across the batch boundary
      assert(streamCounts(3L) === Set(1L))
    } finally q.stop()
  }

  test("multi-stage advance within one micro-batch costs no extra batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = FunnelStream.streaming(spark, input.toDS(), stages)
      .writeStream.format("memory").queryName("funnel_fast")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Event(9L, ts(1), "view"), Event(9L, ts(2), "click"),
        Event(9L, ts(3), "purchase"))
      q.processAllAvailable()
      val got = spark.table("funnel_fast").as[Transition].collect()
        .sortBy(_.stage_idx).map(_.stage).toSeq
      assert(got === Seq("view", "click", "purchase"))
    } finally q.stop()
  }
}
