package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.RateSpike
import graft.streaming.RateSpike.{Rated, Reading}

/** Streaming rate-spike face must agree row-for-row with the batch face
  * across micro-batch boundaries (the Cusum/Ewma parity contract).
  */
class RateSpikeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) = Timestamp.valueOf(f"2025-01-01 10:00:$i%02d")

  private def tsUs(i: Int, us: Int) = {
    val t = Timestamp.valueOf(f"2025-01-01 10:00:$i%02d")
    t.setNanos(us * 1000); t
  }

  // A: quiet then a 10-units-in-1-s jump; B: steady; A has a duplicate
  // timestamp at :04 (dt 0 → rate-null); C: two readings 500 MICROseconds
  // apart — a millisecond-truncating micros conversion would report dt 0 /
  // rate null while the batch face (exact unix_micros) reports dt_us 500
  // (the ADVICE sub-ms parity hazard)
  private val readings = Seq(
    Reading("A", ts(1), 1.0), Reading("A", ts(2), 1.2),
    Reading("A", ts(3), 11.2), Reading("A", ts(4), 11.0),
    Reading("A", ts(4), 99.0),
    Reading("B", ts(1), 5.0), Reading("B", ts(3), 5.4),
    Reading("C", tsUs(5, 250), 1.0), Reading("C", tsUs(5, 750), 1.0005))

  test("streaming face equals batch face across micro-batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Reading]
    val q = RateSpike.streaming(spark, input.toDS(), threshold = 2.0)
      .writeStream.format("memory").queryName("rate_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // split mid-key so the state must carry (A's jump spans the boundary)
      input.addData(readings.filter(_.timestamp.getTime <= ts(2).getTime): _*)
      q.processAllAvailable()
      input.addData(readings.filter(_.timestamp.getTime > ts(2).getTime): _*)
      q.processAllAvailable()
      val got = spark.table("rate_out").as[Rated].collect()
        .map(r => (r.station_id, r.dt_us, r.rate, r.is_spike))
        .sortBy(t => (t._1, t._2, t._3.getOrElse(0.0)))
      // batch face over the same data; the duplicate-ts row gets a
      // distinct id so (key, ts, id) is a total order matching arrival
      val df = readings.zipWithIndex
        .map { case (r, i) => (i.toLong, r.station_id, r.timestamp, r.value) }
        .toDF("id", "k", "ts", "v").repartition(3)
      val batch = graft.analytics.Alerts.rateSpikes(df, col("k"), col("ts"),
          Seq(col("id")), col("id"), col("v"), threshold = 2.0)
        .collect()
        .map(r => (r.getString(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4)))
        .sortBy(t => (t._1, t._2, t._3.getOrElse(0.0)))
      assert(got.toSeq === batch.toSeq)
      // and the jump row is actually flagged
      assert(got.count(_._4) === 1)
      // the sub-ms pair survived at full precision (dt 500 µs, rate 1.0)
      assert(got.exists(t => t._1 == "C" && t._2 == 500L))
    } finally q.stop()
  }

  test("first reading of a key emits nothing") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Reading]
    val q = RateSpike.streaming(spark, input.toDS(), threshold = 1.0)
      .writeStream.format("memory").queryName("rate_first")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Reading("Z", ts(1), 3.0))
      q.processAllAvailable()
      assert(spark.table("rate_first").count() === 0)
      input.addData(Reading("Z", ts(2), 4.0))
      q.processAllAvailable()
      val rows = spark.table("rate_first").as[Rated].collect()
      assert(rows.length === 1 && rows.head.rate === Some(1.0))
    } finally q.stop()
  }
}
