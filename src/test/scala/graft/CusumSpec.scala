package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Cusum
import graft.streaming.Cusum.{Reading, Scored}

/** CUSUM drift detection — the batch closed form (running sum minus running
  * min) must equal the textbook recursion, and the streaming face must
  * carry its two statistics across micro-batches.
  */
class CusumSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) = Timestamp.valueOf(f"2025-01-01 10:00:$i%02d")

  // target 10, slack 1: A drifts high from row 3, B stays in band, C dips
  private val readings = Seq(
    Reading("A", ts(1), 10.0), Reading("A", ts(2), 9.0),
    Reading("A", ts(3), 14.0), Reading("A", ts(4), 15.0),
    Reading("A", ts(5), 13.0),
    Reading("B", ts(1), 10.5), Reading("B", ts(2), 9.5),
    Reading("C", ts(1), 4.0), Reading("C", ts(2), 3.0))

  /** Textbook recursion, the ground truth both faces must reproduce. */
  private def recur(xs: Seq[Double], target: Double, slack: Double,
      threshold: Double): Seq[(Double, Double, Boolean)] = {
    var hi = 0.0; var lo = 0.0
    xs.map { x =>
      hi = math.max(0.0, hi + (x - target - slack))
      lo = math.max(0.0, lo + (target - x - slack))
      (hi, lo, hi > threshold || lo > threshold)
    }
  }

  test("batch closed form equals the recursion on every row") {
    val out = Cusum.batch(readings.toDF(), col("station_id"),
        Seq(col("timestamp")), col("value"),
        target = 10.0, slack = 1.0, threshold = 5.0)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime,
        r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
      .sortBy(t => (t._1, t._2))
    for (k <- Seq("A", "B", "C")) {
      val vals = readings.filter(_.station_id == k).sortBy(_.timestamp.getTime)
      val want = recur(vals.map(_.value), 10.0, 1.0, 5.0)
      val got = out.filter(_._1 == k).map(t => (t._3, t._4, t._5)).toSeq
      assert(got === want, s"key $k")
    }
    // the fixture exercises both sides: A alarms high, C accumulates low
    val a = out.filter(_._1 == "A")
    assert(a.last._3 === 9.0 && a.last._5, "A drifts past threshold")
    val c = out.filter(_._1 == "C")
    assert(c.last._4 === 11.0 && c.last._5, "C dips past threshold")
    val b = out.filter(_._1 == "B")
    assert(b.forall(t => t._3 === 0.0 && t._4 === 0.0 && !t._5),
      "in-band key never accumulates")
  }

  test("streaming face carries both statistics across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Reading]
    val q = Cusum.streaming(spark, input.toDS(),
        target = 10.0, slack = 1.0, threshold = 5.0)
      .writeStream.format("memory").queryName("cusum_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(readings.filter(_.timestamp.getTime <= ts(2).getTime): _*)
      q.processAllAvailable()
      input.addData(readings.filter(_.timestamp.getTime > ts(2).getTime): _*)
      q.processAllAvailable()
      val got = spark.table("cusum_out").as[Scored].collect()
        .sortBy(r => (r.station_id, r.timestamp.getTime))
      val batch = Cusum.batch(readings.toDF(), col("station_id"),
          Seq(col("timestamp")), col("value"),
          target = 10.0, slack = 1.0, threshold = 5.0)
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime,
          r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
        .sortBy(t => (t._1, t._2))
      assert(got.length === batch.length)
      got.zip(batch).foreach { case (s, b) =>
        assert((s.station_id, s.timestamp.getTime,
          s.cusum_hi, s.cusum_lo, s.drift) === b)
      }
    } finally q.stop()
  }
}
