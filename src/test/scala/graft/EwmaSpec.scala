package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Ewma
import graft.streaming.Ewma.{Reading, Smoothed}

/** D22/T6 EWMA — recursive filter semantics
  * (ref `producer_wind.py:218-228`: e = 0.35*x + 0.65*prev).
  */
class EwmaSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) = Timestamp.valueOf(f"2025-01-01 10:00:$i%02d")

  private val readings = Seq(
    Reading("A", ts(1), 10.0), Reading("A", ts(2), 20.0), Reading("A", ts(3), 15.0),
    Reading("B", ts(1), 5.0), Reading("B", ts(2), 5.0))

  private def expected(xs: Seq[Double], alpha: Double = 0.35): Seq[Double] =
    xs.tail.scanLeft(xs.head)((prev, x) => alpha * x + (1 - alpha) * prev)

  test("batchRunning matches the unrolled recursion per key") {
    val out = Ewma.batchRunning(spark, readings.toDS())
      .collect().sortBy(r => (r.station_id, r.timestamp.getTime))
    val a = out.filter(_.station_id == "A").map(_.ewma).toSeq
    val b = out.filter(_.station_id == "B").map(_.ewma).toSeq
    assert(a.zip(expected(Seq(10.0, 20.0, 15.0))).forall { case (x, y) => math.abs(x - y) < 1e-12 })
    assert(b.zip(expected(Seq(5.0, 5.0))).forall { case (x, y) => math.abs(x - y) < 1e-12 })
  }

  test("batchFinal closed form equals the last running value") {
    val fin = Ewma.batchFinal(readings.toDF(), "station_id",
      Seq("timestamp"), "value")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(fin("A") - expected(Seq(10.0, 20.0, 15.0)).last) < 1e-6)
    assert(math.abs(fin("B") - 5.0) < 1e-6)
  }

  test("streaming flatMapGroupsWithState carries state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Reading]
    val q = Ewma.streaming(spark, input.toDS())
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(readings.take(2): _*) // A: 10, 20
      q.processAllAvailable()
      input.addData(readings(2))          // A: 15 — needs prev state 13.5
      q.processAllAvailable()
      val got = spark.table("ewma_out").as[Smoothed]
        .collect().filter(_.station_id == "A")
        .sortBy(_.timestamp.getTime).map(_.ewma).toSeq
      val want = expected(Seq(10.0, 20.0, 15.0))
      assert(got.size === 3)
      assert(got.zip(want).forall { case (x, y) => math.abs(x - y) < 1e-12 })
    } finally q.stop()
  }

  test("s10: ordered-replay drain equals batchRunning, incl. sub-ms order") {
    // rows 2 and 3 sit 500 µs apart INSIDE one millisecond: a ms-truncated
    // sort would fold them in arrival order and diverge from the batch face
    def us(base: Int, micros: Int): Timestamp = {
      val t = Timestamp.valueOf(f"2025-01-01 10:00:$base%02d")
      t.setNanos(micros * 1000); t
    }
    // the two sub-ms rows ARRIVE out of microsecond order (700 µs before
    // 200 µs): a ms-truncated stable sort would keep arrival order and
    // fold 15.0 before 20.0, diverging from the batch face — arriving
    // pre-sorted would mask exactly the truncation regression this pins
    val rows = Seq(
      Reading("A", us(1, 0), 10.0), Reading("A", us(2, 700), 15.0),
      Reading("A", us(2, 200), 20.0), Reading("A", us(30, 0), 40.0),
      Reading("B", us(2, 0), 5.0), Reading("B", us(45, 0), 8.0))
    val got = Ewma.drainParity(spark, rows.toDF(), inputFiles = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    val want = Ewma.batchRunning(spark, rows.toDS())
      .collect().map(s => (s.station_id,
        s.timestamp.toInstant.getEpochSecond * 1000000L +
          s.timestamp.getNanos / 1000) ->
        (s.value, math.rint(s.ewma * 1e3) / 1e3)).toMap
    assert(got === want)
    assert(got.size === 6)
  }
}
