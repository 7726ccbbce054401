package graft

import org.apache.spark.sql.functions._
import graft.analytics.{Aggregates, Correlation, Distribution, Ranking}

/** A-family + O-family over small hand-checkable frames. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    ("S1", 1, 10.0), ("S1", 2, 20.0), ("S1", 3, 30.0),
    ("S2", 1, 5.0), ("S2", 2, 5.0)).toDF("station", "t", "power")

  test("A5 capacity factor: per-group mean over global max") {
    val out = Aggregates.capacityFactor(df, col("station"), col("power"), valueScale = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("S1") - 20.0 / 30.0 * 100.0) < 1e-6)
    assert(math.abs(out("S2") - 5.0 / 30.0 * 100.0) < 1e-6)
  }

  test("A8 describe: exact quartiles with interpolation") {
    val out = Aggregates.describe(df.filter(col("station") === "S1"),
      col("station"), col("power"), valueScale = 2).head()
    assert(out.getAs[Double]("p50") === 20.0)
    assert(out.getAs[Double]("p25") === 15.0)
    assert(out.getAs[Double]("mean") === 20.0)
  }

  test("A9 histogram buckets by fixed width") {
    val out = Distribution.histogram(df, col("power"), 10.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) === 2) // 5, 5
    assert(out(1L) === 1) // 10
    assert(out(3L) === 1) // 30
  }

  test("A12 linear trend recovers a perfect line") {
    val line = Seq.tabulate(10)(i => ("k", i.toDouble, 3.0 * i + 7.0))
      .toDF("k", "x", "y")
    val out = Correlation.linearTrend(line, col("k"), col("x"), col("y")).head()
    assert(out.getAs[Double]("slope") === 3.0)
    assert(out.getAs[Double]("intercept") === 7.0)
  }

  test("A11 corr matrix: key with itself = 1, anti-correlated pair = -1") {
    val two = Seq(("b1", "A", 1.0), ("b1", "B", 4.0), ("b2", "A", 2.0),
      ("b2", "B", 3.0), ("b3", "A", 3.0), ("b3", "B", 2.0))
      .toDF("bucket", "k", "v")
    val m = Correlation.corrMatrix(two, col("bucket"), col("k"), col("v"), valueScale = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m(("A", "A")) === 1.0)
    assert(m(("A", "B")) === -1.0)
  }

  test("approx quartiles stay within tolerance of exact at any partitioning") {
    val vals = (1 to 5000).map(i => ("k", (i % 997) * 0.37)).toDF("k", "v")
    for (parts <- Seq(1, 7)) {
      val rows = Aggregates.approxQuartilesWithin(vals.repartition(parts),
        col("k"), col("v")).collect()
      assert(rows.length === 1)
      val r = rows.head
      assert(r.getAs[Boolean]("p25_ok") && r.getAs[Boolean]("p50_ok") &&
        r.getAs[Boolean]("p75_ok"), s"parts=$parts")
    }
  }

  test("O1/P13/P14 ranking and recency windows") {
    val ranked = Ranking.rankByAggregate(df, col("station"),
      sum(col("power")), "total").collect()
      .map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(ranked("S1") === 1)
    assert(ranked("S2") === 2)
    val lastTwo = Ranking.lastNPerKey(df, Seq(col("station")), Seq(col("t")), 2)
    assert(lastTwo.count() === 4)
    val latest = Ranking.lastPerKey(df, Seq(col("station")), Seq(col("t")))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(latest === Map("S1" -> 3, "S2" -> 2))
  }
}
