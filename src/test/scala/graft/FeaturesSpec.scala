package graft

import org.apache.spark.sql.functions._
import graft.features.Features

/** D1-D8, D19, D23 feature columns (ref `Solar_Processing.py:39-57`,
  * `Wind_Dashboard.py:125-131`).
  */
class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def str(c: org.apache.spark.sql.Column): String =
    Seq(1).toDF("x").select(c.cast("string")).head().getString(0)

  test("D5 Day/Night uses the pandas boundary 6 <= h < 18") {
    assert(str(Features.timeOfDay(lit(5))) === "Night")
    assert(str(Features.timeOfDay(lit(6))) === "Day")
    assert(str(Features.timeOfDay(lit(17))) === "Day")
    assert(str(Features.timeOfDay(lit(18))) === "Night")
  }

  test("D1 UTC->Cairo is +02:00 in winter (standard time)") {
    val out = Seq("2025-11-04 20:13:36").toDF("t")
      .select(date_format(Features.localTimestamp(to_timestamp(col("t"))),
        "yyyy-MM-dd HH:mm:ss"))
      .head().getString(0)
    assert(out === "2025-11-04 22:13:36")
  }

  test("D19 wind classes are right-closed pd.cut bins; outside (0,100] is null") {
    def cls(v: Double): Any =
      Seq(v).toDF("v").select(Features.windClass(col("v"))).head().get(0)
    assert(cls(0.0) === null)      // pd.cut: 0 is outside (0, 3]
    assert(cls(1.0) === "Calm")
    assert(cls(3.0) === "Calm")    // right-closed
    assert(cls(3.01) === "Light")
    assert(cls(12.0) === "Moderate")
    assert(cls(20.5) === "Gale")
    assert(cls(100.0) === "Gale")
    assert(cls(100.5) === null)    // beyond the last bin edge
  }

  test("D6 validity flag is null-conjunction") {
    val df = Seq((Some(1.0), Some(2.0)), (None, Some(2.0)), (Some(1.0), None))
      .toDF("a", "b")
      .select(Features.isValid(col("a"), col("b")).as("v"))
    assert(df.collect().map(_.getBoolean(0)).toSeq === Seq(true, false, false))
  }

  test("D8 capacity utilization via literal map lookup") {
    val out = Seq(("BSPP", 825000.0)).toDF("sid", "p")
      .select(Features.capacityUtilization(col("p"), col("sid"),
        Map("BSPP" -> 1650000.0)))
      .head().getDouble(0)
    assert(out === 50.0)
  }

  test("D23 prettify: snake_case -> Title Case") {
    assert(str(Features.prettify(lit("wind_speed_mps"))) === "Wind Speed Mps")
  }

  test("D7 wind power density 0.5*rho*v^3") {
    val out = Seq((1.2, 5.0)).toDF("rho", "v")
      .select(Features.windPowerDensity(col("rho"), col("v")))
      .head().getDouble(0)
    assert(math.abs(out - 0.5 * 1.2 * 125.0) < 1e-12)
  }
}
