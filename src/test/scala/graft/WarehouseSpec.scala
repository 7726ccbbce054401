package graft

import org.apache.spark.sql.functions._
import graft.ingest.Sources
import graft.schema.Schemas
import graft.streaming.Pipeline
import graft.warehouse.StarSchema

/** J5 star schema (ref `dwh.docx:2-89`) + J6 source comparison
  * (ref `Wind_Genration.py:437-454`).
  */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("J5 Fact_Wind: fact grain = cleaned rows; keys resolve; join-back is lossless") {
    val cleaned = Pipeline.windBatch(Sources.csvWithTimestamp(spark,
      "/root/reference/wind_farm_data_log.csv", Schemas.windRaw))
    val (fact, dimStation, dimDateTime, dimWeather) = StarSchema.buildFactWind(cleaned)
    val n = cleaned.count()
    assert(fact.count() === n)
    assert(dimStation.count() === 3)
    // surrogate keys are dense 1..k and deterministic
    assert(dimStation.agg(min(col("station_key")), max(col("station_key")))
      .head().toSeq === Seq(1, 3))
    // no orphan keys: star join returns every fact row exactly once
    val star = fact
      .join(dimStation, "station_key")
      .join(dimDateTime, "datetime_key")
      .join(dimWeather, "weather_key")
    assert(star.count() === n)
    // measures survive the round trip
    val total = cleaned.agg(sum("farm_power_kW")).head().getDouble(0)
    val fromStar = star.agg(sum("farm_power_kW")).head().getDouble(0)
    assert(math.abs(total - fromStar) < 1e-6)
  }

  test("J5 Fact_Solar builds with the solar weather grain") {
    val cleaned = Pipeline.solarBatch(Sources.csvWithTimestamp(spark,
      "/root/reference/solar_farm_data_log.csv", Schemas.solarRaw))
    val (fact, _, _, dimWeather) = StarSchema.buildFactSolar(cleaned)
    assert(fact.count() === cleaned.count())
    assert(fact.columns.toSeq === Seq("station_key", "datetime_key",
      "weather_key", "power_kW", "energy_kWh_10min"))
    assert(dimWeather.count() <= cleaned.count())
  }

  test("high-cardinality dims build without a single-partition exchange") {
    val cleaned = Pipeline.windBatch(Sources.csvWithTimestamp(spark,
      "/root/reference/wind_farm_data_log.csv", Schemas.windRaw))
    val (_, dimStation, dimDateTime, dimWeather) = StarSchema.buildFactWind(cleaned)
    // hashed surrogates: distinct + projection only, fully parallel
    for (d <- Seq(dimDateTime, dimWeather)) {
      val plan = d.queryExecution.executedPlan.toString
      assert(!plan.contains("SinglePartition"), s"ordered exchange in dim build:\n$plan")
    }
    // the small station dim intentionally keeps the dense-rank build
    assert(dimStation.queryExecution.executedPlan.toString.contains("SinglePartition"))
  }

  test("J6 sourceDiff: latest API vs latest PREDICTION per parameter") {
    val df = Seq(
      ("S1", "API", 1L, 10.0, 100.0),
      ("S1", "API", 2L, 12.0, 110.0),        // latest API
      ("S1", "PREDICTION", 3L, 13.0, 130.0), // latest PREDICTION
      ("S2", "API", 4L, 5.0, 50.0))
      .toDF("station_id", "data_source", "seq", "wind_speed_mps", "farm_power_kW")
    val out = graft.analytics.Comparison.sourceDiff(df, "station_id",
      "data_source", "API", "PREDICTION",
      Seq("wind_speed_mps", "farm_power_kW"), Seq(col("seq")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(("S1", "Wind Speed Mps")) === ((12.0, 13.0, 1.0)))
    assert(out(("S1", "Farm Power Kw")) === ((110.0, 130.0, 20.0)))
    assert(!out.contains(("S2", "Wind Speed Mps"))) // no PREDICTION side
  }
}
