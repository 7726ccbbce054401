package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.physics.Power

/** D21/T1/S12: deterministic telemetry simulator — the engine-side stand-in
  * for the reference's OpenWeatherMap-seeded generator
  * (`Solar_Generation.py:182-204`: time-seeded ±5% fluctuation on
  * irradiance, then the physics chain; 5 s PREDICTION ticks with an API
  * record every 10 min).
  *
  * Everything derives from the tick index with small-argument `sin` noise
  * (no rand(), no wall clock), so the same tick always yields the same
  * record on any engine — replayable tests, oracle-checkable output.
  *
  * Scale shape: `spark.range` parallelizes the generator across the
  * cluster; each row is pure column arithmetic inside codegen.
  */
object Simulator {

  val SolarStationIds: Seq[String] = Seq("BSPP", "KOSPP", "ZFSPP")
  val SolarPanels: Seq[Long] = Seq(1000000L, 600000L, 150000L)
  /** 2024-01-01T00:00:00Z */
  val DefaultStartEpoch: Long = 1704067200L

  /** The deterministic column block for one (tick, station) pair.
    * `tick` advances every `stepSec` seconds; station cycles 0..n-1.
    */
  def solarColumns(tick: Column, station: Column, stepSec: Int = 5,
      startEpoch: Long = DefaultStartEpoch): Seq[Column] = {
    val epoch = lit(startEpoch) + tick * stepSec
    val hourOfDay = (pmod(epoch, lit(86400L)) / 3600L).cast("long")
    // phase in [0, 6.28): keeps sin in its well-conditioned range so both
    // engines produce the same double (big args diverge in reduction)
    val phase = pmod(tick * 10L + station, lit(628L)).cast("double") / 100.0
    val rawNoise = sin(phase) * 43758.5453
    val fluct = lit(1.0) + ((rawNoise - floor(rawNoise)) - 0.5) * 0.1
    val clouds = (sin(phase) + 1.0) * 50.0
    val irr = Power.gateDaytime(
      Power.irradianceFromClouds(clouds) * fluct, hourOfDay)
    val tempC = lit(20.0) + sin(phase / 2.0) * 8.0
    val panelT = tempC + 5.5
    val eff = Power.effectiveEfficiency(panelT)
    val panels = element_at(
      array(SolarPanels.map(lit): _*), (station + 1).cast("int"))
    val power = Power.gateDaytime(
      Power.solarPowerKw(irr, eff, panels.cast("double")), hourOfDay)
    Seq(
      epoch.as("epoch_s"),
      hourOfDay.cast("int").as("hour"),
      element_at(array(SolarStationIds.map(lit): _*), (station + 1).cast("int"))
        .as("station_id"),
      when(pmod(tick, lit(120L)) === 0, "API").otherwise("PREDICTION")
        .as("data_source"),
      round(tempC, 6).as("temperature_C"),
      round(panelT, 6).as("panel_temperature_C"),
      round(irr, 4).as("solar_irradiance_Wm2"),
      round(eff, 6).as("effective_efficiency"),
      round(power, 4).as("power_kW"),
      round(Power.energyKwh10min(power), 4).as("energy_kWh_10min"))
  }

  /** Batch generator: n ticks × all stations (one row per pair). */
  def solarTicks(spark: SparkSession, nTicks: Long, stepSec: Int = 5,
      startEpoch: Long = DefaultStartEpoch): DataFrame = {
    val n = SolarStationIds.size
    spark.range(nTicks * n)
      .select(expr(s"id div $n").as("tick"), (col("id") % n).as("station"))
      .select(solarColumns(col("tick"), col("station"), stepSec, startEpoch): _*)
  }

  /** T1 streaming cadence: the rate source emits one row per
    * (rowsPerSecond × wall-second); `value` is the tick counter, so the
    * emitted records replay the exact batch-generator sequence.
    */
  def solarStream(spark: SparkSession, rowsPerSecond: Int = 3,
      stepSec: Int = 5, startEpoch: Long = DefaultStartEpoch): DataFrame = {
    val n = SolarStationIds.size
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()
      .select(expr(s"value div $n").as("tick"), (col("value") % n).as("station"))
      .select(solarColumns(col("tick"), col("station"), stepSec, startEpoch): _*)
  }
}
