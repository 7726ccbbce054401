package graft.schema

import org.apache.spark.sql.types._

/** Explicit schemas for the IoT telemetry tables of the reference pipeline
  * (SURVEY.md §1.2). Schemas are always explicit — never inferred — for
  * determinism at scale (inference requires an extra pass over data).
  *
  * Raw timestamps arrive as STRINGS in three observed formats (reference
  * `solar_farm_data_log.csv`, `wind_farm_data_log.csv`,
  * `Wind_Processing.py:23`): ISO with `+00:00`, ISO-T naive, and with a
  * literal ` UTC` token. Parsing happens in [[graft.ingest.Sources]].
  */
object Schemas {

  /** Raw solar reading as logged by the generator (Solar_Generation.py:157-162).
    * Azure producer adds the last three weather columns (producer_solar.py:75-81).
    */
  val solarRaw: StructType = StructType(Seq(
    StructField("timestamp", StringType),
    StructField("station_id", StringType),
    StructField("data_source", StringType),
    StructField("temperature_C", DoubleType),
    StructField("panel_temperature_C", DoubleType),
    StructField("solar_irradiance_Wm2", DoubleType),
    StructField("effective_efficiency", DoubleType),
    StructField("power_kW", DoubleType),
    StructField("energy_kWh_10min", DoubleType)
  ))

  val solarRawAzure: StructType = StructType(solarRaw.fields ++ Seq(
    StructField("clouds_%", DoubleType),
    StructField("pressure_hPa", DoubleType),
    StructField("humidity_%", DoubleType)
  ))

  /** Raw wind reading (Wind_Genration.py:62-68, wind_farm_data_log.csv). */
  val windRaw: StructType = StructType(Seq(
    StructField("timestamp", StringType),
    StructField("station_id", StringType),
    StructField("data_source", StringType),
    StructField("wind_speed_mps", DoubleType),
    StructField("wind_dir_deg", DoubleType),
    StructField("air_temperature_C", DoubleType),
    StructField("air_pressure_hPa", DoubleType),
    StructField("humidity_percent", DoubleType),
    StructField("air_density_kgm3", DoubleType),
    StructField("wind_speed_hub_mps", DoubleType),
    StructField("turbine_power_kW", DoubleType),
    StructField("farm_power_kW", DoubleType),
    StructField("farm_energy_kWh_10min", DoubleType),
    StructField("farm_energy_MWh_10min", DoubleType)
  ))

  /** Typed stream schema used by the structured-streaming ETL — timestamps
    * already parsed (post-from_json). Matches the notebook StructType
    * (databricks.docx:26-36 / 161-175).
    */
  val solarStream: StructType = StructType(
    solarRaw.fields.map {
      case StructField("timestamp", _, _, _) => StructField("timestamp", TimestampType)
      case f => f
    })

  case class SolarStation(station_id: String, station_name: String,
      lat: Double, lon: Double, capacity_kW: Double, num_panels: Long)
  case class WindStation(station_id: String, station_name: String,
      lat: Double, lon: Double, num_turbines: Long)

  /** Static station catalogs (Solar_Generation.py:39-67, Wind_Genration.py:50-54).
    * Tiny dimensions — always broadcast when joined.
    */
  val solarStations: Seq[SolarStation] = Seq(
    SolarStation("BSPP", "Benban Solar Park", 24.4539, 32.7469, 1650000.0, 1000000L),
    SolarStation("KOSPP", "Kom Ombo Solar Plant", 24.4764, 32.9447, 200000.0, 600000L),
    SolarStation("ZFSPP", "Zafarana Solar Plant", 29.1097, 32.5964, 50000.0, 150000L)
  )

  val windStations: Seq[WindStation] = Seq(
    WindStation("WBWF", "West Bakr Wind Farm", 28.1099, 33.0836, 96L),
    WindStation("GZWF", "Gabal el-Zeit Wind Farm", 27.7653, 33.5479, 300L),
    WindStation("ZFWF", "Zafarana Wind Farm", 29.1097, 32.5964, 700L)
  )
}
