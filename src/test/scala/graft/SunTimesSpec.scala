package graft

import org.apache.spark.sql.functions._

import graft.physics.{Power, SunTimes}
import graft.schema.Schemas

/** NOAA sunrise/sunset closed form (D16 astral-fidelity face) against
  * independently computed NOAA-worksheet values for the reference's three
  * solar stations, on a winter date, the June solstice and the March
  * equinox. Expected minutes were produced by a separate scalar Python
  * implementation of the same public worksheet (not by this code), so a
  * transcription slip in either side fails the compare.
  */
class SunTimesSpec extends SparkSpec {
  import spark.implicits._

  // (date, station_id, expected sunrise / sunset, fractional minutes UTC)
  private val expected = Seq(
    ("2025-01-01", "BSPP", 273.0742, 912.3174),
    ("2025-01-01", "KOSPP", 272.3290, 911.4802),
    ("2025-01-01", "ZFSPP", 283.6116, 902.9840),
    ("2025-06-21", "BSPP", 181.3293, 1000.4447),
    ("2025-06-21", "KOSPP", 180.4891, 999.7024),
    ("2025-06-21", "ZFSPP", 171.3203, 1011.6577),
    ("2025-03-20", "BSPP", 232.6195, 960.1291),
    ("2025-03-20", "KOSPP", 231.8276, 959.3386),
    ("2025-03-20", "ZFSPP", 233.0470, 960.9056))

  private lazy val stations = Schemas.solarStations
    .map(s => (s.station_id, s.lat, s.lon))
    .toDF("station_id", "lat", "lon")

  test("sunrise/sunset match the NOAA worksheet for the three stations") {
    val df = expected.map { case (d, s, _, _) => (d, s) }
      .toDF("date", "station_id")
      .join(broadcast(stations), "station_id")
    val (sr, ss) = SunTimes.sunriseSunsetUtcMinutes(
      to_date(col("date")), col("lat"), col("lon"))
    val got = df.select(col("date"), col("station_id"),
      sr.as("sunrise"), ss.as("sunset"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    expected.foreach { case (d, s, expSr, expSs) =>
      val (gotSr, gotSs) = got((d, s))
      // 1e-3 min = 60 ms: double round-off headroom, far below any
      // astronomical or refraction-model uncertainty
      assert(math.abs(gotSr - expSr) < 1e-3, s"sunrise $d $s: $gotSr vs $expSr")
      assert(math.abs(gotSs - expSs) < 1e-3, s"sunset $d $s: $gotSs vs $expSs")
    }
  }

  test("sun-time invariants hold across a full year for all stations") {
    // astronomy-grounded properties, independent of the worksheet values:
    // sunrise < solar noon < sunset; day length within the bounds these
    // latitudes (24-29°N) allow; June day longer than December
    val days = (1 to 12).map(m => f"2025-$m%02d-15")
    val df = days.flatMap(d => Schemas.solarStations.map(s => (d, s.station_id)))
      .toDF("date", "station_id")
      .join(broadcast(stations), "station_id")
    val (sr, ss) = SunTimes.sunriseSunsetUtcMinutes(
      to_date(col("date")), col("lat"), col("lon"))
    val rows = df.select(col("date"), col("station_id"),
        sr.as("sr"), ss.as("ss"),
        (lit(720.0) - col("lon") * 4).as("approxNoon"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    rows.foreach { case (d, st, rise, set) =>
      assert(rise < set, s"$st $d: sunrise $rise !< sunset $set")
      val dayLen = set - rise
      // 24-29°N: day length stays within ~10.2h..13.9h over the year
      assert(dayLen > 9.5 * 60 && dayLen < 14.5 * 60,
        s"$st $d: implausible day length ${dayLen / 60} h")
    }
    val byKey = rows.map { case (d, st, rise, set) => (d.substring(5, 7), st) -> (set - rise) }.toMap
    Schemas.solarStations.map(_.station_id).foreach { st =>
      assert(byKey(("06", st)) > byKey(("12", st)) + 60,
        s"$st: June day not meaningfully longer than December")
    }
  }

  test("astral gate opens exactly between sunrise and sunset") {
    // BSPP on 2025-01-01: sunrise 273.07 min (04:33:04), sunset 912.32 min
    // (15:12:19). Probe one minute either side of both edges, plus the
    // hour-window face for contrast at 05:00 (astral: day; fixed: night).
    val rows = Seq(
      ("2025-01-01 04:32:00", 0.0), // before sunrise
      ("2025-01-01 04:34:00", 7.5), // after sunrise
      ("2025-01-01 05:00:00", 7.5), // fixed-window face would zero this
      ("2025-01-01 15:11:00", 7.5), // before sunset
      ("2025-01-01 15:13:00", 0.0)) // after sunset
      .toDF("ts_s", "want")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val gated = rows.select(col("ts_s"), col("want"),
      Power.gateDaytimeMode(lit(7.5), col("ts"),
        lit(24.4539), lit(32.7469), astral = true).as("astral"),
      Power.gateDaytimeMode(lit(7.5), col("ts"),
        lit(24.4539), lit(32.7469)).as("fixed"))
      .collect()
    gated.foreach { r =>
      assert(r.getAs[Double]("astral") === r.getAs[Double]("want"),
        s"astral gate at ${r.getAs[String]("ts_s")}")
    }
    // the default face is unchanged: hour window, so 05:00 gates to 0
    val fixedAt5 = gated.find(_.getAs[String]("ts_s").contains("05:00")).get
    assert(fixedAt5.getAs[Double]("fixed") === 0.0)
  }
}
