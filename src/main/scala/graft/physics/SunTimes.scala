package graft.physics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** NOAA sunrise/sunset closed form as pure Catalyst column arithmetic — the
  * faithful face of the reference's astral-based daytime gate
  * (`Solar_Generation.py:110-125` builds an astral observer per station and
  * zeroes solar output outside [sunrise, sunset]; astral implements this
  * same NOAA calculation). The repo's default gate stays the reference's
  * own Databricks-port simplification (hour ∈ [6,18),
  * [[Power.gateDaytime]], sanctioned by SURVEY.md §2.3); this closed form
  * is the opt-in high-fidelity variant — see [[Power.gateDaytimeMode]].
  *
  * Everything here is `sin/cos/asin/acos` over doubles: no UDF, no shuffle,
  * constant-foldable for literal coordinates, and whole-stage-codegen
  * friendly, so the gate costs the same as any other derived column at
  * 100 TB. Formulas follow the public NOAA Solar Calculations worksheet
  * (Global Monitoring Division), evaluated at NOON UTC of the event's date
  * — the worksheet's own convention for daily sunrise/sunset.
  *
  * All angles below are in DEGREES (converted at the trig calls), matching
  * the worksheet so each intermediate can be checked against it.
  */
object SunTimes {

  private val DegToRad = math.Pi / 180.0

  private def rad(c: Column): Column = c * DegToRad
  private def deg(c: Column): Column = c * (180.0 / math.Pi)

  /** Julian centuries since J2000 at noon UTC of `date` (a DateType
    * column). `unix_date` is days since 1970-01-01; 1970-01-01 noon UTC is
    * JD 2440588.0, and J2000.0 is JD 2451545.0.
    */
  private def julianCentury(date: Column): Column =
    (unix_date(date).cast("double") + 2440588.0 - 2451545.0) / 36525.0

  /** (sunrise, sunset) in fractional minutes after UTC midnight.
    *
    * Polar robustness: the hour-angle `acos` argument is clamped to
    * [-1, 1], so polar night degenerates to sunrise == sunset == solar
    * noon (gate always closed) and polar day to the full 24 h (gate always
    * open) instead of NaN.
    */
  def sunriseSunsetUtcMinutes(date: Column, lat: Column, lon: Column): (Column, Column) = {
    val t = julianCentury(date)
    // geometric mean longitude / anomaly of the sun, degrees
    val l0 = pmod(lit(280.46646) + t * (lit(36000.76983) + t * 0.0003032), lit(360.0))
    val m = lit(357.52911) + t * (lit(35999.05029) - t * 0.0001537)
    // orbital eccentricity of Earth
    val e = lit(0.016708634) - t * (lit(0.000042037) + t * 0.0000001267)
    // equation of center -> true -> apparent longitude
    val c = sin(rad(m)) * (lit(1.914602) - t * (lit(0.004817) + t * 0.000014)) +
      sin(rad(m * 2)) * (lit(0.019993) - t * 0.000101) +
      sin(rad(m * 3)) * 0.000289
    val omega = lit(125.04) - t * 1934.136 // lunar ascending node, degrees
    val appLong = l0 + c - 0.00569 - sin(rad(omega)) * 0.00478
    // obliquity (mean + nutation correction), degrees
    val eps0 = lit(23.0) + (lit(26.0) +
      (lit(21.448) - t * (lit(46.815) + t * (lit(0.00059) - t * 0.001813))) / 60.0) / 60.0
    val eps = eps0 + cos(rad(omega)) * 0.00256
    // solar declination, degrees
    val decl = deg(asin(sin(rad(eps)) * sin(rad(appLong))))
    // equation of time, minutes
    val y = pow(tan(rad(eps / 2)), 2)
    val eot = deg(
      y * sin(rad(l0 * 2)) - e * sin(rad(m)) * 2 +
        e * y * sin(rad(m)) * cos(rad(l0 * 2)) * 4 -
        y * y * sin(rad(l0 * 4)) * 0.5 -
        e * e * sin(rad(m * 2)) * 1.25) * 4
    // hour angle at official sunrise (zenith 90.833 deg: refraction + disc)
    val haArg = cos(lit(90.833) * DegToRad) / (cos(rad(lat)) * cos(rad(decl))) -
      tan(rad(lat)) * tan(rad(decl))
    val ha = deg(acos(greatest(lit(-1.0), least(lit(1.0), haArg))))
    val solarNoon = lit(720.0) - lon * 4 - eot // minutes, UTC (lon east-positive)
    (solarNoon - ha * 4, solarNoon + ha * 4)
  }

  /** Fractional minutes after UTC midnight of a TimestampType column
    * (session tz is pinned UTC everywhere in this engine, so
    * `date_trunc` day boundaries are UTC midnights).
    */
  def minutesOfDayUtc(ts: Column): Column =
    (unix_micros(ts) - unix_micros(date_trunc("DAY", ts))).cast("double") / 6.0e7

  /** The astral-faithful daytime gate: `value` inside [sunrise, sunset]
    * (inclusive, matching the reference's `sunrise <= ts <= sunset`),
    * else 0.0.
    */
  def gate(value: Column, ts: Column, lat: Column, lon: Column): Column = {
    val (sunrise, sunset) = sunriseSunsetUtcMinutes(to_date(ts), lat, lon)
    val mins = minutesOfDayUtc(ts)
    when(mins >= sunrise && mins <= sunset, value).otherwise(0.0)
  }
}
