package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Derived-column feature engineering (SURVEY.md §2.3, D1-D8, D19, D23).
  * All pure column expressions — they stay inside whole-stage codegen and
  * cost nothing beyond the projection at any scale.
  */
object Features {

  /** D1: UTC → local wall-clock time (ref `Solar_Processing.py:39-51`,
    * databricks.docx:79 `from_utc_timestamp`).
    */
  def localTimestamp(ts: Column, tz: String = "Africa/Cairo"): Column =
    from_utc_timestamp(ts, tz)

  /** D3: hour of day. */
  def hourOf(ts: Column): Column = hour(ts)

  /** D4: English day-of-week name (ref `dt.day_name()` /
    * `date_format(ts,'EEEE')`, databricks.docx:81).
    */
  def dayOfWeekName(ts: Column): Column = date_format(ts, "EEEE")

  /** D5: Day/Night bucketing. Pandas semantics `6 <= h < 18`
    * (ref `Solar_Processing.py:56`); the notebook's `<= 18` variant
    * (databricks.docx:82) is a reference-internal inconsistency — we pick
    * the pandas boundary for golden-file parity (SURVEY.md §7 risks).
    */
  def timeOfDay(hourCol: Column): Column =
    when(hourCol >= 6 && hourCol < 18, "Day").otherwise("Night")

  /** D6: validity flag — both sentinel columns non-null
    * (ref `Solar_Processing.py:57`).
    */
  def isValid(a: Column, b: Column): Column = a.isNotNull && b.isNotNull

  /** D7: wind power density 0.5·ρ·v³ (ref `Wind_Processing.py:61`). */
  def windPowerDensity(density: Column, speed: Column): Column =
    lit(0.5) * density * (speed * speed * speed)

  /** D8: capacity-utilization % via a literal map lookup
    * (ref databricks.docx:85-92 `create_map`). For larger catalogs prefer a
    * broadcast dimension join; for 3 stations the literal map folds into
    * codegen with zero shuffle.
    */
  def capacityUtilization(power: Column, stationId: Column,
      capacities: Map[String, Double], scale: Int = 2): Column = {
    val m = map(capacities.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    round(power / m(stationId) * 100.0, scale)
  }

  /** D19: wind-class bucketing, pandas
    * `pd.cut(v, [0,3,7,12,20,100], labels=[Calm,Light,Moderate,Strong,Gale])`
    * (ref `Wind_Dashboard.py:128-131`) — chained `when` keeps it codegen'd
    * (right-closed intervals like pd.cut; values outside (0,100] map to
    * null, matching pd.cut's NaN for out-of-bin values).
    */
  def windClass(speed: Column): Column =
    when(speed <= 0 || speed > 100, lit(null).cast("string"))
      .when(speed <= 3, "Calm")
      .when(speed <= 7, "Light")
      .when(speed <= 12, "Moderate")
      .when(speed <= 20, "Strong")
      .otherwise("Gale")

  /** D23: label prettify `power_kW` → `Power Kw`
    * (ref `Wind_Genration.py:447`).
    */
  def prettify(c: Column): Column = initcap(regexp_replace(c, "_", " "))

  /** The standard reference feature block over a cleaned telemetry frame
    * (ref `Solar_Processing.py:39-57`, `Wind_Processing.py:49-63`): local
    * time, hour, day name, Day/Night, validity.
    */
  def withTimeFeatures(df: DataFrame, tsCol: String = "timestamp",
      validCols: (String, String) = ("timestamp", "station_id")): DataFrame =
    df.withColumn("local_timestamp", localTimestamp(col(tsCol)))
      .withColumn("hour", hourOf(col("local_timestamp")))
      .withColumn("day_of_week", dayOfWeekName(col("local_timestamp")))
      .withColumn("time_of_day", timeOfDay(col("hour")))
      .withColumn("is_valid", isValid(col(validCols._1), col(validCols._2)))
}
