package graft.normalize

import org.apache.spark.sql.DataFrame

/** Fuzzy column detection + canonical rename (SURVEY.md §2.2, P10-P11).
  *
  * The reference dashboards accept arbitrary uploaded CSVs and map columns
  * to a canonical schema by substring matching against synonym lists
  * (ref `Solar_Dashboard.py:63-85`, `Wind_Dashboard.py:66-93`). Pure
  * driver-side metadata work over `df.columns` — no data movement.
  *
  * Semantics mirror the reference exactly:
  *  - canonical names are tried in DECLARATION order (Python dict order);
  *  - for each canonical, the FIRST dataframe column (in frame order) whose
  *    lower-cased name contains any synonym substring is claimed;
  *  - a column may be claimed by several canonicals; the rename dict is the
  *    inversion {column -> canonical}, so the LAST canonical claiming a
  *    column wins the rename (Python dict-comprehension overwrite,
  *    ref `Solar_Dashboard.py:96-98`);
  *  - the wind detector additionally normalizes spaces to underscores
  *    before matching (ref `Wind_Dashboard.py:85`).
  */
object ColumnDetect {

  /** Solar detector patterns in reference declaration order
    * (`Solar_Dashboard.py:67-75`).
    */
  val solarPatterns: Seq[(String, Seq[String])] = Seq(
    "timestamp" -> Seq("time", "date", "datetime", "timestamp"),
    "station" -> Seq("station", "device", "panel", "unit", "id"),
    "power_output" -> Seq("power", "output", "generation", "kw", "watt"),
    "solar_irradiance" -> Seq("irradiance", "solar", "radiation", "ghi", "w/m2"),
    "temperature" -> Seq("temp", "temperature", "celsius", "panel_temp"),
    "voltage" -> Seq("voltage", "volt", "v"),
    "current" -> Seq("current", "amp", "ampere", "a"))

  /** Wind detector patterns (`Wind_Dashboard.py:70-82`). */
  val windPatterns: Seq[(String, Seq[String])] = Seq(
    "timestamp" -> Seq("time", "date", "datetime", "timestamp"),
    "station" -> Seq("station", "device", "turbine", "farm", "id"),
    "wind_speed" -> Seq("wind_spe", "wind_speed", "speed", "ws"),
    "wind_direction" -> Seq("wind_dir", "direction", "dir", "wd"),
    "air_temp" -> Seq("air_temp", "temperature", "temp"),
    "air_pressure" -> Seq("air_press", "pressure", "press"),
    "humidity" -> Seq("humidity", "humid", "rh"),
    "air_density" -> Seq("air_densit", "density"),
    "turbine_power" -> Seq("turbine_p", "turbine_power", "power"),
    "farm_power" -> Seq("farm_pow", "farm_power"),
    "farm_energy" -> Seq("farm_ene", "farm_energy", "energy"),
    "is_valid" -> Seq("is_valid", "valid", "status"))

  /** P11: (canonical, column) pairs in canonical declaration order. */
  def detectOrdered(columns: Seq[String], patterns: Seq[(String, Seq[String])],
      normalizeSpaces: Boolean = false): Seq[(String, String)] = {
    val lowered = columns.map { c =>
      val lc = c.toLowerCase
      c -> (if (normalizeSpaces) lc.replace(' ', '_') else lc)
    }
    patterns.flatMap { case (canon, syns) =>
      lowered.collectFirst {
        case (c, lc) if syns.exists(lc.contains) => canon -> c
      }
    }
  }

  def detect(columns: Seq[String], patterns: Seq[(String, Seq[String])],
      normalizeSpaces: Boolean = false): Map[String, String] =
    detectOrdered(columns, patterns, normalizeSpaces).toMap

  /** P10: rename via the inverted mapping — last canonical claiming a
    * column wins, like the reference's `{v: k for k, v in map.items()}`.
    */
  def normalize(df: DataFrame, patterns: Seq[(String, Seq[String])],
      normalizeSpaces: Boolean = false): DataFrame = {
    val rename = detectOrdered(df.columns.toSeq, patterns, normalizeSpaces)
      .foldLeft(Map.empty[String, String]) { case (m, (canon, c)) => m + (c -> canon) }
    df.columns.foldLeft(df) { (d, c) =>
      rename.get(c) match {
        case Some(canon) if canon != c => d.withColumnRenamed(c, canon)
        case _ => d
      }
    }
  }

  def normalizeSolar(df: DataFrame): DataFrame = normalize(df, solarPatterns)
  def normalizeWind(df: DataFrame): DataFrame =
    normalize(df, windPatterns, normalizeSpaces = true)
}
