package graft.normalize

import org.apache.spark.sql.DataFrame

/** Fuzzy column detection + canonical rename (SURVEY.md §2.2, P10-P11).
  *
  * The reference dashboards accept arbitrary uploaded CSVs and map columns
  * to a canonical schema by substring matching against synonym lists
  * (ref `Solar_Dashboard.py:63-85`, `Wind_Dashboard.py:66-93`). Pure
  * driver-side metadata work over `df.columns` — no data movement.
  */
object ColumnDetect {

  /** Synonym lists per canonical name, mirroring the reference's solar
    * dashboard detector (`Solar_Dashboard.py:63-85`). First match wins;
    * matching is case-insensitive substring, preferring exact matches.
    */
  val solarSynonyms: Map[String, Seq[String]] = Map(
    "timestamp" -> Seq("timestamp", "time", "date"),
    "station" -> Seq("station", "site", "plant", "farm"),
    "power_output" -> Seq("power", "output_kw", "generation"),
    "irradiance" -> Seq("irradiance", "radiation", "ghi"),
    "temperature" -> Seq("temperature", "temp"),
    "voltage" -> Seq("voltage", "volt"),
    "current" -> Seq("current", "amp"),
    "efficiency" -> Seq("efficiency", "eff"))

  /** Wind dashboard detector (`Wind_Dashboard.py:66-93`). */
  val windSynonyms: Map[String, Seq[String]] = Map(
    "timestamp" -> Seq("timestamp", "time", "date"),
    "station" -> Seq("station", "site", "farm"),
    "wind_speed" -> Seq("wind_speed", "speed", "ws"),
    "wind_direction" -> Seq("wind_dir", "direction", "wd"),
    "power_output" -> Seq("power", "output", "generation"),
    "air_density" -> Seq("density", "rho"),
    "temperature" -> Seq("temperature", "temp"))

  /** Detect: canonical name -> actual column name. A column is claimed by at
    * most one canonical name (first canonical in declaration order wins),
    * exact case-insensitive matches preferred over substring hits.
    */
  def detect(columns: Seq[String], synonyms: Map[String, Seq[String]],
      order: Seq[String]): Map[String, String] = {
    val lower = columns.map(c => c -> c.toLowerCase)
    var claimed = Set.empty[String]
    val found = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for (canon <- order; syns = synonyms(canon)) {
      val exact = lower.collectFirst {
        case (c, lc) if !claimed(c) && syns.contains(lc) => c
      }
      val hit = exact.orElse(lower.collectFirst {
        case (c, lc) if !claimed(c) && syns.exists(lc.contains) => c
      })
      hit.foreach { c => claimed += c; found(canon) = c }
    }
    found.toMap
  }

  /** P10: rename detected columns to their canonical names. */
  def normalize(df: DataFrame, synonyms: Map[String, Seq[String]],
      order: Seq[String]): DataFrame = {
    val mapping = detect(df.columns.toSeq, synonyms, order)
    mapping.foldLeft(df) { case (d, (canon, actual)) =>
      if (canon == actual) d else d.withColumnRenamed(actual, canon)
    }
  }

  def normalizeSolar(df: DataFrame): DataFrame =
    normalize(df, solarSynonyms, solarSynonyms.keys.toSeq.sorted)
  def normalizeWind(df: DataFrame): DataFrame =
    normalize(df, windSynonyms, windSynonyms.keys.toSeq.sorted)
}
