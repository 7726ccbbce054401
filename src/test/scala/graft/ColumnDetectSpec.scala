package graft

import graft.normalize.ColumnDetect

/** P10/P11 fuzzy schema detection — including the reference's quirks:
  * single-letter synonyms ('v', 'a') over-matching, and last-canonical-wins
  * on the inverted rename dict (`Solar_Dashboard.py:63-98`).
  */
class ColumnDetectSpec extends SparkSpec {
  import spark.implicits._

  test("clean column set maps 1:1") {
    val df = Seq((1, "s", 2.0, 3.0, 4.0))
      .toDF("record_time", "site_id", "power_kw", "volt_lvl", "amps")
    val out = ColumnDetect.normalizeSolar(df)
    assert(out.columns.toSeq ===
      Seq("timestamp", "station", "power_output", "voltage", "current"))
  }

  test("reference quirk: a column containing 'a' is claimed by 'current' and wins the rename") {
    // 'Reading Time' matches timestamp ('time') AND current ('a');
    // the inverted dict keeps the LAST canonical -> renamed to current.
    val df = Seq((1, 2.0)).toDF("Reading Time", "power_kw")
    val out = ColumnDetect.normalizeSolar(df)
    assert(out.columns.contains("current"))
    assert(!out.columns.contains("timestamp"))
  }

  test("wind detector normalizes spaces before matching") {
    val df = Seq((1.0, 2.0)).toDF("Wind Speed Mps", "Farm Power")
    val mapping = ColumnDetect.detect(df.columns.toSeq,
      ColumnDetect.windPatterns, normalizeSpaces = true)
    assert(mapping("wind_speed") === "Wind Speed Mps")
    assert(mapping("farm_power") === "Farm Power")
  }

  test("declaration order: first canonical scans first (timestamp before current)") {
    val mapping = ColumnDetect.detect(Seq("timestamp", "amp_reading"),
      ColumnDetect.solarPatterns)
    assert(mapping("timestamp") === "timestamp")
    // current's first hit in column order is 'timestamp' (contains 'a')
    assert(mapping("current") === "timestamp")
  }
}
