package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dashboard alert rule (ref `Solar_Generation.py:289-290`,
  * `Wind_Genration.py:26,430-431`): flag stations whose LATEST reading is
  * below the power threshold (solar < 100 kW, wind < 5 kW).
  *
  * Shape: P14 latest-per-key (one window keyed by station) then a flag
  * column — the alert scan never touches more than |stations| rows after
  * the window.
  */
object Alerts {

  val SolarThresholdKw = 100.0
  val WindThresholdKw = 5.0

  def lowPower(df: DataFrame, key: Seq[Column], order: Seq[Column],
      power: Column, thresholdKw: Double): DataFrame =
    Ranking.lastPerKey(df, key, order)
      .withColumn("alert", power < thresholdKw)
      .withColumn("threshold_kW", lit(thresholdKw))
}
