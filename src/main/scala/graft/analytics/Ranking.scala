package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordering / ranking / per-key-recency operators
  * (SURVEY.md §2.6 O1-O3, §2.2 P13-P14).
  *
  * All window functions partition by the entity key, so state per partition
  * is one group's rows — skew-safe for the reference's small station domain;
  * for high-cardinality keys Spark's window exec spills, and the top-N
  * variants below filter early so only N rows per key survive the window.
  */
object Ranking {

  /** O1: rank groups by an aggregate, descending
    * (ref `sort_values('Total Energy', ascending=False)`,
    * `Solar_Dashboard.py:482`).
    */
  def rankByAggregate(df: DataFrame, key: Column, agg: Column,
      aggName: String): DataFrame = {
    val grouped = df.groupBy(key).agg(agg.as(aggName))
    grouped.withColumn("rnk",
      rank().over(Window.orderBy(col(aggName).desc)))
  }

  /** P13: keep the most recent N rows per key (ring-buffer retention,
    * ref `Wind_Genration.py:320-322`).
    */
  def lastNPerKey(df: DataFrame, key: Seq[Column], order: Seq[Column],
      n: Int): DataFrame = {
    val w = Window.partitionBy(key: _*).orderBy(order.map(_.desc): _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
  }

  /** P14: latest row per key (ref `api_df.iloc[-1]`,
    * `Solar_Generation.py:255`).
    */
  def lastPerKey(df: DataFrame, key: Seq[Column], order: Seq[Column]): DataFrame =
    lastNPerKey(df, key, order, 1).drop("rn")
}
