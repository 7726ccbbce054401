package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Star-schema warehouse build (SURVEY.md §2.5 J5; ref `dwh.docx:2-89`):
  * dimensions from distinct attribute tuples with surrogate keys, facts by
  * joining surrogate keys back on the natural key.
  *
  * Surrogate keys use `dense_rank` over the natural ordering — deterministic
  * across runs/partitionings (unlike `monotonically_increasing_id`), which
  * matters for reproducible warehouse builds and for incremental re-runs at
  * scale. The rank's global ordering is a single exchange of the *already
  * deduplicated* dimension rows (dimension cardinality ≪ fact cardinality).
  */
object StarSchema {

  /** Build a dimension: distinct natural-key tuples + dense surrogate key. */
  def buildDim(df: DataFrame, naturalKey: Seq[Column], attrs: Seq[Column],
      keyName: String): DataFrame = {
    val distinct = df.select((naturalKey ++ attrs): _*).distinct()
    distinct.withColumn(keyName,
      dense_rank().over(Window.orderBy(naturalKey: _*)))
  }

  /** Date dimension from a timestamp column (ref `Dim_DateTime`,
    * `dwh.docx:10-24`): one row per distinct date with calendar attributes.
    */
  def buildDateDim(df: DataFrame, ts: Column): DataFrame = {
    val dates = df.select(to_date(ts).as("date")).distinct()
    dates.select(
      dense_rank().over(Window.orderBy(col("date"))).as("date_key"),
      col("date"),
      year(col("date")).as("year"),
      month(col("date")).as("month"),
      dayofmonth(col("date")).as("day"),
      date_format(col("date"), "EEEE").as("day_name"))
  }

  /** Attach a dimension's surrogate key to a fact frame via broadcast
    * equi-join on the natural key (dims are small by construction).
    */
  def resolveKey(fact: DataFrame, dim: DataFrame, on: Seq[String],
      keep: Seq[String]): DataFrame =
    fact.join(broadcast(dim.select((on ++ keep).map(col): _*)), on)
}
