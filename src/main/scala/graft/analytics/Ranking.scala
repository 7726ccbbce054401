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

  /** Scale-safe per-group top-k by score: the bounded-heap
    * [[graft.plans.TopKByScore]] aggregate instead of a `row_number`
    * window — the window ships every group's FULL row set to one reducer
    * per group, while the heap's map-side partials cross the shuffle as k
    * pairs per (group × task). Use for "best k documents per language /
    * per domain / per source" selections where groups are large and few.
    * Ordering: score desc, id asc (ties deterministic). Emits
    * `(group, id, score, rnk)`.
    */
  def topKPerGroup(df: DataFrame, group: Column, score: Column, id: Column,
      k: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    require(k >= 1, s"k must be >= 1, got $k")
    val shaped = df.select(group.as("group"), score.cast("double").as("__s"),
      id.cast("long").as("__i"))
    val agg = graft.plans.TopKByScore(
      ColumnBridge.expression(col("__s")),
      ColumnBridge.expression(col("__i")), k)
    shaped.groupBy(col("group"))
      .agg(ColumnBridge.column(agg.toAggregateExpression()).as("topk"))
      .select(col("group"), posexplode(col("topk")).as(Seq("pos", "t")))
      .select(col("group"), col("t.id").as("id"), col("t.score").as("score"),
        (col("pos") + 1).cast("int").as("rnk"))
  }
}
