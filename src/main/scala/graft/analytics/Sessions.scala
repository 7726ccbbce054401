package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of one key belong to the
  * same session while the event-time gap stays within `gapSeconds`.
  * The training-data counterpart is grouping interaction logs into
  * dialogue/browsing episodes before per-episode feature extraction.
  */
object Sessions {

  /** Batch sessionization: adds a `session_idx` column (1-based, per key,
    * in time order). One shuffle on `key`; within each partition a sort +
    * two linear window passes (lag, then running sum) — the standard
    * lag/cumsum formulation, no join. `order` breaks event-time ties so
    * the running sum (and thus the labeling) is deterministic; pass
    * columns making (key, time, order) unique.
    *
    * A hot key serializes in one task (window-skew caveat, same as
    * [[Temporal.asofJoin]]); sessions themselves are bounded by the gap so
    * per-session state never accumulates.
    */
  def sessionize(df: DataFrame, key: String, time: String, gapSeconds: Long,
      order: Seq[String] = Nil): DataFrame = {
    require(gapSeconds > 0, "gapSeconds must be positive")
    val sort = (col(time) +: order.map(col)).map(_.asc)
    val w = Window.partitionBy(col(key)).orderBy(sort: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(time), 1).over(w)
    val isNew = when(prev.isNull
        || unix_micros(col(time)) - unix_micros(prev) > gapSeconds * 1000000L, 1)
      .otherwise(0)
    df.withColumn("session_idx", sum(isNew).over(run))
  }

  /** Event-time session windows via `session_window` — the streaming face
    * (works under a watermark; Spark merges overlapping window state) and
    * its batch twin in one shape. Emits one row per (key, session) with
    * `session_start`/`session_end` plus the given aggregates.
    */
  def sessionAgg(df: DataFrame, key: String, time: String, gapSeconds: Long,
      aggs: Seq[Column]): DataFrame =
    df.groupBy(col(key), session_window(col(time), s"$gapSeconds seconds").as("sw"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("sw.start"))
      .withColumn("session_end", col("sw.end"))
      .drop("sw")
}
