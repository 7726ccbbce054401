package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Leakage-safe categorical feature encoding for model-training tables.
  * Naive target encoding (replace a category with its target mean) leaks
  * each row's own label into its feature and a quality classifier
  * "learns" its own answer; the leave-one-out form subtracts the row
  * before dividing, and the smoothed form shrinks thin categories toward
  * the global prior — the two standard fixes, emitted side by side.
  */
object Encoding {

  /** Per-row leave-one-out target encoding of `group` against a numeric
    * (or 0/1) `target`:
    *
    *   loo_raw = (Σ_group y − y_i) / (n_group − 1)      (null when n = 1)
    *   enc     = (Σ_group y − y_i + m·prior) / (n_group − 1 + m)
    *
    * with `prior` the global target mean and `m = smoothing` the
    * pseudo-count — a singleton category reads exactly `prior` instead
    * of being undefined, and a 3-row category barely moves off it (the
    * high-cardinality-category overfit guard).
    *
    * Scale shape: one grouped (sum, count) per category, one broadcast
    * 1-row prior, one equi-join back to rows — the encoding is a
    * projection over the row frame, no window, no per-row state. Output
    * doubles round at 6 dp (the prior is itself a merge-order aggregate).
    */
  def looTargetEncode(df: DataFrame, id: Column, group: Column,
      target: Column, smoothing: Double = 10.0): DataFrame = {
    require(smoothing > 0, s"smoothing must be > 0, got $smoothing")
    val base = df.select(id.as("id"), group.as("group"),
      target.cast("double").as("y"))
    val g = base.groupBy(col("group"))
      .agg(sum(col("y")).as("__s"), count(lit(1)).as("__n"))
    val pr = base.agg(avg(col("y")).as("__prior"))
    base.join(g, Seq("group")).crossJoin(broadcast(pr))
      .select(col("id"), col("group"), col("y"),
        round(when(col("__n") > 1,
          (col("__s") - col("y")) / (col("__n") - 1).cast("double")), 6)
          .as("loo_raw"),
        round((col("__s") - col("y") + lit(smoothing) * col("__prior")) /
          ((col("__n") - 1).cast("double") + lit(smoothing)), 6).as("enc"))
  }
}
