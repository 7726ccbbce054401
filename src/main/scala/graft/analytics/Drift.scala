package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift metrics for pipeline monitoring. A filter/gate in a
  * training-data pipeline never removes rows uniformly — it reshapes the
  * distribution of everything correlated with its criterion — and the
  * population stability index is the standard one-number-per-bucket view
  * of that shift (banking/model-monitoring lineage; conventional reading:
  * < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted).
  */
object Drift {

  /** PSI of a metric's distribution between a frame's FULL population and
    * its `kept` sub-population (a gate's before/after view): fixed-width
    * value buckets (`bucket = min(⌊value/bucketWidth⌋, maxBucketIdx)` —
    * fixed edges, so results are deterministic and mergeable across
    * partitions, unlike data-dependent quantile edges), add-one (Laplace)
    * smoothed shares on both sides so empty buckets stay finite, and the
    * per-bucket signed PSI term `(p_before − p_after)·ln(p_before/p_after)`
    * (each term ≥ 0; their sum is the PSI). Emits one row per observed
    * bucket: `(bucket, c_before, c_after, psi_term)`.
    *
    * Scale shape: ONE pass over the frame (the gate flag rides the same
    * scan — no second evaluation of the gated subset), a bucket-keyed
    * aggregate of conditional counts (≤ maxBucketIdx+1 rows), and the
    * totals return as a single broadcast cross-join. Nothing after the
    * first aggregate is corpus-sized.
    */
  def psiGateShift(df: DataFrame, value: Column, kept: Column,
      bucketWidth: Long, maxBucketIdx: Int): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    require(maxBucketIdx >= 1, s"maxBucketIdx must be >= 1, got $maxBucketIdx")
    val b = df.select(
      least(floor(value.cast("double") / bucketWidth.toDouble).cast("long"),
        lit(maxBucketIdx.toLong)).as("bucket"),
      kept.as("__k"))
    val cb = b.groupBy(col("bucket"))
      .agg(count(lit(1)).as("c_before"),
        count(when(col("__k"), 1)).as("c_after"))
    val tot = cb.agg(sum(col("c_before")).as("__tb"),
      sum(col("c_after")).as("__ta"), count(lit(1)).as("__nb"))
    val pa = (col("c_before").cast("double") + lit(1.0)) /
      (col("__tb").cast("double") + col("__nb").cast("double"))
    val pb = (col("c_after").cast("double") + lit(1.0)) /
      (col("__ta").cast("double") + col("__nb").cast("double"))
    cb.crossJoin(broadcast(tot))
      .select(col("bucket"), col("c_before"), col("c_after"),
        round((pa - pb) * log(pa / pb), 6).as("psi_term"))
  }
}
