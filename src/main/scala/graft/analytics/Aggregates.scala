package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation operators (SURVEY.md §2.4, A1-A8, A14).
  *
  * Every group-by here is a single hash aggregate: Spark plans a partial
  * (map-side) aggregate before the exchange, so the shuffle carries one row
  * per (partition × group) — at 100 TB with low-cardinality group keys the
  * exchange is tiny regardless of input size.
  */
object Aggregates {

  /** A1: global scalar aggregates — one row, no grouping
    * (ref `Solar_Dashboard.py:173-186`).
    */
  def globalStats(df: DataFrame, aggs: Seq[Column]): DataFrame = df.agg(aggs.head, aggs.tail: _*)

  /** A2/A4: multi-metric per-group summary
    * (ref `Wind_Dashboard.py:609-620`).
    */
  def groupedStats(df: DataFrame, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)

  /** Weighted median per group: the smallest value whose cumulative
    * weight reaches half the group's total — the robust center that a
    * weighted mean is not (one mispriced whale row moves the mean, not
    * the median), and the right "typical token-weighted document length" /
    * "typical quantity-weighted price" statistic for a datacard.
    *
    * One shuffle on the group key, then a sort and ONE window pass: the
    * default window frame with an ORDER BY is RANGE UNBOUNDED PRECEDING →
    * CURRENT ROW — peers (tied values) are summed TOGETHER on every
    * engine, so the crossing test never depends on tie order. `weight`
    * must be integral (checked per row — a non-integral weight raises
    * rather than silently truncating): integer cumulative sums are exact
    * at any
    * accumulation order, where a double cumsum's last-ulp jitter could
    * flip the ≥ half comparison exactly at the crossing row. Fractional
    * weights should be pre-quantized by the caller (the [[fixedPointAvg]]
    * discipline).
    *
    * A hot group serializes its sort in one task — the documented
    * window-skew caveat; for sketched quantiles at extreme group sizes
    * use [[describe]]'s Greenwald-Khanna face instead.
    */
  def weightedMedian(df: DataFrame, groups: Seq[Column], value: Column,
      weight: Column): DataFrame = {
    // windows are defined over the POST-projection frame (value/weight
    // are renamed __v/__w there), so order/partition by those names
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groups: _*).orderBy(col("__v").asc)
    val tot = org.apache.spark.sql.expressions.Window.partitionBy(groups: _*)
    val wl = when(weight.cast("long").cast("double") === weight.cast("double"),
        weight.cast("long"))
      .otherwise(raise_error(concat(
        lit("weightedMedian: non-integral weight "), weight.cast("string"))))
    df.select(groups :+ value.as("__v") :+ wl.as("__w"): _*)
      .withColumn("__cum", sum(col("__w")).over(w))
      .withColumn("__tot", sum(col("__w")).over(tot))
      .filter(col("__cum") * 2 >= col("__tot"))
      .groupBy(groups: _*)
      .agg(min(col("__v")).as("weighted_median"),
        max(col("__tot")).as("total_weight"))
  }

  /** Merge-order-independent mean of a fixed-point column: quantize each
    * value to an exact integer at `scale` decimals (both engines round the
    * same near-integer product to the same int), sum those integers in
    * double — exact at ANY merge order while |sum| < 2⁵³ — and divide once.
    * A naive double `avg` over a multi-partition scan is perturbed in its
    * last ulps by partial-sum merge order, which makes a 6-dp-rounded
    * oracle comparison run-order-dependent; this form is deterministic
    * under any partitioning and bit-identical across engines.
    */
  def fixedPointAvg(value: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    avg(round(value * f)) / f
  }

  /** Merge-order-independent mean with NO quantization: plain `avg`, for
    * callers whose data is not fixed-point. The result is subject to
    * double partial-sum merge-order jitter in the last ulps — fine for any
    * consumer except a bit-exact cross-engine comparison, which should use
    * [[fixedPointAvg]] with a scale that covers the data's precision.
    */
  def exactAvg(value: Column): Column = avg(value)

  /** A5: capacity factor — per-group mean over the GLOBAL max
    * (ref `Wind_Dashboard.py:617`). The global max re-aggregates the
    * already-grouped frame (|keys| rows) to one row and broadcast
    * cross-joins it back — same cost as the unpartitioned-window form it
    * replaces, but no `WindowExec: No Partition Defined` warning and no
    * single-partition exchange in the plan. The mean is [[fixedPointAvg]]
    * so the ratio is partition-order-independent.
    *
    * `valueScale` is REQUIRED and must cover the data's decimal precision:
    * quantizing at a coarser scale than the data silently biases the mean
    * (values around 0.004 at scale 2 average to 0). The quantized sum must
    * also stay below 2⁵³ (n·maxAbs·10^scale) or exactness is lost — at a
    * scale where that bound binds, aggregate in stripes or use DECIMAL.
    */
  def capacityFactor(df: DataFrame, key: Column, value: Column,
      valueScale: Int, outName: String = "capacity_factor_pct"): DataFrame = {
    val grouped = df.groupBy(key)
      .agg(fixedPointAvg(value, valueScale).as("__avg"), max(value).as("__max"))
    val gmax = grouped.agg(max(col("__max")).as("__gmax"))
    grouped
      .crossJoin(broadcast(gmax))
      .select(key, round(col("__avg") / col("__gmax") * 100.0, 6).as(outName))
  }

  /** A8: describe-style summary block — count/mean/stddev/min/quartiles/max
    * per group (ref `Wind_Dashboard.py:672-687`). Uses exact `percentile`
    * to agree bit-for-bit with an interpolating oracle; swap for
    * `percentile_approx` at the 100 TB tier where an exact sort-based
    * percentile would shuffle the full column.
    *
    * `valueScale` is REQUIRED — see [[capacityFactor]]: a scale coarser
    * than the data's precision silently biases the mean, and the quantized
    * sum must stay below 2⁵³ for merge-order exactness.
    */
  def describe(df: DataFrame, key: Column, value: Column,
      valueScale: Int): DataFrame =
    df.groupBy(key).agg(
      count(value).as("cnt"),
      round(fixedPointAvg(value, valueScale), 6).as("mean"),
      round(stddev_samp(value), 6).as("std"),
      round(min(value), 6).as("min"),
      round(percentile(value, lit(0.25)), 6).as("p25"),
      round(percentile(value, lit(0.5)), 6).as("p50"),
      round(percentile(value, lit(0.75)), 6).as("p75"),
      round(max(value), 6).as("max"))

  /** The [[describe]] quartiles at the 100 TB tier: `percentile_approx`
    * (GK sketch, single pass, bounded memory) checked against the exact
    * sort-based percentile in one aggregate, emitting per-quartile
    * within-tolerance booleans. Same tolerance-oracle pattern as the HLL
    * check: the sketch VALUE has no cross-engine twin (and is
    * merge-order-dependent in its last ranks), but the PROPERTY
    * "within rank-error tolerance of exact" holds under any partitioning —
    * the oracle asserts TRUE per group, so a sketch drifting past its
    * guarantee fails the hash match. Exact percentile makes this
    * correctness-gate-only; production uses the approx side alone.
    */
  def approxQuartilesWithin(df: DataFrame, key: Column, value: Column,
      accuracy: Int = 10000, relTol: Double = 0.02,
      absTol: Double = 0.5): DataFrame = {
    val qs = Seq(("p25", 0.25), ("p50", 0.5), ("p75", 0.75))
    val aggs = qs.flatMap { case (n, q) =>
      Seq(percentile(value, lit(q)).as(s"__ex_$n"),
        percentile_approx(value, lit(q), lit(accuracy)).as(s"__ap_$n"))
    }
    val checks = qs.map { case (n, _) =>
      (abs(col(s"__ap_$n") - col(s"__ex_$n")) <=
        abs(col(s"__ex_$n")) * relTol + absTol).as(s"${n}_ok")
    }
    df.groupBy(key).agg(aggs.head, aggs.tail: _*)
      .select(key +: checks: _*)
  }

  /** Skew-safe two-phase sum: salt the key into `saltBuckets` sub-keys,
    * aggregate per (key, salt), then merge per key. A heavy-hitter key's
    * rows land on `saltBuckets` reducers instead of one — the standard
    * manual complement to AQE skew handling for aggregations (AQE only
    * splits skewed JOIN partitions). Result is identical to a plain
    * groupBy-sum; only the shuffle distribution changes.
    *
    * Salt must be deterministic per row (here: a hash of the salt column),
    * so re-runs and retries place rows identically.
    */
  def saltedSum(df: DataFrame, key: Column, saltSource: Column, value: Column,
      saltBuckets: Int, outName: String): DataFrame =
    df.groupBy(key, pmod(hash(saltSource), lit(saltBuckets)).as("__salt"))
      .agg(sum(value).as("__partial"))
      .groupBy(key)
      .agg(round(sum(col("__partial")), 2).as(outName))

  /** Mergeable rollup state for the algebraic aggregates — incremental
    * materialized-view maintenance without rescans. [[partialRollup]]
    * reduces one snapshot/partition/day to per-key state rows
    * `(key, rows, cnt, sum, min, max)`; [[mergeRollups]] combines ANY
    * number of such frames by re-aggregating the state with each
    * statistic's merge operator (sum of sums, min of mins, …), which is
    * exactly Spark's own partial-aggregate contract lifted to a stored
    * column format. Associative and commutative, so daily rollups compose
    * into monthly ones in any order — the a21/a24 sketch-merge pattern for
    * the EXACT aggregates. `avg` is derived at [[finishRollup]] time
    * (sum/cnt), never merged: mean of means is the classic MV bug.
    *
    * Scale shape: each partial is one map-side-combined hash aggregate to
    * |keys| rows; a merge shuffles only state rows (key-cardinality,
    * never row-cardinality). `rows` counts every record, `cnt`/`sum`/
    * `min`/`max` ignore nulls (a key whose values are all null merges as
    * null, matching a direct one-shot aggregate).
    */
  def partialRollup(df: DataFrame, key: Column, value: Column): DataFrame =
    df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("rows"), count(value).as("cnt"),
        sum(value).as("sum"), min(value).as("min"), max(value).as("max"))

  /** Merge rollup-state frames from [[partialRollup]] (or earlier
    * merges — the state is closed under merging).
    */
  def mergeRollups(parts: DataFrame*): DataFrame = {
    require(parts.nonEmpty, "need at least one rollup frame")
    parts.reduce(_.unionByName(_))
      .groupBy(col("key"))
      .agg(sum(col("rows")).as("rows"), sum(col("cnt")).as("cnt"),
        sum(col("sum")).as("sum"), min(col("min")).as("min"),
        max(col("max")).as("max"))
  }

  /** Derive the non-mergeable statistics from rollup state. */
  def finishRollup(state: DataFrame, scale: Int = 6): DataFrame =
    state.select(col("key"), col("rows"), col("cnt"),
      round(col("sum"), scale).as("sum"), col("min"), col("max"),
      when(col("cnt") > 0, round(col("sum") / col("cnt"), scale)).as("avg"))

  /** A14 / T5: tumbling-window aggregation over event time — the batch
    * equivalent of the streaming windowed agg. `window()` is a plain
    * projection before the group-by (no extra shuffle vs. groupBy).
    */
  def tumblingAgg(df: DataFrame, ts: Column, width: String, aggs: Seq[Column]): DataFrame =
    df.groupBy(window(ts, width).as("w"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("w.start"))
      .drop("w")

  /** Hopping (sliding) window aggregation: windows of `width` starting
    * every `slide` — each event lands in `width/slide` overlapping
    * windows, the dashboard smoothing a tumbling window can't give (a
    * tumbling hourly mean jumps at each boundary; an hourly window
    * sliding every 30 min updates twice as often over the same span).
    * Optional extra grouping keys ride along.
    *
    * Scale shape: `window(ts, width, slide)` EXPLODES each row into its
    * window memberships before the group-by — shuffle volume is
    * width/slide × the tumbling case (inherent to hopping semantics, the
    * same cost Flink/KSQL pay), and the aggregate still partial-aggregates
    * map-side. Keep the ratio small; a ratio of 60 (1 h window, 1 min
    * slide) wants the incremental-rollup (a29) decomposition instead.
    */
  def hoppingAgg(df: DataFrame, ts: Column, width: String, slide: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(ts, width, slide).as("w") +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("w.start"))
      .drop("w")
}
