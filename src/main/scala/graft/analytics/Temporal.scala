package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively: as-of join and
  * point-in-interval (range) join. Both are built from shuffle-once
  * primitives — no BroadcastNestedLoopJoin, no cross join — so the plans
  * survive a 100 TB fact table.
  */
object Temporal {

  /** As-of join: for each left row, attach the LATEST right row with the
    * same `key` and right.`time` <= left.`time` (pandas `merge_asof` /
    * SQL `ASOF JOIN` semantics, `direction = "backward"`). Unmatched left
    * rows keep nulls. `direction = "forward"` attaches the EARLIEST right
    * row with right.`time` >= left.`time` instead — same single-shuffle
    * plan, with the window running over the reversed time order.
    *
    * Plan shape: tag each side, union, ONE window over
    * (partitionBy key, orderBy time, side, tiebreak) carrying the last
    * non-null right payload forward — a single shuffle on `key`, no join
    * operator at all. The classic sort-merge formulation of as-of without
    * the unbounded-preceding row explosion of a `theta` join: at 100 TB
    * this is one exchange + one sort, same cost class as any keyed window.
    * A hot key serializes within its partition (standard window-skew
    * caveat); salt upstream if one key dominates.
    *
    * Right rows sort BEFORE left rows at the same timestamp, so an exact
    * timestamp tie matches (inclusive <=). If several right rows share
    * (key, time), the one greatest by `rightTiebreak` wins — pass columns
    * making (key, time, tiebreak) unique for deterministic output, or
    * pre-aggregate the right side to unique (key, time).
    *
    * Output: every left column unchanged + every non-key right column
    * prefixed with `prefix` (including right's `time`, so callers can
    * apply a staleness tolerance as a plain filter afterwards).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
      rightTiebreak: Seq[String] = Nil, prefix: String = "asof_",
      direction: String = "backward"): DataFrame =
    asofImpl(left, right, key, time, rightTiebreak, prefix, direction,
      saltBuckets = 1, saltSource = Nil)

  /** Nearest-in-time as-of join: match each left row to the right row
    * closest in EITHER direction — sensor fusion's default alignment
    * (pair a reading with the nearest calibration/weather sample, not
    * just the most recent), where [[asofJoin]]'s backward face is the
    * point-in-time-correctness rule. Exact distance ties favor the past
    * (backward) match, and a timestamp tie is distance 0 both ways, so
    * ties are deterministic given the [[asofJoin]] tiebreak contract.
    *
    * Implementation: one backward and one forward [[asofJoin]], then a
    * per-row pick by |Δt| in exact integer micros. Two key-partitioned
    * window passes instead of one — the compose keeps both faces
    * row-identical to their singly-used selves (and oracle-checkable
    * through them); a fused single-window variant would save one sort at
    * the cost of a third ordering semantics to verify.
    */
  def asofNearest(left: DataFrame, right: DataFrame, key: String, time: String,
      rightTiebreak: Seq[String] = Nil, prefix: String = "near_"): DataFrame = {
    val rightCols = right.columns.filterNot(_ == key).toSeq
    val b = asofJoin(left, right, key, time, rightTiebreak, "__b_", "backward")
    val bf = asofJoin(b, right, key, time, rightTiebreak, "__f_", "forward")
    val lUs = unix_micros(col(time))
    val bUs = unix_micros(col(s"__b_$time"))
    val fUs = unix_micros(col(s"__f_$time"))
    val useB = col(s"__b_$time").isNotNull &&
      (col(s"__f_$time").isNull || (lUs - bUs) <= (fUs - lUs))
    val picked = rightCols.map(c =>
      when(useB, col(s"__b_$c")).otherwise(col(s"__f_$c")).as(s"$prefix$c"))
    val passthrough = bf.columns
      .filterNot(c => c.startsWith("__b_") || c.startsWith("__f_"))
      .map(col).toSeq
    bf.select(passthrough ++ picked: _*)
  }

  /** [[asofJoin]] for a skewed key domain: the hot-key caveat above,
    * resolved. Left rows are spread across `saltBuckets` sub-partitions by
    * a hash of `saltSource` (any columns that vary within a key — an id,
    * the timestamp); the right side is REPLICATED into every bucket, so
    * each left row still sees the full right history of its key and the
    * result is row-identical to the unsalted join (spec + oracle asserted)
    * — but a dominant key's window now runs on `saltBuckets` reducers
    * instead of serializing on one.
    *
    * Cost: right shuffle volume × saltBuckets — the standard
    * replicate-the-small-side trade (as-of right sides are reference/quote
    * streams, typically the smaller). Size `saltBuckets` to the skew, not
    * the cluster: enough that the hottest key's left rows fit a reducer.
    */
  def asofJoinSalted(left: DataFrame, right: DataFrame, key: String,
      time: String, saltSource: Seq[String], saltBuckets: Int,
      rightTiebreak: Seq[String] = Nil, prefix: String = "asof_",
      direction: String = "backward"): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    require(saltSource.nonEmpty, "saltSource columns are required")
    asofImpl(left, right, key, time, rightTiebreak, prefix, direction,
      saltBuckets, saltSource)
  }

  private def asofImpl(left: DataFrame, right: DataFrame, key: String,
      time: String, rightTiebreak: Seq[String], prefix: String,
      direction: String, saltBuckets: Int, saltSource: Seq[String]): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward', got '$direction'")
    val backward = direction == "backward"
    val rPayload = right.columns.filter(_ != key).toSeq
    val collisions = left.columns.toSet.intersect(rPayload.map(prefix + _).toSet)
    require(collisions.isEmpty, s"asofJoin output name collision: $collisions")

    // salt columns: left rows hash into one bucket, right rows explode
    // into all of them (bucket contents stay self-sufficient). The
    // unsalted path pins both to bucket 0 — same plan as before modulo a
    // constant partition column.
    val lSalt = if (saltBuckets == 1) lit(0)
      else pmod(hash(saltSource.map(col): _*), lit(saltBuckets))
    val rSalt = if (saltBuckets == 1) array(lit(0))
      else array((0 until saltBuckets).map(lit): _*)

    // struct keeps the tiebreak columns' native ordering semantics
    val tb = if (rightTiebreak.isEmpty) lit(0)
      else struct(rightTiebreak.map(col): _*)
    val ru = right.select(col(key).as("__k"), col(time).as("__t"),
      lit(0).as("__side"), tb.as("__tb"),
      struct(rPayload.map(col): _*).as("__r"))
      .withColumn("__salt", explode(rSalt))
    // salt is computed BEFORE the rename-projection so saltSource can name
    // any left column
    val lu = left.select(col(key).as("__k"), col(time).as("__t"),
      lit(1).as("__side"),
      lit(null).cast(ru.schema("__tb").dataType).as("__tb"),
      lit(null).cast(ru.schema("__r").dataType).as("__r"),
      struct(left.columns.map(col): _*).as("__l"),
      lSalt.as("__salt"))

    // backward: ascending time, carry the LAST right row seen — the latest
    // at-or-before. forward: DESCENDING time, same carry — the earliest
    // at-or-after. Right rows sort before left at equal (t) either way
    // (side asc), keeping exact-timestamp ties inclusive; among equal
    // right rows the frame-last (max tiebreak backward, min forward) wins.
    val timeOrd = if (backward) col("__t").asc else col("__t").desc
    val tbOrd = if (backward) col("__tb").asc_nulls_first
      else col("__tb").desc_nulls_first
    val w = Window.partitionBy(col("__k"), col("__salt"))
      .orderBy(timeOrd, col("__side").asc, tbOrd)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = ru.withColumn("__l", lit(null).cast(lu.schema("__l").dataType))
      .unionByName(lu)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val outCols =
      left.columns.toSeq.map(c => col("__l").getField(c).as(c)) ++
        rPayload.map(c => col("__m").getField(c).as(prefix + c))
    matched.select(outCols: _*)
  }

  /** Point-in-interval (range) join: pair each `points` row with every
    * `intervals` row of the same `key` whose [`start`, `end`] contains the
    * point's `time` (bounds inclusive).
    *
    * Plan shape: bucketize time at `grainSeconds` — each interval explodes
    * to its covered buckets, each point maps to exactly one — then a plain
    * equi-join on (key, bucket) + the exact BETWEEN filter. Each
    * (interval, point) match is produced exactly once (in the point's
    * bucket), so no dedup pass is needed. This is the standard scale-out
    * rewrite of an interval theta-join: the shuffle key regains equality
    * semantics and quadratic work is confined to same-bucket pairs.
    *
    * Pick `grainSeconds` near the TYPICAL interval length: too coarse
    * puts unrelated rows in one bucket (wasted filter work), too fine
    * multiplies each interval's replicated rows (explode factor =
    * length/grain + 1). Degenerate long intervals amplify the explode —
    * cap or split them upstream.
    *
    * Output: every point column + every non-key interval column prefixed
    * with `prefix`.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, key: String,
      time: String, start: String, end: String, grainSeconds: Long,
      prefix: String = "iv_"): DataFrame = {
    require(grainSeconds > 0, "grainSeconds must be positive")
    val iPayload = intervals.columns.filter(_ != key).toSeq
    val collisions = points.columns.toSet.intersect(iPayload.map(prefix + _).toSet)
    require(collisions.isEmpty, s"rangeJoin output name collision: $collisions")
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(unix_micros(c) / (grainSeconds * 1000000L))

    val iv = intervals.select(col(key).as("__k"),
      explode(sequence(bucketOf(col(start)), bucketOf(col(end)))).as("__b"),
      col(start).as("__s"), col(end).as("__e"),
      struct(iPayload.map(col): _*).as("__iv"))
    val pt = points.select(col(key).as("__k"), bucketOf(col(time)).as("__b"),
      col(time).as("__t"), struct(points.columns.map(col): _*).as("__p"))

    val outCols =
      points.columns.toSeq.map(c => col("__p").getField(c).as(c)) ++
        iPayload.map(c => col("__iv").getField(c).as(prefix + c))
    pt.join(iv, Seq("__k", "__b"))
      .filter(col("__t") >= col("__s") && col("__t") <= col("__e"))
      .select(outCols: _*)
  }

  /** Interval-OVERLAP join: every pair of left/right intervals of the same
    * `key` that overlap in time (bounds inclusive) — the interval×interval
    * sibling of [[rangeJoin]]'s point×interval (sessions × outages,
    * campaigns × visits, crawl windows × source embargoes). Spark has no
    * native operator for this; the naive formulation is a theta join that
    * BroadcastNestedLoops at any size.
    *
    * Plan shape: BOTH sides explode to their covered `grainSeconds`
    * buckets and meet on a plain (key, bucket) equi-join + the exact
    * overlap filter `lStart ≤ rEnd ∧ rStart ≤ lEnd`. A pair sharing many
    * buckets would match once per shared bucket, so an OWNERSHIP filter
    * keeps exactly one: the bucket containing `greatest(lStart, rStart)`
    * — the first bucket where both intervals are live, which any
    * overlapping pair shares by construction. No dedup shuffle needed.
    * [[rangeJoin]]'s grain guidance applies to both sides' typical
    * lengths.
    *
    * Output: every left column, every non-key right column prefixed with
    * `prefix`, plus `overlap_start`/`overlap_end`/`overlap_us`.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame, key: String,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      grainSeconds: Long, prefix: String = "r_"): DataFrame = {
    require(grainSeconds > 0, "grainSeconds must be positive")
    val rPayload = right.columns.filter(_ != key).toSeq
    val outNames = rPayload.map(prefix + _) ++
      Seq("overlap_start", "overlap_end", "overlap_us")
    val collisions = left.columns.toSet.intersect(outNames.toSet)
    require(collisions.isEmpty, s"overlap join output name collision: $collisions")
    val grainUs = grainSeconds * 1000000L
    def bucketOf(c: org.apache.spark.sql.Column) = floor(unix_micros(c) / grainUs)

    val l = left.select(col(key).as("__k"),
      explode(sequence(bucketOf(col(lStart)), bucketOf(col(lEnd)))).as("__b"),
      col(lStart).as("__ls"), col(lEnd).as("__le"),
      struct(left.columns.map(col): _*).as("__l"))
    val r = right.select(col(key).as("__k"),
      explode(sequence(bucketOf(col(rStart)), bucketOf(col(rEnd)))).as("__b"),
      col(rStart).as("__rs"), col(rEnd).as("__re"),
      struct(rPayload.map(col): _*).as("__r"))
    val outCols =
      left.columns.toSeq.map(c => col("__l").getField(c).as(c)) ++
        rPayload.map(c => col("__r").getField(c).as(prefix + c)) ++ Seq(
          greatest(col("__ls"), col("__rs")).as("overlap_start"),
          least(col("__le"), col("__re")).as("overlap_end"),
          (unix_micros(least(col("__le"), col("__re"))) -
            unix_micros(greatest(col("__ls"), col("__rs")))).as("overlap_us"))
    l.join(r, Seq("__k", "__b"))
      .filter(col("__ls") <= col("__re") && col("__rs") <= col("__le"))
      .filter(col("__b") === bucketOf(greatest(col("__ls"), col("__rs"))))
      .select(outCols: _*)
  }

  /** Time-grid resampling with linear interpolation: per key, a regular
    * `stepSeconds` grid spanning that key's own first-to-last observation,
    * each grid point valued by interpolating between its neighboring
    * observations (pandas `resample().interpolate()` for irregular IoT
    * telemetry — the step before any fixed-frequency model consumes the
    * feed). Duplicate (key, time) observations collapse to their max
    * first, so neighbors are unique and the result deterministic.
    *
    * Built from the existing shuffle-once primitives: one backward and one
    * forward [[asofJoin]] attach the bracketing observations, then the
    * interpolation is a pure projection in integer microseconds (exact
    * ratio inputs — no float time arithmetic). A grid point that lands
    * exactly on an observation (or a single-observation key, where both
    * brackets are the same row) takes the observed value — never a 0/0.
    *
    * Scale shape: the grid explodes from a key-sized bounds frame
    * (|keys| × span/step rows, generated — never read); each as-of join is
    * the standard single (key)-shuffle window. At 100 TB the cost is two
    * keyed shuffles of grid + observations, linear in both.
    */
  def resampleInterpolate(df: DataFrame, key: String, time: String,
      value: org.apache.spark.sql.Column, stepSeconds: Long): DataFrame = {
    require(stepSeconds >= 1, s"stepSeconds must be >= 1, got $stepSeconds")
    val obs = df.groupBy(col(key), col(time)).agg(max(value).as("v"))
    val grid = obs.groupBy(col(key))
      .agg(min(col(time)).as("__lo"), max(col(time)).as("__hi"))
      .select(col(key), explode(sequence(col("__lo"), col("__hi"),
        expr(s"INTERVAL $stepSeconds SECONDS"))).as(time))
    val both = asofJoin(
      asofJoin(grid, obs, key, time, prefix = "prev_", direction = "backward"),
      obs, key, time, prefix = "next_", direction = "forward")
    val t = unix_micros(col(time))
    val pt = unix_micros(col(s"prev_$time"))
    val nt = unix_micros(col(s"next_$time"))
    val interp = when(nt === pt, col("prev_v"))
      .otherwise(col("prev_v") + (col("next_v") - col("prev_v")) *
        ((t - pt).cast("double") / (nt - pt).cast("double")))
    both.select(col(key), col(time), round(interp, 6).as("value"))
  }

  /** Sensor-downtime report: for each key, every silence between two
    * consecutive observations longer than `minGapSeconds` — the health
    * screen behind "station X sent nothing for 6 hours" alerts, and the
    * crawl-side screen for source feeds that stalled mid-ingest. The
    * complement of [[graft.analytics.Sessions.sessionize]]: sessions keep
    * the rows BETWEEN gaps, this reports the gaps themselves.
    *
    * Emits `(key, gap_start, gap_end, gap_secs)` — `gap_start` the last
    * observation before the silence, `gap_end` the first after it.
    * Whole-second timestamps compare in `unix_micros`, so sub-second
    * spacing is honored (strictly-greater-than the threshold).
    *
    * Scale shape: ONE shuffle on `key`, one lag window, then a narrow
    * filter — output is gap-sized, never observation-sized. Pass `order`
    * columns breaking exact-timestamp ties (the [[Sessions.sessionize]]
    * determinism contract); a hot key serializes in one task.
    */
  def gaps(df: DataFrame, key: String, time: String, minGapSeconds: Long,
      order: Seq[String] = Nil): DataFrame = {
    require(minGapSeconds > 0, s"minGapSeconds must be > 0, got $minGapSeconds")
    val sort = (col(time) +: order.map(col)).map(_.asc)
    val w = Window.partitionBy(col(key)).orderBy(sort: _*)
    df.select(col(key) +: col(time) +: order.map(col): _*)
      .withColumn("__prev", lag(col(time), 1).over(w))
      .filter(col("__prev").isNotNull &&
        unix_micros(col(time)) - unix_micros(col("__prev")) >
          minGapSeconds * 1000000L)
      .select(col(key), col("__prev").as("gap_start"),
        col(time).as("gap_end"),
        ((unix_micros(col(time)) - unix_micros(col("__prev"))) / 1000000L)
          .cast("long").as("gap_secs"))
  }

  /** Time-weighted mean: each reading weighted by how long it HELD (the
    * interval to the next reading) — the correct average for sampled
    * state signals, where the plain row mean is an artifact of the
    * sampling cadence (a sensor that reports every second while idle and
    * every hour under load makes idle look dominant to a row mean;
    * telemetry/SCADA averages are time-weighted for exactly this reason).
    * The last reading of a key has no successor interval and contributes
    * no weight.
    *
    * Determinism: values quantize to centi-units and intervals to exact
    * integer milliseconds, so both sums are merge-order-exact integer
    * sums (products bounded ≪ 2⁵³ at any realistic key size) and the
    * final division is one deterministic double op.
    *
    * Scale shape: one per-key window (lead), one per-key aggregate.
    */
  def timeWeightedMean(df: DataFrame, key: String, time: String,
      value: Column, order: Seq[String] = Nil): DataFrame = {
    val sort = (col(time) +: order.map(col)).map(_.asc)
    val w = Window.partitionBy(col(key)).orderBy(sort: _*)
    df.select(col(key) +: col(time) +: value.as("__v") +: order.map(col): _*)
      .withColumn("__us", unix_micros(col(time)))
      .withColumn("__next_us", lead(col("__us"), 1).over(w))
      .withColumn("__dt_ms", expr("(__next_us - __us) DIV 1000"))
      .filter(col("__dt_ms").isNotNull)
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("__dt_ms")).as("total_ms"),
        (sum(round(col("__v").cast("double") * 100) * col("__dt_ms")) /
          sum(col("__dt_ms")) / 100.0).as("__twa"))
      .select(col(key), col("n_intervals"), col("total_ms"),
        round(col("__twa"), 6).as("tw_mean"))
  }

  /** First-order Markov transition matrix over per-key ordered state
    * streams: counts and conditional probabilities of consecutive
    * (state → state) transitions — the behavior model underneath the a31
    * funnel (a funnel asserts ONE path; the matrix shows every path and
    * its mass) and the IoT state-machine sanity check (a transition the
    * device firmware cannot make, appearing with mass, is an ingestion
    * bug).
    *
    * Shape: one per-key lag window; the (prev, cur) aggregate is
    * |states|²-bounded; row totals join back broadcast.
    */
  def transitionMatrix(df: DataFrame, key: String, time: String,
      state: Column, order: Seq[String] = Nil): DataFrame = {
    val sort = (col(time) +: order.map(col)).map(_.asc)
    val w = Window.partitionBy(col(key)).orderBy(sort: _*)
    val pairs = df
      .select(col(key) +: col(time) +: state.as("__s") +: order.map(col): _*)
      .withColumn("__prev", lag(col("__s"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("from_state"), col("__s").as("to_state"))
      .agg(count(lit(1)).as("cnt"))
    val fromTot = pairs.groupBy(col("from_state")).agg(sum(col("cnt")).as("__ft"))
    pairs.join(broadcast(fromTot), "from_state")
      .select(col("from_state"), col("to_state"), col("cnt"),
        round(col("cnt").cast("double") / col("__ft").cast("double"), 6)
          .as("prob"))
  }

  /** Stationary distribution of the [[transitionMatrix]] Markov chain:
    * fixed-iteration power method from the uniform start — "where does
    * behavior CONCENTRATE once transients wash out", the one-vector
    * summary of the a43 matrix (a funnel dashboard reads P, a capacity
    * planner reads π). States with no outgoing transitions (a terminal
    * event type) get the standard self-loop patch so mass is conserved
    * instead of leaking.
    *
    * Determinism: the chain is built from round-6 probabilities and π is
    * re-rounded at 6 EVERY iteration (the fixed-point discipline the
    * PageRank family uses) — both engines iterate identical vectors, so
    * the result is engine-exact, not approximately-equal. States are a
    * bounded domain (event types); each iteration is one
    * |states|²-bounded join + aggregate, and the `states.count()` driver
    * action touches a model-sized frame only.
    */
  def stationaryDistribution(df: DataFrame, key: String, time: String,
      state: Column, order: Seq[String] = Nil, iters: Int = 8): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val tm = transitionMatrix(df, key, time, state, order)
      .select(col("from_state"), col("to_state"), col("prob"))
      .localCheckpoint(true)
    val states = tm.select(col("from_state").as("s"))
      .unionByName(tm.select(col("to_state").as("s"))).distinct()
      .localCheckpoint(true)
    val dangling = states
      .join(tm.select(col("from_state").as("s")).distinct(), Seq("s"),
        "left_anti")
      .select(col("s").as("from_state"), col("s").as("to_state"),
        lit(1.0).as("prob"))
    val p = tm.unionByName(dangling).localCheckpoint(true)
    val n = states.count()
    var pi = states.select(col("s"),
      round(lit(1.0) / lit(n.toDouble), 6).as("pi"))
    for (_ <- 1 to iters) {
      pi = p.join(pi, col("from_state") === col("s"))
        .groupBy(col("to_state"))
        .agg(sum(col("pi") * col("prob")).as("__m"))
        .select(col("to_state").as("s"), round(col("__m"), 6).as("pi"))
    }
    pi.select(col("s").as("state"), col("pi"))
  }

  /** Monotonicity audit for cumulative-counter signals (energy meters,
    * byte counters, event sequence numbers): per key, how many
    * consecutive-reading DECREASES occur, and the largest one — a
    * decrease in a counter is a reset, a device swap, or data corruption,
    * and every rate computed across it is garbage. `monotone` is the
    * per-key pass flag.
    *
    * Shape: one per-key lag window, one per-key aggregate.
    */
  def monotonicityAudit(df: DataFrame, key: String, time: String,
      value: Column, order: Seq[String] = Nil): DataFrame = {
    val sort = (col(time) +: order.map(col)).map(_.asc)
    val w = Window.partitionBy(col(key)).orderBy(sort: _*)
    df.select(col(key) +: col(time) +: value.cast("double").as("__v") +:
        order.map(col): _*)
      .withColumn("__drop", lag(col("__v"), 1).over(w) - col("__v"))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_obs"),
        count(when(col("__drop") > 0.0, 1)).as("n_decreases"),
        round(max(when(col("__drop") > 0.0, col("__drop"))), 6).as("max_drop"))
      .withColumn("monotone", col("n_decreases") === 0L)
  }

  /** Availability / SLA report — the per-key rollup of [[gaps]]: observed
    * span, gap count, total downtime (sum of inter-reading silences longer
    * than `minGapSeconds`, same strict-> rule as [[gaps]]) and the
    * availability ratio `1 − downtime/span`. A key with a single reading
    * has zero span and reports availability null (undefined, not 100%).
    *
    * All statistics are exact integer micros until the final ratio, so the
    * report is partitioning-deterministic with no fixed-point tricks.
    * Scale shape: the [[gaps]] window (one shuffle on the key, lag only)
    * feeding one per-key aggregate — output is |keys|-sized.
    */
  def availability(df: DataFrame, key: String, time: String,
      minGapSeconds: Long, order: Seq[String] = Nil): DataFrame = {
    require(minGapSeconds > 0, s"minGapSeconds must be > 0, got $minGapSeconds")
    val sort = (col(time) +: order.map(col)).map(_.asc)
    val w = Window.partitionBy(col(key)).orderBy(sort: _*)
    val gapUs = minGapSeconds * 1000000L
    df.select(col(key) +: col(time) +: order.map(col): _*)
      .withColumn("__us", unix_micros(col(time)))
      .withColumn("__dt", col("__us") - lag(col("__us"), 1).over(w))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_obs"),
        (max(col("__us")) - min(col("__us"))).as("span_us"),
        count(when(col("__dt") > gapUs, 1)).as("n_gaps"),
        coalesce(sum(when(col("__dt") > gapUs, col("__dt"))), lit(0L))
          .as("downtime_us"))
      .select(col(key), col("n_obs"), col("span_us"), col("n_gaps"),
        col("downtime_us"),
        when(col("span_us") > 0,
          round(lit(1.0) - col("downtime_us").cast("double") /
            col("span_us").cast("double"), 6)).as("availability"))
  }

  /** Cohort retention matrix: users bucketed by the week of their FIRST
    * activity, then for each (cohort, week-offset) cell the share of the
    * cohort still active — the standard product-analytics view of churn
    * (and, for a corpus pipeline, of crawl-source longevity when "user"
    * is a domain or feed).
    *
    * Shape: first-seen and per-week activity are both hash aggregates
    * keyed on the user — they co-partition with the user-keyed equi-join
    * between them, so the whole matrix costs ONE user-keyed exchange of
    * distinct (user, week) rows plus week-cardinality-sized frames; the
    * cohort-size join broadcasts (|weeks| rows). Weeks are ISO-Monday
    * `date_trunc` in both engines; offsets are exact day-diff/7 on the
    * truncated values.
    */
  def cohortRetention(df: DataFrame, user: Column, ts: Column): DataFrame = {
    val first = df.groupBy(user.as("__u"))
      .agg(date_trunc("week", min(ts)).as("cohort"))
    val activity = df
      .select(user.as("__ua"), date_trunc("week", ts).as("period")).distinct()
    val counts = activity.join(first, col("__ua") === col("__u"))
      .groupBy(col("cohort"),
        (datediff(col("period"), col("cohort")) / 7).cast("long")
          .as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
    val sizes = first.groupBy(col("cohort")).agg(count(lit(1)).as("cohort_size"))
    counts.join(broadcast(sizes), "cohort")
      .select(unix_timestamp(col("cohort")).as("cohort_ws"),
        col("week_offset"), col("active_users"), col("cohort_size"),
        round(lit(100.0) * col("active_users") / col("cohort_size"), 4)
          .as("retention_pct"))
  }

  /** Per-key burstiness over fixed time buckets: the Fano factor
    * `var/mean` of the key's per-bucket event counts across the CORPUS
    * hour spine (every hour any key fired — silent hours count as zeros,
    * which is the whole point: a key emitting 24 events in one hour and a
    * key emitting one per hour both average 1/hour; only the zeros-vs-
    * burst variance separates them). Fano 1 ≈ Poisson arrivals; ≫ 1 =
    * bursty (batch uploads, replay storms); ≪ 1 = metronomic (a
    * heartbeat). The crawl-scheduling / anomaly-triage companion to
    * [[graft.analytics.Alerts]]' rate spikes.
    *
    * Exact integer identity — with H spine hours, per-key n = Σc and
    * ss = Σc² over its NON-ZERO buckets only (zeros add nothing to
    * either), population variance over all H buckets gives
    * `fano = (H·ss − n²) / (H·n)`: one corpus-sized aggregate to
    * (key, hour) cells, one |cells| reduce per key, one 1-row spine
    * count broadcast; every term a long, one final division.
    */
  def fanoFactor(df: DataFrame, key: Column, time: Column): DataFrame = {
    val cells = df.select(key.as("k"), date_trunc("hour", time).as("h"))
      .groupBy(col("k"), col("h")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val spine = cells.select(col("h")).distinct()
      .agg(count(lit(1)).as("hh"))
    cells.groupBy(col("k"))
      .agg(sum(col("c")).as("n"), sum(col("c") * col("c")).as("ss"))
      .crossJoin(broadcast(spine))
      .select(col("k").as("key"), col("n").as("n_events"),
        col("hh").as("n_hours"),
        round((col("hh") * col("ss") - col("n") * col("n")).cast("double") /
          (col("hh") * col("n")).cast("double"), 6).as("fano"))
  }

  /** Kaplan–Meier retention curve over per-key activity spans — the
    * right-censored answer to "how long do users stay?" that a naive
    * mean-lifetime dashboard gets wrong: a key whose last activity sits
    * within `censorDays` of the observation end hasn't churned, it's
    * CENSORED, and treating it as a death biases lifetime low exactly
    * for the newest cohorts. Duration = whole days between a key's first
    * and last event; churn = last event more than `censorDays` before
    * the corpus max timestamp. S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) with dᵢ
    * churns and nᵢ at-risk (duration ≥ tᵢ) at each distinct duration.
    *
    * Exactness: durations and the (d, c) table are integer; the product
    * is computed as exp(Σ ln(1 − d/n)) on BOTH engines (same window
    * order, same op sequence) so the floats agree to rounding. One row
    * per distinct duration — bounded by the observation window in days,
    * never by key count.
    *
    * Scale shape: one per-key min/max aggregate, a |durations|-row count
    * frame, a broadcast 1-row total, and one ordered window over the
    * duration spine.
    */
  def kaplanMeier(df: DataFrame, key: Column, time: Column,
      censorDays: Int = 3): DataFrame = {
    require(censorDays >= 0, s"censorDays must be >= 0, got $censorDays")
    val spans = df.select(key.as("k"), time.as("ts"))
      .groupBy(col("k"))
      .agg(min(col("ts")).as("__first"), max(col("ts")).as("__last"))
    val obsEnd = df.agg(max(time).as("__end"))
    val perKey = spans.crossJoin(broadcast(obsEnd))
      .select(datediff(col("__last"), col("__first")).cast("long").as("t"),
        (datediff(col("__end"), col("__last")) > censorDays).as("__churn"))
    val byT = perKey.groupBy(col("t"))
      .agg(sum(when(col("__churn"), 1L).otherwise(0L)).as("n_churn"),
        sum(when(!col("__churn"), 1L).otherwise(0L)).as("n_censored"))
    val total = byT.agg(sum(col("n_churn") + col("n_censored")).as("__all"))
    val wBefore = org.apache.spark.sql.expressions.Window.orderBy(col("t"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wCum = org.apache.spark.sql.expressions.Window.orderBy(col("t"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    byT.crossJoin(broadcast(total))
      .withColumn("n_risk", col("__all") -
        coalesce(sum(col("n_churn") + col("n_censored")).over(wBefore), lit(0L)))
      // a duration where EVERYONE at risk churns drives the product to
      // exactly 0 — handled as a flag, not ln(0) (whose null/-inf
      // behavior is engine-dependent)
      .withColumn("__dead",
        max(when(col("n_churn") === col("n_risk"), 1).otherwise(0)).over(wCum))
      .withColumn("survival", when(col("__dead") === 1, lit(0.0))
        .otherwise(round(exp(sum(
          log(lit(1.0) - col("n_churn").cast("double") /
            col("n_risk").cast("double"))).over(wCum)), 6)))
      .select(col("t").as("t_days"), col("n_risk"), col("n_churn"),
        col("n_censored"), col("survival"))
  }
}
