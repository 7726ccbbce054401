package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis over a keyed event stream: for each entity
  * (user/device), did it perform step 1, then step 2 at-or-after its first
  * step 1, then step 3 at-or-after its first qualifying step 2, ... — the
  * classic product-analytics query (view → click → purchase) and, on the
  * IoT side, the alarm-escalation ladder (warning → error → shutdown).
  *
  * Semantics: an entity reaches stage `i` iff it has an event of stage
  * `i`'s type whose timestamp is `>=` the entity's FIRST qualifying
  * timestamp of stage `i-1` (ties count: distinct steps logged at the same
  * instant are treated as ordered by stage, matching the usual funnel
  * convention; a strict `>` variant is one operator flag away but is not
  * what product funnels ship). The qualifying timestamp carried forward is
  * the MINIMUM such timestamp, which makes the whole computation
  * deterministic and maximizes downstream reach (any later stage that can
  * qualify against some step-`i` event can qualify against the earliest).
  *
  * Scale shape: stage 1 is one key-grouped min; each later stage is one
  * hash join on the entity key against the (already key-partitioned)
  * event frame plus one key-grouped min — `stages.length - 1` shuffle
  * joins total, each keyed the same way so AQE/bucketing can co-locate
  * them, and every intermediate frame is one row per surviving entity
  * (monotonically shrinking). No windows, no per-entity event collection —
  * an entity with a million events never materializes them in one task.
  * The final counts frame is `stages.length` rows; the conversion-rate
  * window over it is driver-trivial by construction.
  */
object Funnel {

  /** Per-stage reach: `(stage_idx, stage, n_entities, conversion)` where
    * `conversion` is the fraction of the PREVIOUS stage's entities that
    * reached this stage (stage 1 reports 1.0) rounded to 6 dp, and
    * `overall` is the fraction of stage 1's entities, rounded likewise.
    */
  /** reached(i): one row per entity that completed stages 0..i, carrying
    * the earliest qualifying timestamp of stage i. Each stage frame is
    * localCheckpointed: stage i+1's join and every consumer below reuse
    * it, so without the checkpoint stage k would re-run stages 1..k-1
    * (O(stages²) event scans) — with it every stage's events scan and
    * join runs exactly once. Shared by [[funnel]] and [[funnelTiming]] so
    * the qualifying-timestamp semantics exist once.
    */
  private def reachedFrames(ev: DataFrame, stages: Seq[String]): Seq[DataFrame] = {
    val first = ev.filter(col("__s") === stages.head)
      .groupBy(col("__e")).agg(min(col("__t")).as("__ft"))
      .localCheckpoint(true)
    stages.tail.scanLeft(first) { (prev, stage) =>
      ev.filter(col("__s") === stage)
        .join(prev.select(col("__e"), col("__ft").as("__pt")), "__e")
        .filter(col("__t") >= col("__pt"))
        .groupBy(col("__e")).agg(min(col("__t")).as("__ft"))
        .localCheckpoint(true)
    }
  }

  def funnel(events: DataFrame, entity: Column, time: Column, step: Column,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages, s"funnel stages must be distinct: $stages")
    val ev = events.select(entity.as("__e"), time.as("__t"), step.as("__s"))
    val reached = reachedFrames(ev, stages)
    val counts = reached.zip(stages).zipWithIndex.map { case ((df, stage), i) =>
      df.agg(count(lit(1)).as("n_entities"))
        .select(lit(i + 1).as("stage_idx"), lit(stage).as("stage"),
          col("n_entities"))
    }.reduce(_.unionByName(_))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("stage_idx"))
    counts
      .withColumn("__prev", lag(col("n_entities"), 1).over(w))
      .withColumn("__first", first_value(col("n_entities")).over(w))
      .select(col("stage_idx"), col("stage"), col("n_entities"),
        round(when(col("__prev").isNull, lit(1.0))
          .otherwise(col("n_entities").cast("double") / col("__prev").cast("double")),
          6).as("conversion"),
        round(col("n_entities").cast("double") / col("__first").cast("double"), 6)
          .as("overall"))
  }

  /** Per-transition funnel timing: for each consecutive stage pair, how
    * long entities take between their qualifying timestamps — count,
    * median and p90 delay in seconds. The "WHERE is the funnel leaking
    * time" companion to [[funnel]]'s "where is it leaking users".
    *
    * Reuses [[reachedFrames]]' one-row-per-entity stage frames: each
    * transition is one entity-keyed join of two already-aggregated frames
    * plus one exact-percentile aggregate to a single row. Exact
    * `percentile` keeps the oracle bit-checkable; swap for
    * `percentile_approx` at the 100 TB tier (the a08 discipline). Stats
    * round at milliseconds: the two engines' percentile interpolations
    * can differ in the last ulp of a µs-scale value, and 6-dp-of-seconds
    * rounding would put ~1e-3 of cells on a tie boundary.
    */
  def funnelTiming(events: DataFrame, entity: Column, time: Column,
      step: Column, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "funnel timing needs at least two stages")
    require(stages.distinct == stages, s"funnel stages must be distinct: $stages")
    val ev = events.select(entity.as("__e"), time.as("__t"), step.as("__s"))
    val frames = reachedFrames(ev, stages)
    frames.sliding(2).zipWithIndex.map { case (pair, i) =>
      val (prev, cur) = (pair.head, pair.last)
      prev.select(col("__e"), col("__ft").as("__pt"))
        .join(cur, "__e")
        .select((unix_micros(col("__ft")) - unix_micros(col("__pt")))
          .as("__d_us"))
        .agg(count(lit(1)).as("n_entities"),
          round(percentile(col("__d_us"), lit(0.5)) / lit(1e6), 3)
            .as("median_secs"),
          round(percentile(col("__d_us"), lit(0.9)) / lit(1e6), 3)
            .as("p90_secs"))
        .select(lit(i + 1).as("stage_idx"),
          lit(s"${stages(i)}->${stages(i + 1)}").as("transition"),
          col("n_entities"), col("median_secs"), col("p90_secs"))
    }.reduce(_.unionByName(_))
      // a transition nobody completed yields count=0 with null
      // percentiles from the global agg; drop it so the output matches
      // the relational statement (a GROUP BY simply has no such group —
      // the x103 fixture-shape-parity discipline)
      .filter(col("n_entities") > 0)
  }
}
