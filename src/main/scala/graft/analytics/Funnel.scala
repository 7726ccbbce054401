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
  def funnel(events: DataFrame, entity: Column, time: Column, step: Column,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages, s"funnel stages must be distinct: $stages")
    val ev = events.select(entity.as("__e"), time.as("__t"), step.as("__s"))
    // reached(i): one row per entity that completed stages 0..i, carrying
    // the earliest qualifying timestamp of stage i
    // each stage frame is localCheckpointed: stage i+1's join and ALL the
    // per-stage counts below reuse it, so without the checkpoint stage k
    // would re-run stages 1..k-1 (O(stages²) event scans) — with it every
    // stage's events scan and join runs exactly once
    val first = ev.filter(col("__s") === stages.head)
      .groupBy(col("__e")).agg(min(col("__t")).as("__ft"))
      .localCheckpoint(true)
    val reached = stages.tail.scanLeft(first) { (prev, stage) =>
      ev.filter(col("__s") === stage)
        .join(prev.select(col("__e"), col("__ft").as("__pt")), "__e")
        .filter(col("__t") >= col("__pt"))
        .groupBy(col("__e")).agg(min(col("__t")).as("__ft"))
        .localCheckpoint(true)
    }
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
}
