package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage: per-field agreement
  * weights learned from a labeled match set and a non-match sample. Where
  * [[Entities]] links records by EDIT DISTANCE on one key, FS scores a
  * candidate pair by SUMMING per-field log-likelihood-ratio weights —
  * the classical framework when no single field is decisive (same lang +
  * same source + same length band is strong evidence in aggregate even
  * though each alone is weak). The weights table this emits IS the
  * trained model: score(pair) = Σ_f (agree ? w_agree_f : w_disagree_f).
  */
object Linkage {

  /** Estimate per-field m/u probabilities and agreement weights.
    *
    * m_f = P(field f agrees | pair is a match), estimated on `matches`
    * (here: verified near-duplicate pairs — the repo's ground-truth-free
    * labeling trick, matching how production seeds FS from a
    * high-precision blocker). u_f = P(agrees | random pair), estimated on
    * `nonMatches` (a deterministic offset-pair sample; contamination by
    * the odd true match is the textbook-accepted bias of u-estimation
    * from random pairs). Both use add-half smoothing
    * ((agree + 0.5)/(n + 1)) so no weight is ±∞ and both engines divide
    * the same rationals. Weights are base-2 LLRs computed as ln-ratios
    * over ln 2 with the association order the oracle mirrors.
    *
    * `fields` are (name, column) pairs evaluated against `df` (one row
    * per `id`). Agreement is NULL-SAFE equality: null agrees with null
    * (two records both missing a field is weak agreement evidence, the
    * standard FS convention), null vs value disagrees.
    *
    * Scale shape: two equi-joins of the pair frames against the id-keyed
    * attribute projection (AQE broadcasts the smaller side), one unpivot,
    * one grouped aggregate ending at |fields| rows. Pair frames are the
    * blocker's output — bounded by ITS caps, never all-pairs here.
    */
  def fieldWeights(df: DataFrame, id: Column, fields: Seq[(String, Column)],
      matches: DataFrame, nonMatches: DataFrame): DataFrame = {
    require(fields.nonEmpty, "fieldWeights needs at least one field")
    val attrs = df.select(id.cast("long").as("__id") +:
      fields.map { case (n, c) => c.as(s"__f_$n") }: _*)
    val labeled = matches.select(col("doc_a").cast("long").as("__a"),
        col("doc_b").cast("long").as("__b"), lit(true).as("__m"))
      .unionByName(nonMatches.select(col("doc_a").cast("long").as("__a"),
        col("doc_b").cast("long").as("__b"), lit(false).as("__m")))
    val joined = labeled
      .join(attrs.toDF(attrs.columns.map(_ + "_l"): _*),
        col("__a") === col("__id_l"))
      .join(attrs.toDF(attrs.columns.map(_ + "_r"): _*),
        col("__b") === col("__id_r"))
    val stacked = fields.map { case (n, _) =>
      joined.select(lit(n).as("field"), col("__m"),
        (col(s"__f_${n}_l") <=> col(s"__f_${n}_r")).as("__agree"))
    }.reduce(_ unionByName _)
    val m = (sum(when(col("__m") && col("__agree"), 1L).otherwise(0L))
      .cast("double") + 0.5) /
      (sum(when(col("__m"), 1L).otherwise(0L)).cast("double") + 1.0)
    val u = (sum(when(!col("__m") && col("__agree"), 1L).otherwise(0L))
      .cast("double") + 0.5) /
      (sum(when(!col("__m"), 1L).otherwise(0L)).cast("double") + 1.0)
    stacked.groupBy(col("field"))
      .agg(sum(when(col("__m"), 1L).otherwise(0L)).as("n_match"),
        sum(when(!col("__m"), 1L).otherwise(0L)).as("n_nonmatch"),
        m.as("__mp"), u.as("__up"))
      .select(col("field"), col("n_match"), col("n_nonmatch"),
        round(col("__mp"), 6).as("m_prob"),
        round(col("__up"), 6).as("u_prob"),
        round(log(col("__mp") / col("__up")) / log(lit(2.0)), 6)
          .as("w_agree"),
        round(log((lit(1.0) - col("__mp")) / (lit(1.0) - col("__up"))) /
          log(lit(2.0)), 6).as("w_disagree"))
  }

  /** APPLY the [[fieldWeights]] model: score candidate `pairs` by summing
    * each field's agreement/disagreement weight — score(pair) =
    * Σ_f (agree_f ? w_agree_f : w_disagree_f), the Fellegi–Sunter match
    * statistic. `fs_match` cuts at score > 0 (equal prior odds; a caller
    * with a tuned prior shifts the cut, same frame). Weights arrive AS
    * THE ROUNDED MODEL FRAME fieldWeights emits — scoring consumes the
    * published artifact, so re-deriving it cannot drift from it.
    *
    * This is the cheap-metadata path over candidates the expensive
    * content verify also judges: running both and comparing (x195) is
    * the audit that says whether FS-on-metadata can pre-filter candidate
    * pairs before the content pass at the 100 TB tier.
    *
    * Scale shape: two id-keyed equi-joins of the pair frame against the
    * attribute projection, one |fields|-way unpivot, one broadcast join
    * of the |fields|-row weight model, one grouped sum back to pair
    * grain. Everything is candidate-sized — the blocker's output, never
    * all-pairs.
    */
  def scorePairs(df: DataFrame, id: Column, fields: Seq[(String, Column)],
      weights: DataFrame, pairs: DataFrame): DataFrame = {
    require(fields.nonEmpty, "scorePairs needs at least one field")
    val attrs = df.select(id.cast("long").as("__id") +:
      fields.map { case (n, c) => c.as(s"__f_$n") }: _*)
    val joined = pairs
      .select(col("doc_a").cast("long").as("__a"),
        col("doc_b").cast("long").as("__b"))
      .join(attrs.toDF(attrs.columns.map(_ + "_l"): _*),
        col("__a") === col("__id_l"))
      .join(attrs.toDF(attrs.columns.map(_ + "_r"): _*),
        col("__b") === col("__id_r"))
    val stacked = fields.map { case (n, _) =>
      joined.select(col("__a"), col("__b"), lit(n).as("field"),
        (col(s"__f_${n}_l") <=> col(s"__f_${n}_r")).as("__agree"))
    }.reduce(_ unionByName _)
    stacked
      .join(broadcast(weights.select(col("field"), col("w_agree"),
        col("w_disagree"))), Seq("field"))
      .groupBy(col("__a").as("doc_a"), col("__b").as("doc_b"))
      .agg(sum(when(col("__agree"), 1L).otherwise(0L)).as("n_agree"),
        round(sum(when(col("__agree"), col("w_agree"))
          .otherwise(col("w_disagree"))), 6).as("score"))
      .withColumn("fs_match", col("score") > 0)
  }
}
