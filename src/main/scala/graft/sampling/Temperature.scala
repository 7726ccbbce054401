package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temperature-scaled corpus mixing: sampling weights
  * `w_i = f_i^α / Σ_j f_j^α` over per-source token masses — the standard
  * up-weighting of small high-quality sources against bulk web text
  * (α = 1 reproduces natural proportions, α → 0 approaches uniform;
  * multilingual and multi-corpus training recipes run α ≈ 0.2–0.5).
  * Complements [[Sampling.mixture]], which APPLIES per-source rates this
  * operator DERIVES.
  *
  * Scale shape: one corpus pass aggregates token counts to a source-sized
  * frame (exact long sums, map-side partials); the denominator re-aggregates
  * that tiny frame and rides back as a broadcast scalar. The powered masses
  * are quantized to integers (×10⁶, the
  * [[graft.analytics.Aggregates.fixedPointAvg]] construction) so the
  * denominator sum is merge-order-exact and the weights are deterministic
  * across partitionings and engines.
  */
object Temperature {

  /** Per-source `(source, n_tokens, weight, epochs)`: temperature-weighted
    * sampling share and the implied pass count over each source at a total
    * training budget of `budgetTokens` (`epochs > 1` means the source
    * repeats — the signal that α is starving the big sources or the budget
    * exceeds the corpus).
    */
  def mixtureWeights(df: DataFrame, source: Column, tokens: Column,
      alpha: Double, budgetTokens: Long): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(budgetTokens >= 1, s"budgetTokens must be >= 1, got $budgetTokens")
    val counts = df.groupBy(source.as("source"))
      .agg(sum(tokens.cast("long")).as("n_tokens"))
    val powed = counts.withColumn("__p",
      round(pow(col("n_tokens").cast("double"), alpha) * 1e6))
    val denom = powed.agg(sum(col("__p")).as("__d"))
    val w = col("__p") / col("__d")
    powed.crossJoin(broadcast(denom))
      .select(col("source"), col("n_tokens"),
        round(w, 6).as("weight"),
        round(w * lit(budgetTokens.toDouble) / col("n_tokens").cast("double"), 6)
          .as("epochs"))
  }
}
