package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sampling.Sampling

/** Hashing-trick featurization (Weinberger et al., ICML 2009): tokens map
  * to a FIXED dimension count through a hash, with a second hash choosing
  * the sign so colliding tokens cancel in expectation instead of
  * compounding. This is how a quality/lang classifier featurizes 100 TB
  * of text without ever materializing (or broadcasting) a vocabulary:
  * no fit pass, no dictionary shuffle, new tokens land deterministically.
  *
  * Hashes are the library-wide md5-derived [[Sampling.hashKey]], so the
  * features are engine-independent and stable across runs.
  */
object FeatureHash {

  private def dim(tok: Column, dims: Int): Column =
    pmod(Sampling.hashKey(tok, lit("fh")), lit(dims.toLong))

  /** +1 when the sign hash is even, −1 when odd. */
  private def sign(tok: Column): Column =
    lit(1L) - lit(2L) * pmod(Sampling.hashKey(tok, lit("fhsign")), lit(2L))

  /** Sparse doc×dim feature frame `(doc_id, dim, w)` with
    * w = Σ_tokens-in-dim sign(token)·tf(token). Two hash aggregates
    * (per-doc term counts, then per-doc dim sums) — no vocabulary state,
    * map-side combinable, dims bounded by construction.
    */
  def hashFeatures(df: DataFrame, id: Column, text: Column,
      dims: Int = 64): DataFrame = {
    require(dims >= 2, s"dims must be >= 2, got $dims")
    df.select(id.as("doc_id"),
        explode(TextAnalysis.tokens(text)).as("__tok"))
      .groupBy(col("doc_id"), col("__tok"))
      .agg(count(lit(1)).as("__tf"))
      .groupBy(col("doc_id"), dim(col("__tok"), dims).as("dim"))
      .agg(sum(sign(col("__tok")) * col("__tf")).as("w"))
  }

  /** Collision audit of the hashed feature space: per dimension, the
    * occurrence mass, the number of distinct vocabulary tokens sharing
    * the slot, the corpus-level NET signed weight (how much of the mass
    * survives sign cancellation), and a collision flag. The dial a user
    * turns `dims` with: heavy multi-token slots with near-zero net weight
    * are information the model never sees.
    *
    * Shape: corpus term counts (one shuffle on token — the vocabulary-
    * sized aggregate every `text/` operator already pays), then a
    * `dims`-row aggregate. All-integer output.
    */
  def collisionAudit(df: DataFrame, text: Column,
      dims: Int = 64): DataFrame = {
    require(dims >= 2, s"dims must be >= 2, got $dims")
    df.select(explode(TextAnalysis.tokens(text)).as("__tok"))
      .groupBy(col("__tok"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(dim(col("__tok"), dims).as("dim"))
      .agg(sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(sign(col("__tok")) * col("__c")).as("net_weight"))
      .withColumn("collision", col("n_distinct") > 1L)
  }
}
