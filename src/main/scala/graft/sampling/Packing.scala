package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data assembly: assign documents to
  * fixed-token-budget context windows ("packs") by the concatenate-and-chop
  * scheme large pretraining pipelines use — documents are laid end-to-end
  * in a deterministic order and chopped every `budgetTokens`; a document
  * may straddle a pack boundary (its `pack_offset` says where it starts).
  *
  * Scale shape: a global concat order would be one giant sorted partition,
  * so documents are first spread across `numBuckets` independent streams
  * by id hash ([[Sampling.hashBucket]] — deterministic, growth-stable);
  * packing is then a per-bucket running sum (one shuffle on the bucket id,
  * linear window pass). Buckets are independent: pack identity is
  * (bucket, pack_id). Choose numBuckets ≈ cluster parallelism; each bucket
  * packs ~1/numBuckets of the corpus.
  */
object Packing {

  /** Adds `bucket`, `pack_id` (0-based within bucket), and `pack_offset`
    * (token position where this doc starts inside its pack) to `df`.
    * Deterministic: bucket is a hash of `id`, order within bucket is `id`
    * ascending. Docs longer than `budgetTokens` span multiple packs
    * (offset still marks the start).
    */
  def packSequences(df: DataFrame, id: Column, tokenCount: Column,
      budgetTokens: Long, numBuckets: Int, salt: String = "pack"): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(numBuckets > 0, "numBuckets must be positive")
    val withBucket = df
      .withColumn("bucket", Sampling.hashBucket(id, salt) % numBuckets)
      .withColumn("__tok", tokenCount.cast("long"))
    val before = Window.partitionBy(col("bucket")).orderBy(id.asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    withBucket
      .withColumn("__cum", coalesce(sum(col("__tok")).over(before), lit(0L)))
      .withColumn("pack_id", floor(col("__cum") / budgetTokens).cast("long"))
      .withColumn("pack_offset", (col("__cum") % budgetTokens).cast("long"))
      .drop("__tok", "__cum")
  }
}
