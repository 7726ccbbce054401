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

  /** Padding-waste planner — the economics table behind the pad-vs-pack
    * decision [[packSequences]] resolves one way and per-length batching
    * resolves the other: for each candidate sequence-length bucket (each
    * doc padded up to the smallest `edge ≥ its token count`, clamped and
    * truncated at the largest), the doc count, true token mass, padded
    * token mass, the padding waste ratio, and the tokens truncation
    * destroys. A feed whose mass sits just above a power-of-two edge
    * shows up as one ruinous `waste_ratio` row — the measurement that
    * picks bucket edges, instead of defaulting to 2ᵏ folklore.
    *
    * Scale shape: one token-count kernel pass, a CASE-chain bucket
    * assignment (edges are plan constants), one |edges|-row aggregate —
    * map-side combinable, nothing corpus-sized past the scan.
    */
  def paddingWaste(df: DataFrame, tokenCount: Column,
      edges: Seq[Int]): DataFrame = {
    require(edges.nonEmpty && edges.forall(_ > 0), "edges must be positive")
    val sorted = edges.distinct.sorted
    val top = sorted.last
    val t = tokenCount.cast("long")
    val bucket = sorted.init.foldRight(lit(top.toLong)) { (e, acc) =>
      when(t <= e, lit(e.toLong)).otherwise(acc)
    }
    df.select(t.as("__t"), bucket.as("seq_len"))
      .groupBy(col("seq_len"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__t")).as("total_tokens"),
        sum(least(col("__t"), col("seq_len"))).as("kept_tokens"),
        (count(lit(1)) * max(col("seq_len"))).as("padded_tokens"),
        sum(greatest(col("__t") - col("seq_len"), lit(0L)))
          .as("truncated_tokens"))
      .select(col("seq_len"), col("n_docs"), col("total_tokens"),
        col("padded_tokens"), col("truncated_tokens"),
        round(lit(1.0) - col("kept_tokens").cast("double") /
          col("padded_tokens").cast("double"), 6).as("waste_ratio"))
  }
}
