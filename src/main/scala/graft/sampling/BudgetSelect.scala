package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget corpus selection: keep the best documents — by a quality
  * score, best first — until a global token budget is exhausted. This is
  * the "assemble exactly a 2T-token training mix from the top of the
  * quality ranking" step that follows scoring/filtering in an LLM data
  * pipeline.
  *
  * Selection rule (exact, total-order): rank docs by `(score DESC, id
  * ASC)` and keep every prefix doc whose INCLUSIVE running token sum is
  * `<= budget`.
  *
  * The naive implementation is a global sort + a single-partition running
  * sum — the canonical scale-killer. Here the running sum is split in two
  * data-parallel levels:
  *
  *   1. docs bucket by score into `numBuckets` equal-width bins between
  *      the observed min/max (one scalar agg, broadcast back);
  *   2. per-bucket token totals aggregate into a `numBuckets`-row frame —
  *      bounded, data-independent — whose descending-score prefix sums are
  *      computed on the driver and rejoin as a broadcast;
  *   3. each doc's inclusive cumsum = its bucket's prefix + a running sum
  *      over `(score DESC, id ASC)` WITHIN its bucket — a window
  *      partitioned by bucket, so no single reducer ever sees more than
  *      one bucket's docs.
  *
  * Because bucketing is monotonic in score, prefix+within-bucket cumsum
  * equals the global cumsum exactly; token counts are integers, so there
  * is no float merge-order hazard. Skew caveat: one bucket holds every
  * doc sharing a heavily-repeated score value (e.g. a constant score
  * column degenerates to the global sort); real quality scores are
  * near-continuous, and `numBuckets` bounds the expected per-reducer rows
  * at `|docs|/numBuckets`.
  */
object BudgetSelect {

  /** Docs selected under `budget`, with their inclusive running token sum.
    * Emits `(doc_id, score, n_tokens, cum_tokens)`.
    */
  def selectUnderBudget(df: DataFrame, id: Column, score: Column,
      tokens: Column, budget: Long, numBuckets: Int = 1024): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(numBuckets >= 2, s"numBuckets must be >= 2, got $numBuckets")
    // materialized once: (id, score, tokens) is ~24 bytes/row — far
    // smaller than the text it derives from — and three passes read it
    // (min/max, per-bucket totals, the final join+window); without the
    // checkpoint each pass would re-run the scoring/tokenize expressions
    // over the full corpus
    val base = df.select(id.as("doc_id"), score.as("score"),
      tokens.cast("long").as("n_tokens")).localCheckpoint(true)
    val statsRow = base.agg(min(col("score")), max(col("score"))).head()
    // empty corpus (an upstream gate dropped everything): empty result,
    // not an NPE off the null min/max
    if (statsRow.isNullAt(0))
      return base.select(col("doc_id"), col("score"), col("n_tokens"),
        lit(0L).as("cum_tokens")).limit(0)
    val (lo, hi) = (statsRow.getDouble(0), statsRow.getDouble(1))
    // width_bucket puts score=hi into numBuckets+1; fold it back so the
    // top bucket is closed. A constant-score corpus (lo == hi) degenerates
    // to one bucket, which is still correct (the skew caveat above).
    val bucketed = base.withColumn("__b",
      least(width_bucket(col("score"), lit(lo), lit(hi + math.ulp(hi)),
        lit(numBuckets)), lit(numBuckets.toLong)))
    // bounded frame: per-bucket token totals -> driver-side prefix sums
    // (descending score order), broadcast back as a lookup
    val perBucket = bucketed.groupBy(col("__b"))
      .agg(sum(col("n_tokens")).as("__t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(-_._1).toSeq
    val prefixBefore = perBucket.scanLeft((Long.MaxValue, 0L)) {
      case ((_, acc), (b, t)) => (b, acc + t)
    }.sliding(2).map { case Seq((_, acc), (b, _)) => (b, acc) }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val prefixDf = prefixBefore.toDF("__b", "__prefix")
    val w = Window.partitionBy(col("__b"))
      .orderBy(col("score").desc, col("doc_id").asc)
    bucketed.join(broadcast(prefixDf), "__b")
      .withColumn("cum_tokens", col("__prefix") + sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("score"), col("n_tokens"), col("cum_tokens"))
  }
}
