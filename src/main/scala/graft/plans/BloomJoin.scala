package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter semi-join pre-filtering: drop most non-matching rows of a
  * huge fact table BEFORE its shuffle, using a compact bloom filter built
  * from the (much smaller) key side.
  *
  * This is exactly the machinery Spark's own runtime row-level filtering
  * (`InjectRuntimeFilter`) uses — `BloomFilterAggregate` to build,
  * `BloomFilterMightContain` to probe, both over `xxhash64(key)` — exposed
  * as an explicit operator for cases the automatic rule can't see: keys
  * produced by another pipeline stage, a reused filter across several
  * queries, or thresholds outside the optimizer's heuristics.
  *
  * Scale shape: the build side aggregates to ONE serialized filter (MBs for
  * hundreds of millions of keys at 1% fpp) collected to the driver and
  * re-broadcast as a plan constant — the same model-artifact pattern as the
  * IVF centroid codebook. The probe is a codegen'd scalar predicate
  * evaluated at the scan, so the fact-side exchange carries only probable
  * matches; the exact join afterwards removes the fpp leakage.
  */
object BloomJoin {

  /** Build a serialized bloom filter of `key` over `df` (one aggregate;
    * merged tree-wise like any TypedImperativeAggregate). `expectedItems`
    * sizes the filter — overestimate rather than under (an undersized
    * filter degrades fpp, never correctness).
    */
  def keyBloom(df: DataFrame, key: Column, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    require(expectedItems > 0, "expectedItems must be positive")
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    val agg = new BloomFilterAggregate(
      ColumnBridge.eagerExpression(xxhash64(key)),
      Literal(expectedItems),
      Literal(BloomFilter.optimalNumOfBits(expectedItems, fpp)))
    df.agg(ColumnBridge.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]]("bf")
  }

  /** Probe predicate: true iff `key` is PROBABLY in the serialized filter
    * (false positives at the filter's fpp; never false negatives).
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal.create(bloom, org.apache.spark.sql.types.BinaryType),
      ColumnBridge.eagerExpression(xxhash64(key))))

  /** Semi-join `big` to the distinct keys of `small`, with the bloom
    * pre-filter applied to `big` below its exchange. Result is EXACTLY the
    * plain left-semi join (the final join removes bloom false positives) —
    * only the shuffle volume changes.
    */
  def bloomSemiJoin(big: DataFrame, bigKey: Column, small: DataFrame,
      smallKey: Column, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = keyBloom(small, smallKey, expectedItems, fpp)
    big.filter(mightContain(bloom, bigKey))
      .join(small.select(smallKey.as("__bloom_key")).distinct(),
        bigKey === col("__bloom_key"), "left_semi")
  }
}
