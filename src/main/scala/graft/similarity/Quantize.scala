package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.Native

/** Embedding quantization for storage/bandwidth at corpus scale: symmetric
  * per-vector int8 — `scale = max|x| / 127`, `q_i = floor(x_i/scale + 0.5)`
  * — shrinks a float32 embedding column 4× (the first thing a 100 TB
  * vector corpus does before indexing; IVF/LSH recall is insensitive to
  * int8 noise at typical embedding dimensionalities). Pure narrow
  * projections over native codegen kernels ([[graft.plans.Kernels]]): no
  * shuffle, one fused pass per row, stays inside whole-stage codegen.
  *
  * `floor(x + 0.5)` rather than decimal `round`: floor of a double is
  * IEEE-exact and engine-independent, so quantized codes are reproducible
  * bit-for-bit everywhere (the [[Sampling]]-style determinism contract,
  * applied to vectors).
  */
object Quantize {

  /** `array<tinyint>` quantized codes of a float/double array column. */
  def int8(vec: Column): Column = Native.int8Codes(vec)

  /** `[scale, qsum, qnorm2, max_abs_err]` summary (all doubles; the sums
    * are integer-valued and exact). `max_abs_err ≤ scale/2` by
    * construction — the check [[int8Report]] exposes per vector.
    */
  def int8Stats(vec: Column): Column = Native.int8QuantStats(vec)

  /** Quantization report frame: id, round-9 scale, exact integer sum and
    * norm² of the codes, round-9 max reconstruction error. The
    * whole-corpus quality gate a pipeline runs before swapping float32
    * embeddings for int8 — distribution of `max_abs_err` vs `scale/2`
    * bounds the recall impact.
    */
  def int8Report(df: DataFrame, id: Column, vec: Column): DataFrame =
    df.select(id.as("vec_id"), int8Stats(vec).as("__q"))
      .select(col("vec_id"),
        round(element_at(col("__q"), 1), 9).as("scale"),
        element_at(col("__q"), 2).cast("long").as("qsum"),
        element_at(col("__q"), 3).cast("long").as("qnorm2"),
        round(element_at(col("__q"), 4), 9).as("max_abs_err"))
}
