package graft.warehouse

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering keys, the
  * technique behind Delta/Iceberg `OPTIMIZE ZORDER BY` — sort/bucket a
  * table by the bit-interleave of two columns so that range predicates on
  * EITHER column prune most files, instead of only the leading sort key.
  * At 100 TB this is the difference between "point lookups on the second
  * dimension scan everything" and "they scan ~√(files)".
  *
  * Everything here is a pure codegen'd column expression (shifts, masks,
  * adds — no UDF), so the key computation rides inside WholeStageCodegen
  * on the write path.
  */
object Layout {

  /** Morton Z-value of two non-negative ints confined to `bits` bits each:
    * bit i of `x` lands at position 2i, bit i of `y` at 2i+1. Inputs are
    * masked to `bits` bits, so out-of-range values wrap rather than
    * corrupt the interleave.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val xm = x.cast("long").bitwiseAND(lit((1L << bits) - 1))
    val ym = y.cast("long").bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).map { i =>
      shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** File/bucket assignment from a Z-value: the TOP `log2(numBuckets)`
    * bits of the interleave, so each bucket is a contiguous Z-range (a
    * rectangle-ish region of the (x, y) plane) and bucket boundaries never
    * depend on the data distribution — no global sort, no sampling pass,
    * identical assignment at any scale.
    */
  def zBucket(z: Column, bits: Int, numBuckets: Int): Column = {
    require(numBuckets >= 2 && (numBuckets & (numBuckets - 1)) == 0,
      s"numBuckets must be a power of two >= 2, got $numBuckets")
    // a negative shift would be masked mod 64 by the JVM and silently
    // send every row to bucket 0
    require(numBuckets <= (1L << (2 * bits)),
      s"numBuckets=$numBuckets exceeds the 4^bits=${1L << (2 * bits)} " +
        "distinct z-values")
    val shift = 2 * bits - Integer.numberOfTrailingZeros(numBuckets)
    shiftright(z, shift)
  }
}
