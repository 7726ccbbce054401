package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SparkSession}
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

  /** Zone-map (min/max file statistics) pruning audit: per bucket of a
    * LAYOUT, the column's min/max — exactly what Parquet row groups and
    * Iceberg/Delta manifests store — and the fraction of buckets (and
    * rows) a range predicate `value BETWEEN lo AND hi` can SKIP without
    * reading them. Run once per candidate layout and compare: this is
    * the measurable benefit [[zValue]] exists to buy — under a hash
    * layout every bucket spans the full value range (scan_fraction ~1);
    * under a Z-order layout buckets are contiguous Z-ranges, so a value
    * predicate prunes the buckets whose x-bits sit outside it. The
    * decision a 100 TB table's OPTIMIZE job needs, priced before the
    * rewrite.
    *
    * One grouped min/max/count (map-side partials) + a 1-row reduce per
    * layout — the audit costs one pass over the column regardless of
    * how good the layout is.
    */
  def zoneMapAudit(df: org.apache.spark.sql.DataFrame, layout: String,
      bucket: Column, value: Column, lo: Double, hi: Double):
      org.apache.spark.sql.DataFrame = {
    require(lo <= hi, s"empty predicate range: [$lo, $hi]")
    val per = df.select(bucket.as("__b"), value.cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("__b"))
      .agg(min(col("__v")).as("__mn"), max(col("__v")).as("__mx"),
        count(lit(1)).as("__c"))
    val skip = col("__mx") < lo || col("__mn") > hi
    per.agg(count(lit(1)).as("n_buckets"),
        sum(when(skip, 1L).otherwise(0L)).as("skippable_buckets"),
        sum(when(skip, col("__c")).otherwise(0L)).as("skipped_rows"),
        sum(col("__c")).as("n_rows"))
      .select(lit(layout).as("layout"), col("n_buckets"),
        col("skippable_buckets"),
        round(lit(1.0) - col("skippable_buckets").cast("double") /
          col("n_buckets").cast("double"), 6).as("bucket_scan_fraction"),
        col("skipped_rows"), col("n_rows"),
        round(lit(1.0) - col("skipped_rows").cast("double") /
          col("n_rows").cast("double"), 6).as("row_scan_fraction"))
  }

  /** Parquet compaction — the `OPTIMIZE` maintenance pass a streaming
    * parquet sink needs: an append-mode micro-batch sink
    * ([[graft.streaming.Pipeline.parquetSink]]) accumulates one small file
    * per trigger forever, and at 100 TB that's the classic small-files
    * killer (every scan pays per-file open + footer-read + scheduling; the
    * NameNode/listing layer pays per-file metadata). This rewrites the
    * directory into `ceil(actual bytes / targetFileBytes)` files and
    * atomically swaps it in, so readers either see the old layout or the
    * new one, never a mix.
    *
    * Layout of the rewrite:
    *  - no `zorderCols`: round-robin `repartition(n)` — even file sizes,
    *    one shuffle of the data being compacted, no ordering promise.
    *  - `zorderCols = Some((x, y))`: files are contiguous ranges of the
    *    Morton interleave [[zValue]] — `repartitionByRange` on the z-key
    *    plus an intra-partition sort, so min/max footer stats on BOTH
    *    columns become selective and range predicates on either prune most
    *    files (the Delta/Iceberg `OPTIMIZE ZORDER BY` shape).
    *
    * The swap is rename-based (tmp → live with the old dir parked then
    * deleted), the same recipe table formats use under one writer;
    * concurrent WRITERS need a real table format's transaction log —
    * documented contract, not a silent hazard. Returns the file count
    * after compaction.
    */
  def compact(spark: SparkSession, path: String, targetFileBytes: Long,
      zorderCols: Option[(Column, Column)] = None, zBits: Int = 16): Long = {
    require(targetFileBytes >= (1L << 20),
      s"targetFileBytes must be >= 1 MiB, got $targetFileBytes")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = fs.makeQualified(new Path(path))
    val dataBytes = fs.listStatus(live).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val numFiles = math.max(1L, (dataBytes + targetFileBytes - 1) / targetFileBytes).toInt

    val df = spark.read.parquet(path)
    val tmp = new Path(live.getParent, live.getName + "__compact_tmp")
    val packed = zorderCols match {
      case Some((x, y)) =>
        val keyed = df.withColumn("__z", zValue(x, y, zBits))
        keyed.repartitionByRange(numFiles, col("__z"))
          .sortWithinPartitions(col("__z"))
          .drop("__z")
      case None => df.repartition(numFiles)
    }
    packed.write.mode("overwrite").parquet(tmp.toString)

    // atomic-ish swap: park the live dir, promote tmp, drop the parked copy
    val parked = new Path(live.getParent, live.getName + "__compact_old")
    fs.delete(parked, true)
    if (!fs.rename(live, parked))
      throw new IllegalStateException(s"compact: could not park $live")
    if (!fs.rename(tmp, live)) {
      fs.rename(parked, live) // roll back — the old layout is still intact
      throw new IllegalStateException(s"compact: could not promote $tmp")
    }
    fs.delete(parked, true)
    fs.listStatus(live).count(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet")).toLong
  }
}
