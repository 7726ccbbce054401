package graft.clean

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Generic column profiler — the SUMMARIZE / pandas-describe(include=all)
  * utility every ingestion pipeline runs before trusting a new feed: one
  * row per column with its type, null count, exact distinct count, and
  * min/max rendered as strings (so one schema fits every column type).
  *
  * Scale shape: ONE aggregation pass computes every column's four
  * statistics (null/distinct/min/max are all declarative aggregates with
  * map-side partials), then the single result row unpivots via one inline
  * explode — no per-column job, no driver loop over data. The exact
  * multi-column distinct plans as an Expand (one input replica per
  * distinct aggregate — cost ×|columns|, the price of exactness in one
  * pass); profile-at-scale pipelines that can tolerate ±2% should swap
  * `countDistinct` for `approx_count_distinct`, which collapses the
  * Expand back to a single replica.
  */
object Profile {

  /** One row per ATOMIC column: `(column, dtype, n_rows, n_nulls,
    * n_distinct, min_value, max_value)`. Non-atomic columns (arrays,
    * structs, maps) have no total order for min/max and are skipped.
    */
  def profile(df: DataFrame): DataFrame = {
    def atomic(t: DataType): Boolean = t match {
      case _: ArrayType | _: MapType | _: StructType => false
      case _ => true
    }
    val cols = df.schema.fields.filter(f => atomic(f.dataType)).map(_.name).toSeq
    require(cols.nonEmpty, "profile needs at least one atomic column")
    val aggs = cols.flatMap { c =>
      Seq((count(lit(1)) - count(col(c))).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    } :+ count(lit(1)).as("__rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"),
        lit(df.schema(c).dataType.simpleString).as("dtype"),
        col("__rows").as("n_rows"),
        col(s"__nn_$c").as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_value"),
        col(s"__mx_$c").as("max_value"))
    }
    one.select(explode(array(rows: _*)).as("__p")).select(col("__p.*"))
  }

  /** Benford first-digit audit of a positive numeric metric — the
    * fabrication/pipeline-bug tripwire: naturally-occurring multi-scale
    * quantities follow P(d) = log₁₀(1 + 1/d); uniform synthetics, capped
    * fields, and copy-pasted defaults don't, and the per-digit delta says
    * which digit band the anomaly lives in.
    *
    * The leading digit is extracted INTEGER-SIDE: the value is scaled by
    * `10^scaleDecimals` and rounded to a long, and the digit is the first
    * character of that long's decimal rendering — identical across
    * engines by integer-formatting definition, where float `log10` at
    * power-of-ten boundaries is an engine-dependent coin flip. Zero and
    * negative values are excluded (Benford is defined on positive
    * magnitudes); scaling never changes the leading digit.
    *
    * Scale shape: one projection + a 9-row aggregate; map-side
    * combinable.
    */
  def benfordAudit(df: DataFrame, v: Column,
      scaleDecimals: Int = 2): DataFrame = {
    require(scaleDecimals >= 0 && scaleDecimals <= 9,
      s"scaleDecimals must be in [0,9], got $scaleDecimals")
    val u = round(v.cast("double") * math.pow(10.0, scaleDecimals), 0)
      .cast("long")
    // filter BEFORE the digit cast: ANSI mode would reject the '-' of a
    // negative rendering even though the filter later drops the row
    val counts = df.select(u.as("__u"))
      .filter(col("__u") > 0L)
      .select(substring(col("__u").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("__t"))
    counts.crossJoin(broadcast(tot))
      .withColumn("share",
        round(col("n").cast("double") / col("__t").cast("double"), 6))
      .withColumn("benford",
        round(log(10.0, lit(1.0) + lit(1.0) / col("digit").cast("double")), 6))
      .select(col("digit"), col("n"), col("share"), col("benford"),
        round(col("share") - col("benford"), 6).as("delta"))
  }

  /** Histogram of an integer field extracted from a JSON string column —
    * the semi-structured face every event pipeline needs: one codegen'd
    * `get_json_object` pass, bucketed counts, with unparseable/missing
    * rows kept as a null bucket (silently dropping them is how schema
    * drift hides). `path` is a JSONPath like `$.k`.
    *
    * Scale shape: per-row extraction inside the scan projection, then a
    * |buckets|-row aggregate; nothing corpus-sized past the scan.
    */
  def jsonFieldHistogram(df: DataFrame, json: Column, path: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val k = get_json_object(json, path).cast("long")
    val bucket = when(k.isNotNull,
      floor(k.cast("double") / bucketWidth).cast("long") * bucketWidth)
    val counts = df.select(bucket.as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("__t"))
    counts.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n"),
        round(col("n").cast("double") / col("__t").cast("double"), 6)
          .as("share"))
  }
}
