package graft.clean

import org.apache.spark.sql.DataFrame
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
}
