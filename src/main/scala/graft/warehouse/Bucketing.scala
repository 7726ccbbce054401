package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: pre-shuffle big tables on their join key ONCE at
  * write time so every later equi-join/aggregation on that key runs with no
  * exchange (SURVEY.md §4 partitioning; the 100 TB answer to repeated
  * fact-fact joins that would otherwise shuffle the fact table per query).
  *
  * Bucketing requires `saveAsTable` (bucket metadata lives in the catalog);
  * plain parquet paths cannot carry it.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    // the default catalog is in-memory: a previous SESSION's table
    // directory can survive in the warehouse with no catalog entry, and
    // saveAsTable refuses to reuse the orphan location — drop both
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True if the physical plan of `df` contains a shuffle exchange —
    * bucketed joins/aggregations on the bucket key must NOT.
    */
  def hasShuffleExchange(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
