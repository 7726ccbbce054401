package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (see TESTDATA.md).
  *
  * All parquet reads go through here so every query benefits from the same
  * source settings (vectorized parquet reader, filter pushdown, column
  * pruning are Spark defaults). At 100 TB these would be partitioned tables
  * behind a catalog; the single-parquet layout is a test-only detail — the
  * query code never assumes row counts or file layout.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The testdata's `ts` physical type has changed across driver rounds —
    * TIMESTAMP(NANOS) through r6, TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * (= Spark's TIMESTAMP_NTZ) from r7 — so this loader normalizes BOTH to
    * a session-tz TimestampType in one place rather than teaching every
    * operator about parquet footer variants:
    *   - nanos: read as long (legacy conf) and `ts div 1000` in Long space
    *     (µs-aligned data, so the truncation is exact; a double division
    *     would lose precision above 2^53 ns);
    *   - NTZ: cast to TimestampType. All entry points pin
    *     `spark.sql.session.timeZone=UTC`, so the cast relabels the same
    *     instant — bit-exact, no wall-clock shift.
    * Downstream `unix_micros`/window arithmetic then always sees TIMESTAMP.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // nanosAsLong only needs to hold while the parquet footer is resolved
    // (schema is captured in the relation); save/restore so a later
    // nanos-typed parquet read in the same session isn't silently re-typed
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    val raw0 =
      try load(spark, dir, "events")
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    // spread like documents/embeddings so the bench measures the plan a
    // cluster would run; the avg-based oracles are partition-order-robust
    // (fixedPointAvg quantizes to exact-integer sums, plain sums round at
    // the data's own decimal scale, corr/std/regr margins ≫ merge noise)
    val raw = spread(spark, raw0)
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")

  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")

  /** documents/embeddings ship as ONE small parquet file → one input split
    * → one task, which serializes the interpreted higher-order text/vector
    * expressions. Spread rows across the cores; a real deployment gets this
    * parallelism from the file layout and needs no repartition.
    */
  private def spread(spark: SparkSession, df: DataFrame): DataFrame =
    df.repartition(spark.sparkContext.defaultParallelism)

  def documents(spark: SparkSession, dir: String): DataFrame =
    spread(spark, load(spark, dir, "documents"))
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spread(spark, load(spark, dir, "embeddings"))
}
