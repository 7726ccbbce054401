package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Batch and streaming sources (SURVEY.md §2.1, S1-S12).
  *
  * The reference ingests JSON from Kafka/Event Hubs and CSV logs from disk.
  * All readers here parse with explicit schemas and normalize the timestamp
  * column through one shared sanitizer so the three observed wire formats
  * (`2025-11-04 20:13:36.536371+00:00`, `2025-11-04T20:30:47.702372`,
  * `... UTC`) land in a single `TimestampType` column; unparseable values
  * become null (pandas `errors='coerce'` semantics,
  * ref `Solar_Processing.py:20`, `Wind_Processing.py:23`).
  */
object Sources {

  /** Normalize a raw timestamp string column to TimestampType.
    *
    * Handles: literal ` UTC`/`UTC` token (ref `Wind_Processing.py:23`,
    * databricks.docx:192), `T` separator, trailing `+00:00` offset.
    * Session time zone is UTC, so stripping a `+00:00` offset is exact.
    * Null on parse failure — never throws on dirty data.
    */
  def sanitizeTimestamp(c: Column): Column = {
    val cleaned = regexp_replace(
      regexp_replace(regexp_replace(c, "UTC", ""), "T", " "),
      "\\+00:00$", "")
    // try_: ANSI mode (Spark 4 default) makes to_timestamp THROW on bad
    // input; pandas errors='coerce' semantics require null instead
    try_to_timestamp(trim(cleaned))
  }

  /** Name of the ingest-order column added by [[withIngestOrder]]. */
  val IngestOrderCol = "__ingest_order"

  /** Capture arrival order at the source: `monotonically_increasing_id` is
    * (partition_id << 33) + row-in-partition, and a single file's splits are
    * numbered by file offset, so for one input file this is file order —
    * the deterministic "keep first" tiebreak pandas gets for free from row
    * order (ref `drop_duplicates` keep-first, `Wind_Processing.py:41`).
    */
  def withIngestOrder(df: DataFrame): DataFrame =
    df.withColumn(IngestOrderCol, monotonically_increasing_id())

  /** CSV batch source with explicit schema + header (S6). */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** CSV source + timestamp sanitation + ingest order in one step. */
  def csvWithTimestamp(spark: SparkSession, path: String, schema: StructType,
      tsCol: String = "timestamp"): DataFrame =
    withIngestOrder(csv(spark, path, schema))
      .withColumn(tsCol, sanitizeTimestamp(col(tsCol)))

  /** Parquet batch source (S9). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Decode a Kafka/Event-Hub-shaped DataFrame (binary `value` column) into
    * typed rows: CAST(value AS STRING) → from_json(schema) → flatten (S1/S2).
    * Works identically for `spark.read.format("kafka")` batch frames and
    * `spark.readStream.format("kafka")` streaming frames — callers pass the
    * raw frame in, which keeps this testable without a broker.
    */
  def decodeJson(raw: DataFrame, schema: StructType,
      tsCol: String = "timestamp"): DataFrame = {
    val parsed = raw
      .selectExpr("CAST(value AS STRING) AS message")
      .select(from_json(col("message"), schema).as("r"))
      .select(col("r.*"))
    if (parsed.columns.contains(tsCol))
      parsed.withColumn(tsCol, sanitizeTimestamp(col(tsCol)))
    else parsed
  }

  /** The exact option map [[kafkaJsonStream]] hands to the `kafka` format —
    * exposed as a value so the spec asserts the REAL wiring (subscribe key,
    * offsets default) rather than a copy. An embedded-broker smoke is not
    * possible in this environment: `/opt/spark/jars` ships no Kafka
    * connector or broker jars and dependency resolution is offline, so
    * neither `spark-sql-kafka` nor an in-JVM broker can load. SourcesSpec
    * therefore asserts (a) this option map, (b) that [[kafkaJsonStream]]
    * genuinely reaches Spark's data-source resolution for "kafka" (the
    * lookup error names the missing artifact), and (c) the wire-format
    * roundtrip through [[toKafkaShape]]/[[decodeJson]], which is every
    * byte of this path that doesn't require a live broker.
    */
  def kafkaSourceOptions(bootstrap: String, topic: String,
      startingOffsets: String = "earliest"): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "subscribe" -> topic,
    "startingOffsets" -> startingOffsets)

  /** Kafka streaming source (S1): subscribe + earliest offsets + JSON
    * decode (ref consumer poll loop `Solar_Processing.py:61-84`).
    */
  def kafkaJsonStream(spark: SparkSession, bootstrap: String, topic: String,
      schema: StructType, startingOffsets: String = "earliest"): DataFrame = {
    val raw = spark.readStream
      .format("kafka")
      .options(kafkaSourceOptions(bootstrap, topic, startingOffsets))
      .load()
    decodeJson(raw, schema)
  }

  /** Kafka sink projection (S3): key = station/partition key, value = JSON of
    * all columns. Keying by station preserves per-station ordering (T7,
    * ref `Wind_Genration.py:88`).
    */
  def toKafkaShape(df: DataFrame, keyCol: String): DataFrame =
    df.select(
      col(keyCol).cast("string").as("key"),
      to_json(struct(df.columns.map(col).toSeq: _*)).as("value"))

  /** CSV append-log sink (S5/S7): header, fixed column order. */
  def writeCsv(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).option("header", "true").csv(path)

  /** JSON-lines batch source with EXPLICIT schema. Schema-on-read, never
    * inference: `spark.read.json` without a schema runs a full extra pass
    * over the data to infer types — at 100 TB that doubles the scan and
    * yields whatever types the sample happened to contain.
    */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** JSON-lines append sink — the interchange format for corpus handoff
    * (one JSON object per line, splittable, schema carried by the reader).
    */
  def writeJsonl(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).json(path)

  /** ORC source — schema travels in the file (no schema argument, unlike
    * [[csv]]/[[jsonl]]): columnar, predicate-pushdown-capable, the
    * interchange format when the downstream warehouse is Hive/Trino
    * rather than a parquet lake. Same vectorized-reader/pushdown defaults
    * as the parquet path.
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** ORC batch sink, the [[writeCsv]] shape. */
  def writeOrc(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).orc(path)

  /** Layout-controlled parquet writer — the 100 TB sink discipline in one
    * call. `partitionCols` become hive-style directory partitions (readers
    * prune whole directories on those predicates); within each partition
    * the data is repartitioned to `filesPerPartition` writer tasks and
    * capped at `maxRecordsPerFile`, which bounds BOTH failure modes of a
    * naive `df.write`: the small-files explosion (one file per input task ×
    * partition value) and the giant-file straggler. `sortCols` optionally
    * sorts within each file so min/max page stats make range predicates
    * skip row groups (the poor man's Z-order for one dimension).
    */
  def writePartitionedParquet(df: DataFrame, path: String,
      partitionCols: Seq[String], filesPerPartition: Int = 1,
      maxRecordsPerFile: Long = 5000000L, sortCols: Seq[String] = Nil,
      mode: String = "overwrite"): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    require(filesPerPartition > 0, "filesPerPartition must be positive")
    // spread key must be DETERMINISTIC per row (a task retry re-places
    // every row identically — spark_partition_id/monotonic ids here would
    // risk duplicate/lost rows on recompute): hash the row content
    val spreadKeys =
      if (filesPerPartition == 1) partitionCols.map(col)
      else partitionCols.map(col) :+
        pmod(hash(df.columns.map(col): _*), lit(filesPerPartition))
    val arranged0 = df.repartition(spreadKeys: _*)
    val arranged =
      if (sortCols.isEmpty) arranged0
      else arranged0.sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
    arranged.write
      .mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
