package graft.streaming

import graft.clean.Validation
import graft.features.Features
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

/** The reference's streaming ETL (SURVEY.md §3.1): stream →
  * parse/validate/clean → feature-engineer → checkpointed parquet sink.
  *
  * Differences from the reference, by design (SURVEY.md §2.7 T4): streaming
  * dedup runs behind a watermark so state is bounded — the notebook's
  * unwatermarked `dropDuplicates` (databricks.docx:69) grows state forever,
  * which is exactly what kills a 1000-executor job on week two.
  */
object Pipeline {

  /** Clean + feature a parsed telemetry frame. Works identically on batch
    * and streaming DataFrames (same Catalyst plan either way) — this is the
    * transformation core shared by both reference implementations
    * (`Wind_Processing.py:15-65` and databricks.docx:47-94).
    */
  def transform(df: DataFrame, bounds: Map[String, (Double, Double)],
      defaults: Map[String, Any], streaming: Boolean): DataFrame = {
    val bounded = Validation.rangeFilter(df, bounds)
    val filled = Validation.fillDefaults(bounded, defaults)
    val deduped =
      if (streaming)
        // watermark bounds dedup state to 10 min of event time
        filled.withWatermark("timestamp", "10 minutes")
          .dropDuplicates("station_id", "timestamp")
      else
        Validation.dedupeFirst(filled, Seq("station_id", "timestamp"),
          Seq(col("timestamp")))
    Features.withTimeFeatures(deduped)
  }

  /** S8: checkpointed append-mode parquet sink. */
  def parquetSink(df: DataFrame, path: String, checkpoint: String): DataStreamWriter[Row] =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")

  /** T5/A14: watermarked sliding-window aggregation — the streaming form of
    * the dashboards' recency stats (`Wind_Genration.py:466-478`).
    */
  def windowedStats(df: DataFrame, width: String, slide: String,
      watermark: String = "10 minutes"): DataFrame =
    df.withWatermark("timestamp", watermark)
      .groupBy(window(col("timestamp"), width, slide), col("station_id"))
      .agg(
        avg(col("farm_power_kW")).as("avg_power_kW"),
        max(col("farm_power_kW")).as("max_power_kW"),
        sum(col("farm_energy_kWh_10min")).as("energy_kWh"))

  /** S11: enumerate active streaming queries (databricks.docx:132-133). */
  def activeQueries(spark: org.apache.spark.sql.SparkSession): Seq[StreamingQuery] =
    spark.streams.active.toSeq
}
