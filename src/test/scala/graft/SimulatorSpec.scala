package graft

import org.apache.spark.sql.functions._
import graft.ingest.Simulator
import graft.streaming.Pipeline

/** D21/T1/S12 deterministic simulator + S3/S10 sink wiring. */
class SimulatorSpec extends SparkSpec {
  import spark.implicits._

  test("simulator is deterministic: same ticks -> identical records") {
    val a = Simulator.solarTicks(spark, 200).collect().toSeq
    val b = Simulator.solarTicks(spark, 200).collect().toSeq
    assert(a.toSet === b.toSet)
    assert(a.size === 600) // 200 ticks x 3 stations
  }

  test("API record every 120 ticks (10 min at 5 s cadence), PREDICTION otherwise") {
    val df = Simulator.solarTicks(spark, 240)
    val counts = df.groupBy("data_source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("API") === 2 * 3) // ticks 0 and 120, x3 stations
    assert(counts("PREDICTION") === (240 - 2) * 3)
  }

  test("physics invariants: night rows are zero, day irradiance >= 47.5") {
    val df = Simulator.solarTicks(spark, 5000)
    assert(df.filter((col("hour") < 6 || col("hour") >= 18) &&
      (col("power_kW") =!= 0.0 || col("solar_irradiance_Wm2") =!= 0.0)).count() === 0)
    // floor 50 W/m2 x worst fluctuation 0.95
    assert(df.filter(col("hour").between(6, 17) &&
      col("solar_irradiance_Wm2") < 47.5).count() === 0)
    assert(df.filter(col("effective_efficiency") < 0.05).count() === 0)
  }

  test("T1 rate-source stream has the same schema as the batch generator") {
    val stream = Simulator.solarStream(spark)
    assert(stream.isStreaming)
    assert(stream.schema === Simulator.solarTicks(spark, 1).schema)
  }

  test("S3/S10 sinks are configured without needing a broker") {
    val stream = Simulator.solarStream(spark)
    assert(Pipeline.consoleSink(stream) != null)
    // kafka sink: the wire projection is (key, value) via toKafkaShape
    assert(Pipeline.kafkaSink(stream, "broker:9092", "solar-stations",
      "station_id", "/tmp/graft_kafka_ckpt") != null)
  }
}
