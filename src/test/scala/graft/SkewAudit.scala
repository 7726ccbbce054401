package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured skew A/B for the round-8 verdict's item 8: salted twins vs
  * plain AQE skew handling, at sf1 scale. The driver fixtures are uniform
  * (p19_key_skew reports top-key share ~1e-5), so a deliberate hot key is
  * constructed deterministically: rows whose `l_orderkey % 10 < 3` collapse
  * onto key 0 — ~30 % of the fact table on ONE key, the shape where a
  * sort-merge join serializes a third of the data through one task.
  *
  * {{{
  * sbt 'Test/runMain graft.SkewAudit target/sf1'
  * }}}
  *
  * Three experiments, each min-of-2 wall times to a noop sink:
  *
  *  - **agg**: groupBy(key).sum — plain with AQE off, plain with AQE on,
  *    [[analytics.Aggregates.saltedSum]]. Expectation to verify: partial
  *    (map-side) aggregation already collapses the hot key to one row per
  *    task, so salting buys nothing for algebraic aggregates.
  *  - **join**: fact ⋈ distinct-key dim — AQE off, AQE on
  *    (spark.sql.adaptive.skewJoin splits the oversized partition),
  *    [[analytics.Joins.saltedJoin]]. autoBroadcastJoinThreshold is -1 in
  *    the join cells: with defaults Spark would broadcast the dim and
  *    sidestep skew entirely — which IS the first-choice fix and is
  *    reported separately as `join/broadcast`.
  *  - **topk**: top-10 rows per key — `row_number` window (the hot key's
  *    full row set on one reducer; AQE cannot split a window partition)
  *    vs [[analytics.Ranking.topKPerGroup]] (bounded-heap partials).
  *
  * Results land in PLANS.md §"Round-9: measured skew A/B".
  */
object SkewAudit {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SkewAudit <sfDir>")
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fact = spark.read.parquet(s"$dir/lineitem.parquet")
      .withColumn("key",
        when(pmod(col("l_orderkey"), lit(10)) < 3, lit(0L))
          .otherwise(col("l_orderkey")))
      .select("key", "l_quantity", "l_extendedprice", "l_linenumber")
    val dim = fact.select("key").distinct()
      .withColumn("label", concat(lit("k"), col("key")))
    // materialize both once so per-cell timings don't re-pay the scan
    fact.cache(); dim.cache()
    println(s"[skew] fact=${fact.count()} rows, dim=${dim.count()} keys, " +
      s"hot-key share=${fact.filter(col("key") === 0).count().toDouble / fact.count()}")

    def conf(k: String, v: String): Unit = spark.conf.set(k, v)
    def timed(name: String)(mk: => DataFrame): Unit = {
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[skew] $name%-16s ${secs.min}%.2f s")
    }

    def withAqe(on: Boolean)(body: => Unit): Unit = {
      conf("spark.sql.adaptive.enabled", on.toString); body
    }

    // --- agg ---
    def plainAgg = fact.groupBy("key")
      .agg(round(sum("l_quantity"), 2).as("s"))
    withAqe(false) { timed("agg/aqe-off")(plainAgg) }
    withAqe(true) { timed("agg/aqe-on")(plainAgg) }
    withAqe(true) { timed("agg/salted")(
      analytics.Aggregates.saltedSum(fact, col("key"), col("l_linenumber"),
        col("l_quantity"), saltBuckets = 16, outName = "s")) }

    // --- join (force shuffle joins; broadcast reported separately) ---
    def plainJoin = fact.join(dim, "key").select("key", "label", "l_quantity")
    conf("spark.sql.autoBroadcastJoinThreshold", "-1")
    withAqe(false) { timed("join/aqe-off")(plainJoin) }
    withAqe(true) { timed("join/aqe-skew")(plainJoin) }
    withAqe(true) { timed("join/salted")(
      analytics.Joins.saltedJoin(fact, dim, "key", col("l_linenumber"), 8)
        .select("key", "label", "l_quantity")) }
    conf("spark.sql.autoBroadcastJoinThreshold", "10485760")
    withAqe(true) { timed("join/broadcast")(
      fact.join(broadcast(dim), "key").select("key", "label", "l_quantity")) }

    // --- top-k per key ---
    import org.apache.spark.sql.expressions.Window
    def windowTopK = fact
      .withColumn("rnk", row_number().over(
        Window.partitionBy("key").orderBy(col("l_extendedprice").desc,
          col("l_linenumber"))))
      .filter(col("rnk") <= 10)
    withAqe(true) { timed("topk/window")(windowTopK) }
    withAqe(true) { timed("topk/heap")(
      analytics.Ranking.topKPerGroup(fact, col("key"),
        col("l_extendedprice"), col("l_linenumber"), k = 10)) }

    spark.stop()
  }
}
