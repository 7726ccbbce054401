package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.plans.MisraGries

/** Misra-Gries summary: exactness below capacity, the n/(k+1) error bound
  * under eviction, and that both survive arbitrary partitioning (merge).
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def mg(df: DataFrame, cap: Int): Map[String, Long] = {
    val agg = MisraGries(ColumnBridge.expression(col("k")), cap)
    df.agg(ColumnBridge.column(agg.toAggregateExpression()).as("__hh"))
      .select(explode(col("__hh")).as("e"))
      .select(col("e.item"), col("e.est_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  private val skewed: Seq[String] =
    Seq.fill(60)("a") ++ Seq.fill(25)("b") ++ Seq.fill(8)("c") ++
      Seq.fill(4)("d") ++ Seq.fill(3)("e")

  test("capacity >= distinct keys means every count is exact") {
    val df = skewed.toDF("k").repartition(6)
    val truth = skewed.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(mg(df, 8) === truth)
  }

  test("under eviction, estimates stay within n/(capacity+1) below truth") {
    val n = skewed.size
    val truth = skewed.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 4, 9); cap <- Seq(2, 3)) {
      val est = mg(skewed.toDF("k").repartition(parts), cap)
      assert(est.size <= cap)
      val bound = n.toLong / (cap + 1)
      est.foreach { case (k, c) =>
        assert(c <= truth(k), s"cap=$cap parts=$parts: $k overestimated")
        assert(c >= truth(k) - bound, s"cap=$cap parts=$parts: $k below bound")
      }
      // every true heavy hitter (freq > n/(cap+1)) must be reported
      truth.filter(_._2 > bound).keys.foreach { k =>
        assert(est.contains(k), s"cap=$cap parts=$parts: lost heavy hitter $k")
      }
    }
  }

  test("null keys are skipped, not counted") {
    val df = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("k").repartition(3)
    assert(mg(df, 4) === Map("a" -> 2L, "b" -> 1L))
  }

  test("streaming: summary stays exact across incremental micro-batches") {
    // the mergeable buffer is what makes the aggregate legal in a
    // streaming global aggregation: each micro-batch UPDATES the state
    // buffer rather than recomputing from scratch
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val agg = MisraGries(ColumnBridge.expression(col("value")), 8)
    val out = input.toDF()
      .agg(ColumnBridge.column(agg.toAggregateExpression()).as("__hh"))
      .select(explode(col("__hh")).as("e"))
      .select(col("e.item"), col("e.est_count"))
    val q = out.writeStream.format("memory").queryName("mg_out")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete()).start()
    try {
      input.addData("a", "b", "a")
      q.processAllAvailable()
      input.addData("a", "c", "b", "a")
      q.processAllAvailable()
      val got = spark.table("mg_out")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
    } finally q.stop()
  }

  test("eval orders by count desc then item asc") {
    val agg = MisraGries(ColumnBridge.expression(col("k")), 8)
    val rows = Seq("b", "b", "a", "a", "c").toDF("k")
      .agg(ColumnBridge.column(agg.toAggregateExpression()).as("__hh"))
      .select(posexplode(col("__hh")).as(Seq("pos", "e")))
      .select(col("pos"), col("e.item"))
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(rows.sortBy(_._1).map(_._2).toSeq === Seq("a", "b", "c"))
  }
}
