package graft

import org.apache.spark.sql.functions._

import graft.analytics.Encoding

/** Leave-one-out target encoding: hand means, singleton behavior, and the
  * leakage property the operator exists for.
  */
class EncodingSpec extends SparkSpec {
  import spark.implicits._

  // group a: targets 1,0,1 (sum 2); group b: 0,0 (sum 0); c: singleton 1
  private val rows = Seq(
    (1L, "a", 1), (2L, "a", 0), (3L, "a", 1),
    (4L, "b", 0), (5L, "b", 0),
    (6L, "c", 1)).toDF("id", "grp", "y")

  private def enc(smoothing: Double) =
    Encoding.looTargetEncode(rows, col("id"), col("grp"), col("y"),
      smoothing).collect().map(r => r.getLong(0) -> r).toMap

  test("x199 LOO mean excludes the row's own target") {
    val out = enc(smoothing = 10.0)
    // id 1 (y=1, group a): (2-1)/2 = 0.5; id 2 (y=0): (2-0)/2 = 1.0
    assert(out(1L).getAs[Double]("loo_raw") === 0.5)
    assert(out(2L).getAs[Double]("loo_raw") === 1.0)
    assert(out(4L).getAs[Double]("loo_raw") === 0.0)
    // singleton: LOO undefined -> null
    assert(out(6L).isNullAt(out(6L).fieldIndex("loo_raw")))
  }

  test("x199 smoothing shrinks toward the global prior; singleton reads " +
      "exactly the prior") {
    val prior = 3.0 / 6.0
    val out = enc(smoothing = 10.0)
    // singleton c: (1 - 1 + 10·prior) / (0 + 10) = prior
    assert(out(6L).getAs[Double]("enc") === prior)
    // id 1: (2 - 1 + 10·0.5) / (2 + 10) = 6/12 = 0.5
    assert(out(1L).getAs[Double]("enc") === 0.5)
    // id 4 (group b, n=2): (0 - 0 + 5) / (1 + 10) -> shrunk well above
    // the raw 0.0
    assert(out(4L).getAs[Double]("enc") ===
      math.rint(5.0 / 11.0 * 1e6) / 1e6)
    // heavier smoothing pulls harder toward the prior
    val heavy = enc(smoothing = 1000.0)
    assert(math.abs(heavy(4L).getAs[Double]("enc") - prior) <
      math.abs(out(4L).getAs[Double]("enc") - prior))
  }

  test("x199 the naive (leaky) mean differs from LOO wherever y varies " +
      "within the group") {
    val out = enc(smoothing = 10.0)
    // group a naive mean = 2/3 for every row; LOO differs per row
    assert(out(1L).getAs[Double]("loo_raw") !==
      out(2L).getAs[Double]("loo_raw"))
  }
}
