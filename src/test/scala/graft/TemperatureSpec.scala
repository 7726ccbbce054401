package graft

import org.apache.spark.sql.functions._

import graft.sampling.Temperature

/** Temperature-scaled mixture weights. */
class TemperatureSpec extends SparkSpec {
  import spark.implicits._

  // (source, n_tokens) pairs expanded to one row per token-carrying unit
  private val df = Seq(
    ("big", 8000L), ("mid", 1000L), ("small", 125L)).toDF("source", "toks")

  private def weights(alpha: Double): Map[String, (Long, Double, Double)] =
    Temperature.mixtureWeights(df, col("source"), col("toks"), alpha,
        budgetTokens = 10000L)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap

  test("alpha = 1 reproduces natural proportions") {
    val w = weights(1.0)
    assert(math.abs(w("big")._2 - 8000.0 / 9125.0) < 1e-5)
    assert(math.abs(w("small")._2 - 125.0 / 9125.0) < 1e-5)
    // at natural proportions every source runs the same fraction of an epoch
    assert(math.abs(w("big")._3 - w("small")._3) < 1e-5)
  }

  test("alpha < 1 compresses the ratio toward uniform") {
    val natural = weights(1.0)
    val cooled = weights(1.0 / 3.0)
    val rNat = natural("big")._2 / natural("small")._2
    val rCool = cooled("big")._2 / cooled("small")._2
    // 8000/125 = 64x natural becomes 64^(1/3) = 4x at alpha 1/3 (weights
    // round at 6 dp, which the small denominator amplifies ~1e-3 in ratio)
    assert(math.abs(rNat - 64.0) < 1e-2)
    assert(math.abs(rCool - 4.0) < 1e-2)
  }

  test("weights sum to 1 and epochs follow w * budget / tokens") {
    val w = weights(0.3)
    assert(math.abs(w.values.map(_._2).sum - 1.0) < 1e-4)
    // both sides round at 6 dp; epochs = w*budget/n magnifies that by
    // budget/n, so compare at 1e-4
    w.foreach { case (_, (n, wt, ep)) =>
      assert(math.abs(ep - wt * 10000.0 / n) < 1e-4)
    }
  }
}
