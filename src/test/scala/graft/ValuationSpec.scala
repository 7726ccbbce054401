package graft

import org.apache.spark.sql.functions._

import graft.analytics.Valuation

/** x205 KNN-Shapley data valuation and x206 blocking audit. */
class ValuationSpec extends SparkSpec {
  import spark.implicits._

  private def corpus4 = Seq(
    // sorted-by-cosine-to-[1,0] order: a, b, c, d
    (10L, 1, Array(1.0f, 0.1f)), // cos .995  match
    (11L, 0, Array(1.0f, 0.5f)), // cos .894  miss
    (12L, 1, Array(0.5f, 1.0f)), // cos .447  match
    (13L, 0, Array(0.0f, 1.0f))  // cos 0     miss
  ).toDF("vec_id", "label", "embedding")

  test("x205 knnShapley: hand-run of the Jia et al. recurrence at K=1, " +
      "values telescope to the full-set utility") {
    val probe = Seq((1L, 1, Array(1.0f, 0.0f)))
      .toDF("vec_id", "label", "embedding")
    val got = Valuation.knnShapley(corpus4, probe,
        col("vec_id"), col("label"), col("embedding"),
        col("vec_id"), col("label"), col("embedding"), k = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // hand recurrence (nearest-first m = 1,0,1,0; N=4, K=1):
    //   s4 = 0/4 = 0
    //   s3 = 0 + (1-0)/1 * 1/3 =  1/3
    //   s2 = 1/3 + (0-1)/1 * 1/2 = -1/6
    //   s1 = -1/6 + (1-0)/1 * 1/1 = 5/6
    assert(got === Map(10L -> 0.833333, 11L -> -0.166667,
      12L -> 0.333333, 13L -> 0.0))
    // Shapley efficiency: values sum to U(D) - U(∅) = the full-corpus
    // 1-NN correctness (1 here: the nearest point matches the probe)
    assert(math.abs(got.values.sum - 1.0) < 1e-5)
  }

  test("x205 knnShapley: cross-probe mean is the 1e-6 quantized average") {
    // second probe [0,1] label 0 reverses the ranking; per-point values
    // under it are (d,c,b,a) = (5/6, -1/6, 1/3, 0) by the same recurrence
    val probes = Seq(
      (1L, 1, Array(1.0f, 0.0f)),
      (2L, 0, Array(0.0f, 1.0f))).toDF("vec_id", "label", "embedding")
    val got = Valuation.knnShapley(corpus4, probes,
        col("vec_id"), col("label"), col("embedding"),
        col("vec_id"), col("label"), col("embedding"), k = 1)
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getDouble(3))))
      .toMap
    // the operator's own arithmetic: per-probe values quantize to 1e-12
    // longs (term-level on the real path; identical here because this
    // fixture's per-rank terms round independently to the same total),
    // then the mean rounds like Spark's round(col, 6) — HALF_UP on the
    // exact binary value of the double
    def q(x: Double): Long = math.round(x * 1e12)
    def mean2(a: Double, b: Double): Double =
      BigDecimal((q(a) + q(b)).toDouble / 2e12)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(10L) === ((2L, mean2(5.0 / 6, 0.0))))
    assert(got(11L) === ((2L, mean2(-1.0 / 6, 1.0 / 3))))
    assert(got(12L) === ((2L, mean2(1.0 / 3, -1.0 / 6))))
    assert(got(13L) === ((2L, mean2(0.0, 5.0 / 6))))
  }

  test("x206 blockingAudit: hand pair counts, no enumeration needed") {
    val recs = Seq(
      (1L, "A", 1L), (2L, "A", 1L), (3L, "B", 1L),
      (4L, "A", 2L), (5L, "A", 2L), (6L, "C", 3L)
    ).toDF("rid", "bk", "tr")
    val r = Valuation.blockingAudit(recs, col("rid"), col("bk"), col("tr"))
      .head()
    assert(r.getAs[Long]("n") === 6L)
    assert(r.getAs[Long]("n_blocks") === 3L)
    assert(r.getAs[Long]("total_pairs") === 15L)       // C(6,2)
    assert(r.getAs[Long]("candidate_pairs") === 6L)    // C(4,2) in A
    assert(r.getAs[Long]("true_pairs") === 4L)         // C(3,2)+C(2,2)
    assert(r.getAs[Long]("covered_pairs") === 2L)      // (A,1),(A,2)
    assert(r.getAs[Double]("reduction_ratio") === 0.6)
    assert(r.getAs[Double]("pairs_completeness") === 0.5)
    assert(r.getAs[Double]("pairs_quality") === 0.333333)
  }

  test("x206 blockingAudit: a perfect blocking covers every true pair " +
      "and a degenerate one costs C(n,2) candidates") {
    val recs = (1L to 20L).map(i => (i, i / 4, i / 4))
      .toDF("rid", "bk", "tr")
    val perfect = Valuation.blockingAudit(recs, col("rid"), col("bk"),
      col("tr")).head()
    assert(perfect.getAs[Double]("pairs_completeness") === 1.0)
    assert(perfect.getAs[Double]("pairs_quality") === 1.0)
    val degen = Valuation.blockingAudit(
      recs.withColumn("bk", lit("all")), col("rid"), col("bk"), col("tr"))
      .head()
    assert(degen.getAs[Long]("candidate_pairs") ===
      degen.getAs[Long]("total_pairs"))
    assert(degen.getAs[Double]("reduction_ratio") === 0.0)
    assert(degen.getAs[Double]("pairs_completeness") === 1.0)
    // degenerate denominators: a 1-record corpus has no pairs of any
    // kind — every ratio is NULL, never an ANSI divide-by-zero
    val one = Valuation.blockingAudit(
      Seq((1L, "A", 1L)).toDF("rid", "bk", "tr"),
      col("rid"), col("bk"), col("tr")).head()
    assert(one.getAs[Long]("total_pairs") === 0L)
    assert(one.isNullAt(one.fieldIndex("reduction_ratio")))
    assert(one.isNullAt(one.fieldIndex("pairs_completeness")))
    assert(one.isNullAt(one.fieldIndex("pairs_quality")))
  }
}
