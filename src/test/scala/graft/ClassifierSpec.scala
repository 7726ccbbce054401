package graft

import org.apache.spark.sql.functions._
import graft.text.Classifier

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // pos tokens: aa bb aa  (cp: aa=2 bb=1, tp=3)
  // neg tokens: cc bb     (cn: cc=1 bb=1, tn=2)
  // union vocab V = {aa, bb, cc} = 3
  private val pos = Seq((1L, "aa bb"), (2L, "aa")).toDF("doc_id", "text")
  private val neg = Seq((3L, "cc bb")).toDF("doc_id", "text")

  test("trainLlr computes add-one smoothed log-likelihood ratios over the union vocab") {
    val m = Classifier.trainLlr(pos, neg, col("text"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m.keySet === Set("aa", "bb", "cc"))
    // llr(aa) = ln(3/6) - ln(1/5) = ln(2.5)
    assert(math.abs(m("aa") - math.log(2.5)) < 1e-12)
    // llr(bb) = ln(2/6) - ln(2/5) = ln(5/6)
    assert(math.abs(m("bb") - math.log(5.0 / 6.0)) < 1e-12)
    // llr(cc) = ln(1/6) - ln(2/5) = ln(5/12)
    assert(math.abs(m("cc") - math.log(5.0 / 12.0)) < 1e-12)
  }

  test("scoreLlr averages token llr, routes OOV tokens to the smoothed-zero constant") {
    val corpus = Seq((10L, "aa dd"), (11L, "cc cc"), (12L, "zz"))
      .toDF("doc_id", "text")
    val out = Classifier.scoreLlr(corpus, col("doc_id"), col("text"), pos, neg)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2), r.getBoolean(3)))).toMap
    val oov = math.log(5.0 / 6.0) // ln((tn+V)/(tp+V)) = ln(5/6)
    // doc 10: mean(ln 2.5, oov) > 0 — the positive-seed word dominates
    val exp10 = (math.log(2.5) + oov) / 2.0
    assert(math.abs(out(10L)._1 - exp10) < 1e-6 && out(10L)._3)
    assert(out(10L)._2 === 2L)
    // doc 11: pure negative-seed vocabulary
    assert(math.abs(out(11L)._1 - math.log(5.0 / 12.0)) < 1e-6 && !out(11L)._3)
    // doc 12: fully OOV lands exactly on the prior-odds constant, not null
    assert(math.abs(out(12L)._1 - oov) < 1e-6 && !out(12L)._3)
  }

  test("the model probes the corpus token stream as a broadcast join") {
    val corpus = Seq((10L, "aa dd")).toDF("doc_id", "text")
    val plan = Classifier.scoreLlr(corpus, col("doc_id"), col("text"), pos, neg)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the seed-vocabulary model to broadcast:\n$plan")
  }

  test("empty seed sets fail fast instead of emitting constant scores") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Classifier.scoreLlr(pos, col("doc_id"), col("text"), pos, empty)
    }
  }
}
