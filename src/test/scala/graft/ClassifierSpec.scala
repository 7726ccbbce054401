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
      .queryExecution.executedPlan
    // match the plan TREE for any broadcast-side join operator (hash or
    // nested-loop), not an operator-name string — robust across Spark
    // versions and AQE settings
    def joins(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      (p +: p.children.flatMap(joins)) ++ p.subqueries.flatMap(joins)
    val broadcastJoin = joins(plan).exists {
      case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => true
      case _: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => true
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        joins(a.executedPlan).exists {
          case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => true
          case _: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => true
          case _ => false
        }
      case _ => false
    }
    assert(broadcastJoin,
      s"expected the seed-vocabulary model to broadcast:\n$plan")
  }

  test("empty seed sets fail fast instead of emitting constant scores") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Classifier.scoreLlr(pos, col("doc_id"), col("text"), pos, empty)
    }
  }

  test("a seed set that tokenizes to nothing fails fast like an empty one") {
    // rows exist but carry no tokens (null text drops at the explode) —
    // the zero-total degenerate case the scalar check must catch. Note
    // whitespace-only text is NOT this case: `tokens` splits it to one
    // empty-string token, a real (if odd) vocabulary entry.
    val blank = Seq((7L, null.asInstanceOf[String])).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Classifier.scoreLlr(pos, col("doc_id"), col("text"), pos, blank)
    }
  }

  test("trainLlr weights and scoreLlr scores agree (shared llr expression)") {
    // the oracle harness only exercises scoreLlr; this pins the train face
    // to it: scoring single-token docs must reproduce the weight table
    val m = Classifier.trainLlr(pos, neg, col("text"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val corpus = Seq((20L, "aa"), (21L, "bb"), (22L, "cc"))
      .toDF("doc_id", "text")
    val scored = Classifier.scoreLlr(corpus, col("doc_id"), col("text"), pos, neg)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(scored(20L) - m("aa")) < 1e-6)
    assert(math.abs(scored(21L) - m("bb")) < 1e-6)
    assert(math.abs(scored(22L) - m("cc")) < 1e-6)
  }

  test("label noise shifts scores but keeps them finite and order-stable") {
    // 40-doc seed sets with 10% flipped labels: three clearly-positive
    // docs polluting neg, three clearly-negative polluting pos. The
    // smoothed model must keep every score finite and preserve the
    // ordering pure-positive > mixed > pure-negative.
    val posDocs = (0 until 30).map(i => (i.toLong, "good clean prose text")) ++
      (30 until 33).map(i => (i.toLong, "spam casino pills"))
    val negDocs = (100 until 130).map(i => (i.toLong, "spam casino pills")) ++
      (130 until 133).map(i => (i.toLong, "good clean prose text"))
    val noisyPos = posDocs.toDF("doc_id", "text")
    val noisyNeg = negDocs.toDF("doc_id", "text")
    val eval = Seq(
      (1L, "good clean prose"),
      (2L, "good spam"),
      (3L, "casino pills spam")).toDF("doc_id", "text")
    val out = Classifier.scoreLlr(eval, col("doc_id"), col("text"),
      noisyPos, noisyNeg)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.values.foreach(v => assert(!v.isNaN && !v.isInfinite, s"non-finite: $out"))
    assert(out(1L) > out(2L) && out(2L) > out(3L),
      s"noise broke the quality ordering: $out")
    assert(out(1L) > 0.0 && out(3L) < 0.0)
  }

  test("fully out-of-vocabulary eval docs score finite on the prior constant") {
    val eval = Seq((1L, "zz yy xx ww"), (2L, "qq")).toDF("doc_id", "text")
    val out = Classifier.scoreLlr(eval, col("doc_id"), col("text"), pos, neg)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val oov = math.log(5.0 / 6.0)
    out.values.foreach { v =>
      assert(!v.isNaN && !v.isInfinite)
      assert(math.abs(v - oov) < 1e-6) // every token OOV -> mean == constant
    }
  }
}
