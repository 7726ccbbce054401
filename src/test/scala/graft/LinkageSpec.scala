package graft

import org.apache.spark.sql.functions._

import graft.analytics.Linkage

/** Fellegi–Sunter field weights: hand-computed m/u under add-half
  * smoothing, null-safe agreement, and the LLR signs that make agreement
  * on a discriminating field positive evidence.
  */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  // six records, one attribute; city is null on 5 and 6 (both-null must
  // count as agreement under the null-safe rule)
  private val recs = Seq(
    (1L, Some("cairo")), (2L, Some("cairo")),
    (3L, Some("giza")), (4L, Some("luxor")),
    (5L, None: Option[String]), (6L, None: Option[String]))
    .toDF("id", "city")

  private val matches = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
  private val nonMatches = Seq((1L, 3L), (2L, 4L), (5L, 6L))
    .toDF("doc_a", "doc_b")

  test("x191 m/u and weights match the hand computation") {
    val r = Linkage.fieldWeights(recs, col("id"),
      Seq("city" -> col("city")), matches, nonMatches).head()
    assert(r.getAs[Long]("n_match") === 2L)
    assert(r.getAs[Long]("n_nonmatch") === 3L)
    // matches: (1,2) agree, (3,4) disagree -> m = (1+0.5)/(2+1) = 0.5
    // non-matches: only (5,6) agrees (null-safe) -> u = (1+0.5)/(3+1)
    assert(r.getAs[Double]("m_prob") === 0.5)
    assert(r.getAs[Double]("u_prob") === 0.375)
    val wAgree = math.log(0.5 / 0.375) / math.log(2.0)
    val wDis = math.log(0.5 / 0.625) / math.log(2.0)
    assert(r.getAs[Double]("w_agree") === math.rint(wAgree * 1e6) / 1e6)
    assert(r.getAs[Double]("w_disagree") === math.rint(wDis * 1e6) / 1e6)
    assert(r.getAs[Double]("w_agree") > 0 && r.getAs[Double]("w_disagree") < 0)
  }

  test("x191 null vs value disagrees; multiple fields stay independent") {
    val recs2 = Seq(
      (1L, Some("cairo"), "en"), (2L, None: Option[String], "en"),
      (3L, Some("giza"), "ar"), (4L, Some("giza"), "fr"))
      .toDF("id", "city", "lang")
    val m2 = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val n2 = Seq((3L, 4L)).toDF("doc_a", "doc_b")
    val out = Linkage.fieldWeights(recs2, col("id"),
      Seq("city" -> col("city"), "lang" -> col("lang")), m2, n2)
      .collect().map(r => r.getAs[String]("field") -> r).toMap
    // city: match pair (1,2) has null-vs-value -> disagree -> m=(0+.5)/2
    assert(out("city").getAs[Double]("m_prob") === 0.25)
    // lang: match pair agrees -> m=(1+.5)/2; non-match disagrees -> u=.25
    assert(out("lang").getAs[Double]("m_prob") === 0.75)
    assert(out("lang").getAs[Double]("u_prob") === 0.25)
  }

  test("x195 scorePairs sums the published weights per agreement pattern") {
    val recs2 = Seq(
      (1L, Some("cairo"), "en"), (2L, Some("cairo"), "en"),
      (3L, Some("giza"), "en"), (4L, Some("luxor"), "fr"))
      .toDF("id", "city", "lang")
    val weights = Seq(
      ("city", 2.0, -1.0), ("lang", 0.5, -3.0))
      .toDF("field", "w_agree", "w_disagree")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("doc_a", "doc_b")
    val out = Linkage.scorePairs(recs2, col("id"),
      Seq("city" -> col("city"), "lang" -> col("lang")), weights, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // (1,2): both agree -> 2.0 + 0.5 = 2.5, match
    assert(out((1L, 2L)).getAs[Double]("score") === 2.5)
    assert(out((1L, 2L)).getAs[Long]("n_agree") === 2L)
    assert(out((1L, 2L)).getAs[Boolean]("fs_match"))
    // (1,3): city disagrees, lang agrees -> -1.0 + 0.5 = -0.5, no match
    assert(out((1L, 3L)).getAs[Double]("score") === -0.5)
    assert(!out((1L, 3L)).getAs[Boolean]("fs_match"))
    // (1,4): both disagree -> -4.0
    assert(out((1L, 4L)).getAs[Double]("score") === -4.0)
    assert(out((1L, 4L)).getAs[Long]("n_agree") === 0L)
  }
}
