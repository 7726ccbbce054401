package graft

import org.apache.spark.sql.functions._

import graft.text.Stylometry

/** Burrows' delta: identical styles measure 0, a divergent style measures
  * symmetrically against both twins, and the zero-filled grid counts a
  * source's MISSING top terms as style.
  */
class StylometrySpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    ("A", "x x y"), ("B", "x x y"), ("C", "y y y y"))
    .toDF("source", "text")

  private def deltas = Stylometry.burrowsDelta(docs, col("source"),
    col("text"), topM = 2).collect()
    .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("delta"))
    .toMap

  test("x194 identical sources measure exactly 0") {
    assert(deltas(("A", "B")) === 0.0)
  }

  test("x194 the divergent source sits equidistant from its twins, " +
      "and missing terms count as frequency 0") {
    val d = deltas
    // C never says "x": its grid row for x must exist with f = 0, which
    // is what separates it — dropping missing terms would leave only the
    // shared term y and understate the distance
    assert(d(("A", "C")) === d(("B", "C")))
    assert(d(("A", "C")) > 1.0)
  }

  test("x194 zero-variance top terms contribute z = 0, not NaN") {
    val same = Seq(("A", "w q"), ("B", "w q"), ("C", "w q"))
      .toDF("source", "text")
    val out = Stylometry.burrowsDelta(same, col("source"), col("text"),
      topM = 2).collect()
    assert(out.length === 3)
    out.foreach(r => assert(r.getAs[Double]("delta") === 0.0))
  }
}
