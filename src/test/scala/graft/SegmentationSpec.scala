package graft

import org.apache.spark.sql.functions._

import graft.text.Segmentation

/** x207 TextTiling topic segmentation. */
class SegmentationSpec extends SparkSpec {
  import spark.implicits._

  test("x207 boundaries: hand cosines and Hearst depth on a two-topic doc") {
    // 12 tokens, w=4 -> blocks [a b a b][a b a b][c d c d]:
    // boundary 0 joins identical vectors (sim 1), boundary 1 joins
    // disjoint ones (sim 0) — the valley
    val doc = Seq((1L, "a b a b a b a b c d c d")).toDF("id", "text")
    val got = Segmentation.boundaries(doc, col("id"), col("text"), w = 4)
      .collect().map(r => r.getLong(1) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got(0L) === ((1.0, 0.0))) // not a valley: right side is lower
    assert(got(1L) === ((0.0, 1.0))) // depth = peakL(1.0) - 0, edge right
  }

  test("x207 boundaries: mixed-vocabulary blocks give the exact " +
      "integer-count cosine") {
    // blocks [a b a b][a b c d][c d c d]: dot 4 both, norms 8/4/8
    // -> sim 4/sqrt(32) both boundaries, flat depth
    val doc = Seq((1L, "a b a b a b c d c d c d")).toDF("id", "text")
    val got = Segmentation.boundaries(doc, col("id"), col("text"), w = 4)
      .collect().map(r => r.getLong(1) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    val sim = math.rint(4.0 / math.sqrt(32.0) * 1e6) / 1e6
    assert(got(0L) === ((sim, 0.0)) && got(1L) === ((sim, 0.0)))
  }

  test("x207 cutReport: argmax at the valley, ties to the earliest " +
      "boundary, short docs absent") {
    val docs = Seq(
      (1L, "a b a b a b a b c d c d"), // valley at boundary 1
      (2L, "a a a a b b b b a a a a"), // two zero-depth boundaries: tie
      (3L, "too short")                // single block: no boundary
    ).toDF("id", "text")
    val got = Segmentation.cutReport(docs, col("id"), col("text"), w = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got.keySet === Set(1L, 2L))
    assert(got(1L) === ((2L, 1L, 1.0, 0.0)))
    // doc 2: disjoint neighbors on both boundaries (sim 0, depth 0);
    // the tie must resolve to boundary 0, not 1
    assert(got(2L) === ((2L, 0L, 0.0, 0.0)))
  }
}
