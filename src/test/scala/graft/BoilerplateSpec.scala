package graft

import org.apache.spark.sql.functions._

import graft.text.Boilerplate

/** Line-level corpus dedup: boilerplate stripping, reassembly order,
  * full-boilerplate doc elimination.
  */
class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  // "footer" appears in 3 docs (> maxDocs=2); each unique body line in one
  private val docs = Seq(
    (1L, "unique one\nfooter"),
    (2L, "unique two a\nunique two b\nfooter"),
    (3L, "footer"), // all boilerplate -> doc drops out entirely
    (4L, "no footer here")).toDF("doc_id", "text")

  private def run() =
    Boilerplate.dropBoilerplateLines(docs.repartition(3),
      col("doc_id"), col("text"), maxDocs = 2)

  test("shared lines are stripped, unique lines kept in order") {
    val out = run().collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) === (("unique one", 1L, 1L)))
    assert(out(2L) === (("unique two a\nunique two b", 2L, 1L)))
    assert(out(4L) === (("no footer here", 1L, 0L)))
  }

  test("a doc whose every line is boilerplate disappears") {
    assert(!run().collect().map(_.getLong(0)).contains(3L))
  }

  test("reassembly is deterministic across partitionings") {
    val a = run().collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = Boilerplate.dropBoilerplateLines(docs.repartition(1),
        col("doc_id"), col("text"), maxDocs = 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a === b)
  }
}
