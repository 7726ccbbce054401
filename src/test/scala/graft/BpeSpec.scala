package graft

import org.apache.spark.sql.functions._

import graft.text.Bpe

/** BPE pair counting: weighted counts, ordering, vocabulary-not-corpus
  * explode semantics.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("pair counts weight by word frequency, not distinct words") {
    // "aa" appears 3x, "ab" once: pair (a,a) count 3, (a,b) count 1
    val df = Seq("aa aa ab", "aa").toDF("text")
    val out = Bpe.pairCounts(df, col("text"), topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(("a", "a") -> 3L, ("a", "b") -> 1L))
  }

  test("rank-1 candidate is the BPE merge argmax with deterministic ties") {
    val df = Seq("xy xy xz zz").toDF("text")
    val rows = Bpe.pairCounts(df, col("text"), topK = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // (x,y) count 2 wins; (x,z) and (z,z) tie at 1 -> lexicographic
    assert(rows.toSeq === Seq(("x", "y", 2L), ("x", "z", 1L), ("z", "z", 1L)))
  }

  test("single-character words contribute no pairs") {
    val df = Seq("a b c ab").toDF("text")
    val out = Bpe.pairCounts(df, col("text"), topK = 10).collect()
    assert(out.length === 1)
    assert((out.head.getString(0), out.head.getString(1)) === ("a", "b"))
  }

  test("pair rows scale with the vocabulary, not corpus occurrences") {
    // 200 repetitions of one word: the pair explode sees ONE vocab row
    val rep = Seq.fill(200)("hello").mkString(" ")
    val counts = Bpe.wordCounts(Seq(rep).toDF("text"), col("text"))
    assert(counts.count() === 1)
    val out = Bpe.pairCounts(Seq(rep).toDF("text"), col("text"), 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out(("l", "l")) === 200L)
    assert(out(("h", "e")) === 200L)
  }
}
