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

  private def trained(texts: Seq[String], n: Int): Seq[(Int, String, String, Long)] =
    Bpe.train(texts.toDF("text"), col("text"), numMerges = n)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  test("train learns merges in frequency order with recounted pairs") {
    // vocab: ab:3 ac:2 bc:1 -> merges (a,b):3 then (a,c):2 then (b,c):1;
    // the first merge removes ab's pairs from later rounds
    val m = trained(Seq("ab ab ac", "ab ac bc"), n = 3)
    assert(m === Seq((1, "a", "b", 3L), (2, "a", "c", 2L), (3, "b", "c", 1L)))
  }

  test("train builds multi-character symbols across rounds") {
    // abc:2 abd:1 -> round 1 merges (a,b):3; rounds 2-3 see the MERGED
    // symbol "ab" on the left: (ab,c):2 then (ab,d):1
    val m = trained(Seq("abc abc abd"), n = 3)
    assert(m === Seq((1, "a", "b", 3L), (2, "ab", "c", 2L), (3, "ab", "d", 1L)))
  }

  test("train applies merges greedily left-to-right without overlap") {
    // "aaaa": round 1 counts 3 adjacent (a,a) slots; the replace yields
    // (aa)(aa), so round 2's pair is (aa,aa):1, never a stale (a,a)
    val m = trained(Seq("aaaa"), n = 2)
    assert(m === Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
  }

  test("train stops early when the vocabulary runs out of pairs") {
    val m = trained(Seq("ab a b"), n = 5)
    assert(m === Seq((1, "a", "b", 1L)))
  }

  test("encode replays the learned merges; pieces reconstruct the tokens") {
    // abc:2 abd:1 -> merges (a,b), (ab,c), (ab,d): "abc" becomes one
    // symbol, "abd" becomes one symbol, unseen "xbc" stays characters
    // except no merge applies to it at all
    val docs = Seq((1L, "abc abc abd"), (2L, "abc xbc")).toDF("doc_id", "text")
    val merges = trained(Seq("abc abc abd"), n = 3).map(m => (m._2, m._3))
    val got = Bpe.encode(docs, col("doc_id"), col("text"), merges)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(got(1L) === (("abc abc abd", 3)))
    // "xbc": (a,b) doesn't apply; (ab,c)/(ab,d) need the merged "ab"
    // symbol, so x b c stay split
    assert(got(2L) === (("abc x b c", 4)))
    // invariant: concatenating pieces reproduces the raw characters
    val all = Bpe.encode(docs, col("doc_id"), col("text"), merges)
      .select(col("doc_id"), regexp_replace(col("encoded"), " ", "").as("flat"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(all(1L) === "abcabcabd" && all(2L) === "abcxbc")
  }

  test("encode matches the final training segmentation term-for-term") {
    // the exact-replay equivalence the x72 oracle relies on: applying the
    // merge list to a term equals the term's end-of-training segmentation
    val texts = Seq("lower lower lowest low low low newer newest")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = trained(texts, n = 6).map(m => (m._2, m._3))
    val enc = Bpe.encode(docs, col("doc_id"), col("text"), merges)
      .head().getString(1)
    // per-token encodings must concatenate to the same character stream
    // and every multi-char symbol must be buildable from the merge list
    val symbols = enc.split(" ").toSeq
    val buildable = merges.foldLeft(Set[String]()) { case (s, (l, r)) =>
      s + (l + r)
    }
    symbols.filter(_.length > 1).foreach(sym =>
      assert(buildable.contains(sym), s"symbol $sym not produced by a merge"))
  }

  test("x188 swapAudit: hand-traced token budgets, ratio, blast radius") {
    // wordCounts: aa×2, ab×3 → merge1 = (a,b) (wc 3 beats 2), merge2 =
    // (a,a). Under A=[ab]: doc1 "aa aa ab" → 2+2+1 = 5 pieces, doc2
    // "ab ab" → 2. Under B=[ab, aa]: doc1 → 3, doc2 → 2 (unchanged).
    val docs = Seq((1L, "g1", "aa aa ab"), (2L, "g2", "ab ab"))
      .toDF("doc_id", "grp", "text")
    val mA = Bpe.train(docs, col("text"), numMerges = 1)
      .orderBy(col("merge_rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val mB = Bpe.train(docs, col("text"), numMerges = 2)
      .orderBy(col("merge_rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(mA === Seq(("a", "b")))
    assert(mB === Seq(("a", "b"), ("a", "a")))
    val got = Bpe.swapAudit(docs, col("doc_id"), col("text"), col("grp"),
        mA, mB)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    assert(got("g1") === ((1L, 5L, 3L, 1L, 0.6)))
    assert(got("g2") === ((1L, 2L, 2L, 0L, 1.0)))
  }
}
