package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Exact + near-dup operators over a constructed corpus. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox leaps over the lazy dog"),   // near dup of 1
    (4L, "completely different content about spark engines"),
    (5L, "  The Quick  Brown Fox jumps over the lazy dog ") // ws/case-normalized dup
  ).toDF("doc_id", "text")

  test("exact dedup groups by normalized fingerprint, canonical = min id") {
    val out = Dedup.exactDuplicates(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(out(1L) === (1L, false))
    assert(out(2L) === (1L, true))
    assert(out(5L) === (1L, true)) // normalization folds case + whitespace
    assert(out(4L) === (4L, false))
  }

  test("minhash LSH candidates include the near-dup pair, then jaccard verifies") {
    val near = Dedup.nearDuplicates(docs, col("doc_id"), col("text"), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(near.contains((1L, 2L))) // identical docs always survive
    assert(near.contains((1L, 3L)) || near.contains((2L, 3L)),
      "one-word edit should be an LSH candidate with jaccard >= 0.5")
  }

  test("jaccard: identical sets = 1, disjoint = 0") {
    val g = Seq((Seq("a b", "b c"), Seq("a b", "b c"), Seq("x y", "y z")))
      .toDF("a", "b", "c")
    val r = g.select(Dedup.jaccard(col("a"), col("b")),
      Dedup.jaccard(col("a"), col("c"))).head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 0.0)
  }

  test("simhash: identical docs agree; hamming to near-dup is small") {
    val sh = docs.select(col("doc_id"), Dedup.simhash16(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) === sh(2L))
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(3L)) <= 6,
      "one-word edit flips few simhash bits")
    assert(sh.values.forall(h => h >= 0 && h <= 0xFFFFL))
  }

  test("simhash-banded pairs surface exact and near duplicates") {
    val pairs = Dedup.simhashPairs(docs, col("doc_id"), col("text"), maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) === 0) // identical docs: identical signature
    assert(pairs((1L, 5L)) === 0) // case/whitespace variant: same tokens
    // two half-bands guarantee candidacy only at hamming <= 1 (pigeonhole);
    // the (1,3) one-word edit flips bits in both halves and may be missed —
    // that is the LSH recall trade, not a bug
    assert(!pairs.contains((1L, 4L))) // unrelated content shares no band
  }

  test("LSH bucket-size cap drops degenerate bands") {
    val boiler = (1L to 20L).map(i => (i, "same same text text")).toDF("doc_id", "text")
    val capped = Dedup.minhashCandidates(boiler, col("doc_id"), col("text"),
      maxBucket = 10)
    assert(capped.count() === 0) // all 20 share one band > cap
  }

  test("duplicateClusters: min-label connected components, canonical per cluster") {
    // chain 1-2-3-4 needs multiple propagation rounds; 7-8 is a separate
    // component; 10 appears in no pair and must be absent from the output
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (7L, 8L))
      .toDF("doc_a", "doc_b").repartition(5)
    val out = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 7L, 8L))
    assert(Seq(1L, 2L, 3L, 4L).forall(out(_)._1 == 1L))
    assert(out(7L)._1 === 7L && out(8L)._1 === 7L)
    assert(out.collect { case (id, (_, true)) => id }.toSet === Set(1L, 7L))
  }

  test("duplicateClusters fails loudly when maxIter is too small") {
    val chain = (1L until 8L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    intercept[IllegalStateException] {
      Dedup.duplicateClusters(chain, maxIter = 1).collect()
    }
  }

  test("duplicateClusters converges in log rounds on a 10k-node path graph") {
    // diameter 9 999: plain min-label propagation needs ~10 000 rounds;
    // pointer jumping must finish within 15 (it throws past maxIter)
    val path = spark.range(0L, 9999L).toDF("doc_a")
      .withColumn("doc_b", col("doc_a") + 1L)
    val out = Dedup.duplicateClusters(path, maxIter = 15)
      .agg(countDistinct(col("cluster_id")).as("k"),
        max(col("cluster_id")).as("m"),
        count(lit(1)).as("n")).head()
    assert(out.getLong(0) === 1L) // single component
    assert(out.getLong(1) === 0L) // labeled by the minimum node
    assert(out.getLong(2) === 10000L)
  }

  test("repetitionScore flags boilerplate, clears diverse text, guards short docs") {
    val r = Seq("same same same same", "all words here differ", "one", "")
      .toDF("text").select(TextAnalysis.repetitionScore(col("text")))
      .collect().map(_.getDouble(0)).toSeq
    assert(math.abs(r(0) - (1.0 - 1.0 / 3.0)) < 1e-6) // 3 bigram slots, 1 distinct
    assert(r(1) === 0.0) // all bigrams distinct
    assert(r(2) === 0.0 && r(3) === 0.0) // guarded short docs
  }

  test("token/shingle/fingerprint primitives") {
    val r = Seq("Hello  World foo").toDF("text").select(
      TextAnalysis.tokenCount(col("text")),
      size(TextAnalysis.shingles(col("text"), 2)),
      TextAnalysis.fingerprint(col("text"))).head()
    assert(r.getInt(0) === 3)
    assert(r.getInt(1) === 2)
    assert(r.getString(2).length === 32)
  }
}
