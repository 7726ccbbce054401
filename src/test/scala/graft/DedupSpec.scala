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

  test("thresholdSweep: histogram + cumulative equal the naive rule") {
    val got = Dedup.thresholdSweep(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getDouble(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val scores = Dedup.nearDuplicatesWide(docs, col("doc_id"), col("text"),
        threshold = 0.0, numHashes = 4, rowsPerBand = 2)
      .collect().map(_.getDouble(2))
    assert(scores.nonEmpty)
    val want = scores.groupBy(j => math.floor(j / 0.05)).map { case (b, js) =>
      (math.rint(b * 0.05 * 100) / 100,
        (js.length.toLong,
          scores.count(s => math.floor(s / 0.05) >= b).toLong))
    }
    assert(got === want)
    // the exact-dup pair pins the top bucket; cumulative hits every pair
    assert(got.keySet.max === 1.0)
    assert(got.values.map(_._1).sum === scores.length.toLong)
  }

  test("dupInflation: size histogram conserves docs; excess = droppable rows") {
    // clusters {1,2,3,4} and {7,8} from the pair evidence; docs 5,6,9,10
    // are singletons → sizes: one 4, one 2, four 1s
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (7L, 8L))
      .toDF("doc_a", "doc_b")
    val corpus = (1L to 10L).toDF("doc_id")
    val out = Dedup.dupInflation(corpus, col("doc_id"),
        Dedup.duplicateClusters(pairs))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out === Map(1L -> (4L, 4L, 0L), 2L -> (1L, 2L, 1L),
      4L -> (1L, 4L, 3L)))
    // conservation: n_docs covers the corpus, n_excess = survivors' drop
    assert(out.values.map(_._2).sum === 10L)
    val dropped = 10L - Dedup.survivors(corpus, col("doc_id"), pairs).count()
    assert(out.values.map(_._3).sum === dropped)
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

  test("wide signatures: first four match the narrow kernel at any width") {
    val narrow = Dedup.signatures(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getString)).toMap
    val wide = Dedup.signatures(docs, col("doc_id"), col("text"), numHashes = 12)
      .collect().map(r => r.getLong(0) -> (1 to 12).map(r.getString)).toMap
    wide.foreach { case (id, sigs) =>
      assert(sigs.take(4) === narrow(id),
        "group 0 must be bit-identical to the narrow kernel")
      assert(sigs.distinct.size > 4,
        "seeded groups must produce new independent minima")
    }
  }

  test("wide near-dup chain agrees with the narrow one on verified pairs") {
    val narrow = Dedup.nearDuplicates(docs, col("doc_id"), col("text"), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val wide = Dedup.nearDuplicatesWide(docs, col("doc_id"), col("text"), 0.5,
        numHashes = 8, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // verification is exact on both chains: any pair both surface must
    // carry the same jaccard, and more bands can only ADD candidates
    narrow.keySet.intersect(wide.keySet).foreach(k =>
      assert(narrow(k) === wide(k)))
    assert(narrow.keySet.subsetOf(wide.keySet),
      "bands 1-2 of the wide chain are exactly the narrow bands")
    assert(wide.contains((1L, 3L)), "the known near-dup pair must survive")
  }

  test("bandingFor picks the S-curve midpoint bracketing the threshold") {
    // textbook anchors (MMDS §3.4): midpoint s* = (1/b)^(1/r)
    for (t <- Seq(0.3, 0.5, 0.7, 0.8, 0.9); budget <- Seq(16, 64, 128)) {
      val (b, r) = Dedup.bandingFor(t, budget)
      assert(b * r <= budget && b * r % r === 0)
      val mid = math.pow(1.0 / b, 1.0 / r)
      // no other (b', r') within the budget sits closer to the threshold
      val best = (for { rr <- 1 to budget; bb <- 1 to budget / rr
        if bb * rr >= 2 } yield math.abs(math.pow(1.0 / bb, 1.0 / rr) - t)).min
      assert(math.abs(math.abs(mid - t) - best) < 1e-12)
      // the S-curve actually separates: catch prob well above the midpoint
      // beats catch prob well below it
      assert(Dedup.catchProbability(math.min(t + 0.15, 0.99), b, r) >
        Dedup.catchProbability(math.max(t - 0.15, 0.01), b, r))
    }
    // determinism + divisibility contract on the default budget
    assert(Dedup.bandingFor(0.7) === Dedup.bandingFor(0.7))
  }

  test("nearDuplicatesAuto = nearDuplicatesWide at bandingFor's (b, r)") {
    val (b, r) = Dedup.bandingFor(0.5, maxHashes = 16)
    val auto = Dedup.nearDuplicatesAuto(docs, col("doc_id"), col("text"), 0.5,
        maxHashes = 16)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
    val manual = Dedup.nearDuplicatesWide(docs, col("doc_id"), col("text"), 0.5,
        numHashes = b * r, rowsPerBand = r)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
    assert(auto === manual)
    assert(auto.contains((1L, 2L)), "exact dup always survives auto banding")
  }

  test("winnow: matches the independent md5 reference, short docs empty") {
    // independent reference: positional 4-grams, first-8-hex md5 value,
    // window-4 minima, distinct sorted — recomputed here from first
    // principles so a kernel regression can't hide
    def ref(text: String, k: Int, w: Int): Seq[Long] = {
      val t = text.toLowerCase.trim.split("\\s+", -1)
      if (t.length < k) return Nil
      val md = java.security.MessageDigest.getInstance("MD5")
      val hs = (0 to t.length - k).map { i =>
        val hex = md.digest(t.slice(i, i + k).mkString(" ")
            .getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.substring(0, 8), 16)
      }
      (0 until math.max(hs.length - w + 1, 1))
        .map(s => hs.slice(s, math.min(s + w, hs.length)).min)
        .distinct.sorted
    }
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and keeps running fast",
      "one two three four five six seven",
      "exactly four token gram", // m = 1: a single window over one hash
      "too short here")          // 3 tokens < k: empty
    val got = texts.toDF("text")
      .select(TextAnalysis.winnowFingerprints(col("text"), 4, 4))
      .collect().map(_.getSeq[Long](0).toSeq)
    texts.zip(got).foreach { case (t, g) =>
      assert(g === ref(t, 4, 4), s"mismatch for: $t")
    }
    assert(got.last.isEmpty)
  }

  test("winnow guarantee: a shared span of w+k-1 tokens shares a fingerprint") {
    // 7-token shared span inside otherwise-unrelated documents
    val span = "alpha beta gamma delta epsilon zeta eta"
    val d = Seq(
      (1L, s"completely unrelated prefix words here $span and a different tail"),
      (2L, s"other document starts its own way $span closing with more text"),
      (3L, "no overlap with anything else at all in this one document body"))
      .toDF("doc_id", "text")
    val fp = d.select(col("doc_id"),
        explode(TextAnalysis.winnowFingerprints(col("text"), 4, 4)).as("f"))
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    assert((fp(1L) & fp(2L)).nonEmpty, "shared span must share a fingerprint")
    assert((fp(1L) & fp(3L)).isEmpty && (fp(2L) & fp(3L)).isEmpty,
      "unrelated docs must not collide")
  }

  test("winnowPairs surfaces partial-overlap pairs with the shared count") {
    val span = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = Seq(
      (1L, s"first document unique opening words $span unique first ending"),
      (2L, s"second doc other start tokens here $span second tail entirely"),
      (3L, "third document shares nothing with the others in any span"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(d, col("doc_id"), col("text"),
        k = 4, w = 4, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet === Set((1L, 2L)))
    assert(pairs((1L, 2L)) >= 2)
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

  test("incremental near-dup = full union pass minus old x old pairs") {
    // docs 1-5 are the old corpus (1,2,5 mutually dup; 3 near-dups them);
    // the batch re-delivers doc 1 as 101 and adds one fresh doc
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog"),
      (102L, "fresh unseen material with no sibling anywhere")
    ).toDF("doc_id", "text")
    val inc = Dedup.incrementalNearDuplicates(docs, batch, col("doc_id"),
        col("text"), threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getBoolean(3), r.getBoolean(4))).toMap
    // its defining property: equal to the full pass over the union,
    // filtered to pairs touching the batch
    val full = Dedup.nearDuplicates(docs.unionByName(batch), col("doc_id"),
        col("text"), threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val wantKeys = full.keySet.filter { case (a, b) => a > 100L || b > 100L }
    assert(inc.keySet === wantKeys)
    assert(wantKeys.nonEmpty, "fixture produced no new-touching pairs")
    inc.foreach { case (k, (j, _, _)) => assert(j === full(k)) }
    // no old x old pair leaks through; side flags mark the batch member
    assert(inc.keySet.forall { case (a, b) => a > 100L || b > 100L })
    assert(inc((1L, 101L))._1 === 1.0)
    assert(inc((1L, 101L))._2 === false && inc((1L, 101L))._3 === true)
    assert(!inc.keySet.exists { case (a, b) => b == 102L || a == 102L },
      "the fresh doc must pair with nothing")
  }

  private val span12 =
    "one two three four five six seven eight nine ten eleven twelve"

  test("sharedSpans finds a planted 12-token span with exact bounds") {
    // exactly minSpanTokens long — the winnowing guarantee's edge case
    val corpus = Seq(
      (1L, s"aaa bbb ccc $span12 ddd eee"),
      (2L, s"xxx $span12 yyy zzz www qqq"),
      (3L, "totally unrelated filler words here only")
    ).toDF("doc_id", "text")
    val out = Dedup.sharedSpans(corpus, col("doc_id"), col("text"),
        minSpanTokens = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq((1L, 2L, 3L, 1L, 12L)))
  }

  test("sharedSpans merges a longer overlap into ONE maximal span") {
    val span15 = span12 + " thirteen fourteen fifteen"
    val corpus = Seq(
      (1L, s"aaa $span15 bbb"),
      (2L, s"$span15 ccc ddd")
    ).toDF("doc_id", "text")
    val out = Dedup.sharedSpans(corpus, col("doc_id"), col("text"),
        minSpanTokens = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq((1L, 2L, 1L, 0L, 15L)),
      "a 15-token overlap must emit one maximal span, not sub-spans")
  }

  test("sharedSpans reports two distinct spans on their own diagonals") {
    val spanB = "red orange yellow green blue indigo violet black " +
      "white gray pink brown" // 12 tokens, disjoint vocabulary
    val corpus = Seq(
      (1L, s"aaa $span12 bbb ccc $spanB ddd"),
      (2L, s"$spanB xxx yyy $span12 zzz")
    ).toDF("doc_id", "text")
    val out = Dedup.sharedSpans(corpus, col("doc_id"), col("text"),
        minSpanTokens = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // span12: doc1 pos 1, doc2 pos 14; spanB: doc1 pos 15, doc2 pos 0
    assert(out === Set((1L, 2L, 1L, 14L, 12L), (1L, 2L, 15L, 0L, 12L)))
  }

  test("sharedSpans drops overlaps shorter than minSpanTokens") {
    val short8 = "one two three four five six seven eight"
    val corpus = Seq(
      (1L, s"aaa bbb $short8 ccc"),
      (2L, s"$short8 ddd eee fff")
    ).toDF("doc_id", "text")
    val out = Dedup.sharedSpans(corpus, col("doc_id"), col("text"),
      minSpanTokens = 12)
    assert(out.count() === 0L)
  }

  test("selfRepeatedSpans finds the doc-internal double stamp with exact bounds") {
    val corpus = Seq(
      // span12 at 2 and at 17 (3 filler tokens between): one span pair
      (1L, s"aaa bbb $span12 fill gap pad $span12 zzz"),
      (2L, "totally clean prose with no internal repetition at all"),
      // degenerate repeat: 16 copies of one token — one maximal span per
      // qualifying shift (period p gives span 16-1-p >= 12 for p <= 4)
      (3L, ("w " * 16).trim)
    ).toDF("doc_id", "text")
    val out = Dedup.selfRepeatedSpans(corpus, col("doc_id"), col("text"), 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._3))
    assert(out.filter(_._1 == 2L).isEmpty, "clean doc emits nothing")
    assert(out.filter(_._1 == 1L).toSeq === Seq((1L, 2L, 17L, 12L)),
      "exact offsets of both occurrences")
    assert(out.filter(_._1 == 3L).toSeq === Seq((3L, 0L, 1L, 15L),
      (3L, 0L, 2L, 14L), (3L, 0L, 3L, 13L), (3L, 0L, 4L, 12L)),
      "one maximal span per alignment diagonal")
  }

  test("selfRepeatFraction: covered later-occurrence positions over doc length") {
    val corpus = Seq(
      (1L, s"aaa bbb $span12 fill gap pad $span12 zzz"),  // 30 tokens, 12 repeated
      (2L, "short clean doc")
    ).toDF("doc_id", "text")
    val spans = Dedup.selfRepeatedSpans(corpus, col("doc_id"), col("text"), 12)
    val got = Dedup.selfRepeatFraction(corpus, col("doc_id"), col("text"), spans)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got(1L) === ((30L, 12L, 0.4)))
    assert(got(2L) === ((3L, 0L, 0.0)), "every doc emits, clean fraction 0")
  }

  test("removeSpans cuts the higher-id copy only, keeps the lowest") {
    val corpus = Seq(
      (1L, s"aaa bbb ccc $span12 ddd eee"),
      (2L, s"xxx $span12 yyy zzz www qqq"),
      (3L, "totally unrelated filler words here only")
    ).toDF("doc_id", "text")
    val spans = Dedup.sharedSpans(corpus, col("doc_id"), col("text"), 12)
    val got = Dedup.removeSpans(corpus, col("doc_id"), col("text"), spans)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(1L) === ((s"aaa bbb ccc $span12 ddd eee", 0L)),
      "the lowest-id copy keeps its span")
    assert(got(2L) === (("xxx yyy zzz www qqq", 12L)),
      "the higher-id copy loses exactly the 12 span tokens")
    assert(got(3L) === (("totally unrelated filler words here only", 0L)))
  }

  test("removeSpans collapses overlapping span evidence before cutting") {
    // doc 3 shares the same region with docs 1 AND 2 at staggered offsets
    // (a 13-token overlap with doc 1, a 12-token suffix with doc 2): the
    // two intervals overlap inside doc 3 and must not double-remove
    val span13 = span12 + " thirteen"
    val corpus = Seq(
      (1L, s"$span13 aaa bbb"),
      (2L, s"${span12.split(" ").drop(1).mkString(" ")} thirteen pad0 pad1 " +
        "pad2 pad3 pad4 pad5 pad6 pad7 pad8 pad9 padA"),
      (3L, s"hhh $span13 ggg")
    ).toDF("doc_id", "text")
    val spans = Dedup.sharedSpans(corpus, col("doc_id"), col("text"), 12)
      .filter(col("doc_b") === 3L)
    val dropTotal = spans.collect().map(_.getLong(4)).sum
    val got = Dedup.removeSpans(corpus, col("doc_id"), col("text"), spans)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // evidence totals >= 13 interval slots but only 13 DISTINCT positions
    assert(dropTotal >= 13L)
    assert(got(3L) === (("hhh ggg", 13L)),
      "overlapping intervals collapse to distinct positions before the cut")
  }

  test("removeSpans on a fully-duplicated doc leaves an empty survivor row") {
    val corpus = Seq(
      (1L, span12),
      (2L, span12)
    ).toDF("doc_id", "text")
    val spans = Dedup.sharedSpans(corpus, col("doc_id"), col("text"), 12)
    val got = Dedup.removeSpans(corpus, col("doc_id"), col("text"), spans)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(1L) === ((span12, 0L)))
    assert(got(2L) === (("", 12L)), "a fully-removed doc still emits its row")
  }

  test("gramNovelty stays in [0,1] and ignores row order and partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val vocab = Vector.tabulate(30)(i => s"w$i")
    val docs = (0 until 60).map { i =>
      val base = Seq.fill(12)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      (i.toLong, if (i % 5 == 0) "shared tail alpha beta gamma delta epsilon zeta eta theta " + base else base)
    }
    val a = docs.toDF("doc_id", "text")
    val b = scala.util.Random.shuffle(docs).toDF("doc_id", "text").repartition(7)
    def canon(df: org.apache.spark.sql.DataFrame) =
      Dedup.gramNovelty(df, col("doc_id"), col("text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val ra = canon(a)
    assert(ra === canon(b), "novelty must be partitioning/order independent")
    ra.foreach { case (_, n, s, nov) =>
      assert(s <= n, "shared grams cannot exceed total grams")
      assert(nov >= 0.0 && nov <= 1.0, s"novelty out of range: $nov")
    }
  }

  test("crossSourceReport conserves the input pair count") {
    import spark.implicits._
    val pairs = (0 until 50).map(i => (i.toLong, (i + 100).toLong, 0.5 + (i % 5) / 10.0))
      .toDF("doc_a", "doc_b", "jaccard")
    val sources = (0 until 200).map(i => (i.toLong, s"s${i % 3}"))
      .toDF("doc_id", "source")
    val total = Dedup.crossSourceReport(pairs, sources)
      .agg(org.apache.spark.sql.functions.sum(col("dup_pairs"))).head().getLong(0)
    assert(total === 50L, "every input pair must land in exactly one report row")
  }

  test("gramNovelty separates cloned, partially-copied and unique docs") {
    import spark.implicits._
    val block = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    val docs = Seq(
      (1L, block),                          // fully cloned by doc 2
      (2L, block),
      (3L, s"$block unique tail of doc three entirely its own words here"),
      (4L, "completely different content with no overlap whatsoever at all"),
      (5L, "short")                         // < 8 tokens: no grams
    ).toDF("doc_id", "text")
    val got = Dedup.gramNovelty(docs, col("doc_id"), col("text"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((1L, 1L, 0.0)), "clone: zero novelty")
    assert(got(2L) === ((1L, 1L, 0.0)))
    // doc 3 shares exactly its first 8-gram (the block) with 1 and 2
    assert(got(3L)._2 === 1L && got(3L)._3 > 0.0 && got(3L)._3 < 1.0)
    assert(got(4L) === ((2L, 0L, 1.0)), "unique doc: full novelty")
    assert(got(5L) === ((0L, 0L, 1.0)), "gram-less doc still emits a row")
  }

  test("crossSharedSpans equals the filtered union chain, minus corpus-corpus work") {
    import spark.implicits._
    val leak = "one two three four five six seven eight nine ten eleven twelve"
    val dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    // corpus docs 100/101 share a NON-probe span with each other (must not
    // surface); 100 and 102 carry the probe span at different offsets
    val corpus = Seq(
      (100L, s"$dup and then $leak"),
      (101L, s"$dup trailing words here"),
      (102L, s"$leak leading this time"),
      (103L, "clean unrelated content with nothing shared anywhere at all")
    ).toDF("doc_id", "text")
    val probes = Seq((1L, leak)).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val cross = canon(Dedup.crossSharedSpans(probes, col("doc_id"), col("text"),
      corpus, col("doc_id"), col("text"), minSpanTokens = 12))
    val union = canon(Dedup.sharedSpans(
        probes.unionByName(corpus), col("doc_id"), col("text"), minSpanTokens = 12)
      .filter(col("doc_a") === 1L && col("doc_b") =!= 1L))
    assert(cross === union, "cross chain must equal the filtered union chain")
    assert(cross.map(_._2) === Set(100L, 102L), "only probe-overlapping docs")
    // orientation is structural: probe id needn't be the smallest
    val probesHi = Seq((999999L, leak)).toDF("doc_id", "text")
    val crossHi = Dedup.crossSharedSpans(probesHi, col("doc_id"), col("text"),
        corpus, col("doc_id"), col("text"), minSpanTokens = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(crossHi === Set((999999L, 100L), (999999L, 102L)),
      "probe stays doc_a even with the largest id")
  }

  test("surgical decontamination removes EVERY corpus copy of a probe span") {
    import spark.implicits._
    val leak = "one two three four five six seven eight nine ten eleven twelve"
    val corpus = Seq(
      (100L, s"intro words here $leak"),
      (101L, s"$leak trailing content words"),
      (102L, "entirely clean document with no benchmark overlap at all")
    ).toDF("doc_id", "text")
    val probes = Seq((1L, leak)).toDF("doc_id", "text")
    val got = graft.dedup.Decontaminate.surgical(corpus, col("doc_id"),
        col("text"), probes, col("doc_id"), col("text"), minSpanTokens = 12)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // BOTH copies excised (removeSpans over corpus-only pairs would keep
    // the lowest-id copy); the clean doc is untouched
    assert(got(100L) === (("intro words here", 12L)))
    assert(got(101L) === (("trailing content words", 12L)))
    assert(got(102L)._2 === 0L)
    // corpus-corpus duplication is NOT decontamination's job: two docs
    // sharing a non-probe span keep it
    val corpus2 = Seq(
      (100L, s"alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu shared"),
      (101L, s"alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu other")
    ).toDF("doc_id", "text")
    val got2 = graft.dedup.Decontaminate.surgical(corpus2, col("doc_id"),
        col("text"), probes, col("doc_id"), col("text"), minSpanTokens = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got2 === Map(100L -> 0L, 101L -> 0L))
  }

  test("mixtureShift reports per-source shares before and after dedup") {
    import spark.implicits._
    // web: 4 docs, 2 dropped; cur: 2 docs, none dropped -> web's share
    // falls from 4/6 to 2/4
    val docs = Seq(1L -> "web", 2L -> "web", 3L -> "web", 4L -> "web",
      5L -> "cur", 6L -> "cur").toDF("doc_id", "source")
    val kept = Seq(1L, 2L, 5L, 6L).toDF("doc_id")
    val got = Dedup.mixtureShift(docs, col("doc_id"), col("source"), kept)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("web") === ((4L, 2L, math.rint(4.0 / 6.0 * 1e6) / 1e6, 0.5)))
    assert(got("cur") === ((2L, 2L, math.rint(2.0 / 6.0 * 1e6) / 1e6, 0.5)))
  }

  test("crossSourceReport normalizes pair order and keeps within-source rows") {
    import spark.implicits._
    // hand-built pair frame: (1,2) crosses web->cur, (3,4) crosses
    // cur->web (MIRRORED source order — must land in the same row), and
    // (5,6) is within web
    val pairs = Seq(
      (1L, 2L, 0.9), (3L, 4L, 0.7), (5L, 6L, 0.5))
      .toDF("doc_a", "doc_b", "jaccard")
    val sources = Seq(
      1L -> "web", 2L -> "cur", 3L -> "cur", 4L -> "web",
      5L -> "web", 6L -> "web").toDF("doc_id", "source")
    val got = Dedup.crossSourceReport(pairs, sources)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map(
      ("cur", "web") -> ((2L, 0.8)), // both cross pairs, either direction
      ("web", "web") -> ((1L, 0.5))))
  }

  test("x104 recallAudit: perfect recall on clones, found never exceeds truth") {
    import spark.implicits._
    val clones = (1L to 5L).map(i => (i, "the quick brown fox jumps high"))
    val rest = Seq((6L, "completely different words entirely"),
      (7L, "another unrelated document body here"))
    val docs = (clones ++ rest).toDF("doc_id", "text").repartition(3)
    val got = Dedup.recallAudit(docs, col("doc_id"), col("text"),
        threshold = 0.3, sampleBuckets = graft.sampling.Sampling.Buckets)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // the 5 clones: 10 truth pairs at jaccard 1.0 (band 4), all bands'
    // found counts bounded by truth, clones fully recalled
    assert(got(4) === ((10L, 10L, 1.0)))
    got.values.foreach { case (t, f, r) =>
      assert(f <= t && r <= 1.0 && r >= 0.0)
    }
  }

  test("dedup-apply family carries no forced broadcast hints") {
    // the drop/cluster/weight frames are corpus FRACTIONS at web-scale
    // dup densities (30-50% of a crawl) — strategy must stay AQE's
    // runtime-sized choice, never a hard-coded hint (the greedySurvivors
    // discipline, extended to the whole apply family in round 10)
    import spark.implicits._
    val docs = Seq((1L, "s1", 10L), (2L, "s1", 20L), (3L, "s2", 30L))
      .toDF("doc_id", "source", "n_chars")
    val pairs = Seq((1L, 2L, 0.9)).toDF("doc_a", "doc_b", "jaccard")
    val plans = Seq(
      "survivors" -> Dedup.survivors(docs, col("doc_id"), pairs),
      "survivorsBy" -> Dedup.survivorsBy(docs, col("doc_id"),
        col("n_chars"), pairs),
      "softDedupWeights" -> Dedup.softDedupWeights(docs, col("doc_id"),
        col("source"), col("n_chars"), pairs),
      "crossSourceReport" -> Dedup.crossSourceReport(
        pairs, docs.select(col("doc_id"), col("source"))))
    plans.foreach { case (name, df) =>
      val hinted = df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }
      assert(hinted.isEmpty, s"$name must not force broadcast")
    }
  }

  test("x104 bucketsForTargetRows: ceiling division, clamps, fixed-row contract") {
    import graft.sampling.Sampling.Buckets
    // corpus at/below the target clamps to every bucket (whole corpus —
    // the small-fixture truth-pair-extinction guard)
    assert(Dedup.bucketsForTargetRows(1000L, 500L) === Buckets)
    assert(Dedup.bucketsForTargetRows(1000L, 1000L) === Buckets)
    // exact division and ceiling: 5000 docs -> 2000 buckets; 5001 -> still
    // ceil up (1999.6 -> 2000); 50000 -> 200
    assert(Dedup.bucketsForTargetRows(1000L, 5000L) === 2000)
    assert(Dedup.bucketsForTargetRows(1000L, 5001L) === 2000)
    assert(Dedup.bucketsForTargetRows(1000L, 50000L) === 200)
    // the fixed-row contract: buckets/Buckets · corpus stays within one
    // bucket's worth of the target as the corpus grows 10x, 100x, 1000x
    Seq(5000L, 50000L, 500000L, 5000000L).foreach { n =>
      val b = Dedup.bucketsForTargetRows(1000L, n)
      val expectedRows = b.toDouble / Buckets * n
      assert(expectedRows >= 1000.0 && expectedRows < 1000.0 + n.toDouble / Buckets,
        s"n=$n buckets=$b expects $expectedRows sampled rows")
    }
    // floor clamp: corpus so large one bucket oversamples — still >= 1
    assert(Dedup.bucketsForTargetRows(1L, Long.MaxValue / 20000) === 1)
  }

  test("x104 recallAuditAdaptive: small corpus samples everything (same as full audit)") {
    import spark.implicits._
    val clones = (1L to 5L).map(i => (i, "the quick brown fox jumps high"))
    val rest = Seq((6L, "completely different words entirely"),
      (7L, "another unrelated document body here"))
    val docs = (clones ++ rest).toDF("doc_id", "text").repartition(3)
    // 7 docs <= targetRows -> dial clamps to all buckets -> identical to
    // the exhaustive-sample audit
    val adaptive = Dedup.recallAuditAdaptive(docs, col("doc_id"), col("text"),
        threshold = 0.3, targetRows = 1000L)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(adaptive(4) === ((10L, 10L, 1.0)))
  }

  test("x98 sourceOverlap: exact pair Jaccard, disjoint pairs absent, df cap") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", "a b c"),   // 2-grams: {a b, b c}
      (2L, "s2", "a b x"),   // {a b, b x}
      (3L, "s3", "q r"))     // {q r} — disjoint from both
      .toDF("doc_id", "source", "text").repartition(2)
    val got = Dedup.sourceOverlap(docs, col("source"), col("text"), gramWidth = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map(("s1", "s2") -> ((1L, math.rint(1.0 / 3 * 1e6) / 1e6))))
    // a gram present in more sources than maxDf is excluded from pairing
    // AND from the set sizes: once "a b" reaches 3 sources under maxDf=2
    // it dies, and no shared grams remain at all
    val three = docs.union(Seq((4L, "s3", "a b z")).toDF("doc_id", "source", "text"))
    val capped = Dedup.sourceOverlap(three, col("source"), col("text"),
      gramWidth = 2, maxDf = 2)
    assert(capped.count() === 0L)
  }

  test("x100 sourceOverlapEstimate: identical sources 1.0, disjoint 0.0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", "alpha beta gamma delta"),
      (2L, "s2", "alpha beta gamma delta"), // clone of s1's gram set
      (3L, "s3", "zz yy xx ww vv uu"))      // disjoint grams
      .toDF("doc_id", "source", "text").repartition(2)
    val got = Dedup.sourceOverlapEstimate(docs, col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getInt(2), r.getDouble(3)))).toMap
    assert(got(("s1", "s2")) === ((8, 1.0)))
    assert(got(("s1", "s3")) === ((0, 0.0)))
    assert(got(("s2", "s3")) === ((0, 0.0)))
  }

  test("x94 survivorsBy keeps the best-scoring cluster member, min id on ties") {
    import spark.implicits._
    // cluster {1,2,3} via chain; {5,6} tie on score → min id 5 wins
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val docs = Seq(
      (1L, 100L), (2L, 900L), (3L, 300L), // 2 is longest → kept
      (4L, 10L),                          // unpaired → kept
      (5L, 70L), (6L, 70L)                // tie → 5 kept
    ).toDF("doc_id", "n_chars").repartition(3)
    val kept = Dedup.survivorsBy(docs, col("doc_id"), col("n_chars"), pairs)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 4L, 5L))
    // contrast: the min-id rule would have kept 1, not 2
    val minId = Dedup.survivors(docs, col("doc_id"), pairs)
      .collect().map(_.getLong(0)).toSet
    assert(minId === Set(1L, 4L, 5L))
  }

  test("x86 softDedupWeights: cluster members weigh 1/size, unpaired docs weigh 1") {
    import spark.implicits._
    // pairs chain 1-2-3 into one cluster (transitively, no 1-3 pair);
    // doc 4 and 5 are unpaired
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val docs = Seq(
      (1L, "web", 100L), (2L, "web", 200L), (3L, "cur", 300L),
      (4L, "web", 50L), (5L, "cur", 60L)
    ).toDF("doc_id", "source", "n_chars").repartition(3)
    val got = Dedup.softDedupWeights(docs, col("doc_id"), col("source"),
        col("n_chars"), pairs)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))).toMap
    val w3 = math.rint(1e6 / 3.0) // micro-unit weight for a 3-cluster
    // web: docs 1,2 at w3 each + doc 4 at weight 1
    assert(got("web") === ((3L,
      math.rint(w3 * 2 + 1e6) / 1e6, 350L,
      math.rint(100 * w3 + 200 * w3 + 50 * 1e6) / 1e6)))
    // cur: doc 3 at w3 + doc 5 at weight 1
    assert(got("cur") === ((2L,
      math.rint(w3 + 1e6) / 1e6, 360L,
      math.rint(300 * w3 + 60 * 1e6) / 1e6)))
  }

  test("x136 containmentPairs: embedded short doc flagged, boilerplate gram capped") {
    val cdocs = (Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "totally different words entirely here now")
    ) ++ (10L to 15L).map(i => (i, s"zz yy u$i v$i"))).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(cdocs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // doc 1's 4 bigrams all appear in doc 2 (9 bigrams): contain_a = 1,
    // contain_b = jaccard = 4/9; doc 3 shares nothing; docs 10-15 share
    // ONLY "zz yy" (df 6 > maxDf 5) so the boilerplate block pairs nobody
    assert(got.keySet === Set((1L, 2L)))
    val (ca, cb, j) = got((1L, 2L))
    assert(ca === 1.0 && cb === 0.444444 && j === 0.444444)
    // the same pair is invisible to the symmetric near-dup tier at its
    // default 0.7 threshold -- the gap this operator exists to close
    assert(Dedup.nearDuplicates(cdocs, col("doc_id"), col("text")).isEmpty)
  }

  test("x168 bBitEstimate: estimator closed form, exact dups estimate 1") {
    val got = Dedup.bBitEstimate(docs, col("doc_id"), col("text"),
        hexChars = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // docs 1/2/5 are exact dups: identical signatures land in one band,
    // so all three pairs MUST be candidates (doc_a < doc_b), with m = 1
    // and the estimator mapping M = 1 to exactly 1 regardless of b.
    // (Keyed (doc_a, doc_b): an earlier revision keyed (doc_b, doc_a),
    // which made this loop's contains-guard vacuously skip every pair.)
    for (pair <- Seq((1L, 2L), (1L, 5L), (2L, 5L))) {
      assert(got.contains(pair), s"exact-dup pair $pair missing")
      val (je, m, jb) = got(pair)
      assert(je === 1.0 && m === 1.0 && jb === 1.0)
    }
    assert(got.nonEmpty)
    // every row satisfies the closed form j_bbit = (m − 1/16)/(15/16)
    got.values.foreach { case (_, m, jb) =>
      assert(jb === math.rint((m - 0.0625) / 0.9375 * 1e6) / 1e6)
    }
  }

  test("x178 ophSignatures: dense densified slots; exact dups estimate 1") {
    val sigs = Dedup.ophSignatures(docs, col("doc_id"), col("text"),
        bins = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    // densification fills every slot: 16 entries, none null (each doc has
    // at least one non-empty bin to borrow from)
    sigs.values.foreach { s =>
      assert(s.length === 16 && !s.contains(null))
    }
    // exact dups share the gram set → identical full signatures
    assert(sigs(1L) === sigs(2L) && sigs(1L) === sigs(5L))
    // hand-check the construction for doc 4: bin minima of the md5-derived
    // 32-bit gram hashes, then clockwise borrowing
    val grams4 = "completely different content about spark engines"
      .split("\\s+").sliding(2).map(_.mkString(" ")).toSeq.distinct
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(("oph" + s).getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 8), 16)
    }
    val binMin = grams4.map(h32).groupBy(_ % 16).map { case (b, vs) =>
      b -> vs.min }
    val want = (0 until 16).map { s =>
      (0 until 16).iterator.map(j => binMin.get((s + j) % 16))
        .collectFirst { case Some(v) => v }.get
    }
    assert(sigs(4L).map(_.asInstanceOf[Long]) === want)
    // estimate face: exact dups read 1.0; every estimate is k/16
    val est = Dedup.ophEstimate(docs, col("doc_id"), col("text"), bins = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    for (pair <- Seq((1L, 2L), (1L, 5L), (2L, 5L))) {
      assert(est.contains(pair), s"exact-dup pair $pair missing")
      assert(est(pair) === ((1.0, 1.0)))
    }
    est.values.foreach { case (_, jo) =>
      // estimates quantize to k/16 exactly
      assert(math.abs(jo * 16 - math.rint(jo * 16)) < 1e-9)
      assert(jo >= 0.0 && jo <= 1.0)
    }
  }

  test("x159 lshPlanner: collision-curve integral matches the closed form") {
    // hand sweep histogram: 100 low-sim pairs at bucket .2, 10 high at .9
    val sweep = Seq((0.2, 100L, 110L), (0.9, 10L, 10L))
      .toDF("threshold", "n_pairs", "n_at_or_above")
    def p(t: Double, r: Int, b: Int) =
      1.0 - math.pow(1.0 - math.pow(t + 0.025, r), b)
    def r6(d: Double) = math.rint(d * 1e6) / 1e6
    val got = Dedup.lshPlanner(sweep, Seq((1, 1), (4, 2)))
      .collect().map(x => (x.getInt(0), x.getInt(1)) ->
        ((x.getDouble(2), x.getDouble(3)))).toMap
    // (1,1): p = t+.025 itself → expected = 100·.225 + 10·.925
    assert(got((1, 1)) ===
      ((r6(100 * p(0.2, 1, 1) + 10 * p(0.9, 1, 1)), r6(p(0.9, 1, 1)))))
    // (4,2): recall_high is the high-bucket curve value alone
    assert(got((4, 2)) ===
      ((r6(100 * p(0.2, 2, 4) + 10 * p(0.9, 2, 4)), r6(p(0.9, 2, 4)))))
    // more bands at the same r strictly raise both columns
    assert(got((4, 2))._1 > got((1, 1))._1 * 0 &&
      got((4, 2))._2 > p(0.9, 2, 1) - 1e-9)
    // a corpus with no high-sim mass has nothing to recall: null
    val lowOnly = Dedup.lshPlanner(
      Seq((0.2, 100L, 100L)).toDF("threshold", "n_pairs", "n_at_or_above"),
      Seq((4, 2))).head()
    assert(lowOnly.isNullAt(3))
  }

  test("x148 prefixJaccardJoin: equals brute force, threshold edge inclusive") {
    // independent brute-force reference over distinct word 3-grams
    def grams(t: String): Set[String] = {
      val w = t.toLowerCase.trim.split("\\s+", -1)
      if (w.length < 3) Set.empty
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    def jac(a: Set[String], b: Set[String]): Double = {
      val i = (a & b).size.toDouble
      val u = math.max(a.size + b.size - i, 1.0)
      math.rint(i / u * 1e6) / 1e6
    }
    // families of rotated/substituted variants so pairs land above, below,
    // and EXACTLY AT the threshold; docs 30/31 share half their grams
    // (jaccard exactly 0.5 with 6-gram sets); 40 is sub-shingle-width
    val pdocs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),     // high overlap
      (3L, "alpha beta gamma delta epsilon zeta eta theta"),    // exact dup of 1
      (10L, "one two three four five six seven eight nine ten"),
      (11L, "one two three four five XX seven eight nine ten"), // mid substitution
      (30L, "p q r s t u v w"),                                 // 6 grams
      (31L, "s t u v w x y z"),                                 // shares grams on s..w
      (40L, "tiny doc"),                                        // no 3-grams
      (50L, "unrelated content speaks of entirely other matters today")
    ).toDF("doc_id", "text")
    val thr = 0.2 // low threshold = worst case for prefix pruning
    val ref = (for {
      (a, ta) <- pdocs.collect().map(r => (r.getLong(0), r.getString(1)))
      (b, tb) <- pdocs.collect().map(r => (r.getLong(0), r.getString(1)))
      if a < b
      j = jac(grams(ta), grams(tb))
      if j >= thr
    } yield (a, b) -> j).toMap
    val got = Dedup.prefixJaccardJoin(pdocs, col("doc_id"), col("text"),
        threshold = thr, gramWidth = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got === ref)
    // the fixture is non-trivial: it has >= 3 qualifying pairs including
    // one that only just clears the threshold
    assert(ref.size >= 3 && ref.values.exists(_ < 0.4))
    // threshold-edge inclusivity: a pair at exactly j = t is returned
    val j3031 = jac(grams("p q r s t u v w"), grams("s t u v w x y z"))
    val gotEdge = Dedup.prefixJaccardJoin(pdocs, col("doc_id"), col("text"),
        threshold = j3031, gramWidth = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotEdge.contains((30L, 31L)))
  }

  test("x216 stitchCandidates pairs a page with its continuation, " +
      "ignores short docs, and verifies past hash collisions") {
    import spark.implicits._
    val seam = (1 to 8).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 a4 a5 a6 a7 a8 $seam"),            // page 1: ends in seam
      (2L, s"$seam b1 b2 b3 b4 b5 b6 b7 b8"),            // page 2: starts with seam
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12 c13 c14 c15 c16"),
      (4L, s"$seam")                                     // 8 tokens < 2g: excluded
    ).toDF("doc_id", "text")
    val got = Dedup.stitchCandidates(docs, col("doc_id"), col("text"),
        g = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)))
  }

  test("x216 stitchCandidates drops a boilerplate boundary bucket at " +
      "the cap") {
    import spark.implicits._
    val footer = (1 to 8).map(i => s"f$i").mkString(" ")
    // 5 docs end with the same footer, 5 start with it: 25 pairs uncapped
    val docs = ((1L to 5L).map(i => (i, s"x$i y$i z$i w$i v$i u$i t$i s$i $footer")) ++
      (11L to 15L).map(i => (i, s"$footer p$i q$i r$i s$i t$i u$i v$i w$i")))
      .toDF("doc_id", "text")
    val uncapped = Dedup.stitchCandidates(docs, col("doc_id"),
      col("text"), g = 8, maxBucket = 1000).count()
    val capped = Dedup.stitchCandidates(docs, col("doc_id"),
      col("text"), g = 8, maxBucket = 4).count()
    assert(uncapped === 25L)
    assert(capped === 0L, "a bucket over the cap must drop whole")
  }

  test("x209 normalizationLadder attributes each dup to the rung that " +
      "first collapses it; the ladder is monotone") {
    import spark.implicits._
    val docs = Seq(
      "Alpha beta gamma",   // base
      "Alpha beta gamma",   // raw dup           -> rung 0
      "ALPHA BETA GAMMA",   // case variant      -> rung 1
      "alpha  beta\tgamma", // whitespace variant-> rung 2
      "alpha beta, gamma!", // punct variant     -> rung 3
      "different text"      // unrelated
    ).toDF("text")
    val got = Dedup.normalizationLadder(docs, col("text"))
      .collect().map(r => r.getInt(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getDouble(6)))).toMap
    // 6 docs; distinct: raw 5, casefold 4, whitespace 3, alnum 2
    assert(got(0) === (("raw", 6L, 5L, 1L, 1L, 0.166667)))
    assert(got(1) === (("casefold", 6L, 4L, 2L, 1L, 0.333333)))
    assert(got(2) === (("whitespace", 6L, 3L, 3L, 1L, 0.5)))
    assert(got(3) === (("alnum", 6L, 2L, 4L, 1L, 0.666667)))
    // monotone: each rung's distinct count never exceeds the previous
    val ds = (0 to 3).map(i => got(i)._3)
    assert(ds === ds.sorted.reverse)
  }
}
