package graft

import org.apache.spark.sql.functions._

import graft.text.TfIdf

/** TF-IDF and vocabulary stats on a corpus small enough to check by hand. */
class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  // "apple" is unique to doc 1, "banana" to doc 2, "the" is everywhere
  private val docs = Seq(
    (1L, "the apple the apple the"),
    (2L, "the banana the"),
    (3L, "the cherry date")).toDF("doc_id", "text")

  test("tfidfTopK ranks document-specific terms above ubiquitous ones") {
    val top = TfIdf.tfidfTopK(docs, col("doc_id"), col("text"), k = 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("term")).toMap
    assert(top === Map(1L -> "apple", 2L -> "banana", 3L -> "cherry"))
    // "the" occurs in every doc: idf = ln(1) = 0, so its tfidf is exactly 0
    val theRows = TfIdf.tfidfTopK(docs, col("doc_id"), col("text"), k = 10)
      .filter(col("term") === "the").select("tfidf").as[Double].collect()
    assert(theRows.nonEmpty && theRows.forall(_ === 0.0))
    // ties at equal tfidf break by term order: doc 3 has cherry/date both 1x
    val d3 = TfIdf.tfidfTopK(docs, col("doc_id"), col("text"), k = 10)
      .filter(col("doc_id") === 3L).orderBy(col("rank"))
      .select("term").as[String].collect().toSeq
    assert(d3 === Seq("cherry", "date", "the"))
  }

  test("tfidf value matches the closed form") {
    val r = TfIdf.tfidfTopK(docs, col("doc_id"), col("text"), k = 1)
      .filter(col("doc_id") === 2L).head()
    // tf = 1/3, idf = ln(3/1)
    val expected = math.rint((1.0 / 3.0) * math.log(3.0) * 1e6) / 1e6
    assert(r.getAs[Double]("tfidf") === expected)
  }

  test("vocabStats counts occurrences and doc frequency, top-k ordered") {
    val v = TfIdf.vocabStats(docs, col("doc_id"), col("text"), topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(v === Seq(("the", 6L, 3L), ("apple", 2L, 1L)))
  }

  test("unigramSurprise scores rare-token docs above common-token docs") {
    val corpus = Seq(
      (1L, "common common common common"),
      (2L, "common common common rareword")).toDF("doc_id", "text")
    val out = TfIdf.unigramSurprise(corpus, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(2L) > out(1L))
    // doc 1 is all "common" (7 of 8 corpus tokens): surprise = -ln(7/8)
    val expected = math.rint(-math.log(7.0 / 8.0) * 1e6) / 1e6
    assert(out(1L) === expected)
  }

  test("bigramSurprise matches the closed form; 1-token docs drop out") {
    // tokens [a,b,a,b] + [a,c] + [z]: uni a=3 b=2 c=1 z=1 (total 7);
    // bigrams d1: (a,b)x2 (b,a); d2: (a,c); histories a=3, b=1
    val df = Seq((1L, "a b a b"), (2L, "a c"), (3L, "z"))
      .toDF("doc_id", "text")
    val got = graft.text.TfIdf.bigramSurprise(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    def p(bc: Double, hc: Double, uc: Double) =
      0.75 * (bc / hc) + 0.25 * (uc / 7.0)
    def r6(d: Double) = math.rint(d * 1e6) / 1e6
    val d1 = r6((-math.log(p(2, 3, 2)) + -math.log(p(1, 1, 3)) +
      -math.log(p(2, 3, 2))) / 3.0)
    val d2 = r6(-math.log(p(1, 3, 1)))
    assert(got.keySet === Set(1L, 2L), "the 1-token doc has no bigrams")
    assert(math.abs(got(1L)._1 - d1) < 1e-6 && got(1L)._2 === 3L)
    assert(math.abs(got(2L)._1 - d2) < 1e-6 && got(2L)._2 === 1L)
  }

  test("bigramSurprise ranks shuffled word order above repeated phrasing") {
    // same unigram bag, different order: the unigram gate cannot separate
    // them, the bigram gate must
    val repetitive = Seq.fill(12)("the quick brown fox").mkString(" ")
    val shuffled = "fox the brown quick the fox quick brown " +
      Seq.fill(10)("quick the fox brown the quick fox brown").mkString(" ")
    val df = Seq((1L, repetitive), (2L, shuffled)).toDF("doc_id", "text")
    val s = graft.text.TfIdf.bigramSurprise(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(2L) > s(1L),
      s"shuffled order must surprise a bigram LM more: $s")
  }

  test("pmiCollocations: fixed phrases beat chance pairs, closed form holds") {
    // "new york" always co-occurs; "the" pairs promiscuously
    val df = Seq(
      (1L, "new york is big the city the place"),
      (2L, "new york was the start the end"),
      (3L, "the city saw new york")).toDF("doc_id", "text")
    val out = graft.text.TfIdf.pmiCollocations(df, col("doc_id"), col("text"),
        minCount = 2, topK = 10)
      .collect().map(r => (r.getString(1), r.getString(0)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // hand form: tokens total 20 (8+7+5), "new"=3, "york"=3, bigrams
    // total 17 (7+6+4), (new,york)=3 -> pmi = ln((3/17) / ((3/20)*(3/20)))
    val want = math.rint(math.log((3.0 / 17.0) / ((3.0 / 20.0) * (3.0 / 20.0))) * 1e6) / 1e6
    val ny = out(("york", "new"))
    assert(ny._1 === 3L && math.abs(ny._2 - want) < 1e-6, out.toString)
    // the ubiquitous "the" never outranks the fixed phrase
    assert(out.keys.forall { case (c, p) => !(p == "the" && out((c, p))._2 > ny._2) })
  }

  test("kneserNeySurprise matches the closed form; context mass sums to 1") {
    // bigrams: (a,b)x2, (c,b), (a,d) -> bf {ab:2, cb:1, ad:1}
    // hist a: hc=3 n1p=2; c: hc=1 n1p=1 | cont b: 2, d: 1 | types = 3
    // p(b|a) = 1.25/3 + 0.75*(2/3)*(2/3) = 0.75
    // p(b|c) = 0.25   + 0.75*1*(2/3)    = 0.75
    // p(d|a) = 0.25/3 + 0.75*(2/3)*(1/3) = 0.25  (so p(.|a) sums to 1)
    val corpus = Seq((1L, "a b"), (2L, "a b"), (3L, "c b"), (4L, "a d"))
      .toDF("doc_id", "text")
    val out = TfIdf.kneserNeySurprise(corpus, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(out(1L) === ((math.rint(-math.log(0.75) * 1e6) / 1e6, 1L)))
    assert(out(3L) === out(1L), "same probability, different context route")
    assert(out(4L) === ((math.rint(-math.log(0.25) * 1e6) / 1e6, 1L)))
  }

  test("kneserNey beats raw-frequency back-off on the san-francisco case") {
    // "f" is frequent (follows only "s"); "q" is rarer but follows many
    // contexts. In a FRESH context, KN must prefer q over f, while x52's
    // raw-frequency interpolation prefers f.
    val corpus = (1 to 8).map(i => (i.toLong, "s f")) ++
      Seq((9L, "a q"), (10L, "b q"), (11L, "c q"), (12L, "d q"),
        (13L, "e q"), (14L, "x f"), (15L, "x q"))
    val df = corpus.toDF("doc_id", "text")
    val kn = TfIdf.kneserNeySurprise(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val raw = TfIdf.bigramSurprise(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // docs 14/15 share the fresh context "x": KN scores (x,q) as LESS
    // surprising than (x,f); raw-frequency interpolation says the opposite
    assert(kn(15L) < kn(14L), s"KN: q should beat f in a fresh context ($kn)")
    assert(raw(14L) < raw(15L), s"raw back-off prefers the frequent f ($raw)")
  }

  test("x87 tokenEntropy: degenerate repetition scores 0, uniform scores ln(n)") {
    val df = Seq(
      (1L, "a a a a"),        // one type: H = 0, TTR = 0.25
      (2L, "a b c d"),        // uniform over 4: H = ln 4, norm = 1
      (3L, "a a b b b c")     // p = (2/6, 3/6, 1/6)
    ).toDF("doc_id", "text").repartition(3)
    val out = TfIdf.tokenEntropy(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(out(1L) === ((4, 1L, 0.0, 0.0, 0.25)))
    assert(out(2L)._3 === math.rint(math.log(4.0) * 1e6) / 1e6)
    assert(out(2L)._4 === 1.0 && out(2L)._5 === 1.0)
    val h3 = -(2.0 / 6 * math.log(2.0 / 6) + 3.0 / 6 * math.log(3.0 / 6) +
      1.0 / 6 * math.log(1.0 / 6))
    assert(math.abs(out(3L)._3 - h3) < 1e-6)
    assert(math.abs(out(3L)._4 - h3 / math.log(3.0)) < 1e-6)
  }

  test("x92 sourceDivergence: hand-computed KL against the pooled corpus") {
    val df = Seq(
      (1L, "s1", "a a b"),
      (2L, "s2", "b c")
    ).toDF("doc_id", "source", "text").repartition(2)
    val got = TfIdf.sourceDivergence(df, col("source"), col("text"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // corpus: a:2 b:2 c:1 of 5
    val kl1 = 2.0 / 3 * math.log((2.0 / 3) / (2.0 / 5)) +
      1.0 / 3 * math.log((1.0 / 3) / (2.0 / 5))
    val kl2 = 0.5 * math.log(0.5 / (2.0 / 5)) + 0.5 * math.log(0.5 / (1.0 / 5))
    assert(got("s1")._1 === 3L && math.abs(got("s1")._2 - kl1) < 1e-6)
    assert(got("s2")._1 === 2L && math.abs(got("s2")._2 - kl2) < 1e-6)
    // a source identical to the corpus distribution diverges by 0
    val same = Seq((1L, "x", "a b"), (2L, "y", "a b"))
      .toDF("doc_id", "source", "text")
    val zero = TfIdf.sourceDivergence(same, col("source"), col("text"))
      .collect().map(_.getDouble(2))
    assert(zero.forall(_ === 0.0))
  }

  test("x101 heldoutSurprise: eval docs scored under train-only Laplace counts") {
    import graft.sampling.Sampling
    // each doc: one shared token + one doc-unique token → every eval
    // doc's unique token is OOV by construction
    val docs = (1 to 40).map(i => (i.toLong, s"common uniq$i"))
      .toDF("doc_id", "text").repartition(3)
    val buckets = docs
      .select(col("doc_id"), Sampling.hashBucket(col("doc_id"), "heldout").as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trainIds = buckets.filter(_._2 < 8000).keys.toSet
    val evalIds = buckets.keys.toSet -- trainIds
    assume(trainIds.nonEmpty && evalIds.nonEmpty)
    val out = TfIdf.heldoutSurprise(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.keySet === evalIds, "only eval-split docs are scored")
    // expected: train counts = {common -> |train|, uniq_i -> 1 each};
    // total = 2|train|, V = |train|+1
    val t = trainIds.size.toLong
    val total = 2 * t
    val v = t + 1
    val pCommon = (t + 1).toDouble / (total + v).toDouble
    val pOov = 1.0 / (total + v).toDouble
    val expected = math.rint(
      -(math.log(pCommon) + math.log(pOov)) / 2.0 * 1e6) / 1e6
    out.values.foreach { case (s, nTok, nOov) =>
      assert(nTok === 2L && nOov === 1L)
      assert(math.abs(s - expected) < 1e-6, s"$s vs $expected")
    }
  }

  test("x99 signaturePhrases: top bigrams per source, count then lexicographic") {
    val df = Seq(
      (1L, "s1", "buy now buy now buy now"),
      (2L, "s1", "one two"),
      (3L, "s2", "alpha beta"))
      .toDF("doc_id", "source", "text").repartition(2)
    val got = TfIdf.signaturePhrases(df, col("source"), col("text"), k = 2)
      .collect().map(r => (r.getString(0), r.getInt(3)) ->
        ((r.getString(1), r.getLong(2)))).toMap
    // s1 bigrams: "buy now"×3, "now buy"×2, "one two"×1
    assert(got(("s1", 1)) === (("buy now", 3L)))
    assert(got(("s1", 2)) === (("now buy", 2L)))
    assert(got(("s2", 1)) === (("alpha beta", 1L)))
  }

  test("x93 ngramDiversity: template collapse shows in bigrams, not unigrams") {
    val df = Seq(
      // tmpl: every doc is the same 3-token template → 4 distinct unigram
      // types but only 2 distinct bigrams out of 6
      (1L, "tmpl", "buy cheap pills"), (2L, "tmpl", "buy cheap pills"),
      (3L, "tmpl", "buy cheap now"),
      // nat: all-distinct bigrams
      (4L, "nat", "the quick brown fox"),
      // single-token source: bigram diversity undefined
      (5L, "solo", "hello")
    ).toDF("doc_id", "source", "text").repartition(3)
    val got = TfIdf.ngramDiversity(df, col("source"), col("text"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5),
          Option(r.get(6)).map(_.asInstanceOf[Double])))).toMap
    // tmpl unigrams: buy, cheap, pills, now → 4/9; bigrams: buy·cheap ×3,
    // cheap·pills ×2, cheap·now → 3 distinct of 6
    assert(got("tmpl") === ((9L, 4L, math.rint(4.0 / 9 * 1e6) / 1e6, 6L, 3L,
      Some(0.5))))
    assert(got("nat") === ((4L, 4L, 1.0, 3L, 3L, Some(1.0))))
    assert(got("solo") === ((1L, 1L, 1.0, 0L, 0L, None)))
  }

  test("zipfSlope: exact fit on a constructed power law, per group") {
    // source a: freqs 8, 4, 2, 1 at ranks 1..4 → ln f = ln 8 − ln 2·ln r /
    // ... NOT linear in ln r; instead build f = round of c·r^s for an
    // EXACT log-log line: f(r) = 64/r² → (1,64) (2,16) (3,?) not integer.
    // Use ranks {1, 2, 4, 8} by making freqs 64, 16, 4, 1 with ties
    // impossible: ln f = ln 64 − 2·ln r exactly at r ∈ {1,2,4}… r must be
    // the ROW rank 1..4, so pick freqs 27, 9, 3, 1: points (ln1,ln27),
    // (ln2,ln9), (ln3,ln3), (ln4,ln1) — not collinear; just assert
    // against an independently-computed OLS on those exact points.
    val words = Seq("w1" -> 27, "w2" -> 9, "w3" -> 3, "w4" -> 1)
    val text = words.flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
    val df = Seq(("a", text), ("b", "x x x y")).toDF("source", "text")
    val got = graft.text.TfIdf.zipfSlope(df, col("source"), col("text"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val xs = (1 to 4).map(r => math.log(r.toDouble))
    val ys = Seq(27, 9, 3, 1).map(f => math.log(f.toDouble))
    val (mx, my) = (xs.sum / 4, ys.sum / 4)
    val slope = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
      xs.map(x => (x - mx) * (x - mx)).sum
    val icpt = my - slope * mx
    assert(got("a")._1 === 4L)
    assert(math.abs(got("a")._2 - math.rint(slope * 1e6) / 1e6) < 2e-6)
    assert(math.abs(got("a")._3 - math.rint(icpt * 1e6) / 1e6) < 2e-6)
    // source b: x×3 at rank 1, y×1 at rank 2 → slope = (ln1−ln3)/(ln2−ln1)
    assert(math.abs(got("b")._2 -
      math.rint(-math.log(3.0) / math.log(2.0) * 1e6) / 1e6) < 2e-6)
  }

  test("vocabStats plans TakeOrderedAndProject, not a global sort") {
    val plan = TfIdf.vocabStats(docs, col("doc_id"), col("text"), topK = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("x149 heapsFit: saturated corpus fits beta 0, all-new vocab fits 1") {
    // 128 identical docs: all types mint in the first bucket, cum_types is
    // constant → slope exactly 0 (and logK = ln 3)
    val sat = (1L to 128L).map(i => (i, "tok_a tok_b tok_c"))
      .toDF("doc_id", "text")
    val s = graft.text.TfIdf.heapsFit(sat, col("doc_id"), col("text"), 64)
      .head()
    assert(s.getLong(0) === 64L)
    assert(s.getDouble(1) === 0.0)
    assert(s.getDouble(2) === math.rint(math.log(3.0) * 1e6) / 1e6)
    // 128 docs of 2 globally-unique tokens each: V(n) = n exactly →
    // ln V = ln n, slope 1, intercept 0
    val fresh = (1L to 128L).map(i => (i, s"u${i}a u${i}b"))
      .toDF("doc_id", "text")
    val f = graft.text.TfIdf.heapsFit(fresh, col("doc_id"), col("text"), 64)
      .head()
    assert(f.getLong(0) === 64L)
    assert(f.getDouble(1) === 1.0 && f.getDouble(2) === 0.0)
  }

  test("x161 hillTailIndex: closed form on constructed order statistics") {
    // source a frequencies: w1×16, w2×8, w3×8, w4×4 (+tail) — at k=3:
    // H = (ln(16/4) + ln(8/4) + ln(8/4))/3 = 4·ln2/3, α = 3/(4·ln2)
    val text = Seq.fill(16)("w1") ++ Seq.fill(8)("w2") ++ Seq.fill(8)("w3") ++
      Seq.fill(4)("w4")
    val df = Seq(("a", text.mkString(" ")), ("b", "only two words"))
      .toDF("source", "text")
    val got = graft.text.TfIdf.hillTailIndex(df, col("source"), col("text"),
        k = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    def r6(d: Double) = math.rint(d * 1e6) / 1e6
    val h = 4.0 * math.log(2.0) / 3.0
    assert(got("a") === ((3L, r6(h), r6(1.0 / h))))
    // source b has only 3 distinct terms < k+1: no (k+1)-th statistic, no row
    assert(!got.contains("b"))
    // a flat head (top k+1 frequencies equal) has H = 0 → null alpha
    val flat = Seq(("f", "x x y y z z q q")).toDF("source", "text")
    val fr = graft.text.TfIdf.hillTailIndex(flat, col("source"),
      col("text"), k = 3).head()
    assert(fr.getDouble(2) === 0.0 && fr.isNullAt(3))
  }

  test("x152 chiSqTokens: 2x2 closed form, perfect separators on top") {
    val d = Seq(
      (1L, "apple banana", true), (2L, "apple cherry", true),
      (3L, "dog banana", false), (4L, "dog elephant", false)
    ).toDF("doc_id", "text", "cls")
    val got = graft.text.TfIdf.chiSqTokens(d, col("doc_id"), col("text"),
        col("cls"), topK = 3, minDf = 1L)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getLong(3)))
    // apple/dog are perfect separators: chi2 = N = 4; tie breaks on term;
    // cherry: 4·(1·2−1·0)²/(2·2·1·3) = 16/12
    assert(got(0) === (("apple", 4.0, 2L, 0L)))
    assert(got(1) === (("dog", 4.0, 0L, 2L)))
    assert(got(2) === (("cherry", 1.333333, 1L, 0L)))
    // banana appears once per class: zero association, never outranks
    // cherry; and minDf prunes: at minDf = 3 only banana+... survive df>=3?
    // none do (max df is 2) → empty frame, no crash
    assert(graft.text.TfIdf.chiSqTokens(d, col("doc_id"), col("text"),
      col("cls"), topK = 3, minDf = 3L).isEmpty)
  }

  test("x181 vocabCoverage: boundary-class arithmetic, clamp at vocab size") {
    import spark.implicits._
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // a×5, b×3, c×3, d×1 → classes (c=5,m=1), (c=3,m=2), (c=1,m=1);
    // 12 occurrences, 4 terms
    val df = Seq("a a a a a b b b c c c d").toDF("text")
    val got = graft.text.TfIdf.vocabCoverage(df, col("text"),
        ks = Seq(1L, 2L, 3L, 10L))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) === ((1L, r6(5.0 / 12)))) // top term alone
    // k=2 lands INSIDE the tied c=3 class: 5 + 1·3 of 12 — exact without
    // naming which of b/c is "second"
    assert(got(2L) === ((2L, r6(8.0 / 12))))
    assert(got(3L) === ((3L, r6(11.0 / 12))))
    assert(got(10L) === ((4L, 1.0))) // clamped to the 4-term vocabulary
  }

  test("x189 negativeSamplingTable: 3/4-power boost for rare tokens, " +
      "probabilities sum to 1") {
    import spark.implicits._
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // a×4, b×1: s(a) = √(4·√4) = 4^0.75, s(b) = 1
    val df = Seq("a a a a b").toDF("text")
    val got = graft.text.TfIdf.negativeSamplingTable(df, col("text"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val sa = math.sqrt(4.0 * math.sqrt(4.0))
    val z = sa + 1.0
    assert(got("a") === ((4L, 0.8, r6(sa / z), r6((sa / z) / 0.8))))
    assert(got("b") === ((1L, 0.2, r6(1.0 / z), r6((1.0 / z) / 0.2))))
    // smoothing damps the head (boost < 1) and boosts the tail (> 1)
    assert(got("a")._4 < 1.0 && got("b")._4 > 1.0)
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 2e-6)
  }

  test("x186 goodTuring + x187 vocabRichness on a singleton-rich fixture") {
    import spark.implicits._
    // a b c d singletons; e e f f doubletons; g g g one tripleton →
    // classes (1,4) (2,2) (3,1)
    val df = Seq("a b c d e e f f g g g").toDF("text")
    val gt = graft.text.TfIdf.goodTuring(df, col("text"), maxClasses = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    assert(gt(1L) === ((4L, Some(1.0)))) // 2·N₂/N₁ = 2·2/4
    assert(gt(2L) === ((2L, Some(1.5)))) // 3·N₃/N₂ = 3·1/2
    assert(gt(3L) === ((1L, None))) // no c=4 class → null, not fabricated
    assert(gt.size === 3)
    val vr = graft.text.TfIdf.vocabRichness(df, col("text")).head()
    assert(vr.getLong(0) === 11L && vr.getLong(1) === 7L)
    assert(vr.getLong(2) === 4L && vr.getLong(3) === 2L)
    assert(vr.getDouble(4) === math.rint(4.0 / 11.0 * 1e6) / 1e6)
    assert(vr.getDouble(5) === 11.0) // 7 + 4²/(2·2)
    // no doubletons → Chao1 null (never an infinity)
    val deg = graft.text.TfIdf.vocabRichness(
      Seq("a b c").toDF("text"), col("text")).head()
    assert(deg.isNullAt(5) && deg.getDouble(4) === 1.0)
  }

  test("x196 bigramCompressionReport: hand-computed entropy and flags") {
    import graft.text.TextAnalysis
    val d = Seq(
      (1L, "aaaa"),                  // one distinct bigram -> 0 bits
      (2L, "ab" * 50),               // bigrams: 50x"ab", 49x"ba"
      (3L, "a"),                     // single char -> below the n>=2 cut
      (4L, "The quick brown fox jumps over the lazy dog twice over"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramCompressionReport(d, col("doc_id"),
      col("text"), maxRatio = 0.25).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(3L))
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_bigrams") === 3L)
    assert(r1.getAs[Long]("n_distinct") === 1L)
    assert(r1.getAs[Double]("bits_per_bigram") === 0.0)
    assert(r1.getAs[Boolean]("flagged"))
    val r2 = out(2L)
    val h = {
      val p1 = 50.0 / 99.0; val p2 = 49.0 / 99.0
      (-p1 * math.log(p1) + -p2 * math.log(p2)) / math.log(2.0)
    }
    assert(r2.getAs[Long]("n_bigrams") === 99L)
    assert(r2.getAs[Double]("bits_per_bigram") === math.rint(h * 1e6) / 1e6)
    assert(r2.getAs[Boolean]("flagged")) // ~1 bit / 16 ≈ 0.06 < 0.25
    // natural prose clears the gate: its bigram spread is far richer
    val r4 = out(4L)
    assert(r4.getAs[Double]("est_ratio") > 0.25)
    assert(!r4.getAs[Boolean]("flagged"))
  }

  test("x204 codeSwitchReport: a bilingual doc reads mixed, monolingual " +
      "and evidence-free docs do not") {
    import graft.text.TextAnalysis
    val en = "the cat is of the mat and the dog is of the yard and so on " +
      "the end is here" // 20 tokens, en markers
    val de = "der hund und die katze nicht das haus der garten und die " +
      "wand nicht das dach der baum und die" // 20 tokens, de markers
    val d = Seq(
      (1L, s"$en $de"),        // chunk 1 en, chunk 2 de -> mixed
      (2L, s"$en $en"),        // both chunks en -> not mixed
      (3L, "zz qq ww rr tt"))  // no markers anywhere -> abstained
      .toDF("doc_id", "text")
    val out = TextAnalysis.codeSwitchReport(d, col("doc_id"), col("text"),
      chunkTokens = 20).collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Int]("n_chunks") === 2)
    assert(r1.getAs[Long]("n_langs") === 2L)
    assert(r1.getAs[Boolean]("mixed"))
    // dominant tie (1 chunk each) breaks to the earlier language code
    assert(r1.getAs[String]("dominant_lang") === "de")
    val r2 = out(2L)
    assert(r2.getAs[Long]("n_langs") === 1L)
    assert(r2.getAs[String]("dominant_lang") === "en")
    assert(!r2.getAs[Boolean]("mixed"))
    val r3 = out(3L)
    assert(r3.getAs[Int]("n_chunks") === 1)
    assert(r3.getAs[Long]("n_langs") === 0L)
    assert(r3.getAs[Long]("n_scored") === 0L)
    assert(r3.isNullAt(r3.fieldIndex("dominant_lang")))
    assert(!r3.getAs[Boolean]("mixed"))
  }
}
