package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analytics.{Sessions, Temporal}
import graft.dedup.Dedup

/** Measured scale-growth regression: the flagship "100 TB-safe" claims as
  * a curve, not a plan-shape argument. Each operator runs on a base
  * corpus and a 10× corpus; total shuffle WRITE bytes (collected from task
  * metrics, deterministic unlike wall-clock on a shared box) must grow
  * roughly linearly — well under quadratic. A near-dup pass whose bucket
  * capping failed, an as-of that degenerated to a theta join, or a
  * sessionize with an accidental extra keyed exchange all blow the bound.
  */
class ScaleGrowthSpec extends SparkSpec {
  import spark.implicits._

  /** Shuffle bytes written while `action` runs, via a task-end listener.
    * Listener delivery is async: poll until the counter is stable.
    */
  private def shuffleBytes(action: => Unit): Long = {
    val bytes = new AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      action
      var last = -1L
      var stable = 0
      var waited = 0
      while (stable < 3 && waited < 100) { // stable = unchanged for 300 ms
        Thread.sleep(100)
        val now = bytes.get()
        if (now == last) stable += 1 else { stable = 0; last = now }
        waited += 1
      }
      bytes.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  private def run(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Synthetic doc corpus: unique word-salad texts + 5% near-dup clones,
    * mirroring the real documents table's shape.
    */
  private def docs(n: Int): DataFrame = {
    val vocab = Vector.tabulate(500)(i => s"w$i")
    spark.range(0, n).select(col("id").as("doc_id"))
      .withColumn("seed", pmod(hash(col("doc_id")), lit(1000000)))
      .withColumn("base", pmod(col("doc_id"), lit(math.max(n / 20, 1))))
      .select(col("doc_id"), col("seed"), col("base")).as[(Long, Int, Long)]
      .map { case (id, seed, base) =>
        val rnd = new scala.util.Random(if (id % 20 == 19) base else seed)
        val words = Seq.fill(40)(vocab(rnd.nextInt(vocab.length)))
        (id, words.mkString(" "))
      }.toDF("doc_id", "text")
  }

  /** Synthetic events: `keys` users, timestamps spread over a day. */
  private def events(n: Int, keys: Int): DataFrame =
    spark.range(0, n).select(
      pmod(col("id"), lit(keys)).cast("string").as("uid"),
      timestamp_seconds(lit(1735689600L) + pmod(hash(col("id")), lit(86400)))
        .as("t"),
      col("id").as("eid"))

  private def growth(base: Long, big: Long): Double =
    big.toDouble / math.max(base, 1L).toDouble

  test("near-dup pipeline shuffle bytes grow ~linearly from 1x to 10x docs") {
    val small = shuffleBytes(run(
      Dedup.nearDuplicates(docs(500), col("doc_id"), col("text"), 0.3)))
    val large = shuffleBytes(run(
      Dedup.nearDuplicates(docs(5000), col("doc_id"), col("text"), 0.3)))
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    // 10x rows; linear = ~10x bytes. Allow generous headroom for bucket
    // skew and fixed overheads — the failure mode being guarded
    // (uncapped bucket quadratics) lands at 100x.
    assert(g < 25.0, s"near-dup shuffle grew ${g}x for 10x input ($small -> $large)")
  }

  test("shared-span extraction shuffle bytes grow ~linearly from 1x to 10x docs") {
    // the substring-dedup pair path: winnow prefilter + positional-gram
    // join, both behind capBuckets — an uncapped ubiquitous gram would
    // send this quadratic
    def spans(n: Int) =
      Dedup.sharedSpans(docs(n), col("doc_id"), col("text"), minSpanTokens = 8)
    val small = shuffleBytes(run(spans(500)))
    val large = shuffleBytes(run(spans(5000)))
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    assert(g < 25.0, s"shared-span shuffle grew ${g}x for 10x input ($small -> $large)")
  }

  test("span removal shuffle bytes grow ~linearly from 1x to 10x docs") {
    // the x73 chain end-to-end: sharedSpans candidates -> per-position
    // explode -> anti-join -> reassembly. The explode is bounded by
    // span_len x pairs (both capped upstream), the rebuild by corpus
    // tokens — an uncapped gram bucket or a spans x docs product blows it
    def cleaned(n: Int) = {
      val d = docs(n)
      Dedup.removeSpans(d, col("doc_id"), col("text"),
        Dedup.sharedSpans(d, col("doc_id"), col("text"), minSpanTokens = 8))
    }
    val small = shuffleBytes(run(cleaned(500)))
    val large = shuffleBytes(run(cleaned(5000)))
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    assert(g < 25.0, s"span-removal shuffle grew ${g}x for 10x input ($small -> $large)")
  }

  test("gram-novelty shuffle bytes grow ~linearly from 1x to 10x docs") {
    // per-gram doc counts groupBy+joined back on the gram key: both
    // exchanges ship (gram, small-int) pairs, linear in total grams; the
    // guarded failure is a pair-style quadratic on a shared gram
    def novelty(n: Int) =
      Dedup.gramNovelty(docs(n), col("doc_id"), col("text"), gramWidth = 8)
    val small = shuffleBytes(run(novelty(500)))
    val large = shuffleBytes(run(novelty(5000)))
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    assert(g < 20.0, s"gram-novelty shuffle grew ${g}x for 10x input ($small -> $large)")
  }

  test("intra-doc repeat shuffle bytes grow ~linearly from 1x to 10x docs") {
    // per-(doc, gram) self-join: blocking carries the doc id, so pair
    // work is bounded per doc and total traffic tracks corpus size
    def spans(n: Int) =
      Dedup.selfRepeatedSpans(docs(n), col("doc_id"), col("text"),
        minSpanTokens = 8)
    val small = shuffleBytes(run(spans(500)))
    val large = shuffleBytes(run(spans(5000)))
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    assert(g < 25.0, s"self-repeat shuffle grew ${g}x for 10x input ($small -> $large)")
  }

  test("as-of join shuffle bytes grow ~linearly from 1x to 10x events") {
    def asof(n: Int): DataFrame = {
      val ev = events(n, keys = 50)
      val left = ev.filter(col("eid") % 3 =!= 0)
      val right = ev.filter(col("eid") % 3 === 0)
        .select(col("uid"), col("t"), col("eid").as("rid"))
      Temporal.asofJoin(left, right, "uid", "t")
    }
    val small = shuffleBytes(run(asof(6000)))
    val large = shuffleBytes(run(asof(60000)))
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    assert(g < 20.0, s"as-of shuffle grew ${g}x for 10x input ($small -> $large)")
  }

  test("sessionize shuffle bytes grow ~linearly from 1x to 10x events") {
    def sess(n: Int): DataFrame =
      Sessions.sessionize(events(n, keys = 100), "uid", "t",
        gapSeconds = 600, order = Seq("eid"))
    val small = shuffleBytes(run(sess(6000)))
    val large = shuffleBytes(run(sess(60000)))
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    assert(g < 20.0, s"sessionize shuffle grew ${g}x for 10x input ($small -> $large)")
  }

  test("bm25 shuffle bytes grow ~linearly from 1x to 10x docs") {
    def bm25(n: Int): DataFrame =
      graft.text.Bm25.topK(docs(n), col("doc_id"), col("text"),
        Seq("w1", "w17", "w399"), k = 20)
    val small = shuffleBytes(run(bm25(500)))
    val large = shuffleBytes(run(bm25(5000)))
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    // the shuffled frame is (matching doc, query term) counts — linear in
    // docs; the failure mode guarded is the full-vocabulary shuffle
    assert(g < 20.0, s"bm25 shuffle grew ${g}x for 10x input ($small -> $large)")
  }

  test("line dedup shuffle bytes grow ~linearly from 1x to 10x docs") {
    // every doc: 2 corpus-wide boilerplate lines + its unique word salad —
    // the C4 shape (explode, line-key agg, anti-join, reassembly)
    def dedup(n: Int): DataFrame = {
      val withBp = docs(n).select(col("doc_id"),
        concat_ws("\n", col("text"),
          lit("subscribe to our newsletter"), lit("all rights reserved"),
          concat(lit("doc marker "), col("doc_id"))).as("text"))
      graft.text.Boilerplate.dropBoilerplateLines(withBp,
        col("doc_id"), col("text"), maxDocs = 5)
    }
    val small = shuffleBytes(run(dedup(500)))
    val large = shuffleBytes(run(dedup(5000)))
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    assert(g < 20.0, s"line-dedup shuffle grew ${g}x for 10x input ($small -> $large)")
  }

  test("bm25 batch shuffle bytes grow ~linearly from 1x to 10x docs") {
    def bm(n: Int): DataFrame = {
      val qs = Seq((1L, "w1 w17"), (2L, "w399 w42 w7"), (3L, "w250"))
        .toDF("query_id", "query_text")
      graft.text.Bm25.topKBatch(docs(n), col("doc_id"), col("text"),
        qs, col("query_id"), col("query_text"), k = 10)
    }
    val small = shuffleBytes(run(bm(500)))
    val large = shuffleBytes(run(bm(5000)))
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    // only (query, matching-doc) term hits shuffle — linear in docs
    assert(g < 20.0, s"bm25-batch shuffle grew ${g}x for 10x input ($small -> $large)")
  }

  test("cosine candidate pairs grow ~linearly when planes scale with the corpus") {
    // deterministic pseudo-random embeddings (hash-spread, not a 1-D curve)
    def emb(n: Int): DataFrame =
      spark.range(0, n).select(col("id").as("vec_id")).as[Long]
        .map(i => (i, Array.tabulate(8)(d =>
          (((i * 2654435761L + d * 40503L) % 1000L).toDouble / 500.0 - 1.0).toFloat)))
        .toDF("vec_id", "embedding")
    def pairs(n: Int): Long =
      graft.similarity.Similarity.cosineCandidates(emb(n), col("vec_id"),
        col("embedding"), dim = 8, targetBucketSize = 50L, maxBucket = 1000,
        seed = 7L).count()
    val small = pairs(800)
    val large = pairs(8000)
    val g = growth(small, large)
    assert(small > 0, "fixture produced no candidate pairs")
    // with a PINNED plane count the within-bucket self-join is quadratic:
    // 10x rows -> ~100x pairs; plane scaling + the bucket cap keep the
    // candidate set ~linear in the corpus
    assert(g < 25.0, s"candidate pairs grew ${g}x for 10x input ($small -> $large)")
  }

  test("wide near-dup shuffle bytes grow ~linearly from 1x to 10x docs") {
    def wide(n: Int): DataFrame =
      Dedup.nearDuplicatesWide(docs(n), col("doc_id"), col("text"),
        threshold = 0.3, numHashes = 8, rowsPerBand = 2)
    val small = shuffleBytes(run(wide(500)))
    val large = shuffleBytes(run(wide(5000)))
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    // 2x the bands of the narrow chain, same capped-bucket shape: widening
    // the signature must scale the CONSTANT, not the growth exponent
    assert(g < 25.0, s"wide near-dup shuffle grew ${g}x for 10x input ($small -> $large)")
  }

  test("winnow-pair shuffle bytes grow ~linearly from 1x to 10x docs") {
    def pairs(n: Int): DataFrame =
      Dedup.winnowPairs(docs(n), col("doc_id"), col("text"),
        k = 4, w = 4, minShared = 2)
    val small = shuffleBytes(run(pairs(500)))
    val large = shuffleBytes(run(pairs(5000)))
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    // fingerprints per doc are bounded by doc length; the guarded failure
    // is an uncapped ubiquitous-fingerprint bucket going quadratic
    assert(g < 25.0, s"winnow-pair shuffle grew ${g}x for 10x input ($small -> $large)")
  }

  test("fuzzy-join shuffle bytes grow ~linearly from 1x to 10x rows") {
    // station-code keys with a typo'd right side: deletion neighborhoods
    // are |key|+1 variants per row, so the blocked shuffle is linear
    def side(n: Int, typo: Boolean): DataFrame =
      spark.range(0, n).select(col("id"),
        concat(lit("unit-"), pmod(col("id"), lit(n / 5)).cast("string")).as("key"))
        .select(col("id"), when(lit(typo) && col("id") % 7 === 0,
          substring(col("key"), 2, 100)).otherwise(col("key")).as("key"))
    def fj(n: Int): DataFrame =
      graft.analytics.Joins.fuzzyJoin(
        side(n, typo = false), col("id"), col("key"),
        side(n, typo = true), col("id"), col("key"))
    val small = shuffleBytes(run(fj(600)))
    val large = shuffleBytes(run(fj(6000)))
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    assert(g < 25.0, s"fuzzy-join shuffle grew ${g}x for 10x input ($small -> $large)")
  }

  test("budget select shuffle bytes grow ~linearly from 1x to 10x docs") {
    def sel(n: Int): DataFrame =
      graft.sampling.BudgetSelect.selectUnderBudget(docs(n),
        col("doc_id"), graft.text.TextAnalysis.qualityScore(col("text")),
        graft.text.TextAnalysis.tokenCount(col("text")),
        budget = n * 10L, numBuckets = 64)
    val small = shuffleBytes(run(sel(500)))
    val large = shuffleBytes(run(sel(5000)))
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    // two bucket-keyed exchanges (per-bucket totals + the window); the
    // guarded failure is a global-sort single-partition cumsum
    assert(g < 20.0, s"budget-select shuffle grew ${g}x for 10x input ($small -> $large)")
  }

  test("posting-list shuffle bytes grow ~linearly from 1x to 10x docs") {
    def post(n: Int): DataFrame =
      graft.text.Postings.postingLists(docs(n), col("doc_id"), col("text"),
        maxPostings = 32, minDf = 2)
    val small = shuffleBytes(run(post(500)))
    val large = shuffleBytes(run(post(5000)))
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    // the (doc, term) frame shuffles once and the heap buffers cap at
    // maxPostings ids per (term, map task) — both linear in the corpus
    assert(g < 20.0, s"posting-list shuffle grew ${g}x for 10x input ($small -> $large)")
  }

  test("sparse all-pairs shuffle bytes grow ~linearly under the df cap") {
    // rare markers are a fixed fraction of each doc: term df grows with
    // the corpus, so the cap's pruning keeps pair work from going
    // quadratic as the same marker accumulates more documents
    def pairs(n: Int): DataFrame = {
      val marked = docs(n).select(col("doc_id"),
        concat(col("text"), lit(" tag"),
          pmod(col("doc_id"), lit(n / 10)).cast("string")).as("text"))
      graft.similarity.SparsePairs.tfidfPairs(marked, col("doc_id"),
        col("text"), maxDf = 15L, threshold = 0.0)
    }
    val small = shuffleBytes(run(pairs(500)))
    val large = shuffleBytes(run(pairs(5000)))
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    assert(g < 25.0, s"sparse-pairs shuffle grew ${g}x for 10x input ($small -> $large)")
  }

  test("delta near-dup shuffle grows ~linearly in the corpus for a fixed batch") {
    // a fixed-size increment against a growing corpus: the corpus
    // contributes one linear band scan; the quadratic-ish candidate work
    // stays confined to batch-touched buckets
    def delta(n: Int): DataFrame = {
      val corpus = docs(n)
      val batch = corpus.filter(col("doc_id") % (n / 50) === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
        .limit(50)
      Dedup.incrementalNearDuplicates(corpus, batch, col("doc_id"),
        col("text"), threshold = 0.3)
    }
    val small = shuffleBytes(run(delta(500)))
    val large = shuffleBytes(run(delta(5000)))
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    assert(g < 20.0, s"delta near-dup shuffle grew ${g}x for 10x corpus ($small -> $large)")
  }

  test("resample+interpolate shuffle bytes grow ~linearly from 1x to 10x events") {
    def rs(n: Int): DataFrame =
      Temporal.resampleInterpolate(
        events(n, keys = 20).select(col("uid"), col("t"), col("eid").cast("double").as("v")),
        "uid", "t", col("v"), stepSeconds = 3600L)
    val small = shuffleBytes(run(rs(6000)))
    val large = shuffleBytes(run(rs(60000)))
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    // two keyed as-of shuffles over grid + observations, both linear; the
    // grid itself is key-count x span/step, independent of event volume
    assert(g < 20.0, s"resample shuffle grew ${g}x for 10x input ($small -> $large)")
  }

  test("pagerank per-round shuffle bytes grow ~linearly from 1x to 10x edges") {
    // ring-of-cliques graph: n nodes, 3 out-edges each, node domain grows
    // with the edge count (the real web-graph shape for this operator)
    def pr(n: Int): DataFrame = {
      val ed = spark.range(0, n).select(col("id"))
        .select(concat(lit("n"), pmod(col("id"), lit(n / 3)).cast("string")).as("src"),
          concat(lit("n"), pmod(col("id") * 7 + 1, lit(n / 3)).cast("string")).as("dst"))
      graft.analytics.Graph.pageRank(ed, col("src"), col("dst"), iterations = 3)
    }
    val small = shuffleBytes(run(pr(900)))
    val large = shuffleBytes(run(pr(9000)))
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    // each round: one edge-keyed join + one dst-keyed sum — linear in
    // edges; the guarded failure is an accidental node x node product
    assert(g < 20.0, s"pagerank shuffle grew ${g}x for 10x input ($small -> $large)")
  }

  test("source-overlap shuffle bytes grow ~linearly from 1x to 10x docs") {
    // the (source, gram) distinct frame is linear in total grams and the
    // pairwise stage is |sources|²-bounded; the guarded failure is the
    // df-cap breaking and a ubiquitous gram pairing every source with
    // every source ON EVERY OCCURRENCE
    def overlap(n: Int) = {
      val d = docs(n).withColumn("source",
        concat(lit("s"), pmod(col("doc_id"), lit(20)).cast("string")))
      Dedup.sourceOverlap(d, col("source"), col("text"), gramWidth = 8)
    }
    val small = shuffleBytes(run(overlap(500)))
    val large = shuffleBytes(run(overlap(5000)))
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    assert(g < 25.0, s"source-overlap shuffle grew ${g}x for 10x input ($small -> $large)")
  }

  test("item-affinity shuffle bytes grow ~linearly for 10x events at fixed domains") {
    // baskets are (entity, item) DISTINCT pairs: with fixed item/entity
    // domains the per-entity |basket|² fan-out is bounded, so 10x raw
    // events must NOT produce 10x pair volume — the distinct is the guard
    def affinity(n: Int) =
      graft.analytics.Distribution.itemAffinity(
        events(n, keys = 200).withColumn("item",
          pmod(hash(col("eid")), lit(8)).cast("string")),
        col("uid"), col("item"))
    val small = shuffleBytes(run(affinity(2000)))
    val large = shuffleBytes(run(affinity(20000)))
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    // fixed domains: pair volume saturates — growth should be far below
    // even linear; allow headroom for the pre-distinct scan shuffle
    assert(g < 12.0, s"item-affinity shuffle grew ${g}x for 10x input ($small -> $large)")
  }

  test("cluster split + inflation shuffle bytes grow ~linearly 1x to 10x") {
    // the x111/x112 chain: near-dup pairs -> connected components -> one
    // corpus-sized left join each; an accidental corpus-sized frame inside
    // the CC loop or a non-broadcast cluster join would blow the bound
    def pipeline(n: Int): Unit = {
      val d = docs(n)
      val clusters = Dedup.duplicateClusters(
        Dedup.nearDuplicates(d, col("doc_id"), col("text"), 0.3))
      run(graft.sampling.Sampling.clusterSplit(d.select(col("doc_id")),
        col("doc_id"), clusters, Seq("train" -> 0.9, "test" -> 0.1)))
      run(Dedup.dupInflation(d.select(col("doc_id")), col("doc_id"), clusters))
    }
    val small = shuffleBytes(pipeline(500))
    val large = shuffleBytes(pipeline(5000))
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    assert(g < 25.0, s"cluster split/inflation shuffle grew ${g}x for 10x " +
      s"input ($small -> $large)")
  }

  test("recall-audit truth side stays sample-bounded as the corpus grows 10x") {
    // the quadratic truth join runs on the HASH SAMPLE: with an absolute
    // sample dial (same bucket count), a 10x corpus means a 10x sample
    // and ~100x pairwise work — so the AUDIT contract is that cost tracks
    // the sample, not the corpus. Hold the sampled-row count constant by
    // shrinking the dial 10x and assert shuffle stays flat-ish.
    def audit(n: Int, buckets: Int) =
      Dedup.recallAudit(docs(n), col("doc_id"), col("text"),
        threshold = 0.3, sampleBuckets = buckets)
    val small = shuffleBytes(run(audit(500, 2000)))   // ~100 sampled docs
    val large = shuffleBytes(run(audit(5000, 200)))   // ~100 sampled docs
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    assert(g < 6.0, s"recall audit must track the sample, not the corpus " +
      s"($small -> $large, ${g}x)")
  }

  test("prefix-join shuffle bytes grow ~linearly from 1x to 10x docs") {
    // x148's exactness forbids a bucket cap, so its scale safety rests
    // ENTIRELY on the rare-first prefix property (frequent shingles sort
    // out of prefixes). This gate measures that property: on the
    // word-salad corpus (shingles rare, the design case) shuffle bytes
    // must track the corpus, not its square — a regression that let
    // frequent shingles into prefixes lands at ~100x
    def pj(n: Int) =
      Dedup.prefixJaccardJoin(docs(n), col("doc_id"), col("text"),
        threshold = 0.5, gramWidth = 3)
    val small = shuffleBytes(run(pj(500)))
    val large = shuffleBytes(run(pj(5000)))
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    assert(g < 25.0,
      s"prefix join shuffle grew ${g}x for 10x input ($small -> $large)")
  }

  test("entity delta shuffle bytes track the old corpus linearly, never old-pair squares") {
    // fixed 20-record increment against a growing old registry whose keys
    // concentrate into 20 hot blocks. Keys are 5×-repeated DISTINCT
    // letters ("aaaaa".."ttttt"): their deletion neighborhoods are
    // pairwise disjoint (digit-suffixed keys would merge blocks across
    // keys and push them over maxBucket at the 10× point, letting the
    // CAP — not probe discipline — trim the work this gate measures),
    // so every block stays under the default cap at BOTH scales:
    // 10×·(nOld/20) = 500 ≤ 1000. Candidate work must be probe-driven
    // (|new|·block → ~10× bytes); the guarded regression — joining the
    // full capped union against itself and discarding old×old pairs
    // AFTER the join — grows with block² (~100×) because the discarded
    // pairs still transit the distinct's exchange. Measures deltaPairs
    // directly: goldenRecordsDelta's closure/survivorship runs eager jobs
    // at call time that would pollute the byte count.
    import graft.analytics.Entities
    val keys = array(('a' to 't').map(c => lit(c.toString * 5)): _*)
    def reg(r: org.apache.spark.sql.Dataset[java.lang.Long]): DataFrame =
      r.select(col("id").as("rid"),
        element_at(keys, (pmod(col("id"), lit(20)) + 1).cast("int"))
          .as("rkey"))
    def delta(nOld: Int): DataFrame =
      Entities.deltaPairs(reg(spark.range(nOld)),
        reg(spark.range(2000000, 2000020)), maxBucket = 1000)
    val small = shuffleBytes(run(delta(500)))
    val large = shuffleBytes(run(delta(5000)))
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    assert(g < 30.0,
      s"entity delta shuffle grew ${g}x for 10x old corpus ($small -> $large)")
  }

  test("weighted-median shuffle bytes grow ~linearly from 1x to 10x rows") {
    // a46's shape: RANGE-frame cumsum + per-group total + one aggregate,
    // all exchanges partitioned by the group key, so traffic is one
    // (group, value, weight) row per input row per exchange. The
    // documented caveat — a hot group serializes its sort in ONE task —
    // is a latency skew, not a byte blow-up, so the gate plants a
    // deliberately hot group (~half the rows) and asserts bytes still
    // track the corpus, not its square.
    def wm(n: Int): DataFrame = {
      val ev = events(n, keys = 40).withColumn("g",
        when(col("eid") % 2 === 0, lit("hot")).otherwise(col("uid")))
      graft.analytics.Aggregates.weightedMedian(ev, Seq(col("g")),
        col("eid").cast("double"),
        (pmod(col("eid"), lit(9)) + 1).cast("double"))
    }
    val small = shuffleBytes(run(wm(6000)))
    val large = shuffleBytes(run(wm(60000)))
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    assert(g < 20.0,
      s"weighted-median shuffle grew ${g}x for 10x input ($small -> $large)")
  }

  test("oph signature shuffle bytes grow ~linearly from 1x to 10x docs") {
    // one hash pass per gram into (doc, bin) minima, then per-doc map
    // assembly: both aggregates are corpus-linear; the densification
    // ladder is a constant per-row expression, never a join
    def oph(n: Int) =
      Dedup.ophSignatures(docs(n), col("doc_id"), col("text"), bins = 16)
    val small = shuffleBytes(run(oph(500)))
    val large = shuffleBytes(run(oph(5000)))
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    assert(g < 20.0,
      s"oph signature shuffle grew ${g}x for 10x input ($small -> $large)")
  }

  test("k-center coreset shuffle bytes grow ~linearly from 1x to 10x vectors") {
    // each greedy round is a 1-row-broadcast distance update plus a
    // TakeOrdered argmax: per-round shuffle is the k-row merge, so total
    // bytes track the corpus (k passes), never |corpus|·|selected| pairs
    def emb(n: Int): DataFrame =
      spark.range(0, n).select(col("id").as("vec_id")).as[Long]
        .map(i => (i, Array.tabulate(8)(d =>
          (((i * 2654435761L + d * 40503L) % 1000L).toDouble / 500.0 - 1.0).toFloat)))
        .toDF("vec_id", "embedding")
    def kc(n: Int) = graft.similarity.Similarity.kCenterCoreset(
      emb(n), col("vec_id"), col("embedding"), k = 5)
    val small = shuffleBytes(run(kc(500)))
    val large = shuffleBytes(run(kc(5000)))
    val g = growth(small, large)
    // the argmax TakeOrdered merge can be tiny; guard only the upper bound
    assert(g < 20.0,
      s"k-center shuffle grew ${g}x for 10x input ($small -> $large)")
  }

  test("knn-shapley shuffle bytes grow ~linearly for 10x corpus at a " +
      "fixed probe set") {
    // corpus×probes rows with probes FIXED: the per-probe ranking is
    // |corpus|·|probes| work by definition — the guarded failure mode is
    // anything quadratic IN THE CORPUS (e.g. a corpus-side join slipping
    // into the scoring)
    def emb(n: Int): DataFrame =
      spark.range(0, n).select(col("id").as("vec_id")).as[Long]
        .map(i => (i, (i % 7).toInt, Array.tabulate(8)(d =>
          (((i * 2654435761L + d * 40503L) % 1000L).toDouble / 500.0 - 1.0).toFloat)))
        .toDF("vec_id", "label", "embedding")
    def shap(n: Int) = {
      val e = emb(n)
      graft.analytics.Valuation.knnShapley(
        e.filter(col("vec_id") >= 4), e.filter(col("vec_id") < 4),
        col("vec_id"), col("label"), col("embedding"),
        col("vec_id"), col("label"), col("embedding"), k = 3)
    }
    val small = shuffleBytes(run(shap(500)))
    val large = shuffleBytes(run(shap(5000)))
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    assert(g < 25.0,
      s"knn-shapley shuffle grew ${g}x for 10x input ($small -> $large)")
  }

  test("sorted-neighborhood candidates and shuffle grow ~linearly from " +
      "1x to 10x records") {
    // candidates are n·(w−1) − edge effects BY CONSTRUCTION; the guarded
    // failure is the rank join degenerating (e.g. a non-equi range join
    // replicating blocks)
    def recs(n: Int): DataFrame =
      spark.range(0, n).select(col("id").as("rid"),
        md5(col("id").cast("string")).as("k"),
        (col("id") / 3).cast("long").as("t"))
    def snm(n: Int) = graft.analytics.Entities.sortedNeighborhood(
      recs(n), col("rid"), col("k"), col("t"), window = 5)
    val smallRow = snm(500).head()
    assert(smallRow.getAs[Long]("candidate_pairs") === (500L - 4) * 4 +
      3 + 2 + 1, "SNM candidate count must be n(w-1) minus edge effects")
    val small = shuffleBytes(run(snm(500)))
    val large = shuffleBytes(run(snm(5000)))
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    assert(g < 25.0,
      s"SNM shuffle grew ${g}x for 10x input ($small -> $large)")
  }

  test("texttiling shuffle bytes grow ~linearly from 1x to 10x docs") {
    // the adjacent-block self-join meets only on (doc, block+1, term):
    // per-doc work is tokens/w boundaries — a term-only join key would
    // send this quadratic in document count
    def tiles(n: Int) = graft.text.Segmentation.cutReport(
      docs(n), col("doc_id"), col("text"), w = 10)
    val small = shuffleBytes(run(tiles(500)))
    val large = shuffleBytes(run(tiles(5000)))
    val g = growth(small, large)
    assert(small > 0, "listener captured no shuffle writes")
    assert(g < 25.0,
      s"texttiling shuffle grew ${g}x for 10x input ($small -> $large)")
  }
}
