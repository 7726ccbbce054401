package graft

import org.apache.spark.sql.functions._
import graft.text.Bm25
import graft.sampling.Importance
import graft.warehouse.Layout
import graft.dedup.Dedup

/** BM25 retrieval, DSIR importance weighting, greedy semantic dedup, and
  * Z-order layout — the round-5 operator tier.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark spark engine"),          // high tf for 'spark'
    (2L, "spark engine"),                      // shorter, one 'spark'
    (3L, "engine room with no match terms"),
    (4L, "spark")                              // shortest match
  ).toDF("doc_id", "text")

  test("bm25: only matching docs score; higher tf beats lower at equal length") {
    val out = Bm25.topK(docs, col("doc_id"), col("text"),
      Seq("spark"), k = 10).collect()
    assert(out.map(_.getLong(0)).toSet === Set(1L, 2L, 4L))
    val score = out.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 4 is far shorter than avgdl -> its single occurrence outranks
    // doc 2's single occurrence in a longer doc
    assert(score(4L) > score(2L))
    // hand-check doc 2: N=4, df=3, dl=2, avgdl=(4+2+6+1)/4=3.25
    val idf = math.log(1.0 + (4.0 - 3.0 + 0.5) / (3.0 + 0.5))
    val tf = (1.0 * 2.2) / (1.0 + 1.2 * (0.25 + 0.75 * (2.0 / 3.25)))
    assert(math.abs(score(2L) - BigDecimal(idf * tf)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("bm25: top-k cut is deterministic and ordered by score then id") {
    val out = Bm25.topK(docs, col("doc_id"), col("text"),
      Seq("spark", "engine"), k = 2).collect()
    assert(out.length === 2)
    assert(out(0).getDouble(1) >= out(1).getDouble(1))
  }

  test("importance: target-like docs get positive log-ratio, others negative") {
    val source = Seq(
      (1L, "physics physics energy"),
      (2L, "celebrity gossip news gossip"),
      (3L, "physics energy theorem")).toDF("doc_id", "text")
    val target = Seq((100L, "physics energy theorem proof"))
      .toDF("doc_id", "text")
    val w = Importance.logRatioWeights(source, target, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(1L) > w(2L) && w(3L) > w(2L),
      "physics docs must score more target-like than gossip")
    assert(w(3L) > 0 && w(2L) < 0)
  }

  test("importance: n_tokens counts source tokens only") {
    val source = Seq((1L, "a b c")).toDF("doc_id", "text")
    val target = Seq((2L, "a")).toDF("doc_id", "text")
    val row = Importance.logRatioWeights(source, target, col("doc_id"),
      col("text")).head()
    assert(row.getLong(2) === 3L)
  }

  test("greedy survivors: no surviving pair remains, lower ids win") {
    val all = Seq(1L, 2L, 3L, 4L, 5L).toDF("vec_id")
    // near-dup pairs: (1,2), (2,3), (4,5) -> drop {2, 3, 5}
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val kept = Dedup.greedySurvivors(all, col("vec_id"), pairs)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 4L))
    val keptPairs = Seq((1L, 2L), (2L, 3L), (4L, 5L))
      .filter { case (a, b) => kept(a) && kept(b) }
    assert(keptPairs.isEmpty, "every pair must have lost its id_b")
  }

  test("zValue interleaves bits: unit steps in x and y move bits 0 and 1") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 0L), (0L, 2L),
      (1023L, 1023L)).toDF("x", "y")
    val z = df.select(Layout.zValue(col("x"), col("y"), bits = 10))
      .collect().map(_.getLong(0))
    assert(z(0) === 0L)
    assert(z(1) === 1L)      // x bit 0 -> z bit 0
    assert(z(2) === 2L)      // y bit 0 -> z bit 1
    assert(z(3) === 3L)
    assert(z(4) === 4L)      // x bit 1 -> z bit 2
    assert(z(5) === 8L)      // y bit 1 -> z bit 3
    assert(z(6) === (1L << 20) - 1, "max inputs fill all 20 bits")
  }

  test("zBucket: contiguous z-ranges, power-of-two fanout, full coverage") {
    val df = spark.range(0, 1024).select(
      (col("id") % 32).as("x"), (col("id") / 32).as("y"))
    val out = df.select(Layout.zBucket(
        Layout.zValue(col("x"), col("y"), bits = 5), 5, numBuckets = 4)
      .as("b")).groupBy("b").count().collect()
    assert(out.map(_.getLong(0)).toSet === Set(0L, 1L, 2L, 3L))
    // the interleave is a bijection on 10 bits, so quarters are exact
    assert(out.map(_.getLong(1)).forall(_ === 256L))
  }

  /** Salted tie hash as the operator computes it (md5-derived, engine-
    * independent), collected for naive in-memory references.
    */
  private def tieHashes(ids: Seq[Long], salt: String): Map[Long, Long] = {
    val df = ids.toDF("doc_id")
    df.select(col("doc_id"),
        graft.sampling.Sampling.hashKey(col("doc_id"), lit(salt)).as("tie"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("budget select: equals the global-order prefix rule exactly") {
    // i*37 % 100 repeats every 100 ids, so score TIES exist — the naive
    // reference must apply the same (score desc, tie asc, id asc) order
    val corpus = (1L to 200L).map(i =>
      (i, (i * 37 % 100).toDouble / 100.0, 10L + i % 7)) // score, tokens
    val df = corpus.toDF("doc_id", "score", "n_tokens")
    val got = graft.sampling.BudgetSelect.selectUnderBudget(df,
        col("doc_id"), col("score"), col("n_tokens"), budget = 800,
        numBuckets = 16)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    val tie = tieHashes(corpus.map(_._1), "budget")
    var acc = 0L
    val want = corpus.sortBy { case (id, s, _) => (-s, tie(id), id) }
      .map { case (id, _, t) => acc += t; id -> acc }
      .takeWhile(_._2 <= 800).toMap
    assert(got === want)
  }

  test("budget select: score ties break on the salted hash, then id") {
    val ids = Seq(3L, 1L, 2L)
    val df = ids.map(i => (i, 0.5, 100L)).toDF("doc_id", "score", "n_tokens")
    val got = graft.sampling.BudgetSelect.selectUnderBudget(df,
        col("doc_id"), col("score"), col("n_tokens"), budget = 200,
        numBuckets = 4)
      .collect().map(_.getLong(0)).toSet
    val tie = tieHashes(ids, "budget")
    val want = ids.sortBy(i => (tie(i), i)).take(2).toSet
    assert(got === want)
  }

  test("budget select: a repeated-score bucket splits across hash cells") {
    // 3 distinct scores over 3000 docs — every bucket is pure and heavy,
    // the discrete-domain degenerate that used to funnel a third of the
    // corpus through one window reducer
    val n = 3000
    val corpus = (1L to n.toLong).map(i => (i, (i % 3).toDouble, 10L))
    val df = corpus.toDF("doc_id", "score", "n_tokens")
    val subBuckets = 16
    val out = graft.sampling.BudgetSelect.selectUnderBudget(df,
      col("doc_id"), col("score"), col("n_tokens"), budget = n * 5L,
      numBuckets = 64, subBuckets = subBuckets)
    // exactness first: equals the naive rule under the same tie order
    val tie = tieHashes(corpus.map(_._1), "budget")
    var acc = 0L
    val want = corpus.sortBy { case (id, s, _) => (-s, tie(id), id) }
      .map { case (id, _, t) => acc += t; id -> acc }
      .takeWhile(_._2 <= n * 5L).toMap
    assert(out.collect().map(r => (r.getLong(0), r.getLong(3))).toMap === want)
    // and no reducer saw more than one hash cell's docs: the largest
    // (bucket, cell) group is far below a whole score class (n/3 docs)
    val cells = df.select(
        graft.sampling.Sampling.hashKey(col("doc_id"), lit("budget"))
          .as("tie"), col("score"))
      .select(col("score"), floor(col("tie") * subBuckets / lit(4294967296L))
        .as("cell"))
      .groupBy("score", "cell").count().collect().map(_.getLong(2))
    assert(cells.max < n / 3 / 4,
      s"largest cell ${cells.max} is not a meaningful split of ${n / 3}")
  }

  test("percentileRanks equals row_number even on a 3-score tie domain") {
    // discrete scores — the degenerate the hash-cell split exists for
    val corpus = (1L to 900L).map(i => (i, (i % 3).toDouble))
    val df = corpus.toDF("doc_id", "score")
    val got = graft.sampling.BudgetSelect.percentileRanks(df,
        col("doc_id"), col("score"), numBuckets = 16, subBuckets = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    val tie = tieHashes(corpus.map(_._1), "budget")
    val want = corpus.sortBy { case (id, s) => (-s, tie(id), id) }
      .zipWithIndex.map { case ((id, _), i) =>
        id -> (i + 1L, math.rint(i.toDouble / 899.0 * 1e6) / 1e6) }.toMap
    assert(got === want)
  }

  test("percentileRanksByGroup equals the per-group window rule, any partitioning") {
    // two groups of different sizes, discrete scores (tie-split degenerate),
    // plus a singleton group (pct must be 0.0, not 0/0)
    val corpus = (1L to 600L).map(i =>
      (if (i <= 400) "web" else "curated", i, (i % 3).toDouble)) :+
      (("solo", 9999L, 1.0))
    val tie = tieHashes(corpus.map(_._2), "budget")
    val want = corpus.groupBy(_._1).flatMap { case (g, rows) =>
      val n = rows.size
      rows.sortBy { case (_, id, s) => (-s, tie(id), id) }
        .zipWithIndex.map { case ((_, id, _), i) =>
          (g, id) -> (i + 1L,
            if (n <= 1) 0.0 else math.rint(i.toDouble / (n - 1) * 1e6) / 1e6) }
    }
    for (parts <- Seq(1, 7)) {
      val df = corpus.toDF("src", "doc_id", "score").repartition(parts)
      val got = graft.sampling.BudgetSelect.percentileRanksByGroup(df,
          col("src"), col("doc_id"), col("score"),
          numBuckets = 16, subBuckets = 8)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(3), r.getDouble(4)))
        .toMap
      assert(got === want, s"parts=$parts")
    }
  }

  test("splitLeakage flags only pairs straddling splits, zero shuffle") {
    import graft.sampling.Sampling
    val w = Seq("train" -> 0.8, "test" -> 0.2)
    // read the deterministic labels back, then build one same-split and
    // one cross-split pair from them
    val labels = (1L to 200L).toDF("doc_id")
      .select(col("doc_id"), Sampling.splitLabel(col("doc_id"), w).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val sameSplit = labels.toSeq.filter(_._2 == "train").take(2).map(_._1)
    val crossA = labels.find(_._2 == "train").get._1
    val crossB = labels.find(_._2 == "test").get._1
    val pairs = Seq((sameSplit(0), sameSplit(1)), (crossA, crossB))
      .toDF("doc_a", "doc_b")
    val out = Sampling.splitLeakage(pairs, w)
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((crossA, crossB)))
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "leakage audit must be a pure projection + filter")
  }

  test("rrf fusion matches the closed form, missing side contributes zero") {
    import graft.text.Fusion
    val lex = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("query_id", "doc_id", "rnk")
    val sem = Seq((1L, 11L, 1), (1L, 13L, 2))
      .toDF("query_id", "doc_id", "rnk")
    val got = Fusion.rrfFuse(lex, sem, k = 10)
      .collect().map(r => r.getLong(1) -> (r.getDouble(2), r.getInt(3))).toMap
    def r6(d: Double) = math.rint(d * 1e6) / 1e6
    // doc 11 ranks in both (2 lexical, 1 semantic) and must fuse on top
    assert(got(11L) === ((r6(1.0 / 62 + 1.0 / 61), 1)))
    assert(got(10L) === ((r6(1.0 / 61), 2)))
    assert(got(13L) === ((r6(1.0 / 62), 3)))
    assert(got(12L) === ((r6(1.0 / 63), 4)))
  }

  test("x151 rbo: prefix-overlap closed form; disjoint lists score zero") {
    import graft.text.Fusion
    // q1: A = [d1,d2,d3], B = [d2,d1,d4] at k=3, p=.5
    // overlap@1 = 0, @2 = 2/2, @3 = 2/3 → rbo = .5·(.5·1 + .25·2/3)
    val a = Seq((1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3),
        (2L, 7L, 1), (2L, 8L, 2))
      .toDF("query_id", "doc_id", "rnk")
    val b = Seq((1L, 2L, 1), (1L, 1L, 2), (1L, 4L, 3),
        (2L, 9L, 1), (2L, 10L, 2))
      .toDF("query_id", "doc_id", "rnk")
    val got = Fusion.rbo(a, b, k = 3, p = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    def r6(d: Double) = math.rint(d * 1e6) / 1e6
    val expected = r6(0.5 * (0.5 * 1.0 + 0.25 * (2.0 / 3.0)))
    assert(got(1L) === ((2L, expected)))
    // q2's lists are disjoint: zero overlap, rbo 0 (row still emitted)
    assert(got(2L) === ((0L, 0.0)))
    // identical lists at k items score the maximum truncated rbo:
    // (1−p)·Σ p^{d−1} — with p=.5, k=3 that is .5·(1+.5/2·2... ) computed
    // directly from the tail form: every item has m = its own rank
    val same = Fusion.rbo(a.filter(col("query_id") === 1L),
      a.filter(col("query_id") === 1L), k = 3, p = 0.5)
      .collect().map(r => r.getDouble(2)).head
    val tail = (m: Int) => (m to 3).map(d => math.pow(0.5, d - 1) / d).sum
    assert(same === r6(0.5 * (tail(1) + tail(2) + tail(3))))
  }

  test("hll merge: split sketches union within tolerance, equal the one-shot sketch") {
    import graft.analytics.Distribution
    val ev = (1L to 2000L).map(i => (i, s"t${i % 3}", s"u${i % 137}"))
      .toDF("event_id", "event_type", "user_id")
    val a = ev.filter(col("event_id") % 2 === 0)
    val b = ev.filter(col("event_id") % 2 =!= 0)
    val rep = Distribution.hllMergeReport(a, b, col("event_type"), col("user_id"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(rep.size === 3 && rep.values.forall(identity), rep.toString)
    // mergeability contract: union of the halves' sketches estimates
    // EXACTLY like one sketch over the whole stream — that equality is
    // what makes per-partition sketch state rescan-free
    def est(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sa = a.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sa"))
    val sb = b.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sb"))
    val merged = sa.join(sb, "event_type")
      .select(col("event_type"),
        hll_sketch_estimate(hll_union(col("sa"), col("sb"))).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged === est(ev))
  }

  test("kll merge: split sketches answer union quantiles within rank tolerance") {
    import graft.analytics.Distribution
    val ev = (1L to 3000L).map(i => (i, s"t${i % 3}", (i % 1000).toDouble))
      .toDF("event_id", "event_type", "value")
    val a = ev.filter(col("event_id") % 2 === 0)
    val b = ev.filter(col("event_id") % 2 =!= 0)
    val rep = Distribution.quantileMergeReport(a, b, col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getBoolean(2)).toMap
    assert(rep.size === 9 && rep.values.forall(identity), rep.toString)
    // keys living on only ONE side still report (null-safe full outer)
    val oneSided = Distribution.quantileMergeReport(
      a.filter(col("event_type") === "t0"),
      b.filter(col("event_type") =!= "t0"), col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getBoolean(2)).toMap
    assert(oneSided.size === 9 && oneSided.values.forall(identity), oneSided.toString)
    // mergeability contract: the merged halves track the one-shot sketch
    // over the whole stream — values are uniform on [0, 1000), so a 6%
    // value gap is a generous 3× the k=200 rank-error bound
    def sk(df: org.apache.spark.sql.DataFrame, out: String) =
      df.groupBy(col("event_type"))
        .agg(expr("kll_sketch_agg_double(value, 200)").as(out))
    val m = sk(a, "sa").join(sk(b, "sb"), "event_type")
      .select(col("event_type"), expr(
        "kll_sketch_get_quantile_double(kll_sketch_merge_double(sa, sb), 0.5)")
        .as("m"))
    val o = sk(ev, "s")
      .select(col("event_type"), expr(
        "kll_sketch_get_quantile_double(s, 0.5)").as("o"))
    m.join(o, "event_type").collect().foreach(r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) <= 60.0,
        s"merged median ${r.getDouble(1)} vs one-shot ${r.getDouble(2)}"))
  }

  test("cms frequency: estimates satisfy the bound; tiny key sets are exact") {
    val ev = (1L to 1000L).map(i => (i, s"type_${i % 5}"))
      .toDF("event_id", "event_type")
    val rep = graft.analytics.Distribution
      .cmsFrequencyReport(ev, col("event_type"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(rep.size === 5)
    assert(rep.values.forall { case (exact, ok) => exact === 200L && ok })
    // direct probe: 5 keys in a 200-cell-wide sketch should not collide,
    // so the estimate is exactly the count
    val row = ev.agg(count_min_sketch(col("event_type"), lit(0.01),
      lit(0.99), lit(42)).as("s")).head()
    val est = ev.select(graft.plans.Native.cmsEstimate(col("event_type"),
      row.getAs[Array[Byte]](0)).as("e")).distinct().collect()
    assert(est.map(_.getLong(0)).toSet === Set(200L))
  }

  test("bm25 batch: per-query results equal the single-query operator") {
    val corpus = Seq(
      (1L, "spark spark spark engine"), (2L, "spark engine"),
      (3L, "engine room with no match terms"), (4L, "spark")
    ).toDF("doc_id", "text")
    val qs = Seq((10L, "spark"), (20L, "engine room")).toDF("query_id", "query_text")
    val batch = graft.text.Bm25.topKBatch(corpus, col("doc_id"), col("text"),
        qs, col("query_id"), col("query_text"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    def single(qid: Long, terms: Seq[String]) =
      Bm25.topK(corpus, col("doc_id"), col("text"), terms, k = 10)
        .collect().map(r => (qid, r.getLong(0), r.getDouble(1))).toSet
    assert(batch === single(10L, Seq("spark")) ++ single(20L, Seq("engine", "room")))
  }

  test("chunking: full coverage, stride overlap, short tail window") {
    val df = Seq((7L, "a b c d e f g")).toDF("doc_id", "text")
    val out = graft.text.Chunking.slidingChunks(df, col("doc_id"),
        col("text"), chunkTokens = 4, strideTokens = 3)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
    assert(out.toSeq === Seq((0, "a b c d", 4), (1, "d e f g", 4), (2, "g", 1)))
    // every token appears in at least one window
    assert(out.flatMap(_._2.split(" ")).toSet === Set("a", "b", "c", "d", "e", "f", "g"))
  }

  test("bloom decontamination equals the broadcast variant row-for-row") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "totally unrelated words that never collide with anything here")
    ).toDF("doc_id", "text")
    val probes = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (101L, "one two three four five six seven eight nine ten more")
    ).toDF("doc_id", "text")
    import graft.dedup.Decontaminate
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val broad = canon(Decontaminate.contaminationReport(
      corpus, col("doc_id"), col("text"), probes, col("text"), gramWidth = 8))
    val bloom = canon(Decontaminate.contaminationReportBloom(
      corpus, col("doc_id"), col("text"), probes, col("text"),
      expectedGrams = 1000L, gramWidth = 8))
    assert(broad === bloom)
    assert(broad.map(_._1) === Set(1L, 2L), "doc 3 shares no 8-gram")
  }

  test("streamingGate drops colliding docs statelessly, batch and stream alike") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.dedup.Decontaminate
    val probes = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val contaminated = "prefix alpha beta gamma delta epsilon zeta eta theta iota suffix"
    val clean = "totally unrelated words that never collide with anything here"
    // batch face of the same predicate (filter works on any DataFrame)
    val batchKept = Decontaminate.streamingGate(
        Seq((1L, contaminated), (2L, clean)).toDF("doc_id", "text"),
        col("text"), probes, col("text"), expectedGrams = 1000L)
      .collect().map(_.getLong(0)).toSet
    assert(batchKept === Set(2L))
    // streaming face: the gate is a stateless projection, so it runs in
    // append mode with no watermark and no state store
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val gated = Decontaminate.streamingGate(
      input.toDF().toDF("doc_id", "text"),
      col("text"), probes, col("text"), expectedGrams = 1000L)
    val q = gated.writeStream.format("memory").queryName("decon_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, contaminated), (2L, clean))
      q.processAllAvailable()
      input.addData((3L, contaminated + " again"), (4L, "another clean doc"))
      q.processAllAvailable()
      val kept = spark.table("decon_out").collect().map(_.getLong(0)).toSet
      assert(kept === Set(2L, 4L),
        "contaminated docs must drop across micro-batches")
      assert(gated.queryExecution.analyzed.collectLeaves().nonEmpty)
    } finally q.stop()
  }

  test("bloom decontamination plan: might_contain probes below the join") {
    val corpus = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val plan = graft.dedup.Decontaminate.contaminationReportBloom(
        corpus, col("doc_id"), col("text"), corpus, col("text"),
        expectedGrams = 100L, gramWidth = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "bloom probe must appear in the physical plan")
  }

  test("topKPerGroup equals a row_number window across partitionings") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(500)(i =>
      (s"g${i % 4}", rnd.nextInt(50).toDouble, i.toLong))
    val df = rows.toDF("g", "s", "i").repartition(7)
    val got = graft.analytics.Ranking.topKPerGroup(df, col("g"), col("s"),
        col("i"), k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3))).toSet
    val want = rows.groupBy(_._1).toSeq.flatMap { case (g, members) =>
      members.sortBy { case (_, s, i) => (-s, i) }.take(5).zipWithIndex
        .map { case ((_, _, i), pos) => (g, i, pos + 1) }
    }.toSet
    assert(got === want)
  }

  test("bm25 plan: doc-frequency and corpus stats broadcast, no extra sort") {
    val plan = Bm25.topK(docs, col("doc_id"), col("text"), Seq("spark"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"))
    assert(plan.contains("TakeOrderedAndProject"),
      "top-k must plan as per-partition heaps, not a global sort")
  }

  test("x109 neymanAllocation: variance earns budget; flat and singleton strata get none") {
    import spark.implicits._
    val df = (Seq(("A", 0.0), ("A", 10.0)) ++ Seq.fill(3)(("B", 5.0)) :+
      (("C", 9.0))).toDF("s", "v").repartition(2)
    val got = graft.sampling.BudgetSelect.neymanAllocation(df, col("s"),
        col("v"), budget = 1000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("A") === ((2L, Some(7.071068), 1.0, 1000.0)))
    assert(got("B") === ((3L, Some(0.0), 0.0, 0.0)))
    assert(got("C")._1 === 1L && got("C")._2.isEmpty && got("C")._4 === 0.0)
  }

  test("x102 waterFill: level caps big groups, small groups saturate, sums to budget") {
    import spark.implicits._
    val caps = Seq(("a", 10L), ("b", 20L), ("c", 100L)).toDF("g", "cap")
    val got = graft.sampling.BudgetSelect.waterFill(caps, col("g"), col("cap"),
        budget = 60L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got("a") === ((10L, 10.0, true)))
    assert(got("b") === ((20L, 20.0, true)))
    assert(got("c") === ((100L, 30.0, false)))
    assert(got.values.map(_._2).sum === 60.0)
  }

  test("x102 waterFill: budget above total capacity gives everyone their cap") {
    import spark.implicits._
    val caps = Seq(("a", 10L), ("b", 20L)).toDF("g", "cap")
    val got = graft.sampling.BudgetSelect.waterFill(caps, col("g"), col("cap"),
        budget = 200L)
      .collect().map(r => r.getString(0) -> ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got === Map("a" -> ((10.0, true)), "b" -> ((20.0, true))))
  }

  test("x102 waterFill: level exactly at a capacity boundary stays unique") {
    import spark.implicits._
    // L = 10 sits exactly on a and b's caps; only segment 3 validates it
    val caps = Seq(("a", 10L), ("b", 10L), ("c", 40L)).toDF("g", "cap")
    val got = graft.sampling.BudgetSelect.waterFill(caps, col("g"), col("cap"),
        budget = 30L)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got === Map("a" -> 10.0, "b" -> 10.0, "c" -> 10.0))
  }
}
