package graft

import org.apache.spark.sql.functions._

import graft.sampling.Sampling

/** Deterministic hash splits and samples. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val ids = spark.range(0, 10000).toDF("id")

  test("splitLabel is deterministic, partitioning-independent, and covers every row") {
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    def run(parts: Int) = ids.repartition(parts)
      .select(col("id"), Sampling.splitLabel(col("id"), w).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = run(1)
    assert(run(7) === a)
    val sizes = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes.keySet === Set("train", "val", "test"))
    // 32-bit hash over 10k buckets: proportions hold to a few percent
    assert(math.abs(sizes("train") / 10000.0 - 0.8) < 0.03)
    assert(math.abs(sizes("val") / 10000.0 - 0.1) < 0.03)
    assert(math.abs(sizes("test") / 10000.0 - 0.1) < 0.03)
  }

  test("independent salts draw independent samples; same salt is stable") {
    val s1 = Sampling.sampleBy(ids, col("id"), 0.5, salt = "a")
      .collect().map(_.getLong(0)).toSet
    val s1b = Sampling.sampleBy(ids, col("id"), 0.5, salt = "a")
      .collect().map(_.getLong(0)).toSet
    val s2 = Sampling.sampleBy(ids, col("id"), 0.5, salt = "b")
      .collect().map(_.getLong(0)).toSet
    assert(s1 === s1b)
    // overlap of two independent 50% draws ~ 25% of rows, far from 0 or 50
    val overlap = s1.intersect(s2).size / 10000.0
    assert(overlap > 0.15 && overlap < 0.35)
  }

  test("membership is stable when the dataset grows (no re-shuffling)") {
    val small = Sampling.sampleBy(spark.range(0, 1000).toDF("id"),
      col("id"), 0.3).collect().map(_.getLong(0)).toSet
    val large = Sampling.sampleBy(ids, col("id"), 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(small === large.filter(_ < 1000))
  }

  test("mixture tags sources, honors fractions, draws independently per source") {
    val out = Sampling.mixture(Seq(
        ("a", ids, 1.0), ("b", ids, 0.5)), col("id"))
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("a") === 10000L) // fraction 1.0 keeps everything
    assert(math.abs(out("b") / 10000.0 - 0.5) < 0.03)
    // same id in both sources: b's draw is independent of a's (per-source
    // salt), so total rows ≈ 1.5n, not n or 2n
    val total = out.values.sum
    assert(total > 14500 && total < 15500)
  }

  test("packSequences: contiguous concat-and-chop per bucket, deterministic") {
    import graft.sampling.Packing
    val docs = ids.limit(100).withColumn("tok", lit(300L))
    def run(parts: Int) = Packing.packSequences(docs.repartition(parts),
        col("id"), col("tok"), budgetTokens = 1000, numBuckets = 4)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("bucket"), r.getAs[Long]("pack_id"),
          r.getAs[Long]("pack_offset"))).toMap
    val a = run(1)
    assert(run(7) === a) // partitioning-independent
    // within each bucket, in id order: offsets advance by 300 mod 1000 and
    // pack_id is the running-total div — verify the invariant directly
    a.toSeq.groupBy(_._2._1).foreach { case (_, rows) =>
      rows.sortBy(_._1).zipWithIndex.foreach { case ((_, (_, pid, off)), i) =>
        val cum = 300L * i
        assert(pid === cum / 1000 && off === cum % 1000)
      }
    }
  }

  test("stratifiedSample keeps listed fractions and drops unlisted strata") {
    val df = ids.withColumn("stratum",
      when(col("id") % 3 === 0, "hi").when(col("id") % 3 === 1, "lo")
        .otherwise("junk"))
    val out = Sampling.stratifiedSample(df, col("stratum"), col("id"),
        Map("hi" -> 1.0, "lo" -> 0.1))
      .groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!out.contains("junk"))
    assert(out("hi") === 3334L) // 100%: every 'hi' row kept
    assert(math.abs(out("lo") / 3333.0 - 0.1) < 0.03)
  }

  test("reservoirSample draws exactly k per group, stable across partitionings") {
    val df = ids.withColumn("g",
      when(col("id") % 2 === 0, "even").otherwise("odd"))
    val out = Sampling.reservoirSample(df, col("g"), col("id"), k = 100)
    val sizes = out.groupBy("group").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes === Map("even" -> 100L, "odd" -> 100L))
    // deterministic: identical membership under a different partitioning
    val again = Sampling.reservoirSample(df.repartition(13), col("g"),
      col("id"), k = 100)
    assert(out.collect().map(_.toSeq).toSet === again.collect().map(_.toSeq).toSet)
    // a group smaller than k yields its full membership
    val tiny = Sampling.reservoirSample(df.filter(col("id") < 10), col("g"),
      col("id"), k = 100)
    assert(tiny.count() === 10L)
  }

  test("weightedSample favors heavy weights, excludes zero, stays deterministic") {
    val df = ids.limit(200).select(col("id"),
      when(col("id") === 7, 50.0).when(col("id") === 13, 0.0)
        .otherwise(1.0).as("w"))
    // the weight-50 doc wins a k=20 slot in (nearly) every independent
    // draw; the zero-weight doc never can
    val hits = (1 to 10).count { s =>
      val picked = Sampling.weightedSample(df, col("id"), col("w"), k = 20,
          salt = s"t$s")
        .collect().map(_.getLong(0)).toSet
      assert(!picked.contains(13L), s"salt t$s selected the zero-weight doc")
      picked.contains(7L)
    }
    assert(hits >= 8, s"weight-50 doc selected only $hits/10 draws")
    // exact determinism across partitionings
    val a = Sampling.weightedSample(df.repartition(1), col("id"), col("w"), 20)
      .collect().map(_.toSeq)
    val b = Sampling.weightedSample(df.repartition(9), col("id"), col("w"), 20)
      .collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("x96 capPerGroup: heap pick equals the naive window rule, deterministic") {
    import spark.implicits._
    val df = (1 to 40).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "g")
    def picked(parts: Int) = Sampling.capPerGroup(df.repartition(parts),
        col("g"), col("id"), cap = 5, salt = "t")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = picked(2)
    assert(got === picked(9), "partitioning must not change the pick")
    // naive rule: smallest (hashKey, id) per group
    val expected = df.select(col("g"), col("id"),
        Sampling.hashKey(col("id"), lit("t")).as("hk"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).toSeq.flatMap { case (g, rows) =>
        rows.sortBy(t => (t._3, t._2)).take(5).map(t => (g, t._2)).toSeq
      }.toSet
    assert(got === expected)
    assert(got.groupBy(_._1).forall(_._2.size == 5))
    // a group smaller than the cap passes through whole
    val small = Seq((1L, "solo"), (2L, "solo")).toDF("id", "g")
    assert(Sampling.capPerGroup(small, col("g"), col("id"), 5, "t")
      .count() === 2)
  }

  test("clusterSplit: cluster members co-split; singletons match splitLabel") {
    import graft.dedup.Dedup
    val w = Seq("train" -> 0.8, "test" -> 0.2)
    val docs = (1L to 300L).toDF("doc_id")
    val labels = docs
      .select(col("doc_id"), Sampling.splitLabel(col("doc_id"), w).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // pick a pair whose id-keyed splits DIFFER — the leak x57 would flag
    val a = labels.find(_._2 == "train").get._1
    val b = labels.find(_._2 == "test").get._1
    val pairs = Seq((math.min(a, b), math.max(a, b))).toDF("doc_a", "doc_b")
    val got = Sampling.clusterSplit(docs, col("doc_id"),
        Dedup.duplicateClusters(pairs), w)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the straddling pair now shares the min-id member's label…
    assert(got(a) === got(b))
    assert(got(a) === labels(math.min(a, b)))
    // …and every unpaired doc keeps its plain id-keyed split
    ((1L to 300L).toSet - a - b).foreach(id => assert(got(id) === labels(id)))
  }

  test("x135 epochMix: whole epochs exact, fractional epoch hash-gated") {
    val docs = (1L to 60L).map(i =>
      (i, if (i <= 20) "hot" else if (i <= 40) "cold" else "plain"))
      .toDF("doc_id", "source")
    val dials = Map("hot" -> ((3, 5000L)), "cold" -> ((0, 2500L)))
    val got = Sampling.epochMix(docs, col("doc_id"), col("source"), dials)
      .collect().map(r => (r.getLong(0), r.getInt(2)))
      .groupBy(_._1).map { case (d, rs) => d -> rs.map(_._2).sorted.toSeq }
    val gate = docs.select(col("doc_id"),
        Sampling.hashBucket(col("doc_id"), "epoch").as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 20L).foreach { d => // hot: 3 whole + gated 4th at epoch 3
      val want = if (gate(d) < 5000) Seq(0, 1, 2, 3) else Seq(0, 1, 2)
      assert(got(d) === want, s"doc $d")
    }
    (21L to 40L).foreach { d => // cold 0.25×: gated presence at epoch 0
      if (gate(d) < 2500) assert(got(d) === Seq(0), s"doc $d")
      else assert(!got.contains(d), s"doc $d")
    }
    (41L to 60L).foreach(d => assert(got(d) === Seq(0), s"doc $d")) // default 1×
    // dial sanity: epochDials round-trips the published factors
    assert(Sampling.epochDials(3.5) === ((3, 5000L)))
    assert(Sampling.epochDials(0.25) === ((0, 2500L)))
    assert(Sampling.epochDials(1.0) === ((1, 0L)))
  }

  test("x132 assignShards: partition-count independent, equals the global scan") {
    import graft.sampling.Sharding
    val docs = (1L to 200L).map(i => (i, 50 + (i * 17) % 300))
      .toDF("doc_id", "n_chars")
    def run(p: Int): Map[Long, Long] =
      Sharding.assignShards(docs, col("doc_id"), col("n_chars"),
          shardChars = 2000L, partitions = p)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = run(5)
    // the scan's value is independent of where the range cuts fall
    assert(got === run(2))
    assert(got === run(1))
    // driver-side truth: same hash order, one sequential cumsum
    def hk(id: Long): BigInt = BigInt(java.security.MessageDigest
      .getInstance("MD5").digest(s"shard$id".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString, 16)
    val ordered = (1L to 200L).sortBy(i => (hk(i), i))
    var cum = 0L
    val want = ordered.map { i =>
      val sz = 50 + (i * 17) % 300
      val sh = cum / 2000L; cum += sz; i -> sh
    }.toMap
    assert(got === want)
    // greedy packing bound: every shard ≤ shardChars + maxDoc − 1
    val stats = Sharding.shardStats(
        Sharding.assignShards(docs, col("doc_id"), col("n_chars"), 2000L))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(stats.values.forall(_ <= 2000L + 349 - 1))
    assert(stats.values.sum === (1L to 200L).map(i => 50 + (i * 17) % 300).sum)
  }

  test("x133 matchedSample: per-bucket counts are min(want, have)") {
    import graft.sampling.Sharding
    // treatment: 3 docs in bucket 0 (len < 64), 1 in bucket 1
    val treat = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 100L))
      .toDF("doc_id", "n_chars")
    // control: 2 in bucket 0 (scarce → under-fill), 5 in bucket 1, 2 in
    // bucket 2 (no treatment → excluded)
    val ctrl = Seq((11L, 15L), (12L, 25L), (13L, 70L), (14L, 80L),
      (15L, 90L), (16L, 100L), (17L, 110L), (18L, 130L), (19L, 140L))
      .toDF("doc_id", "n_chars")
    val sel = ctrl.filter(col("n_chars") < 128)
    val got = Sharding.matchedSample(treat, ctrl, col("doc_id"),
        col("n_chars"), bucketWidth = 64L)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.count(_._2 == 0L) === 2) // both scarce controls kept
    assert(got.count(_._2 == 1L) === 1) // exactly want=1 of the 5
    assert(got.count(_._2 == 2L) === 0) // bucket with no treatment: none
    // determinism: same pick on re-run
    val again = Sharding.matchedSample(treat, ctrl, col("doc_id"),
        col("n_chars"), bucketWidth = 64L)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSet === again.toSet)
    assert(sel.count() >= got.length) // sanity: picks come from control
  }

  test("x162 paddingWaste: bucket assignment, waste and truncation closed form") {
    import graft.sampling.Packing
    // token counts 3, 8, 8, 9, 20: edges (8, 16) → bucket 8: {3,8,8},
    // bucket 16: {9}, clamp: {20} → 16 with 4 tokens truncated
    val df = Seq("a b c", "a b c d e f g h", "1 2 3 4 5 6 7 8",
      "1 2 3 4 5 6 7 8 9", ('a' to 't').mkString(" ")).toDF("text")
    val got = Packing.paddingWaste(df,
        graft.text.TextAnalysis.tokenCount(col("text")), Seq(8, 16))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    def r6(d: Double) = math.rint(d * 1e6) / 1e6
    // bucket 8: 3 docs, 19 true tokens, 24 padded → waste 5/24
    assert(got(8L) === ((3L, 19L, 24L, 0L, r6(1.0 - 19.0 / 24.0))))
    // bucket 16: doc of 9 (waste 7/16·…) and the clamped doc of 20
    // (keeps 16, truncates 4): kept = 9 + 16 = 25 of 32 padded
    assert(got(16L) === ((2L, 29L, 32L, 4L, r6(1.0 - 25.0 / 32.0))))
  }

  test("x173 shardManifest: checksum is order/partition-invariant, diffs flag content") {
    import graft.sampling.Sharding
    val docs = Seq((1L, 0, "alpha"), (2L, 0, "beta"), (3L, 1, "gamma"),
      (4L, 1, "delta")).toDF("id", "sh", "t")
    def manifest(df: org.apache.spark.sql.DataFrame): Map[Int, (Long, Long, Long)] =
      Sharding.shardManifest(df, col("sh"), col("id"), col("t"))
        .collect().map(r => r.getInt(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(5)))).toMap
    val base = manifest(docs)
    assert(base(0)._1 === 2L && base(0)._2 === 9L) // alpha+beta chars
    // invariant to row order and partitioning (the SUM is commutative)
    assert(base === manifest(docs.orderBy(col("id").desc).repartition(7)))
    // driver-side truth for one row's contribution
    def h32(id: Long, t: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:$t".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString, 16)
    assert(base(1)._3 === h32(3L, "gamma") + h32(4L, "delta"))
    // a single changed payload flips exactly its shard's checksum
    val tampered = manifest(Seq((1L, 0, "alpha"), (2L, 0, "betA"),
      (3L, 1, "gamma"), (4L, 1, "delta")).toDF("id", "sh", "t"))
    assert(tampered(0)._3 !== base(0)._3)
    assert(tampered(1) === base(1))
  }

  test("x175 manifestDiff: each verdict class from a hand-built run pair") {
    import graft.sampling.Sharding
    // shard 0: identical. shard 1: run B loses a row (count_drift wins
    // over the checksum change it also causes). shard 2: same count,
    // one payload edited (checksum_drift — the silent class). shard 3:
    // only in run A (missing_b). shard 4: only in run B (missing_a).
    val docsA = Seq((1L, 0, "a"), (2L, 0, "b"),
      (3L, 1, "c"), (4L, 1, "d"),
      (5L, 2, "e"), (6L, 2, "f"),
      (7L, 3, "g")).toDF("id", "sh", "t")
    val docsB = Seq((1L, 0, "a"), (2L, 0, "b"),
      (3L, 1, "c"),
      (5L, 2, "e"), (6L, 2, "F"),
      (8L, 4, "h")).toDF("id", "sh", "t")
    def m(df: org.apache.spark.sql.DataFrame) =
      Sharding.shardManifest(df, col("sh"), col("id"), col("t"))
    val got = Sharding.manifestDiff(m(docsA), m(docsB)).collect()
      .map(r => r.getInt(0) -> ((Option(r.get(1)), Option(r.get(2)),
        r.getString(3)))).toMap
    assert(got(0) === ((Some(2L), Some(2L), "unchanged")))
    assert(got(1) === ((Some(2L), Some(1L), "count_drift")))
    assert(got(2) === ((Some(2L), Some(2L), "checksum_drift")))
    assert(got(3) === ((Some(1L), None, "missing_b")))
    assert(got(4) === ((None, Some(1L), "missing_a")))
    assert(got.size === 5)
  }

  test("x180 curriculum schedule: √(e/E) boundaries inclusive, full corpus " +
      "by the last epoch, ties collapse onto one spine row") {
    val df = (1 to 10).map(_.toLong).toDF("diff")
    val got = graft.sampling.Curriculum.schedule(df, col("diff"), epochs = 5)
      .collect().map(r => r.getInt(0) ->
        ((r.getDouble(1), r.getLong(2), r.getDouble(3)))).toMap
    // pr(v) = v/10; c(e) = √(e/5) → epoch slice = ⌊10·c(e)⌋ easiest docs
    val wantN = Map(1 -> 4L, 2 -> 6L, 3 -> 7L, 4 -> 8L, 5 -> 10L)
    (1 to 5).foreach { e =>
      val (c, n, mean) = got(e)
      assert(c === math.rint(math.sqrt(e / 5.0) * 1e6) / 1e6)
      assert(n === wantN(e), s"epoch $e size")
      val want = (1L to wantN(e)).sum.toDouble / wantN(e)
      assert(mean === math.rint(want * 1e6) / 1e6, s"epoch $e mean")
    }
    // duplicated difficulty values: n_docs counts ROWS, and a value is
    // in or out atomically (all its rows share one percentile)
    val ties = Seq(1L, 1L, 1L, 9L).toDF("diff")
    val t = graft.sampling.Curriculum.schedule(ties, col("diff"), epochs = 5)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    // pr(1)=0.75, pr(9)=1.0: epochs 1 (c=.447) and 2 (c=.632) see nothing
    // → absent rows; epochs 3/4 see the three 1s; epoch 5 sees all 4
    assert(!t.contains(1) && !t.contains(2))
    assert(t(3) === 3L && t(4) === 3L && t(5) === 4L)
  }

  test("x203 freshnessEss: uniform age reads ess = n; a stale tail " +
      "collapses the effective size; hand Kish on two rows") {
    import spark.implicits._
    import graft.sampling.Importance
    val uniform = Seq(("a", 10), ("a", 10), ("a", 10)).toDF("src", "age")
    val u = Importance.freshnessEss(uniform, col("src"), col("age"),
      halfLifeDays = 90.0).head()
    // equal weights: (3w)²/(3w²) = 3 exactly
    assert(u.getAs[Long]("n") === 3L)
    assert(u.getAs[Double]("ess") === 3.0)
    assert(u.getAs[Double]("ess_ratio") === 1.0)
    // hand Kish: ages 0 and 90 at half-life 90 -> weights 1 and 0.5,
    // ess = (1.5)²/(1.25) = 1.8
    val two = Seq(("b", 0), ("b", 90)).toDF("src", "age")
    val t2 = Importance.freshnessEss(two, col("src"), col("age"),
      halfLifeDays = 90.0).head()
    assert(t2.getAs[Double]("sum_w") === 1.5)
    assert(t2.getAs[Double]("ess") === 1.8)
    assert(t2.getAs[Double]("ess_ratio") === 0.9)
    // a mostly-stale source: ess_ratio well under the uniform 1.0
    val stale = (Seq(("c", 0)) ++ Seq.fill(9)(("c", 900))).toDF("src", "age")
    val s = Importance.freshnessEss(stale, col("src"), col("age"),
      halfLifeDays = 90.0).head()
    assert(s.getAs[Long]("n") === 10L)
    assert(s.getAs[Double]("ess_ratio") < 0.2)
  }

  test("x212 clippedEss: hand Kish before/after a median clip, mass " +
      "bound beside the variance gain") {
    import spark.implicits._
    import graft.sampling.Importance
    // weights (1,1,1,1,10), p=.5 -> clip at 1: raw ess 196/104, clipped
    // ess 5 (uniform), one row clipped, kept mass 5/14
    val rows = Seq(("g", 1.0), ("g", 1.0), ("g", 1.0), ("g", 1.0),
      ("g", 10.0)).toDF("src", "w")
    val r = Importance.clippedEss(rows, col("src"), col("w"), p = 0.5)
      .head()
    assert(r.getAs[Long]("n") === 5L)
    assert(r.getAs[Double]("clip") === 1.0)
    assert(r.getAs[Double]("ess_raw") ===
      math.rint(196.0 / 104.0 * 1e6) / 1e6)
    assert(r.getAs[Double]("ess_clipped") === 5.0)
    assert(r.getAs[Long]("n_clipped") === 1L)
    assert(r.getAs[Double]("clipped_frac") === 0.2)
    assert(r.getAs[Double]("mass_ratio") ===
      math.rint(5.0 / 14.0 * 1e6) / 1e6)
    // a higher percentile clips less aggressively: interpolated clip
    // 1 + 0.6*(10-1) = 6.4 at p=.9, more mass kept, smaller ESS gain
    val hi = Importance.clippedEss(rows, col("src"), col("w"), p = 0.9)
      .head()
    assert(hi.getAs[Double]("clip") === 6.4)
    assert(hi.getAs[Double]("mass_ratio") > r.getAs[Double]("mass_ratio"))
    assert(hi.getAs[Double]("ess_clipped") < r.getAs[Double]("ess_clipped"))
    assert(hi.getAs[Double]("ess_clipped") > r.getAs[Double]("ess_raw"))
  }

  test("x213 retentionCut: first spine crossing, whole-doc overshoot, " +
      "per-source winners and losers") {
    import spark.implicits._
    import graft.sampling.BudgetSelect
    val rows = Seq(("a", 0.9, 100L), ("a", 0.5, 100L),
      ("b", 0.7, 100L), ("b", 0.3, 100L)).toDF("src", "q", "tk")
    // total 400, retain .6 -> 240; spine desc cum: 100, 200, 300 -> q*=.5
    val got = BudgetSelect.retentionCut(rows, col("src"), col("q"),
        col("tk"), retain = 0.6)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("a").getAs[Double]("threshold") === 0.5)
    assert(got("a").getAs[Long]("kept_docs") === 2L)
    assert(got("a").getAs[Double]("retention") === 1.0)
    assert(got("b").getAs[Long]("kept_docs") === 1L)
    assert(got("b").getAs[Double]("retention") === 0.5)
    // tighter target: first cell alone crosses 0.25·400 -> q*=.9, source
    // b keeps nothing — reported as 0, not dropped
    val tight = BudgetSelect.retentionCut(rows, col("src"), col("q"),
        col("tk"), retain = 0.25)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(tight("a").getAs[Double]("threshold") === 0.9)
    assert(tight("b").getAs[Long]("kept_tokens") === 0L)
    assert(tight("b").getAs[Double]("retention") === 0.0)
  }

  test("x214 strideInterleave: a 5-doc prefix carries both sources at " +
      "exactly their target share; partition-cut independent") {
    import spark.implicits._
    import graft.sampling.Sharding
    // big: 16 docs (w=4, vts (i+.5)/4), small: 1 doc (w=1, vt .5) ->
    // first 5 slots = big,big,small,big,big — shares .8/.2 == targets
    val rows = ((1L to 16L).map(i => (i, "big")) :+ ((100L, "small")))
      .toDF("doc_id", "source")
    def run(parts: Int) = Sharding.strideInterleave(rows, col("doc_id"),
        col("source"), prefixes = Seq(2L, 5L, 32L), partitions = parts)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    val got = run(32)
    assert(got((5L, "big")) === ((4L, 0.8, 0.8, 0.0)))
    assert(got((5L, "small")) === ((1L, 0.2, 0.2, 0.0)))
    // a 2-doc prefix cannot hold the small source yet: zero-filled row
    assert(got((2L, "small"))._1 === 0L)
    assert(got((2L, "big")) === ((2L, 1.0, 0.8, 0.2)))
    // prefix past the corpus: shares settle at the raw mix n_s/n
    assert(got((32L, "big"))._2 === math.rint(16.0 / 17.0 * 1e6) / 1e6)
    // the distributed rank must not depend on where partitions cut
    assert(run(3) === got)
  }
}
