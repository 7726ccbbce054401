package graft

import org.apache.spark.sql.functions._

import graft.analytics.Evaluation

/** AUC and calibration on fixtures small enough to rank by hand. */
class EvaluationSpec extends SparkSpec {
  import spark.implicits._

  test("auc: hand-computed midrank value on a tied fixture") {
    // scores asc: 0.1(n), 0.2(n), 0.2(p), 0.5(p) — the 0.2 tie straddles
    // classes, so the midrank path is actually exercised.
    // Ranks: 0.1→1, the 0.2s→2.5 each, 0.5→4. R+ = 2.5 + 4 = 6.5.
    // AUC = (6.5 − 2·3/2) / (2·2) = 3.5/4 = 0.875.
    val df = Seq((0.1, 0), (0.2, 0), (0.2, 1), (0.5, 1)).toDF("s", "y")
    val r = Evaluation.auc(df, col("s"), col("y")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 2L, 0L)))
    assert(r.getDouble(3) === 0.875)
  }

  test("auc: perfect separation is 1.0, reversed is 0.0, nulls counted out") {
    val df = Seq((0.9, Some(1)), (0.8, Some(1)), (0.2, Some(0)),
      (0.1, Some(0)), (0.5, None)).toDF("s", "y")
    val r = Evaluation.auc(df, col("s"), col("y")).collect().head
    assert(r.getDouble(3) === 1.0)
    assert(r.getLong(2) === 1L) // the null-label row is reported, not scored
    val rev = Evaluation.auc(df, -col("s"), col("y")).collect().head
    assert(rev.getDouble(3) === 0.0)
  }

  test("auc: non-binary label raises instead of silently mis-counting") {
    val bad = Seq((0.5, 2)).toDF("s", "y")
    val e = intercept[Exception] {
      Evaluation.auc(bad, col("s"), col("y")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("label must be 0/1")))
  }

  test("aucBy: per-group values, one-class group is null not 0.5") {
    val df = Seq(
      // g1 = the global fixture's 0.875 case
      ("g1", 0.1, 0), ("g1", 0.2, 0), ("g1", 0.2, 1), ("g1", 0.5, 1),
      // g2: score ranks REVERSED inside the group → 0.0, even though its
      // rows would look fine pooled with g1 (the Simpson slice)
      ("g2", 0.9, 0), ("g2", 0.3, 1),
      // g3: positives only → AUC undefined
      ("g3", 0.4, 1), ("g3", 0.6, 1)
    ).toDF("g", "s", "y")
    val got = graft.analytics.Evaluation.aucBy(df, col("g"), col("s"), col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)))).toMap
    assert(got("g1") === ((2L, 2L, Some(0.875))))
    assert(got("g2") === ((1L, 1L, Some(0.0))))
    assert(got("g3") === ((2L, 0L, None)))
  }

  test("calibration: exact bins, boundary score lands in its own bin") {
    // 0.3 is a bin BOUNDARY: IEEE 0.3·10 = 2.999… floors to 2, but the
    // integer micro-unit path (300000·10/10⁶ = 3) must put it in bin 3
    val df = Seq((0.3, 1), (0.35, 0), (0.05, 0), (1.0, 1)).toDF("p", "y")
    val got = Evaluation.calibration(df, col("p"), col("y"), bins = 10)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got === Map(
      0 -> ((1L, 0.05, 0.0)),
      3 -> ((2L, 0.325, 0.5)),
      9 -> ((1L, 1.0, 1.0)))) // p = 1.0 clamps into the top bin
  }

  test("ndcg: ideal ranking scores 1, swapped ranking pays the discount") {
    import graft.analytics.Evaluation
    val rels = Seq((1L, 10L, 3L), (1L, 11L, 1L), (2L, 10L, 2L))
      .toDF("query_id", "doc_id", "rel")
    // q1 ideal order: doc10(rel3) then doc11(rel1)
    val ideal = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "doc_id", "rnk")
    val gotI = Evaluation.ndcg(ideal, rels, k = 10).collect().head
    assert(gotI.getDouble(3) === 1.0)
    // swapped: dcg = (2^1−1)/log2(2) + (2^3−1)/log2(3); idcg = 7 + 1/log2(3)
    val swapped = Seq((1L, 11L, 1), (1L, 10L, 2)).toDF("query_id", "doc_id", "rnk")
    val gotS = Evaluation.ndcg(swapped, rels, k = 10).collect().head
    val dcg = 1.0 + 7.0 / (math.log(3) / math.log(2))
    val idcg = 7.0 + 1.0 / (math.log(3) / math.log(2))
    assert(math.abs(gotS.getDouble(1) - math.rint(dcg * 1e6) / 1e6) < 2e-6)
    assert(math.abs(gotS.getDouble(3) -
      math.rint(math.rint(dcg * 1e6) / 1e6 / (math.rint(idcg * 1e6) / 1e6)
        * 1e6) / 1e6) < 2e-6)
    // a query with no relevant docs: dcg 0, idcg null, ndcg null not 0
    val blind = Seq((9L, 10L, 1)).toDF("query_id", "doc_id", "rnk")
    val gotB = Evaluation.ndcg(blind, rels, k = 10).collect().head
    assert(gotB.getDouble(1) === 0.0 && gotB.isNullAt(2) && gotB.isNullAt(3))
  }

  test("calibration: ece terms sum to the expected calibration error") {
    val df = Seq((0.1, 0), (0.1, 0), (0.9, 1), (0.9, 0)).toDF("p", "y")
    val rows = Evaluation.calibration(df, col("p"), col("y")).collect()
    // bin 1: conf .1 acc 0 → gap .1, weight .5; bin 9: conf .9 acc .5 →
    // gap .4, weight .5 → ECE = .05 + .2 = .25
    assert(math.abs(rows.map(_.getAs[Double]("ece_term")).sum - 0.25) < 1e-12)
  }

  test("calibration: probability outside [0,1] raises") {
    val e = intercept[Exception] {
      Evaluation.calibration(Seq((1.2, 1)).toDF("p", "y"), col("p"), col("y"))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("outside [0,1]")))
  }

  test("x142 kappaBy: textbook 2x2 kappa; disjoint-label group is 0") {
    // classic 50-item fixture: 20 yes/yes, 15 no/no, 10 yes/no, 5 no/yes
    // po = 35/50 = 0.7; pe = (30·25 + 20·25)/2500 = 0.5; kappa = 0.4
    val g1 = Seq.fill(20)(("g1", "yes", "yes")) ++
      Seq.fill(15)(("g1", "no", "no")) ++
      Seq.fill(10)(("g1", "yes", "no")) ++ Seq.fill(5)(("g1", "no", "yes"))
    // raters with DISJOINT label sets: pe = 0, po = 0 → kappa exactly 0
    val g2 = Seq.fill(3)(("g2", "x", "y"))
    val df = (g1 ++ g2).toDF("g", "a", "b").repartition(4)
    val got = Evaluation.kappaBy(df, col("g"), col("a"), col("b"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(got("g1") === ((50L, 35L, 0.7, 0.5, 0.4)))
    assert(got("g2") === ((3L, 0L, 0.0, 0.0, 0.0)))
    // both raters constant AND identical: pe = 1, the 0/0 case → null
    val const = Evaluation.kappaBy(Seq(("g", "a", "a"), ("g", "a", "a"))
      .toDF("g", "a", "b"), col("g"), col("a"), col("b")).head()
    assert(const.getDouble(3) === 1.0 && const.isNullAt(5))
  }

  test("x156 krippendorffAlpha: hand case, singles excluded, degenerate null") {
    // i1 {a,a}, i2 {a,b}, i3 {b,b}, i4 {a} (single rating — excluded)
    // D_o = (0 + 2 + 0)/6 = 1/3; D_e = (36 − 18)/30 = .6 → α = 1 − 5/9
    val df = Seq(("i1", "a"), ("i1", "a"), ("i2", "a"), ("i2", "b"),
      ("i3", "b"), ("i3", "b"), ("i4", "a")).toDF("i", "r").repartition(3)
    val r = Evaluation.krippendorffAlpha(df, col("i"), col("r")).head()
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) ===
      ((3L, 6L, 0.444444)))
    // perfect agreement across 2 classes: D_o = 0 → α = 1 exactly
    val perfect = Evaluation.krippendorffAlpha(
      Seq(("i1", "a"), ("i1", "a"), ("i2", "b"), ("i2", "b")).toDF("i", "r"),
      col("i"), col("r")).head()
    assert(perfect.getDouble(2) === 1.0)
    // every kept rating identical: D_e = 0 — agreement undefined, null
    val degen = Evaluation.krippendorffAlpha(
      Seq(("i1", "a"), ("i1", "a"), ("i2", "a"), ("i2", "a")).toDF("i", "r"),
      col("i"), col("r")).head()
    assert(degen.isNullAt(2))
  }

  test("x157 cuped: perfect covariate zeroes variance, constant x is a no-op") {
    import graft.analytics.Evaluation
    // y = x + 10 exactly → pooled θ = 1, every adjusted value = ȳ = 12.5
    val units = Seq(("A", 1.0, 11.0), ("A", 3.0, 13.0),
      ("B", 2.0, 12.0), ("B", 4.0, 14.0)).toDF("variant", "x", "y")
      .repartition(3)
    val got = Evaluation.cuped(units, col("variant"), col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    assert(got("A") === ((2L, 12.0, 12.5, 2.0, 0.0, 1.0)))
    assert(got("B") === ((2L, 13.0, 12.5, 2.0, 0.0, 1.0)))
    // constant covariate: var(x) = 0 → θ = 0, adjusted = raw
    val flat = Seq(("A", 5.0, 1.0), ("A", 5.0, 3.0)).toDF("variant", "x", "y")
    val f = Evaluation.cuped(flat, col("variant"), col("x"), col("y")).head()
    assert(f.getDouble(2) === f.getDouble(3) &&
      f.getDouble(4) === f.getDouble(5) && f.getDouble(6) === 0.0)
  }

  test("x171 conformalGate matches a hand-computed order statistic; vacuous k<1") {
    import graft.sampling.Sampling
    // the hash split is deterministic but opaque — recompute it HERE with
    // the same function and derive the expected threshold/flags in Scala,
    // so the assertion follows the definition, not the implementation
    val rows = (1L to 400L).map(i => (i, (i % 3).toString,
      math.rint(i / 400.0 * 1e6) / 1e6))
    val df = rows.toDF("id", "grp", "sc").repartition(5)
    val calBuckets = Sampling.Buckets / 5
    val calIds = df.select(col("id"),
        Sampling.hashBucket(col("id"), "conformal").as("b"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1) < calBuckets)).toMap
    val calScores = rows.filter(r => calIds(r._1)).map(_._3).sorted
    val k = math.floor(0.1 * (calScores.size + 1)).toLong
    assert(k >= 1, s"fixture too small: n_cal=${calScores.size}")
    val thr = calScores(k.toInt - 1)
    val eval = rows.filterNot(r => calIds(r._1))
    val expected = eval.groupBy(_._2).map { case (g, rs) =>
      g -> ((rs.size.toLong, rs.count(_._3 < thr).toLong))
    }
    val got = Evaluation.conformalGate(df, col("id"), col("grp"), col("sc"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(4)))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (g, (n, fl)) =>
      assert(got(g) === ((n, fl, thr)), s"group $g")
    }
    // vacuous bound: floor(alpha·(n_cal+1)) < 1 → null threshold, 0 flags
    val v = Evaluation.conformalGate(df, col("id"), col("grp"), col("sc"),
      alpha = 0.001).collect()
    assert(v.forall(r => r.isNullAt(4) && r.getLong(2) === 0L))
  }

  test("conformalGate order statistic is IEEE-double at alpha=0.29, " +
      "n_cal=99 — where decimal and double floor diverge (k=28, not 29)") {
    import graft.sampling.Sampling
    // 0.29·(99+1) = 28.999…996 in double → k=28, but exactly 29 in
    // decimal arithmetic (a bare DuckDB 0.29 literal). The gate's
    // contract is double-on-both-engines (the oracle writes
    // CAST(α AS DOUBLE)); this pins the Scala side so a future
    // "simplification" to decimal semantics fails loudly instead of
    // silently shifting the statistic. (Note 0.3·10 is NOT such a case —
    // the product rounds to exactly 3.0; the trap needs an α·(n+1) whose
    // nearest double lies strictly below the integer.)
    assert(math.floor(0.29 * 100.0).toLong === 28L,
      "platform sanity: 0.29*100 must floor to 28 in IEEE double")
    val calBuckets = Sampling.Buckets / 5
    val buckets = spark.range(1L, 2000L)
      .select(col("id"), Sampling.hashBucket(col("id"), "conformal").as("b"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1) < calBuckets))
    // exactly 99 calibration ids (scores 0.01·1..99) + 20 eval ids
    val calIds = buckets.collect { case (i, true) => i }.take(99)
    val evalIds = buckets.collect { case (i, false) => i }.take(20)
    assert(calIds.length === 99 && evalIds.length === 20)
    val rows = calIds.zipWithIndex.map { case (i, j) =>
      (i, "g", math.rint(0.01 * (j + 1) * 1e6) / 1e6) } ++
      evalIds.map(i => (i, "g", 0.5))
    val out = Evaluation.conformalGate(rows.toSeq.toDF("id", "grp", "sc"),
      col("id"), col("grp"), col("sc"), alpha = 0.29).head()
    // k=28 → threshold is the 28th-smallest calibration score, 0.28;
    // decimal-floor semantics would report the 29th (0.29)
    assert(out.getDouble(4) === 0.28,
      s"double-floor contract broken: thr=${out.getDouble(4)}")
  }

  test("x174 mondrianGate: per-group order statistics; eval-only group vacuous") {
    import graft.sampling.Sampling
    // groups get DISJOINT score bands (grp g's scores live in [10g, 10g+1])
    // so per-group thresholds are provably different from each other and
    // from any global statistic — the group-conditioning is load-bearing,
    // not decorative
    val rows = (1L to 400L).map(i => (i, (i % 3).toString,
      (i % 3) * 10.0 + math.rint(i / 400.0 * 1e6) / 1e6))
    val calBuckets = Sampling.Buckets / 5
    val df0 = rows.toDF("id", "grp", "sc").repartition(5)
    // recompute the hash split HERE (same function) and derive each
    // group's expected threshold in Scala — assertion follows definition
    val calIds = df0.select(col("id"),
        Sampling.hashBucket(col("id"), "conformal").as("b"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1) < calBuckets)).toMap
    val alpha = 0.25
    val expected = rows.groupBy(_._2).map { case (g, rs) =>
      val cal = rs.filter(r => calIds(r._1)).map(_._3).sorted
      val k = math.floor(alpha * (cal.size + 1)).toLong
      val thr = if (k >= 1) Some(cal(k.toInt - 1)) else None
      val eval = rs.filterNot(r => calIds(r._1))
      g -> ((eval.size.toLong,
        thr.map(t => eval.count(_._3 < t).toLong).getOrElse(0L), thr))
    }
    // an eval-only group (no calibration rows at all) must surface as a
    // vacuous null-threshold row, not vanish from the report
    val evalOnlyIds = spark.range(401L, 601L)
      .select(col("id"), Sampling.hashBucket(col("id"), "conformal").as("b"))
      .collect().collect { case r if r.getLong(1) >= calBuckets => r.getLong(0) }
      .sorted.take(5)
    assert(evalOnlyIds.length === 5, "fixture needs 5 eval-split ids above 400")
    val df = df0.union(evalOnlyIds.map(i => (i, "z", 99.0)).toSeq
      .toDF("id", "grp", "sc"))
    val got = Evaluation.mondrianGate(df, col("id"), col("grp"), col("sc"),
        alpha = alpha).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(got.keySet === expected.keySet + "z")
    expected.foreach { case (g, e) => assert(got(g) === e, s"group $g") }
    assert(got("z") === ((5L, 0L, None)))
    // the three live thresholds are distinct (one per score band) — a
    // global gate would collapse them to one
    val thrs = expected.values.flatMap(_._3).toSet
    assert(thrs.size === 3, s"expected 3 distinct group thresholds: $thrs")
  }

  test("x185 sprtGate: textbook crossings, FIRST-crossing semantics, " +
      "undecided stays open") {
    val lrD = math.log(0.5 / 0.3)
    val lrO = math.log((1 - 0.5) / (1 - 0.3))
    val thrA = math.log(0.95 / 0.05)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // rej: pure defects cross +A at ⌈A/lrD⌉ = 6; acc: pure oks cross −A
    // at ⌈A/|lrO|⌉ = 9; und: alternating stays inside; flip: 6 defects
    // (crossing) then 10 oks — the decision is the FIRST crossing even
    // though the final LLR has wandered back under the bar
    assert(math.ceil(thrA / lrD) === 6.0 && math.ceil(thrA / -lrO) === 9.0)
    val rows =
      (1 to 8).map(i => ("rej", i.toLong, true)) ++
      (1 to 10).map(i => ("acc", i.toLong, false)) ++
      (1 to 4).map(i => ("und", i.toLong, i % 2 == 1)) ++
      (1 to 16).map(i => ("flip", i.toLong, i <= 6))
    val df = rows.toDF("src", "ord", "bad")
    val got = Evaluation.sprtGate(df, col("src"), col("ord"), col("bad"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getString(3), r.getDouble(4)))).toMap
    // expected finals fold sequentially, matching the window's
    // left-to-right accumulation (n·x can differ from Σx by an ulp)
    def fold(ls: Seq[Double]) = r6(ls.foldLeft(0.0)(_ + _))
    assert(got("rej") === ((8L, Some(6L), "reject", fold(Seq.fill(8)(lrD)))))
    assert(got("acc") === ((10L, Some(9L), "accept", fold(Seq.fill(10)(lrO)))))
    assert(got("und")._2 === None && got("und")._3 === "undecided")
    assert(got("flip")._2 === Some(6L) && got("flip")._3 === "reject")
    assert(got("flip")._4 === fold(Seq.fill(6)(lrD) ++ Seq.fill(10)(lrO)))
  }

  test("x184 clusterAgreement: hand contingency, perfect = 1, " +
      "degenerate single cluster = 0") {
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // labels aaabbb vs clusters 112233: contingency (a,1)=2 (a,2)=1
    // (b,2)=1 (b,3)=2 → sij=2, sa=6, sb=3, n=6
    val df = Seq(("a", 1L), ("a", 1L), ("a", 2L), ("b", 2L), ("b", 3L),
      ("b", 3L)).toDF("lab", "clu")
    val got = Evaluation.clusterAgreement(df, col("lab"), col("clu")).head()
    assert(got.getLong(0) === 6L && got.getLong(1) === 2L &&
      got.getLong(2) === 3L)
    val ea = 6.0 * 3.0 / 15.0
    assert(got.getDouble(3) === r6((2.0 - ea) / ((6.0 + 3.0) / 2.0 - ea)))
    val i = 2.0 * (2.0 / 6.0) * math.log(6.0 * 2.0 / (3.0 * 2.0))
    val ha = math.log(2.0)
    val hb = math.log(3.0)
    assert(math.abs(got.getDouble(4) - 2.0 * i / (ha + hb)) < 1e-6)
    // identical assignments agree perfectly
    val same = Evaluation.clusterAgreement(df, col("lab"), col("lab")).head()
    assert(same.getDouble(3) === 1.0 && same.getDouble(4) === 1.0)
    // all-one-cluster: chance-level ARI (0) and zero NMI — the purity
    // gamer this panel exists to catch
    val one = Evaluation.clusterAgreement(df.withColumn("one", lit(1L)),
      col("lab"), col("one")).head()
    assert(one.getDouble(3) === 0.0 && one.getDouble(4) === 0.0)
  }

  test("x183 bootstrapCi: weights and replicate means reproduced " +
      "independently; point mean exact") {
    val df = (1L to 20L).map(i => (i, i)).toDF("id", "v")
    val got = Evaluation.bootstrapCi(df, col("id"), col("v")).head()
    assert(got.getLong(0) === 20L)
    assert(got.getDouble(1) === 10.5) // Σ1..20 / 20, exact in double
    // independent recomputation of the 32 hash-Poisson replicate means
    val cs = Evaluation.PoissonCdf
    def w(id: Long, b: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"boot${b / 4}:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(
        hex.substring((b % 4) * 8, (b % 4) * 8 + 8), 16)
        .toDouble / 4294967296.0
      cs.zipWithIndex.collectFirst { case (c, j) if u < c => j.toLong }
        .getOrElse(6L)
    }
    val means = (0 until 32).map { b =>
      val sx = (1L to 20L).map(i => w(i, b) * i).sum
      val sw = (1L to 20L).map(i => w(i, b)).sum
      assert(sw > 0L)
      math.rint(sx.toDouble / sw.toDouble * 1e6) / 1e6
    }.sorted
    assert(got.getDouble(2) === means(1)) // 2nd order statistic
    assert(got.getDouble(3) === means(30)) // 31st
    // the SQL-surface builder draws the SAME weights as the audit's
    // pre-projected md5 stream, for every (id, replicate)
    val pw = df.crossJoin(spark.range(0, 32).toDF("b"))
      .select(col("id"), col("b"),
        Evaluation.poissonWeight(col("id"), col("b")).as("w"))
      .collect()
    assert(pw.length === 20 * 32)
    pw.foreach { r =>
      assert(r.getLong(2) === w(r.getLong(0), r.getLong(1).toInt),
        s"id ${r.getLong(0)} b ${r.getLong(1)}")
    }
    // the ~94% interval straddles the point estimate on this fixture
    assert(got.getDouble(2) < 10.5 && got.getDouble(3) > 10.5)
    // Poisson(1) CDF thresholds: c₀ = e⁻¹ and the sequence is the partial
    // factorial sums, ending near but below 1
    assert(cs.head === math.exp(-1.0))
    assert(cs === cs.sorted && cs.last < 1.0 && cs.last > 0.999)
  }

  test("x200 bcubed: perfect partition scores 1, a mega-merge is charged " +
      "per record") {
    import spark.implicits._
    // truth: {1,2}, {3,4}; prediction A matches exactly
    val perfect = Seq((1L, 10L, 100L), (2L, 10L, 100L),
      (3L, 20L, 200L), (4L, 20L, 200L)).toDF("rid", "pred", "truth")
    val a = Evaluation.bcubed(perfect, col("pred"), col("truth")).head()
    assert(a.getAs[Long]("n_records") === 4L)
    assert(a.getAs[Long]("n_pred_entities") === 2L)
    assert(a.getAs[Double]("bcubed_precision") === 1.0)
    assert(a.getAs[Double]("bcubed_recall") === 1.0)
    assert(a.getAs[Double]("bcubed_f1") === 1.0)
    // prediction B merges everything: recall stays 1, precision drops to
    // the per-record purity mean = (2/4 + 2/4 + 2/4 + 2/4) / 4 = 0.5
    val merged = perfect.withColumn("pred", lit(99L))
    val b = Evaluation.bcubed(merged, col("pred"), col("truth")).head()
    assert(b.getAs[Double]("bcubed_precision") === 0.5)
    assert(b.getAs[Double]("bcubed_recall") === 1.0)
    // F1 = 2·0.5·1/(1.5) = 2/3
    assert(b.getAs[Double]("bcubed_f1") ===
      math.rint(2.0 / 3.0 * 1e6) / 1e6)
    // prediction C splits one true entity: precision 1, recall charged
    // only on the split records: (1 + 1 + 1/2 + 1/2) / 4 = 0.75
    val split = Seq((1L, 10L, 100L), (2L, 10L, 100L),
      (3L, 21L, 200L), (4L, 22L, 200L)).toDF("rid", "pred", "truth")
    val c = Evaluation.bcubed(split, col("pred"), col("truth")).head()
    assert(c.getAs[Double]("bcubed_precision") === 1.0)
    assert(c.getAs[Double]("bcubed_recall") === 0.75)
  }

  test("x202 wilsonGate: hand bounds, and 3-for-3 is weaker evidence " +
      "than 490-of-1000") {
    import spark.implicits._
    val rows = (Seq.fill(3)(("tiny", true)) ++
      Seq.fill(490)(("big", true)) ++ Seq.fill(510)(("big", false)))
      .toDF("src", "ok")
    // tau sits between the two lower bounds: 3/3 -> 0.4385, 490/1000 ->
    // 0.4591 — the naive p-hat ordering (1.0 vs 0.49) inverts
    val out = Evaluation.wilsonGate(rows, col("src"), col("ok"), tau = 0.45)
      .collect().map(r => r.getString(0) -> r).toMap
    // hand Wilson at z=1.96: n=3, k=3 -> lo = (1 + z2/6)/(1 + z2/3)
    //  - z*sqrt(z2/36)/(1 + z2/3)
    val z2 = 1.96 * 1.96
    val loTiny = ((1.0 + z2 / (2.0 * 3)) / (1.0 + z2 / 3) -
      1.96 * math.sqrt(0.0 / 3 + z2 / (4.0 * 3 * 3)) / (1.0 + z2 / 3))
    assert(out("tiny").getAs[Double]("p_hat") === 1.0)
    assert(out("tiny").getAs[Double]("wilson_lo") ===
      math.rint(loTiny * 1e6) / 1e6)
    // the 49% source's lower bound beats the 100%-of-3 source's: more
    // evidence outranks a perfect small sample
    val loBig = out("big").getAs[Double]("wilson_lo")
    assert(loBig > 0.45 && out("big").getAs[Boolean]("passed"))
    assert(out("tiny").getAs[Double]("wilson_lo") < 0.45 &&
      !out("tiny").getAs[Boolean]("passed"))
    // p-hat would have ordered them the other way
    assert(out("tiny").getAs[Double]("p_hat") >
      out("big").getAs[Double]("p_hat"))
  }

  test("x201 operatingPoints: hand confusion matrices per threshold, " +
      "argmax flags on the right rows") {
    import spark.implicits._
    // scores 0.9 (2 pos), 0.7 (1 pos 1 neg), 0.3 (2 neg)
    val rows = Seq(
      (0.9, true), (0.9, true), (0.7, true), (0.7, false),
      (0.3, false), (0.3, false)).toDF("s", "y")
    val out = Evaluation.operatingPoints(rows, col("s"), col("y"))
      .collect().map(r => r.getDouble(0) -> r).toMap
    assert(out.keySet === Set(0.9, 0.7, 0.3))
    // t=0.9: tp 2, fp 0, fn 1, tn 3 -> prec 1, rec 2/3, f1 0.8, J 2/3
    val t9 = out(0.9)
    assert((t9.getAs[Long]("tp"), t9.getAs[Long]("fp"),
      t9.getAs[Long]("fn"), t9.getAs[Long]("tn")) === ((2L, 0L, 1L, 3L)))
    assert(t9.getAs[Double]("prec") === 1.0)
    assert(t9.getAs[Double]("f1") === 0.8)
    // t=0.7: tp 3, fp 1 -> prec 0.75, rec 1, f1 6/7, J 1 - 1/3
    val t7 = out(0.7)
    assert(t7.getAs[Double]("prec") === 0.75)
    assert(t7.getAs[Double]("rec") === 1.0)
    assert(t7.getAs[Double]("f1") === math.rint(6.0 / 7.0 * 1e6) / 1e6)
    assert(t7.getAs[Double]("youden") ===
      math.rint((1.0 - 1.0 / 3.0) * 1e6) / 1e6)
    // t=0.3: everything positive -> rec 1, prec 0.5, J 0
    val t3 = out(0.3)
    assert(t3.getAs[Double]("prec") === 0.5)
    assert(t3.getAs[Double]("youden") === 0.0)
    // F1-argmax and J-argmax both sit at t=0.7 on this fixture
    assert(t7.getAs[Boolean]("best_f1") && t7.getAs[Boolean]("best_youden"))
    assert(!t9.getAs[Boolean]("best_f1") && !t3.getAs[Boolean]("best_f1"))
  }

  test("operatingPoints counts a null label as a NEGATIVE (oracle " +
      "CASE-ELSE-0 semantics), never in neither class") {
    import spark.implicits._
    // same fixture as x201 but the t=0.7 negative label arrives as null;
    // every confusion cell must match the explicit-false run exactly
    val rows = Seq(
      (0.9, Some(true)), (0.9, Some(true)), (0.7, Some(true)),
      (0.7, None), (0.3, Some(false)), (0.3, None)).toDF("s", "y")
    val out = Evaluation.operatingPoints(rows, col("s"), col("y"))
      .collect().map(r => r.getDouble(0) -> r).toMap
    val t9 = out(0.9)
    assert((t9.getAs[Long]("tp"), t9.getAs[Long]("fp"),
      t9.getAs[Long]("fn"), t9.getAs[Long]("tn")) === ((2L, 0L, 1L, 3L)))
    // tn+fp must total 3 at every threshold — a dropped null would read 2
    val t3 = out(0.3)
    assert(t3.getAs[Long]("tp") + t3.getAs[Long]("fn") === 3L)
    assert(t3.getAs[Long]("fp") + t3.getAs[Long]("tn") === 3L)
  }
}
