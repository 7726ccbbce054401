package graft

import org.apache.spark.sql.functions._

import graft.analytics.Drift

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("psiGateShift matches a hand-computed PSI on an asymmetric gate") {
    // bucket 0 (values < 10): 4 rows, 1 kept; bucket 1 (>= 10, capped): 2
    // rows, 2 kept — the gate shifts mass toward bucket 1
    val df = Seq((1L, 1L, false), (2L, 2L, false), (3L, 3L, false),
      (4L, 4L, true), (5L, 15L, true), (6L, 25L, true))
      .toDF("id", "v", "keep")
    val got = Drift.psiGateShift(df, col("v"), col("keep"),
        bucketWidth = 10L, maxBucketIdx = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // Laplace-smoothed shares, totals tb = 6 rows / ta = 3 kept, nb = 2
    // observed buckets: bucket 0 pa = 5/8, pb = 2/5; bucket 1 pa = 3/8,
    // pb = 3/5
    def term(ca: Long, cb: Long): Double = {
      val pa = (ca + 1.0) / (6.0 + 2.0)
      val pb = (cb + 1.0) / (3.0 + 2.0)
      math.rint((pa - pb) * math.log(pa / pb) * 1e6) / 1e6
    }
    assert(got(0L) === ((4L, 1L, term(4L, 1L))))
    assert(got(1L) === ((2L, 2L, term(2L, 2L))))
    // each signed term is nonnegative by construction
    got.values.foreach { case (_, _, t) => assert(t >= 0.0) }
  }

  test("a uniform gate yields near-zero PSI everywhere") {
    // keep every other row in every bucket: shares unchanged up to the
    // smoothing epsilon, so each term stays tiny
    val df = (0 until 400).map(i => (i.toLong, (i % 40).toLong, i % 2 == 0))
      .toDF("id", "v", "keep")
    val terms = Drift.psiGateShift(df, col("v"), col("keep"),
        bucketWidth = 10L, maxBucketIdx = 8)
      .collect().map(_.getDouble(3))
    assert(terms.nonEmpty)
    terms.foreach(t => assert(t < 1e-4, s"uniform gate produced PSI term $t"))
  }

  test("a keep-everything gate has PSI exactly zero in every bucket") {
    // c_after == c_before and ta == tb, so the smoothed shares are equal
    // and each term is EXACTLY 0.0 — no tolerance needed
    val df = (0 until 100).map(i => (i.toLong, (i * 7 % 90).toLong, true))
      .toDF("id", "v", "keep")
    val terms = Drift.psiGateShift(df, col("v"), col("keep"),
        bucketWidth = 16L, maxBucketIdx = 4)
      .collect().map(_.getDouble(3))
    assert(terms.nonEmpty)
    assert(terms.forall(_ == 0.0), terms.mkString(","))
  }

  test("values beyond the cap fold into the top bucket") {
    val df = Seq((1L, 5L, true), (2L, 1000000L, true), (3L, 999L, false))
      .toDF("id", "v", "keep")
    val buckets = Drift.psiGateShift(df, col("v"), col("keep"),
        bucketWidth = 10L, maxBucketIdx = 3)
      .collect().map(_.getLong(0)).toSet
    assert(buckets === Set(0L, 3L))
  }

  test("x106 splitChiSquare equals the hand-computed Pearson statistic") {
    import graft.sampling.Sampling
    val rows = (1 to 60).map(i => (i.toLong, (i % 3) * 10L)) // buckets 0..2 @ width 10
    val df = rows.toDF("id", "v").repartition(3)
    val got = Drift.splitChiSquare(df, col("id"), col("v"), bucketWidth = 10,
      maxBucketIdx = 8, salt = "t", cutBuckets = 5000).collect().head
    // replicate: side from the same hash rule, then textbook chi-square
    val sides = df.select(col("id"),
        (Sampling.hashBucket(col("id"), "t") < 5000).cast("int").as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cells = rows.groupBy { case (id, v) => (v / 10, sides(id)) }
      .view.mapValues(_.size.toDouble).toMap
    val buckets = rows.map(_._2 / 10).distinct
    val rowT = buckets.map(b => b -> (cells.getOrElse((b, 0), 0.0) +
      cells.getOrElse((b, 1), 0.0))).toMap
    val colT = Seq(0, 1).map(s => s -> buckets.map(b =>
      cells.getOrElse((b, s), 0.0)).sum).toMap
    val n = 60.0
    val chi2 = (for { b <- buckets; s <- Seq(0, 1) } yield {
      val e = rowT(b) * colT(s) / n
      val o = cells.getOrElse((b, s), 0.0)
      (o - e) * (o - e) / e
    }).sum
    assert(math.abs(got.getDouble(0) - chi2) < 1e-6, s"$got vs $chi2")
    assert(got.getLong(1) === buckets.size - 1L)
    assert(got.getLong(2) === 60L)
  }

  test("x103 proportionBias: symmetric two-group z at the closed form") {
    val rows = (1 to 10).map(i => ("g1", i <= 8)) ++
      (1 to 10).map(i => ("g2", i <= 2))
    val got = Drift.proportionBias(rows.toDF("g", "f").repartition(3),
        col("g"), col("f"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // pooled p = .5, den = .5·.5·(1/10+1/10) = .05 → z = ±.6/√.05
    val z = 0.6 / math.sqrt(0.05)
    assert(got("g1") === ((10L, 8L, 0.8, math.rint(z * 1e6) / 1e6)))
    assert(got("g2") === ((10L, 2L, 0.2, -math.rint(z * 1e6) / 1e6)))
  }

  test("x103 proportionBias: single-group population emits null z") {
    val got = Drift.proportionBias(
        Seq(("only", true), ("only", false)).toDF("g", "f"), col("g"), col("f"))
      .collect().head
    assert(got.isNullAt(4), "rest-population of zero has no defined test")
  }

  test("a37 changePoint locates a planted mean shift with the exact score") {
    import java.sql.Timestamp
    def ts(i: Int) = new Timestamp(i * 1000L)
    // key A: 10 readings at 0 then 10 at 5 → split at idx 10,
    // score = (10·10/20)·(0−5)² = 125; key B: flat → score 0, earliest split
    val rows = (1 to 10).map(i => ("A", ts(i), i.toLong, 0.0)) ++
      (11 to 20).map(i => ("A", ts(i), i.toLong, 5.0)) ++
      (1 to 4).map(i => ("B", ts(i), i.toLong, 7.0)) :+
      (("C", ts(1), 1L, 9.9)) // single reading: no interior split, no row
    val got = Drift.changePoint(rows.toDF("k", "t", "id", "v").repartition(3),
        col("k"), col("t"), Seq(col("id")), col("v"), valueScale = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet === Set("A", "B"))
    assert(got("A") === ((10L, 20L, 125.0)))
    assert(got("B") === ((1L, 4L, 0.0))) // tie on 0 score → earliest
  }

  test("x137 ksDrift: hand-computed two-sample KS; whole-corpus group is null") {
    import graft.analytics.Comparison
    // A = {1,1,2}, B = {2,3,3}: at v=1, F_A = 2/3 vs F_B = 0; at v=2,
    // 1 vs 1/3; at v=3, 1 vs 1 -> KS = 2/3 for both groups
    val df = Seq(("A", 1), ("A", 1), ("A", 2), ("B", 2), ("B", 3), ("B", 3))
      .toDF("g", "v").repartition(3)
    val got = Comparison.ksDrift(df, col("g"), col("v"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === Map("A" -> ((3L, 0.666667)), "B" -> ((3L, 0.666667))))
    // a group that IS the corpus has no rest-sample: null KS, not a crash
    val solo = Comparison.ksDrift(Seq(("A", 1), ("A", 2)).toDF("g", "v"),
      col("g"), col("v")).collect()
    assert(solo.length === 1 && solo(0).isNullAt(2))
  }

  test("x146 welchT: hand-computed t and Satterthwaite df; tiny group null") {
    import graft.analytics.Comparison
    // X = {1,2,3} vs rest {2,4,6,8}: m=2 vs 5, s² = 1 vs 20/3,
    // se² = 1/3 + 5/3 = 2 → t = −3/√2; df = 4/(1/18 + (20/3)²/48)
    val df = (Seq(1, 2, 3).map(("X", _)) ++ Seq(2, 4, 6, 8).map(("Y", _)))
      .toDF("g", "v").repartition(3)
    val got = Comparison.welchT(df, col("g"), col("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(got("X") === ((3L, 2.0, 5.0, -2.12132, 4.075472)))
    assert(got("Y") === ((4L, 5.0, 2.0, 2.12132, 4.075472)))
    // a 1-row group has no sample variance → null t, null df
    val one = Comparison.welchT(Seq(("A", 5), ("B", 1), ("B", 2), ("B", 9))
      .toDF("g", "v"), col("g"), col("v")).collect()
      .map(r => r.getString(0) -> r.isNullAt(4)).toMap
    assert(one("A"))
  }

  test("x150 mannWhitney: midrank U and tie-corrected z at the closed form") {
    import graft.analytics.Comparison
    // A = {1,2,2}, B = {2,3,3,5}: pooled ranks 1, (2,3,4)→3, (5,6)→5.5, 7
    // R_A = 1+3+3 = 7 → U_A = 7 − 6 = 1; mean = n1·n2/2 = 6
    // ties: t=3 at v2, t=2 at v3 → Σ(t³−t) = 24 + 6 = 30
    // var = 12/12·(8 − 30/42); z = (1 − 6)/√var (computed below in the
    // operator's own expression order so the float path is identical)
    val df = (Seq(1, 2, 2).map(("A", _)) ++ Seq(2, 3, 3, 5).map(("B", _)))
      .toDF("g", "v").repartition(3)
    val varU = 3.0 * 4.0 / 12.0 * ((7.0 + 1.0) - 30.0 / (7.0 * 6.0))
    val zA = math.rint((1.0 - 6.0) / math.sqrt(varU) * 1e6) / 1e6
    val got = Comparison.mannWhitney(df, col("g"), col("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got("A") === ((3L, 1.0, zA)))
    // B is the mirror image: U_B = n1·n2 − U_A = 11, z flips sign
    assert(got("B") === ((4L, 11.0, -zA)))
    // whole-corpus group: U defined, z null; constant corpus: zero variance
    val solo = Comparison.mannWhitney(Seq(("A", 1), ("A", 2)).toDF("g", "v"),
      col("g"), col("v")).collect()
    assert(solo.length === 1 && solo(0).isNullAt(3))
    val const = Comparison.mannWhitney(
      Seq(("A", 7), ("B", 7), ("B", 7)).toDF("g", "v"),
      col("g"), col("v")).collect().map(r => r.isNullAt(3))
    assert(const.forall(identity))
  }

  test("x153 wassersteinDrift: |CDF gap| x interval integral, closed form") {
    import graft.analytics.Comparison
    // A = {0,2}, B = {1,3}: spine 0,1,2,3 with unit gaps
    // F_A = .5,.5,1,1 vs F_B = 0,.5,.5,1 → W1 = .5 + 0 + .5 = 1.0 each way
    val df = Seq(("A", 0), ("A", 2), ("B", 1), ("B", 3))
      .toDF("g", "v").repartition(3)
    val got = Comparison.wassersteinDrift(df, col("g"), col("v"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got === Map("A" -> ((2L, 1.0)), "B" -> ((2L, 1.0))))
    // shifting a distribution by +d moves W1 by exactly d (translation
    // sensitivity KS lacks once it saturates)
    val far = Seq(("A", 0), ("A", 2), ("B", 100), ("B", 102))
      .toDF("g", "v")
    val w = Comparison.wassersteinDrift(far, col("g"), col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(w("A") === 100.0 && w("B") === 100.0)
    // a group that IS the corpus has no rest: null w1
    val solo = Comparison.wassersteinDrift(
      Seq(("A", 1), ("A", 2)).toDF("g", "v"), col("g"), col("v")).collect()
    assert(solo.length === 1 && solo(0).isNullAt(2))
  }

  test("x154 ksFdr: planted drift rejected, in-family groups survive BH") {
    import graft.analytics.Comparison
    // three 40-row groups sharing one distribution + a 6-row group far
    // away: the drifted group's KS = 1 at n_e ≈ 5.7 → p ≈ 2e-5, while
    // the in-family groups' KS vs rest is diluted noise with p clamped
    // to 1.0 — BH at 5% must reject exactly the planted one
    val base = for (g <- Seq("A", "B", "C"); v <- 0 until 40) yield (g, v)
    val drift = (0 until 6).map(i => ("DRIFT", 100 + i))
    val df = (base ++ drift).toDF("g", "v").repartition(4)
    val got = Comparison.ksFdr(df, col("g"), col("v"), alpha = 0.05)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got("DRIFT")._1 < 0.001 && got("DRIFT")._2)
    Seq("A", "B", "C").foreach { g =>
      assert(got(g)._1 === 1.0 && !got(g)._2, s"group $g")
    }
    // a whole-corpus group is untestable: null p, null decision, and it
    // must not count toward the BH m
    val solo = Comparison.ksFdr(Seq(("A", 1), ("A", 2)).toDF("g", "v"),
      col("g"), col("v")).collect()
    assert(solo.length === 1 && solo(0).isNullAt(3) && solo(0).isNullAt(4))
  }

  test("x172 sinkhornPlan: point masses ship whole; marginals are matched") {
    import graft.analytics.Comparison
    // A concentrated at v=0, B at v=3: the unique coupling with those
    // marginals is the single cell (0,3) carrying ALL the mass, cost 3
    val point = Seq.fill(4)(("A", 0L)) ++ Seq.fill(4)(("B", 3L))
    val p = Comparison.sinkhornPlan(point.toDF("g", "v"), col("g"), col("v"),
      "A", "B").collect()
    assert(p.length === 1)
    assert(p(0).getLong(0) === 0L && p(0).getLong(1) === 3L)
    assert(math.abs(p(0).getDouble(2) - 1.0) <= 2e-6)   // mass
    assert(math.abs(p(0).getDouble(3) - 3.0) <= 6e-6)   // cell_cost
    // 2x2 case: after 5 scaling rounds the plan's row/column sums must
    // reproduce the input marginals (Sinkhorn's theorem), up to the
    // per-round round-6 resynchronization
    val two = Seq(("A", 0L), ("A", 0L), ("A", 1L),       // a = (2/3, 1/3)
      ("B", 0L), ("B", 1L), ("B", 1L), ("B", 1L))        // b = (1/4, 3/4)
    val plan = Comparison.sinkhornPlan(two.toDF("g", "v"), col("g"), col("v"),
      "A", "B").collect()
    val rowSum = plan.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getDouble(2)).sum).toMap
    val colSum = plan.groupBy(_.getLong(1)).view
      .mapValues(_.map(_.getDouble(2)).sum).toMap
    assert(math.abs(rowSum(0L) - 2.0 / 3) < 1e-3 &&
      math.abs(rowSum(1L) - 1.0 / 3) < 1e-3, s"row sums $rowSum")
    assert(math.abs(colSum(0L) - 0.25) < 1e-3 &&
      math.abs(colSum(1L) - 0.75) < 1e-3, s"col sums $colSum")
  }

  test("x176 sinkhornResiduals: row side exact, column side shrinks per round") {
    import graft.analytics.Comparison
    // same 2x2 fixture as the plan spec: a = (2/3, 1/3), b = (1/4, 3/4)
    val two = Seq(("A", 0L), ("A", 0L), ("A", 1L),
      ("B", 0L), ("B", 1L), ("B", 1L), ("B", 1L))
    val r = Comparison.sinkhornResiduals(two.toDF("g", "v"), col("g"),
        col("v"), "A", "B", iters = 5).collect()
      .sortBy(_.getInt(0))
    assert(r.map(_.getInt(0)).toSeq === (1 to 5))
    // the u-update ends every round, so the row marginal is satisfied to
    // the round-6 grain of the scaling vector after EVERY iteration
    assert(r.forall(_.getDouble(1) <= 1e-5),
      s"res_a: ${r.map(_.getDouble(1)).mkString(",")}")
    // the column residual is the live convergence signal: it must never
    // grow between rounds and must end at the rounding floor — a fixed
    // iteration count that merely STOPPED would fail here
    val resB = r.map(_.getDouble(2)).toSeq
    assert(resB.zip(resB.tail).forall { case (x, y) => y <= x + 1e-9 },
      s"res_b not non-increasing: $resB")
    assert(resB.head > 1e-4, s"fixture converged instantly: $resB")
    assert(resB.last <= 1e-3, s"did not converge in 5 rounds: $resB")
  }
}
