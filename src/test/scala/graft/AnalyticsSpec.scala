package graft

import org.apache.spark.sql.functions._
import graft.analytics.{Aggregates, Correlation, Distribution, Ranking}

/** A-family + O-family over small hand-checkable frames. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    ("S1", 1, 10.0), ("S1", 2, 20.0), ("S1", 3, 30.0),
    ("S2", 1, 5.0), ("S2", 2, 5.0)).toDF("station", "t", "power")

  test("A5 capacity factor: per-group mean over global max") {
    val out = Aggregates.capacityFactor(df, col("station"), col("power"), valueScale = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("S1") - 20.0 / 30.0 * 100.0) < 1e-6)
    assert(math.abs(out("S2") - 5.0 / 30.0 * 100.0) < 1e-6)
  }

  test("A8 describe: exact quartiles with interpolation") {
    val out = Aggregates.describe(df.filter(col("station") === "S1"),
      col("station"), col("power"), valueScale = 2).head()
    assert(out.getAs[Double]("p50") === 20.0)
    assert(out.getAs[Double]("p25") === 15.0)
    assert(out.getAs[Double]("mean") === 20.0)
  }

  test("A9 histogram buckets by fixed width") {
    val out = Distribution.histogram(df, col("power"), 10.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) === 2) // 5, 5
    assert(out(1L) === 1) // 10
    assert(out(3L) === 1) // 30
  }

  test("A12 linear trend recovers a perfect line") {
    val line = Seq.tabulate(10)(i => ("k", i.toDouble, 3.0 * i + 7.0))
      .toDF("k", "x", "y")
    val out = Correlation.linearTrend(line, col("k"), col("x"), col("y")).head()
    assert(out.getAs[Double]("slope") === 3.0)
    assert(out.getAs[Double]("intercept") === 7.0)
  }

  test("A11 corr matrix: key with itself = 1, anti-correlated pair = -1") {
    val two = Seq(("b1", "A", 1.0), ("b1", "B", 4.0), ("b2", "A", 2.0),
      ("b2", "B", 3.0), ("b3", "A", 3.0), ("b3", "B", 2.0))
      .toDF("bucket", "k", "v")
    val m = Correlation.corrMatrix(two, col("bucket"), col("k"), col("v"), valueScale = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m(("A", "A")) === 1.0)
    assert(m(("A", "B")) === -1.0)
  }

  test("approx quartiles stay within tolerance of exact at any partitioning") {
    val vals = (1 to 5000).map(i => ("k", (i % 997) * 0.37)).toDF("k", "v")
    for (parts <- Seq(1, 7)) {
      val rows = Aggregates.approxQuartilesWithin(vals.repartition(parts),
        col("k"), col("v")).collect()
      assert(rows.length === 1)
      val r = rows.head
      assert(r.getAs[Boolean]("p25_ok") && r.getAs[Boolean]("p50_ok") &&
        r.getAs[Boolean]("p75_ok"), s"parts=$parts")
    }
  }

  test("MAD outliers catch the cluster that masks itself from the z-score") {
    import graft.analytics.Alerts
    // 20 tight readings near 10 plus a 5-reading fault cluster near 100:
    // the cluster is 20% of the group, inflating the stddev enough that
    // its own z-scores sit near 2 (masking); median/MAD barely notice
    val rows = (0 until 20).map(i => (i.toLong, "s", 10.0 + (i % 5) * 0.01)) ++
      (0 until 5).map(i => (100L + i, "s", 100.0 + i))
    val df = rows.toDF("event_id", "event_type", "value")
    val z = Alerts.zscoreOutliers(df, col("event_type"), col("value"), 3.0)
      .collect().map(_.getLong(0)).toSet
    val m = Alerts.madOutliers(df, col("event_type"), col("value"), 3.5)
      .collect().map(_.getLong(0)).toSet
    assert(z.isEmpty, s"the cluster must mask itself from the z-score: $z")
    assert(m === (100L until 105L).toSet, s"MAD must catch all five: $m")
  }

  test("MAD outliers: zero-MAD and null-value groups emit nothing") {
    import graft.analytics.Alerts
    val df = (Seq((1L, "const", 5.0), (2L, "const", 5.0), (3L, "const", 5.0),
      (4L, "const", 99.0)) ++
      Seq((5L, "nulls", Double.NaN)).map(t => (t._1, t._2, t._3)))
      .toDF("event_id", "event_type", "value")
      .withColumn("value", when(isnan(col("value")), lit(null)).otherwise(col("value")))
    val out = Alerts.madOutliers(df, col("event_type"), col("value"), 3.0)
      .collect().map(_.getLong(0)).toSet
    // "const": over half identical -> MAD 0 -> no outliers (even 99.0)
    assert(out.isEmpty, s"zero-MAD group must emit nothing: $out")
  }

  test("snapshotDiff labels added/removed/changed/unchanged; ws churn is not a change") {
    import graft.analytics.Comparison
    val before = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "kept text"))
      .toDF("doc_id", "text")
    val after = Seq((1L, "alpha  BETA "), // normalization folds this
      (2L, "gamma delta edited"), (4L, "brand new doc"))
      .toDF("doc_id", "text")
    val got = Comparison.snapshotDiff(before, after, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("O1/P13/P14 ranking and recency windows") {
    val ranked = Ranking.rankByAggregate(df, col("station"),
      sum(col("power")), "total").collect()
      .map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(ranked("S1") === 1)
    assert(ranked("S2") === 2)
    val lastTwo = Ranking.lastNPerKey(df, Seq(col("station")), Seq(col("t")), 2)
    assert(lastTwo.count() === 4)
    val latest = Ranking.lastPerKey(df, Seq(col("station")), Seq(col("t")))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(latest === Map("S1" -> 3, "S2" -> 2))
  }

  test("equi-depth histogram: near-equal populations, ordered disjoint edges") {
    // 103 rows over a heavily skewed distribution (99 small + 4 huge):
    // fixed-width binning would put 99 rows in one bucket; equi-depth
    // must spread them 26/26/26/25 (populations differ by at most 1)
    val df = ((1 to 99).map(i => (i.toLong, i / 100.0)) ++
      Seq((100L, 1e6), (101L, 2e6), (102L, 3e6), (103L, 4e6)))
      .toDF("id", "v").repartition(5)
    val out = Distribution.equiDepthHistogram(df, col("id"), col("v"), bins = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(out.map(_._2).toSeq === Seq(26L, 26L, 26L, 25L))
    // bins ascend in value and never overlap
    assert(out.forall(b => b._3 <= b._4))
    assert(out.sliding(2).forall { case Array(a, b) => a._4 < b._3 })
    assert(out.last._4 === 4e6 && out.head._3 === 0.01)
  }

  test("rollup merge ≡ one-shot aggregate; state is closed under re-merging") {
    val rows = Seq[(String, java.lang.Double)](
      ("a", 1.0), ("a", 2.0), ("a", null), ("b", 5.0),
      ("c", null), ("d", 7.0), ("d", 9.0))
    val df = rows.toDF("k", "v").repartition(3)
    def canon(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)), Option(r.get(5)),
        Option(r.get(6)))).sortBy(_._1).toSeq
    val oneShot = canon(Aggregates.finishRollup(
      Aggregates.partialRollup(df, col("k"), col("v"))))
    // split 3 ways (one shard misses most keys), merge, then merge the
    // merge with an EMPTY state frame — closure under re-merging
    val shard = abs(coalesce(hash(col("v")), lit(0))) % 3
    val parts = (0 until 3).map(i =>
      Aggregates.partialRollup(df.filter(shard === i), col("k"), col("v")))
    val merged = Aggregates.mergeRollups(
      Aggregates.mergeRollups(parts: _*),
      Aggregates.partialRollup(df.limit(0), col("k"), col("v")))
    assert(canon(Aggregates.finishRollup(merged)) === oneShot)
    // null-value key: cnt 0, null sum/min/max/avg, rows preserved
    val c = oneShot.find(_._1 == "c").get
    assert(c._2 === 1L && c._3 === 0L && c._4.isEmpty && c._7.isEmpty)
  }

  test("seasonal outliers catch the in-band-for-the-day, wrong-for-the-hour reading") {
    // night readings ~0, day readings ~100; a 60 at night is far outside
    // its hour cell but inside the all-day spread — the flat z-score
    // (a17 semantics) must miss it, the seasonal profile must catch it
    val night = (1 to 20).map(i => (i.toLong, 0, 0.0 + (i % 3) * 0.5))
    val day = (21 to 40).map(i => (i.toLong, 12, 100.0 + (i % 3) * 0.5))
    val df = (night ++ day :+ ((41L, 0, 60.0)))
      .toDF("id", "hr", "v").repartition(4)
    val seasonal = graft.analytics.Alerts.seasonalOutliers(
        df, lit("x"), col("hr"), col("v"), 3.0)
      .collect().map(_.getLong(0)).toSet
    assert(seasonal === Set(41L))
    val flat = graft.analytics.Alerts.zscoreOutliers(
        df, lit("x"), col("v"), 3.0)
      .collect().map(_.getLong(0)).toSet
    assert(!flat.contains(41L), "flat baseline misses the seasonal fault")
  }

  test("a30 autocorrelation: perfect line is +1, alternating series is -1 at lag 1") {
    // ramp 1..6 → every lag's pairs are perfectly linearly related (ACF 1);
    // alternating ±1 → lag-1 pairs perfectly anti-related, lag-2 perfect
    val ramp = (1 to 6).map(i => ("ramp", i.toLong, i.toDouble))
    val alt = (1 to 6).map(i => ("alt", i.toLong, if (i % 2 == 0) 1.0 else -1.0))
    val df = (ramp ++ alt).toDF("k", "t", "v").repartition(4)
    val out = Correlation.autocorrelation(df, col("k"), Seq(col("t")), col("v"), 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> (r.getDouble(2), r.getLong(3)))
      .toMap
    assert(out(("ramp", 1)) === ((1.0, 5L)))
    assert(out(("ramp", 2)) === ((1.0, 4L)))
    assert(out(("alt", 1)) === ((-1.0, 5L)))
    assert(out(("alt", 2)) === ((1.0, 4L)))
  }

  test("a30 autocorrelation: tie-break column makes equal timestamps deterministic") {
    // two rows share t=2; the id tie-break pins the order so the ACF is
    // stable across partitionings
    val df = Seq(("k", 1L, 10L, 1.0), ("k", 2L, 30L, 3.0), ("k", 2L, 20L, 2.0),
      ("k", 3L, 40L, 4.0)).toDF("k", "t", "id", "v")
    val a = Correlation.autocorrelation(df, col("k"),
      Seq(col("t"), col("id")), col("v"), 1).collect().head
    // order by (t, id): 1,2,3,4 → lag-1 ACF of a perfect ramp
    assert(a.getDouble(2) === 1.0 && a.getLong(3) === 3L)
  }

  test("a40 trending composition: rank within window, count then name") {
    import java.sql.Timestamp
    val ev = Seq(
      ("A", Timestamp.valueOf("2025-01-01 10:15:00")),
      ("A", Timestamp.valueOf("2025-01-01 10:16:00")),
      ("B", Timestamp.valueOf("2025-01-01 10:17:00")))
      .toDF("event_type", "ts")
    val counts = Aggregates.hoppingAgg(ev, col("ts"), "1 hour", "30 minutes",
      Seq(col("event_type")), Seq(count(lit(1)).as("cnt")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_start"))
      .orderBy(col("cnt").desc, col("event_type").asc)
    val top = counts.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("window_start").cast("string"), col("event_type"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // A dominates both windows the events fall into
    assert(top === Map("2025-01-01 09:30:00" -> "A", "2025-01-01 10:00:00" -> "A"))
  }

  test("a39 localPeaks: strict maxima only — plateaus, endpoints, sub-threshold out") {
    val ev = Seq(
      ("k", 1L, 10.0), ("k", 2L, 50.0), ("k", 3L, 20.0),  // 2 is a peak
      ("k", 4L, 60.0), ("k", 5L, 60.0), ("k", 6L, 10.0),  // plateau: no strict peak
      ("k", 7L, 30.0), ("k", 8L, 35.0), ("k", 9L, 20.0),  // 8 under threshold
      ("k", 10L, 99.0))                                    // endpoint: not a peak
      .toDF("k", "t", "v").repartition(3)
    val got = graft.analytics.Alerts.localPeaks(ev, col("k"), Seq(col("t")),
        col("t"), col("v"), minHeight = 40.0)
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(2L))
  }

  test("a36 itemAffinity: hand lift, repeats collapse, disjoint pairs absent") {
    // u1{A,B} u2{A,B} u3{A} u4{C}; duplicate (u1,A) rows must not inflate
    val ev = Seq((1L, "A"), (1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (4L, "C")).toDF("u", "it").repartition(3)
    val got = Distribution.itemAffinity(ev, col("u"), col("it"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // lift(A,B) = (2·4)/(3·2) = 1.333333; (A,C)/(B,C) never co-occur
    assert(got === Map(("A", "B") -> ((2L, math.rint(8.0 / 6 * 1e6) / 1e6))))
  }

  test("a36 itemAffinity: basket cap bounds pair fan-out, exact below cap") {
    // hub entity with 50 distinct items, small entities with 3: uncapped
    // the hub contributes C(50,2)=1225 pairs; capped at 8 it contributes
    // at most C(8,2)=28 — the enforced capBuckets discipline
    val hub = (1 to 50).map(i => (1L, f"item$i%03d"))
    val smalls = (2L to 4L).flatMap(u => Seq("x", "y", "z").map(it => (u, it)))
    val ev = (hub ++ smalls).toDF("u", "it").repartition(3)
    val capped = Distribution.itemAffinity(ev, col("u"), col("it"), maxBasket = 8)
      .collect()
    // pairs FROM the hub basket alone: both items start with "item"
    val hubPairs = capped.count(r =>
      r.getString(0).startsWith("item") && r.getString(1).startsWith("item"))
    assert(hubPairs <= 28, s"hub contributed $hubPairs pairs, cap allows 28")
    assert(hubPairs > 0, "cap must truncate the basket, not drop the entity")
    // the small baskets (3 ≤ cap) are exact: x/y/z co-occur in all of
    // u2..u4 and never with hub items (different entities)
    val xyz = capped.filter(r => !r.getString(0).startsWith("item"))
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(xyz === Map(("x", "y") -> 3L, ("x", "z") -> 3L, ("y", "z") -> 3L))
    // determinism: same cap + salt -> identical survivor set
    val again = Distribution.itemAffinity(ev, col("u"), col("it"), maxBasket = 8)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(again === capped.map(r => (r.getString(0), r.getString(1))).toSet)
  }

  test("a34 hoppingAgg: each event lands in exactly width/slide windows") {
    import java.sql.Timestamp
    val ev = Seq(
      ("k", Timestamp.valueOf("2025-01-01 10:15:00"), 1.0),
      ("k", Timestamp.valueOf("2025-01-01 10:45:00"), 2.0))
      .toDF("k", "ts", "v").repartition(2)
    val out = Aggregates.hoppingAgg(ev, col("ts"), "1 hour", "30 minutes",
        Seq(col("k")), Seq(round(sum(col("v")), 2).as("s"), count(lit(1)).as("c")))
      .collect().map(r => r.getAs[java.sql.Timestamp]("window_start").toString ->
        ((r.getAs[Double]("s"), r.getAs[Long]("c")))).toMap
    // 10:15 → windows starting 09:30 and 10:00; 10:45 → 10:00 and 10:30
    assert(out === Map(
      "2025-01-01 09:30:00.0" -> ((1.0, 1L)),
      "2025-01-01 10:00:00.0" -> ((3.0, 2L)),
      "2025-01-01 10:30:00.0" -> ((2.0, 1L))))
  }

  test("a32 rateSpikes: flags fast moves, leaves slow ones, nulls dt-0 ties") {
    import java.sql.Timestamp
    def ts(s: Int) = new Timestamp(s * 1000L)
    val ev = Seq(
      (1L, "k", ts(0), 0.0),    // first reading: no predecessor, no row
      (2L, "k", ts(10), 10.0),  // +10 over 10 s → rate 1.0 → spike
      (3L, "k", ts(20), 11.0),  // +1 over 10 s → rate 0.1 → quiet
      (4L, "k", ts(20), 99.0)   // duplicate ts → dt 0 → rate null, unflagged
    ).toDF("id", "k", "ts", "v").repartition(3)
    val out = graft.analytics.Alerts.rateSpikes(ev, col("k"), col("ts"),
        Seq(col("id")), col("id"), col("v"), threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), Option(r.get(3)), r.getBoolean(4)))).toMap
    assert(out.keySet === Set(2L, 3L, 4L))
    assert(out(2L) === ((10000000L, Some(1.0), true)))
    assert(out(3L) === ((10000000L, Some(0.1), false)))
    assert(out(4L) === ((0L, None, false)))
  }

  test("x116 concentrationReport: HHI/Gini/entropy on a hand distribution") {
    // counts {a:1, b:2, c:3, d:4}: tot 10, HHI 30/100, Gini
    // 2*30/(4*10) - 5/4 = 0.25, top 0.4; entropy from the closed form
    val rows = Seq.fill(1)("a") ++ Seq.fill(2)("b") ++ Seq.fill(3)("c") ++
      Seq.fill(4)("d")
    val r = graft.analytics.Distribution.concentrationReport(
      rows.toDF("src").repartition(3), col("src")).head()
    assert(r.getLong(0) === 4L)
    assert(r.getDouble(1) === 0.3)
    assert(r.getDouble(2) === 0.25)
    val clnc = 1 * math.log(1) + 2 * math.log(2) + 3 * math.log(3) +
      4 * math.log(4)
    assert(r.getDouble(3) ===
      math.rint((math.log(10) - clnc / 10) / math.log(2.0) * 1e6) / 1e6)
    assert(r.getDouble(4) === 0.4)
  }

  test("a45 funnelTiming: per-transition delays from qualifying timestamps") {
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(m * 60000L)
    // u1: view@1 -> click@2 (60 s) -> purchase@3 (60 s);
    // u4: view@5 -> click@5 (0 s, >= tie); u2/u3 never reach click in order
    val ev = Seq(
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      (2L, ts(1), "click"), (2L, ts(2), "view"),
      (3L, ts(1), "view"),
      (4L, ts(5), "view"), (4L, ts(5), "click")
    ).toDF("u", "ts", "step").repartition(3)
    val out = graft.analytics.Funnel.funnelTiming(ev, col("u"), col("ts"),
        col("step"), Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(1) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // delays {0, 60}: median = 30, p90 = interpolated 0.9*(60-0) = 54
    assert(out("view->click") === ((2L, 30.0, 54.0)))
    assert(out("click->purchase") === ((1L, 60.0, 60.0)))
  }

  test("a31 funnel: stage order is enforced, not just event presence") {
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(m * 60000L)
    // u1 completes in order; u2 clicked BEFORE its first view (must stop
    // at view); u3 views only; u4 click-at-same-instant counts (>=)
    val ev = Seq(
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      (2L, ts(1), "click"), (2L, ts(2), "view"),
      (3L, ts(1), "view"),
      (4L, ts(5), "view"), (4L, ts(5), "click")
    ).toDF("u", "ts", "step").repartition(3)
    val out = graft.analytics.Funnel.funnel(ev, col("u"), col("ts"), col("step"),
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(out("view") === ((4L, 1.0, 1.0)))
    assert(out("click") === ((2L, 0.5, 0.5))) // u1 and u4 (same-instant tie)
    assert(out("purchase") === ((1L, 0.5, 0.25)))
  }

  test("weightedMedian: crossing value, tie grouping, integral-weight guard") {
    val df = Seq(
      ("g1", 1.0, 1L), ("g1", 2.0, 1L), ("g1", 3.0, 6L), ("g1", 4.0, 2L),
      // g2: the crossing lands inside a TIED value pair — RANGE framing
      // sums peers together; min(v) is the tied value either way
      ("g2", 1.0, 4L), ("g2", 2.0, 3L), ("g2", 2.0, 3L)
    ).toDF("g", "v", "w").repartition(3)
    val got = graft.analytics.Aggregates.weightedMedian(
        df, Seq(col("g")), col("v"), col("w"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got === Map("g1" -> ((3.0, 10L)), "g2" -> ((2.0, 10L))))
    // fractional weight must raise, not silently truncate
    val bad = Seq(("g", 1.0, 1.5)).toDF("g", "v", "w")
    val e = intercept[Exception] {
      graft.analytics.Aggregates.weightedMedian(
        bad, Seq(col("g")), col("v"), col("w")).collect()
    }
    assert(e.getMessage.contains("non-integral weight") ||
      e.getCause != null && e.getCause.getMessage.contains("non-integral weight"))
  }


  test("x138 spearmanByGroup: monotone nonlinear = 1, mid-ranks on ties") {
    // group m: y = x*x -- monotone but nonlinear, Spearman 1 exactly
    // (Pearson on raw values would be < 1); group t: x ties 2,2 get
    // mid-rank 2.5 each -> corr([1,2.5,2.5,4],[1,2,3,4]) = 0.948683
    val df = (Seq((1, 1), (2, 4), (3, 9), (4, 16), (5, 25)).map {
      case (x, y) => ("m", x, y)
    } ++ Seq(("t", 1, 10), ("t", 2, 20), ("t", 2, 30), ("t", 3, 40))).
      toDF("g", "x", "y").repartition(3)
    val got = Correlation.spearmanByGroup(df, col("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got("m") === ((5L, 1.0)))
    assert(got("t") === ((4L, 0.948683)))
  }

  test("x144 quantileNormalize: mid-CDF lookup into the pooled inverse CDF") {
    import graft.analytics.Distribution
    // A = {1,2,3,4}, B = {10,20}; pooled cum fracs: 1→1/6, 2→2/6, 3→3/6,
    // 4→4/6, 10→5/6, 20→1. A's mid-quantiles (1/8, 3/8, 5/8, 7/8) land on
    // pooled 1, 3, 4, 20; B's (1/4, 3/4) on 2 and 10 — B's top value maps
    // BELOW A's, which is the cross-source re-ranking the op exists for
    val df = (Seq(1.0, 2.0, 3.0, 4.0).map(("A", _)) ++
      Seq(10.0, 20.0).map(("B", _))).toDF("g", "s").repartition(3)
    val got = Distribution.quantileNormalize(df, col("g"), col("s"))
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got === Map(
      ("A", 1.0) -> ((1L, 0.125, 1.0)), ("A", 2.0) -> ((1L, 0.375, 3.0)),
      ("A", 3.0) -> ((1L, 0.625, 4.0)), ("A", 4.0) -> ((1L, 0.875, 20.0)),
      ("B", 10.0) -> ((1L, 0.25, 2.0)), ("B", 20.0) -> ((1L, 0.75, 10.0))))
  }

  test("x160 theilSenByGroup: median of pairwise slopes shrugs the outlier") {
    // (1,1),(2,2),(3,3) + outlier (4,100): slopes [1,1,1,33,49,97] →
    // middles (rank 3,4) = 1 and 33 → median 17; OLS slope on the same
    // points is ≈ 30.6 — the breakdown property in one fixture
    val df = Seq(("g", 1.0, 1.0), ("g", 2.0, 2.0), ("g", 3.0, 3.0),
      ("g", 4.0, 100.0)).toDF("g", "x", "y").repartition(3)
    val got = Correlation.theilSenByGroup(df, col("g"), col("x"), col("y"))
      .head()
    assert((got.getLong(1), got.getDouble(2)) === ((6L, 17.0)))
    // odd pair count: drop the (3,3) point → slopes [1,33,49] → median 33
    val odd = Correlation.theilSenByGroup(
      df.filter(col("y") =!= 3.0), col("g"), col("x"), col("y")).head()
    assert((odd.getLong(1), odd.getDouble(2)) === ((3L, 33.0)))
    // equal-x pairs carry no slope and are excluded, not a divide error
    val dup = Correlation.theilSenByGroup(
      Seq(("g", 1.0, 1.0), ("g", 1.0, 5.0), ("g", 2.0, 2.0))
        .toDF("g", "x", "y"), col("g"), col("x"), col("y")).head()
    assert(dup.getLong(1) === 2L) // only the two x=1→x=2 pairs
  }

  // the library-wide md5-bit sign, recomputed independently: sign i is
  // bit (i mod 4) of hex nibble ⌊i/4⌋ of md5(key)
  private def amsSign(key: String, i: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val v = Integer.parseInt(hex.substring(i / 4, i / 4 + 1), 16)
    if ((v & (1 << (i % 4))) > 0) 1L else -1L
  }

  test("x177 amsF2Sketch: counters exact on a hand stream") {
    val st = Seq("a", "a", "a", "b", "b", "c").toDF("k")
    val sk = Distribution.amsF2Sketch(st, col("k")).head()
    assert(sk.getLong(0) === 6L) // n_rows
    // every counter is 3·s(a) + 2·s(b) + s(c) with the md5-bit signs
    (0 until 64).foreach { i =>
      val want = 3 * amsSign("a", i) + 2 * amsSign("b", i) + amsSign("c", i)
      assert(sk.getLong(i + 1) === want, s"counter x$i")
    }
  }

  test("x177 amsSelfJoinAudit: exact F2, estimate = mean of squares, " +
      "single-key stream estimates exactly") {
    val st = Seq("a", "a", "a", "b", "b", "c").toDF("k")
    val audit = Distribution.amsSelfJoinAudit(st, col("k")).head()
    assert(audit.getLong(0) === 6L && audit.getLong(1) === 3L)
    assert(audit.getLong(2) === 14L) // 3² + 2² + 1²
    val est = (0 until 64).map { i =>
      val x = 3 * amsSign("a", i) + 2 * amsSign("b", i) + amsSign("c", i)
      x * x
    }.sum / 64.0
    assert(audit.getDouble(3) === math.rint(est * 1e6) / 1e6)
    assert(audit.getDouble(4) ===
      math.rint(math.abs(audit.getDouble(3) - 14.0) / 14.0 * 1e6) / 1e6)
    // one distinct key: every row draws the SAME sign, so each Xᵢ² = n²
    // and the estimate is exact with zero relative error
    val same = Seq.fill(7)("z").toDF("k")
    val a2 = Distribution.amsSelfJoinAudit(same, col("k")).head()
    assert(a2.getLong(2) === 49L && a2.getDouble(3) === 49.0 &&
      a2.getDouble(4) === 0.0)
  }

  private val cmsStream =
    (Seq.fill(9)("a") ++ Seq.fill(5)("b") ++ Seq.fill(3)("c") ++
      Seq("d", "e", "f")).toDF("k")

  test("x190 cmsAudit: estimate never under-counts; wide grid is exact") {
    val tight = Distribution.cmsAudit(cmsStream, col("k"),
      depth = 2, width = 2, topK = 10).collect()
    assert(tight.length === 6)
    tight.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact"),
        s"CMS under-counted ${r.getAs[String]("key")}")
      assert(r.getAs[Long]("overcount") ===
        r.getAs[Long]("cms_est") - r.getAs[Long]("exact"))
    }
    // 1024 slots for 6 keys: collision probability per depth row is tiny,
    // and the MIN over 4 independent rows needs ALL FOUR to collide —
    // exactness here is deterministic for this fixed fixture
    val wide = Distribution.cmsAudit(cmsStream, col("k"),
      depth = 4, width = 1024, topK = 10).collect()
    wide.foreach(r => assert(r.getAs[Long]("overcount") === 0L,
      s"wide CMS collided on ${r.getAs[String]("key")}"))
    assert(wide.map(r => r.getAs[String]("key") -> r.getAs[Long]("exact"))
      .toMap === Map("a" -> 9L, "b" -> 5L, "c" -> 3L, "d" -> 1L,
        "e" -> 1L, "f" -> 1L))
  }

  test("x190 cmsSketch merges by column-wise counter sum") {
    val left = cmsStream.limit(10)
    val right = cmsStream.exceptAll(left)
    val merged = Distribution.cmsSketch(left, col("k"))
      .withColumnRenamed("counter", "cl")
      .join(Distribution.cmsSketch(right, col("k"))
        .withColumnRenamed("counter", "cr"), Seq("row_d", "slot"), "outer")
      .select(col("row_d"), col("slot"),
        (coalesce(col("cl"), lit(0L)) + coalesce(col("cr"), lit(0L)))
          .as("counter"))
    val whole = Distribution.cmsSketch(cmsStream, col("k"))
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("x190 cmsAudit topK cut is count-desc with key-asc tiebreak") {
    val top = Distribution.cmsAudit(cmsStream, col("k"),
      depth = 3, width = 1024, topK = 4).collect()
      .sortBy(r => (-r.getAs[Long]("exact"), r.getAs[String]("key")))
    assert(top.map(_.getAs[String]("key")).toSeq === Seq("a", "b", "c", "d"))
  }

  test("x215 joinSizeEstimate: full-universe sample is exact; a partial " +
      "sample scales the sampled-key product sum") {
    import spark.implicits._
    import graft.analytics.Joins
    import graft.sampling.Sampling
    // heavy key 7 (5×3 rows), plus singletons
    val left = (Seq.fill(5)(7L) ++ (1L to 10L)).toDF("k")
    val right = (Seq.fill(3)(7L) ++ (6L to 15L)).toDF("k")
    val full = Joins.joinSizeEstimate(left, col("k"), right, col("k"),
      sampleBuckets = Sampling.Buckets).head()
    // exact: key 7 -> 6*4 (7 appears 5+1 left, 3+1 right), keys 6,8,9,10
    // -> 1 each = 28
    assert(full.getAs[Long]("exact_rows") === 28L)
    assert(full.getAs[Double]("est_rows") === 28.0)
    assert(full.getAs[Double]("est_ratio") === 1.0)
    // partial sample: expectation recomputed from the SAME hash — the
    // assertion follows the estimator's definition
    val b = Sampling.Buckets / 4
    val in = (1L to 15L).map(i => i ->
      (spark.range(i, i + 1).select(
        Sampling.hashBucket(col("id"), "joinsize")).head().getLong(0) < b))
      .toMap
    val lc = (Seq.fill(5)(7L) ++ (1L to 10L)).filter(in)
      .groupBy(identity).view.mapValues(_.size).toMap
    val rc = (Seq.fill(3)(7L) ++ (6L to 15L)).filter(in)
      .groupBy(identity).view.mapValues(_.size).toMap
    val expect = lc.keySet.intersect(rc.keySet).toSeq
      .map(k => lc(k).toLong * rc(k)).sum * 4.0
    val part = Joins.joinSizeEstimate(left, col("k"), right, col("k"),
      sampleBuckets = b).head()
    assert(part.getAs[Double]("est_rows") === expect)
  }

  test("x210 robustOutliers: hand median/MAD, a spike the mean-based " +
      "sigma would mask, and the MAD-0 degenerate") {
    import spark.implicits._
    val rows = Seq(
      ("g", Some(1.0)), ("g", Some(2.0)), ("g", Some(3.0)),
      ("g", Some(4.0)), ("g", Some(100.0)), ("g", None),
      // constant-plus-one group: MAD = 0, so the single deviating row
      // flags (ad 1 > 0) and the constant rows do not (strict >)
      ("h", Some(5.0)), ("h", Some(5.0)), ("h", Some(5.0)),
      ("h", Some(6.0))).toDF("t", "v")
    val got = Distribution.robustOutliers(rows, col("t"), col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    val g = got("g")
    // median 3, deviations (2,1,0,1,97) -> MAD 1; thr = 3*1.4826
    assert(g.getAs[Long]("n") === 5L) // the null row is excluded
    assert(g.getAs[Double]("median") === 3.0)
    assert(g.getAs[Double]("mad") === 1.0)
    assert(g.getAs[Double]("sigma_robust") === 1.4826)
    assert(g.getAs[Long]("n_outliers") === 1L)
    assert(g.getAs[Double]("outlier_rate") === 0.2)
    // mean/std would be dragged to ~22/43 — the 100 spike sits barely
    // 1.8 classic sigmas out and would NOT flag at k=3; MAD catches it
    val h = got("h")
    assert(h.getAs[Double]("mad") === 0.0)
    assert(h.getAs[Long]("n_outliers") === 1L)
  }
}
