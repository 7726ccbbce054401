package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

import graft.analytics.{Sessions, Temporal}

/** As-of join, range join, and sessionization on hand-checkable data. */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    ("A", ts("2025-01-01 10:00:00"), 1.0),
    ("A", ts("2025-01-01 10:05:00"), 2.0),
    ("B", ts("2025-01-01 10:01:00"), 9.0))
    .toDF("sym", "qts", "px").repartition(4)

  private val trades = Seq(
    ("A", ts("2025-01-01 09:59:00"), 1L), // before any quote -> null
    ("A", ts("2025-01-01 10:00:00"), 2L), // exact tie -> 10:00 quote
    ("A", ts("2025-01-01 10:04:59"), 3L), // -> 10:00 quote
    ("A", ts("2025-01-01 10:30:00"), 4L), // -> 10:05 quote
    ("C", ts("2025-01-01 10:00:00"), 5L)) // key with no quotes -> null
    .toDF("sym", "qts", "trade_id").repartition(3)

  test("asofJoin picks the latest right row at or before each left time") {
    val out = Temporal.asofJoin(trades, quotes, "sym", "qts")
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Double]("asof_px")).map(_.toDouble)).toMap
    assert(out === Map(1L -> None, 2L -> Some(1.0), 3L -> Some(1.0),
      4L -> Some(2.0), 5L -> None))
  }

  test("asofJoin breaks same-timestamp right duplicates by tiebreak (greatest wins)") {
    val dup = Seq(
      ("A", ts("2025-01-01 10:00:00"), 1.0, 1L),
      ("A", ts("2025-01-01 10:00:00"), 7.0, 9L))
      .toDF("sym", "qts", "px", "qid").repartition(3)
    val one = trades.filter(col("trade_id") === 3L)
    val out = Temporal.asofJoin(one, dup, "sym", "qts", rightTiebreak = Seq("qid"))
      .select(col("asof_px"), col("asof_qid")).head()
    assert(out.getDouble(0) === 7.0 && out.getLong(1) === 9L)
  }

  test("asofJoin forward direction picks the earliest right row at or after") {
    val out = Temporal.asofJoin(trades, quotes, "sym", "qts",
        direction = "forward")
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Double]("asof_px")).map(_.toDouble)).toMap
    assert(out === Map(
      1L -> Some(1.0), // 09:59 -> next quote 10:00
      2L -> Some(1.0), // exact tie inclusive
      3L -> Some(2.0), // 10:04:59 -> 10:05
      4L -> None,      // nothing after 10:30
      5L -> None))     // key with no quotes
  }

  test("asofJoinSalted is row-identical to asofJoin on a dominant-key fixture") {
    // one key carries 97% of the left rows — the skew the salted variant
    // exists for; equality must hold for every bucket count
    val rnd = new scala.util.Random(42)
    val hotTrades = (1L to 300L).map { i =>
      val sym = if (i <= 290) "HOT" else s"S${i % 5}"
      (sym, ts(f"2025-01-01 ${1 + rnd.nextInt(22)}%02d:${rnd.nextInt(60)}%02d:00"), i)
    }.toDF("sym", "qts", "trade_id").repartition(7)
    val hotQuotes = (1L to 50L).map { i =>
      val sym = if (i <= 40) "HOT" else s"S${i % 5}"
      (sym, ts(f"2025-01-01 ${1 + rnd.nextInt(22)}%02d:${rnd.nextInt(60)}%02d:00"), i * 1.5, i)
    }.toDF("sym", "qts", "px", "qid").repartition(5)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val plain = canon(Temporal.asofJoin(hotTrades, hotQuotes, "sym", "qts",
      rightTiebreak = Seq("qid")))
    for (buckets <- Seq(2, 8); dir <- Seq("backward", "forward")) {
      val expected = if (dir == "backward") plain
        else canon(Temporal.asofJoin(hotTrades, hotQuotes, "sym", "qts",
          rightTiebreak = Seq("qid"), direction = dir))
      val salted = canon(Temporal.asofJoinSalted(hotTrades, hotQuotes, "sym",
        "qts", saltSource = Seq("trade_id"), saltBuckets = buckets,
        rightTiebreak = Seq("qid"), direction = dir))
      assert(salted === expected, s"buckets=$buckets dir=$dir")
    }
  }

  test("rangeJoin pairs points with every covering interval, once each") {
    val intervals = Seq(
      ("u1", 1L, ts("2025-01-01 10:00:00"), ts("2025-01-01 10:10:00")),
      ("u1", 2L, ts("2025-01-01 10:05:00"), ts("2025-01-01 10:30:00")),
      ("u2", 3L, ts("2025-01-01 10:00:00"), ts("2025-01-01 10:10:00")))
      .toDF("uid", "iv_id", "s", "e").repartition(3)
    val points = Seq(
      ("u1", 10L, ts("2025-01-01 10:07:00")), // in both u1 intervals
      ("u1", 11L, ts("2025-01-01 10:20:00")), // only interval 2
      ("u1", 12L, ts("2025-01-01 11:00:00")), // none
      ("u2", 13L, ts("2025-01-01 10:10:00"))) // inclusive end
      .toDF("uid", "pt_id", "t").repartition(2)
    // grain much smaller than interval length exercises multi-bucket explode
    val out = Temporal.rangeJoin(points, intervals, "uid", "t", "s", "e",
        grainSeconds = 60, prefix = "m_")
      .select(col("pt_id"), col("m_iv_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((10L, 1L), (10L, 2L), (11L, 2L), (13L, 3L)))
  }

  test("sessionize splits on gap and is deterministic across partitioning") {
    val ev = Seq(
      ("u1", ts("2025-01-01 10:00:00"), 1L),
      ("u1", ts("2025-01-01 10:10:00"), 2L), // same session (10 min gap)
      ("u1", ts("2025-01-01 11:00:00"), 3L), // > 30 min -> new session
      ("u2", ts("2025-01-01 10:00:00"), 4L))
      .toDF("uid", "t", "eid")
    def run(parts: Int) = Sessions.sessionize(ev.repartition(parts),
        "uid", "t", gapSeconds = 1800, order = Seq("eid"))
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    val out = run(4)
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
    assert(run(1) === out)
  }

  test("asofJoin plans exactly one shuffle exchange and no join operator") {
    val plan = Temporal.asofJoin(trades, quotes, "sym", "qts")
      .queryExecution.executedPlan.toString
    val shuffles = plan.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange"))
    // trades/quotes are repartition()ed test frames, which plan their own
    // round-robin exchanges; the operator itself adds only the keyed one
    val keyed = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(keyed === 1, s"expected 1 keyed shuffle, plan:\n$plan")
    assert(!plan.contains("Join"), s"as-of should not plan a join:\n$plan")
    assert(shuffles <= 3, s"unexpected extra exchanges:\n$plan")
  }

  test("session aggregate reuses the sessionize window partitioning (no 2nd keyed shuffle)") {
    val ev = Seq(("u1", ts("2025-01-01 10:00:00"), 1L))
      .toDF("uid", "t", "eid")
    val plan = Sessions.sessionize(ev, "uid", "t", 1800, Seq("eid"))
      .groupBy(col("uid"), col("session_idx"))
      .agg(count(lit(1)).as("cnt"))
      .queryExecution.executedPlan.toString
    // hashpartitioning(uid) from the window satisfies the clustering
    // requirement of groupBy(uid, session_idx): one keyed exchange total
    val keyed = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(keyed === 1, s"expected 1 keyed shuffle, plan:\n$plan")
  }

  test("sessionAgg (session_window) agrees with sessionize on session bounds") {
    val ev = Seq(
      ("u1", ts("2025-01-01 10:00:00"), 1.0),
      ("u1", ts("2025-01-01 10:10:00"), 2.0),
      ("u1", ts("2025-01-01 11:00:00"), 3.0))
      .toDF("uid", "t", "v")
    val out = Sessions.sessionAgg(ev, "uid", "t", gapSeconds = 1800,
        Seq(count(lit(1)).as("cnt"), sum(col("v")).as("sum_v")))
      .orderBy(col("session_start"))
      .collect().map(r => (r.getAs[Long]("cnt"), r.getAs[Double]("sum_v")))
    assert(out.toSeq === Seq((2L, 3.0), (1L, 3.0)))
  }

  test("resampleInterpolate: closed-form grid values, exact hits, singleton key") {
    val obs = Seq(
      ("A", ts("2025-01-01 00:00:00"), 0.0),
      ("A", ts("2025-01-01 00:00:10"), 100.0),
      ("A", ts("2025-01-01 00:00:20"), 40.0),
      ("B", ts("2025-01-01 05:00:00"), 7.5)) // single observation
      .toDF("k", "t", "v")
    val out = Temporal.resampleInterpolate(obs, "k", "t", col("v"),
        stepSeconds = 5L)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getDouble(2)))
      .toSet
    assert(out === Set(
      ("A", "2025-01-01 00:00:00.0", 0.0),   // exact hit
      ("A", "2025-01-01 00:00:05.0", 50.0),  // interior midpoint
      ("A", "2025-01-01 00:00:10.0", 100.0), // exact hit
      ("A", "2025-01-01 00:00:15.0", 70.0),  // downward segment midpoint
      ("A", "2025-01-01 00:00:20.0", 40.0),  // exact end
      ("B", "2025-01-01 05:00:00.0", 7.5)))  // singleton: both brackets same
  }

  test("gaps reports interior silences over the threshold, micros-exact") {
    val obs = Seq(
      ("A", ts("2025-01-01 10:00:00")),
      ("A", ts("2025-01-01 10:00:30")),   // 30 s gap: below threshold
      ("A", ts("2025-01-01 11:00:30")),   // 3600 s gap: reported
      ("A", Timestamp.valueOf("2025-01-01 11:01:30.5")), // 60.5 s: reported
      ("B", ts("2025-01-01 10:00:00")),   // singleton key: no interior gap
      ("C", ts("2025-01-01 10:00:00")),
      ("C", ts("2025-01-01 10:01:00")))   // exactly 60 s: NOT > threshold
      .toDF("k", "t").repartition(3)
    val out = Temporal.gaps(obs, "k", "t", minGapSeconds = 60)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq === Seq(
      ("A", "2025-01-01 10:00:30.0", "2025-01-01 11:00:30.0", 3600L),
      ("A", "2025-01-01 11:00:30.0", "2025-01-01 11:01:30.5", 60L)),
      "strictly-greater threshold, sub-second spacing honored, truncated secs")
  }

  test("a38 session_window boundary: exact-gap MERGES (the a18 strict-> rule), over-gap breaks") {
    val ev = Seq(
      ("u", ts("2025-01-01 10:00:00"), 1.0),
      ("u", ts("2025-01-01 10:30:00"), 2.0),  // EXACTLY 30 min → merges
      ("u", ts("2025-01-01 11:00:01"), 3.0))  // 30 min 1 s → breaks
      .toDF("user_id", "t", "value")
    val out = ev
      .groupBy(org.apache.spark.sql.functions.session_window(col("t"),
        "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").cast("string"), col("w.end").cast("string"),
        col("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out.toSeq === Seq(
      ("2025-01-01 10:00:00", "2025-01-01 11:00:00", 2L),
      ("2025-01-01 11:00:01", "2025-01-01 11:30:01", 1L)),
      "exact-duration gap must merge; anything longer must break — the " +
        "same boundary rule the a38 oracle's gaps-and-islands chain states")
  }

  test("j12 asofNearest picks the closer side; distance ties favor the past") {
    val right = Seq(
      ("A", ts("2025-01-01 10:07:00"), 7.0),
      ("A", ts("2025-01-01 10:12:00"), 12.0))
      .toDF("sym", "qts", "px").repartition(2)
    val left = Seq(
      ("A", ts("2025-01-01 10:09:00"), 1L),  // 2 min back vs 3 fwd → 10:07
      ("A", ts("2025-01-01 10:11:00"), 2L),  // 4 back vs 1 fwd → 10:12
      ("A", ts("2025-01-01 10:09:30"), 3L),  // exact tie 2:30 each → past
      ("A", ts("2025-01-01 10:01:00"), 4L),  // before all → forward only
      ("Z", ts("2025-01-01 10:00:00"), 5L))  // no right rows → null
      .toDF("sym", "qts", "trade_id").repartition(3)
    val out = Temporal.asofNearest(left, right, "sym", "qts")
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[Any]("near_px")).map(_.asInstanceOf[Double])).toMap
    assert(out === Map(1L -> Some(7.0), 2L -> Some(12.0), 3L -> Some(7.0),
      4L -> Some(7.0), 5L -> None))
  }

  test("a43 transitionMatrix: conditional probabilities per from-state") {
    // u1: A→B→A→B ; u2: A→B — transitions: A→B ×3, B→A ×1
    val df = Seq(
      (1L, ts("2025-01-01 00:00:01"), 1L, "A"),
      (1L, ts("2025-01-01 00:00:02"), 2L, "B"),
      (1L, ts("2025-01-01 00:00:03"), 3L, "A"),
      (1L, ts("2025-01-01 00:00:04"), 4L, "B"),
      (2L, ts("2025-01-01 00:00:01"), 5L, "A"),
      (2L, ts("2025-01-01 00:00:02"), 6L, "B"))
      .toDF("u", "t", "id", "s").repartition(3)
    val got = Temporal.transitionMatrix(df, "u", "t", col("s"), Seq("id"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map(
      ("A", "B") -> ((3L, 1.0)),
      ("B", "A") -> ((1L, 1.0))))
  }

  test("a42 monotonicityAudit counts resets and the worst drop") {
    val df = Seq(
      ("m", ts("2025-01-01 00:00:01"), 1L, 1.0),
      ("m", ts("2025-01-01 00:00:02"), 2L, 2.0),
      ("m", ts("2025-01-01 00:00:03"), 3L, 5.0),
      ("m", ts("2025-01-01 00:00:04"), 4L, 3.0), // reset: drop 2
      ("m", ts("2025-01-01 00:00:05"), 5L, 4.0),
      ("m", ts("2025-01-01 00:00:06"), 6L, 0.5), // reset: drop 3.5
      ("ok", ts("2025-01-01 00:00:01"), 1L, 1.0),
      ("ok", ts("2025-01-01 00:00:02"), 2L, 1.0)) // equal is NOT a decrease
      .toDF("k", "t", "id", "v").repartition(3)
    val got = Temporal.monotonicityAudit(df, "k", "t", col("v"), Seq("id"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)), r.getBoolean(4)))).toMap
    assert(got("m") === ((6L, 2L, Some(3.5), false)))
    assert(got("ok") === ((2L, 0L, None, true)))
  }

  test("a41 timeWeightedMean: hold durations weight the mean, cadence doesn't") {
    // v=10 held 10 s, v=20 held 30 s, final reading holds nothing:
    // tw = (10·10 + 20·30)/40 = 17.5 where the row mean is 40/3
    val df = Seq(
      ("k", ts("2025-01-01 00:00:00"), 1L, 10.0),
      ("k", ts("2025-01-01 00:00:10"), 2L, 20.0),
      ("k", ts("2025-01-01 00:00:40"), 3L, 999.0))
      .toDF("k", "t", "id", "v").repartition(2)
    val got = Temporal.timeWeightedMean(df, "k", "t", col("v"), Seq("id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).head
    assert(got === (("k", 2L, 40000L, 17.5)))
  }

  test("a33 availability: downtime ratio, gap accounting, singleton null") {
    val df = Seq(
      ("A", ts("2025-01-01 00:00:00"), 1L),
      ("A", ts("2025-01-01 01:00:00"), 2L),
      ("A", ts("2025-01-01 10:00:00"), 3L), // 9 h silence > 6 h
      ("A", ts("2025-01-01 11:00:00"), 4L),
      ("B", ts("2025-01-01 05:00:00"), 5L)) // single reading
      .toDF("k", "t", "id").repartition(3)
    val got = Temporal.availability(df, "k", "t", minGapSeconds = 21600,
        order = Seq("id"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          Option(r.get(5)).map(_.asInstanceOf[Double])))).toMap
    val h = 3600L * 1000000L
    assert(got("A") === ((4L, 11 * h, 1L, 9 * h,
      Some(math.rint((1.0 - 9.0 / 11.0) * 1e6) / 1e6))))
    assert(got("B") === ((1L, 0L, 0L, 0L, None)))
  }

  test("intervalOverlapJoin: exact overlaps, once each, inclusive bounds") {
    // A spans many 1 h buckets (the ownership filter must still emit its
    // pairs exactly once); D×W touch at a single instant (inclusive)
    val left = Seq(
      ("k", "A", ts("2025-01-01 00:00:00"), ts("2025-01-01 10:00:00")),
      ("k", "B", ts("2025-01-01 05:00:00"), ts("2025-01-01 05:30:00")),
      ("k", "C", ts("2025-01-01 20:00:00"), ts("2025-01-01 21:00:00")),
      ("k", "D", ts("2025-01-01 12:00:00"), ts("2025-01-01 13:00:00"))
    ).toDF("g", "name", "ls", "le")
    val right = Seq(
      ("k", "X", ts("2025-01-01 04:00:00"), ts("2025-01-01 06:00:00")),
      ("k", "Y", ts("2025-01-01 09:30:00"), ts("2025-01-01 11:00:00")),
      ("k", "Z", ts("2025-01-01 22:00:00"), ts("2025-01-01 23:00:00")),
      ("k", "W", ts("2025-01-01 13:00:00"), ts("2025-01-01 14:00:00"))
    ).toDF("g", "rname", "rs", "re")
    val out = Temporal.intervalOverlapJoin(left, right, "g",
        "ls", "le", "rs", "re", grainSeconds = 3600)
      .collect().map(r => (r.getString(1), r.getString(4)) ->
        (r.getTimestamp(7), r.getTimestamp(8), r.getLong(9))).toMap
    assert(out.keySet === Set(("A", "X"), ("A", "Y"), ("B", "X"), ("D", "W")))
    assert(out(("A", "X")) ===
      ((ts("2025-01-01 04:00:00"), ts("2025-01-01 06:00:00"), 7200000000L)))
    assert(out(("A", "Y")) ===
      ((ts("2025-01-01 09:30:00"), ts("2025-01-01 10:00:00"), 1800000000L)))
    assert(out(("B", "X")) ===
      ((ts("2025-01-01 05:00:00"), ts("2025-01-01 05:30:00"), 1800000000L)))
    assert(out(("D", "W")) ===
      ((ts("2025-01-01 13:00:00"), ts("2025-01-01 13:00:00"), 0L)))
    // the collect's size equals the key set: each pair appeared ONCE
    assert(Temporal.intervalOverlapJoin(left, right, "g",
      "ls", "le", "rs", "re", grainSeconds = 3600).count() === 4L)
  }

  test("cohortRetention: first-seen-week cohorts, exact per-offset shares") {
    // 2024-01-01 is an ISO Monday → weeks W0 = Jan 1, W1 = Jan 8, W2 = Jan 15.
    // u1/u2 join in W0 (u1 stays 3 weeks, u2 lapses); u3 joins in W1.
    val ev = Seq(
      (1L, ts("2024-01-02 10:00:00")), (1L, ts("2024-01-10 09:00:00")),
      (1L, ts("2024-01-16 08:00:00")),
      (2L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-05 23:59:59")),
      (3L, ts("2024-01-08 12:00:00")), (3L, ts("2024-01-21 12:00:00"))
    ).toDF("user_id", "ts").repartition(3)
    val w0 = ts("2024-01-01 00:00:00").toInstant.getEpochSecond
    val week = 7L * 86400L
    val got = Temporal.cohortRetention(ev, col("user_id"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got === Map(
      (w0, 0L) -> ((2L, 2L, 100.0)),          // both W0 users active in W0
      (w0, 1L) -> ((1L, 2L, 50.0)),           // only u1 returns in W1
      (w0, 2L) -> ((1L, 2L, 50.0)),
      (w0 + week, 0L) -> ((1L, 1L, 100.0)),   // u3's own cohort
      (w0 + week, 1L) -> ((1L, 1L, 100.0))))
  }

  test("x147 fanoFactor: burst > poisson-ish > metronome, zeros counted") {
    def t(h: Int, m: Int) = Timestamp.valueOf(f"2025-03-01 $h%02d:$m%02d:00")
    // spine = hours 10,11,12 (H = 3). A bursts (3 in h10, 1 in h12 —
    // its silent h11 must count as a zero), B fires once, C is a
    // perfect metronome (variance exactly 0)
    val ev = Seq(
      ("A", t(10, 1)), ("A", t(10, 2)), ("A", t(10, 3)), ("A", t(12, 1)),
      ("B", t(11, 5)),
      ("C", t(10, 9)), ("C", t(11, 9)), ("C", t(12, 9)))
      .toDF("k", "ts").repartition(3)
    val got = Temporal.fanoFactor(ev, col("k"), col("ts"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // A: n=4, ss=10 → (3·10 − 16)/(3·4) = 14/12; B: (3·1 − 1)/3; C: 0
    assert(got === Map("A" -> ((4L, 3L, 1.166667)),
      "B" -> ((1L, 3L, 0.666667)), "C" -> ((3L, 3L, 0.0))))
  }

  test("x170 stationaryDistribution: oscillator stays uniform, sink absorbs") {
    // user u1 oscillates A,B,A,B,... → P(A→B)=P(B→A)=1; the uniform
    // start is already stationary: π = (.5, .5) at every iteration
    val osc = (0 until 8).map(i =>
      (1L, ts(f"2025-01-01 10:0$i:00"), i.toLong,
        if (i % 2 == 0) "A" else "B", 0.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
      .repartition(3)
    val got = Temporal.stationaryDistribution(osc, "user_id", "ts",
        col("event_type"), order = Seq("event_id"), iters = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === Map("A" -> 0.5, "B" -> 0.5))
    // terminal state: A→C only, C has NO outgoing transitions — the
    // dangling self-loop must hold C's mass instead of leaking it, and
    // all mass ends in C (A has no incoming, so it drains immediately)
    val sink = Seq((1L, ts("2025-01-01 10:00:00"), 0L, "A", 0.0),
      (1L, ts("2025-01-01 10:01:00"), 1L, "C", 0.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val s2 = Temporal.stationaryDistribution(sink, "user_id", "ts",
        col("event_type"), order = Seq("event_id"), iters = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(s2 === Map("C" -> 1.0))
  }

  test("x166 kaplanMeier: textbook product-limit with censoring") {
    // observation end = day 10 (user E's last event). censorDays = 3.
    // A: days 0..2 (span 2, last day 2 → churn), B: 0..2 (churn),
    // C: 0..5 (span 5, last day 5 → churn: 10−5 > 3),
    // D: 0..8 (span 8, 10−8 ≤ 3 → censored), E: 0..10 (censored)
    // spine: t=2 (d=2, n=5 → ×3/5), t=5 (d=1, n=3 → ×2/3),
    // t=8 (c=1, n=2 → ×1), t=10 (c=1, n=1 → ×1)
    val rows = Seq(
      ("A", "2025-01-01 00:00:00"), ("A", "2025-01-03 00:00:00"),
      ("B", "2025-01-01 12:00:00"), ("B", "2025-01-03 12:00:00"),
      ("C", "2025-01-01 00:00:00"), ("C", "2025-01-06 00:00:00"),
      ("D", "2025-01-01 00:00:00"), ("D", "2025-01-09 00:00:00"),
      ("E", "2025-01-01 00:00:00"), ("E", "2025-01-11 00:00:00"))
      .map { case (k, t) => (k, ts(t)) }.toDF("k", "t").repartition(3)
    val got = Temporal.kaplanMeier(rows, col("k"), col("t"), censorDays = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    def r6(d: Double) = math.rint(d * 1e6) / 1e6
    assert(got(2L) === ((5L, 2L, 0L, 0.6)))
    assert(got(5L) === ((3L, 1L, 0L, r6(0.6 * 2.0 / 3.0))))
    assert(got(8L) === ((2L, 0L, 1L, r6(0.6 * 2.0 / 3.0))))
    assert(got(10L) === ((1L, 0L, 1L, r6(0.6 * 2.0 / 3.0))))
    // everyone churns at one duration: survival hits exactly 0, no ln(0)
    val dead = Seq(("X", "2025-01-01 00:00:00"), ("X", "2025-01-02 00:00:00"),
      ("Y", "2025-01-01 00:00:00"), ("Y", "2025-01-20 00:00:00"))
      .map { case (k, t) => (k, ts(t)) }.toDF("k", "t")
    val dd = Temporal.kaplanMeier(dead, col("k"), col("t"), censorDays = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(dd(1L) === 0.5 && dd(19L) === 0.5) // Y censored at its own end
    val allChurn = Seq(("X", "2025-01-01 00:00:00"),
      ("X", "2025-01-02 00:00:00"), ("Z", "2025-01-10 00:00:00"))
      .map { case (k, t) => (k, ts(t)) }.toDF("k", "t")
    // X spans 1 day, last seen day 1, end day 9 → churn; Z spans 0,
    // last day 9 → censored at 0; at t=1 d=1=n → survival 0
    val ac = Temporal.kaplanMeier(allChurn, col("k"), col("t"), 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(ac(1L) === 0.0)
  }
}
