package graft

import org.apache.spark.sql.functions._
import graft.clean.Validation
import graft.features.Features
import graft.physics.Power

/** Property-based invariants (SURVEY.md §5.4). Driver-side evaluation of the
  * same Catalyst expressions keeps the properties fast (no job per case).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private lazy val speeds = Seq.tabulate(600)(i => i * 0.05 - 5.0) // -5..25

  test("power curve: 0 outside [3,25], never exceeds rated 2500") {
    val out = speeds.toDF("v")
      .select(col("v"), Power.turbinePowerKw(lit(1.225), col("v")).as("p"))
      .collect()
    out.foreach { r =>
      val (v, p) = (r.getDouble(0), r.getDouble(1))
      assert(p >= 0.0 && p <= 2500.0, s"v=$v p=$p")
      if (v < 3.0 || v > 25.0) assert(p === 0.0, s"v=$v")
    }
  }

  test("range filter never emits out-of-range rows and is idempotent") {
    val df = speeds.toDF("wind_speed_mps")
    val once = Validation.rangeFilter(df, Map("wind_speed_mps" -> (0.0, 20.0)))
    assert(once.filter(col("wind_speed_mps") < 0 || col("wind_speed_mps") > 20)
      .count() === 0)
    assert(Validation.rangeFilter(once, Map("wind_speed_mps" -> (0.0, 20.0)))
      .count() === once.count())
  }

  test("Day/Night partition is total over all 24 hours") {
    val out = (0 until 24).toDF("h")
      .select(Features.timeOfDay(col("h")).as("tod"))
      .groupBy("tod").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("Day") + out("Night") === 24)
    assert(out("Day") === 12)
  }

  test("dedup is idempotent") {
    val df = Seq(("a", 1, 1L), ("a", 1, 2L), ("a", 2, 3L), ("b", 1, 4L))
      .toDF("k", "t", "ord")
    val once = Validation.dedupeFirst(df, Seq("k", "t"), Seq(col("ord")))
    val twice = Validation.dedupeFirst(once, Seq("k", "t"), Seq(col("ord")))
    assert(once.collect().toSet === twice.collect().toSet)
    assert(once.count() === 3)
  }

  test("effective efficiency stays within [0.05, formula-max]") {
    val temps = Seq.tabulate(200)(i => i * 1.0 - 50.0)
    temps.toDF("t").select(Power.effectiveEfficiency(col("t")).as("e"))
      .collect().foreach { r =>
        assert(r.getDouble(0) >= 0.05)
      }
  }

  test("zValue is a bijection: deinterleaving recovers both inputs") {
    val rnd = new scala.util.Random(13)
    val pts = Seq.fill(300)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val out = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.warehouse.Layout.zValue(col("x"), col("y"), bits = 16).as("z"))
      .collect()
    out.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      var (dx, dy) = (0L, 0L)
      (0 until 16).foreach { i =>
        dx |= ((z >> (2 * i)) & 1L) << i
        dy |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(dx === x && dy === y, s"z=$z decoded to ($dx,$dy), not ($x,$y)")
    }
  }

  test("zValue preserves locality: moving one unit moves z within its quad") {
    // property actually used for pruning: the top 2k bits of z define a
    // 2^(bits-k)-square cell, so points in the same cell share a bucket
    val rnd = new scala.util.Random(29)
    val pts = Seq.fill(200)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    pts.toDF("x", "y").select(
        graft.warehouse.Layout.zBucket(
          graft.warehouse.Layout.zValue(col("x"), col("y"), 10), 10, 16).as("b"),
        graft.warehouse.Layout.zBucket(
          graft.warehouse.Layout.zValue((col("x") / 256).cast("long"),
            (col("y") / 256).cast("long"), 2), 2, 16).as("cell"))
      .collect().foreach { r =>
        assert(r.getLong(0) === r.getLong(1),
          "bucket must equal the coarse cell id of the point's quadrant")
      }
  }

  test("budget selection is monotone: a bigger budget keeps a superset") {
    val rnd = new scala.util.Random(7)
    val docs = Seq.tabulate(300)(i => (i.toLong, rnd.nextDouble(), 5L + rnd.nextInt(20)))
      .toDF("doc_id", "score", "n_tokens")
    def sel(b: Long) = graft.sampling.BudgetSelect.selectUnderBudget(docs,
        col("doc_id"), col("score"), col("n_tokens"), budget = b, numBuckets = 32)
      .collect().map(_.getLong(0)).toSet
    val small = sel(500)
    val big = sel(2000)
    assert(small.subsetOf(big), "growing the budget must never drop a doc")
    assert(big.size > small.size)
  }

  test("token entropy obeys its information bounds on random corpora") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "b", "c", "dd", "eee", "ffff")
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")))
      .toDF("doc_id", "text")
    graft.text.TfIdf.tokenEntropy(docs, col("doc_id"), col("text"))
      .collect().foreach { r =>
        val (nTok, nDis) = (r.getInt(1), r.getLong(2))
        val (h, hn, ttr) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
        assert(h >= 0.0 && h <= math.log(nDis.toDouble) + 1e-9,
          s"0 <= H <= ln(n_distinct): $r")
        assert(hn >= 0.0 && hn <= 1.0 + 1e-9, s"normalized entropy in [0,1]: $r")
        assert(ttr > 0.0 && ttr <= 1.0 && nDis <= nTok, s"TTR sane: $r")
      }
  }

  test("source KL divergence is non-negative, zero only at the corpus distribution") {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("x", "y", "z", "w")
    val docs = Seq.tabulate(30)(i =>
      (i.toLong, s"s${i % 3}",
        Seq.fill(5 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      .toDF("doc_id", "source", "text")
    val kls = graft.text.TfIdf.sourceDivergence(docs, col("source"), col("text"))
      .collect().map(r => r.getString(0) -> r.getDouble(2))
    assert(kls.length === 3)
    kls.foreach { case (s, kl) => assert(kl >= 0.0, s"KL($s) = $kl < 0") }
  }

  test("water-fill allocations always sum to min(budget, total capacity)") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val caps = Seq.tabulate(12)(i => (s"g$i", 1L + rnd.nextInt(500).toLong))
        .toDF("g", "cap")
      val total = caps.agg(sum(col("cap"))).head().getLong(0)
      for (budget <- Seq(total / 3, total - 1, total + 100)) {
        val out = graft.sampling.BudgetSelect.waterFill(caps, col("g"),
            col("cap"), math.max(budget, 1L))
          .collect()
        val allocSum = out.map(_.getDouble(2)).sum
        val expected = math.min(math.max(budget, 1L), total).toDouble
        assert(math.abs(allocSum - expected) < 1e-3,
          s"trial $trial budget $budget: $allocSum != $expected")
        out.foreach(r => assert(r.getDouble(2) <= r.getLong(1) + 1e-9,
          "no group may exceed its capacity"))
      }
    }
  }

  test("transition-matrix probabilities sum to 1 per from-state") {
    val rnd = new scala.util.Random(29)
    val states = Vector("a", "b", "c", "d")
    val ev = Seq.tabulate(300)(i =>
      (i % 13, new java.sql.Timestamp(i * 1000L), i.toLong,
        states(rnd.nextInt(states.size))))
      .toDF("k", "t", "id", "s")
    val rows = graft.analytics.Temporal.transitionMatrix(ev, "k", "t",
        col("s"), Seq("id"))
      .collect().map(r => r.getString(0) -> r.getDouble(3))
    rows.groupBy(_._1).foreach { case (from, ps) =>
      val sum = ps.map(_._2).sum
      assert(math.abs(sum - 1.0) < 1e-4, s"$from rows sum to $sum")
    }
  }

  test("funnel reach is monotonically non-increasing stage over stage") {
    val rnd = new scala.util.Random(17)
    val steps = Vector("s1", "s2", "s3")
    val ev = Seq.tabulate(400)(i =>
      (i.toLong % 37, new java.sql.Timestamp(rnd.nextInt(100000).toLong * 1000L),
        steps(rnd.nextInt(steps.size))))
      .toDF("u", "ts", "step")
    val ns = graft.analytics.Funnel.funnel(ev, col("u"), col("ts"), col("step"), steps)
      .collect().sortBy(_.getInt(0)).map(_.getLong(2))
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a },
      s"reach must shrink: ${ns.mkString(",")}")
  }

  test("canonicalUrl is idempotent over messy generated URLs") {
    // a canonicalizer that isn't a fixed point re-rewrites its own output
    // and dedup keys drift between passes
    val rnd = new scala.util.Random(11)
    val schemes = Seq("https://", "HTTPS://", "http://")
    val hosts = Seq("Example.com", "www.example.com", "a.B.org:443",
      "x.net:80", "y.io:8080")
    val paths = Seq("/", "/A/b", "/p/q/", "")
    val tails = Seq("", "#frag", "?utm_a=1", "?id=2&utm_b=3",
      "?utm_a=1&utm_b=2", "?utm_a=1&id=4&utm_b=5")
    val urls = Seq.tabulate(300) { _ =>
      schemes(rnd.nextInt(3)) + hosts(rnd.nextInt(5)) +
        paths(rnd.nextInt(4)) + tails(rnd.nextInt(6))
    }
    val out = urls.toDF("u")
      .select(graft.text.Urls.canonicalUrl(col("u")).as("c1"))
      .select(col("c1"), graft.text.Urls.canonicalUrl(col("c1")).as("c2"))
      .collect()
    out.foreach(r => assert(r.getString(0) === r.getString(1),
      s"not a fixed point: '${r.getString(0)}' -> '${r.getString(1)}'"))
  }

  test("intervalOverlapJoin equals the naive theta join on random intervals") {
    val rnd = new scala.util.Random(7)
    def iv(n: Int, tag: String) = Seq.tabulate(n) { i =>
      val s = rnd.nextInt(500000)
      ("k" + rnd.nextInt(3), s"$tag$i",
        new java.sql.Timestamp(s * 1000L),
        new java.sql.Timestamp((s + 1 + rnd.nextInt(40000)) * 1000L))
    }
    val l = iv(60, "L").toDF("g", "lid", "ls", "le")
    val r = iv(60, "R").toDF("g", "rid", "rs", "re")
    val got = graft.analytics.Temporal.intervalOverlapJoin(
        l, r, "g", "ls", "le", "rs", "re", grainSeconds = 7200)
      .select("lid", "r_rid").as[(String, String)].collect().sorted.toSeq
    val naive = l.as("l").join(r.as("r"),
        col("l.g") === col("r.g") && col("ls") <= col("re") &&
          col("rs") <= col("le"))
      .select("lid", "rid").as[(String, String)].collect().sorted.toSeq
    assert(got === naive)
    assert(naive.nonEmpty)
  }

  test("scd2 reconstruction: the covering version matches the last change") {
    val rnd = new scala.util.Random(3)
    val states = Seq("a", "b", "c")
    val ev = Seq.tabulate(300)(i => (i.toLong, "u" + rnd.nextInt(9),
        new java.sql.Timestamp(rnd.nextInt(90000).toLong * 1000L),
        states(rnd.nextInt(3))))
      .toDF("event_id", "k", "ts", "state")
    val dim = graft.warehouse.StarSchema.scd2(ev, "k", "ts",
        Seq(col("ts"), col("event_id")), Seq(col("state")))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getTimestamp(2).getTime, Option(r.getTimestamp(3)).map(_.getTime)))
    val events = ev.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime, r.getString(3)))
    // probe each key at several instants: the dim row covering t must
    // carry the state of the latest event at-or-before t
    val probes = events.map(_._3).distinct.sorted.grouped(7).map(_.head)
    for (t <- probes; k <- events.map(_._2).distinct) {
      val truth = events.filter(e => e._2 == k && e._3 <= t)
        .sortBy(e => (e._3, e._1)).lastOption.map(_._4)
      val covering = dim.filter(d => d._1 == k && d._3 <= t &&
        d._4.forall(_ > t)).map(_._2)
      assert(covering.toSeq.sorted === truth.toSeq.sorted,
        s"k=$k t=$t truth=$truth covering=${covering.toSeq}")
    }
  }

  test("cohortRetention: offset-0 cells are always exactly 100%") {
    val rnd = new scala.util.Random(5)
    val ev = Seq.tabulate(500)(i => (i.toLong % 83,
        new java.sql.Timestamp(1704067200000L +
          rnd.nextInt(45) * 86400000L + rnd.nextInt(86400000))))
      .toDF("user_id", "ts")
    val rows = graft.analytics.Temporal.cohortRetention(ev, col("user_id"),
        col("ts"))
      .collect().map(r => (r.getLong(1), r.getDouble(4)))
    assert(rows.exists(_._1 == 0L))
    rows.filter(_._1 == 0L).foreach { case (_, pct) =>
      assert(pct === 100.0, "every user is active in their own first week")
    }
  }

  test("AMS counters are mergeable: sketch(A ∪ B) = sketch(A) + sketch(B)") {
    import graft.analytics.Distribution
    val a = Seq.tabulate(200)(i => s"k${i % 13}").toDF("k")
    val b = Seq.tabulate(150)(i => s"k${i % 7}").toDF("k")
    val sa = Distribution.amsF2Sketch(a, col("k")).head()
    val sb = Distribution.amsF2Sketch(b, col("k")).head()
    val su = Distribution.amsF2Sketch(a.unionAll(b), col("k")).head()
    // column 0 is n_rows; counters follow — the shard-merge contract is
    // plain column-wise addition, nothing sketch-library-specific
    (0 to 64).foreach { i =>
      assert(su.getLong(i) === sa.getLong(i) + sb.getLong(i), s"col $i")
    }
  }

  test("curriculum schedule is monotone: sizes and mean difficulty " +
      "non-decreasing, final epoch = corpus") {
    import graft.sampling.Curriculum
    val df = Seq.tabulate(97)(i => ((i * 37) % 61).toLong).toDF("d")
    val rows = Curriculum.schedule(df, col("d"), epochs = 7)
      .orderBy(col("epoch")).collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getDouble(3)))
    rows.sliding(2).foreach { case Array((_, n1, m1), (e2, n2, m2)) =>
      assert(n2 >= n1, s"epoch $e2 shrank")
      assert(m2 >= m1 - 1e-9, s"epoch $e2 got easier") // easy-first pacing
    }
    assert(rows.last._2 === 97L)
  }

  test("vocab coverage is monotone in k, capped at 1, exact at the clamp") {
    import graft.text.TfIdf
    val text = Seq.tabulate(300)(i => s"w${(i * i) % 40}").mkString(" ")
    val ks = Seq(1L, 3L, 7L, 15L, 31L, 63L, 1000L)
    val rows = TfIdf.vocabCoverage(Seq(text).toDF("text"), col("text"), ks)
      .orderBy(col("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    rows.sliding(2).foreach { case Array((_, _, c1), (k2, _, c2)) =>
      assert(c2 >= c1 - 1e-9, s"coverage dropped at k=$k2")
    }
    rows.foreach { case (k, used, c) =>
      assert(c > 0.0 && c <= 1.0 && used <= k)
    }
    assert(rows.last._3 === 1.0)
  }

  test("bootstrap CI brackets are ordered and contain the point mean " +
      "on a well-behaved frame") {
    import graft.analytics.Evaluation
    val df = Seq.tabulate(120)(i => (i.toLong, ((i * 17) % 50 + 10).toLong))
      .toDF("id", "v")
    val r = Evaluation.bootstrapCi(df, col("id"), col("v")).head()
    val (mean, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(lo <= hi)
    assert(lo <= mean && mean <= hi,
      s"94% interval [$lo, $hi] should bracket $mean here")
  }
}
