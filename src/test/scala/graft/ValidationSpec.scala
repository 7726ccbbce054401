package graft

import org.apache.spark.sql.functions._
import graft.clean.Validation
import graft.ingest.Sources

/** P1-P5 cleaning family (ref `Wind_Processing.py:15-43`). */
class ValidationSpec extends SparkSpec {
  import spark.implicits._

  test("P1 requireColumns raises on a missing column") {
    val df = Seq((1, "a")).toDF("x", "y")
    Validation.requireColumns(df, Seq("x", "y")) // no throw
    assertThrows[IllegalArgumentException] {
      Validation.requireColumns(df, Seq("x", "z"))
    }
  }

  test("P2 coerceNumeric nulls bad cells, keeps rows") {
    val out = Validation.coerceNumeric(
      Seq("1.5", "oops", "", "42").toDF("v"), Seq("v"))
      .collect().map(r => Option(r.get(0)))
    assert(out.toSeq === Seq(Some(1.5), None, None, Some(42.0)))
  }

  test("P3 rangeFilter bounds are inclusive on both ends") {
    val df = Seq(-0.1, 0.0, 30.0, 60.0, 60.1).toDF("wind_speed_mps")
    val kept = Validation.rangeFilter(df, Map("wind_speed_mps" -> (0.0, 60.0)))
      .collect().map(_.getDouble(0)).toSeq
    assert(kept === Seq(0.0, 30.0, 60.0))
  }

  test("P4 fillDefaults fills only nulls") {
    val df = Seq(Some(990.0), None).toDF("air_pressure_hPa")
    val out = Validation.fillDefaults(df, Map("air_pressure_hPa" -> 1013.25))
      .collect().map(_.getDouble(0)).toSeq
    assert(out === Seq(990.0, 1013.25))
  }

  test("P5 dedupeFirst keeps the first row by the given order, deterministically") {
    val df = Seq(
      ("S1", "t1", "PREDICTION", 2L),
      ("S1", "t1", "API", 1L),
      ("S1", "t2", "API", 3L)).toDF("station_id", "timestamp", "src", "ord")
    val out = Validation.dedupeFirst(df, Seq("station_id", "timestamp"),
        Seq(col("ord")))
      .orderBy("ord").collect().map(_.getString(2)).toSeq
    assert(out === Seq("API", "API"))
  }

  test("dead-letter: first failing rule wins, null check fails closed, split is exact") {
    val df = Seq(
      (1L, 10.0, "ok"),      // passes
      (2L, -5.0, "ok"),      // fails rule 1
      (3L, -5.0, "bad"),     // fails both -> rule 1 (first) wins
      (4L, 10.0, "bad"),     // fails rule 2
      (5L, Double.NaN, "ok") // NaN comparison -> null-ish rule fails closed
    ).toDF("id", "v", "tag")
    val rules = Seq(
      "v_range" -> col("v").between(0.0, 100.0),
      "tag_ok" -> (col("tag") === "ok"))
    val (valid, dead) = Validation.partitionValid(df, rules)
    assert(valid.collect().map(_.getLong(0)).toSet === Set(1L))
    val reasons = dead.collect()
      .map(r => r.getLong(0) -> r.getAs[String]("reject_reason")).toMap
    assert(reasons === Map(2L -> "v_range", 3L -> "v_range",
      4L -> "tag_ok", 5L -> "v_range"))
    assert(!valid.columns.contains("reject_reason"))
  }

  test("P5 via Pipeline.transform uses ingest order as the tiebreak") {
    // same (station, ts) key, different payloads: file order must win
    val raw = Sources.withIngestOrder(Seq(
      ("S1", java.sql.Timestamp.valueOf("2025-01-01 10:00:00"), "first"),
      ("S1", java.sql.Timestamp.valueOf("2025-01-01 10:00:00"), "second"))
      .toDF("station_id", "timestamp", "payload"))
    val out = graft.streaming.Pipeline.transform(raw, Map.empty, Map.empty,
      streaming = false)
    assert(out.count() === 1)
    assert(out.head().getAs[String]("payload") === "first")
    assert(!out.columns.contains(Sources.IngestOrderCol))
  }

  test("p19 keySkewAudit: heavy key ranked first with the max/mean ratio") {
    import spark.implicits._
    // key h: 6 rows; a, b: 1 row each → mean 8/3, skew = 6/(8/3) = 2.25
    val df = (Seq.fill(6)("h") ++ Seq("a", "b")).toDF("k").repartition(3)
    val got = Validation.keySkewAudit(df, col("k"), topK = 2)
      .collect().map(r => r.getInt(0) ->
        ((r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got(1) === (("h", 6L, 0.75, 2.25)))
    assert(got(2)._1 === "a") // tie between a and b → key order
    assert(got.size === 2)
  }

  test("p18 winsorize clips to exact interpolated percentiles and flags") {
    import spark.implicits._
    val df = (1 to 20).map(i => (i.toLong, "g", i.toDouble))
      .toDF("id", "g", "v").repartition(3)
    val got = Validation.winsorize(df, col("g"), col("v"), 0.05, 0.95)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(3), r.getBoolean(4))))
      .toMap
    // p05 = 1 + .05·19 = 1.95, p95 = 19.05 (linear interpolation)
    assert(got(1L) === ((1.95, true)))
    assert(got(20L) === ((19.05, true)))
    assert(got(10L) === ((10.0, false)))
    assert(got.values.count(_._2) === 2)
  }

  test("x107 kAnonymityViolations: sub-k classes reported, k-sized ones clean") {
    import spark.implicits._
    val df = (Seq.fill(5)(("en", "s1")) ++ Seq.fill(2)(("en", "s2")) :+
      (("fr", "s1"))).zipWithIndex
      .map { case ((l, s), i) => (i.toLong, l, s) }
      .toDF("id", "lang", "source").repartition(2)
    val got = Validation.kAnonymityViolations(df,
        Seq(col("lang"), col("source")), k = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(("en", "s2") -> 2L, ("fr", "s1") -> 1L))
  }

  test("x217 qiSubsetSweep: hand class counts per subset — the pair " +
      "re-identifies where each single column is safe") {
    import spark.implicits._
    // lang alone: en 7, fr 1 -> fr violates. source alone: s1 6, s2 2
    // -> s2 violates. the PAIR: (en,s1) 5 clean, (en,s2) 2 and (fr,s1)
    // 1 violate — the sweep shows joining columns is what leaks
    val df = (Seq.fill(5)(("en", "s1")) ++ Seq.fill(2)(("en", "s2")) :+
      (("fr", "s1"))).zipWithIndex
      .map { case ((l, s), i) => (i.toLong, l, s) }
      .toDF("id", "lang", "source").repartition(2)
    val got = Validation.qiSubsetSweep(df,
        Seq("lang" -> col("lang"), "source" -> col("source")), k = 5)
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    assert(got.keySet === Set("lang", "source", "lang+source"))
    assert(got("lang") === ((1, 2L, 1L, 1L, 0.125)))
    assert(got("source") === ((1, 2L, 2L, 2L, 0.25)))
    assert(got("lang+source") === ((2, 3L, 1L, 3L, 0.375)))
  }

  test("x131 lDiversityViolations: homogeneous class flagged despite its size") {
    import spark.implicits._
    // class A: 6 rows but ONE sensitive value (k-anonymous, l-broken);
    // class B: 3 rows, 3 distinct values (clean); class C: 2 rows 2 vals
    // (l=3 violation by diversity, not by size)
    val df = (Seq.fill(6)(("A", "flu")) ++
      Seq(("B", "flu"), ("B", "cold"), ("B", "ache")) ++
      Seq(("C", "flu"), ("C", "cold"))).zipWithIndex
      .map { case ((g, s), i) => (i.toLong, g, s) }
      .toDF("id", "grp", "sens").repartition(3)
    val got = Validation.lDiversityViolations(df, Seq(col("grp")),
        col("sens"), l = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map("A" -> ((6L, 1L)), "C" -> ((2L, 2L))))
  }

  test("x134 tClosenessViolations: skewed class flagged, absent terms folded") {
    import spark.implicits._
    // global: en 6 / fr 4. A = all-en (TV .4), B = balanced (TV .1),
    // C = all-fr (TV .6) — the absent-term fold is what makes A and C
    // differ (each has ONE present term; the missing mass must count)
    val df = (Seq.fill(4)(("A", "en")) ++
      Seq(("B", "en"), ("B", "en"), ("B", "fr"), ("B", "fr")) ++
      Seq(("C", "fr"), ("C", "fr"))).zipWithIndex
      .map { case ((g, l), i) => (i.toLong, g, l) }
      .toDF("id", "grp", "lang").repartition(3)
    val got = Validation.tClosenessViolations(df, Seq(col("grp")),
        col("lang"), t = 0.35)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet === Set("A", "C"))
    assert(math.abs(got("A")._2 - 0.4) < 1e-9 && got("A")._1 === 4L)
    assert(math.abs(got("C")._2 - 0.6) < 1e-9 && got("C")._1 === 2L)
  }

  test("j14 refIntegrity: orphan counts per relation, null FKs not orphans") {
    import spark.implicits._
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(9L), None)
      .toDF("fk").repartition(2)
    val got = Validation.refIntegrity(Seq(("c->p", child, "fk", parent, "pk")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("c->p", 4L, 1L)))
  }

  test("p16 debounce: keeps first row and every change, null-safe") {
    import spark.implicits._
    val df = Seq(
      ("k", 1L, Some("on")), ("k", 2L, Some("on")),   // repeat → dropped
      ("k", 3L, Some("off")), ("k", 4L, None),        // change, value→null
      ("k", 5L, None),                                // null→null → dropped
      ("k", 6L, Some("on")),                          // null→value
      ("z", 1L, None))                                // leading null kept
      .toDF("k", "seq", "state").repartition(3)
    val kept = Validation.debounce(df, Seq("k"), Seq(col("seq").asc),
        Seq(col("state")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(kept === Set(("k", 1L), ("k", 3L), ("k", 4L), ("k", 6L), ("z", 1L)))
    // idempotent: debouncing the compacted stream changes nothing
    val once = Validation.debounce(df, Seq("k"), Seq(col("seq").asc),
      Seq(col("state")))
    val twice = Validation.debounce(once, Seq("k"), Seq(col("seq").asc),
      Seq(col("state")))
    assert(once.collect().toSet === twice.collect().toSet)
  }

  test("p15 profile: one pass, one row per atomic column, arrays skipped") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), 2.5, Seq(1, 2)),
      (2L, None, 1.5, Seq(3)),
      (3L, Some("a"), 2.5, Seq.empty[Int]))
      .toDF("id", "k", "v", "arr").repartition(2)
    val got = graft.clean.Profile.profile(df)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5), r.getString(6)))).toMap
    assert(got.keySet === Set("id", "k", "v"), "array column must be skipped")
    assert(got("id") === (("bigint", 3L, 0L, 3L, "1", "3")))
    assert(got("k") === (("string", 3L, 1L, 1L, "a", "a")))
    assert(got("v") === (("double", 3L, 0L, 2L, "1.5", "2.5")))
  }

  test("p20 disorderAudit: lateness vs per-key running max, hand-computed") {
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(3600000L + m * 60000L)
    // A's third arrival carries an event time 3 min behind its running
    // max (the only late row); B arrives in order
    val ev = Seq(
      (1L, "A", ts(0)), (2L, "A", ts(5)), (3L, "A", ts(2)), (4L, "A", ts(7)),
      (5L, "B", ts(1)), (6L, "B", ts(9))
    ).toDF("event_id", "k", "ts").repartition(3)
    val r = Validation.disorderAudit(ev, col("k"), col("ts"),
      order = Seq(col("event_id"))).head()
    assert(r.getLong(0) === 6L)
    assert(r.getLong(1) === 1L)
    assert(r.getDouble(2) === math.rint(1.0 / 6.0 * 1e6) / 1e6)
    assert(r.getLong(3) === 180L * 1000000L)
    // sorted lateness [0,0,0,0,0,1.8e8]: p95 lerps idx 4..5 at 0.75 -> 135 s
    assert(r.getDouble(4) === 135.0)
  }

  test("x163 skewStrategy: count-of-counts gini, p19 verdict thresholds") {
    import spark.implicits._
    // uniform 4 keys × 2 rows: top1 = .25 ≥ .2 → hot verdict is share-
    // driven even when gini = 0 (a tiny key domain IS a broadcast case)
    val uniform = Seq(1, 1, 2, 2, 3, 3, 4, 4).toDF("k")
    val u = Validation.skewStrategy(uniform, col("k")).head()
    assert((u.getLong(0), u.getLong(1)) === ((8L, 4L)))
    assert(u.getDouble(2) === 0.25 && u.getDouble(3) === 0.0)
    assert(u.getString(4) === "broadcast_dim_else_salt")
    // one hot key (8 of 14) over 7 grains: exact gini from the closed
    // form Σ 2·i·cᵢ/(D·N) − (D+1)/D on sorted counts [1×6, 8]
    val hot = (Seq.fill(8)(0) ++ (1 to 6)).toDF("k")
    val h = Validation.skewStrategy(hot, col("k")).head()
    val countsAsc = Seq(1, 1, 1, 1, 1, 1, 8)
    val s = countsAsc.zipWithIndex.map { case (c, i) => (i + 1) * c }.sum
    val gini = 2.0 * s / (7.0 * 14.0) - 8.0 / 7.0
    assert(h.getDouble(3) === math.rint(gini * 1e6) / 1e6)
    assert(h.getString(4) === "broadcast_dim_else_salt")
    // a flat wide domain (each key once) lands on the plain join
    val wide = (1 to 100).toDF("k")
    val w = Validation.skewStrategy(wide, col("k")).head()
    assert(w.getDouble(2) === 0.01 && w.getString(4) === "plain_shuffle_join")
    // mid-band: top share .1 in (.05, .2) → AQE skew join
    val mid = (Seq.fill(10)(0) ++ (1 to 90)).toDF("k")
    assert(Validation.skewStrategy(mid, col("k")).head().getString(4)
      === "aqe_skew_join")
  }

  test("x164 benfordAudit: integer-side digits, zeros/negatives excluded") {
    import spark.implicits._
    // values 1.23, 12.3, 0.19 → leading digit 1 (×3); 9.5 → 9;
    // 0.0 and -5.0 are excluded
    val df = Seq(1.23, 12.3, 0.19, 9.5, 0.0, -5.0).toDF("v")
    val got = graft.clean.Profile.benfordAudit(df, col("v"), 2)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    def r6(d: Double) = math.rint(d * 1e6) / 1e6
    assert(got.keySet === Set(1, 9))
    assert(got(1) === ((3L, 0.75, r6(math.log10(2.0)))))
    assert(got(9)._1 === 1L && got(9)._3 === r6(math.log10(10.0 / 9.0)))
  }

  test("x167 jsonFieldHistogram: buckets, null bucket for malformed rows") {
    import spark.implicits._
    val df = Seq("""{"k": 7}""", """{"k": 12}""", """{"k": 19}""",
      """{"j": 5}""", "not json").toDF("p")
    val got = graft.clean.Profile.jsonFieldHistogram(df, col("p"), "$.k", 10L)
      .collect().map(r =>
        (if (r.isNullAt(0)) None else Some(r.getLong(0))) ->
          ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(Some(0L)) === ((1L, 0.2)))
    assert(got(Some(10L)) === ((2L, 0.4)))
    assert(got(None) === ((2L, 0.4))) // missing field + malformed row
  }

  test("x192 dpNoisyCounts: hand-computed Laplace inverse-CDF per key") {
    import spark.implicits._
    val df = (Seq.fill(30)("big") ++ Seq.fill(3)("small")).toDF("src")
    val eps = 0.8
    val out = Validation.dpNoisyCounts(df, col("src"), eps, threshold = 10.0)
      .collect().map(r => r.getString(0) -> r).toMap
    def expected(key: String): (Double, Double) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(("dplap" + key).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) /
        4294967296.0
      val c = u - 0.5
      val noise = -1.0 / eps * math.signum(c) * math.log(1.0 - 2.0 * math.abs(c))
      (math.rint(noise * 1e6) / 1e6, noise)
    }
    for ((key, n) <- Seq("big" -> 30L, "small" -> 3L)) {
      val (noiseR, noise) = expected(key)
      assert(out(key).getAs[Long]("n_true") === n)
      assert(out(key).getAs[Double]("noise") === noiseR)
      assert(out(key).getAs[Double]("noisy_count") ===
        math.rint((n + noise) * 1e6) / 1e6)
      assert(out(key).getAs[Boolean]("released") === (n + noise >= 10.0))
    }
    // the suppression floor must actually bite on the small group: |noise|
    // for Laplace(1/0.8) exceeds 7 with probability < 0.4%, and for THIS
    // fixed seed it does not
    assert(out("big").getAs[Boolean]("released"))
    assert(!out("small").getAs[Boolean]("released"))
  }

  test("x192 dpNoisyCounts: noise is a pure function of the key") {
    import spark.implicits._
    val a = Validation.dpNoisyCounts(Seq("k", "k").toDF("s"), col("s"),
      eps = 0.5, threshold = 0.0).head()
    val b = Validation.dpNoisyCounts(Seq("k").toDF("s"), col("s"),
      eps = 0.5, threshold = 0.0).head()
    assert(a.getAs[Double]("noise") === b.getAs[Double]("noise"))
    assert(a.getAs[Long]("n_true") === 2L && b.getAs[Long]("n_true") === 1L)
  }
}
