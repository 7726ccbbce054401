package graft

import org.apache.spark.sql.SparkSession

/** End-to-end SQL surface: a session built with
  * `spark.sql.extensions=graft.plans.GraftExtensions` runs a full
  * clean→feature→aggregate pipeline purely through `spark.sql`, proving the
  * registered functions (including the native codegen `turbine_power_kw`)
  * resolve and compose under the analyzer with no DataFrame-API assistance.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("extensions-built session runs a clean→feature→aggregate pipeline in pure SQL") {
    // force a brand-new SparkSession instantiation (same SparkContext) so
    // the extensions config path — not live registration — is what's tested
    val prev = spark // materialize the shared session first
    org.apache.spark.sql.graftbridge.ColumnBridge.clearSessions()
    // .withExtensions is the same injectFunction path as the
    // spark.sql.extensions conf; the conf string only applies when the
    // SparkContext itself is built, which a shared test JVM can't redo
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      assert(s2 ne prev, "extensions require a fresh session instance")
      val out = s2.sql(
        """WITH raw(station, v_mps, temp_c, pressure) AS (VALUES
          |  ('S1', 8.0D, 20.0D, 1013.0D), ('S1', 60.0D, 21.0D, 1013.0D),
          |  ('S2', 12.5D, 15.0D, 1010.0D), ('S2', -1.0D, 15.0D, 1010.0D),
          |  ('S3', 4.0D, 25.0D, 1015.0D)),
          |cleaned AS (SELECT * FROM raw WHERE v_mps >= 0.0 AND v_mps <= 50.0),
          |feat AS (SELECT station,
          |  wind_class(v_mps) AS wclass,
          |  round(air_density(pressure, temp_c), 6) AS rho,
          |  round(turbine_power_kw(air_density(pressure, temp_c),
          |    hub_wind_speed(v_mps)), 4) AS p_kw
          | FROM cleaned)
          |SELECT station, any_value(wclass) AS wclass, round(sum(p_kw), 4) AS total_kw
          |FROM feat GROUP BY station ORDER BY station
          |""".stripMargin).collect()
      assert(out.length === 3)
      assert(out.map(_.getString(0)).toSeq === Seq("S1", "S2", "S3"))
      // S1 keeps only v=8 (the 60 m/s row is range-cleaned), class Light..Moderate band
      assert(out(0).getString(1) === "Moderate")
      // power is positive below rated, capped at rated 2500 kW
      assert(out.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 2500.0))
      // S2 at 12.5 m/s hub-scales past rated speed → exactly rated power
      assert(out(1).getDouble(2) === 2500.0)
      // S3 at 4 m/s: cubic region, strictly between 0 and rated
      assert(out(2).getDouble(2) > 0.0 && out(2).getDouble(2) < 2500.0)
      // round-4 additions: text/vector/sampling functions on the same surface
      val extra = s2.sql(
        """SELECT
          |  repetition_score('same same same same') AS rep,
          |  hash_bucket(42L, 'split') AS bk,
          |  round(cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)), 6) AS cs,
          |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp
          |""".stripMargin).head()
      assert(math.abs(extra.getDouble(0) - (1.0 - 1.0 / 3.0)) < 1e-6)
      assert(extra.getLong(1) >= 0 && extra.getLong(1) < 10000)
      assert(extra.getDouble(2) === 1.0)
      assert(extra.getDouble(3) === 11.0)
      // round-5: width-parameterized shingles (n is a required int literal)
      val sh = s2.sql(
        "SELECT shingle_set('a b c d', 3) AS g3, shingle_set('a b c d', 2) AS g2")
        .head()
      assert(sh.getSeq[String](0) === Seq("a b c", "b c d"))
      assert(sh.getSeq[String](1) === Seq("a b", "b c", "c d"))
      val err = intercept[Exception] {
        s2.sql("SELECT shingle_set('a b', token_count('x'))").collect()
      }
      assert(err.getMessage.contains("integer literal"))
      // round-6: winnowing fingerprints + the remaining scalar text metrics
      val w6 = s2.sql(
        """SELECT
          |  winnow('a b c d e f g h i j', 4, 4) AS fp,
          |  size(array_intersect(
          |    winnow('one two three four five six seven eight', 4, 4),
          |    winnow('zzz one two three four five six seven eight yyy', 4, 4)))
          |    AS shared,
          |  subword_count('hello world') AS sw,
          |  round(punct_ratio('a, b. c!'), 6) AS pr,
          |  round(stopword_ratio('the cat and the hat'), 6) AS sr,
          |  round(avg_token_len('ab abcd'), 6) AS atl,
          |  normalize_text('  A   B  ') AS norm
          |""".stripMargin).head()
      assert(w6.getSeq[Long](0).nonEmpty, "winnow emitted no fingerprints")
      assert(w6.getSeq[Long](0) === w6.getSeq[Long](0).sorted.distinct)
      // winnowing guarantee: a shared >= w+k-1-token span shares a fingerprint
      assert(w6.getInt(1) >= 1, "shared span produced no shared fingerprint")
      assert(w6.getLong(2) > 0)
      assert(w6.getDouble(3) > 0.0 && w6.getDouble(3) < 1.0)
      assert(w6.getDouble(4) > 0.0 && w6.getDouble(4) <= 1.0)
      assert(w6.getDouble(5) === 3.0)
      assert(w6.getString(6) === "a b")
      val werr = intercept[Exception] {
        s2.sql("SELECT winnow('a b', 4, token_count('x'))").collect()
      }
      assert(werr.getMessage.contains("integer literal"))
      // round-6 second batch: the custom AGGREGATES on the SQL surface —
      // the analyzer must wrap the AggregateFunction on resolution
      val ag = s2.sql(
        """WITH ev(item, score, id) AS (VALUES
          |  ('a', 3.0D, 1L), ('a', 1.0D, 2L), ('b', 2.0D, 3L), ('a', 5.0D, 4L))
          |SELECT misra_gries(item, 4) AS hh,
          |  top_k_by_score(score, id, 2) AS tk
          |FROM ev""".stripMargin).head()
      val hh = ag.getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getString(0) -> r.getLong(1))
      assert(hh === Seq("a" -> 3L, "b" -> 1L))
      val tk = ag.getSeq[org.apache.spark.sql.Row](1)
        .map(r => (r.getDouble(0), r.getLong(1)))
      assert(tk === Seq((5.0, 4L), (3.0, 1L)))
      val aerr = intercept[Exception] {
        s2.sql("SELECT misra_gries('x', token_count('y'))").collect()
      }
      assert(aerr.getMessage.contains("integer literal"))
      // round-12: the manifest row hash — SUM(manifest_hash32) GROUP BY
      // shard is the x173 checksum in pure SQL; value pinned against the
      // same driver-side MD5 truth SamplingSpec uses
      val mh = s2.sql(
        """WITH d(id, sh, t) AS (VALUES (1L, 0, 'alpha'), (2L, 0, 'beta'))
          |SELECT sh, sum(manifest_hash32(id, t)) AS checksum
          |FROM d GROUP BY sh""".stripMargin).head()
      def h32(id: Long, t: String): Long = java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"$id:$t".getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString, 16)
      assert(mh.getLong(1) === h32(1L, "alpha") + h32(2L, "beta"))
      // round-12: the Poisson-bootstrap weight — SUM(bootstrap_weight
      // (id, b) * x) GROUP BY b is the x183 bootstrap in pure SQL;
      // pinned against the same driver-side md5 truth EvaluationSpec uses
      def pw(id: Long, b: Int): Long = {
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"boot${b / 4}:$id".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val u = java.lang.Long.parseLong(
          hex.substring((b % 4) * 8, (b % 4) * 8 + 8), 16)
          .toDouble / 4294967296.0
        graft.analytics.Evaluation.PoissonCdf.zipWithIndex
          .collectFirst { case (c, j) if u < c => j.toLong }.getOrElse(6L)
      }
      val bw = s2.sql(
        """WITH d(id) AS (VALUES (1L), (2L), (3L))
          |SELECT id, bootstrap_weight(id, 0L) AS w0,
          | bootstrap_weight(id, 5L) AS w5 FROM d""".stripMargin).collect()
      assert(bw.length === 3)
      bw.foreach { r =>
        assert(r.getLong(1) === pw(r.getLong(0), 0), s"id ${r.getLong(0)} b0")
        assert(r.getLong(2) === pw(r.getLong(0), 5), s"id ${r.getLong(0)} b5")
      }
      // round-12: SUM(varint_size(gap)) is the x193 byte estimate in
      // pure SQL; pinned at the LEB128 group boundaries
      val vs = s2.sql(
        """SELECT varint_size(0L), varint_size(127L), varint_size(128L),
          | varint_size(16383L), varint_size(16384L)""".stripMargin).head()
      assert((0 until 5).map(vs.getLong) === Seq(1L, 1L, 2L, 2L, 3L))
      // round-13: outside the non-negative domain the engines would
      // disagree (Spark two's complement vs DuckDB '-'-prefixed bin),
      // so the public surface returns null instead of a wrong byte count
      val vneg = s2.sql(
        "SELECT varint_size(-1L) AS a, varint_size(-128L) AS b").head()
      assert(vneg.isNullAt(0) && vneg.isNullAt(1))
      // round-12: laplace_noise(key, eps) is the x192 mechanism in pure
      // SQL; pinned against the same driver-side md5 inverse-CDF truth
      // ValidationSpec uses
      def ln(key: String, eps: Double): Double = {
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(("dplap" + key).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8)
        val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) /
          4294967296.0
        val c = u - 0.5
        -1.0 / eps * math.signum(c) * math.log(1.0 - 2.0 * math.abs(c))
      }
      val lap = s2.sql(
        """WITH d(k) AS (VALUES ('srcA'), ('srcB'))
          |SELECT k, laplace_noise(k, 0.8) AS n FROM d""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(lap("srcA") === ln("srcA", 0.8))
      assert(lap("srcB") === ln("srcB", 0.8))
      // round-13: eps <= 0 has no Laplace scale — null, never
      // sign-flipped (eps < 0) or infinite (eps = 0) noise
      val lbad = s2.sql(
        """SELECT laplace_noise('srcA', 0.0) AS z,
          | laplace_noise('srcA', -0.8) AS m""".stripMargin).head()
      assert(lbad.isNullAt(0) && lbad.isNullAt(1))
      // round-13: wilson_lo(k, n, z) is x202's gating statistic in pure
      // SQL — pinned against the textbook closed form computed here
      def wlo(k: Double, n: Double, z: Double): Double = {
        val ph = k / n; val z2 = z * z; val den = 1.0 + z2 / n
        (ph + z2 / (2 * n)) / den -
          z * math.sqrt(ph * (1 - ph) / n + z2 / (4 * n * n)) / den
      }
      val wl = s2.sql(
        """SELECT wilson_lo(10L, 20L, 1.96) AS a,
          | wilson_lo(490L, 1000L, 1.96) AS b,
          | wilson_lo(3L, 3L, 1.96) AS c""".stripMargin).head()
      assert(wl.getDouble(0) === wlo(10, 20, 1.96))
      assert(wl.getDouble(1) === wlo(490, 1000, 1.96))
      assert(wl.getDouble(2) === wlo(3, 3, 1.96))
      // 3-for-3 must rank BELOW 490-of-1000 — the gate's whole point
      assert(wl.getDouble(2) < wl.getDouble(1))
      // round-13: freshness_weight(age, hl) halves every half-life;
      // SUM(w)^2 / SUM(w*w) over it is the x203 Kish ESS in pure SQL
      val fw = s2.sql(
        """WITH d(age) AS (VALUES (0.0), (90.0), (180.0)),
          |w AS (SELECT age, freshness_weight(age, 90.0) AS w FROM d)
          |SELECT round(sum(w)*sum(w)/sum(w*w), 6) AS ess,
          | min(w) AS wmin, max(w) AS wmax,
          | min(freshness_weight(age, 0.0)) AS bad
          |FROM w""".stripMargin).head()
      val ws = Seq(1.0, 0.5, 0.25)
      val ess = math.rint(math.pow(ws.sum, 2) / ws.map(x => x * x).sum
        * 1e6) / 1e6
      assert(fw.getDouble(0) === ess)
      assert(fw.getDouble(1) === 0.25 && fw.getDouble(2) === 1.0)
      assert(fw.isNullAt(3))
    } finally {
      org.apache.spark.sql.graftbridge.ColumnBridge.restoreSessions(prev)
    }
  }
}
