package graft

import org.apache.spark.sql.functions._

import graft.text.FeatureHash

/** Hashing-trick featurizer: reconstruction against an independent scala
  * recomputation of the md5-derived dim/sign hashes, and the collision
  * audit's conservation laws.
  */
class FeatureHashSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha alpha beta"),
    (2L, "beta gamma"),
    (3L, "alpha gamma gamma gamma")
  ).toDF("doc_id", "text")

  // [[graft.sampling.Sampling.hashKey]] recomputed independently: integer
  // value of the first 8 hex chars of md5(salt || key)
  private def hk(salt: String, key: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest((salt + key).getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }
  private def dim(tok: String, dims: Int): Long = hk("fh", tok) % dims
  private def sgn(tok: String): Long = 1L - 2L * (hk("fhsign", tok) % 2L)

  test("hashFeatures: per-doc weights equal signed term counts") {
    val toks = Map(1L -> Seq("alpha", "alpha", "beta"),
      2L -> Seq("beta", "gamma"),
      3L -> Seq("alpha", "gamma", "gamma", "gamma"))
    val want = toks.toSeq.flatMap { case (d, ts) =>
      ts.groupBy(identity).map { case (t, occ) =>
        (d, dim(t, 8)) -> sgn(t) * occ.size }
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      .filter(_._2 != 0L) // cancelled dims still emit a 0 row in Spark
    val got = FeatureHash.hashFeatures(docs, col("doc_id"), col("text"),
        dims = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // every expected nonzero cell present and equal; zero-weight cells
    // (full sign cancellation) may exist but must read 0
    want.foreach { case (k, w) => assert(got.get(k).contains(w), s"cell $k") }
    (got.keySet -- want.keySet).foreach { k => assert(got(k) === 0L) }
  }

  test("collisionAudit: conservation of mass, vocabulary, and net weight") {
    val audit = FeatureHash.collisionAudit(docs, col("text"), dims = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // 9 occurrences, 3 distinct tokens, split by dim hash mod 2
    assert(audit.values.map(_._1).sum === 9L)
    assert(audit.values.map(_._2).sum === 3L)
    audit.foreach { case (d, (mass, distinct, net, coll)) =>
      assert(coll === (distinct > 1L), s"dim $d collision flag")
      assert(math.abs(net) <= mass, s"dim $d net weight exceeds mass")
    }
    // independent recomputation at dims=2 over corpus term counts
    val counts = Map("alpha" -> 3L, "beta" -> 2L, "gamma" -> 4L)
    val want = counts.groupBy { case (t, _) => dim(t, 2) }
      .map { case (d, ts) =>
        d -> ((ts.values.sum, ts.size.toLong,
          ts.map { case (t, c) => sgn(t) * c }.sum)) }
    want.foreach { case (d, (mass, distinct, net)) =>
      val (gm, gd, gn, _) = audit(d)
      assert((gm, gd, gn) === ((mass, distinct, net)), s"dim $d")
    }
  }
}
