package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join helpers for skewed keys — the join-side complement of
  * [[Aggregates.saltedSum]].
  */
object Joins {

  /** Skew-salted equi-join: a heavy-hitter key's probe rows land on ONE
    * reducer in a plain shuffle join; salting splits them across
    * `saltBuckets` reducers by joining on (key, salt), with the build side
    * replicated to every salt. Result is row-identical to the plain inner
    * join — only the shuffle distribution changes. The manual complement
    * to AQE's skew-join handling, for when the build side is too big to
    * broadcast but small enough to replicate `saltBuckets`×, or when AQE's
    * post-shuffle splitting can't see the skew (e.g. it appears after an
    * upstream transform).
    *
    * `saltSource` must be deterministic per probe row (a unique id column)
    * so retries and re-runs place rows identically. Build-side replication
    * multiplies its shuffle volume by `saltBuckets` — keep buckets at the
    * skew factor you need, not higher.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      saltSource: Column, saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val p = probe.withColumn("__salt", pmod(hash(saltSource), lit(saltBuckets)))
    val b = build.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    p.join(b, Seq(key, "__salt")).drop("__salt")
  }
}
