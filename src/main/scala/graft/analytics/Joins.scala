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

  /** The deletion neighborhood of a string key: the key itself plus every
    * single-character deletion — the FastSS/SymSpell blocking set. Two
    * strings within edit distance 1 ALWAYS share an element (equal: the
    * string itself; substitution at i: both i-deletions; insert/delete:
    * the longer's deletion IS the shorter), so a join on the exploded
    * neighborhood has exact recall at distance 1 and the verify filter
    * only removes false positives.
    */
  private[analytics] def deletionNeighborhood(key: Column): Column =
    when(length(key) === 0, array(key)).otherwise(
      array_union(
        array(key),
        transform(sequence(lit(1), length(key)), i =>
          concat(key.substr(lit(1), i - 1),
            key.substr(i + 1, length(key) - i)))))

  /** Fuzzy equi-join at edit distance ≤ 1 — the entity-resolution join
    * (typo'd ids, OCR'd names, crawl-url variants) that a plain equi-join
    * silently drops. Never a cross join: each side explodes to its
    * deletion neighborhood (|key|+1 blocking rows per record), candidates
    * meet on a shuffle of that blocking key, a `count(*)` window sharing
    * the join's partitioning caps degenerate blocks (the ubiquitous-token
    * guard every blocking generator here carries), and exact
    * `levenshtein` verifies survivors. Recall is exact at distance 1 by
    * the neighborhood property; distance-d matching needs d-deletion
    * neighborhoods (size O(|key|^d)) — deliberately not offered, because
    * at corpus scale that blow-up is a design decision, not a default.
    *
    * Emits left row id, right row id, both keys, and the verified
    * distance. At 100 TB: one narrow neighborhood projection per side,
    * one bounded-bucket shuffle, no quadratic work outside capped blocks.
    */
  def fuzzyJoin(left: DataFrame, leftId: Column, leftKey: Column,
      right: DataFrame, rightId: Column, rightKey: Column,
      maxBucket: Int = 1000): DataFrame = {
    val l = left.select(leftId.as("left_id"), leftKey.as("left_key"))
      .withColumn("__v", explode(deletionNeighborhood(col("left_key"))))
    val r = right.select(rightId.as("right_id"), rightKey.as("right_key"))
      .withColumn("__v", explode(deletionNeighborhood(col("right_key"))))
    def capped(df: DataFrame): DataFrame =
      graft.dedup.Dedup.capBuckets(df, Seq(col("__v")), maxBucket)
    capped(l).join(capped(r), Seq("__v"))
      .select(col("left_id"), col("right_id"), col("left_key"), col("right_key"))
      .distinct()
      .withColumn("distance", levenshtein(col("left_key"), col("right_key")))
      .filter(col("distance") <= 1)
  }

  /** [[fuzzyJoin]] with a Jaro–Winkler similarity on every verified pair —
    * the GRADED companion to the binary edit-distance gate: two distance-1
    * pairs are not equally good matches (a swapped prefix character is a
    * likelier typo than a changed one), and survivorship/linkage rules
    * want that ordering. Runs the [[graft.plans.Native.jaroWinkler]]
    * codegen kernel (Spark ships no Jaro family) over the ALREADY-BOUNDED
    * verified-pair frame, so the scoring adds one fused projection, no
    * new shuffle.
    */
  def fuzzyJoinScored(left: DataFrame, leftId: Column, leftKey: Column,
      right: DataFrame, rightId: Column, rightKey: Column,
      maxBucket: Int = 1000): DataFrame =
    fuzzyJoin(left, leftId, leftKey, right, rightId, rightKey, maxBucket)
      .withColumn("jw", round(
        graft.plans.Native.jaroWinkler(col("left_key"), col("right_key")), 6))

  /** Join-size estimate by UNIVERSE (key-synchronized) sampling — the
    * number a planner needs BEFORE committing a 100 TB shuffle join:
    * |A ⋈ B| = Σ_k cA(k)·cB(k), estimated by keeping only keys whose
    * hash bucket falls under `sampleBuckets` on BOTH sides (the SAME
    * hash, so a sampled key brings its full frequency on each side —
    * independent row sampling would bias cA·cB down by the sample rate
    * squared and miss key skew entirely), summing the per-key products
    * over the sampled keys, and scaling by buckets/sampleBuckets.
    * Unbiased over the hash choice; variance is dominated by whether a
    * heavy key lands in the sample, which the audit columns expose
    * (`est_rows` beside `exact_rows` — production computes only the
    * estimate; the exact side is this face's truth harness, the x190
    * CMS-audit discipline).
    *
    * Scale shape: the estimate touches `sampleBuckets/buckets` of each
    * input (filter pushed to the scan), aggregates to per-key counts,
    * and joins |sampled keys| rows — no full-size anything. The exact
    * audit pays two per-key aggregates and a keyed join of key-count
    * frames, NOT the join itself (Σ c·c is computed, never enumerated).
    */
  def joinSizeEstimate(left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column, sampleBuckets: Int,
      salt: String = "joinsize"): DataFrame = {
    val b = graft.sampling.Sampling.Buckets
    require(sampleBuckets >= 1 && sampleBuckets <= b,
      s"sampleBuckets must be in [1, $b], got $sampleBuckets")
    def keyCounts(df: DataFrame, k: Column, sampled: Boolean): DataFrame = {
      val base = df.select(k.as("__k"))
      val kept =
        if (sampled)
          base.filter(graft.sampling.Sampling.hashBucket(col("__k"),
            lit(salt)) < sampleBuckets)
        else base
      kept.groupBy(col("__k")).agg(count(lit(1)).as("__c"))
    }
    def pairSum(a: DataFrame, c: DataFrame): DataFrame =
      a.withColumnRenamed("__c", "__ca")
        .join(c.withColumnRenamed("__c", "__cb"), Seq("__k"))
        .agg(coalesce(sum(col("__ca") * col("__cb")), lit(0L))
          .as("rows"),
          count(lit(1)).as("keys"))
    val est = pairSum(keyCounts(left, leftKey, sampled = true),
      keyCounts(right, rightKey, sampled = true))
      .select(col("keys").as("sampled_keys"),
        round(col("rows").cast("double") *
          (b.toDouble / sampleBuckets.toDouble), 6).as("est_rows"))
    val exact = pairSum(keyCounts(left, leftKey, sampled = false),
      keyCounts(right, rightKey, sampled = false))
      .select(col("keys").as("join_keys"), col("rows").as("exact_rows"))
    est.crossJoin(broadcast(exact))
      .select(col("sampled_keys"), col("est_rows"), col("join_keys"),
        col("exact_rows"),
        // a disjoint-key join has exact 0 — NULL ratio, not an ANSI
        // divide-by-zero crash
        round(when(col("exact_rows") =!= 0L,
          col("est_rows") / col("exact_rows").cast("double")), 6)
          .as("est_ratio"))
  }
}
