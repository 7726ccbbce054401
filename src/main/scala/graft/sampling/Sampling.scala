package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training pipelines.
  *
  * Everything here derives from a content hash of a stable row id, NOT from
  * `rand()`: the assignment of a row is a pure function of (id, salt), so
  * splits are reproducible across runs, clusters, partitionings, and
  * engines, rows keep their assignment when the dataset grows (no
  * re-shuffling of yesterday's train set into today's test set), and the
  * train/test boundary cannot leak via retries. This is the
  * hash-and-threshold scheme large corpus pipelines standardize on.
  *
  * All operators are pure narrow projections/filters — zero shuffle at any
  * scale. The hash is the first 8 hex chars of md5 (32 bits — bucket skew
  * at 10k buckets is negligible, and md5 exists in every engine, making the
  * assignment oracle-checkable).
  */
object Sampling {

  val Buckets = 10000

  /** Deterministic bucket in [0, [[Buckets]]) from a row id and salt.
    * Change the salt to draw an independent split/sample.
    */
  def hashBucket(id: Column, salt: String): Column = hashBucket(id, lit(salt))

  /** Column-salt overload (for the SQL surface, where the salt arrives as
    * an expression).
    */
  def hashBucket(id: Column, salt: Column): Column = hashKey(id, salt) % Buckets

  /** The raw 32-bit hash behind [[hashBucket]] (value of the first 8 hex
    * chars of md5(salt || id)) — the deterministic sort key for
    * [[shuffled]], where the full hash width matters (mod-[[Buckets]]
    * collisions would leave ordering to the tiebreak).
    */
  def hashKey(id: Column, salt: Column): Column =
    conv(substring(md5(concat_ws("", salt, id.cast("string"))), 1, 8), 16, 10)
      .cast("long")

  /** Cumulative [[Buckets]]-scaled thresholds for a weighted split (shared
    * with the SQL oracle so both engines draw identical boundaries).
    */
  def thresholds(weights: Seq[(String, Double)]): Seq[(String, Long)] = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "split weights must be positive")
    val total = weights.map(_._2).sum
    val cum = weights.map(_._2).scanLeft(0.0)(_ + _).tail
    weights.map(_._1).zip(cum.map(c => math.round(c / total * Buckets)))
  }

  /** Weighted deterministic split: labels each row with the name of its
    * part, e.g. `Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)`.
    * Weights are normalized; boundaries are exact integer bucket counts so
    * expected part sizes hold to 1/[[Buckets]].
    */
  def splitLabel(id: Column, weights: Seq[(String, Double)],
      salt: String = "split"): Column = {
    val b = hashBucket(id, salt)
    val ts = thresholds(weights)
    ts.init.foldRight(lit(ts.last._1): Column) { case ((name, t), rest) =>
      when(b < t, lit(name)).otherwise(rest)
    }
  }

  /** Split-integrity audit: pairs of related documents (near-dups,
    * decontamination hits — any `(doc_a, doc_b)` evidence frame) whose
    * members landed in DIFFERENT splits. A near-duplicate straddling
    * train/test silently inflates eval scores; this is the leakage check
    * a split pipeline runs after dedup evidence exists.
    *
    * Because [[splitLabel]] is a pure function of the id, the audit is a
    * zero-join, zero-shuffle projection + filter on the pair frame — no
    * label table materializes at any scale.
    */
  def splitLeakage(pairs: DataFrame, weights: Seq[(String, Double)],
      salt: String = "split"): DataFrame =
    pairs.select(col("doc_a"), col("doc_b"),
        splitLabel(col("doc_a"), weights, salt).as("split_a"),
        splitLabel(col("doc_b"), weights, salt).as("split_b"))
      .filter(col("split_a") =!= col("split_b"))

  /** Leakage-SAFE weighted split: every member of a duplicate cluster
    * draws its split from the CLUSTER id, so near-duplicates can never
    * straddle train/test (the failure [[splitLeakage]] detects —
    * detection audits an id-keyed split after the fact; this prevents the
    * leak by construction). `clusters` is any `(doc_id, cluster_id)`
    * evidence frame ([[graft.dedup.Dedup.duplicateClusters]]); documents
    * absent from it (singletons — the overwhelming majority) fall back to
    * their own id, keeping their [[splitLabel]] assignment identical to a
    * plain id-keyed split.
    *
    * Scale shape: one left equi-join against the pair-evidence-bounded
    * cluster frame (≪ corpus; AQE broadcasts it when it fits) followed by
    * a pure projection — no extra shuffle of the corpus beyond the join,
    * and no label table ever materializes.
    */
  def clusterSplit(df: DataFrame, id: Column, clusters: DataFrame,
      weights: Seq[(String, Double)], salt: String = "split"): DataFrame =
    graft.dedup.Dedup.withClusterKey(df, id, clusters)
      .withColumn("split", splitLabel(col("__cid"), weights, salt))
      .drop("__cid")

  /** Keep a deterministic `fraction` of rows (by id hash). */
  def sampleBy(df: DataFrame, id: Column, fraction: Double,
      salt: String = "sample"): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0, 1]")
    df.filter(hashBucket(id, salt) < math.round(fraction * Buckets))
  }

  /** Weighted corpus mixture: union several sources, each deterministically
    * downsampled to its fraction, tagged with a `source` column — the
    * standard way a pretraining mix is assembled (e.g. 100% curated, 30%
    * web, 5% boilerplate). Each source draws with its OWN salt, so the
    * same id appearing in two sources is an independent coin flip per
    * source; re-runs and dataset growth keep every membership stable
    * (see [[sampleBy]]). Schemas must align (`unionByName`).
    */
  def mixture(sources: Seq[(String, DataFrame, Double)], id: Column,
      salt: String = "mix"): DataFrame = {
    require(sources.nonEmpty, "no sources given")
    require(sources.map(_._1).distinct.size == sources.size,
      "source names must be unique")
    sources.map { case (name, df, frac) =>
      sampleBy(df, id, frac, s"$salt/$name").withColumn("source", lit(name))
    }.reduce(_.unionByName(_))
  }

  /** Deterministic corpus shuffle: assign every row a reproducible
    * pseudo-random position — `bucket` (which of `numBuckets` independent
    * output streams) and `pos` (0-based rank inside the bucket, ordered by
    * the row's 32-bit [[hashKey]], ties broken by id). Training pipelines
    * need the corpus order decorrelated from ingest order (sorted-by-source
    * batches bias SGD), and they need the SAME order on every re-run —
    * `rand()`-based shuffles give neither under retries.
    *
    * Scale shape: a single global sort order would funnel the corpus
    * through one sorted partition; bucketing first (same trick as
    * [[Packing.packSequences]]) makes it `numBuckets` independent
    * rank windows — one shuffle on `bucket`, linear sort per bucket.
    * Readers consume buckets in any interleaving; within-bucket order is
    * the contract.
    */
  def shuffled(df: DataFrame, id: Column, numBuckets: Int,
      salt: String = "shuffle"): DataFrame = {
    require(numBuckets > 0, "numBuckets must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(hashKey(id, lit(salt)).asc, id.asc)
    df.withColumn("bucket", hashBucket(id, salt) % numBuckets)
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
  }

  /** Per-stratum deterministic sampling: keep `fractions(stratum)` of each
    * stratum's rows; strata not listed are DROPPED (explicit beats
    * implicit for corpus mixing). The standard quality-weighted corpus
    * downsample — e.g. keep 100% of high-quality docs, 10% of mid, 1% of
    * boilerplate — as one narrow filter.
    */
  def stratifiedSample(df: DataFrame, stratum: Column, id: Column,
      fractions: Map[String, Double], salt: String = "sample"): DataFrame = {
    require(fractions.nonEmpty, "no strata given")
    require(fractions.values.forall(f => f >= 0 && f <= 1),
      "fractions must be in [0, 1]")
    val b = hashBucket(id, salt)
    val keep = fractions.toSeq.sortBy(_._1)
      .map { case (k, f) => stratum === k && b < math.round(f * Buckets) }
      .reduce(_ || _)
    df.filter(keep)
  }

  /** Deterministic fixed-SIZE per-group uniform sample: the `k` rows per
    * group with the smallest [[hashKey]] — a count-based complement to
    * [[stratifiedSample]]'s fraction-based keep (use this when every group
    * must contribute exactly k rows regardless of its size, e.g. "1 000
    * eval docs per language").
    *
    * The hash order makes it a uniform draw; the bounded-heap aggregate
    * ([[graft.analytics.Ranking.topKPerGroup]]) makes it scale-safe — k
    * ids per (group × map task) cross the shuffle, never a group's full
    * membership (the reservoir discipline, deterministically). Emits
    * `(group, id, rnk)`; ties (hash collisions) break by id.
    */
  def reservoirSample(df: DataFrame, group: Column, id: Column, k: Int,
      salt: String = "reservoir"): DataFrame =
    graft.analytics.Ranking.topKPerGroup(df, group,
        -hashKey(id, lit(salt)).cast("double"), id, k)
      .select(col("group"), col("id"), col("rnk"))

  /** Deterministic weighted sampling WITHOUT replacement
    * (Efraimidis–Spirakis): each row draws `u = (hash+1)/2³²` ∈ (0, 1]
    * and competes with key `ln(u)/w` — the `k` largest keys are exactly a
    * weight-proportional without-replacement draw. The quality-weighted
    * "sample 100k docs favoring high scores" selection, reproducible
    * across runs and engines because `u` is the salted content hash, not
    * a RNG.
    *
    * Scale shape: a pure key projection into the bounded-heap aggregate —
    * k candidates per map task cross the single merge shuffle, never a
    * sort of the corpus. Non-positive weights map to −∞ (never selected;
    * also keeps NaN out of the heap order). Emits
    * `(doc_id, es_key, rnk)`, key rounded to 6 dp.
    */
  def weightedSample(df: DataFrame, id: Column, weight: Column, k: Int,
      salt: String = "wsample"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = (hashKey(id, lit(salt)) + 1).cast("double") / lit(4294967296.0)
    // !(w > 0) also catches NaN weights (NaN <= 0.0 is false), which would
    // otherwise produce a NaN key that Double.compare ranks above every
    // real key in the heap.
    val key = when(!(weight > 0.0) || weight.isNaN,
        lit(Double.NegativeInfinity))
      .otherwise(log(u) / weight)
    graft.analytics.Ranking.topKPerGroup(
        df.select(id.as("__id"), key.as("__key")), lit(1), col("__key"),
        col("__id"), k)
      .select(col("id").as("doc_id"), round(col("score"), 6).as("es_key"),
        col("rnk"))
  }

  /** Cap every group at `cap` rows, chosen pseudo-randomly but
    * DETERMINISTICALLY by the salted content hash — the per-source /
    * per-community sampling cap from the curation playbook (bound how much
    * any one crawl or link-farm community can contribute to the mixture;
    * change the salt for an independent draw). The selection rule is
    * "smallest `cap` values of (hashKey, id) per group", so re-runs,
    * partitionings and engines agree row-for-row.
    *
    * Scale shape: rides the bounded-heap top-k aggregate
    * ([[graft.analytics.Ranking.topKPerGroup]]) with score = −hashKey —
    * its (score desc, id asc) heap order IS (hash asc, id asc). Only
    * `cap` ids per (group × map task) cross the shuffle; no per-group
    * window, no sort, so a group with a billion rows never serializes on
    * one reducer.
    */
  def capPerGroup(df: DataFrame, group: Column, id: Column, cap: Int,
      salt: String): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    graft.analytics.Ranking.topKPerGroup(
        df.select(group.as("__g"), id.as("__cid")),
        col("__g"), -hashKey(col("__cid"), lit(salt)), col("__cid"), cap)
      .select(col("group"), col("id"))
  }

  /** Integer dials for a fractional epoch factor: `(⌊f⌋ whole epochs,
    * round(frac·[[Buckets]]) gate width)`. Computed ONCE at the driver so
    * a SQL oracle renders the same integers — no float-arithmetic mirror.
    */
  def epochDials(f: Double): (Int, Long) = {
    require(f >= 0 && f <= 100, s"epoch factor out of range: $f")
    val w = math.floor(f).toInt
    (w, math.round((f - w) * Buckets))
  }

  /** Materialize a per-source EPOCH MIX (the data-constrained-scaling
    * recipe: repeat high-quality sources a fractional number of times,
    * e.g. 3.5×): each doc emits one row per whole epoch `0..⌊f⌋−1`, plus
    * epoch `⌊f⌋` for the deterministic hash-gated fraction of docs — so a
    * 3.5× source repeats every doc 3 times and a fixed 50% subset a 4th,
    * and a 0.25× source keeps a fixed quarter at epoch 0. The output is
    * the REPLICATION PLAN `(doc_id, source, epoch)`; the trainer joins it
    * back (or zips it into shards via [[Sharding.assignShards]]).
    *
    * Map-only: one projection, one bounded `sequence` explode (≤ ⌈f⌉ per
    * row), one hash gate — no shuffle at all, which is what lets the mix
    * materialize inline in the export job at any corpus size. Factors
    * arrive as [[epochDials]] integers; unlisted sources use `default`.
    */
  def epochMix(df: DataFrame, id: Column, source: Column,
      factors: Map[String, (Int, Long)], default: (Int, Long) = (1, 0L),
      salt: String = "epoch"): DataFrame = {
    factors.values.foreach { case (w, fb) =>
      require(w >= 0 && fb >= 0 && fb <= Buckets, s"bad dials: ($w, $fb)") }
    def dial(pick: ((Int, Long)) => Long): Column =
      factors.foldLeft(lit(pick(default))) { case (acc, (k, d)) =>
        when(source === k, lit(pick(d))).otherwise(acc) }
    val base = df.select(id.cast("long").as("doc_id"), source.as("source"),
      dial(_._1.toLong).as("__w"), dial(_._2).as("__fb"))
    val whole = base.filter(col("__w") >= 1)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(0L), col("__w") - 1)).as("__e"))
      .select(col("doc_id"), col("source"), col("__e").cast("int").as("epoch"))
    val frac = base
      .filter(hashBucket(col("doc_id"), salt) < col("__fb"))
      .select(col("doc_id"), col("source"), col("__w").cast("int").as("epoch"))
    whole.union(frac)
  }
}
