package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution operators: histograms, category counts, distinct counts
  * (SURVEY.md §2.4, A6, A7, A9).
  */
object Distribution {

  /** A9: fixed-width histogram — bucket index = floor(v / width)
    * (ref Plotly histogram, `Wind_Dashboard.py:330-357`). One hash
    * aggregate; bucket count is bounded by the value range, not the row
    * count, so the result stays small at any scale.
    */
  def histogram(df: DataFrame, value: Column, width: Double,
      extraKeys: Seq[Column] = Nil): DataFrame = {
    val bucket = floor(value / width).cast("long").as("bucket")
    df.groupBy((bucket +: extraKeys): _*)
      .agg(count(lit(1)).as("cnt"))
      .withColumn("bucket_lo", col("bucket") * width)
  }

  /** Equi-DEPTH histogram: `bins` buckets of (near-)equal row count in
    * ascending value order — the quantile-binned view a fixed-width
    * [[histogram]] cannot give on a skewed distribution (one hot bucket,
    * everything else empty). Bucket populations differ by at most one row.
    *
    * The naive form is `ntile(bins)` over an unpartitioned window — a
    * single-reducer global sort. Here the bin is a pure function of the
    * EXACT distributed rank from
    * [[graft.sampling.BudgetSelect.percentileRanks]] (the x40 two-level
    * bucket/hash-cell decomposition — no reducer ever holds more than one
    * cell): `bin = floor((rnk−1)·bins/n)`, ranked ascending by value with
    * the salted-hash tie split, so boundary ties land deterministically.
    *
    * Emits `(bin, cnt, lo, hi)`, 0-based ascending bins — bin edges and
    * populations in one result, exact at any scale.
    */
  def equiDepthHistogram(df: DataFrame, id: Column, value: Column,
      bins: Int, numBuckets: Int = 1024, subBuckets: Int = 32,
      salt: String = "eqdepth"): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val base = df.select(id.as("__id"), value.cast("double").as("__v"))
    // score = −value: rank 1 = smallest value, so bins ascend in value
    val ranked = graft.sampling.BudgetSelect.percentileRanks(
      base, col("__id"), -col("__v"), numBuckets, subBuckets, salt)
    val n = base.count()
    // (rnk−1)·bins stays integer-exact in a double below 2^53; an exact
    // multiple of n divides to an exact integer, so floor is boundary-safe
    val bin = least(floor((col("rnk") - 1) * lit(bins.toLong) / lit(n.toDouble)),
      lit((bins - 1).toLong)).cast("long")
    ranked.select(bin.as("bin"), (-col("score")).as("__v"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("cnt"), min(col("__v")).as("lo"),
        max(col("__v")).as("hi"))
  }

  /** A6: counts per category (ref `value_counts()`, `Wind_Dashboard.py:361`). */
  def countPerCategory(df: DataFrame, key: Column): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("cnt"))

  /** A7: exact distinct count per group (ref `nunique()`,
    * `Solar_Dashboard.py:194-197`). Exact countDistinct expands to a
    * two-phase aggregate; at the 100 TB tier prefer
    * [[approxDistinctPerGroup]] (HLL++, single pass, no expansion).
    */
  /** Corpus concentration report over a categorical key (typically the
    * document `source`): Herfindahl-Hirschman index, Gini coefficient,
    * share entropy in bits, and the single largest share — the datacard
    * numbers behind "is this corpus one crawl wearing twenty hats". A
    * mixture that looks diverse by source COUNT can still concentrate its
    * mass; these indices say so in one row.
    *
    * Shape: one hash aggregate to |categories| rows, a rank window over
    * that tiny frame (post-aggregate window contract), one final
    * aggregate. The Gini uses the rank identity
    * G = 2·Σ(i·cᵢ)/(n·Σc) − (n+1)/n over ascending counts. The squared
    * and rank-weighted sums run in DOUBLE: a long `cnt²` silently wraps
    * past ~3·10⁹ rows per category in non-ANSI Spark (the softDedupWeights
    * overflow class) while the double loses only last-ulp precision,
    * which the 6-dp rounding of these O(1) indices absorbs.
    */
  def concentrationReport(df: DataFrame, key: Column): DataFrame = {
    val counts = df.groupBy(key.as("__k")).agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").asc, col("__k").asc)
    val cd = col("cnt").cast("double")
    counts.withColumn("__i", row_number().over(w).cast("long"))
      .agg(count(lit(1)).as("n_categories"),
        sum(col("cnt")).as("__tot"),
        sum(cd * cd).as("__s2"),
        sum(col("__i").cast("double") * cd).as("__w"),
        max(col("cnt")).as("__top"),
        sum(cd * log(cd)).as("__clnc"))
      .select(col("n_categories"),
        round(col("__s2") /
          (col("__tot").cast("double") * col("__tot").cast("double")), 6)
          .as("hhi"),
        round(lit(2.0) * col("__w") /
          (col("n_categories").cast("double") * col("__tot").cast("double")) -
          (col("n_categories") + 1).cast("double") /
            col("n_categories").cast("double"), 6).as("gini"),
        round((log(col("__tot").cast("double")) -
          col("__clnc") / col("__tot").cast("double")) / lit(math.log(2.0)), 6)
          .as("entropy_bits"),
        round(col("__top").cast("double") / col("__tot").cast("double"), 6)
          .as("top_share"))
  }

  def distinctPerGroup(df: DataFrame, key: Column, value: Column): DataFrame =
    df.groupBy(key).agg(countDistinct(value).as("n_distinct"))

  /** A7 at scale: HyperLogLog++ distinct-count sketch. */
  def approxDistinctPerGroup(df: DataFrame, key: Column, value: Column,
      rsd: Double = 0.01): DataFrame =
    df.groupBy(key).agg(approx_count_distinct(value, rsd).as("n_distinct_approx"))

  /** A7 tolerance harness: checks the HLL estimate against the exact
    * distinct count in one aggregate and emits a boolean per group. A
    * sketch VALUE has no exact cross-engine twin, but the PROPERTY
    * "estimate within `tol` of exact" does — the oracle asserts TRUE per
    * group, so an HLL drift beyond tolerance fails the hash match instead
    * of going unchecked. The exact countDistinct makes this form
    * correctness-gate-only; the production path at 100 TB is
    * [[approxDistinctPerGroup]] alone.
    */
  def approxDistinctWithinTolerance(df: DataFrame, key: Column, value: Column,
      rsd: Double = 0.01, tol: Double = 0.05,
      outName: String = "within_5pct"): DataFrame = {
    // two-stage instead of countDistinct+HLL in ONE aggregate: the
    // single-agg form plans through an Expand that doubles the input
    // rows into the shuffle, while the (key, value) pre-aggregate
    // map-side combines to at most |keys × distinct values| rows — and
    // the HLL registers are max-based, so the sketch of the deduped
    // frame is bit-identical to the sketch of the raw multiset. Nulls:
    // a key whose values are all null keeps its (key, null) group row,
    // and both the guarded count and the HLL ignore it — exact 0,
    // approx 0, within tolerance, same as the single-agg form.
    val keyName = df.select(key).columns.head
    df.groupBy(key.as("__k"), value.as("__v")).agg(lit(1))
      .groupBy(col("__k"))
      .agg(approx_count_distinct(col("__v"), rsd).as("__approx"),
        count(when(col("__v").isNotNull, lit(1))).as("__exact"))
      .select(col("__k").as(keyName),
        (abs(col("__approx") - col("__exact")) <= col("__exact") * tol)
          .as(outName))
  }

  /** Incremental distinct counting via MERGEABLE Datasketches HLL state:
    * each input frame sketches independently per key (the daily-partition
    * face — sketch partials are associative, so yesterday's data is never
    * rescanned), the per-key sketches merge with `hll_union`, and the
    * merged estimate is tolerance-checked against the exact distinct of
    * the union. This is the INCREMENTAL face [[approxDistinctWithinTolerance]]
    * lacks: its one-shot HLL must see every row, while here the stored
    * state per (partition, key) is a few-KB sketch column and cross-window
    * questions ("distinct users this month") are sketch merges, no rescan.
    * At 100 TB the exact side of this report disappears (it exists for
    * the correctness gate, the a07 pattern) and the sketch column IS the
    * operator output.
    */
  def hllMergeReport(a: DataFrame, b: DataFrame, key: Column, value: Column,
      lgK: Int = 12, tol: Double = 0.05,
      outName: String = "within_5pct"): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"lgK must be in [4,21], got $lgK")
    val keyName = a.select(key).columns.head
    def sketch(df: DataFrame, keyOut: String, out: String): DataFrame =
      df.groupBy(key.as(keyOut))
        .agg(hll_sketch_agg(value, lit(lgK)).as(out))
    // joins are NULL-SAFE (<=>): a null key is a legitimate group on both
    // sides — plain equality would silently drop it from the report while
    // the oracle (GROUP BY) emits it, the same hazard cmsFrequencyReport
    // guards against
    val merged = sketch(a, "__ka", "__sa")
      .join(sketch(b, "__kb", "__sb"), col("__ka") <=> col("__kb"), "full_outer")
      .select(coalesce(col("__ka"), col("__kb")).as("__k"),
        hll_sketch_estimate(
          when(col("__sa").isNull, col("__sb"))
            .when(col("__sb").isNull, col("__sa"))
            .otherwise(hll_union(col("__sa"), col("__sb")))).as("__est"))
    // exact side over the UNION, deduped before counting (the a07
    // two-stage rationale: map-side combine, no Expand doubling)
    val exact = a.select(key.as("__ke"), value.as("__v"))
      .unionByName(b.select(key.as("__ke"), value.as("__v")))
      .groupBy(col("__ke"), col("__v")).agg(lit(1))
      .groupBy(col("__ke"))
      .agg(count(when(col("__v").isNotNull, lit(1))).as("__exact"))
    merged.join(exact, col("__k") <=> col("__ke"))
      .select(col("__k").as(keyName),
        coalesce(abs(col("__est") - col("__exact")) <= col("__exact") * tol,
          col("__exact") === 0).as(outName))
  }

  /** Incremental quantiles via MERGEABLE Datasketches KLL state — the
    * quantile twin of [[hllMergeReport]]: each input frame sketches
    * independently per key (`kll_sketch_agg_double`, a single pass whose
    * partials merge associatively), the per-key sketches combine with the
    * scalar `kll_sketch_merge_double`, and each requested quantile
    * estimate is RANK-checked against the exact union: the estimate's
    * feasible rank interval `[count(v < est), count(v <= est)] / n` must
    * come within `tol` of the requested `q`. Rank (not value) is the
    * property KLL guarantees — ~1.6% normalized rank error at the default
    * k=200 — so `tol = 0.05` leaves a 3× margin and the emitted boolean is
    * stable across partitionings and sketch randomization.
    *
    * This is the growing-corpus calibration face `approx_percentile`
    * lacks: its GK summary is internal state, not a column you can store
    * per snapshot and merge later, while a KLL sketch column per
    * (partition, key) is a few KB and cross-window percentiles are sketch
    * merges, no rescan. The exact side here exists for the correctness
    * gate (the a07/a21 pattern); at 100 TB the sketch column IS the
    * operator output.
    */
  def quantileMergeReport(a: DataFrame, b: DataFrame, key: Column, value: Column,
      qs: Seq[Double] = Seq(0.25, 0.5, 0.75), sketchK: Int = 200,
      tol: Double = 0.05, outName: String = "within_tol"): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q < 1.0),
      s"quantiles must be in (0,1), got $qs")
    require(sketchK >= 8 && sketchK <= 65535, s"sketchK out of range: $sketchK")
    require(tol > 0.0 && tol < 0.5, s"tol must be in (0,0.5), got $tol")
    val keyName = a.select(key).columns.head
    def sketch(df: DataFrame, keyOut: String, out: String): DataFrame =
      df.select(key.as(keyOut), value.cast("double").as("__v"))
        .groupBy(col(keyOut))
        .agg(expr(s"kll_sketch_agg_double(__v, $sketchK)").as(out))
    // null-safe full-outer join, same rationale as hllMergeReport: a null
    // key is a legitimate group on both sides
    val merged = sketch(a, "__ka", "__sa")
      .join(sketch(b, "__kb", "__sb"), col("__ka") <=> col("__kb"), "full_outer")
      .select(coalesce(col("__ka"), col("__kb")).as("__k"),
        when(col("__sa").isNull, col("__sb"))
          .when(col("__sb").isNull, col("__sa"))
          .otherwise(expr("kll_sketch_merge_double(__sa, __sb)")).as("__sk"))
    // the quantile rank argument must be foldable, so each q is its own
    // projection over the (tiny, keys-sized) sketch frame
    val est = qs.map(q =>
      merged.select(col("__k"), lit(q).as("q"),
        expr(s"kll_sketch_get_quantile_double(__sk, ${q}d)").as("__est")))
      .reduce(_.unionByName(_))
    // exact rank check over the union; est is keys × quantiles — tiny —
    // so it broadcasts into the union scan and the only shuffle is the
    // (key, q) aggregate
    val union = a.select(key.as("__ke"), value.cast("double").as("__v"))
      .unionByName(b.select(key.as("__ke"), value.cast("double").as("__v")))
    union.join(broadcast(est), col("__ke") <=> col("__k"))
      .groupBy(col("__k").as(keyName), col("q"))
      .agg(count(when(col("__v").isNotNull, lit(1))).as("__n"),
        count(when(col("__v") < col("__est"), lit(1))).as("__lt"),
        count(when(col("__v") <= col("__est"), lit(1))).as("__le"))
      .select(col(keyName), col("q"),
        coalesce(
          col("__lt").cast("double") / col("__n") - tol <= col("q") &&
            col("q") <= col("__le").cast("double") / col("__n") + tol,
          col("__n") === 0).as(outName))
  }

  /** Count-Min-Sketch frequency estimates, tolerance-checked: builds the
    * sketch with Spark's `count_min_sketch` aggregate (partials merge
    * associatively — ONE narrow pass over the stream, a sketch-sized
    * shuffle, exactly how per-key frequencies are estimated at 100 TB
    * without a per-key aggregate), then probes it per distinct key via
    * [[graft.plans.Native.cmsEstimate]] and emits the CMS guarantee as a
    * boolean: `exact <= estimate <= exact + ceil(eps·N)`. Same
    * tolerance-oracle pattern as the HLL/GK checks (a07/a08): the sketch
    * VALUE has no cross-engine twin, the PROPERTY does.
    *
    * The one `.head()` pulls a single row whose size is a function of
    * (eps, confidence) only — data-independent, same justification as the
    * IVF centroid collect — and the sketch re-enters the plan as a
    * constant.
    *
    * Keys of any type are accepted: both the sketch build and the probe run
    * over the key's STRING form, so the two sides always hash the same
    * bytes. A NULL key group is vacuously `within_bound` — the aggregate
    * skips nulls, so the sketch holds no entry for them, and the probe
    * (null-propagating) would otherwise emit NULL where the per-group
    * guarantee semantically holds.
    */
  def cmsFrequencyReport(df: DataFrame, key: Column,
      eps: Double = 0.01, confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    val k = key.cast("string")
    val row = df.agg(
      count_min_sketch(k, lit(eps), lit(confidence), lit(seed)).as("__s"),
      count(lit(1)).as("__n")).head()
    val sketch = row.getAs[Array[Byte]](0)
    val bound = math.ceil(eps * row.getLong(1)).toLong
    val est = graft.plans.Native.cmsEstimate(col("key"), sketch)
    df.groupBy(k.as("key")).agg(count(lit(1)).as("n_exact"))
      .select(col("key"), col("n_exact"),
        coalesce(est >= col("n_exact") && est <= col("n_exact") + lit(bound),
          col("key").isNull).as("within_bound"))
  }

  /** Item-affinity (market-basket lift) matrix: for every pair of items
    * that co-occur in at least one entity's basket,
    * `lift = P(a,b) / (P(a)·P(b))` over the entity population — the
    * "users who error also purchase?" dashboard and, corpus-side, the
    * topic/tag co-occurrence audit. Lift > 1 means the pair attracts,
    * < 1 repels; disjoint pairs are implicit zeros and not materialized.
    *
    * Scale shape: one distinct pass to (entity, item) baskets, then a
    * per-entity basket cap BEFORE the pair join — the pair fan-out is
    * |basket|², so one hub entity holding 10⁵ distinct items would emit
    * 10¹⁰ pairs from a single basket; `maxBasket` truncates every basket
    * to its `maxBasket` smallest (salted-hash, item) entries — a
    * deterministic pseudo-random selection with a total tiebreak, the
    * capBuckets discipline enforced in code, not just documented. (A
    * window, not [[graft.sampling.Sampling.capPerGroup]]'s bounded heap:
    * items are any type — event types are strings — and the heap
    * aggregate is long-keyed; the window partitions on the SAME entity
    * key the pair join shuffles on and costs linear-per-basket vs the
    * join's quadratic, so it is never the binding term.) Baskets at or
    * under the cap pass through untouched, so small item domains (event
    * types, tags) are exact. Marginals and the entity total are computed
    * over the SAME capped frame, so the lift stays internally consistent
    * (capped = the exact affinity of the capped corpus). Aggregates are
    * |items|²-bounded; marginals join back broadcast. Lift arithmetic is
    * exact integer counts until one final double ratio.
    */
  /** Default basket cap and selection salt for [[itemAffinity]] — shared
    * with the a36 oracle's SQL mirror so the cap rule exists once.
    */
  val DefaultMaxBasket: Int = 256
  val AffinitySalt: String = "affinity"

  def itemAffinity(df: DataFrame, entity: Column, item: Column,
      maxBasket: Int = DefaultMaxBasket,
      salt: String = AffinitySalt): DataFrame = {
    require(maxBasket >= 2, s"maxBasket must be >= 2, got $maxBasket")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__e"))
      .orderBy(graft.sampling.Sampling.hashKey(col("item"), lit(salt)).asc,
        col("item").asc)
    val ei = df.select(entity.as("__e"), item.as("item")).distinct()
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxBasket)
      .drop("__rn")
      .localCheckpoint(true)
    val tot = ei.agg(countDistinct(col("__e")).as("__N"))
    val per = ei.groupBy(col("item")).agg(count(lit(1)).as("__c"))
    val a = ei.select(col("__e"), col("item").as("item_a"))
    val b = ei.select(col("__e"), col("item").as("item_b"))
    a.join(b, "__e").filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b")).agg(count(lit(1)).as("n_both"))
      .join(broadcast(per.select(col("item").as("item_a"), col("__c").as("__ca"))),
        "item_a")
      .join(broadcast(per.select(col("item").as("item_b"), col("__c").as("__cb"))),
        "item_b")
      .crossJoin(broadcast(tot))
      .select(col("item_a"), col("item_b"), col("n_both"),
        round((col("n_both").cast("double") * col("__N").cast("double")) /
          (col("__ca").cast("double") * col("__cb").cast("double")), 6)
          .as("lift"))
  }

  /** Cross-group quantile normalization mapping: for every (group, score)
    * block, the POOLED score at the same mid-CDF quantile — the transform
    * that makes a per-source quality score comparable ACROSS sources
    * (source A's 0.6 and source B's 0.6 rarely mean the same thing; their
    * 80th percentiles do). A curation pipeline applies the returned
    * mapping with one equi-join on (group, score) and can then threshold
    * one number corpus-wide.
    *
    * Definitions, exact on the discrete score domain: a block's quantile
    * is the mid-CDF `q = (2·below + count) / (2n)`; its normalized value
    * is the smallest pooled score whose cumulative fraction
    * `cum_pool/N ≥ q`. Both sides of that inequality are single-division
    * doubles of exact integer counts, so the mapping is deterministic and
    * engine-independent.
    *
    * Scale shape: ONE corpus-sized aggregate to (group, score) blocks;
    * the pooled distribution derives from it; the quantile lookup is the
    * sorted-merge trick — union the pooled blocks into the group-block
    * stream, one ordered window pass, each group block picks the first
    * pooled block at-or-after its quantile — over frames bounded by
    * |groups|·|score domain|, never the corpus (the [[graft.analytics
    * .Evaluation]] bounded-domain discipline; callers quantize continuous
    * scores first, as the repo's round-6 scores already are).
    */
  def quantileNormalize(df: DataFrame, group: Column, score: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val blocks = df.select(group.as("grp"), score.as("s"))
      .groupBy(col("grp"), col("s")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val wg = Window.partitionBy(col("grp")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val sizes = blocks.groupBy(col("grp")).agg(sum(col("c")).as("n"))
    val gq = blocks
      .withColumn("__below", coalesce(sum(col("c")).over(wg), lit(0L)))
      .join(broadcast(sizes), Seq("grp"))
      .select(col("grp"), col("s"), col("c"),
        ((lit(2.0) * col("__below") + col("c")) / (lit(2.0) * col("n")))
          .as("q"))
    val wp = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = blocks.agg(sum(col("c")).as("nn"))
    val pool = blocks.groupBy(col("s")).agg(sum(col("c")).as("pc"))
      .withColumn("__cum", sum(col("pc")).over(wp))
      .crossJoin(broadcast(tot))
      .select(col("s").as("__pv"),
        (col("__cum").cast("double") / col("nn").cast("double")).as("q"))
    // sorted merge: group blocks (kind 0) before pooled blocks (kind 1)
    // at equal q, so a pooled block AT the quantile is still "following";
    // min over the following pooled values = the first one at-or-after
    // (pooled value increases with q)
    val merged = gq.select(col("grp"), col("s"), col("c"), col("q"),
        lit(0).as("__kind"), lit(null).cast(pool.schema("__pv").dataType)
          .as("__pv"))
      .unionByName(pool.select(lit(null).cast(gq.schema("grp").dataType)
          .as("grp"), lit(null).cast(gq.schema("s").dataType).as("s"),
        lit(null).cast("bigint").as("c"), col("q"), lit(1).as("__kind"),
        col("__pv")))
    val wm = Window.orderBy(col("q"), col("__kind"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    merged
      .withColumn("__nv", min(col("__pv")).over(wm))
      .filter(col("__kind") === 0)
      .select(col("grp").as("group"), col("s").as("score"), col("c").as("n"),
        round(col("q"), 6).as("q"), col("__nv").as("normalized"))
  }

  /** AMS / tug-of-war sketch of the second frequency moment
    * F₂ = Σₖ cₖ² (Alon-Matias-Szegedy, STOC '96): 64 signed counters
    * Xᵢ = Σ_rows sᵢ(key), sᵢ ∈ {−1,+1}, with E[Xᵢ²] = F₂. F₂ of a join
    * key IS the self-join output size (and, up to the diagonal, the
    * candidate-pair mass of an LSH bucketing), so this is the join-size
    * estimator a planner consults BEFORE paying for the join.
    *
    * The 64 signs come from the 64 low bits of ONE md5 per row — sign
    * i = bit (i mod 4) of hex char ⌊i/4⌋ — so the whole sketch is a
    * single projection plus one map-side-combinable aggregate: no
    * shuffle by key, no per-key state, and therefore NO skew problem —
    * precisely the failure mode of the exact `groupBy(key).count()` it
    * replaces on a Zipfian key at the 100 TB tier. Counters are exact
    * longs; mergeability across shards is plain column-wise SUM.
    *
    * Emits one row: `n_rows` and the 64 counters `x0..x63`. The
    * estimate (mean of Xᵢ², std ≈ F₂·√(2/64) ≈ 0.18·F₂ — a coarse
    * planner dial, reported as such) is taken by [[amsSelfJoinAudit]].
    */
  def amsF2Sketch(df: DataFrame, key: Column, counters: Int = 64): DataFrame = {
    require(counters >= 1 && counters <= 64,
      s"counters must be in [1,64], got $counters")
    val hex = df.select(md5(key.cast("string")).as("__h"))
    val signs = (0 until counters).map { i =>
      val nib = conv(substring(col("__h"), i / 4 + 1, 1), 16, 10).cast("int")
      sum(when(nib.bitwiseAND(lit(1 << (i % 4))) > 0, 1L).otherwise(-1L))
        .as(s"x$i")
    }
    hex.agg(count(lit(1)).as("n_rows"), signs: _*)
  }

  /** Audit face for [[amsF2Sketch]]: the sketch estimate beside the exact
    * F₂ (one groupBy — the audit pays what production avoids), with the
    * relative error the storage/skew trade actually costs. All-integer
    * until the two final divisions, so the row is bit-reproducible.
    */
  def amsSelfJoinAudit(df: DataFrame, key: Column,
      counters: Int = 64): DataFrame = {
    val sk = amsF2Sketch(df, key, counters)
    val estNum = (0 until counters).map(i => col(s"x$i") * col(s"x$i"))
      .reduce(_ + _)
    val est = sk.select(col("n_rows"),
      round(estNum.cast("double") / lit(counters.toDouble), 6).as("est_f2"))
    val exact = df.groupBy(key.as("__k")).agg(count(lit(1)).as("__c"))
      .agg(count(lit(1)).as("n_distinct"),
        sum(col("__c") * col("__c")).as("exact_f2"))
    est.crossJoin(broadcast(exact))
      .select(col("n_rows"), col("n_distinct"), col("exact_f2"),
        col("est_f2"),
        round(abs(col("est_f2") - col("exact_f2").cast("double")) /
          col("exact_f2").cast("double"), 6).as("rel_err"))
  }

  /** Count-Min sketch of a key's frequency vector: `depth` hash rows of
    * `width` counters, each counter the SUM of counts hashing into it —
    * the point-query companion of [[amsF2Sketch]] (AMS answers Σc², CMS
    * answers "how often does THIS key occur" in depth·width longs). The
    * estimate for a key is the MIN over its `depth` counters; it can only
    * OVER-estimate (collisions add, never subtract), by less than
    * e·N/width with probability 1−e^−depth — the guarantee that makes a
    * tiny counter grid a safe stand-in for a full frequency table when
    * deciding skew handling or hot-key salting at the 100 TB tier.
    *
    * Scale shape: one grouped count on the key (vocabulary-sized,
    * map-side combinable) feeds `depth` further aggregates of at most
    * depth·width rows; counters are exact longs and shard-mergeable by
    * column-wise SUM. Nothing row-scaled ever crosses the shuffle twice.
    */
  def cmsSketch(df: DataFrame, key: Column, depth: Int = 3,
      width: Int = 8): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth must be in [1,8], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    val counts = df.groupBy(key.as("__k")).agg(count(lit(1)).as("__c"))
    val rows = (0 until depth).map { d =>
      counts.select(lit(d).as("row_d"),
        (graft.sampling.Sampling.hashKey(col("__k"), lit(s"cms$d")) %
          width).as("slot"),
        col("__c"))
    }.reduce(_ unionByName _)
    rows.groupBy(col("row_d"), col("slot"))
      .agg(sum(col("__c")).as("counter"))
  }

  /** Audit face for [[cmsSketch]]: for the `topK` most frequent keys
    * (count-desc, key-asc tiebreak — a TakeOrdered cut over the
    * vocabulary-sized count frame, never a global window), the exact
    * count beside the CMS point estimate and the collision overestimate.
    * `overcount` (named to dodge the SQL OVER keyword in the oracle twin)
    * is ≥ 0 BY CONSTRUCTION (spec-asserted); how MUCH over is the
    * dial that says whether depth·width is sized right for the skew the
    * sketch will be trusted to detect.
    */
  def cmsAudit(df: DataFrame, key: Column, depth: Int = 3, width: Int = 8,
      topK: Int = 20): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val counts = df.groupBy(key.as("__k")).agg(count(lit(1)).as("exact"))
    val top = counts.orderBy(col("exact").desc, col("__k")).limit(topK)
    val probes = (0 until depth).map { d =>
      top.select(col("__k"), col("exact"), lit(d).as("row_d"),
        (graft.sampling.Sampling.hashKey(col("__k"), lit(s"cms$d")) %
          width).as("slot"))
    }.reduce(_ unionByName _)
    probes.join(broadcast(cmsSketch(df, key, depth, width)),
        Seq("row_d", "slot"))
      .groupBy(col("__k").as("key"), col("exact"))
      .agg(min(col("counter")).as("cms_est"))
      .withColumn("overcount", col("cms_est") - col("exact"))
  }

  /** Robust per-group outlier report — median/MAD instead of mean/stddev,
    * so the threshold itself is not dragged by the outliers it is
    * hunting (one stuck-sensor spike inflates a z-score sigma and masks
    * every later spike; the MAD barely moves). Flags |x − median| >
    * k · 1.4826 · MAD, 1.4826 being the consistency constant that makes
    * MAD estimate sigma under normality, so `k` reads in familiar
    * sigma units.
    *
    * Determinism: median and MAD round at 6 dp BEFORE the threshold
    * arithmetic, so the strict-> comparison runs on identical doubles in
    * both engines (exact `percentile` pairs with DuckDB `quantile_cont`,
    * the a08 discipline). Null values are excluded throughout.
    *
    * Scale shape: two exact-percentile passes (median, then MAD over the
    * deviations) plus one flagging aggregate — three keyed shuffles, the
    * price of exact order statistics; at the 100 TB tier swap
    * `percentile_approx` exactly as [[Aggregates.describe]] documents,
    * the flagging logic is unchanged. The per-group frames join back on
    * the group key (|groups|-sized, AQE broadcasts them).
    */
  def robustOutliers(df: DataFrame, group: Column, value: Column,
      k: Double = 3.0): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val v = df.select(group.as("group"), value.cast("double").as("__v"))
      .filter(col("__v").isNotNull)
    val med = v.groupBy(col("group"))
      .agg(count(lit(1)).as("n"),
        round(percentile(col("__v"), lit(0.5)), 6).as("median"))
    val dev = v.join(med, Seq("group"))
      .withColumn("__ad", abs(col("__v") - col("median")))
    val mad = dev.groupBy(col("group"))
      .agg(round(percentile(col("__ad"), lit(0.5)), 6).as("mad"))
    dev.join(mad, Seq("group"))
      .withColumn("__thr", lit(k) * lit(1.4826) * col("mad"))
      .groupBy(col("group"))
      .agg(max(col("n")).as("n"), max(col("median")).as("median"),
        max(col("mad")).as("mad"),
        sum(when(col("__ad") > col("__thr"), 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col("group"), col("n"), col("median"), col("mad"),
        round(lit(1.4826) * col("mad"), 6).as("sigma_robust"),
        col("n_outliers"),
        round(col("n_outliers").cast("double") / col("n").cast("double"),
          6).as("outlier_rate"))
  }
}
