package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget corpus selection: keep the best documents — by a quality
  * score, best first — until a global token budget is exhausted. This is
  * the "assemble exactly a 2T-token training mix from the top of the
  * quality ranking" step that follows scoring/filtering in an LLM data
  * pipeline.
  *
  * Selection rule (exact, total-order): rank docs by `(score DESC,
  * tie_hash ASC, id ASC)` — `tie_hash` is the salted 32-bit content hash
  * of the id ([[Sampling.hashKey]]) — and keep every prefix doc whose
  * INCLUSIVE running token sum is `<= budget`. Breaking score ties on the
  * hash rather than the raw id does two jobs: it de-biases the boundary
  * cut inside a tie group (raw ids correlate with crawl order), and it is
  * what lets a tied score value be SPLIT across reducers exactly (below).
  *
  * The naive implementation is a global sort + a single-partition running
  * sum — the canonical scale-killer. Here the running sum is split in two
  * data-parallel levels:
  *
  *   1. docs bucket by score into `numBuckets` equal-width bins between
  *      the observed min/max (one scalar agg, broadcast back);
  *   2. a bucket whose docs all share ONE score value (the discrete-score
  *      degenerate: integer ratings, a constant column) and whose count
  *      exceeds `subBuckets` splits further into `subBuckets` cells by
  *      `⌊tie_hash·S/2³²⌋` — monotonic in the hash, which IS the tie
  *      order, so the split preserves the global order. Mixed-score
  *      buckets never split (a hash cell would interleave scores);
  *      equal-width bucketing already bounds them for near-continuous
  *      scores.
  *   3. per-(bucket, cell) token totals aggregate into a bounded frame
  *      (≤ numBuckets·subBuckets rows) whose descending-order prefix sums
  *      are computed on the driver and rejoin as a broadcast;
  *   4. each doc's inclusive cumsum = its cell's prefix + a running sum
  *      over `(score DESC, tie_hash ASC, id ASC)` WITHIN its cell — a
  *      window partitioned by (bucket, cell), so no single reducer ever
  *      sees more than one cell's docs.
  *
  * Because bucketing (and, inside a pure bucket, the hash cell) is
  * monotonic in the selection order, prefix+within-cell cumsum equals the
  * global cumsum exactly; token counts are integers, so there is no float
  * merge-order hazard. Expected per-reducer rows are bounded by
  * `|docs|/numBuckets` for continuous scores and `|bucket|/subBuckets`
  * for repeated-value buckets — no score distribution degenerates to a
  * global sort.
  */
object BudgetSelect {

  /** 2³² — the exclusive upper bound of [[Sampling.hashKey]]'s range;
    * `⌊hash·S/2³²⌋` maps the hash onto `S` order-preserving cells
    * (products stay < 2⁴⁷, exact in double).
    */
  private val HashSpace = 4294967296L

  /** Docs selected under `budget`, with their inclusive running token sum.
    * Emits `(doc_id, score, n_tokens, cum_tokens)`. Any numeric score
    * column is accepted (cast to double up front).
    */
  def selectUnderBudget(df: DataFrame, id: Column, score: Column,
      tokens: Column, budget: Long, numBuckets: Int = 1024,
      subBuckets: Int = 32, salt: String = "budget"): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(numBuckets >= 2, s"numBuckets must be >= 2, got $numBuckets")
    require(subBuckets >= 1 && subBuckets <= 65536,
      s"subBuckets must be in [1, 65536], got $subBuckets")
    // cached once: (id, score, tokens, tie) is ~32 bytes/row — far smaller
    // than the text it derives from — and three passes read it (min/max,
    // the bounded totals, the final join+window). The stats action below
    // materializes the cache, so scoring/tokenize expressions run over the
    // corpus exactly once (an eviction under memory pressure recomputes
    // them — deterministic expressions, so correct, just slower).
    val base = df.select(id.as("doc_id"), score.cast("double").as("score"),
      tokens.cast("long").as("n_tokens"),
      Sampling.hashKey(id, lit(salt)).as("__tie"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val statsRow = base.agg(min(col("score")), max(col("score"))).head()
    // empty corpus (an upstream gate dropped everything): empty result,
    // not an NPE off the null min/max
    if (statsRow.isNullAt(0))
      return base.select(col("doc_id"), col("score"), col("n_tokens"),
        lit(0L).as("cum_tokens")).limit(0)
    val (lo, hi) = (statsRow.getDouble(0), statsRow.getDouble(1))
    // width_bucket puts score=hi into numBuckets+1; fold it back so the
    // top bucket is closed
    val bucketed = base.withColumn("__b",
      least(width_bucket(col("score"), lit(lo), lit(hi + math.ulp(hi)),
        lit(numBuckets)), lit(numBuckets.toLong)))
    // ONE bounded pass (<= numBuckets * subBuckets rows collected): stats
    // per (bucket, candidate cell) — the cell key is computed
    // unconditionally here, and the split DECISION is made on the driver
    // by re-aggregating cells per bucket (count > subBuckets AND pure:
    // min == max, one repeated score value). This replaces the former
    // two-action sequence (per-bucket purity collect, then per-cell totals
    // collect) with a single job; non-split buckets' cells merge back to
    // cell 0 driver-side.
    val cellAll = floor(col("__tie") * lit(subBuckets.toLong) / lit(HashSpace))
      .cast("long")
    val cellStats = bucketed.withColumn("__sba", cellAll)
      .groupBy(col("__b"), col("__sba"))
      .agg(count(lit(1)).as("__c"), min(col("score")).as("__lo"),
        max(col("score")).as("__hi"), sum(col("n_tokens")).as("__t"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5)))
    val splitBuckets = cellStats.groupBy(_._1).collect {
      case (b, rows) if rows.map(_._3).sum > subBuckets &&
        rows.map(_._4).min == rows.map(_._5).max => b
    }.toSet
    val cell =
      if (splitBuckets.isEmpty) lit(0L)
      else when(col("__b").isInCollection(splitBuckets), cellAll)
        .otherwise(lit(0L))
    val celled = bucketed.withColumn("__sb", cell)
    // per-cell token totals -> driver-side prefix sums in selection order
    // (bucket desc, cell asc), broadcast back as a lookup
    val perCell = cellStats
      .map { case (b, sba, _, _, _, t) =>
        (b, if (splitBuckets.contains(b)) sba else 0L) -> t }
      .groupBy(_._1).map { case (k, ts) => k -> ts.map(_._2).sum }
      .toSeq.sortBy { case ((b, s), _) => (-b, s) }
    val prefixBefore = perCell.scanLeft(((Long.MaxValue, Long.MinValue), 0L)) {
      case ((_, acc), (cellKey, t)) => (cellKey, acc + t)
    }.sliding(2).map { case Seq((_, acc), ((b, s), _)) => (b, s, acc) }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val prefixDf = prefixBefore.toDF("__b", "__sb", "__prefix")
    val w = Window.partitionBy(col("__b"), col("__sb"))
      .orderBy(col("score").desc, col("__tie").asc, col("doc_id").asc)
    celled.join(broadcast(prefixDf), Seq("__b", "__sb"))
      .withColumn("cum_tokens", col("__prefix") + sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("score"), col("n_tokens"), col("cum_tokens"))
  }

  /** Percentile-rank calibration of a score column: every doc's exact
    * global rank (1 = best, the [[selectUnderBudget]] order: score DESC,
    * salted hash tie, id) and its percentile `(rnk − 1)/(n − 1)` — the
    * "keep the top 30% by quality" gate without a token budget, and the
    * calibration that makes scores from different scorers comparable.
    *
    * The naive form is `percent_rank()` over an unpartitioned window —
    * the single-reducer global sort. Here the rank IS the inclusive
    * running sum of [[selectUnderBudget]] with one token per doc, so the
    * whole two-level (bucket, hash-cell) machinery — including the
    * repeated-score split — applies unchanged; no reducer ever sees more
    * than one cell's docs.
    */
  def percentileRanks(df: DataFrame, id: Column, score: Column,
      numBuckets: Int = 1024, subBuckets: Int = 32,
      salt: String = "budget"): DataFrame = {
    val ranked = selectUnderBudget(df, id, score, lit(1L), Long.MaxValue,
        numBuckets, subBuckets, salt)
      .select(col("doc_id"), col("score"), col("cum_tokens").as("rnk"))
    // n from a narrow count of the INPUT (the unlimited budget keeps every
    // row, so the counts agree) — counting `ranked` would re-execute the
    // whole join+window machinery just to size the denominator
    val n = df.select(id).count()
    val pct =
      if (n <= 1) lit(0.0)
      else round((col("rnk") - 1).cast("double") / lit((n - 1).toDouble), 6)
    ranked.select(col("doc_id"), col("score"), col("rnk"), pct.as("pct_rank"))
  }

  /** Per-GROUP percentile-rank calibration: every doc's exact rank and
    * percentile within its group, same total order as [[percentileRanks]]
    * (`score DESC, tie_hash, id`). This is the "normalize quality scores
    * within each source before a global gate" step — a raw threshold on
    * heterogeneous scorers keeps whole sources or drops them; calibrating
    * per source first makes "top 30% of EACH source" expressible.
    *
    * Same two-level decomposition as [[selectUnderBudget]], grouped:
    * global equal-width score buckets (bucketing is monotonic in score, so
    * it is monotonic WITHIN every group), per-(group, bucket) purity
    * check, hash cells inside heavy pure buckets, ranks = bounded-frame
    * prefix + a within-cell window. Two deltas from the ungrouped path,
    * both because |groups| multiplies the bounded frames: the split
    * decision joins back as a broadcast frame instead of a collected
    * literal set, and the prefix is a window over the per-cell totals
    * partitioned by group (≤ numBuckets·subBuckets rows per group on one
    * reducer — a bounded constant, never corpus-scaled) instead of a
    * driver scanLeft. No reducer ever sees more than one cell of one
    * group's docs.
    */
  def percentileRanksByGroup(df: DataFrame, group: Column, id: Column,
      score: Column, numBuckets: Int = 1024, subBuckets: Int = 32,
      salt: String = "budget"): DataFrame = {
    require(numBuckets >= 2, s"numBuckets must be >= 2, got $numBuckets")
    require(subBuckets >= 1 && subBuckets <= 65536,
      s"subBuckets must be in [1, 65536], got $subBuckets")
    // persist materialized by the stats action (the selectUnderBudget
    // pattern): one evaluation of the scoring expressions, no separate
    // checkpoint job, deterministic recompute if evicted
    val base = df.select(group.as("group"), id.as("doc_id"),
      score.cast("double").as("score"),
      Sampling.hashKey(id, lit(salt)).as("__tie"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val statsRow = base.agg(min(col("score")), max(col("score"))).head()
    if (statsRow.isNullAt(0))
      return base.select(col("group"), col("doc_id"), col("score"),
        lit(0L).as("rnk"), lit(0.0).as("pct_rank")).limit(0)
    val (lo, hi) = (statsRow.getDouble(0), statsRow.getDouble(1))
    val bucketed = base.withColumn("__b",
      least(width_bucket(col("score"), lit(lo), lit(hi + math.ulp(hi)),
        lit(numBuckets)), lit(numBuckets.toLong)))
    // ONE corpus aggregation to the bounded (group, bucket, candidate-cell)
    // frame (<= |groups| * numBuckets * subBuckets rows, checkpointed);
    // split decisions, per-cell prefix totals, and group sizes all derive
    // from it with tiny re-aggregations — the former three separate
    // corpus-frame scans (purity agg, per-cell totals, sizes) collapse
    // into this single shuffle. Stays a broadcast frame, never a driver
    // collect: |groups| scales with the corpus (the scaladoc contract).
    val cellAll = floor(col("__tie") * lit(subBuckets.toLong) / lit(HashSpace))
      .cast("long")
    val stats = bucketed.withColumn("__sba", cellAll)
      .groupBy(col("group"), col("__b"), col("__sba"))
      .agg(count(lit(1)).as("__c"), min(col("score")).as("__slo"),
        max(col("score")).as("__shi"))
      .localCheckpoint(true)
    val info = stats.groupBy(col("group"), col("__b"))
      .agg(sum(col("__c")).as("__bc"), min(col("__slo")).as("__lo"),
        max(col("__shi")).as("__hi"))
      .select(col("group"), col("__b"),
        (col("__bc") > subBuckets && col("__lo") === col("__hi")).as("__split"))
    val celled = bucketed.join(broadcast(info), Seq("group", "__b"))
      .withColumn("__sb", when(col("__split"), cellAll).otherwise(lit(0L)))
    val wPrefix = Window.partitionBy(col("group"))
      .orderBy(col("__b").desc, col("__sb").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val perCell = stats.join(info, Seq("group", "__b"))
      .withColumn("__sb", when(col("__split"), col("__sba")).otherwise(lit(0L)))
      .groupBy(col("group"), col("__b"), col("__sb"))
      .agg(sum(col("__c")).as("__t"))
      .withColumn("__prefix", coalesce(sum(col("__t")).over(wPrefix), lit(0L)))
      .select(col("group"), col("__b"), col("__sb"), col("__prefix"))
    val sizes = stats.groupBy(col("group")).agg(sum(col("__c")).as("__n"))
    val w = Window.partitionBy(col("group"), col("__b"), col("__sb"))
      .orderBy(col("score").desc, col("__tie").asc, col("doc_id").asc)
    celled.join(broadcast(perCell), Seq("group", "__b", "__sb"))
      .withColumn("rnk", col("__prefix") + row_number().over(w))
      .join(broadcast(sizes), Seq("group"))
      .select(col("group"), col("doc_id"), col("score"), col("rnk"),
        when(col("__n") <= 1, lit(0.0))
          .otherwise(round((col("rnk") - 1).cast("double") /
            (col("__n") - 1).cast("double"), 6)).as("pct_rank"))
  }

  /** Neyman (minimum-variance) sample allocation: distribute a sampling
    * budget across strata proportionally to `n_s · σ_s` — the optimal
    * allocation when the goal is the tightest estimate of a population
    * mean (high-variance strata earn more samples per row than uniform
    * ones), the survey-sampling classic and [[waterFill]]'s counterpart
    * (fairness vs estimator variance). Singleton strata have undefined
    * sample σ and weight 0 (documented: they contribute one point
    * regardless of allocation).
    *
    * Determinism: σ rounds to 6 dp, then `n·σ` quantizes to integer
    * micro-units before the denominator sum (the x61 powered-mass
    * construction) — merge-order-exact.
    */
  def neymanAllocation(df: DataFrame, stratum: Column, value: Column,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be > 0, got $budget")
    val per = df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n"),
        round(stddev_samp(value), 6).as("sd"))
      .withColumn("__pw",
        coalesce(round(col("n").cast("double") * col("sd") * 1.0e6), lit(0.0)))
    val den = per.agg(sum(col("__pw")).as("__den"))
    per.crossJoin(broadcast(den))
      .select(col("stratum"), col("n"), col("sd"),
        round(col("__pw") / col("__den"), 6).as("weight"),
        round(lit(budget).cast("double") * (col("__pw") / col("__den")), 6)
          .as("alloc"))
  }

  /** Water-filling budget allocation across groups: give every group the
    * same "water level" `L` of tokens, capped at the group's own capacity,
    * with `L` chosen so the allocations sum to `budget` — the
    * max-min-fair mixture plan (as uniform across sources as their sizes
    * allow; small feeds contribute everything, big feeds are levelled),
    * the principled answer to "how do I split a 2T-token budget over 500
    * crawls of wildly different sizes". When `budget ≥ Σ caps`, every
    * group simply gets its capacity.
    *
    * Closed form, not iteration: with capacities sorted ascending and
    * exclusive prefix sums `P`, segment `i`'s candidate level is
    * `(budget − P_{i−1})/(n − i + 1)`, and exactly one segment satisfies
    * `c_{i−1} ≤ L < c_i` — one window pass finds it, a 1-row broadcast
    * carries it back, nothing iterates.
    *
    * Scale shape: runs on the |groups|-sized CAPACITY frame (post
    * aggregate), so the global-ordering window is over group count, not
    * corpus rows — the same post-aggregate window contract as
    * signaturePhrases; allocations are deterministic (exact long inputs,
    * one double division).
    */
  def waterFill(caps: DataFrame, key: Column, cap: Column,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be > 0, got $budget")
    val c = caps.select(key.as("key"), cap.cast("long").as("cap"))
      .localCheckpoint(true) // |groups|-sized; level scan + output both read it
    val ord = Window.orderBy(col("cap").asc, col("key").asc)
    val tot = c.agg(count(lit(1)).as("__n"), sum(col("cap")).as("__tot"))
    val ranked = c
      .withColumn("__p", coalesce(sum(col("cap")).over(
        ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__i", row_number().over(ord).cast("long"))
      .withColumn("__prev", coalesce(lag(col("cap"), 1).over(ord), lit(0L)))
      .crossJoin(broadcast(tot))
    val level = (lit(budget).cast("double") - col("__p").cast("double")) /
      (col("__n") - col("__i") + 1).cast("double")
    val l = ranked
      .filter(col("__tot") > budget &&
        level >= col("__prev").cast("double") &&
        level < col("cap").cast("double"))
      .agg(max(level).as("__L")) // exactly one row matches; null when budget ≥ Σ
    c.crossJoin(broadcast(l))
      .select(col("key"), col("cap").as("cap_tokens"),
        round(when(col("__L").isNull, col("cap").cast("double"))
          .otherwise(least(col("cap").cast("double"), col("__L"))), 6)
          .as("allocation"),
        (col("__L").isNull || col("cap").cast("double") <= col("__L"))
          .as("saturated"))
  }

  /** Quality threshold for a TOKEN-retention target: the highest quality
    * cut q* such that documents scoring ≥ q* still hold at least
    * `retain` of the corpus's tokens, reported per source — "cut at the
    * quality that keeps 60 % of tokens" is how a corpus-wide quality
    * gate is actually dialed (a fixed score cut retains an unpredictable
    * token mass; the retention target is the knob the training-token
    * budget understands). The per-source rows answer the follow-up
    * question: WHO loses under a single global cut — a source whose
    * retention collapses is one whose quality distribution sits below
    * the corpus mix (compare the Mondrian gate, x174, for the
    * per-source-calibrated alternative).
    *
    * The cut is exact, found on the round-6 quality JUMP SPINE (x171's
    * discipline): per-quality token sums, one descending cumulative
    * window over |distinct qualities| rows — never corpus rows — and
    * the first crossing of `retain · total` is q*. Overshoot is at most
    * one spine step (the whole-document granularity; a document is
    * never split). Token counts are integers, so the spine sums are
    * merge-order exact; the only double compare is cum ≥ retain·total,
    * identical on both engines.
    */
  def retentionCut(df: DataFrame, source: Column, quality: Column,
      tokens: Column, retain: Double): DataFrame = {
    require(retain > 0 && retain <= 1, s"retain must be in (0,1], got $retain")
    val base = df.select(source.as("source"),
        round(quality.cast("double"), 6).as("__q"),
        tokens.cast("long").as("__tk"))
      .filter(col("__q").isNotNull)
    val spine = base.groupBy(col("__q")).agg(sum(col("__tk")).as("__c"))
    val tot = spine.agg(sum(col("__c")).as("__t"))
    val wc = Window.orderBy(col("__q").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val thr = spine
      .withColumn("__cum", sum(col("__c")).over(wc))
      .crossJoin(broadcast(tot))
      .filter(col("__cum").cast("double") >=
        lit(retain) * col("__t").cast("double"))
      .agg(max(col("__q")).as("threshold"))
    base.crossJoin(broadcast(thr))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__q") >= col("threshold"), 1L).otherwise(0L))
          .as("kept_docs"),
        sum(col("__tk")).as("n_tokens"),
        sum(when(col("__q") >= col("threshold"), col("__tk"))
          .otherwise(0L)).as("kept_tokens"),
        min(col("threshold")).as("threshold"))
      .select(col("source"), col("n_docs"), col("kept_docs"),
        col("n_tokens"), col("kept_tokens"),
        // a source of all-empty documents reads NULL retention, not an
        // ANSI divide-by-zero crash
        round(when(col("n_tokens") =!= 0L,
          col("kept_tokens").cast("double") /
            col("n_tokens").cast("double")), 6).as("retention"),
        col("threshold"))
  }
}
