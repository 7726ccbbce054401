package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution: collapse a registry of dirty records (typo'd names,
  * OCR variants, re-registrations) into golden records — one surviving row
  * per real-world entity, with survivorship rules picking each field.
  *
  * The training-data counterpart is author/source canonicalization before
  * per-entity aggregation: a contributor appearing as "j_smith", "j_smlth"
  * and "jsmith" must count as ONE source when measuring corpus
  * concentration (x116) or applying per-source caps (x96), or the caps
  * silently leak.
  *
  * Composition of the repo's existing distributed primitives — nothing
  * here invents a new shuffle shape:
  *   1. candidate edges from [[Joins.fuzzyJoin]] (deletion-neighborhood
  *      blocking, degenerate-block cap, exact verify — never all-pairs);
  *   2. transitive closure via
  *      [[graft.dedup.Dedup.duplicateClusters]] (min-label propagation
  *      with pointer jumping, O(log diameter) rounds) — a record two
  *      edits from its twin still merges when a middle variant bridges
  *      them, which pairwise matching alone cannot do;
  *   3. one survivorship aggregate per entity (`min_by`/`max_by` — single
  *      map-side-combinable shuffle on `entity_id`).
  */
object Entities {

  /** Resolve `records` into golden records at edit distance ≤ 1 per hop.
    *
    * Emits one row per entity: `entity_id` (min record id — stable under
    * re-partitioning and incremental re-runs as long as ids are stable),
    * `n_records`, `canonical_key` (the key of the LOWEST record id —
    * "oldest registration wins", the survivorship default when ids encode
    * ingest order), `longest_key` (length-then-lexicographic maximum —
    * the "most complete value wins" rule for truncation-prone fields; the
    * composite is a zero-padded length prefix so one string comparison
    * orders by (length, key) identically on any engine), and
    * `total_value` (sum of `value` over members — the "merge the
    * balances" shape).
    *
    * Singletons (no match) survive as their own entity via the left join
    * — resolution never drops records.
    *
    * Scale: blocking + cap bound candidate pairs; the closure is
    * O(log diameter) label rounds; survivorship is one aggregate whose
    * cardinality is |entities| ≤ |records|. A hot (ubiquitous) key value
    * is exactly the degenerate block `maxBucket` caps — the cap trades
    * recall on junk values ("N/A" filling a million rows is not one
    * entity) for a bounded shuffle, the same dial every blocking
    * generator here carries.
    */
  def goldenRecords(records: DataFrame, id: Column, key: Column,
      value: Column, maxBucket: Int = 1000): DataFrame = {
    val base = normalized(records, id, key, value)
    survivorship(base, matchPairs(base, maxBucket))
  }

  /** Incremental face of [[goldenRecords]] — the one-sided-probe
    * discipline of [[graft.dedup.Dedup.incrementalNearDuplicates]] (x67)
    * applied to entity resolution: `oldPairs` is the match-edge frame the
    * previous run persisted, and only the candidate work TOUCHING the new
    * batch (new×new and new×old) is generated this run — old×old
    * blocking, by far the dominant cost at corpus scale, is never
    * re-done.
    *
    * The `maxBucket` degenerate-block cap is decided on block sizes over
    * OLD ∪ NEW — not per input partition — so the delta edges are exactly
    * the new-touching subset of `matchPairs(old ∪ new)` even when the cap
    * binds (a block under the cap in each partition but over it in the
    * union is dropped here too, and vice versa). With that, the result is
    * BIT-IDENTICAL to re-resolving from scratch (spec-asserted, including
    * a cap-binding fixture and merges where a new record bridges two
    * previously-separate entities) — with ONE scoped exception: old×old
    * edges that `oldPairs` already verified are never retro-dropped, so
    * if a block crosses the cap only because new records arrived, a
    * from-scratch run would discard that block's old×old edges while the
    * increment keeps them. That is the intended survivorship semantics
    * (a verified match stays matched); the strict equivalence claim is
    * scoped to corpora where no previously-under-cap block is pushed over
    * by the increment.
    *
    * Returns (deltaPairs, golden): persist `oldPairs ∪ deltaPairs` for
    * the next increment, publish `golden`.
    */
  def goldenRecordsDelta(oldRecords: DataFrame, newRecords: DataFrame,
      oldPairs: DataFrame, id: Column, key: Column, value: Column,
      maxBucket: Int = 1000): (DataFrame, DataFrame) = {
    val o = normalized(oldRecords, id, key, value)
    val n = normalized(newRecords, id, key, value)
    val delta = deltaPairs(o, n, maxBucket)
    (delta, survivorship(o.union(n), oldPairs.union(delta)))
  }

  /** The delta-edge generation of [[goldenRecordsDelta]], exposed so the
    * scale-growth gate can measure candidate work WITHOUT the eager
    * closure/survivorship jobs the full call triggers.
    *
    * Cap on UNION block sizes: ONE count-window over the exploded
    * variants of both batches (same O as matchPairs' own cap), then one
    * join with the NEW side as the probe against the full capped union —
    * every emitted candidate touches the new batch BY CONSTRUCTION, so
    * old×old pairs are never enumerated (a pure-old block of size B must
    * not cost B²/2 discarded rows when |old| ≫ |new| — the whole point
    * of the incremental path). Pair canonicalization (least/greatest id
    * with keys swapped to match) folds the doubly-generated new×new
    * candidates into one row before the distinct.
    */
  private[graft] def deltaPairs(o: DataFrame, n: DataFrame,
      maxBucket: Int): DataFrame = {
    val capped = graft.dedup.Dedup.capBuckets(
      variants(n).withColumn("__new", lit(true))
        .unionByName(variants(o).withColumn("__new", lit(false))),
      Seq(col("__v")), maxBucket)
    capped.filter(col("__new"))
      .select(col("rid").as("left_id"), col("rkey").as("left_key"),
        col("__v"))
      .join(capped.select(col("rid").as("right_id"),
        col("rkey").as("right_key"), col("__v")), Seq("__v"))
      .filter(col("left_id") =!= col("right_id"))
      .select(least(col("left_id"), col("right_id")).as("doc_a"),
        greatest(col("left_id"), col("right_id")).as("doc_b"),
        when(col("left_id") < col("right_id"), col("left_key"))
          .otherwise(col("right_key")).as("__ka"),
        when(col("left_id") < col("right_id"), col("right_key"))
          .otherwise(col("left_key")).as("__kb"))
      .distinct()
      .filter(levenshtein(col("__ka"), col("__kb")) <= 1)
      .select(col("doc_a"), col("doc_b"))
  }

  /** Exploded deletion-neighborhood variants of a normalized registry —
    * the blocking frame [[Joins.fuzzyJoin]] builds per side, exposed so
    * the delta path can cap on union block sizes before splitting sides.
    */
  private def variants(base: DataFrame): DataFrame =
    base.select(col("rid"), col("rkey"))
      .withColumn("__v", explode(Joins.deletionNeighborhood(col("rkey"))))

  /** The persisted match-edge frame a delta run consumes: run once on the
    * initial corpus, then keep unioning each increment's delta edges.
    */
  def matchEdges(records: DataFrame, id: Column, key: Column,
      maxBucket: Int = 1000): DataFrame =
    matchPairs(records.select(id.cast("long").as("rid"), key.as("rkey")),
      maxBucket)

  /** The per-record entity assignment behind [[goldenRecords]] —
    * `(rid, entity_id)`, singletons surviving as their own entity — for
    * callers that need the PARTITION rather than the survivor rows:
    * evaluation ([[Evaluation.bcubed]]), per-entity joins back onto the
    * raw registry, audit sampling. Same blocking, cap, and closure as
    * the golden-record face, so the two can never disagree on who
    * merged with whom.
    */
  def entityAssignments(records: DataFrame, id: Column, key: Column,
      maxBucket: Int = 1000): DataFrame = {
    val base = records.select(id.cast("long").as("rid"), key.as("rkey"))
    val clusters = graft.dedup.Dedup.duplicateClusters(
        matchPairs(base, maxBucket))
      .select(col("doc_id").as("rid"), col("cluster_id"))
    base.join(clusters, Seq("rid"), "left")
      .select(col("rid"),
        coalesce(col("cluster_id"), col("rid")).as("entity_id"))
  }

  private def normalized(records: DataFrame, id: Column, key: Column,
      value: Column): DataFrame =
    records.select(id.cast("long").as("rid"), key.as("rkey"),
      value.cast("double").as("rval"))

  /** Verified match edges (rid_a < rid_b) of a normalized registry. */
  private[analytics] def matchPairs(base: DataFrame, maxBucket: Int): DataFrame =
    Joins.fuzzyJoin(base, col("rid"), col("rkey"),
        base, col("rid"), col("rkey"), maxBucket)
      .filter(col("left_id") < col("right_id"))
      .select(col("left_id").as("doc_a"), col("right_id").as("doc_b"))

  /** Sorted-neighborhood blocking audit (Hernández & Stolfo's SNM):
    * order the registry by the dirty key itself and take every pair
    * within a rank window of `w` — the classic alternative to hash/
    * truncation blocking, catching variants that sort ADJACENTLY (typo
    * in the tail of the key) which a truncated-prefix block can miss,
    * and missing head-typos that hash blocking catches; run both audits
    * ([[graft.analytics.Valuation.blockingAudit]] is the hash side) and
    * read completeness side by side before picking a blocker.
    *
    * The global rank is the DISTRIBUTED PREFIX SCAN (range partition +
    * local row_number + |partitions|-sized offset frame — the
    * [[graft.sampling.Sharding.assignShards]] shape; never a
    * single-partition window), candidates come from a keyed equi-join of
    * rank against rank+d for d in 1..w−1 (exactly n·(w−1) − edge rows,
    * bounded by construction), and true pairs come from the size
    * histogram, never enumeration.
    */
  def sortedNeighborhood(records: DataFrame, id: Column, key: Column,
      truth: Column, window: Int = 5,
      partitions: Int = 32): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    import org.apache.spark.sql.expressions.Window
    val base = records.select(id.cast("long").as("rid"), key.as("__k"),
        truth.as("__t"))
      .repartitionByRange(partitions, col("__k"), col("rid"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true) // offsets and the scan both read it
    val offs = base.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__pc"))
      .withColumn("__off",
        coalesce(sum(col("__pc")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    val local = Window.partitionBy(col("__pid"))
      .orderBy(col("__k").asc, col("rid").asc)
    val ranked = base
      .withColumn("__lr", row_number().over(local).cast("long"))
      .join(broadcast(offs), Seq("__pid"))
      .select(col("rid"), col("__t"), (col("__lr") + col("__off")).as("__r"))
    val probes = ranked
      .select(col("__r"), col("__t").as("__ta"))
      .withColumn("__d", explode(array((1 until window).map(lit): _*)))
      .select((col("__r") + col("__d")).as("__r"), col("__ta"))
    val pairCounts = probes
      .join(ranked.select(col("__r"), col("__t").as("__tb")), Seq("__r"))
      .agg(count(lit(1)).as("candidate_pairs"),
        sum(when(col("__ta") === col("__tb"), 1L).otherwise(0L))
          .as("covered_pairs"))
    val tru = base.groupBy(col("__t")).agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum((col("__c") * (col("__c") - 1L) / lit(2L))
        .cast("long")), lit(0L)).as("true_pairs"))
    // an all-unique truth or a 1-record registry reads NULL ratios, not
    // an ANSI divide-by-zero crash
    def ratio(a: Column, b: Column): Column =
      round(when(b =!= 0L, a.cast("double") / b.cast("double")), 6)
    base.agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(pairCounts)).crossJoin(broadcast(tru))
      .select(col("n"), lit(window).as("window_size"),
        col("candidate_pairs"), col("covered_pairs"), col("true_pairs"),
        ratio(col("covered_pairs"), col("true_pairs"))
          .as("pairs_completeness"),
        ratio(col("covered_pairs"), col("candidate_pairs"))
          .as("pairs_quality"))
  }

  /** Closure + survivorship over a normalized registry and its edges. */
  private def survivorship(base: DataFrame, pairs: DataFrame): DataFrame = {
    val clusters = graft.dedup.Dedup.duplicateClusters(pairs)
      .select(col("doc_id").as("rid"), col("cluster_id"))
    base.join(clusters, Seq("rid"), "left")
      .withColumn("entity_id", coalesce(col("cluster_id"), col("rid")))
      .groupBy(col("entity_id"))
      .agg(count(lit(1)).as("n_records"),
        min_by(col("rkey"), col("rid")).as("canonical_key"),
        max_by(col("rkey"),
          concat(lpad(length(col("rkey")).cast("string"), 4, "0"),
            col("rkey"))).as("longest_key"),
        round(sum(col("rval")), 2).as("total_value"))
  }
}
