package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph analytics on edge frames. Companion to the
  * pointer-jumping connected components in [[graft.dedup.Dedup]]: where CC
  * labels duplicate clusters, PageRank scores node authority — the
  * corpus-curation signal behind domain-level quality weighting (a page on
  * a well-linked domain is worth more than one on a link farm).
  *
  * Determinism: ranks are FIXED-POINT LONGS (`scale` = 1.0). Every per-round
  * operation — share split, damping, dangling redistribution — is integer
  * arithmetic (`DIV`, `*`, `+`), so per-node ranks are exact integers,
  * independent of partitioning and merge order, and bit-identical in any
  * engine that mirrors the same integer ops. A double formulation would
  * accumulate merge-order jitter across rounds and make cross-engine
  * comparison a tolerance judgement; the fixed-point form makes it a hash
  * match. Truncation dust (≤ 1 unit per node per round at scale 10⁻⁹)
  * vanishes into the rank ordering.
  *
  * Scale shape per round: one (src)-keyed join of ranks onto edges, one
  * (dst)-keyed contribution sum (map-side partials), one broadcast scalar
  * for the dangling mass — the same two-shuffle round as distributed
  * PageRank on any engine, with `localCheckpoint` keeping lineage O(1)
  * across rounds exactly like the CC loop.
  */
object Graph {

  /** Damped PageRank after `iterations` synchronous rounds over directed
    * `edges` (multi-edges act as weights: a node's rank share flows once
    * per edge occurrence, out of an occurrence-counted degree). Returns
    * `(node, rank_fp)` with `rank_fp` the exact fixed-point rank
    * (`scale` ≡ total mass 1.0); dangling-node mass (no out-edges)
    * redistributes uniformly each round, so total mass is conserved up to
    * integer-truncation dust.
    *
    * The node count is a driver-side scalar (one narrow count over the
    * distinct-node frame — the same bounded-action class as
    * [[graft.similarity.Similarity.planeCountFor]]); everything else stays
    * distributed.
    */
  def pageRank(edges: DataFrame, src: Column, dst: Column, iterations: Int,
      scale: Long = 1000000000L, dampNum: Long = 85L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val st = prepare(edges, src, dst, scale, dampNum)
    var ranks = st.nodes.select(col("node"), lit(st.initFp).as("rank_fp"))
    var i = 0
    while (i < iterations) {
      // eager checkpoint per round, MEASURED against a lazy-persist
      // alternative: each round's frame is consumed TWICE by the next
      // (dangling subtree + contributions), and with a lazy cache those
      // two consumers race to compute the same partitions before the
      // blocks land (RDD caching has no cross-task compute lock), which
      // benched ~30% slower than paying the per-round barrier.
      ranks = step(ranks, st, dampNum)
      i += 1
    }
    ranks
  }

  /** [[pageRank]] with EXACT early termination: runs synchronous rounds
    * until the total absolute rank change `sum(abs(rank − prev_rank))` is
    * ≤ `epsilonFp` (fixed-point units; 0 = the exact fixed point), capped
    * at `maxIter`. Returns `(ranks, roundsRun)`.
    *
    * The integer fixed-point formulation is what makes this a convergence
    * TEST rather than a tolerance judgement: once two consecutive rounds
    * agree bit-for-bit the iteration is at a true fixed point and every
    * further round reproduces it, so stopping is lossless. Cost per round
    * over [[pageRank]]: one self-join of consecutive rank frames (both
    * already checkpointed, co-partitioned on `node` by the producing
    * joins) reduced to a single driver scalar — the same bounded-action
    * class as the node count.
    */
  def pageRankConverged(edges: DataFrame, src: Column, dst: Column,
      maxIter: Int, epsilonFp: Long = 0L, scale: Long = 1000000000L,
      dampNum: Long = 85L): (DataFrame, Int) = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    require(epsilonFp >= 0L, s"epsilonFp must be >= 0, got $epsilonFp")
    val st = prepare(edges, src, dst, scale, dampNum)
    var ranks = st.nodes.select(col("node"), lit(st.initFp).as("rank_fp"))
      .localCheckpoint(true)
    var i = 0
    var converged = false
    while (i < maxIter && !converged) {
      val next = step(ranks, st, dampNum)
      val delta = next
        .join(ranks.select(col("node"), col("rank_fp").as("__prev")),
          Seq("node"))
        .agg(sum(abs(col("rank_fp") - col("__prev"))).as("__delta"))
        .first().getLong(0)
      ranks = next
      i += 1
      if (delta <= epsilonFp) converged = true
    }
    (ranks, i)
  }

  /** Checkpointed edge/node/degree frames plus the fixed-point constants
    * shared by both PageRank faces.
    */
  private case class Prepared(ed: DataFrame, nodes: DataFrame,
    deg: DataFrame, n: Long, initFp: Long, baseFp: Long)

  /** Personalized PageRank: teleport (and dangling) mass restarts
    * uniformly over `seeds` instead of over all nodes — rank becomes
    * "authority AS SEEN FROM the seed set", the standard
    * relevance-propagation tool (seed a few trusted domains and the
    * scores rank every other domain by linked-trust distance; seed a
    * topic's hub pages and you have topical corpus weighting). Same
    * integer fixed-point contract as [[pageRank]]: per-round ops are
    * exact long arithmetic, bit-identical at any partitioning and
    * replayable in SQL.
    *
    * Update per round, mirrored literally in the oracle:
    * {{{
    *   seed:     base + (damp · (in + dm DIV |seeds|)) DIV 100
    *   non-seed:        (damp ·  in                  ) DIV 100
    * }}}
    * with `base = ((100−damp) · (scale DIV |seeds|)) DIV 100` and `dm`
    * the dangling mass. Every seed must be a node of the graph (checked
    * with one bounded count — a missing seed would silently leak its
    * share of every round's teleport mass).
    *
    * Scale shape per round: identical to [[pageRank]] — the seed test is
    * a broadcast-literal `isin` (seed sets are small by construction;
    * for a corpus-sized personalization vector, join a seed frame
    * instead).
    */
  def personalizedPageRank(edges: DataFrame, src: Column, dst: Column,
      seeds: Seq[String], iterations: Int, scale: Long = 1000000000L,
      dampNum: Long = 85L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(seeds.nonEmpty, "personalizedPageRank needs at least one seed")
    require(seeds.distinct == seeds, s"duplicate seeds: $seeds")
    val st = prepare(edges, src, dst, scale, dampNum)
    val s = seeds.length.toLong
    val present = st.nodes.filter(col("node").isin(seeds: _*)).count()
    require(present == s,
      s"only $present of ${seeds.length} seeds are nodes of the graph")
    val isSeed = col("node").isin(seeds: _*)
    val seedInit = scale / s
    val seedBase = ((100L - dampNum) * seedInit) / 100L
    var ranks = st.nodes.select(col("node"),
        when(isSeed, lit(seedInit)).otherwise(lit(0L)).as("rank_fp"))
      .localCheckpoint(true)
    var i = 0
    while (i < iterations) {
      val withDeg = ranks.join(st.deg, ranks("node") === st.deg("__src"), "left")
      val dangling = withDeg.filter(col("__deg").isNull)
        .agg(coalesce(sum(col("rank_fp")), lit(0L)).as("__dm"))
      val contrib = st.ed
        .join(withDeg.filter(col("__deg").isNotNull)
            .select(col("node").as("__cn"),
              expr("rank_fp DIV __deg").as("__share")),
          col("__src") === col("__cn"))
        .groupBy(col("__dst")).agg(sum(col("__share")).as("__in"))
        .select(col("__dst").as("node"), col("__in"))
      ranks = st.nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          when(isSeed,
            expr(s"CAST($seedBase AS BIGINT) + ((CAST($dampNum AS BIGINT) * " +
              s"(coalesce(__in, CAST(0 AS BIGINT)) + (__dm DIV CAST($s AS BIGINT)))) DIV 100)"))
            .otherwise(
              expr(s"(CAST($dampNum AS BIGINT) * coalesce(__in, CAST(0 AS BIGINT))) DIV 100"))
            .as("rank_fp"))
        .localCheckpoint(true)
      i += 1
    }
    ranks
  }

  private def prepare(edges: DataFrame, src: Column, dst: Column,
      scale: Long, dampNum: Long): Prepared = {
    require(dampNum >= 0 && dampNum <= 100,
      s"dampNum must be a percentage in [0,100], got $dampNum")
    require(scale >= 100, s"scale must be >= 100, got $scale")
    val ed = edges.select(src.cast("string").as("__src"),
      dst.cast("string").as("__dst")).localCheckpoint(true)
    val nodes = ed.select(col("__src").as("node"))
      .union(ed.select(col("__dst").as("node")))
      .distinct().localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "pageRank needs at least one node")
    require(n <= scale,
      s"node count $n exceeds fixed-point scale $scale — every initial " +
        "rank would truncate to 0; raise `scale` above the node count")
    val initFp = scale / n
    val baseFp = ((100L - dampNum) * initFp) / 100L
    val deg = ed.groupBy(col("__src")).agg(count(lit(1)).as("__deg"))
      .localCheckpoint(true)
    Prepared(ed, nodes, deg, n, initFp, baseFp)
  }

  /** One synchronous PageRank round — the shared loop body of
    * [[pageRank]] and [[pageRankConverged]]. `eager = true` checkpoints
    * the round (truncating lineage, blocking the driver); `eager = false`
    * lazily persists it — either way the round's frame evaluates once
    * even though the next round references it twice.
    */
  private def step(ranks: DataFrame, st: Prepared, dampNum: Long,
      eager: Boolean = true): DataFrame = {
    val withDeg = ranks.join(st.deg, ranks("node") === st.deg("__src"), "left")
    // nodes with no out-edges: their whole rank is dangling mass
    val dangling = withDeg.filter(col("__deg").isNull)
      .agg(coalesce(sum(col("rank_fp")), lit(0L)).as("__dm"))
    val contrib = st.ed
      .join(withDeg.filter(col("__deg").isNotNull)
          .select(col("node").as("__cn"),
            expr("rank_fp DIV __deg").as("__share")),
        col("__src") === col("__cn"))
      .groupBy(col("__dst")).agg(sum(col("__share")).as("__in"))
      .select(col("__dst").as("node"), col("__in"))
    val next = st.nodes.join(contrib, Seq("node"), "left")
      .crossJoin(broadcast(dangling))
      .select(col("node"),
        expr(s"CAST(${st.baseFp} AS BIGINT) + ((CAST($dampNum AS BIGINT) * " +
          s"(coalesce(__in, CAST(0 AS BIGINT)) + (__dm DIV CAST(${st.n} AS BIGINT)))) DIV 100)")
          .as("rank_fp"))
    if (eager) next.localCheckpoint(true)
    else next.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Synchronous label propagation — community detection on an undirected
    * graph, the clustering companion to [[pageRank]]'s authority scoring:
    * domains that co-cite each other collapse into one community label,
    * which is the corpus-curation grouping behind per-community sampling
    * caps (a link farm is one community, however many domains it spans).
    *
    * Every node starts labeled with itself; each round every node adopts
    * the most frequent label among its neighbors, ties broken by SMALLEST
    * label — both resolved by a single `min(struct(−count, label))`
    * aggregate, so a round is two keyed shuffles (join labels onto edges,
    * per-node argmax) with NO window and no driver-side state, and the
    * update is exact string/integer logic: bit-identical at any
    * partitioning, replayable round-for-round in SQL (the [[pageRank]]
    * determinism contract).
    *
    * Rounds are capped by `rounds`; a round that changes no label is a
    * fixed point (the update is a pure function of the label frame, so
    * every later round would repeat it) and the loop stops early —
    * result-identical to running the full cap, which is what the oracle
    * replays. Synchronous LPA can oscillate with period 2 (a star flips
    * center/leaf labels forever); the cap bounds that, and determinism
    * makes the capped result stable. Edges are symmetrized internally;
    * multi-edges act as weights.
    */
  def labelPropagation(edges: DataFrame, src: Column, dst: Column,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e0 = edges.select(src.cast("string").as("src"),
      dst.cast("string").as("dst"))
    val und = e0.unionByName(e0.select(col("dst").as("src"),
      col("src").as("dst"))).localCheckpoint(true)
    var labels = und.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint(true)
    var r = 0
    var converged = false
    while (r < rounds && !converged) {
      val next = und
        .join(labels.select(col("node").as("src"), col("label")), Seq("src"))
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("node"))
        .agg(min(struct((-col("__c")).as("nc"), col("label").as("l"))).as("__m"))
        .select(col("node"), col("__m.l").as("label"))
        .localCheckpoint(true)
      converged = labels.select(col("node"), col("label").as("__prev"))
        .join(next, Seq("node"))
        .filter(col("__prev") =!= col("label"))
        .isEmpty
      labels = next
      r += 1
    }
    labels
  }

  /** Newman modularity of a community assignment over the undirected
    * multigraph induced by `edges` (each directed row contributes one
    * edge-end in each direction, so multi-edges act as weights — the
    * same convention as [[pageRank]] and [[labelPropagation]]). Per
    * community `c`: `Q_c = Σ_in/2m − (Σ_tot/2m)²` where `Σ_in` counts
    * edge-ends with BOTH endpoints in `c`, `Σ_tot` the degree sum, and
    * `2m` the total edge-end count; `Σ_c Q_c` is the classic modularity
    * — the "are these communities real structure or noise?" score that
    * turns [[labelPropagation]]'s output into a measurable quality claim
    * (Q near 0 = no better than random; web-graph communities land
    * ~0.3–0.7).
    *
    * All three counts are exact integers; the only floats are the final
    * two divisions (round-6). Scale shape: two node-keyed joins to label
    * the edge ends, then |communities|-sized aggregates — the same
    * two-shuffle round as one PageRank step, no new shape.
    */
  def modularity(edges: DataFrame, src: Column, dst: Column,
      labels: DataFrame): DataFrame = {
    val e0 = edges.select(src.cast("string").as("src"),
      dst.cast("string").as("dst"))
    val und = e0.unionByName(e0.select(col("dst").as("src"),
      col("src").as("dst"))).localCheckpoint(true)
    val lab = labels.select(col("node"), col("label"))
    val ends = und
      .join(lab.select(col("node").as("src"), col("label").as("__ls")), "src")
      .join(lab.select(col("node").as("dst"), col("label").as("__ld")), "dst")
    val m2 = und.agg(count(lit(1)).as("m2"))
    val inC = ends.filter(col("__ls") === col("__ld"))
      .groupBy(col("__ls").as("label")).agg(count(lit(1)).as("internal_ends"))
    val tot = ends.groupBy(col("__ls").as("label"))
      .agg(count(lit(1)).as("degree_sum"),
        count_distinct(col("src")).as("n_nodes"))
    tot.join(inC, Seq("label"), "left")
      .na.fill(0L, Seq("internal_ends"))
      .crossJoin(broadcast(m2))
      .select(col("label").as("community"), col("n_nodes"),
        col("internal_ends"), col("degree_sum"),
        round(col("internal_ends").cast("double") / col("m2").cast("double") -
          (col("degree_sum").cast("double") / col("m2").cast("double")) *
            (col("degree_sum").cast("double") / col("m2").cast("double")), 6)
          .as("contribution"))
  }
}
