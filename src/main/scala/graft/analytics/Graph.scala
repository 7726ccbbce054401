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

  /** Per-node triangle count and local clustering coefficient over the
    * SIMPLE undirected graph induced by `edges` (self-loops dropped,
    * multi-edges collapsed — a triangle is a set of three mutually-linked
    * nodes, so multiplicity would double-count structure). Returns
    * `(node, degree, triangles, clustering)` with `clustering` =
    * 2T / (d(d−1)) at round-6 (null when d < 2) — the "is this node's
    * neighborhood a clique or a star?" audit that separates genuine topic
    * hubs (high clustering) from link-farm spokes (zero clustering) in
    * the domain graph.
    *
    * Scale shape — the degree-ordered orientation bound: each simple edge
    * is directed from its LOWER endpoint to its higher under the total
    * order (degree, node), and triangles enumerate as oriented wedges
    * `u→v, u→w (v ≺ w)` closed by `v→w`. Out-degree under this
    * orientation is ≤ O(√m) on any graph (the arboricity bound behind
    * every distributed triangle count), so wedge fan-out is
    * Σ outdeg² ≤ m·√m even when a raw hub has 10⁶ neighbors — orienting
    * by node id alone would hand a low-id hub its full degree as fan-out.
    * Three shuffles total: simple-edge dedup, the wedge self-join on the
    * low endpoint, and the closing-edge equi-join; per-node counts are
    * one explode of the triangle triples. All counts are exact longs.
    */
  def triangles(edges: DataFrame, src: Column, dst: Column): DataFrame = {
    val e0 = edges.select(src.cast("string").as("a"), dst.cast("string").as("b"))
      .filter(col("a") =!= col("b"))
    // canonical simple edges (lo, hi) by node id — dedup only
    val simple = e0.select(least(col("a"), col("b")).as("lo"),
      greatest(col("a"), col("b")).as("hi")).distinct()
      .localCheckpoint(true)
    val deg = simple.select(col("lo").as("node"))
      .unionByName(simple.select(col("hi").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
      .localCheckpoint(true)
    // orient lo→hi under the (degree, node) total order
    val oriented = simple
      .join(deg.select(col("node").as("lo"), col("degree").as("__dl")), "lo")
      .join(deg.select(col("node").as("hi"), col("degree").as("__dh")), "hi")
      .select(
        when(struct(col("__dl"), col("lo")) < struct(col("__dh"), col("hi")),
          col("lo")).otherwise(col("hi")).as("u"),
        when(struct(col("__dl"), col("lo")) < struct(col("__dh"), col("hi")),
          col("hi")).otherwise(col("lo")).as("v"))
      .localCheckpoint(true)
    // wedges u→v, u→w with v ≺ w (plain id order suffices once both are
    // ABOVE u in the degree order: each triangle forms exactly one wedge)
    val wedges = oriented.select(col("u"), col("v"))
      .join(oriented.select(col("u"), col("v").as("w")), Seq("u"))
      .filter(col("v") < col("w"))
    // closing edge: the wedge's (v, w) is id-ordered, so canonicalize the
    // oriented edges back to id order and semi-join on the two-key
    // EQUALITY (an OR over both orientations would deny Spark its hash
    // join and fall to a nested loop)
    val closing = oriented.select(least(col("u"), col("v")).as("v"),
      greatest(col("u"), col("v")).as("w"))
    val tri = wedges.join(closing, Seq("v", "w"), "leftsemi")
    val perNode = tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("node"), "left")
      .na.fill(0L, Seq("triangles"))
      .select(col("node"), col("degree"), col("triangles"),
        when(col("degree") >= 2,
          round(lit(2.0) * col("triangles").cast("double") /
            (col("degree") * (col("degree") - 1)).cast("double"), 6))
          .as("clustering"))
  }

  /** HITS hubs-and-authorities after `rounds` synchronous rounds over the
    * DIRECTED multigraph (multi-edges act as weights, the [[pageRank]]
    * convention) — the bipartite companion to PageRank for crawl frontier
    * curation: a good HUB (links to many authorities) is a harvest page,
    * a good AUTHORITY (linked from many hubs) is a content page, and the
    * two scores separate those roles where PageRank conflates them.
    *
    * Determinism contract: scores are fixed-point longs, L1-normalized
    * each half-round by `v · scale DIV total` — integer ops only, so the
    * result is bit-identical at any partitioning and replayable in SQL
    * (classic HITS L2-normalizes, but any positive normalization yields
    * the same RANKING each round, and L1 keeps the arithmetic exact).
    * Overflow budget: `raw ≤ scale · maxdeg`, so `raw · scale` needs
    * `scale² · maxdeg < 2⁶³` — enforced against the measured max degree
    * (one bounded aggregate at prepare time; default scale 10⁶ admits
    * maxdeg up to ~9·10⁶).
    *
    * Scale shape per round: two keyed join+sum passes (hub mass forward
    * over edges, authority mass back) plus one broadcast scalar each —
    * the same two-shuffle round as [[pageRank]], lineage truncated per
    * round.
    */
  def hits(edges: DataFrame, src: Column, dst: Column, rounds: Int,
      scale: Long = 1000000L): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val ed = edges.select(src.cast("string").as("src"),
      dst.cast("string").as("dst")).localCheckpoint(true)
    val nodes = ed.select(col("src").as("node"))
      .union(ed.select(col("dst").as("node"))).distinct().localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "hits needs at least one node")
    require(n <= scale, s"node count $n exceeds fixed-point scale $scale")
    val maxDeg = ed.select(col("src").as("k"))
      .unionByName(ed.select(col("dst").as("k")))
      .groupBy(col("k")).agg(count(lit(1)).as("d"))
      .agg(max(col("d"))).head().getLong(0)
    require(scale <= Long.MaxValue / scale / math.max(maxDeg, 1L),
      s"overflow: scale^2 * maxdeg = $scale^2 * $maxDeg exceeds Long range")
    def normalized(raw: DataFrame): DataFrame = {
      // L1 fixed-point renormalization; total > 0 whenever any edge exists
      val tot = raw.agg(sum(col("__raw")).as("__tot"))
      nodes.join(raw, Seq("node"), "left")
        .crossJoin(broadcast(tot))
        .select(col("node"),
          expr("coalesce(__raw, CAST(0 AS BIGINT)) * " +
            s"CAST($scale AS BIGINT) DIV __tot").as("score_fp"))
        .localCheckpoint(true)
    }
    var hubs = nodes.select(col("node"), lit(scale / n).as("score_fp"))
      .localCheckpoint(true)
    var auths: DataFrame = null
    var r = 0
    while (r < rounds) {
      auths = normalized(ed
        .join(hubs.select(col("node").as("src"), col("score_fp")), Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum(col("score_fp")).as("__raw")))
      hubs = normalized(ed
        .join(auths.select(col("node").as("dst"), col("score_fp")), Seq("dst"))
        .groupBy(col("src").as("node")).agg(sum(col("score_fp")).as("__raw")))
      r += 1
    }
    hubs.select(col("node"), col("score_fp").as("hub_fp"))
      .join(auths.select(col("node"), col("score_fp").as("auth_fp")),
        Seq("node"))
  }

  /** Degree assortativity of the undirected multigraph: the Pearson
    * correlation between the degrees at the two ends of every edge —
    * POSITIVE r = hubs link to hubs (social/collab graphs), NEGATIVE =
    * hubs link to leaves (the web's hub-and-spoke shape). One scalar row
    * `(m_ends, r)` — the one-number structural fingerprint that says
    * whether a crawl graph looks organic or like a star-shaped link farm.
    *
    * Exactness: over the symmetrized edge-end list the x and y marginals
    * coincide, so r = (k·Σxy − Σx·Σy) / (k·Σx² − (Σx)²) from FOUR integer
    * sums (degrees and their products are longs; Σx²·k stays within Long
    * for maxdeg²·ends < 2⁶³, the same budget class as [[hits]]) — the
    * only floating step is the final division, so the result is
    * bit-identical at any partitioning. Scale shape: one degree
    * aggregate, two node-keyed joins onto the edge list, one global
    * 4-sum reduce. Returns null r on a regular graph (zero variance).
    */
  def assortativity(edges: DataFrame, src: Column, dst: Column): DataFrame = {
    val e0 = edges.select(src.cast("string").as("src"),
      dst.cast("string").as("dst"))
    val und = e0.unionByName(e0.select(col("dst").as("src"),
      col("src").as("dst"))).localCheckpoint(true)
    val deg = und.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("d")).localCheckpoint(true)
    val ends = und
      .join(deg.select(col("node").as("src"), col("d").as("dx")), "src")
      .join(deg.select(col("node").as("dst"), col("d").as("dy")), "dst")
    val s = ends.agg(count(lit(1)).as("k"), sum(col("dx")).as("sx"),
      sum(col("dx") * col("dx")).as("sxx"),
      sum(col("dx") * col("dy")).as("sxy"))
    s.select(col("k").as("m_ends"),
      when(col("k") * col("sxx") - col("sx") * col("sx") =!= 0L,
        round((col("k") * col("sxy") - col("sx") * col("sx")).cast("double") /
          (col("k") * col("sxx") - col("sx") * col("sx")).cast("double"), 6))
        .as("assortativity"))
  }
}
