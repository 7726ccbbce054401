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

    var ranks = nodes.select(col("node"), lit(initFp).as("rank_fp"))
    var i = 0
    while (i < iterations) {
      val withDeg = ranks.join(deg, ranks("node") === deg("__src"), "left")
      // nodes with no out-edges: their whole rank is dangling mass
      val dangling = withDeg.filter(col("__deg").isNull)
        .agg(coalesce(sum(col("rank_fp")), lit(0L)).as("__dm"))
      val contrib = ed
        .join(withDeg.filter(col("__deg").isNotNull)
            .select(col("node").as("__cn"),
              expr("rank_fp DIV __deg").as("__share")),
          col("__src") === col("__cn"))
        .groupBy(col("__dst")).agg(sum(col("__share")).as("__in"))
        .select(col("__dst").as("node"), col("__in"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          expr(s"CAST($baseFp AS BIGINT) + ((CAST($dampNum AS BIGINT) * " +
            s"(coalesce(__in, CAST(0 AS BIGINT)) + (__dm DIV CAST($n AS BIGINT)))) DIV 100)")
            .as("rank_fp"))
        .localCheckpoint(true)
      i += 1
    }
    ranks
  }
}
