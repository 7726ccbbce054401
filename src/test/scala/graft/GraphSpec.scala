package graft

import org.apache.spark.sql.functions._

import graft.analytics.Graph

/** Fixed-point PageRank: ordering on a known graph, mass conservation,
  * dangling redistribution, and partitioning-independence (the property the
  * integer formulation exists to guarantee).
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000L

  private def ranks(edges: Seq[(String, String)], iters: Int,
      parts: Int = 4): Map[String, Long] =
    Graph.pageRank(edges.toDF("src", "dst").repartition(parts),
        col("src"), col("dst"), iters, Scale)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("hub of a star graph outranks the spokes") {
    // a, c, d all cite b; b cites a — b should dominate, a second
    val out = ranks(Seq("a" -> "b", "c" -> "b", "d" -> "b", "b" -> "a"), 5)
    assert(out.keySet === Set("a", "b", "c", "d"))
    assert(out("b") > out("a"))
    assert(out("a") > out("c"))
    assert(out("c") === out("d")) // symmetric spokes tie exactly
  }

  test("total mass is conserved up to integer-truncation dust") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "c" -> "b", "d" -> "a")
    val iters = 5
    val out = ranks(edges, iters)
    val n = out.size
    val total = out.values.sum
    // per round the DIV ops can only LOSE mass: <= deg-1 per sharing node,
    // <= 99 per node at the damping DIV, <= n-1 at the dangling split
    val dust = iters.toLong * (edges.size + 101L * n + n) + n
    assert(total <= Scale)
    assert(total >= Scale - dust)
  }

  test("dangling mass redistributes uniformly") {
    // b has no out-edges: its whole rank is dangling mass each round
    val out = ranks(Seq("a" -> "b"), 1)
    val init = Scale / 2
    val base = (15L * init) / 100L
    // a receives only the dangling share; b receives a's full rank too
    val expectA = base + (85L * (init / 2)) / 100L
    val expectB = base + (85L * (init + init / 2)) / 100L
    assert(out("a") === expectA)
    assert(out("b") === expectB)
  }

  test("ranks are exactly partitioning-independent") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "c" -> "b",
      "d" -> "a", "d" -> "c", "a" -> "d")
    assert(ranks(edges, 4, parts = 1) === ranks(edges, 4, parts = 7))
  }

  test("multi-edges weight the contribution") {
    // a cites b twice and c once: b gets 2/3 of a's shared rank
    val out = ranks(Seq("a" -> "b", "a" -> "b", "a" -> "c"), 1)
    assert(out("b") > out("c"))
  }

  private def converged(edges: Seq[(String, String)], maxIter: Int,
      epsilonFp: Long = 0L): (Map[String, Long], Int) = {
    val (df, rounds) = Graph.pageRankConverged(edges.toDF("src", "dst"),
      col("src"), col("dst"), maxIter, epsilonFp, Scale)
    (df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap, rounds)
  }

  test("symmetric cycle stops after one round at the exact fixed point") {
    // 2-cycle: the uniform init IS the fixed point, so round 1's delta is
    // exactly 0 and the loop stops 9 rounds short of the cap
    val (out, rounds) = converged(Seq("a" -> "b", "b" -> "a"), maxIter = 10)
    assert(rounds === 1)
    assert(out === Map("a" -> Scale / 2, "b" -> Scale / 2))
  }

  test("star graph stops early at an exact integer fixed point") {
    val edges = Seq("a" -> "b", "c" -> "b", "d" -> "b", "b" -> "a")
    val (out, rounds) = converged(edges, maxIter = 200)
    assert(rounds < 200)
    // lossless stop: the converged face reproduces the fixed-round face
    // run for the same number of rounds, bit for bit
    assert(out === ranks(edges, rounds))
    // and one more fixed round does not move any rank
    assert(out === ranks(edges, rounds + 1))
  }

  test("still-moving chain runs to the iteration cap") {
    val edges = Seq("a" -> "b", "b" -> "c")
    val (out, rounds) = converged(edges, maxIter = 3)
    assert(rounds === 3)
    assert(out === ranks(edges, 3))
  }

  test("epsilon in fixed-point units stops once movement falls below it") {
    // with a loose epsilon the chain stops before the cap; the exact
    // (epsilon 0) run at the same cap keeps moving
    val edges = Seq("a" -> "b", "b" -> "c")
    val (_, loose) = converged(edges, maxIter = 50, epsilonFp = Scale / 100)
    assert(loose < 50)
  }

  private def ppr(edges: Seq[(String, String)], seeds: Seq[String], iters: Int,
      parts: Int = 4): Map[String, Long] =
    Graph.personalizedPageRank(edges.toDF("src", "dst").repartition(parts),
        col("src"), col("dst"), seeds, iters, Scale)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("x95 personalized PageRank: hand-traced two rounds, exact fixed point") {
    // a -> b, seed {a}: round 1 a=base=1.5e8, b=0.85e9; round 2 the
    // dangling b-mass teleports back to the seed
    val out = ppr(Seq("a" -> "b"), Seq("a"), iters = 2)
    assert(out === Map("a" -> 872500000L, "b" -> 127500000L))
    assert(out.values.sum === Scale) // mass conserved exactly here
  }

  test("x95 personalized PageRank concentrates rank near the seed") {
    // symmetric triangle: uniform PR is symmetric, PPR is not
    val tri = Seq("a" -> "b", "b" -> "a", "b" -> "c", "c" -> "b",
      "a" -> "c", "c" -> "a")
    val out = ppr(tri, Seq("a"), iters = 8)
    assert(out("a") > out("b") && out("b") === out("c"),
      s"seed must dominate, non-seeds symmetric: $out")
    val uniform = ranks(tri, iters = 8)
    assert(uniform("a") === uniform("b"), "sanity: unpersonalized is symmetric")
  }

  test("x95 personalized PageRank is partitioning-independent") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c", "d" -> "a")
    assert(ppr(edges, Seq("a", "d"), 5, parts = 1) ===
      ppr(edges, Seq("a", "d"), 5, parts = 7))
  }

  test("x95 personalized PageRank fails loudly on a seed missing from the graph") {
    intercept[IllegalArgumentException] {
      ppr(Seq("a" -> "b"), Seq("zz"), iters = 1)
    }
  }

  test("x139 modularity: two bridged triangles at the textbook Q") {
    // two triangles joined by one bridge edge: 7 undirected edges, 2m = 14.
    // Partition = the triangles: internal ends 6 each, degree sums 7 each
    // -> Q_c = 6/14 - (7/14)^2 = 0.178571 per side (Q = 0.357142, real
    // structure); singletons on node c: 0 - (3/14)^2 = -0.045918
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a",
      "d" -> "e", "e" -> "f", "f" -> "d", "c" -> "d").toDF("s", "d")
    val labels = Seq("a" -> "T1", "b" -> "T1", "c" -> "T1",
      "d" -> "T2", "e" -> "T2", "f" -> "T2").toDF("node", "label")
    val got = Graph.modularity(edges, col("s"), col("d"), labels)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got === Map("T1" -> ((3L, 6L, 7L, 0.178571)),
      "T2" -> ((3L, 6L, 7L, 0.178571))))
    val single = labels.select(col("node"), col("node").as("label"))
    val gotS = Graph.modularity(edges, col("s"), col("d"), single)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(gotS("c") === -0.045918 && gotS("a") === -0.020408)
  }

  test("x140 triangles: bridged triangles, multi-edge/self-loop immune") {
    // same two bridged triangles; duplicate one edge and add a self-loop —
    // the simple-graph dedup must make both invisible
    val edges = Seq("a" -> "b", "b" -> "a", "a" -> "a", "b" -> "c",
      "c" -> "a", "d" -> "e", "e" -> "f", "f" -> "d", "c" -> "d")
      .toDF("s", "d")
    val got = Graph.triangles(edges, col("s"), col("d")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_
          .asInstanceOf[Double])))).toMap
    // every node closes exactly its own triangle; bridge ends c,d have
    // degree 3 → clustering 2·1/(3·2) = 0.333333, the rest 2·1/(2·1) = 1
    assert(got("a") === ((2L, 1L, Some(1.0))))
    assert(got("c") === ((3L, 1L, Some(0.333333))))
    assert(got("d") === ((3L, 1L, Some(0.333333))))
    assert(got("f") === ((2L, 1L, Some(1.0))))
    // degree-1 pendant: zero triangles, null coefficient (d(d−1) = 0)
    val pend = Graph.triangles(Seq("x" -> "y").toDF("s", "d"),
      col("s"), col("d")).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.isNullAt(3)))).toMap
    assert(pend === Map("x" -> ((0L, true)), "y" -> ((0L, true))))
  }

  test("x141 hits: matches an independent integer fold; sink hub is 0") {
    val edges = Seq("a" -> "b", "a" -> "c", "b" -> "c", "d" -> "a")
      .toDF("s", "d")
    val scale = 1000000L
    // independent driver-side replay of the documented integer recurrence
    val out = Seq("a" -> "b", "a" -> "c", "b" -> "c", "d" -> "a")
    val nodes = Seq("a", "b", "c", "d")
    var hub = nodes.map(_ -> scale / nodes.size).toMap
    var auth = Map.empty[String, Long]
    for (_ <- 1 to 3) {
      val ar = out.groupBy(_._2).view.mapValues(_.map(e => hub(e._1)).sum)
      val at = ar.values.sum
      auth = nodes.map(n => n -> ar.getOrElse(n, 0L) * scale / at).toMap
      val hr = out.groupBy(_._1).view.mapValues(_.map(e => auth(e._2)).sum)
      val ht = hr.values.sum
      hub = nodes.map(n => n -> hr.getOrElse(n, 0L) * scale / ht).toMap
    }
    val got = Graph.hits(edges, col("s"), col("d"), rounds = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === nodes.map(n => n -> ((hub(n), auth(n)))).toMap)
    assert(got("c")._1 === 0L)          // no out-edges → pure authority
    assert(got("d")._2 === 0L)          // no in-edges → pure hub
  }

  test("x143 assortativity: star is −1, regular graph is null") {
    val star = Seq("c" -> "l1", "c" -> "l2", "c" -> "l3").toDF("s", "d")
    val r = Graph.assortativity(star, col("s"), col("d")).head()
    assert(r.getLong(0) === 6L && r.getDouble(1) === -1.0)
    val tri = Seq("a" -> "b", "b" -> "c", "c" -> "a").toDF("s", "d")
    val rt = Graph.assortativity(tri, col("s"), col("d")).head()
    assert(rt.getLong(0) === 6L && rt.isNullAt(1)) // zero degree variance
  }
}
