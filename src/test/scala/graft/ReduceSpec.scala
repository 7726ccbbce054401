package graft

import org.apache.spark.sql.functions._

import graft.similarity.{Reduce, Similarity}

/** JL projection and per-dimension standardization. */
class ReduceSpec extends SparkSpec {
  import spark.implicits._

  test("jlProject emits one component per plane with the scaled dot product") {
    val planes = Similarity.deterministicPlanes(4, 3, seed = 5L)
    val v = Array(1.0f, 2.0f, -1.0f)
    val df = Seq((1L, v.toSeq)).toDF("vec_id", "embedding")
    val out = Reduce.jlProject(df, col("vec_id"), col("embedding"), planes)
      .collect().map(r => (r.getInt(1), r.getDouble(2))).toMap
    assert(out.size === 4)
    val inv = 1.0 / math.sqrt(4.0)
    planes.zipWithIndex.foreach { case (p, j) =>
      val expect = p.zip(v).map { case (a, b) => a * b.toDouble }.sum * inv
      assert(math.abs(out(j) - expect) < 1e-6, s"component $j")
    }
  }

  test("jlProject roughly preserves relative distances (JL property)") {
    val planes = Similarity.deterministicPlanes(32, 64, seed = 9L)
    // two deterministic far-apart vectors and one close pair
    def vec(seed: Int): Seq[Float] =
      (0 until 64).map(i => (((seed * 31 + i) % 7) - 3).toFloat)
    val close = vec(1).updated(0, vec(1).head + 0.1f)
    val df = Seq((1L, vec(1)), (2L, close), (3L, vec(2)))
      .toDF("vec_id", "embedding")
    val proj = Reduce.jlProject(df, col("vec_id"), col("embedding"), planes)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getInt(1)).map(_.getDouble(2))
      }
    def d(a: Seq[Double], b: Seq[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    // the near pair stays far nearer than the far pair after projection
    assert(d(proj(1L), proj(2L)) * 5 < d(proj(1L), proj(3L)))
  }

  test("standardizeDims matches hand-computed moments and guards std 0") {
    val df = Seq(
      (1L, Seq(1.0f, 7.0f)), (2L, Seq(2.0f, 7.0f)), (3L, Seq(3.0f, 7.0f)))
      .toDF("vec_id", "embedding")
    val out = Reduce.standardizeDims(df, col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val std0 = math.sqrt(2.0 / 3.0)
    assert(math.abs(out((1L, 0)) - (-1.0 / std0)) < 1e-4)
    assert(math.abs(out((2L, 0)) - 0.0) < 1e-4)
    assert(math.abs(out((3L, 0)) - (1.0 / std0)) < 1e-4)
    // constant dimension: std 0 maps to z = 0, not a division blow-up
    assert(out((1L, 1)) === 0.0)
    assert(out((3L, 1)) === 0.0)
  }

  test("jlProject is a pure projection: zero exchanges in the plan") {
    val planes = Similarity.deterministicPlanes(8, 4, seed = 3L)
    val df = (1 to 20).map(i => (i.toLong,
      Seq(i.toFloat, 1f, 2f, 3f))).toDF("vec_id", "embedding")
    val plan = Reduce.jlProject(df, col("vec_id"), col("embedding"), planes)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"projection must not shuffle, plan:\n$plan")
  }

  test("standardizeDims shuffles only the dim-keyed stats aggregate") {
    val df = (1 to 20).map(i => (i.toLong,
      Seq(i.toFloat, 1f, 2f, 3f))).toDF("vec_id", "embedding")
    val plan = Reduce.standardizeDims(df, col("vec_id"), col("embedding"))
      .queryExecution.executedPlan.toString
    // one dim-keyed exchange for the 64-row stats; the join back is
    // broadcast — the corpus-sized frame never shuffles on vec_id
    val shuffles = plan.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange"))
    assert(shuffles === 1, s"expected 1 shuffle, plan:\n$plan")
  }

  test("standardized output has mean ~0 and std ~1 per dimension") {
    val df = (1 to 50).map(i => (i.toLong,
      Seq((i % 11).toFloat, (i % 5).toFloat * 3f + 1f))).toDF("vec_id", "embedding")
    val stats = Reduce.standardizeDims(df, col("vec_id"), col("embedding"))
      .groupBy(col("dim"))
      .agg(avg(col("z")).as("m"), stddev_pop(col("z")).as("sd"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    stats.values.foreach { case (m, sd) =>
      assert(math.abs(m) < 1e-3)
      assert(math.abs(sd - 1.0) < 1e-3)
    }
  }
}
