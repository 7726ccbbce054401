package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space conditioning: dimensionality reduction and per-dimension
  * standardization — the preprocessing tier in front of the ANN/dedup
  * operators ([[Similarity]], [[graft.dedup.Dedup.cosinePairs]]). Reducing
  * 64 → 16 dims cuts every downstream dot product 4× and shrinks the
  * shuffled vector bytes the same factor; standardization stops a
  * high-variance dimension from dominating cosine/L2 geometry.
  *
  * Both are single-pass: the projection is a pure per-row expression (plane
  * matrix as plan constants), standardization is one dimension-keyed
  * aggregate broadcast back into a projection. Nothing here shuffles the
  * corpus.
  */
object Reduce {

  /** Johnson–Lindenstrauss random projection: `proj_j = ⟨v, plane_j⟩/√k`
    * for `k = planes.size` deterministic pseudo-random hyperplanes
    * ([[Similarity.deterministicPlanes]] — same generator the LSH buckets
    * use, so engines and runs agree bit-for-bit). With k ≈ O(ln n / ε²)
    * pairwise distances survive within 1±ε (the JL lemma), which is why a
    * 4× cheaper ANN pass over the projected space still finds the right
    * candidates for an exact verify in the original space.
    *
    * Output: `(vec_id, dim, val)` — one row per projected component,
    * `val` rounded to 6 dp for stable cross-engine comparison. A pure
    * projection: no shuffle, stays inside whole-stage codegen via the
    * native dot kernel.
    */
  def jlProject(df: DataFrame, id: Column, vec: Column,
      planes: Seq[Seq[Double]]): DataFrame = {
    require(planes.nonEmpty, "jlProject needs at least one plane")
    val inv = 1.0 / math.sqrt(planes.size.toDouble)
    val v = Similarity.asDouble(vec)
    val comps = planes.map { p =>
      round(Similarity.dot(v, array(p.map(lit): _*)) * lit(inv), 6)
    }
    df.select(id.as("vec_id"),
        posexplode(array(comps: _*)).as(Seq("dim", "val")))
  }

  /** Per-dimension z-score standardization: `(x - mean_d) / std_d` over the
    * corpus, emitted as `(vec_id, dim, z)` rows rounded to 6 dp.
    *
    * The moment sums are merge-order-exact by the
    * [[graft.analytics.Aggregates.fixedPointAvg]] construction: each value
    * quantizes to an integer at `scale` decimals, so the partial sums of
    * values and of squares are exact integers in double at any merge order
    * (and bit-identical in DuckDB). Exactness bound: n·(maxAbs·10^scale)²
    * must stay below 2⁵³ — at the default scale 4 and |x| ≤ 5 that is
    * ~3.6 billion rows per dimension; past it, aggregate in stripes.
    *
    * Scale shape: one posexplode → one (dim)-keyed aggregate (64 rows) →
    * broadcast back into the projection. A constant dimension (std 0) maps
    * to z = 0 rather than a division blow-up.
    */
  def standardizeDims(df: DataFrame, id: Column, vec: Column,
      scale: Int = 4): DataFrame = {
    require(scale >= 0 && scale <= 9, s"scale must be in [0,9], got $scale")
    val f = math.pow(10, scale)
    val dims = df.select(id.as("vec_id"), Similarity.asDouble(vec).as("v"))
      .select(col("vec_id"), posexplode(col("v")).as(Seq("dim", "x")))
    val q = round(col("x") * f)
    val stats = dims.groupBy(col("dim"))
      .agg((avg(q) / f).as("__mean"), (avg(q * q) / (f * f)).as("__m2"))
      // clamp the variance at 0: for a near-constant dimension at large n,
      // floating-point rounding can make m2 − mean² slightly negative and
      // sqrt would emit NaN z-scores the zero-std guard can't catch
      .withColumn("__std",
        sqrt(greatest(col("__m2") - col("__mean") * col("__mean"), lit(0.0))))
    dims.join(broadcast(stats), "dim")
      .select(col("vec_id"), col("dim"),
        when(col("__std") === 0.0 || col("__std").isNaN, lit(0.0))
          .otherwise(round((col("x") - col("__mean")) / col("__std"), 6))
          .as("z"))
  }
}
