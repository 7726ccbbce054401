package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dominant principal direction of an embedding corpus — the
  * all-but-the-top / anisotropy audit (Mu & Viswanath 2018: corpus
  * embeddings share a large common direction; measuring it is the first
  * step of removing it, and a healthy retrieval corpus keeps its top
  * component's mass modest).
  *
  * Determinism contract (the [[graft.analytics.Graph]] fixed-point
  * discipline, extended to linear algebra): embeddings are quantized onto
  * a GLOBAL integer grid (`q = floor(x·1000 + 0.5)`, exact in double for
  * |x| ≤ ~10¹²), the second-moment (Gram) matrix is accumulated in exact
  * longs, normalized per entry by `g / n`, and the power iteration runs
  * in long arithmetic with a per-round max-abs fixed-point
  * renormalization. Division is TRUNCATION toward zero on both sides:
  * components carry signs, and DuckDB's `//` truncates on negatives
  * (measured: `-7 // 2 = -3`, despite docs suggesting floor) — exactly
  * Java's long `/`, so the plain operator is the mirror and `floorDiv`
  * would diverge by one ulp on every negative entry. Every step is
  * integer-exact → bit-identical at any partitioning and replayable in
  * SQL.
  *
  * Scale shape: the per-row double-unnest (dim × dim cells) is map-only
  * and combines map-side into ONE d²-sized aggregate — no self-join, no
  * shuffle of the exploded frame; d² (≤ 4096 for d = 64) is model-sized,
  * so collecting it to the driver for the iteration is the same bounded
  * action class as IVF centroid collects. Overflow budget: |q| ≤ 10³ →
  * per-cell products ≤ 10⁶, so the long Gram sum holds ~9·10¹² rows;
  * after the DIV-n normalization entries are ≤ 10⁶, the matvec peaks at
  * d·10⁶·scale, and the renormalization multiplies that by `scale` again
  * — so the budget is d·10⁶·scale² < 2⁶³, which the default scale 10⁵
  * meets at d = 64 with 14× headroom (10⁶ would overflow).
  */
object Pca {

  /** `(dim, v_fp)` — the dominant eigenvector of the normalized Gram
    * matrix after `rounds` fixed-point power iterations from the all-ones
    * vector, scaled to max-abs = `scale`. The all-ones start has nonzero
    * overlap with the top component unless the corpus is exactly
    * orthogonal to it (a measure-zero fixture no real corpus hits).
    */
  def dominantComponent(df: DataFrame, vecCol: String, rounds: Int = 3,
      scale: Long = 100000L): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = df.sparkSession
    import spark.implicits._
    // keep the row-local pair fan-out join-free: re-explode the quantized
    // array per row instead of self-joining the exploded frame
    val qarr = df.select(
      transform(col(vecCol),
        x => floor(x.cast("double") * 1000d + 0.5d).cast("long")).as("qs"))
    val cells = qarr
      .select(posexplode(col("qs")).as(Seq("i", "qi")), col("qs"))
      .select(col("i"), posexplode(col("qs")).as(Seq("j", "qj")), col("qi"))
      .groupBy(col("i"), col("j")).agg(sum(col("qi") * col("qj")).as("g"))
    val n = df.count()
    require(n > 0, "dominantComponent needs at least one row")
    val gram = cells.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2) / n)
      .toMap
    val d = gram.keys.map(_._1).max + 1
    var v = Array.fill(d)(scale)
    var r = 0
    while (r < rounds) {
      val w = Array.tabulate(d) { i =>
        var acc = 0L
        var j = 0
        while (j < d) { acc += gram.getOrElse((i, j), 0L) * v(j); j += 1 }
        acc
      }
      val m = w.map(math.abs).max
      require(m > 0L, "power iteration hit the zero vector (all-zero Gram)")
      v = w.map(x => x * scale / m)
      r += 1
    }
    v.zipWithIndex.map { case (f, i) => (i, f) }.toSeq
      .toDF("dim", "v_fp")
  }
}
