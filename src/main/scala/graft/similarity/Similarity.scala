package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *  - [[bruteForceKnn]]: exact cosine top-k — broadcast the (small) query
  *    set against the corpus; one pass, no corpus shuffle. The baseline.
  *  - [[ivfKnn]]: IVF-style partitioned search — assign every vector to its
  *    nearest centroid (linear pass), shuffle once on cluster id, and
  *    search only the query's cluster. At 100 TB with √n centroids this
  *    cuts compared pairs by ~|clusters|× at a small recall cost.
  *
  * All vector math is `zip_with`/`aggregate` higher-order expressions over
  * `array<double>` — codegen-friendly, no UDF serialization per row.
  */
object Similarity {

  /** Cast an array<float> embedding to array<double> for stable math. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity of two double-array columns, rounded for stable
    * cross-engine comparison.
    */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

  /** Per-key top-k over scored rows — the scale-safe replacement for a
    * `row_number` window partitioned by a low-cardinality key (which funnels
    * |corpus|×|queries| rows into |queries| window partitions).
    *
    * Uses [[graft.plans.TopKByScore]], a custom `TypedImperativeAggregate`
    * holding a size-k heap: the map-side partial buffer that crosses the
    * shuffle is k pairs per (key × map task), and no task ever materializes
    * a group's full score list. Ordering: cosine desc, then neighbor_id asc
    * (ties deterministic).
    */
  private[similarity] def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val agg = graft.plans.TopKByScore(
      ColumnBridge.expression(col("cosine")),
      ColumnBridge.expression(col("neighbor_id")), k)
    scored
      .groupBy(col("query_id"))
      .agg(ColumnBridge.column(agg.toAggregateExpression()).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.id").as("neighbor_id"),
        col("t.score").as("cosine"), (col("pos") + 1).cast("int").as("rnk"))
  }

  /** Exact top-k nearest neighbors by cosine for each query vector.
    * `queries` is expected to be small (it is broadcast); the corpus is
    * scanned once with no shuffle, then [[topKPerQuery]] reduces each
    * partition to k candidates per query before the single merge shuffle.
    */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("neighbor_id"), asDouble(col("embedding")).as("cvec"))
    val q = queries.select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("qvec"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("qvec"), col("cvec")))
    topKPerQuery(scored, k)
  }

  /** Assign each vector to the id of its nearest centroid (max cosine,
    * ties by centroid id). Centroids are broadcast; assignment is a single
    * narrow pass.
    */
  def assignClusters(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val c = corpus.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val cent = centroids.select(col("vec_id").as("centroid_id"),
      asDouble(col("embedding")).as("cv"))
    val scored = c.join(broadcast(cent), lit(true))
      .withColumn("sim", cosine(col("v"), col("cv")))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("centroid_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("centroid_id"), col("v"))
  }

  /** IVF search: top-k by cosine among vectors in the query's `nprobe`
    * nearest clusters. Returns the same shape as [[bruteForceKnn]] — recall
    * is approximate by construction and rises with `nprobe` (compared pairs
    * scale as nprobe/|clusters| of brute force).
    */
  def ivfKnn(corpus: DataFrame, centroids: DataFrame, queryIds: Seq[Long],
      k: Int, nprobe: Int = 1): DataFrame = {
    val assigned = assignClusters(corpus, centroids)
    // queries probe their top-nprobe clusters (corpus rows keep 1 cluster)
    val q = corpus.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("qvec"))
    val cent = centroids.select(col("vec_id").as("centroid_id"),
      asDouble(col("embedding")).as("cv"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("__sim").desc, col("centroid_id"))
    val probes = q.join(broadcast(cent), lit(true))
      .withColumn("__sim", cosine(col("qvec"), col("cv")))
      .withColumn("__rn", row_number().over(probeW))
      .filter(col("__rn") <= nprobe)
      .select(col("query_id"), col("centroid_id"), col("qvec"))
    val scored = assigned
      .select(col("vec_id").as("neighbor_id"), col("centroid_id"), col("v").as("cvec"))
      .join(broadcast(probes), Seq("centroid_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("qvec"), col("cvec")))
    topKPerQuery(scored, k)
  }

  /** Random-hyperplane LSH bucket for cosine similarity: sign bits of dot
    * products against `planes` (deterministic seed → reproducible buckets).
    * Vectors in the same bucket are near-dup candidates; complements
    * [[graft.dedup.Dedup.cosinePairs]].
    */
  def hyperplaneBucket(v: Column, planes: Seq[Seq[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(v, planeCol) >= 0, lit(1L << i)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Deterministic pseudo-random hyperplanes (LCG on a fixed seed) — no
    * Math.random, reproducible across runs and engines.
    */
  def deterministicPlanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    var state = seed
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    Seq.fill(numPlanes)(Seq.fill(dim)(next()))
  }
}
