package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** ANN operators over hand-checkable vectors. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // unit-ish vectors: 0 ~ 1 ~ 4 cluster; 2 ~ 3 cluster; orthogonal across
  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.9f, 0.1f)),
    (4L, Array(0.8f, 0.0f, 0.2f))
  ).toDF("vec_id", "embedding")

  test("cosine: identical = 1, orthogonal = 0") {
    val d = Seq((Seq(1.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 1.0))).toDF("a", "b", "c")
    val r = d.select(Similarity.cosine(col("a"), col("b")),
      Similarity.cosine(col("a"), col("c"))).head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 0.0)
  }

  test("bruteForceKnn ranks by cosine, k bounds the result, no self-match") {
    val out = Similarity.bruteForceKnn(vecs, vecs.filter(col("vec_id") === 0), 2)
      .collect().sortBy(_.getInt(3))
    assert(out.length === 2)
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 4L)) // nearest two to e_x
    assert(out.map(_.getInt(3)).toSeq === Seq(1, 2))
    assert(out.forall(_.getLong(1) != 0L))
  }

  test("two-phase top-k equals a global sort (determinism across partitioning)") {
    val big = (0L until 200L).map(i =>
      (i, Array(math.cos(i * 0.1).toFloat, math.sin(i * 0.1).toFloat, 0.3f)))
      .toDF("vec_id", "embedding").repartition(7)
    val knn = Similarity.bruteForceKnn(big, big.filter(col("vec_id") === 0), 5)
      .collect().sortBy(_.getInt(3)).map(r => (r.getLong(1), r.getDouble(2)))
    val brute = Similarity.bruteForceKnn(big.coalesce(1),
        big.filter(col("vec_id") === 0), 5)
      .collect().sortBy(_.getInt(3)).map(r => (r.getLong(1), r.getDouble(2)))
    assert(knn.toSeq === brute.toSeq)
  }

  test("IVF assigns to nearest centroid and searches within the cluster") {
    val centroids = vecs.filter(col("vec_id").isin(0L, 2L))
    val assigned = Similarity.assignClusters(vecs, centroids)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assigned(1L) === 0L)
    assert(assigned(3L) === 2L)
    assert(assigned(4L) === 0L)
    val out = Similarity.ivfKnn(vecs, centroids, Seq(1L), 2)
      .collect().map(_.getLong(1)).toSet
    assert(out.subsetOf(Set(0L, 4L))) // only the 0-cluster is probed
  }

  test("IVF with full probe equals exact brute force") {
    val centroids = vecs.filter(col("vec_id").isin(0L, 2L))
    val ivf = Similarity.ivfKnn(vecs, centroids, Seq(1L, 3L), 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    val brute = Similarity.bruteForceKnn(vecs,
        vecs.filter(col("vec_id").isin(1L, 3L)), 3)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(ivf === brute) // nprobe = |clusters| probes everything
  }

  test("clusterBalancedSample caps each cluster and is partition-deterministic") {
    val centroids = vecs.filter(col("vec_id").isin(0L, 2L))
    def run(parts: Int) = Similarity.clusterBalancedSample(
        vecs.repartition(parts), centroids, perCluster = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val out = run(3)
    // x-axis cluster (0) holds vectors 0,1,4 -> capped at 2; y-axis keeps both
    val byCluster = out.groupBy(_._2)
    assert(byCluster(0L).size === 2)
    assert(byCluster(2L).map(_._1) === Set(2L, 3L))
    assert(out.forall(_._3 <= 2))
    assert(run(1) === out)
  }

  test("kmeansStep recomputes centroids as exact cluster means") {
    val centroids = vecs.filter(col("vec_id").isin(0L, 2L))
    val out = Similarity.kmeansStep(vecs, centroids, dim = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    // cluster 0 = {0, 1, 4}: dim-0 mean = (1.0 + 0.9 + 0.8) / 3 = 0.9
    assert(out((0L, 0))._2 === 3L)
    assert(math.abs(out((0L, 0))._1 - 0.9) < 1e-6)
    // cluster 2 = {2, 3}: dim-1 mean = (1.0 + 0.9) / 2 = 0.95
    assert(out((2L, 1))._2 === 2L)
    assert(math.abs(out((2L, 1))._1 - 0.95) < 1e-6)
    // sizes partition the corpus
    assert(out.collect { case ((_, 0), (_, n)) => n }.sum === 5L)
  }

  test("ivfKnn plans exactly one shuffle exchange (the top-k merge)") {
    val centroids = vecs.filter(col("vec_id").isin(0L, 2L))
    val plan = Similarity.ivfKnn(vecs, centroids, Seq(1L), 2)
      .queryExecution.executedPlan.toString
    // centroid assignment is a projection and the probe side is broadcast,
    // so the only data shuffle is the bounded top-k merge
    val shuffles = plan.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange"))
    assert(shuffles === 1, s"expected 1 shuffle, plan:\n$plan")
  }

  test("trained codebook round-trips into ivfKnn and keeps the partition") {
    val seed = vecs.filter(col("vec_id").isin(0L, 2L))
    val trained = Similarity.codebook(Similarity.kmeansStep(vecs, seed, dim = 3))
    // centroids moved to cluster means, so re-assignment keeps the clusters
    val assigned = Similarity.assignClusters(vecs, trained)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assigned(1L) === 0L && assigned(4L) === 0L && assigned(3L) === 2L)
    // and search over the trained codebook still returns in-cluster results
    val out = Similarity.ivfKnn(vecs, trained, Seq(1L), 2)
      .collect().map(_.getLong(1)).toSet
    assert(out.subsetOf(Set(0L, 4L)))
  }

  test("trainCodebook converges: a converged codebook is a kmeansStep fixed point") {
    val seeds = vecs.filter(col("vec_id").isin(0L, 2L))
    val trained = Similarity.trainCodebook(vecs, seeds, dim = 3, iterations = 3)
    // one more step must not move the (round-6) means
    val again = Similarity.codebook(Similarity.kmeansStep(vecs, trained, dim = 3))
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(snap(again) === snap(trained))
    // and assignments under the trained codebook keep the expected clusters
    val assigned = Similarity.assignClusters(vecs, trained)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assigned(1L) === assigned(0L) && assigned(4L) === assigned(0L))
    assert(assigned(3L) === assigned(2L))
  }

  test("NearestCentroids has structural equality (subexpression-elimination safe)") {
    import graft.plans.NearestCentroids
    import org.apache.spark.sql.catalyst.expressions.Literal
    def mk() = NearestCentroids(Literal.create(Seq(1.0, 0.0)),
      Seq(1L, 2L), Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)), 1)
    assert(mk() === mk())
    assert(mk().semanticEquals(mk()))
    assert(mk().hashCode === mk().hashCode)
  }

  test("ragged embedding dimension fails fast instead of silently dropping") {
    val ragged = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val cents = vecs.filter(col("vec_id").isin(0L, 2L))
    val e = intercept[Exception] {
      Similarity.assignClusters(ragged, cents).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).map(c => Option(c.getMessage).getOrElse(""))
        .exists(_.contains("does not match")))
  }

  test("pq codes: per-subspace argmin with low-id ties, narrow plan") {
    // 4-dim vectors, m=2 -> subspaces (d0,d1) and (d2,d3); centroids 10/20
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 1.0f)), // sub0 -> c10, sub1 -> c20
      (2L, Array(0.0f, 1.0f, 1.0f, 0.0f)), // sub0 -> c20, sub1 -> c10
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f))  // equidistant -> lowest id both
    ).toDF("vec_id", "embedding")
    val cents = Seq(
      (10L, Array(1.0f, 0.0f, 1.0f, 0.0f)),
      (20L, Array(0.0f, 1.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val codes = Similarity.pqCodes(corpus, cents, m = 2)
    val got = codes.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(got(1L) === Seq(10L, 20L))
    assert(got(2L) === Seq(20L, 10L))
    assert(got(3L) === Seq(10L, 10L), "exact ties keep the lowest id")
    assert(!codes.queryExecution.executedPlan.toString.contains("Exchange"),
      "index build must be a narrow projection")
  }

  test("pq adc: exact squared L2 when the row's subvectors are centroids") {
    // corpus rows ARE codebook entries -> reconstruction is lossless and
    // ADC equals the true squared distance to the query
    val cents = Seq(
      (10L, Array(1.0f, 0.0f, 1.0f, 0.0f)),
      (20L, Array(0.0f, 1.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val corpus = Seq(
      (0L, Array(0.5f, 0.5f, 0.5f, 0.5f)), // the query (not a centroid)
      (10L, Array(1.0f, 0.0f, 1.0f, 0.0f)),
      (20L, Array(0.0f, 1.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.pqAdcKnn(corpus, cents, queryIds = Seq(0L),
        m = 2, k = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(_._3)
    // true squared L2 from (.5,.5,.5,.5) to either centroid = 4 * 0.25 = 1
    assert(out.map(_._1).toSet === Set(10L, 20L))
    assert(out.forall(t => math.abs(t._2 - 1.0) < 1e-9))
    assert(out.map(_._3).toSeq === Seq(1, 2))
  }

  test("ivfPqKnn with full probe equals plain ADC search") {
    val corpus = (0L until 60L).map(i =>
      (i, Array.tabulate(8)(d => (math.sin(i * 0.7 + d) * 2).toFloat)))
      .toDF("vec_id", "embedding").repartition(5)
    val cents = corpus.filter(col("vec_id") % 15 === 0) // 4 coarse lists
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).sortBy(t => (t._1, t._4)).toSeq
    val full = canon(Similarity.ivfPqKnn(corpus, cents, Seq(0L, 7L),
      m = 4, k = 5, nprobe = 4))
    val plain = canon(Similarity.pqAdcKnn(corpus, cents, Seq(0L, 7L),
      m = 4, k = 5))
    assert(full === plain, "probing every list must equal the full ADC scan")
  }

  test("ivfPqKnnBatch equals the per-query face on the same probes") {
    val corpus = (0L until 60L).map(i =>
      (i, Array.tabulate(8)(d => (math.sin(i * 0.7 + d) * 2).toFloat)))
      .toDF("vec_id", "embedding").repartition(5)
    val cents = corpus.filter(col("vec_id") % 15 === 0)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).sortBy(t => (t._1, t._4)).toSeq
    val qids = Seq(0L, 7L, 23L)
    val batch = canon(Similarity.ivfPqKnnBatch(corpus, cents,
      corpus.filter(col("vec_id").isInCollection(qids)),
      col("vec_id"), col("embedding"), m = 4, k = 5, nprobe = 2))
    val perQuery = canon(Similarity.ivfPqKnn(corpus, cents, qids,
      m = 4, k = 5, nprobe = 2))
    assert(batch === perQuery,
      "the kernel-computed ADC tables must be bit-identical to driver-side ones")
  }

  test("ivfPqKnnBatch scans the codes frame once: one shuffle, no per-query branches") {
    val corpus = (0L until 60L).map(i =>
      (i, Array.tabulate(8)(d => (math.cos(i * 0.3 + d)).toFloat)))
      .toDF("vec_id", "embedding")
    val cents = corpus.filter(col("vec_id") % 15 === 0)
    val out = Similarity.ivfPqKnnBatch(corpus, cents,
      corpus.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
      m = 4, k = 3, nprobe = 2)
    val plan = out.queryExecution.executedPlan.toString
    // query side is broadcast, index is checkpointed: the only data
    // shuffle is the bounded top-k merge — a per-query union would add a
    // scan + branch per query
    val shuffles = plan.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange"))
    assert(shuffles === 1, s"expected 1 shuffle, plan:\n$plan")
    assert(plan.linesIterator.count(_.contains("pq_adc_dyn")) <= 2,
      s"ADC must appear once (plus partial agg), not per query:\n$plan")
  }

  test("pq recall against brute force rises from coarse to full probe") {
    val corpus = (0L until 60L).map(i =>
      (i, Array.tabulate(8)(d => (math.sin(i * 0.7 + d) * 2).toFloat)))
      .toDF("vec_id", "embedding").repartition(5)
    val cents = corpus.filter(col("vec_id") % 15 === 0)
    val qf = corpus.filter(col("vec_id").isInCollection(Seq(0L, 7L, 23L)))
    val brute = Similarity.bruteForceKnn(corpus, qf, 5)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(np: Int): Double = {
      val got = Similarity.ivfPqKnnBatch(corpus, cents, qf,
          col("vec_id"), col("embedding"), m = 4, k = 5, nprobe = np)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(brute).size.toDouble / brute.size
    }
    val r1 = recall(1)
    val r4 = recall(4) // full probe: quantization is the only loss left
    assert(r1 > 0.0, "coarse probe must still find some true neighbors")
    assert(r4 >= r1, s"recall must not fall as probes widen: $r1 -> $r4")
  }

  test("cosineCandidates drops flooded buckets, keeps healthy ones") {
    // 12 identical vectors flood one bucket; 2 identical opposite-sign
    // vectors share another (every sign bit flips, so the buckets differ)
    val flood = (0L until 12L).map(i => (i, Array(1.0f, 0.0f, 0.0f)))
    val pair = Seq((100L, Array(-1.0f, 0.0f, 0.0f)),
      (101L, Array(-1.0f, 0.0f, 0.0f)))
    val df = (flood ++ pair).toDF("vec_id", "embedding")
    val planes = Similarity.deterministicPlanes(4, 3)
    val capped = Similarity.cosineCandidates(df, col("vec_id"),
        col("embedding"), planes, maxBucket = 5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((100L, 101L)),
      "the 12-vector bucket exceeds the cap and must contribute no pairs")
    val uncapped = Similarity.cosineCandidates(df, col("vec_id"),
      col("embedding"), planes).count()
    assert(uncapped === 12L * 11 / 2 + 1, "without the cap the flood pairs up")
  }

  test("planeCountFor scales the bucket space with the corpus") {
    assert(Similarity.planeCountFor(1000000L, 1000L) === 10)
    assert(Similarity.planeCountFor(10000000L, 1000L) === 14)
    assert(Similarity.planeCountFor(10L, 1000L) === 1, "tiny corpus clamps to 1")
    assert(Similarity.planeCountFor(Long.MaxValue, 1L) === 62, "clamped to long bits")
    // 10x growth adds a bounded number of planes, halving occupancy drift
    val d = Similarity.planeCountFor(10000000L, 1000L) -
      Similarity.planeCountFor(1000000L, 1000L)
    assert(d >= 3 && d <= 4)
  }

  test("count-based cosineCandidates sizes planes from the data") {
    val df = (0L until 40L).map(i =>
      (i, Array.tabulate(4)(d => math.sin(i * 0.7 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val out = Similarity.cosineCandidates(df, col("vec_id"), col("embedding"),
      dim = 4, targetBucketSize = 10L, maxBucket = 1000, seed = 7L)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)), "pairs are ordered")
    // 40 vectors at target 10 -> 2 planes -> buckets bounded by 4 spaces
    val explicit = Similarity.cosineCandidates(df, col("vec_id"),
      col("embedding"), Similarity.deterministicPlanes(2, 4, seed = 7L), 1000)
    assert(out.count() === explicit.count())
  }

  test("pq search fails fast on query ids missing from the corpus") {
    val cents = vecs.filter(col("vec_id").isin(0L, 2L))
    val e1 = intercept[IllegalArgumentException] {
      Similarity.pqAdcKnn(vecs, cents, queryIds = Seq(0L, 99L), m = 3, k = 2)
    }
    assert(e1.getMessage.contains("99"), s"missing id must be named: ${e1.getMessage}")
    val e2 = intercept[IllegalArgumentException] {
      Similarity.ivfPqKnn(vecs, cents, queryIds = Seq(1L, 77L, 78L), m = 3, k = 2)
    }
    assert(e2.getMessage.contains("77") && e2.getMessage.contains("78"))
  }

  test("hyperplane bucket is deterministic and equal for identical vectors") {
    val planes = Similarity.deterministicPlanes(4, 3)
    val b = vecs.select(col("vec_id"),
      Similarity.hyperplaneBucket(Similarity.asDouble(col("embedding")), planes)
        .as("bucket")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b.values.forall(v => v >= 0 && v < 16))
    val again = vecs.select(
      Similarity.hyperplaneBucket(Similarity.asDouble(col("embedding")), planes))
      .collect().map(_.getLong(0)).toSeq
    assert(again === vecs.select(col("vec_id")).collect()
      .map(r => b(r.getLong(0))).toSeq)
  }

  test("hardNegatives excludes positives before the heap; empty set ≡ brute kNN") {
    import spark.implicits._
    // query 0's nearest is 1 (a known positive) — it must vanish and the
    // NEXT one (4) surface at rank 1, with rank 2 backfilled, not short
    val positives = Seq((0L, 1L)).toDF("id_a", "id_b")
    val out = Similarity.hardNegatives(vecs,
        vecs.filter(col("vec_id") === 0), positives, 2)
      .collect().sortBy(_.getInt(3))
    assert(out.map(_.getLong(1)).toSeq === Seq(4L, 2L))
    assert(out.map(_.getInt(3)).toSeq === Seq(1, 2))
    // the pair is undirected: listing it reversed excludes the same way
    val rev = Similarity.hardNegatives(vecs,
        vecs.filter(col("vec_id") === 0),
        Seq((1L, 0L)).toDF("id_a", "id_b"), 2)
      .collect().sortBy(_.getInt(3)).map(_.getLong(1)).toSeq
    assert(rev === Seq(4L, 2L))
    // no positives -> exactly bruteForceKnn
    val brute = Similarity.bruteForceKnn(vecs, vecs.filter(col("vec_id") === 0), 2)
      .collect().sortBy(_.getInt(3)).map(r => (r.getLong(1), r.getDouble(2)))
    val none = Similarity.hardNegatives(vecs, vecs.filter(col("vec_id") === 0),
        Seq.empty[(Long, Long)].toDF("id_a", "id_b"), 2)
      .collect().sortBy(_.getInt(3)).map(r => (r.getLong(1), r.getDouble(2)))
    assert(none.toSeq === brute.toSeq)
  }

  test("semanticContamination flags only vectors near a probe") {
    // corpus: an exact probe clone (cos 1.0), a scaled copy (cos 1.0 —
    // cosine ignores magnitude), a near-miss at ~0.97, and an orthogonal
    // vector; threshold 0.99 keeps the near-miss and orthogonal out
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(3.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(1.0f, 0.25f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val probes = Seq((100L, Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.semanticContamination(corpus, probes, threshold = 0.99)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === Map(1L -> ((1L, 1.0)), 2L -> ((1L, 1.0))))
    // lowering the threshold pulls in the near-miss, never the orthogonal
    val loose = Similarity.semanticContamination(corpus, probes, threshold = 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(loose === Set(1L, 2L, 3L))
  }

  test("x105 clusterPurity: majority share per cluster, min label on ties") {
    // centroid 0 = x-axis, centroid 1 = y-axis; labels: cluster 0 is
    // pure label 7, cluster 1 is a 1-1 tie between labels 3 and 9
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 7), (2L, Array(0.9f, 0.1f), 7),
      (3L, Array(0.8f, 0.05f), 7),
      (1L, Array(0.0f, 1.0f), 9), (4L, Array(0.1f, 0.9f), 3))
      .toDF("vec_id", "embedding", "label").repartition(2)
    val cents = emb.filter(col("vec_id") < 2)
    val got = Similarity.clusterPurity(emb, cents, col("label"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(0L) === ((3L, 7L, 3L, 1.0)))
    assert(got(1L) === ((2L, 3L, 1L, 0.5))) // tie → min label 3
  }

  test("x88 centroidSimilarity: orthogonal, identical and mixed centroids") {
    // label 0 averages to (1,0); label 1 to (0,1) (orthogonal to 0);
    // label 2 is a single (1,1) vector — cos 1/√2 against both axes
    val df = Seq(
      (0, Array(1.0f, 0.0f)), (0, Array(1.0f, 0.0f)),
      (1, Array(0.0f, 2.0f)), (1, Array(0.0f, 4.0f)),
      (2, Array(1.0f, 1.0f))
    ).toDF("label", "embedding").repartition(3)
    val got = Similarity.centroidSimilarity(df, col("label"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.size === 3)
    assert(got((0L, 1L)) === 0.0)
    assert(math.abs(got((0L, 2L)) - 1.0 / math.sqrt(2.0)) < 1e-6)
    assert(math.abs(got((1L, 2L)) - 1.0 / math.sqrt(2.0)) < 1e-6)
  }

  test("x91 embeddingQa: zero norms, norm envelope and ragged dimensions") {
    val df = Seq(
      (0, Array(3.0f, 4.0f)),        // norm 5
      (0, Array(0.0f, 0.0f)),        // zero vector
      (1, Array(1.0f, 0.0f)),        // norm 1
      (1, Array(0.0f, 1.0f, 0.0f))   // ragged: 3 dims
    ).toDF("label", "embedding").repartition(2)
    val got = Similarity.embeddingQa(df, col("label"), col("embedding"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    assert(got(0L) === ((2L, 1L, 0L, 1L, 2.5, 0.0, 5.0)))
    assert(got(1L) === ((2L, 0L, 0L, 2L, 1.0, 1.0, 1.0)))
  }

  test("matryoshkaRecall: misleading prefix scores 0, full width scores 1") {
    // q's first two dims point AWAY from its true neighbor A and straight
    // at the decoy B — the prefix ranking must invert, the full must not
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 5.0f, 5.0f)),  // query
      (1L, Array(0.0f, 1.0f, 5.0f, 5.0f)),  // true neighbor (full cos ~.96)
      (2L, Array(1.0f, 0.0f, -5.0f, 5.0f))  // prefix decoy (full cos ~.02)
    ).toDF("vec_id", "embedding")
    val got = Similarity.matryoshkaRecall(emb, emb.filter(col("vec_id") === 0),
        dims = Seq(2, 4), k = 1)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(got === Map(2 -> 0.0, 4 -> 1.0))
  }

  test("x88 centroidSimilarity is partitioning-independent") {
    val base = (0 until 40).map(i =>
      (i % 4, Array.tabulate(8)(d => ((i * 7 + d * 3) % 11 - 5) / 5.0f)))
    val a = Similarity.centroidSimilarity(base.toDF("label", "embedding").repartition(1),
      col("label"), col("embedding")).collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val b = Similarity.centroidSimilarity(base.toDF("label", "embedding").repartition(7),
      col("label"), col("embedding")).collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(a === b)
  }

  test("bitextMargin: hub loses to the mutually-exceptional pair") {
    // src 0 and tgt 1 are a tight pair in a corner of the space; tgt 3 is
    // a HUB near the src centroid — raw cosine could pick it, but margin
    // must rank the (0,1) pair far above any hub match.
    def v(a: Double, b: Double) = Array(a.toFloat, b.toFloat)
    val src = Seq((0L, v(1, 0)), (2L, v(0.2, 0.98)), (4L, v(-0.3, 0.95)),
      (6L, v(0.1, 0.99))).toDF("vec_id", "embedding")
    val tgt = Seq((1L, v(0.995, 0.1)), (3L, v(0.5, 0.87)),
      (5L, v(-0.1, 0.99)), (7L, v(0.3, 0.95))).toDF("vec_id", "embedding")
    val got = Similarity.bitextMargin(src, tgt,
        probes = src.filter(col("vec_id") <= 2), k = 2)
      .collect().map(r => r.getAs[Long]("src_id") ->
        (r.getAs[Long]("tgt_id"), r.getAs[Double]("cosine"),
          r.getAs[Double]("margin"))).toMap
    // probe 0's best is tgt 1 (cos ≈ .995); probe 2's best is tgt 7
    assert(got(0L)._1 === 1L)
    assert(got(2L)._1 === 7L)
    // the tight pair's margin beats the in-cluster match's margin
    assert(got(0L)._3 > got(2L)._3)
    // margin denominator uses BOTH neighborhoods: recompute by hand
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      math.rint(dot / (na * nb) * 1e6) / 1e6
    }
    val s0 = v(1, 0)
    val tv = Map(1L -> v(0.995, 0.1), 3L -> v(0.5, 0.87),
      5L -> v(-0.1, 0.99), 7L -> v(0.3, 0.95))
    val sv = Map(0L -> s0, 2L -> v(0.2, 0.98), 4L -> v(-0.3, 0.95),
      6L -> v(0.1, 0.99))
    // top-2 neighborhoods of src 0 in tgt and of tgt 1 in src, by cosine
    val nx = tv.values.map(cos(s0, _)).toSeq.sorted.reverse.take(2)
    val ny = sv.values.map(cos(tv(1L), _)).toSeq.sorted.reverse.take(2)
    val sx = nx.map(c => math.rint(c * 1e6).toLong).sum
    val sy = ny.map(c => math.rint(c * 1e6).toLong).sum
    val cUnits = math.rint(cos(s0, tv(1L)) * 1e6)
    val want = math.rint(cUnits * 2.0 * 2 * 2 / (sx * 2 + sy * 2) * 1e6) / 1e6
    assert(math.abs(got(0L)._3 - want) < 2e-6)
  }

  test("x145 dominantComponent: matches an independent integer fold, " +
      "partitioning-independent") {
    import graft.similarity.Pca
    // strongly anisotropic fixture: mass on dim 0 with a dim-1 tilt
    val rows = Seq(Array(1.0f, 0.0f, 0.0f), Array(0.9f, 0.3f, 0.0f),
      Array(-1.0f, -0.2f, 0.05f), Array(0.8f, 0.25f, -0.1f))
    val df = rows.map(Tuple1(_)).toDF("embedding")
    // independent replay of the documented arithmetic (trunc division,
    // the DuckDB `//` semantics)
    val q = rows.map(_.map(x => math.floor(x.toDouble * 1000d + 0.5d).toLong))
    val d = 3
    val gram = Array.tabulate(d, d) { (i, j) =>
      q.map(r => r(i) * r(j)).sum / rows.size
    }
    var v = Array.fill(d)(100000L)
    for (_ <- 1 to 3) {
      val w = Array.tabulate(d)(i =>
        (0 until d).map(j => gram(i)(j) * v(j)).sum)
      val m = w.map(math.abs).max
      v = w.map(x => x * 100000L / m)
    }
    val got = Pca.dominantComponent(df, "embedding")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got === v.zipWithIndex.map { case (f, i) => i -> f }.toMap)
    // the dominant dim carries the max-abs component = the scale itself
    assert(math.abs(got(0)) === 100000L)
    // bit-identical at a different partitioning (the determinism contract)
    val got8 = Pca.dominantComponent(df.repartition(8), "embedding")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got8 === got)
  }

  test("x155 mmrRerank: diversity beats raw relevance, lambda=0 is pure rank") {
    // d1 on the x-axis; d2 at 3-4-5 angles to it (cos .6 to d1, .8 to d3);
    // d3 on the y-axis (cos 0 to d1) — all cosines exact in float
    val mvecs = Seq(
      (11L, Array(1.0f, 0.0f, 0.0f)),   // d1
      (12L, Array(3.0f, 4.0f, 0.0f)),   // d2: cos(d1)=.6, cos(d3)=.8
      (13L, Array(0.0f, 1.0f, 0.0f))    // d3
    ).toDF("vec_id", "embedding")
    val cands = Seq((100L, 11L, 0.9), (100L, 12L, 0.85), (100L, 13L, 0.3),
        (100L, 99L, 0.95)) // 99 has no vector: dropped, never picked
      .toDF("query_id", "doc_id", "rel")
    val got = Similarity.mmrRerank(cands, mvecs, selectK = 3, lambda = 0.5)
      .collect().map(r => r.getInt(2) -> ((r.getLong(1), r.getDouble(3))))
      .toMap
    // pick 1 = argmax rel; pick 2: d3 (.5·.3 − 0 = .15) beats the more
    // relevant d2 (.5·.85 − .5·.6 = .125) — the diversity trade;
    // pick 3: d2 at .425 − .5·max(.6,.8) = .025
    assert(got === Map(1 -> ((11L, 0.9)), 2 -> ((13L, 0.15)),
      3 -> ((12L, 0.025))))
    // λ = 0 degenerates to pure relevance order over vectorized cands
    val pure = Similarity.mmrRerank(cands, mvecs, selectK = 3, lambda = 0.0)
      .collect().map(r => r.getInt(2) -> r.getLong(1)).toMap
    assert(pure === Map(1 -> 11L, 2 -> 12L, 3 -> 13L))
    // a pool smaller than selectK just stops early, no padding rows
    val tiny = Similarity.mmrRerank(cands.filter(col("doc_id") === 11L),
      mvecs, selectK = 3, lambda = 0.5).collect()
    assert(tiny.length === 1)
  }

  test("x169 intraListSimilarity: closed-form pair means, MMR beats pure top") {
    val mvecs = Seq(
      (11L, Array(1.0f, 0.0f, 0.0f)),
      (12L, Array(3.0f, 4.0f, 0.0f)),   // cos(11,12)=.6, cos(12,13)=.8
      (13L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    def lst(ids: Long*) = ids.map((100L, _)).toDF("query_id", "doc_id")
    val all = Similarity.intraListSimilarity(lst(11L, 12L, 13L), mvecs).head()
    // pairs (11,12)=.6 (11,13)=0 (12,13)=.8 → mean 7/15
    assert(all.getLong(1) === 3L)
    assert(all.getDouble(2) === math.rint(1.4 / 3.0 * 1e6) / 1e6)
    // the x155 fixture's trade, measured: pure top-2 {11,12} packs
    // redundancy (.6); MMR's pick-2 {11,13} is orthogonal (0)
    val top = Similarity.intraListSimilarity(lst(11L, 12L), mvecs).head()
    val mmr = Similarity.intraListSimilarity(lst(11L, 13L), mvecs).head()
    assert(top.getDouble(2) === 0.6 && mmr.getDouble(2) === 0.0)
  }

  test("x182 kCenterCoreset: greedy farthest-point on hand geometry") {
    // the shared fixture: 0~1~4 cluster along x, 2~3 cluster along y.
    // seed = min id (0). Farthest from 0: ids 2 and 3 both at distance
    // 1.0 (orthogonal) → tie to the smaller id (2), radius 1.0. After
    // updating against 2, the x-cluster stragglers 1 (~.006) and 4
    // (~.0299) keep their distance-to-0, so pick 3 = id 4.
    val got = Similarity.kCenterCoreset(vecs, col("vec_id"),
        col("embedding"), k = 3)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    assert(got(1) === ((0L, None)))
    assert(got(2) === ((2L, Some(1.0))))
    // radius 3 = d(v4, v0) with the library's round-6 cosine
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    def cosd(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      r6(1.0 - r6(dot / (na * nb)))
    }
    val (id3, rad3Opt) = got(3)
    assert(id3 === 4L)
    val rad3 = rad3Opt.get
    val want = cosd(Seq(0.8f.toDouble, 0.0, 0.2f.toDouble),
      Seq(1.0, 0.0, 0.0))
    assert(math.abs(rad3 - want) < 2e-6, s"radius $rad3 vs $want")
    // covering radii never increase along the pick sequence
    assert(got(2)._2.get >= rad3)
  }

  test("x197 silhouetteByCluster: hand a/b distances, tie reads 0, " +
      "perfect member reads 1") {
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f)),   // exactly c1: a=0, b=1 -> s=1
      (11L, Array(0.6f, 0.8f)),   // cos .6/.8 -> c2: a=.2, b=.4 -> s=.5
      (12L, Array(1.0f, 1.0f)))   // equidistant tie -> a=b -> s=0
      .toDF("vec_id", "embedding")
    val cents = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.silhouetteByCluster(corpus, cents).collect()
      .map(r => r.getLong(0) -> r).toMap
    // c1 gets 10 (s=1) and the tie 12 (lower cid wins, s=0)
    assert(out(1L).getAs[Long]("n_vecs") === 2L)
    assert(out(1L).getAs[Double]("mean_silhouette") === 0.5)
    assert(out(1L).getAs[Double]("min_silhouette") === 0.0)
    assert(out(2L).getAs[Long]("n_vecs") === 1L)
    assert(out(2L).getAs[Double]("mean_silhouette") === 0.5)
  }

  test("x197 silhouetteByCluster: single centroid degenerates to 0") {
    val corpus = Seq((10L, Array(1.0f, 0.0f)), (11L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.silhouetteByCluster(corpus, cents).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_vecs") === 2L)
    assert(out.head.getAs[Double]("mean_silhouette") === 0.0)
  }
}
