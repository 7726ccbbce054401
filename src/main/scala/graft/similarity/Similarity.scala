package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.Native

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *  - [[bruteForceKnn]]: exact cosine top-k — broadcast the (small) query
  *    set against the corpus; one pass, no corpus shuffle. The baseline.
  *  - [[ivfKnn]]: IVF-style partitioned search — assign every vector to its
  *    nearest centroid with a per-row argmax over the (small, collected)
  *    centroid set, shuffle nothing until the final bounded top-k merge,
  *    and search only the query's `nprobe` nearest clusters. At 100 TB with
  *    √n centroids this cuts compared pairs by ~|clusters|× at a small
  *    recall cost.
  *
  * All vector math runs through the native codegen kernels in
  * [[graft.plans.Kernels]] (tight primitive loops inside whole-stage
  * codegen); round 2's interpreted `zip_with`/`aggregate` formulation of the
  * same IEEE operation order cost ~100× per pair.
  */
object Similarity {

  /** Cast an array<float> embedding to array<double> for stable math.
    * The kernels accept float arrays directly; this remains for callers
    * that need a double-array *column* (e.g. plane literals alongside it).
    */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product of two numeric-array columns (native kernel). */
  def dot(a: Column, b: Column): Column = Native.dot(a, b)

  def norm(a: Column): Column = sqrt(Native.dot(a, a))

  /** Cosine similarity of two numeric-array columns, rounded for stable
    * cross-engine comparison.
    */
  def cosine(a: Column, b: Column): Column = round(Native.cosineRaw(a, b), 6)

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
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cvec"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("qvec"), col("cvec")))
    topKPerQuery(scored, k)
  }

  /** Matryoshka (prefix-dimension) retrieval audit: recall@k of cosine
    * top-k computed on only the FIRST `d` embedding dimensions, against
    * the full-width exact top-k as truth — one row per (prefix width,
    * query). This is the measurement behind the "search at 8/16 dims,
    * re-rank at full width" decision: an MRL-trained embedding holds
    * recall at small prefixes (front-loaded information), an ordinary
    * embedding does not, and the curve tells you which you have and how
    * much ANN memory/bandwidth the prefix would save.
    *
    * Scale shape: one [[bruteForceKnn]] pass per audited width — each is
    * the shuffle-free broadcast-query corpus scan with the size-k heap
    * aggregate, so the plan fan-out is |dims|+1 bounded branches — then
    * one overlap join of model-sized frames (|queries|·k rows per side).
    * Prefix slicing happens in the scan projection, so narrow widths also
    * measure CHEAPER than full width, as they would at 100 TB.
    */
  def matryoshkaRecall(corpus: DataFrame, queries: DataFrame,
      dims: Seq[Int], k: Int): DataFrame = {
    require(dims.nonEmpty && dims.forall(_ >= 1),
      s"dims must be non-empty positive widths: $dims")
    require(k >= 1, s"k must be >= 1, got $k")
    def sliced(df: DataFrame, d: Int): DataFrame =
      df.withColumn("embedding", slice(col("embedding"), 1, d))
    val truth = bruteForceKnn(corpus, queries, k)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("__hit"))
    val prefixTopk = dims.map { d =>
      bruteForceKnn(sliced(corpus, d), sliced(queries, d), k)
        .select(lit(d).as("dim"), col("query_id"), col("neighbor_id"))
    }.reduce(_ union _)
    prefixTopk
      .join(broadcast(truth), Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("dim"), col("query_id"))
      .agg(round(count(col("__hit")).cast("double") / k, 6).as("recall"))
  }

  /** Margin-based bitext mining (the ratio-margin criterion of
    * Artetxe & Schwenk, "Margin-based Parallel Corpus Mining", ACL 2019):
    * for each probe vector x on the source side, its best target-side
    * match y, scored by `margin = cos(x,y) / ((avgNNₖ(x,tgt) +
    * avgNNₖ(y,src)) / 2)` — raw cosine rewards hub vectors that are close
    * to EVERYTHING; dividing by both local neighborhood densities keeps
    * only pairs that are mutually exceptional, which is what separates
    * true translation pairs from topically-similar noise.
    *
    * Scale shape: two [[bruteForceKnn]] passes (probes → tgt, then the ≤
    * |probes| distinct best-match candidates → src), each the shuffle-free
    * broadcast-queries corpus scan with the size-k heap aggregate; the
    * margin assembly joins model-sized frames. At full-corpus mining both
    * kNN passes swap for the IVF faces — the margin arithmetic is
    * unchanged.
    *
    * Determinism: cosines are quantized at 1e-6 ([[cosine]]), the
    * neighborhood sums accumulate those units as LONGs (exact at any
    * order), and the margin is a single double division of integer
    * quantities, so results hash-compare across engines.
    */
  def bitextMargin(src: DataFrame, tgt: DataFrame, probes: DataFrame,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val units = round(col("cosine") * 1e6, 0).cast("long")
    val fwd = bruteForceKnn(tgt, probes, k)
    val avgX = fwd.groupBy(col("query_id").as("src_id"))
      .agg(sum(units).as("__sx"), count(lit(1)).as("__kx"))
    val best = fwd.filter(col("rnk") === 1)
      .select(col("query_id").as("src_id"), col("neighbor_id").as("tgt_id"),
        col("cosine"))
    val cands = tgt.join(
      best.select(col("tgt_id").as("vec_id")).distinct(), Seq("vec_id"))
    val avgY = bruteForceKnn(src, cands, k)
      .groupBy(col("query_id").as("tgt_id"))
      .agg(sum(units).as("__sy"), count(lit(1)).as("__ky"))
    best.join(broadcast(avgX), Seq("src_id"))
      .join(broadcast(avgY), Seq("tgt_id"))
      .select(col("src_id"), col("tgt_id"), col("cosine"),
        round(round(col("cosine") * 1e6, 0) * 2.0 * col("__kx") * col("__ky") /
          (col("__sx") * col("__ky") + col("__sy") * col("__kx")).cast("double"),
          6).as("margin"))
  }

  /** Semantic (embedding-space) decontamination report: every corpus
    * vector whose cosine against ANY probe vector reaches `threshold`,
    * with its hit count and max similarity — the embedding-space
    * counterpart of [[graft.dedup.Decontaminate.contaminationReport]]'s
    * n-gram collision test, catching paraphrased/reformatted benchmark
    * leakage that verbatim n-grams miss. Rows absent from the result are
    * clean; an anti-join applies the drop.
    *
    * Scale shape: the probe set is an eval suite — small by construction —
    * so it broadcasts into ONE shuffle-free corpus scan (the
    * [[bruteForceKnn]] shape); the only shuffle is the contaminated-rows
    * aggregate, bounded by contamination volume. A probe set too large to
    * broadcast goes through the IVF path ([[ivfPqKnnBatch]]) instead.
    */
  def semanticContamination(corpus: DataFrame, probes: DataFrame,
      threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    val c = corpus.select(col("vec_id"), col("embedding"))
    val p = probes.select(col("vec_id").as("__pid"), col("embedding").as("__pv"))
    c.join(broadcast(p), col("vec_id") =!= col("__pid"))
      .withColumn("__cos", cosine(col("embedding"), col("__pv")))
      .filter(col("__cos") >= threshold)
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_hits"), max(col("__cos")).as("max_cosine"))
  }

  /** Hard-negative mining for contrastive training: for each query, the
    * exact top-k most-similar corpus vectors that are NOT known positives/
    * near-duplicates — the "close but wrong" examples a retrieval model
    * learns the most from (mining them from the near-dup band instead
    * would poison training with unlabeled positives, which is why the
    * exclusion happens BEFORE the heap, not by post-filtering a top-k that
    * could then come up short).
    *
    * `positives` carries undirected `(id_a, id_b)` pairs (e.g. the
    * [[graft.dedup.Dedup.cosinePairs]] near-dup output or a labeled
    * relevance set); it is symmetrized and semi-join-restricted to pairs
    * touching a query — workload-sized, broadcast into the corpus scan —
    * so the plan keeps [[bruteForceKnn]]'s shape: one shuffle-free corpus
    * pass, then the bounded [[topKPerQuery]] heap merge.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame,
      positives: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cvec"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val p = positives.select(col("id_a"), col("id_b"))
    val sym = p.unionByName(p.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .select(col("id_a").as("query_id"), col("id_b").as("neighbor_id"))
      .distinct()
    val qex = sym.join(q.select(col("query_id")), Seq("query_id"), "left_semi")
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("qvec"), col("cvec")))
      .join(broadcast(qex), Seq("query_id", "neighbor_id"), "left_anti")
    topKPerQuery(scored, k)
  }

  /** Collect a (small) centroid frame to a sorted (ids, vectors) pair — the
    * IVF "model" artifact. Centroids are ~√n by construction, so this is a
    * driver-side object of megabytes even at corpus scale, broadcast into
    * the assignment projection as a plan constant.
    */
  private def collectCentroids(centroids: DataFrame): (Array[Long], Array[Array[Double]]) = {
    val rows = centroids
      .select(col("vec_id").cast("long"), asDouble(col("embedding")))
      .collect()
      .map { r =>
        (r.getLong(0), r.getSeq[Double](1).toArray)
      }
      .sortBy(_._1)
    require(rows.nonEmpty, "IVF needs at least one centroid")
    val dims = rows.map(_._2.length).distinct
    require(dims.size == 1,
      s"IVF centroids must share one dimension, got ${dims.sorted.mkString(", ")}")
    (rows.map(_._1), rows.map(_._2))
  }

  /** Assign each vector to the id of its nearest centroid (max round-6
    * cosine, ties by centroid id). A single narrow projection over the
    * corpus — no join, no window, no shuffle; round 2's cross-join +
    * `row_number` formulation shuffled |corpus|×|centroids| rows.
    */
  def assignClusters(corpus: DataFrame, centroids: DataFrame): DataFrame =
    assignWith(corpus, collectCentroids(centroids))

  private def assignWith(corpus: DataFrame,
      cents: (Array[Long], Array[Array[Double]])): DataFrame =
    corpus.select(col("vec_id"),
      // coalesce makes the join key provably non-null, so the downstream
      // equi-join's IsNotNull filter folds away instead of being pushed
      // below this projection and re-evaluating the kernel per row; the
      // -1 sentinel is unreachable: >= 1 centroid with a uniform dimension
      // is enforced at collect, and the kernel throws (not skips) on a
      // row/centroid dimension mismatch
      coalesce(
        element_at(Native.nearestCentroids(col("embedding"), cents._1, cents._2, 1), 1),
        lit(-1L)).as("centroid_id"),
      col("embedding").as("v"))

  /** Cluster-purity evaluation: nearest-centroid clusters crossed with a
    * ground-truth label column — per cluster, its size, majority label
    * and purity (majority share). The x97-style report card for the
    * embedding-clustering tier: purity collapsing toward 1/|labels| means
    * the centroids (or the embeddings) carry no label signal, and a
    * cluster whose majority label flips between runs of the trainer is
    * the first symptom of seed sensitivity.
    *
    * Scale shape: assignment is the shuffle-free argmax projection
    * ([[assignClusters]]); one (cluster, label) aggregate then a
    * |clusters|-sized majority argmax via `min(struct)` — the label
    * join is id-keyed, never wider than (id, cluster, label).
    */
  def clusterPurity(corpus: DataFrame, centroids: DataFrame,
      label: Column): DataFrame = {
    val asg = assignClusters(corpus, centroids)
      .select(col("vec_id"), col("centroid_id"))
    val lab = corpus.select(col("vec_id"), label.cast("long").as("__lab"))
    asg.join(lab, "vec_id")
      .groupBy(col("centroid_id"), col("__lab")).agg(count(lit(1)).as("__c"))
      .groupBy(col("centroid_id"))
      .agg(sum(col("__c")).as("n_vecs"),
        min(struct((-col("__c")).as("nc"), col("__lab").as("l"))).as("__m"))
      .select(col("centroid_id"), col("n_vecs"),
        col("__m.l").as("majority_label"), (-col("__m.nc")).as("n_majority"),
        round((-col("__m.nc")).cast("double") / col("n_vecs").cast("double"), 6)
          .as("purity"))
  }

  /** Simplified silhouette per cluster — [[clusterPurity]] needs ground-
    * truth labels; silhouette judges the SAME clustering with none: per
    * vector, a = cosine distance (1 − round-6 cosine) to its assigned
    * centroid, b = distance to the nearest OTHER centroid, s = (b − a) /
    * max(a, b) ∈ [−1, 1]. Cluster means near 0 mean the centroid set
    * doesn't separate the space (re-train / re-seed); negative vectors sit
    * closer to a rival centroid than their own — the medoid-drift symptom.
    * This is the centroid-based simplification (Hruschka et al.), not the
    * full pairwise silhouette — all-pairs distances at corpus scale is
    * exactly the blow-up this tier never pays.
    *
    * Plan shape: corpus × centroid cosine via a model-sized broadcast
    * cross join (the batch-kNN shape — |centroids| ≈ √n rows build side),
    * a window PARTITIONED by vec_id cut to the top 2, one |clusters|-row
    * aggregate. Single-centroid degenerate case reads s = 0 (documented:
    * silhouette is undefined there, and 0 — "no separation evidence" — is
    * the conservative report).
    */
  def silhouetteByCluster(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val v = corpus.select(col("vec_id"), col("embedding").as("__v"))
    val c = centroids.select(col("vec_id").as("cid"),
      col("embedding").as("__cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("__cos").desc, col("cid").asc)
    val per = v.crossJoin(broadcast(c))
      .withColumn("__cos", cosine(col("__v"), col("__cv")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 2)
      .groupBy(col("vec_id"))
      .agg(max(when(col("__rn") === 1, col("cid"))).as("centroid_id"),
        max(when(col("__rn") === 1, lit(1.0) - col("__cos"))).as("__a"),
        max(when(col("__rn") === 2, lit(1.0) - col("__cos"))).as("__b"))
      .withColumn("__s",
        when(col("__b").isNull, lit(0.0))
          .when(greatest(col("__a"), col("__b")) > 0,
            (col("__b") - col("__a")) / greatest(col("__a"), col("__b")))
          .otherwise(lit(0.0)))
    per.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_vecs"),
        round(avg(col("__s")), 6).as("mean_silhouette"),
        round(min(col("__s")), 6).as("min_silhouette"))
  }

  /** Cluster-balanced sampling: deterministic top-`perCluster` vectors per
    * nearest-centroid cluster, ordered by a salted md5 hash (ties by id) —
    * the diversity-balanced subset selection step of embedding-driven data
    * curation (every semantic cluster contributes, no cluster dominates).
    * Assignment is the shuffle-free argmax projection; the only exchange
    * is the per-cluster window, whose input is (id, cluster) pairs — the
    * embedding column is dropped before the shuffle.
    */
  def clusterBalancedSample(corpus: DataFrame, centroids: DataFrame,
      perCluster: Int, salt: String = "clsample"): DataFrame = {
    require(perCluster >= 1, s"perCluster must be >= 1, got $perCluster")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("centroid_id"))
      .orderBy(graft.sampling.Sampling.hashKey(col("vec_id"), lit(salt)).asc,
        col("vec_id").asc)
    assignClusters(corpus, centroids).drop("v")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= perCluster)
  }

  /** IVF search: top-k by cosine among vectors in the query's `nprobe`
    * nearest clusters. Returns the same shape as [[bruteForceKnn]] — recall
    * is approximate by construction and rises with `nprobe` (compared pairs
    * scale as nprobe/|clusters| of brute force).
    *
    * Plan shape: corpus scan → assignment projection → broadcast-hash join
    * with the probe set → cosine projection → partial top-k; the only
    * exchange is the final k-per-group merge in [[topKPerQuery]].
    */
  def ivfKnn(corpus: DataFrame, centroids: DataFrame, queryIds: Seq[Long],
      k: Int, nprobe: Int = 1): DataFrame = {
    val cents = collectCentroids(centroids)
    val assigned = assignWith(corpus, cents)
      .select(col("vec_id").as("neighbor_id"), col("centroid_id"), col("v").as("cvec"))
    // queries probe their top-nprobe clusters (corpus rows keep 1 cluster)
    val probes = corpus.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        explode(Native.nearestCentroids(col("embedding"), cents._1, cents._2, nprobe))
          .as("centroid_id"))
    val scored = assigned
      .join(broadcast(probes), Seq("centroid_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("qvec"), col("cvec")))
    topKPerQuery(scored, k)
  }

  /** Product-quantization codes: `m` centroid ids per vector (one per
    * contiguous subspace), against a plan-constant codebook — the PQ
    * INDEX-BUILD step. Codes are 8 longs where the vector was 64 floats:
    * the compressed representation ADC search scans instead of raw
    * embeddings. Pure narrow projection (fused codegen kernel, no
    * shuffle).
    *
    * The codebook is whatever `centroids` frame is passed — harness
    * queries use the deterministic seed set so the DuckDB oracle can
    * re-derive it; production pipelines pass [[trainCodebook]]'s output
    * (or, for per-subspace codebooks à la FAISS, run [[kmeansStep]] on
    * sliced subvector frames and concatenate — same kernel, better
    * distortion).
    */
  def pqCodes(corpus: DataFrame, centroids: DataFrame, m: Int): DataFrame =
    pqCodesWith(corpus, collectCentroids(centroids), m)

  private def pqCodesWith(corpus: DataFrame,
      cents: (Array[Long], Array[Array[Double]]), m: Int): DataFrame =
    corpus.select(col("vec_id"),
      Native.pqEncode(col("embedding"), cents._1, cents._2, m).as("codes"))

  /** Per-query ADC lookup table: `table(s)(c)` = squared L2 between the
    * query's subvector `s` and centroid `c`'s — the SAME accumulation
    * order as the encode kernel (`d = x−y; acc += d·d`), which is what
    * keeps Spark and the DuckDB oracle bit-identical. Shared by
    * [[pqAdcKnn]] and [[ivfPqKnn]] so a fold-order fix can't miss one.
    */
  private def adcTable(qv: Array[Double],
      cvecs: Array[Array[Double]], m: Int): Array[Array[Double]] = {
    val sub = qv.length / m
    Array.tabulate(m) { s =>
      Array.tabulate(cvecs.length) { c =>
        var d2 = 0.0
        var j = s * sub
        val hi = (s + 1) * sub
        while (j < hi) { val d = qv(j) - cvecs(c)(j); d2 = d2 + d * d; j += 1 }
        d2
      }
    }
  }

  /** Every requested query id must resolve to a corpus vector — a typo'd
    * id silently missing from the result set is a pipeline bug, not data
    * (same fail-fast convention as the kernels' dimension checks).
    */
  private def requireAllQueries(op: String, requested: Seq[Long],
      found: Seq[Long]): Unit = {
    require(requested.nonEmpty, s"$op needs at least one query id")
    val missing = requested.distinct.toSet -- found.toSet
    require(missing.isEmpty,
      s"$op: query ids not present in the corpus: ${missing.toSeq.sorted.mkString(", ")}")
  }

  /** Hard bound on the ad-hoc per-query PQ faces ([[pqAdcKnn]],
    * [[ivfPqKnn]]): they build ONE PLAN BRANCH per collected query and
    * union them, which is the right shape for interactive "neighbors of
    * these few vectors" asks but collapses the driver/optimizer when
    * |queries| grows (hundreds of union branches = quadratic analysis
    * time, one scheduled job per branch). Workloads past this bound must
    * use [[ivfPqKnnBatch]] — same results (SimilaritySpec asserts
    * face-equality), one codes-frame pass regardless of |queries|.
    */
  val MaxAdHocQueries = 64

  private def requireAdHocBound(op: String, queryIds: Seq[Long]): Unit =
    require(queryIds.distinct.size <= MaxAdHocQueries,
      s"$op: ${queryIds.distinct.size} query ids exceeds the per-query-face " +
        s"bound of $MaxAdHocQueries plan branches — use ivfPqKnnBatch, " +
        "which handles any query-table size in one codes-frame pass")

  /** Bounded-heap top-k per query over `(query_id, neighbor_id, adc)`
    * rows, smallest rounded distance first, neighbor-id ties ascending.
    */
  private def topKByAdc(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val agg = graft.plans.TopKByScore(
      ColumnBridge.expression(-col("adc")),
      ColumnBridge.expression(col("neighbor_id")), k)
    scored.groupBy(col("query_id"))
      .agg(ColumnBridge.column(agg.toAggregateExpression()).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.id").as("neighbor_id"),
        (-col("t.score")).as("adc_dist"), (col("pos") + 1).cast("int").as("rnk"))
  }

  /** PQ asymmetric-distance (ADC) top-k search: per query, squared-L2
    * lookup tables against every centroid subvector are computed
    * driver-side (m × |codebook| doubles — model-sized) and swept over the
    * CODES frame by the `pq_adc` kernel; the raw embedding column is never
    * touched after the one-time encode. The codes frame localCheckpoints
    * first — that is the PQ index build; each query then costs one
    * codes-frame scan + the bounded-heap top-k merge ([[topKByAdc]]),
    * never a distance matrix. Ordering on the ROUNDED distance with
    * neighbor-id ties, so ranks are engine-reproducible.
    */
  def pqAdcKnn(corpus: DataFrame, centroids: DataFrame, queryIds: Seq[Long],
      m: Int, k: Int): DataFrame = {
    requireAdHocBound("pqAdcKnn", queryIds)
    val cents = collectCentroids(centroids)
    val (ids, cvecs) = cents
    val dim = cvecs.head.length
    require(dim % m == 0, s"dimension $dim not divisible by m=$m")
    val codes = pqCodesWith(corpus, cents, m).localCheckpoint(true)
    val qs = corpus.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").cast("long"), asDouble(col("embedding")))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    requireAllQueries("pqAdcKnn", queryIds, qs.map(_._1))
    val scored = qs.map { case (qid, qv) =>
      require(qv.length == dim, s"query $qid dimension ${qv.length} != $dim")
      codes.filter(col("vec_id") =!= qid)
        .select(lit(qid).as("query_id"), col("vec_id").as("neighbor_id"),
          round(Native.pqAdc(col("codes"), ids, adcTable(qv, cvecs, m)), 6)
            .as("adc"))
    }.reduce(_.unionByName(_))
    topKByAdc(scored, k)
  }

  /** IVF+PQ search — the standard large-corpus ANN architecture (coarse
    * inverted lists + compressed residual-free codes): the index is ONE
    * narrow projection emitting each vector's coarse cluster (nearest
    * centroid by round-6 cosine) AND its PQ codes, localCheckpointed once;
    * a query probes its `nprobe` nearest clusters and ADC-scans only those
    * lists' codes. Search cost scales with nprobe/|clusters| of the codes
    * frame — at 100 TB the raw embeddings are touched exactly once (index
    * build), every query after that reads 8 longs per candidate.
    */
  def ivfPqKnn(corpus: DataFrame, centroids: DataFrame, queryIds: Seq[Long],
      m: Int, k: Int, nprobe: Int = 2): DataFrame = {
    requireAdHocBound("ivfPqKnn", queryIds)
    val cents = collectCentroids(centroids)
    val (ids, cvecs) = cents
    val dim = cvecs.head.length
    require(dim % m == 0, s"dimension $dim not divisible by m=$m")
    // the IVF-PQ index: (id, coarse list, codes) — embeddings read once
    val index = corpus.select(col("vec_id"),
        element_at(Native.nearestCentroids(col("embedding"), ids, cvecs, 1), 1)
          .as("cid"),
        Native.pqEncode(col("embedding"), ids, cvecs, m).as("codes"))
      .localCheckpoint(true)
    // per-query probe lists (tiny job: |queries| rows)
    val probed = corpus.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").cast("long"),
        Native.nearestCentroids(col("embedding"), ids, cvecs, nprobe),
        asDouble(col("embedding")))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Double](2).toArray))
      .sortBy(_._1)
    requireAllQueries("ivfPqKnn", queryIds, probed.map(_._1))
    val scored = probed.map { case (qid, lists, qv) =>
      require(qv.length == dim, s"query $qid dimension ${qv.length} != $dim")
      index.filter(col("cid").isInCollection(lists) && col("vec_id") =!= qid)
        .select(lit(qid).as("query_id"), col("vec_id").as("neighbor_id"),
          round(Native.pqAdc(col("codes"), ids, adcTable(qv, cvecs, m)), 6)
            .as("adc"))
    }.reduce(_.unionByName(_))
    topKByAdc(scored, k)
  }

  /** Batch IVF+PQ search over a query TABLE — the production face of
    * [[ivfPqKnn]], whose `queryIds` + driver-side `.collect()` + one plan
    * branch per query only fits ad-hoc use (a million-query workload would
    * collapse the driver and the plan). Mirrors
    * [[graft.text.Bm25.topKBatch]]'s shape:
    *
    *  - the index is the same ONE narrow projection (coarse list + codes),
    *    localCheckpointed — raw embeddings are read exactly once;
    *  - the query side is a PROJECTION on the query frame: probe lists
    *    from the `nearest_centroids` kernel, per-query ADC distance
    *    tables from the `adc_table` kernel (m × |codebook| doubles per
    *    query — workload-sized, never corpus-sized), exploded to one row
    *    per (query, probed list);
    *  - that frame broadcasts into ONE codes-frame pass as an equi-join
    *    on the coarse list id, the `pq_adc_dyn` kernel sweeps each
    *    candidate's codes against the joined table, and the bounded-heap
    *    top-k merges per query.
    *
    * For query workloads past broadcast size, run the workload in
    * broadcast-sized slices against the same checkpointed index — the
    * corpus is still scanned once per slice, never per query. A query
    * whose id equals a corpus id is treated as that corpus row asking for
    * neighbors, and is excluded from its own result (the [[ivfPqKnn]]
    * convention, which makes the two faces result-identical on the same
    * probes).
    *
    * Table/fold order is bit-identical to the ad-hoc face: `adc_table`
    * reproduces the driver-side [[adcTable]] accumulation exactly.
    */
  def ivfPqKnnBatch(corpus: DataFrame, centroids: DataFrame,
      queries: DataFrame, queryId: Column, queryVec: Column,
      m: Int, k: Int, nprobe: Int = 2): DataFrame = {
    val cents = collectCentroids(centroids)
    val (ids, cvecs) = cents
    val dim = cvecs.head.length
    require(dim % m == 0, s"dimension $dim not divisible by m=$m")
    val index = corpus.select(col("vec_id"),
        element_at(Native.nearestCentroids(col("embedding"), ids, cvecs, 1), 1)
          .as("cid"),
        Native.pqEncode(col("embedding"), ids, cvecs, m).as("codes"))
      .localCheckpoint(true)
    val probes = queries.select(queryId.cast("long").as("query_id"),
      Native.adcTable(queryVec, ids, cvecs, m).as("__tbl"),
      explode(Native.nearestCentroids(queryVec, ids, cvecs, nprobe)).as("cid"))
    val scored = index.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(Native.pqAdcDyn(col("codes"), col("__tbl"), ids), 6).as("adc"))
    topKByAdc(scored, k)
  }

  /** One Lloyd (k-means) iteration over the corpus — the codebook-training
    * step that turns the ad-hoc IVF centroid seed into a real quantizer
    * (recall at fixed nprobe rises with trained centroids). Assignment is
    * the same shuffle-free broadcast-argmax projection as [[ivfKnn]]; the
    * per-dimension means are 64 declarative partial aggregates (one shuffle
    * of |centroids| rows), not an |corpus|×dim explode.
    *
    * Means quantize each component to an exact integer at 9 decimals before
    * summing ([[graft.analytics.Aggregates.fixedPointAvg]] rationale:
    * integer sums in double are exact at any merge order), so the step is
    * deterministic under any partitioning and oracle-checkable.
    *
    * Returns (centroid_id, dim, mean, cluster_size) exploded per dimension.
    */
  def kmeansStep(corpus: DataFrame, centroids: DataFrame, dim: Int): DataFrame = {
    val cents = collectCentroids(centroids)
    val assigned = assignWith(corpus, cents)
    val sums = (0 until dim).map(i =>
      sum(round(element_at(col("v"), i + 1).cast("double") * 1.0e9)).as(s"__s$i"))
    val aggs = count(lit(1)).as("cluster_size") +: sums
    val agg = assigned.groupBy(col("centroid_id")).agg(aggs.head, aggs.tail: _*)
    val means = array((0 until dim).map(i =>
      round((col(s"__s$i") / 1.0e9) / col("cluster_size"), 6)): _*)
    agg.select(col("centroid_id"), posexplode(means).as(Seq("dim", "mean")),
        col("cluster_size"))
      .select(col("centroid_id"), col("dim"), col("mean"), col("cluster_size"))
  }

  /** Re-assemble [[kmeansStep]]'s exploded output into a centroid frame
    * consumable by [[ivfKnn]]/[[assignClusters]] — (vec_id, embedding).
    * The collect_list is over |centroids|×dim rows (model-sized, never
    * corpus-sized); array_sort on the (dim, mean) struct makes the
    * assembly deterministic regardless of arrival order.
    */
  def codebook(step: DataFrame): DataFrame =
    step.groupBy(col("centroid_id").as("vec_id"))
      .agg(array_sort(collect_list(struct(col("dim"), col("mean")))).as("__dm"))
      .select(col("vec_id"),
        transform(col("__dm"), s => s.getField("mean")).as("embedding"))

  /** Full Lloyd training loop: iterate [[kmeansStep]]→[[codebook]] from a
    * seed centroid frame. Each round's codebook is localCheckpointed — the
    * model frame is |centroids|×dim (megabytes at √n centroids), so the
    * checkpoint is cheap and keeps lineage O(1) instead of stacking every
    * round's plan; at cluster scale a pipeline would persist each codebook
    * to reliable storage instead. Deterministic end to end: assignment is
    * the round-6-cosine argmax projection, means are merge-order-exact
    * fixed-point sums (the [[kmeansStep]] contract the x17 oracle checks).
    */
  def trainCodebook(corpus: DataFrame, seeds: DataFrame, dim: Int,
      iterations: Int): DataFrame = {
    require(iterations > 0, "iterations must be positive")
    var cents = seeds
    var i = 0
    while (i < iterations) {
      cents = codebook(kmeansStep(corpus, cents, dim)).localCheckpoint(true)
      i += 1
    }
    cents
  }

  /** LSH-bucketed cosine near-dup candidate pairs `(id_a < id_b, va, vb)`:
    * vectors sharing a hyperplane-sign bucket pair up, everything else
    * never meets — feed the output to [[graft.dedup.Dedup.cosinePairs]]
    * for the exact verify. Each vector lands in exactly ONE bucket, so
    * pairs are already distinct.
    *
    * Scale guards (the same two that keep the MinHash path
    * `Dedup.cappedBands` bounded at corpus scale):
    *  - the per-bucket `count(*)` window — sharing the self-join's hash
    *    partitioning, no extra exchange — drops degenerate buckets larger
    *    than `maxBucket` (duplicate floods, zero vectors), so the
    *    within-bucket self-join is never quadratic in the corpus;
    *  - the bucket SPACE must scale with the data: expected occupancy is
    *    |corpus|/2^planes under random signs, so a fixed plane count turns
    *    every bucket into n/2^planes and the pair count into
    *    n²/2^planes. Size `planes` with [[planeCountFor]] (the count-based
    *    overload does this) instead of pinning a constant.
    */
  def cosineCandidates(df: DataFrame, id: Column, vec: Column,
      planes: Seq[Seq[Double]], maxBucket: Int = 1000): DataFrame = {
    require(planes.nonEmpty, "cosineCandidates needs at least one plane")
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    val emb = df.select(id.as("vec_id"), asDouble(vec).as("v"))
      .withColumn("bucket", hyperplaneBucket(col("v"), planes))
    val capped = graft.dedup.Dedup.capBuckets(emb, Seq(col("bucket")), maxBucket)
    val a = capped.select(col("bucket"), col("vec_id").as("id_a"), col("v").as("va"))
    val b = capped.select(col("bucket"), col("vec_id").as("id_b"), col("v").as("vb"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("va"), col("vb"))
  }

  /** Group-centroid geometry report: the mean embedding per group (label,
    * source, cluster) and the pairwise cosine between every two group
    * centroids — the corpus-audit view of embedding space ("are my two
    * crawls semantically redundant?", "did this label collapse onto that
    * one?") that sits upstream of mixture and dedup decisions.
    *
    * Determinism: per-dim means use the fixed-point construction
    * (`sum(round(x·1e9))` then divide — merge-order-exact integer sums,
    * the [[kmeansStep]] rationale) and are rounded to 6 dp; the dot and
    * norm sums over dims then run in micro²-units (`round(ca·cb·1e12)` is
    * exactly the integer product of the 6-dp means), so the whole report
    * is bit-stable under any partitioning.
    *
    * Scale shape: one posexplode pass, a (|groups|·dim)-sized aggregate,
    * then all pairwise work happens on the MODEL-sized centroid frame
    * (|groups|·dim rows self-joined on dim, |groups|² output) — corpus
    * size only ever touches the first aggregate, which partial-aggregates
    * map-side.
    */
  def centroidSimilarity(df: DataFrame, group: Column, vec: Column): DataFrame = {
    val cent = df
      .select(group.cast("long").as("g"), posexplode(asDouble(vec)).as(Seq("dim", "x")))
      .groupBy(col("g"), col("dim"))
      .agg((sum(round(col("x") * 1.0e9)) / 1.0e9 / count(lit(1))).as("__m"))
      .select(col("g"), col("dim"), round(col("__m"), 6).as("c"))
      .localCheckpoint(true) // model-sized; feeds three consumers below
    val norms = cent.groupBy(col("g"))
      .agg(sum(round(col("c") * col("c") * 1.0e12)).as("__n2fp"))
    val a = cent.select(col("dim"), col("g").as("label_a"), col("c").as("__ca"))
    val b = cent.select(col("dim"), col("g").as("label_b"), col("c").as("__cb"))
    a.join(b, Seq("dim")).filter(col("label_a") < col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(sum(round(col("__ca") * col("__cb") * 1.0e12)).as("__dotfp"))
      .join(norms.select(col("g").as("label_a"), col("__n2fp").as("__na")), "label_a")
      .join(norms.select(col("g").as("label_b"), col("__n2fp").as("__nb")), "label_b")
      .select(col("label_a"), col("label_b"),
        round(col("__dotfp") / sqrt(col("__na") * col("__nb")), 6).as("cosine"))
  }

  /** Embedding QA report: per group, vector count, zero-norm count,
    * null/ragged count, distinct-dimension count and the norm envelope —
    * the validation gate an embedding table must pass BEFORE any ANN /
    * dedup / centroid stage consumes it (a zero vector silently matches
    * nothing under cosine; a ragged or null row poisons every kernel;
    * norm collapse reveals a broken encoder batch).
    *
    * Determinism: per-row norms are the same sequential-sum kernel the
    * cosine operators use (bit-stable per row); the mean norm is
    * micro-unit fixed-point; min/max are order-free.
    *
    * Scale shape: one corpus scan into a |groups|-sized aggregate —
    * map-side partials for everything including the distinct (dimension
    * cardinality per group is tiny).
    */
  def embeddingQa(df: DataFrame, group: Column, vec: Column): DataFrame = {
    val n = norm(asDouble(vec))
    df.select(group.cast("long").as("label"), n.as("__n"),
        size(vec).as("__d"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        count(when(col("__n") === 0.0, 1)).as("n_zero"),
        count(when(col("__n").isNull, 1)).as("n_bad"),
        countDistinct(col("__d")).as("n_dims_distinct"),
        (sum(round(col("__n") * 1.0e6)) / 1.0e6 / count(lit(1))).as("__mean"),
        round(min(col("__n")), 6).as("min_norm"),
        round(max(col("__n")), 6).as("max_norm"))
      .select(col("label"), col("n_vecs"), col("n_zero"), col("n_bad"),
        col("n_dims_distinct"), round(col("__mean"), 6).as("mean_norm"),
        col("min_norm"), col("max_norm"))
  }

  /** Count-based face of [[cosineCandidates]]: sizes the plane space from
    * a cheap narrow count of `df` via [[planeCountFor]], so bucket
    * occupancy stays near `targetBucketSize` as the corpus grows. Harness
    * queries pass explicit planes (their DuckDB oracles re-derive the same
    * buckets); production pipelines use this.
    */
  def cosineCandidates(df: DataFrame, id: Column, vec: Column, dim: Int,
      targetBucketSize: Long, maxBucket: Int, seed: Long): DataFrame = {
    val n = df.select(id).count()
    cosineCandidates(df, id, vec,
      deterministicPlanes(planeCountFor(n, targetBucketSize), dim, seed),
      maxBucket)
  }

  /** Hyperplane count that keeps expected bucket occupancy near
    * `targetBucketSize`: `⌈log₂(n / target)⌉`, clamped to [1, 62] (bucket
    * ids are sign-bit flags in one long). 10× corpus growth adds ~3–4
    * planes — the bucket space grows WITH the data, keeping within-bucket
    * quadratic work constant instead of letting it grow as n²/2^planes.
    */
  def planeCountFor(n: Long, targetBucketSize: Long): Int = {
    require(targetBucketSize >= 1,
      s"targetBucketSize must be >= 1, got $targetBucketSize")
    val raw = math.ceil(
      math.log(math.max(1.0, n.toDouble / targetBucketSize)) / math.log(2.0)).toInt
    math.min(62, math.max(1, raw))
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

  /** Maximal-marginal-relevance reranking (Carbonell & Goldstein, SIGIR
    * '98): greedily pick `selectK` items per query from a candidate pool,
    * each step taking the argmax of (1−λ)·relevance − λ·max-similarity-to-
    * already-picked — the diversity selector behind "don't show/train-on
    * five near-identical top hits". λ=0 is pure relevance; λ→1 pure
    * diversity. This is the per-query counterpart of corpus-level dedup:
    * x37 drops near-dups globally, MMR keeps them but never SELECTS two.
    *
    * `cands` carries `(query_id, doc_id, rel)` (a retrieval output —
    * workload-sized, the caller bounds the pool); `vecs` carries
    * `(vec_id, embedding)` for the redundancy metric. Candidates missing
    * a vector are dropped (can't score their redundancy).
    *
    * Determinism: relevance, pairwise cosines, and every step's combined
    * score are rounded at 6 BEFORE the per-step argmax, ties break on
    * doc_id — so the greedy path is bit-identical across engines (the
    * [[graft.text.Fusion.rrfFuse]] discipline, applied k times).
    *
    * Scale shape: everything is pool-sized — one join to fetch vectors,
    * one pool×pool per-query cosine frame (|q|·k² rows, never corpus²),
    * then `selectK` rounds of {anti-join, max-sim aggregate, 1-row-per-
    * query window}. The greedy data dependence is inherent to MMR
    * (step i needs picks 1..i−1), so the unrolled fixed-depth plan IS
    * the distributed formulation — queries parallelize, steps do not.
    */
  /** Intra-list similarity: per query, the mean pairwise cosine of a
    * selected doc list — the DIVERSITY meter for [[mmrRerank]] (MMR
    * minimizes exactly this at fixed relevance) and for any curated
    * top-k: a list whose mean pairwise cosine approaches the near-dup
    * band is showing the user the same thing k times. Workload-sized:
    * inputs are selection OUTPUTS (queries × k rows), the pair frame is
    * |q|·k²/2.
    */
  def intraListSimilarity(list: DataFrame, vecs: DataFrame): DataFrame = {
    val v = list.select(col("query_id"), col("doc_id"))
      .join(vecs.select(col("vec_id").as("doc_id"), col("embedding").as("__v")),
        Seq("doc_id"))
    v.select(col("query_id"), col("doc_id").as("__da"), col("__v").as("__va"))
      .join(v.select(col("query_id"), col("doc_id").as("__db"),
        col("__v").as("__vb")), Seq("query_id"))
      .filter(col("__da") < col("__db"))
      .select(col("query_id"), cosine(col("__va"), col("__vb")).as("__s"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_pairs"), round(avg(col("__s")), 6).as("mean_sim"))
  }

  def mmrRerank(cands: DataFrame, vecs: DataFrame, selectK: Int,
      lambda: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(selectK >= 1, s"selectK must be >= 1, got $selectK")
    require(lambda >= 0.0 && lambda <= 1.0,
      s"lambda must be in [0,1], got $lambda")
    val base = cands
      .select(col("query_id"), col("doc_id"),
        round(col("rel").cast("double"), 6).as("rel"))
      .join(vecs.select(col("vec_id").as("doc_id"), col("embedding").as("__v")),
        Seq("doc_id"))
      .localCheckpoint(true) // pool-sized; feeds sims and every step
    val sims = base.select(col("query_id"), col("doc_id").as("__da"),
        col("__v").as("__va"))
      .join(base.select(col("query_id"), col("doc_id").as("__db"),
        col("__v").as("__vb")), Seq("query_id"))
      .filter(col("__da") =!= col("__db"))
      .select(col("query_id"), col("__da"), col("__db"),
        cosine(col("__va"), col("__vb")).as("__s"))
      .localCheckpoint(true)
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("__score").desc, col("doc_id").asc)
    var sel = base.withColumn("__score", col("rel"))
      .withColumn("__rn", row_number().over(wq))
      .filter(col("__rn") === 1)
      .select(col("query_id"), col("doc_id"), lit(1).as("pick"),
        col("__score").as("mmr_score"))
    for (i <- 2 to selectK) {
      val simToSel = sims
        .join(sel.select(col("query_id"), col("doc_id").as("__db")),
          Seq("query_id", "__db"))
        .groupBy(col("query_id"), col("__da").as("doc_id"))
        .agg(max(col("__s")).as("__mx"))
      val pick = base
        .join(sel.select(col("query_id"), col("doc_id")),
          Seq("query_id", "doc_id"), "left_anti")
        .join(simToSel, Seq("query_id", "doc_id"), "left")
        .withColumn("__score", round(
          lit(1.0 - lambda) * col("rel") -
            lit(lambda) * coalesce(col("__mx"), lit(0.0)), 6))
        .withColumn("__rn", row_number().over(wq))
        .filter(col("__rn") === 1)
        .select(col("query_id"), col("doc_id"), lit(i).as("pick"),
          col("__score").as("mmr_score"))
      // Truncate the lineage each step: `sel` is referenced three times per
      // iteration (anti-join, simToSel, union), so an un-checkpointed plan
      // grows ~3^selectK and stalls the driver in analysis past k≈12 even
      // though the data is tiny (queries × i rows). Same discipline as
      // hits()'s per-round normalized frames.
      sel = sel.unionByName(pick).localCheckpoint(true)
    }
    sel
  }

  /** Greedy k-center coreset (Gonzalez 1985, the farthest-point
    * traversal): seed with the minimum id, then k−1 times pick the vector
    * FARTHEST (cosine distance, ties to the smaller id) from everything
    * selected so far. The classic 2-approximation to the k-center cover —
    * the "pick k maximally spread exemplars" selection behind coreset
    * curation and diverse eval-set construction, where top-k-by-score
    * ([[bruteForceKnn]]) or MMR ([[mmrRerank]]) would cluster around one
    * mode.
    *
    * Scale shape: the running min-distance frame is the standard k-center
    * trick — each round joins the corpus against ONLY the newest center
    * (1-row broadcast) and takes `least` with the previous distance, so
    * the total work is k linear passes, not k·|selected|. The argmax is a
    * TakeOrderedAndProject (per-partition 1-row heaps), never a global
    * sort; per-round `localCheckpoint` keeps the plan depth constant in k
    * (the mmrRerank discipline). Emits `(pick, vec_id, radius)` where
    * radius is the chosen point's distance to the prior centers — the
    * k-center covering-radius sequence (null for the seed), which is also
    * the "is k enough" dial: the radius at k bounds every point's
    * distance to its nearest center.
    */
  def kCenterCoreset(df: DataFrame, id: Column, vec: Column,
      k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val v = df.select(id.as("vec_id"), vec.as("__v"))
    val seed = v.orderBy(col("vec_id").asc).limit(1).localCheckpoint(true)
    var sel = seed.select(lit(1).as("pick"), col("vec_id"),
      lit(null).cast("double").as("radius"))
    val dTo = (p: Column) => round(lit(1.0) - cosine(col("__v"), p), 6)
    var md = v
      .crossJoin(broadcast(seed.select(col("__v").as("__p"),
        col("vec_id").as("__pid"))))
      .filter(col("vec_id") =!= col("__pid"))
      .select(col("vec_id"), col("__v"), dTo(col("__p")).as("__d"))
      .localCheckpoint(true)
    for (i <- 2 to k) {
      val pick = md
        .join(sel.select(col("vec_id")), Seq("vec_id"), "left_anti")
        .orderBy(col("__d").desc, col("vec_id").asc).limit(1)
        .localCheckpoint(true)
      sel = sel.unionByName(pick.select(lit(i).as("pick"), col("vec_id"),
        col("__d").as("radius"))).localCheckpoint(true)
      if (i < k) md = md
        .crossJoin(broadcast(pick.select(col("__v").as("__p"))))
        .select(col("vec_id"), col("__v"),
          least(col("__d"), dTo(col("__p"))).as("__d"))
        .localCheckpoint(true)
    }
    sel
  }
}
