package graft

/** Global physical-plan lint over EVERY harness query: the plan shapes
  * that kill a 100 TB run must be impossible to introduce silently.
  *
  * `CartesianProduct` (a shuffled all-pairs join) is banned outright — no
  * harness query needs one; every pairwise family here goes through
  * blocked/bucketed candidate generation. `BroadcastNestedLoopJoin` is
  * legitimate in exactly one shape — a BOUNDED frame (a 1-row corpus
  * total, a model-sized query/centroid/threshold set) broadcast against a
  * corpus-scaling frame with no equi-key — so it is allowlisted per
  * query, and the allowlist is checked in BOTH directions: a query
  * growing a new BNLJ fails (it must be consciously added after checking
  * the broadcast side is bounded), and a stale allowlist entry whose
  * query no longer plans one also fails (the list can never rot into
  * blanket permission).
  *
  * Runs against sf0.001 plans: join STRATEGY is decided by Catalyst
  * statistics, and the bounded sides here are bounded by construction
  * (aggregates to one row, fixed literal sets), not by scale factor — so
  * the small-SF plan shape is the 100 TB plan shape for this node class.
  */
class PlanAuditSpec extends SparkSpec {

  // the streaming drains EXECUTE at construction (they run a bounded
  // drain and return the sink's contents — their result plan is a scan);
  // their stateful shapes are audited by their own specs instead
  private val drains = Set("s08_stream_parity", "s09_window_drain",
    "s10_ewma_drain", "s11_session_drain")

  // every entry is a BNLJ whose broadcast side is bounded by construction:
  // 1-row totals (corpus size, gate rates, global quantiles), fixed query
  // sets (kNN probes, BM25 terms), or model-sized frames (|sources|,
  // |splits|, |buckets| rows)
  private val boundedBnlj = Set(
    "a05_capacity_factor", "a36_type_affinity", "j14_ref_integrity",
    "p19_key_skew", "x08_knn_bruteforce", "x09_recall",
    "x100_source_overlap_est", "x101_heldout_surprise", "x102_water_fill",
    "x103_gate_bias", "x104_neardup_recall", "x106_split_chisq",
    "x109_neyman_alloc", "x29_tfidf_topk", "x33_unigram_surprise",
    "x36_bm25_topk", "x38_importance_weights", "x45_bm25_batch",
    "x52_bigram_surprise", "x53_rrf_fusion", "x54_pmi_collocations",
    "x61_temperature_mix", "x71_pq_recall", "x74_kn_surprise",
    "x77_hard_negatives", "x82_semantic_decontaminate",
    "x83_dedup_mixture_shift", "x85_quality_gate_psi",
    "x92_source_divergence",
    // |dims|+1 bruteForceKnn scans: broadcast 5-query set, non-equi
    // (neighbor_id <> query_id) — the batch-kNN shape, bounded build side
    "x122_matryoshka_recall",
    // 1-row broadcast scalars: auc's null-count frame, calibration's
    // bin-total frame, ndcg's BM25 corpus-stats frame
    "x125_classifier_auc", "x127_calibration", "x129_ndcg",
    // two bruteForceKnn passes: broadcast probe/candidate sets (20 rows
    // each), non-equi cosine scan — the batch-kNN shape
    "x124_bitext_margin",
    // 1-row broadcast scalars: t-closeness' corpus total, KS drift's
    // grand total (its |distinct v| spine broadcast rides the same
    // class), modularity's edge-end count
    "x134_t_closeness", "x137_ks_drift", "x139_modularity",
    // 1-row broadcast scalars: quantile-normalize's pooled-total frame,
    // Welch t's grand-moment frame, Fano's spine-hour count
    "x144_quantile_normalize", "x146_welch_t", "x147_fano_burstiness",
    // 1-row broadcast scalars: Heaps' id-range bounds, Mann-Whitney's
    // tie/grand frame, Wasserstein's spine+grand (|distinct v| bounded),
    // KS-FDR's total and m frames, chi2's 2-class totals, CUPED's
    // theta/xbar fit frame
    "x149_heaps_fit", "x150_mann_whitney", "x153_wasserstein",
    "x154_ks_fdr", "x152_chi2_tokens", "x157_cuped",
    // bruteForceKnn arms: broadcast 2-3-query probe sets, non-equi
    // (neighbor_id <> query_id) scan — the batch-kNN shape
    "x151_rank_overlap",
    // x156's raters ride withLangId over the corpus (per-row kernels);
    // its BNLJ is the 1-row class-marginal frame against item moments
    "x156_krippendorff",
    // 1-row broadcast scalars: Benford's digit total, the json-histogram
    // total, Kaplan–Meier's observation-end and at-risk totals
    "x164_benford", "x167_json_props", "x166_kaplan_meier",
    // x169's pool comes from bruteForceKnn: broadcast 3-query probe set,
    // non-equi (neighbor_id <> query_id) scan — the batch-kNN shape
    "x169_rerank_diversity")

  test("no query plans a cartesian product; BNLJ only on the allowlist") {
    val dir = "/root/testdata/sf0.001"
    val planned = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => drains(n) }
      .map { case (name, fn) =>
        name -> fn(spark, dir).queryExecution.executedPlan.toString
      }
    val cartesian = planned.collect {
      case (n, p) if p.contains("CartesianProduct") => n
    }
    assert(cartesian.isEmpty,
      s"cartesian product planned by: ${cartesian.mkString(", ")}")
    val bnlj = planned.collect {
      case (n, p) if p.contains("BroadcastNestedLoopJoin") => n
    }.toSet
    val unexpected = bnlj -- boundedBnlj
    assert(unexpected.isEmpty,
      s"new BroadcastNestedLoopJoin (verify the broadcast side is bounded, " +
        s"then allowlist): ${unexpected.mkString(", ")}")
    val stale = boundedBnlj -- bnlj
    assert(stale.isEmpty,
      s"allowlist entries no longer planning a BNLJ (remove): ${stale.mkString(", ")}")
  }
}
