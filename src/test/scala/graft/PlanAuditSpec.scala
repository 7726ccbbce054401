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
    "s10_ewma_drain", "s11_session_drain", "s12_join_drain",
    "s13_upsert_drain", "s14_enrich_drain", "s15_outer_join_drain")

  // every auditable query's physical plan, constructed ONCE and shared by
  // all lints (construction itself is not free: model-fitting queries run
  // their bounded collects while building the frame)
  private lazy val planned: Seq[(String, org.apache.spark.sql.execution.QueryExecution)] =
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => drains(n) }
      .map { case (name, fn) =>
        name -> fn(spark, "/root/testdata/sf0.001").queryExecution
      }

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
    "x169_rerank_diversity",
    // 1-row broadcast scalars: conformalGate's n_cal frame (against the
    // score spine) and its 1-row threshold (against the eval split).
    // (x172_sinkhorn_plan's kernel/marginal broadcasts run INSIDE its
    // localCheckpoint'd construction, so its audited plan is checkpoint
    // scans + equi-joins — no BNLJ survives to the final plan; the
    // checkpoint-hidden joins have their own unit-level gate below.)
    "x171_conformal_gate",
    // 1-row × 1-row residual-scalar combine per Sinkhorn round (the two
    // max-deviation aggregates joined into one output row)
    "x176_sinkhorn_residual",
    // 1-row broadcast scalar: the exact-F2 audit frame beside the 1-row
    // sketch (production runs the sketch alone — no BNLJ, no groupBy)
    "x177_ams_selfjoin",
    // 1-row corpus total + |epochs| (5-row) competence frame, both
    // broadcast against the |distinct difficulty| spine (non-equi
    // pr ≤ competence)
    "x180_curriculum",
    // 1-row vocab total + |ks| (4-row) dial frame, both broadcast against
    // the |distinct frequency| count-of-counts spine (non-equi boundary
    // bracket)
    "x181_vocab_coverage",
    // 1-row broadcast scalars: the ARI/NMI component frames (pair sums,
    // entropies, MI) combined over the checkpointed contingency spine
    "x184_cluster_agreement",
    // 1-row broadcast normalizer pair (token total + smoothed total)
    // against the vocabulary-sized table
    "x189_negative_sampling",
    // topM-row (15) term frame broadcast against the |sources| totals
    // frame to zero-complete the z-score grid — M is a constant dial
    "x194_burrows_delta",
    // model-sized centroid frame (~√n rows) broadcast against the corpus
    // for the nearest/second-nearest distances — the batch-kNN shape
    "x197_silhouette",
    // 1-row broadcast scalars: the global prior against the row frame
    // (LOO encoding is a projection, the prior is its only global input)
    "x199_loo_encoding",
    // 1-row broadcast scalars: the entity-count frames combined into the
    // one-row B-cubed panel
    "x200_bcubed",
    // 1-row broadcast scalars: operatingPoints' class totals and its
    // best-F1/best-J maxima, both against the |distinct scores| spine
    "x201_operating_point",
    // broadcast 8-probe test set against the corpus — the batch-kNN
    // shape (KNN-Shapley scores every corpus row against each probe)
    "x205_knn_shapley",
    // 1-row broadcast scalars: the four pair-count aggregates combined
    // into the single blocking-audit row
    "x206_blocking_audit",
    // 1-row broadcast scalars: the candidate/covered and true-pair
    // aggregates combined into the single SNM-audit row
    "x211_sorted_neighborhood",
    // 1-row broadcast scalars: the token total against the quality
    // spine, then the 1-row threshold against the per-source aggregate
    "x213_retention_cut",
    // 1-row broadcast scalar: the exact-audit row beside the 1-row
    // estimate (production computes the estimate alone)
    "x215_join_size",
    // 1-row broadcast totals (Σw, n) against the |sources|×|prefixes|
    // grid — the zero-fill frame is dial-sized
    "x214_stride_interleave")

  test("no query plans a cartesian product; BNLJ only on the allowlist") {
    val plans = planned.map { case (n, qe) => n -> qe.executedPlan.toString }
    val cartesian = plans.collect {
      case (n, p) if p.contains("CartesianProduct") => n
    }
    assert(cartesian.isEmpty,
      s"cartesian product planned by: ${cartesian.mkString(", ")}")
    val bnlj = plans.collect {
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

  // every entry plans a Window WITHOUT a PARTITION BY whose input is
  // bounded by construction — the repo's "post-aggregate window
  // contract": the single-partition sort runs over a dial/spine/model
  // sized frame (≤topK cut, |distinct v| jump spine, |groups| caps,
  // |buckets|, |stages|, |partitions|), never the corpus. Checked
  // two-directionally like the BNLJ list. Each entry was read at its
  // source before listing:
  private val boundedGlobalWindow: Set[String] = Set(
    // |groups|/|stations| post-aggregate ranks (Ranking.rankBy,
    // Funnel's |stages| conversion chain)
    "o01_rank_by_aggregate", "a31_funnel",
    // deduplicated DIMENSION rows — buildDim's documented contract
    // (small dims only; buildDimHashed is the large-dim face)
    "j05_star_schema",
    // ≤topK cut pinned by TakeOrderedAndProject + localCheckpoint
    // (Validation.keySkewAudit), count-of-counts spine (skewStrategy)
    "p19_key_skew", "x163_skew_strategy",
    // |groups| caps / |partitions| offsets — the distributed prefix-scan
    // discipline (BudgetSelect.waterFill, Sharding.shardAssign)
    "x102_water_fill", "x132_shard_assign",
    // dial-bounded score/threshold buckets (Dedup.thresholdSweep,
    // TfIdf's Heaps bucket curve)
    "x115_threshold_sweep", "x149_heaps_fit",
    // |categories| concentration ranks (Distribution.concentrationReport)
    "x116_source_concentration",
    // |distinct rounded score| spine (Evaluation.auc midranks)
    "x125_classifier_auc",
    // |distinct v| jump spine / |tests| p-value ranks — Comparison's
    // spine-bounded drift panel (ksDrift, mannWhitney, wasserstein,
    // quantileNormalize, ksFdr) and Temporal.kaplanMeier's duration spine
    "x137_ks_drift", "x150_mann_whitney", "x153_wasserstein",
    "x144_quantile_normalize", "x154_ks_fdr", "x166_kaplan_meier",
    // |distinct round-6 score| calibration spine (Evaluation.conformalGate
    // order statistic). Deliberately KEPT: a GLOBAL threshold needs one
    // ordered pass over the global spine by definition; the per-group
    // face (x174 mondrianGate) partitions the same window by group and
    // needs no entry here
    "x171_conformal_gate",
    // |distinct difficulty| jump spine (Curriculum.schedule's cumulative
    // percentile — the x171 spine discipline, corpus rows touched once)
    "x180_curriculum",
    // |distinct frequency| count-of-counts spine (TfIdf.vocabCoverage's
    // cumulative terms/mass above each class — x163's spine, not a
    // vocabulary rank window)
    "x181_vocab_coverage",
    // |distinct rounded score| spine (Evaluation.operatingPoints'
    // cumulative confusion counts — the x125 spine, corpus touched once)
    "x201_operating_point",
    // |partitions| offsets — the distributed prefix-scan discipline
    // (Entities.sortedNeighborhood's global rank, the x132 shape)
    "x211_sorted_neighborhood",
    // |distinct round-6 quality| jump spine (retentionCut's descending
    // token cumsum — the x171 spine discipline, corpus touched once)
    "x213_retention_cut",
    // |partitions| offsets — the distributed prefix-scan discipline
    // (strideInterleave's global (vt, id) rank, the x132 shape)
    "x214_stride_interleave")

  test("no query plans an unpartitioned window outside the allowlist") {
    // WindowExec with an empty partitionSpec moves its ENTIRE input to
    // one partition — the classic 100 TB cliff. The production libraries
    // already avoid it (x132's budget prefix-scan is distributed for
    // exactly this reason); this lint keeps it that way for all future
    // queries. Audited on sparkPlan (pre-AQE) so the Window nodes are
    // visible to collect().
    val offenders = planned.flatMap { case (name, qe) =>
      val unpart = qe.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
        case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
            if w.partitionSpec.isEmpty => w
      }
      if (unpart.nonEmpty) Some(name) else None
    }.toSet
    val unexpected = offenders -- boundedGlobalWindow
    assert(unexpected.isEmpty,
      s"new unpartitioned Window (verify the input frame is bounded, " +
        s"then allowlist): ${unexpected.mkString(", ")}")
    val stale = boundedGlobalWindow -- offenders
    assert(stale.isEmpty,
      s"allowlist entries no longer planning an unpartitioned window " +
        s"(remove): ${stale.mkString(", ")}")
  }

  test("sinkhorn construction frames plan broadcast joins, not cartesians") {
    // The whole-query lints above audit only the FINAL plan; the Sinkhorn
    // faces' kernel and marginal cross-joins execute EAGERLY inside
    // localCheckpoint during construction, so they are structurally
    // invisible there. This unit-level assertion on the PRE-checkpoint
    // builders closes that blind spot: the 1-row total and the vb spine
    // must ride a BroadcastNestedLoopJoin, never a CartesianProduct —
    // for the marginal AND the kernel, on the builders the composed
    // faces (x172, x176) actually call.
    import org.apache.spark.sql.functions.col
    import graft.analytics.Comparison
    import spark.implicits._
    val df = Seq(("A", 1L), ("A", 2L), ("B", 2L), ("B", 3L)).toDF("g", "v")
    val c = Comparison.sinkhornCounts(df, col("g"), col("v"), "A", "B")
    val a = Comparison.sinkhornMarginalFrame(c, "A", "va", "wa")
    val b = Comparison.sinkhornMarginalFrame(c, "B", "vb", "wb")
    val k = Comparison.sinkhornKernelFrame(a, b, 2.0)
    for ((label, f) <- Seq("marginal" -> a, "kernel" -> k)) {
      val plan = f.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$label frame plans a CartesianProduct:\n$plan")
      assert(plan.contains("BroadcastNestedLoopJoin"),
        s"$label frame lost its broadcast combine (plan shape changed — " +
          s"re-audit):\n$plan")
    }
  }
}
