package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data valuation for curation: which training points (and, aggregated,
  * which sources) actually help a downstream task. Implements the
  * closed-form KNN-Shapley estimator (Jia et al., PVLDB 2019, "Efficient
  * Task-Specific Data Valuation for Nearest Neighbor Algorithms"): for a
  * K-NN classifier utility, the exact Shapley value of every training
  * point w.r.t. one test point has a closed form over the corpus SORTED
  * by distance to that test point —
  *
  *   s_(N) = 1[y_(N) = y_q] / N
  *   s_(i) = s_(i+1) + (1[y_(i)=y_q] − 1[y_(i+1)=y_q]) / K · min(K,i) / i
  *
  * (points indexed nearest-first), and the multi-test value is the mean
  * over test points. No Monte-Carlo over subsets — the O(2^N) Shapley sum
  * collapses to one ranking pass per test point.
  */
object Valuation {

  /** Exact KNN-Shapley value of every corpus row against a small probe
    * (test) set, by cosine similarity: per corpus row, the mean over
    * probes of the closed-form value above. Positive value = the row's
    * presence improves K-NN accuracy on the probes; rows with negative
    * value (mislabeled / off-distribution) are the curation targets.
    *
    * Determinism contract: cosine rounds at 6 dp BEFORE ranking (ties
    * break on corpus id ascending, so both engines rank identically);
    * each per-rank TERM quantizes to a 1e-12 long (the term is one
    * arithmetic expression over exact inputs, so both engines round the
    * identical double), making the suffix sum and the cross-probe total
    * INTEGER-exact at any fold order — a double window sum would differ
    * in ulps across engines (DuckDB aggregates windows via a segment
    * tree, pairwise, not sequentially) and flip a 1e-6 rounding
    * boundary. Σ|term| is O(ln N), so the 1e-12 total stays far under
    * 2⁶³ at any corpus size, and the quantization bias (≤ 5e-13 · N
    * terms) sits orders below the 6-dp reporting precision.
    *
    * Scale shape: probes are SMALL and broadcast (the brute-force-kNN
    * contract); the corpus is scanned once into |corpus|×|probes| scored
    * rows; ranking + the recurrence run in a window PARTITIONED BY probe
    * (each probe's partition sorts |corpus| rows — |probes|-way
    * parallel). The exact estimator inherently ranks the whole corpus
    * per probe, so at 100 TB you run it the way the paper does: over a
    * uniform corpus sample (x64 reservoir: Shapley values of a sample
    * estimate the sample-inclusive values) and/or more probes for
    * parallelism; the per-probe sort itself never crosses probes.
    *
    * Output: (vec_id, label, n_probes, shapley) — shapley rounded at 6.
    */
  def knnShapley(corpus: DataFrame, probes: DataFrame, id: Column,
      label: Column, vec: Column, qid: Column, qlabel: Column, qvec: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val c = corpus.select(id.cast("long").as("vec_id"),
      label.cast("long").as("label"), vec.as("__v"))
    val q = probes.select(qid.cast("long").as("__qid"),
      qlabel.cast("long").as("__qlabel"), qvec.as("__qv"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"), col("__qid"),
        graft.similarity.Similarity.cosine(col("__v"), col("__qv"))
          .as("__cos"),
        when(col("label") === col("__qlabel"), 1.0).otherwise(0.0)
          .as("__m"))
    // nearest-first rank per probe; ties (round-6 cosine) break on id
    val order = Window.partitionBy(col("__qid"))
      .orderBy(col("__cos").desc, col("vec_id").asc)
    val n = Window.partitionBy(col("__qid"))
    val ranked = scored
      .withColumn("__i", row_number().over(order))
      .withColumn("__n", count(lit(1)).over(n))
      .withColumn("__mnext", lead(col("__m"), 1).over(order))
    // per-rank term of the telescoped recurrence: the farthest point
    // contributes match/N, every other rank i contributes
    // (match_i − match_{i+1})/K · min(K,i)/i; s_i is the suffix sum
    val kd = lit(k.toDouble)
    val term = when(col("__i") === col("__n"),
        col("__m") / col("__n").cast("double"))
      .otherwise((col("__m") - col("__mnext")) / kd *
        least(kd, col("__i").cast("double")) / col("__i").cast("double"))
    val suffix = Window.partitionBy(col("__qid"))
      .orderBy(col("__i").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perProbe = ranked
      .withColumn("__tq", round(term * 1e12).cast("long"))
      .withColumn("__sq", sum(col("__tq")).over(suffix))
      .select(col("vec_id"), col("label"), col("__sq"))
    perProbe.groupBy(col("vec_id"), col("label"))
      .agg(count(lit(1)).as("n_probes"), sum(col("__sq")).as("__t"))
      .select(col("vec_id"), col("label"), col("n_probes"),
        round(col("__t").cast("double") /
          (col("n_probes").cast("double") * 1e12), 6).as("shapley"))
  }

  /** Blocking-strategy audit for entity resolution, computed WITHOUT
    * enumerating a single candidate pair: given each record's blocking
    * key and its (evaluation-time) true entity, every pair count comes
    * from a size histogram —
    *
    *   total pairs      = C(n, 2)
    *   candidate pairs  = Σ_blocks C(|b|, 2)
    *   true pairs       = Σ_entities C(|e|, 2)
    *   covered pairs    = Σ_(block, entity) C(|be|, 2)
    *
    * (records here carry ONE key each, so a true pair is a candidate iff
    * both records share the key — the multi-key generalization unions
    * key tables first and dedups pairs, which this audit deliberately
    * avoids pricing). The three ER planning numbers follow: reduction
    * ratio 1 − cand/total (how much work blocking saves), pairs
    * completeness covered/true (recall ceiling any matcher inherits),
    * pairs quality covered/cand (how much of the candidate budget is
    * real signal).
    *
    * Scale: three grouped counts and a 1-row combine — no pair is ever
    * materialized, so the audit costs the same whether the blocking is
    * good or catastrophic (a degenerate all-one-block key at 10⁹ records
    * would OOM any enumerate-then-count audit at 10¹⁸ pairs; here it is
    * a single C(n,2) term).
    */
  def blockingAudit(df: DataFrame, id: Column, blockKey: Column,
      truth: Column): DataFrame = {
    val base = df.select(id.as("__id"), blockKey.as("__b"),
      truth.as("__t"))
    def pairs(c: Column): Column = (c * (c - 1L) / lit(2L)).cast("long")
    val tot = base.agg(count(lit(1)).as("n"))
      .select(col("n"), pairs(col("n")).as("total_pairs"))
    val cand = base.groupBy(col("__b")).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(pairs(col("c"))), lit(0L)).as("candidate_pairs"),
        count(lit(1)).as("n_blocks"))
    val tru = base.groupBy(col("__t")).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(pairs(col("c"))), lit(0L)).as("true_pairs"))
    val cov = base.groupBy(col("__b"), col("__t"))
      .agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(pairs(col("c"))), lit(0L)).as("covered_pairs"))
    // degenerate denominators (a 1-record corpus, an all-unique truth, a
    // blocking with no co-located pair) read NULL, not a crash — ANSI
    // division throws on zero
    def ratio(a: Column, b: Column): Column =
      round(when(b =!= 0L, a.cast("double") / b.cast("double")), 6)
    tot.crossJoin(broadcast(cand)).crossJoin(broadcast(tru))
      .crossJoin(broadcast(cov))
      .select(col("n"), col("n_blocks"), col("total_pairs"),
        col("candidate_pairs"), col("true_pairs"), col("covered_pairs"),
        round(lit(1.0) - when(col("total_pairs") =!= 0L,
          col("candidate_pairs").cast("double") /
            col("total_pairs").cast("double")), 6).as("reduction_ratio"),
        ratio(col("covered_pairs"), col("true_pairs"))
          .as("pairs_completeness"),
        ratio(col("covered_pairs"), col("candidate_pairs"))
          .as("pairs_quality"))
  }
}
