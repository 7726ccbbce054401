package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.Native

/** Benchmark decontamination: find training documents that share word
  * n-grams with an evaluation/benchmark probe set, so they can be dropped
  * before training (the standard "n-gram collision" decontamination pass
  * every serious pretraining pipeline runs — a model must not train on its
  * own test set).
  *
  * Scale shape: the probe set is small (benchmarks are thousands of docs,
  * the corpus is billions), so its distinct gram set is collected into a
  * broadcast hash join — the corpus side is ONE narrow pass
  * (tokenize→shingle→explode via the native kernels) probed at the scan,
  * with only matching (doc, gram) rows reaching the aggregation. No
  * corpus-side shuffle except the final per-doc count, whose input is
  * bounded by the contamination volume, not the corpus size.
  */
object Decontaminate {

  /** Per-document contamination report: one row per corpus doc sharing at
    * least one distinct word n-gram with any probe doc —
    * `(doc_id, shared_grams, gram_probe_hits)` = how many distinct grams
    * collide, and the total (gram × probe-doc) collision count (a gram
    * found in 3 probe docs contributes 3). Docs absent from the result are
    * clean; [[clean]] applies the drop directly.
    *
    * `gramWidth` defaults to 8, the width serious pretraining pipelines
    * use for benchmark-collision checks: bigrams over-flag massively (any
    * two docs share common word pairs), while 8-grams only collide on
    * genuinely copied spans. Both sides MUST shingle at the same width.
    */
  def contaminationReport(corpus: DataFrame, corpusId: Column,
      corpusText: Column, probes: DataFrame, probeText: Column,
      gramWidth: Int = 8): DataFrame =
    report(corpus, corpusId, corpusText, probes, probeText, gramWidth,
      bloom = None)

  /** Shared core of both variants: corpus-gram projection, probe-gram
    * frequency aggregate, collision join, per-doc report. `bloom`
    * (expectedGrams, fpp), when set, pre-filters the corpus gram stream
    * with a plan-constant bloom filter built from the probe grams — the
    * join that follows removes false positives either way, so the two
    * variants are output-identical by construction (they share one code
    * path AND one DuckDB oracle).
    */
  private def report(corpus: DataFrame, corpusId: Column, corpusText: Column,
      probes: DataFrame, probeText: Column, gramWidth: Int,
      bloom: Option[(Long, Double)]): DataFrame = {
    val cg = corpus.select(corpusId.as("doc_id"),
      explode(Native.shingles(corpusText, gramWidth)).as("gram"))
    val pgRaw = probes
      .select(explode(Native.shingles(probeText, gramWidth)).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("probe_docs_for_gram"))
    val (pg, filtered) = bloom match {
      case None =>
        // probe set broadcasts whole: probe the corpus stream at the join
        (broadcast(pgRaw), cg)
      case Some((expectedGrams, fpp)) =>
        // materialized once (localCheckpoint cuts lineage): the bloom
        // build is an eager action and the fpp-removal join reads the
        // same frame — without this the probe shingle pass would run
        // twice
        val pgMat = pgRaw.localCheckpoint(true)
        val bf = graft.plans.BloomJoin.keyBloom(pgMat, col("gram"),
          expectedGrams, fpp)
        (pgMat, cg.filter(graft.plans.BloomJoin.mightContain(bf, col("gram"))))
    }
    filtered.join(pg, "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("shared_grams"),
        sum(col("probe_docs_for_gram")).as("gram_probe_hits"))
  }

  /** [[contaminationReport]] for probe sets too large to broadcast (a
    * full eval-suite union can be tens of GB of distinct grams): the probe
    * gram frame aggregates once into a serialized bloom filter — a
    * driver-collected, plan-constant artifact like the IVF codebook — and
    * the corpus gram stream is pre-filtered by `might_contain` AT THE SCAN,
    * so the equi-join that removes the fpp leakage shuffles only probable
    * collisions instead of every corpus gram. Output is EXACTLY
    * [[contaminationReport]]'s (the exact join kills false positives);
    * only the shuffle volume changes — the same build/probe machinery as
    * [[graft.plans.BloomJoin]], applied to grams instead of keys.
    *
    * `expectedGrams` sizes the filter: overestimate rather than under
    * (undersizing degrades fpp, never correctness).
    */
  def contaminationReportBloom(corpus: DataFrame, corpusId: Column,
      corpusText: Column, probes: DataFrame, probeText: Column,
      expectedGrams: Long, gramWidth: Int = 8, fpp: Double = 0.01): DataFrame =
    report(corpus, corpusId, corpusText, probes, probeText, gramWidth,
      bloom = Some((expectedGrams, fpp)))

  /** Corpus minus every doc sharing ≥ `minSharedGrams` distinct grams with
    * the probe set (1 = strict: any collision drops the doc).
    */
  def clean(corpus: DataFrame, corpusId: Column, corpusText: Column,
      probes: DataFrame, probeText: Column, minSharedGrams: Long = 1,
      gramWidth: Int = 8): DataFrame = {
    val hits = contaminationReport(corpus, corpusId, corpusText, probes,
        probeText, gramWidth)
      .filter(col("shared_grams") >= minSharedGrams)
      .select(col("doc_id").as("__contaminated"))
    corpus.join(hits, corpusId === col("__contaminated"), "left_anti")
  }

  /** SURGICAL decontamination: instead of dropping every document that
    * overlaps the probe/benchmark set ([[clean]]), remove only the leaked
    * token SPANS and keep the rest of each document — the Lee-et-al.
    * substring machinery pointed across the corpus/probe boundary via
    * [[Dedup.crossSharedSpans]] (probe always the `doc_a` side, corpus
    * always `doc_b` — the side [[Dedup.removeSpans]] removes from).
    * Unlike [[Dedup.removeSpans]] over a corpus (where the lowest-id copy
    * of a span survives), EVERY corpus copy of a probe span is removed —
    * the benchmark text must not survive anywhere in training data.
    * Corpus-corpus pairs are never generated: duplication WITHIN the
    * corpus is the dedup tier's job, not decontamination's, and skipping
    * it is what makes this linear in the corpus for a small probe set.
    * Ids must be disjoint across the two frames (orientation is
    * structural, not id-ordered).
    */
  def surgical(corpus: DataFrame, corpusId: Column, corpusText: Column,
      probes: DataFrame, probeId: Column, probeText: Column,
      minSpanTokens: Int, k: Int = 4, maxBucket: Int = 1000): DataFrame = {
    val c = corpus.select(corpusId.cast("long").as("doc_id"),
      corpusText.as("text"))
    val p = probes.select(probeId.cast("long").as("doc_id"),
      probeText.as("text"))
    val cross = Dedup.crossSharedSpans(p, col("doc_id"), col("text"),
      c, col("doc_id"), col("text"), minSpanTokens, k, maxBucket)
    Dedup.removeSpans(c, col("doc_id"), col("text"), cross)
  }

  /** STREAMING decontamination gate: a pure per-row predicate usable on an
    * unbounded stream (no join, no state store, no watermark) — the probe
    * grams aggregate ONCE (batch, at stream-assembly time) into a
    * plan-constant bloom filter, and each arriving doc is dropped iff ANY
    * of its n-grams probably collides. This is the dual face of [[clean]]
    * for ingestion-time filtering: a row survives ⇔ `exists` finds no
    * probable collision.
    *
    * Semantics caveat, by design: the bloom answers "probably contains",
    * so a ~`fpp` fraction of CLEAN docs is dropped too (one-sided error —
    * contaminated docs are never kept, the safe direction for
    * decontamination). The batch faces stay exact because an equi-join
    * removes false positives; a stream cannot re-join without state, so
    * the gate trades that sliver of recall for statelessness. Size
    * `expectedGrams` generously — undersizing degrades fpp, never lets
    * contamination through.
    */
  def streamingGate(stream: DataFrame, text: Column, probes: DataFrame,
      probeText: Column, expectedGrams: Long, gramWidth: Int = 8,
      fpp: Double = 0.01): DataFrame = {
    val pg = probes
      .select(explode(Native.shingles(probeText, gramWidth)).as("gram"))
      .distinct()
    val bf = graft.plans.BloomJoin.keyBloom(pg, col("gram"), expectedGrams, fpp)
    stream.filter(!exists(Native.shingles(text, gramWidth),
      g => graft.plans.BloomJoin.mightContain(bf, g)))
  }
}
