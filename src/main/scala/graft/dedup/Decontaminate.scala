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
    * least one distinct word-bigram with any probe doc —
    * `(doc_id, shared_grams, gram_probe_hits)` = how many distinct grams
    * collide, and the total (gram × probe-doc) collision count (a gram
    * found in 3 probe docs contributes 3). Docs absent from the result are
    * clean; [[clean]] applies the drop directly.
    *
    * The gram length is fixed at 2 (the repo's shingle kernel) — real
    * pipelines use 8-13-grams for precision; the plan shape is identical
    * (swap the shingle kernel's width).
    */
  def contaminationReport(corpus: DataFrame, corpusId: Column,
      corpusText: Column, probes: DataFrame, probeText: Column): DataFrame = {
    val cg = corpus.select(corpusId.as("doc_id"),
      explode(Native.bigrams(corpusText)).as("gram"))
    val pg = probes
      .select(explode(Native.bigrams(probeText)).as("gram"), lit(1).as("__p"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("probe_docs_for_gram"))
    cg.join(broadcast(pg), "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("shared_grams"),
        sum(col("probe_docs_for_gram")).as("gram_probe_hits"))
  }

  /** Corpus minus every doc sharing ≥ `minSharedGrams` distinct grams with
    * the probe set (1 = strict: any collision drops the doc).
    */
  def clean(corpus: DataFrame, corpusId: Column, corpusText: Column,
      probes: DataFrame, probeText: Column, minSharedGrams: Long = 1): DataFrame = {
    val hits = contaminationReport(corpus, corpusId, corpusText, probes, probeText)
      .filter(col("shared_grams") >= minSharedGrams)
      .select(col("doc_id").as("__contaminated"))
    corpus.join(hits, corpusId === col("__contaminated"), "left_anti")
  }
}
