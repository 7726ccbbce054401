package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher/C4-style document quality RULES: where [[TextAnalysis.qualityScore]]
  * blends signals into one number, real pretraining pipelines gate on
  * individual named rules and keep the per-rule verdicts for corpus
  * diagnostics ("12% dropped for word count, 3% for all-symbol words").
  * Emitting one boolean per rule (not just the conjunction) is what makes a
  * filter sweep auditable after the fact.
  *
  * All rules are single-pass column expressions over the text — no UDFs, no
  * shuffle; the 100 TB cost is one codegen'd scan. Thresholds follow the
  * published Gopher filter family (word-count bounds, mean-word-length
  * bounds, minimum distinct stopwords, alphabetic-word ratio, bullet /
  * ellipsis line caps), parameterized so a pipeline can tighten per corpus.
  */
object QualityRules {

  /** Tunable thresholds; defaults are the Gopher-paper-style settings
    * scaled to short documents.
    */
  case class Thresholds(
      minWords: Int = 25, maxWords: Int = 80,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      minDistinctStopwords: Int = 2,
      minAlphaWordRatio: Double = 0.8,
      maxBulletLineRatio: Double = 0.9,
      maxEllipsisLineRatio: Double = 0.3)

  /** Per-rule verdict report: input columns + one boolean per rule +
    * `passes_all`. Rule columns:
    *  - `ok_word_count`:  minWords <= tokens <= maxWords
    *  - `ok_word_len`:    mean token length within bounds
    *  - `ok_stopwords`:   >= minDistinctStopwords distinct stopwords appear
    *  - `ok_alpha_words`: >= minAlphaWordRatio of tokens contain a letter
    *  - `ok_lines`:       bullet-started and ellipsis-ended line ratios
    *                      under their caps
    */
  def report(df: DataFrame, id: Column, text: Column,
      t: Thresholds = Thresholds(),
      stopwords: Seq[String] = TextAnalysis.defaultStopwords): DataFrame = {
    val toks = TextAnalysis.tokens(text)
    val nWords = TextAnalysis.tokenCount(text)
    val meanLen = TextAnalysis.avgTokenLen(text)
    val nStop = size(array_intersect(array_distinct(toks),
      array(stopwords.map(lit): _*)))
    val alphaRatio =
      size(filter(toks, tk => tk.rlike("[a-z]"))).cast("double") /
        greatest(nWords, lit(1)).cast("double")
    val lines = split(text, "\n")
    val nLines = greatest(size(lines), lit(1)).cast("double")
    val bulletRatio =
      size(filter(lines, l => trim(l).rlike("^[-*•]"))).cast("double") / nLines
    val ellipsisRatio =
      size(filter(lines, l => trim(l).rlike("(\\.\\.\\.|…)$"))).cast("double") / nLines

    val okWords = nWords >= t.minWords && nWords <= t.maxWords
    val okLen = meanLen >= t.minMeanWordLen && meanLen <= t.maxMeanWordLen
    val okStop = nStop >= t.minDistinctStopwords
    val okAlpha = alphaRatio >= t.minAlphaWordRatio
    val okLines = bulletRatio <= t.maxBulletLineRatio &&
      ellipsisRatio <= t.maxEllipsisLineRatio

    df.select(id.as("doc_id"),
      nWords.as("n_words"),
      round(meanLen, 6).as("mean_word_len"),
      nStop.as("n_distinct_stopwords"),
      okWords.as("ok_word_count"),
      okLen.as("ok_word_len"),
      okStop.as("ok_stopwords"),
      okAlpha.as("ok_alpha_words"),
      okLines.as("ok_lines"),
      (okWords && okLen && okStop && okAlpha && okLines).as("passes_all"))
  }

  /** The gate itself: input rows whose report passes every rule. */
  def filterPassing(df: DataFrame, id: Column, text: Column,
      t: Thresholds = Thresholds(),
      stopwords: Seq[String] = TextAnalysis.defaultStopwords): DataFrame = {
    val keep = report(df, id, text, t, stopwords)
      .filter(col("passes_all")).select(col("doc_id").as("__keep"))
    df.join(keep, id === col("__keep"), "left_semi")
  }
}
