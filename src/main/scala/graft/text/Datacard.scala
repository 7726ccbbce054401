package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus composition report ("datacard"): per language bucket, how many
  * documents / sources / characters / tokens the corpus holds and what
  * fraction of its text is byte-exact duplicated — the summary table every
  * training-data release publishes and every mixture decision starts from
  * (language weights, per-language dedup pressure, average document size).
  */
object Datacard {

  /** One row per `lang`: doc/source/char/token totals, average tokens per
    * doc, and the exact-duplicate rate `1 - distinct_texts/docs`.
    *
    * Scale shape: a single corpus scan into one hash aggregate keyed by
    * language. The distinct-text count runs over `md5(text)` — a 16-byte
    * digest — so the distinct's shuffle carries hashes, never document
    * bodies (at 100 TB the difference between shuffling ~3 GB and ~100 TB);
    * collisions are cryptographically negligible. Token totals ride the
    * codegen'd [[TextAnalysis.tokenCount]] kernel, no explode.
    */
  def byLang(df: DataFrame, lang: Column, source: Column, text: Column,
      nChars: Column): DataFrame =
    df.select(lang.as("lang"), source.as("__src"),
        nChars.cast("long").as("__nc"),
        TextAnalysis.tokenCount(text).cast("long").as("__nt"),
        md5(text.cast("binary")).as("__h"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__src")).as("n_sources"),
        sum(col("__nc")).as("total_chars"),
        sum(col("__nt")).as("total_tokens"),
        countDistinct(col("__h")).as("n_distinct_texts"))
      .select(col("lang"), col("n_docs"), col("n_sources"),
        col("total_chars"), col("total_tokens"),
        round(col("total_tokens").cast("double") / col("n_docs").cast("double"), 6)
          .as("avg_tokens"),
        round(lit(1.0) - col("n_distinct_texts").cast("double") /
          col("n_docs").cast("double"), 6).as("exact_dup_rate"))

  /** Tokenizer-fertility audit per language: subwords-per-word and
    * chars-per-subword under the 4-chars-per-piece subword model
    * ([[TextAnalysis.subwordCount]]) — the pre-training check for whether
    * a tokenizer will inflate one language's sequence lengths relative to
    * another (fertility is THE standard metric for tokenizer equity
    * across languages; a language at 2× fertility pays 2× compute per
    * word and fits half the text per context window).
    *
    * Scale shape: both counters are per-row codegen'd kernels (no
    * explode), so this is one corpus scan into a |langs|-sized aggregate.
    */
  def tokenizerFertility(df: DataFrame, lang: Column, text: Column,
      nChars: Column): DataFrame =
    df.select(lang.as("lang"),
        TextAnalysis.tokenCount(text).cast("long").as("__w"),
        TextAnalysis.subwordCount(text).as("__sw"),
        nChars.cast("long").as("__nc"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__w")).as("n_words"),
        sum(col("__sw")).as("n_subwords"),
        sum(col("__nc")).as("__chars"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_subwords"),
        round(col("n_subwords").cast("double") / col("n_words").cast("double"), 6)
          .as("fertility"),
        round(col("__chars").cast("double") / col("n_subwords").cast("double"), 6)
          .as("chars_per_subword"))
}
