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
}
