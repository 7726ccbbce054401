package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Homoglyph-spoof detection for web corpora (the Unicode TR39 skeleton
  * idea, reduced to the Cyrillic→Latin fold that dominates real spam):
  * an adversarial near-duplicate that swaps Latin letters for visually
  * identical Cyrillic ones defeats every byte-level dedup key — raw,
  * casefold, even the x209 alnum rung — while reading identically to a
  * human and to most tokenizers' UNK buckets. Folding confusables to a
  * SKELETON restores the collision: two documents with equal skeletons
  * but different raw bytes are a spoof pair.
  */
object Confusables {

  /** The high-frequency Cyrillic lowercase letters that are pixel-level
    * confusable with Latin (TR39's intentional set, lowercase slice) and
    * their Latin folds. Kept as parallel strings so the SAME pair drives
    * both [[skeleton]] and the SQL oracle's `translate`.
    */
  val CyrillicConfusable = "аеорсхуі"
  val LatinFold = "aeopcxyi"

  /** Casefold + confusable fold. Character-wise `translate` — no regex,
    * so the skeleton of a 100 TB corpus is one codegen'd projection. */
  def skeleton(text: Column): Column =
    translate(lower(text), CyrillicConfusable, LatinFold)

  /** Spoof-pair report: groups of documents whose skeletons collide but
    * whose raw texts differ. Per group: doc count, distinct raw
    * variants, and how many members actually MIX scripts (Latin letters
    * alongside folded confusables — `lower ≠ skeleton` detects the
    * confusables without a Unicode-range regex, so the test is identical
    * on any engine). Pure-Latin near-dups (same skeleton because the
    * texts differ only in case/confusables they both lack) still
    * surface, with n_mixed = 0.
    *
    * Scale shape: one projection (skeleton), one hash aggregate keyed by
    * skeleton, a cardinality-shrinking HAVING — the exact-dedup cost
    * envelope. No pairs are enumerated; a spoof CLUSTER of any size is
    * one row.
    */
  def spoofGroups(df: DataFrame, id: Column, text: Column): DataFrame = {
    val base = df.select(id.cast("long").as("doc_id"), text.as("__t"))
      .withColumn("__sk", skeleton(col("__t")))
      .withColumn("__mixed",
        (lower(col("__t")) =!= col("__sk")) &&
          lower(col("__t")).rlike("[a-z]"))
    base.groupBy(col("__sk"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__t")).as("n_variants"),
        sum(when(col("__mixed"), 1L).otherwise(0L)).as("n_mixed"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .filter(col("n_variants") > 1)
      .select(col("min_doc"), col("max_doc"), col("n_docs"),
        col("n_variants"), col("n_mixed"),
        length(col("__sk")).as("skeleton_len"))
  }
}
