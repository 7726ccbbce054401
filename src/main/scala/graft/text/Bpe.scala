package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding training substrate: the distributed half of one BPE
  * merge iteration — word-frequency-weighted adjacent symbol-pair counts.
  * Tokenizer training is corpus-scale work exactly once (the word-count
  * pass); every merge iteration after that operates on the VOCABULARY,
  * which is what makes BPE trainable on a 100 TB corpus at all. This
  * operator exposes that decomposition: callers materialize
  * the word-count frame once, then run the pair-count + merge loop over it.
  *
  * Scale shape: one tokenize+explode corpus pass → vocabulary-sized word
  * counts (map-side partials); the pair explode runs over the vocabulary
  * (≤ |word| − 1 rows per DISTINCT word, not per occurrence); the ranked
  * merge candidates plan as TakeOrderedAndProject. The corpus is never
  * rescanned per iteration.
  */
object Bpe {

  /** Vocabulary frame `(term, __wc)` — the once-per-training corpus pass. */
  def wordCounts(df: DataFrame, text: Column): DataFrame =
    df.select(explode(TextAnalysis.tokens(text)).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("__wc"))

  /** Top-`topK` adjacent character-pair merge candidates
    * `(lhs, rhs, pair_count)` weighted by word frequency — the argmax of
    * one BPE iteration (rank 1 is the merge), with deterministic
    * count-desc / lexicographic tie order. Character granularity is the
    * FIRST iteration's symbol alphabet; later iterations would re-segment
    * the vocabulary by the accumulated merge table and re-count, never
    * touching the corpus again.
    */
  def pairCounts(df: DataFrame, text: Column, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val vocab = wordCounts(df, text)
    vocab.filter(length(col("term")) >= 2)
      .select(col("__wc"),
        explode(transform(sequence(lit(1), length(col("term")) - 1), i =>
          struct(col("term").substr(i, lit(1)).as("l"),
            col("term").substr(i + 1, lit(1)).as("r")))).as("__p"))
      .groupBy(col("__p.l").as("lhs"), col("__p.r").as("rhs"))
      .agg(sum(col("__wc")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("lhs").asc, col("rhs").asc)
      .limit(topK)
  }
}
