package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus term statistics: TF-IDF keyword extraction and heavy-hitter
  * vocabulary stats — the "what is this document about / what is in this
  * corpus" tier of a training-data pipeline (topic balancing, keyword-based
  * routing, vocabulary audits before tokenizer training).
  *
  * Scale shape: ONE tokenize+explode pass feeds everything. Per-(doc, term)
  * counts partial-aggregate map-side before their shuffle; document
  * frequency is a second aggregate over the ALREADY-AGGREGATED (doc, term)
  * frame (vocabulary-sized, not corpus-sized); the corpus size joins back
  * as a broadcast scalar. Nothing rescans text and no stage's shuffle
  * exceeds the (doc, term) frame.
  */
object TfIdf {

  /** Per-(doc, term) occurrence counts with the doc's token length carried
    * through the aggregate (`doc_len` is functionally dependent on
    * `doc_id`, so adding it to the grouping adds no exchange).
    */
  def termCounts(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"),
        TextAnalysis.tokenCount(text).as("doc_len"),
        explode(TextAnalysis.tokens(text)).as("term"))
      .groupBy(col("doc_id"), col("doc_len"), col("term"))
      .agg(count(lit(1)).as("cnt"))

  /** Top-`k` terms per document by TF-IDF
    * (`tf = cnt/doc_len`, `idf = ln(N/df)`), ties broken by term order so
    * output is deterministic. The per-doc window runs partitioned by
    * doc_id — top-k never sees more than one document's vocabulary.
    */
  def tfidfTopK(df: DataFrame, id: Column, text: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val tc = termCounts(df, id, text)
    val docFreq = tc.groupBy(col("term"))
      .agg(count(lit(1)).as("__df")) // (doc, term) rows are unique
    val nDocs = df.agg(count(lit(1)).as("__n"))
    val scored = tc.join(docFreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("__tfidf",
        (col("cnt").cast("double") / col("doc_len").cast("double")) *
          log(col("__n").cast("double") / col("__df").cast("double")))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("__tfidf").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("cnt"),
        round(col("__tfidf"), 6).as("tfidf"), col("rank"))
  }

  /** Unigram language-model surprise: per-document mean negative log
    * probability of its tokens under the corpus's own unigram
    * distribution — the cheap proxy for the KenLM-perplexity quality gate
    * (gibberish and off-domain text score high; boilerplate scores low).
    *
    * Same scale shape as TF-IDF: one explode pass, a vocabulary-sized
    * frequency aggregate joined back, corpus token total as a broadcast
    * scalar, then a per-doc mean. Self-scoring keeps it a single-input
    * operator; score against a reference corpus by passing its frequency
    * frame instead.
    */
  def unigramSurprise(df: DataFrame, id: Column, text: Column): DataFrame = {
    val tok = df.select(id.as("doc_id"),
      explode(TextAnalysis.tokens(text)).as("term"))
    val freq = tok.groupBy(col("term")).agg(count(lit(1)).as("__cnt"))
    val total = tok.agg(count(lit(1)).as("__total"))
    tok.join(freq, "term")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(
        round(avg(-log(col("__cnt").cast("double") /
          col("__total").cast("double"))), 6).as("surprise"),
        count(lit(1)).as("n_tokens"))
  }

  /** Corpus-level heavy hitters: the `topK` most frequent terms with total
    * occurrences and document frequency. `orderBy(...).limit(k)` plans as
    * TakeOrderedAndProject — per-partition top-k heaps merged on one
    * reducer, never a global sort — and the input is the vocabulary-sized
    * aggregate, so this survives any corpus size with a bounded vocabulary.
    */
  def vocabStats(df: DataFrame, id: Column, text: Column, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    df.select(id.as("doc_id"), explode(TextAnalysis.tokens(text)).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("occurrences"),
        countDistinct(col("doc_id")).as("doc_freq"))
      .orderBy(col("occurrences").desc, col("term").asc)
      .limit(topK)
  }
}
