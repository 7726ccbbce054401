package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph-based keyword extraction — TextRank (Mihalcea & Tarau 2004):
  * PageRank over the word co-occurrence graph. Frequency-based rankings
  * (x29 TF-IDF, x30 vocab stats) score a term by how often it occurs;
  * TextRank scores it by how CENTRAL it is to the corpus's co-occurrence
  * structure — a term that bridges many contexts outranks one that is
  * merely repeated inside a single template, which is exactly the
  * distinction a datacard's "what is this corpus about" field wants.
  */
object Keywords {

  /** Top-`topK` corpus keywords by TextRank over the ADJACENT-token
    * co-occurrence graph (window 2, the paper's default), unweighted and
    * undirected: distinct co-occurring pairs, symmetrized, then
    * [[graft.analytics.Graph.pageRank]]'s fixed-point-integer rounds —
    * ranks are exact longs, so the result is a hash match across engines
    * and partitionings, not a tolerance judgement.
    *
    * Scale shape: one tokenize pass into the (prev, cur) pair stream
    * ([[TfIdf.bigramStream]], the x52/x54 substrate), one distinct down
    * to the vocabulary-bounded edge set (≤ |V|², in practice Zipf-sparse),
    * then `iterations` two-shuffle PageRank rounds on that edge frame and
    * a TakeOrdered cut — nothing row-scaled survives past the distinct.
    */
  def textRank(df: DataFrame, id: Column, text: Column,
      iterations: Int = 5, topK: Int = 15): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val pairs = TfIdf.bigramStream(df, id, text)
      .filter(col("prev") =!= col("cur"))
      .select(col("prev").as("a"), col("cur").as("b")).distinct()
    val und = pairs
      .unionByName(pairs.select(col("b").as("a"), col("a").as("b")))
      .distinct()
    graft.analytics.Graph.pageRank(und, col("a"), col("b"), iterations)
      .orderBy(col("rank_fp").desc, col("node"))
      .limit(topK)
      .select(col("node").as("term"), col("rank_fp"))
  }
}
