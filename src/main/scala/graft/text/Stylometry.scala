package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stylometric source comparison — Burrows' delta over the corpus's most
  * frequent terms (the "function words": at the top of a Zipfian corpus
  * frequency is dominated by style-bearing filler, not content). Two
  * sources with near-identical deltas are, with high confidence, the same
  * generator wearing two names — the attribution signal for "is this
  * 'independent' feed actually a mirror/paraphrase mill of that one",
  * complementing content overlap (x98 source signatures catch shared
  * DOCUMENTS; delta catches shared AUTHORSHIP with zero shared text).
  */
object Stylometry {

  /** Pairwise Burrows' delta between sources: per source the relative
    * frequency of each of the corpus's `topM` terms, z-scored per term
    * across sources, and delta(a,b) = mean over terms of |z_a − z_b|.
    * Smaller = more alike in style. Sources MISSING a top term count as
    * frequency 0 (that absence is itself style), so the z-score grid is
    * completed by a broadcast cross join of the distinct sources against
    * the M-row term frame before the left join of observed counts — M is
    * a constant dial, so the grid stays |sources|·M at any corpus size.
    *
    * The topM cut is count-desc with a term-asc tiebreak — a TakeOrdered
    * over the vocabulary-sized corpus count frame, never a global window.
    * Per-term mean/stddev run over a window PARTITIONED by term on the
    * grid. Zero-variance terms contribute z = 0 on every source (they
    * cannot separate styles). Deltas round at 6 dp — the aggregate-merge
    * convention used across the repo.
    *
    * Scale shape: ONE tokenize+explode pass into the (source, term)
    * count frame (checkpointed, vocabulary×|sources| sized); everything
    * downstream — totals, the topM cut, the grid, the pair join — derives
    * from that frame or from M-row broadcasts. Output is
    * |sources|·(|sources|−1)/2 rows; pair work is grid², i.e.
    * (|sources|·M)² only through an equi-join ON TERM, so the join fans
    * out |sources|² per term, the output's own size.
    */
  def burrowsDelta(df: DataFrame, source: Column, text: Column,
      topM: Int = 15): DataFrame = {
    require(topM >= 1, s"topM must be >= 1, got $topM")
    val st = df.select(source.as("source"),
        explode(TextAnalysis.tokens(text)).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val totals = st.groupBy(col("source")).agg(sum(col("__c")).as("__tot"))
    val top = st.groupBy(col("term")).agg(sum(col("__c")).as("__cc"))
      .orderBy(col("__cc").desc, col("term")).limit(topM)
      .select(col("term"))
    val grid = totals.select(col("source"), col("__tot"))
      .crossJoin(broadcast(top))
      .join(st, Seq("source", "term"), "left")
      .withColumn("__f",
        coalesce(col("__c"), lit(0L)).cast("double") /
          col("__tot").cast("double"))
    val w = Window.partitionBy(col("term"))
    val z = grid
      .withColumn("__mu", avg(col("__f")).over(w))
      .withColumn("__sd", stddev_pop(col("__f")).over(w))
      .withColumn("__z", when(col("__sd") > 0,
        (col("__f") - col("__mu")) / col("__sd")).otherwise(lit(0.0)))
      .select(col("source"), col("term"), col("__z"))
    z.select(col("source").as("source_a"), col("term"),
        col("__z").as("__za"))
      .join(z.select(col("source").as("source_b"), col("term"),
        col("__z").as("__zb")), Seq("term"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(round(avg(abs(col("__za") - col("__zb"))), 6).as("delta"))
  }
}
