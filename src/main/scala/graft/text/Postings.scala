package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Inverted-index construction: per-term posting lists with document and
  * collection frequency — the artifact behind [[Bm25]]-style retrieval when
  * the index is SERVED rather than recomputed per query, and the standard
  * layout for search over a frozen training corpus.
  *
  * Scale shape: the (doc, term) frame from [[TfIdf.termCounts]] aggregates
  * once per term. The posting list itself is built by
  * [[graft.plans.TopKByScore]] keyed on negated doc id, so each map task
  * ships AT MOST `maxPostings` ids per term across the shuffle — a
  * `collect_list` + `slice` formulation would ship every (term, doc)
  * pairing of the corpus into one reducer per term before truncating,
  * which is exactly the unbounded-group hazard the bounded heap exists to
  * kill. Posting ids are delta-encoded (first id absolute, then gaps), the
  * standard compression substrate for index serving.
  */
object Postings {

  /** `(term, doc_freq, term_freq, pos, delta)`: for each term with at least
    * `minDf` distinct documents, the first `maxPostings` doc ids in
    * ascending order, delta-encoded (`pos` 0 carries the absolute first
    * id, later positions the gap to the previous id). `doc_freq`/
    * `term_freq` are the FULL corpus counts, not truncated to the emitted
    * prefix.
    */
  def postingLists(df: DataFrame, id: Column, text: Column,
      maxPostings: Int, minDf: Long): DataFrame = {
    require(maxPostings >= 1, s"maxPostings must be >= 1, got $maxPostings")
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    val tc = TfIdf.termCounts(df, id, text)
    val heap = graft.plans.TopKByScore(
      ColumnBridge.expression(-col("doc_id").cast("double")),
      ColumnBridge.expression(col("doc_id").cast("long")), maxPostings)
    val lists = tc.groupBy(col("term"))
      .agg(count(lit(1)).as("doc_freq"),
        sum(col("cnt")).as("term_freq"),
        ColumnBridge.column(heap.toAggregateExpression()).as("__topk"))
      .filter(col("doc_freq") >= minDf)
      // heap order is score desc = doc_id asc — already posting order
      .withColumn("__ids", transform(col("__topk"), t => t.getField("id")))
    lists.select(col("term"), col("doc_freq"), col("term_freq"),
      posexplode(transform(col("__ids"), (x, i) =>
        when(i === 0, x).otherwise(x - element_at(col("__ids"), i))))
        .as(Seq("pos", "delta")))
  }

  /** LEB128 varint byte cost of a non-negative integer value: bit length
    * via the STRING length of the base-2 `conv` (integer/string built-ins
    * only — a float log2 could mis-round at a power of two), divided into
    * 7-bit groups. Shared by [[compressionPlan]] and the `varint_size`
    * SQL function so the two surfaces can never drift.
    *
    * Domain is v >= 0 — ENFORCED with a null result on negative input:
    * Spark's `conv(v,10,2)` renders a negative long as its 64-char two's
    * complement (→ 10 bytes) while DuckDB's `length(bin(v))` sees a
    * '-'-prefixed minimal string, so the engines would disagree.
    * Internal callers only feed non-negative gaps; the guard is for the
    * public `varint_size` SQL surface.
    */
  def varintSize(v: Column): Column = {
    val n = v.cast("long")
    when(n >= 0L, (length(conv(n, 10, 2)) + 6L) / 7L).cast("long")
  }

  /** Index-size planner: per doc-frequency band, the byte cost of the
    * FULL delta-encoded posting lists under LEB128 varints vs raw 8-byte
    * ids — the number that decides whether an inverted index over the
    * corpus fits the serving tier before any index is built. Banding by
    * df (band = bit length of df, so band b holds terms with df in
    * [2^(b−1), 2^b)) separates the two regimes that dominate real
    * indexes: rare terms (large absolute-id gaps, poor compression) and
    * common terms (dense postings, tiny gaps, most of the win).
    *
    * Varint cost of value v is ceil(bitlen(v)/7) with bitlen computed by
    * STRING length of the base-2 `conv` — pure integer/string built-ins,
    * no float log whose libm rounding could flip a byte count at a power
    * of two (DuckDB twin: `length(bin(v))`). The first posting stores the
    * absolute doc id, later positions the gap to the previous id — gaps
    * come from a `lag` window PARTITIONED by term (posting order is the
    * index's own invariant; no global sort).
    *
    * Scale shape: one tokenize pass into [[TfIdf.termCounts]], one
    * partitioned window over the (term, doc) frame, two grouped
    * aggregates ending at |bands| rows. The (term, doc) frame is the
    * index's own size — anything building postings pays it.
    */
  def compressionPlan(df: DataFrame, id: Column, text: Column,
      minDf: Long = 1L): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term")).orderBy(col("doc_id"))
    val gaps = TfIdf.termCounts(df, id, text)
      .select(col("term"), col("doc_id").cast("long").as("doc_id"))
      .withColumn("__v",
        coalesce(col("doc_id") - lag(col("doc_id"), 1).over(w),
          col("doc_id")))
      .withColumn("__bytes", varintSize(col("__v")))
    val perTerm = gaps.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("__bytes")).as("vb"))
      .filter(col("df") >= minDf)
    perTerm
      .withColumn("df_band", length(conv(col("df"), 10, 2)).cast("int"))
      .groupBy(col("df_band"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("df")).as("n_postings"),
        (sum(col("df")) * 8L).as("raw_bytes"),
        sum(col("vb")).as("varint_bytes"))
      .withColumn("ratio",
        round(col("varint_bytes").cast("double") /
          col("raw_bytes").cast("double"), 6))
  }
}
