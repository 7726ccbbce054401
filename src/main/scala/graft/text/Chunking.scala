package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.Native

/** Document chunking, two granularities:
  *
  *  1. [[slidingChunks]] — fixed-size token windows with a stride (the
  *     RAG-passage / training-window shape; x42);
  *  2. the content-defined (CDC) family below — variable-length chunks
  *     cut by a rolling hash, the SUB-DOCUMENT DEDUP granularity.
  *
  * Content-defined chunking (CDC) — the sub-document dedup granularity
  * (LBFS/rsync family): split every document at rolling-hash boundary
  * positions, fingerprint each variable-length chunk, and find content
  * shared ACROSS documents at chunk granularity. Document-level dedup
  * (exact, MinHash, SimHash tiers) misses a boilerplate block pasted into
  * a million otherwise-distinct pages; winnowing ([[graft.dedup.Dedup]]'s
  * span tier) finds shared spans but with position-sampled fingerprints —
  * CDC instead cuts where the CONTENT says to cut, so an edit inside one
  * chunk never moves any other chunk's boundary, and two documents sharing
  * a paragraph share its chunks bit-for-bit no matter where the paragraph
  * sits in either document.
  *
  * All hashing is exact integer arithmetic (M = 2³¹−1, B = 257, shared
  * with the DuckDB oracle via [[HashM]]/[[HashB]]/`powsSql`), so chunk
  * fingerprints hash-compare across engines. A fingerprint equality is a
  * dedup CANDIDATE (collision odds ~len·2⁻³¹ per pair) — the verify tier,
  * as everywhere in the dedup family, is content comparison on the
  * candidate set.
  *
  * Scale shape: the chunker is one codegen'd kernel scan (O(chars), the
  * window is a constant 8); the chunk table is output-proportional
  * (posexplode, no shuffle); [[sharedChunks]] is ONE hash aggregate keyed
  * on (hash, len) with map-side partials; [[redundancy]] joins the chunk
  * table back to that aggregate WITHOUT a forced broadcast — the shared
  * set is a corpus fraction exactly when dedup matters, so the strategy
  * stays AQE's runtime-sized choice.
  */
object Chunking {

  /** One row per (doc, window): `(doc_id, chunk_idx, chunk_text,
    * n_chunk_tokens)`. `chunk_idx` is 0-based in document order.
    * Fixed-size token windows, configurable stride (overlap = chunk −
    * stride); pure per-row explode, no shuffle; window starts from
    * `sequence(0, n−1, stride)` so every token is covered, the final
    * window runs short rather than re-reading tail tokens twice.
    */
  def slidingChunks(df: DataFrame, id: Column, text: Column,
      chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(strideTokens >= 1 && strideTokens <= chunkTokens,
      s"strideTokens must be in [1, chunkTokens], got $strideTokens")
    val toks = TextAnalysis.tokens(text)
    df.select(id.as("doc_id"), toks.as("__toks"),
        size(toks).as("__n"))
      .select(col("doc_id"), col("__toks"), col("__n"),
        posexplode(sequence(lit(0), col("__n") - 1, lit(strideTokens))))
      .select(col("doc_id"), col("pos").as("chunk_idx"),
        concat_ws(" ", slice(col("__toks"), col("col") + 1, lit(chunkTokens)))
          .as("chunk_text"),
        least(lit(chunkTokens), col("__n") - col("col"))
          .as("n_chunk_tokens"))
  }

  // ── content-defined chunking ──────────────────────────────────────────

  /** Hash modulus / base — mirrored into the oracle SQL. */
  val HashM: Long = 2147483647L
  val HashB: Long = 257L
  /** Default boundary dials: 8-point window, low 6 bits zero → expected
    * chunk length 2⁶ = 64 code points.
    */
  val DefaultWindow: Int = 8
  val DefaultMaskBits: Int = 6
  /** Chunks shorter than this carry too little content to be dedup
    * evidence (a 5-char chunk collides semantically, not just in hash).
    */
  val DefaultMinLen: Int = 16

  /** `B^j mod M` for j in [0, window) — the boundary-hash coefficients,
    * exported so the oracle renders the SAME constants.
    */
  def pows(window: Int): Seq[Long] =
    Iterator.iterate(1L)(p => p * HashB % HashM).take(window).toSeq

  /** `(doc_id, chunk_idx, chunk_len, chunk_hash)` — one row per chunk in
    * document order. Pure projection + posexplode: no shuffle at all.
    */
  def chunkTable(df: DataFrame, id: Column, text: Column,
      window: Int = DefaultWindow, maskBits: Int = DefaultMaskBits): DataFrame =
    df.select(id.as("doc_id"),
        posexplode(Native.cdcChunks(text, window, maskBits))
          .as(Seq("chunk_idx", "__packed")))
      .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
        shiftright(col("__packed"), 31).cast("int").as("chunk_len"),
        (col("__packed") bitwiseAND lit(2147483647L)).as("chunk_hash"))

  /** Cross-document shared chunks: every (hash, len) fingerprint carried
    * by ≥ 2 distinct documents and at least `minLen` code points long,
    * with its document reach and total occurrence count — the boilerplate
    * radar at chunk granularity. One aggregate; |chunks| keyed shuffle.
    */
  def sharedChunks(df: DataFrame, id: Column, text: Column,
      window: Int = DefaultWindow, maskBits: Int = DefaultMaskBits,
      minLen: Int = DefaultMinLen): DataFrame =
    chunkTable(df, id, text, window, maskBits)
      .filter(col("chunk_len") >= minLen)
      .groupBy(col("chunk_hash"), col("chunk_len"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= 2)

  /** Per-document chunk-mass redundancy: of each document's qualifying
    * chunk mass (chunks ≥ `minLen`), the fraction whose fingerprint
    * appears in at least one OTHER document — "how much of this doc is
    * copied from somewhere else", the curation dial between keep, trim
    * (surgical span removal) and drop. Emits
    * `(doc_id, n_chunks, shared_chunks, shared_mass_fraction)`; docs with
    * no qualifying chunks report zero counts and a null fraction.
    *
    * Two keyed shuffles: the (hash, len) reach aggregate, then the join
    * back (left — unshared chunks count in the denominator) and the
    * per-doc aggregate. No forced broadcast: the shared set is a corpus
    * fraction exactly when dedup matters.
    */
  def redundancy(df: DataFrame, id: Column, text: Column,
      window: Int = DefaultWindow, maskBits: Int = DefaultMaskBits,
      minLen: Int = DefaultMinLen): DataFrame = {
    val chunks = chunkTable(df, id, text, window, maskBits)
      .filter(col("chunk_len") >= minLen)
      .localCheckpoint(true) // feeds both the reach aggregate and the join
    val reach = chunks.groupBy(col("chunk_hash"), col("chunk_len"))
      .agg(countDistinct(col("doc_id")).as("__reach"))
    val ids = df.select(id.as("doc_id"))
    ids.join(
        chunks.join(reach, Seq("chunk_hash", "chunk_len"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_chunks"),
            count(when(col("__reach") >= 2, 1)).as("shared_chunks"),
            sum(col("chunk_len").cast("long")).as("__mass"),
            sum(when(col("__reach") >= 2, col("chunk_len").cast("long"))
              .otherwise(0L)).as("__shared_mass")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("shared_chunks"), lit(0L)).as("shared_chunks"),
        round(col("__shared_mass").cast("double") /
          col("__mass").cast("double"), 6).as("shared_mass_fraction"))
  }
}
