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

  /** Initial character segmentation of a word as a marker-delimited symbol
    * string: `"abc"` → `"(a) (b) (c)"`. The parenthesized-symbol encoding
    * is what makes a merge round a LITERAL string replace — `"(l) (r)"` →
    * `"(lr)"` — with exactly BPE's greedy left-to-right non-overlapping
    * semantics (both engines' `replace` scans left to right and resumes
    * after each match) and boundary safety for multi-char symbols (the
    * pattern `"(b) (c)"` can never match inside `"(ab) (c)"` because the
    * open-paren anchors the symbol start). Tokens containing `(`/`)` would
    * alias the markers; both engines alias identically, so determinism
    * holds, but symbol identity assumes marker-free input.
    */
  def segment(term: Column): Column =
    trim(regexp_replace(term, "(.)", "($1) "))

  /** Adjacent symbol-pair counts over a segmented vocabulary frame
    * `(seg, __wc)` — the per-iteration recount of the training loop. The
    * explode runs over the VOCABULARY (≤ |symbols|−1 rows per distinct
    * word), never the corpus; map-side partial sums combine the counts
    * before the single vocabulary-sized shuffle.
    */
  def pairCountsSeg(vocabSeg: DataFrame): DataFrame = {
    val syms = split(col("seg"), " ")
    def strip(c: Column): Column = c.substr(lit(2), length(c) - 2)
    vocabSeg.filter(size(syms) >= 2)
      .select(col("__wc"),
        explode(transform(sequence(lit(1), size(syms) - 1), i =>
          struct(strip(element_at(syms, i)).as("l"),
            strip(element_at(syms, i + 1)).as("r")))).as("__p"))
      .groupBy(col("__p.l").as("lhs"), col("__p.r").as("rhs"))
      .agg(sum(col("__wc")).as("pair_count"))
  }

  /** Full BPE training loop: `numMerges` iterations of
    * recount → argmax → re-segment over the vocabulary frame. Returns the
    * learned merge table `(merge_rank, lhs, rhs, pair_count)` in merge
    * order (stops early if the vocabulary runs out of adjacent pairs).
    *
    * Scale shape: ONE corpus pass ([[wordCounts]]) ever; every iteration
    * after that is vocabulary-sized — a pair recount (two narrow ops + one
    * small shuffle), a 1-row argmax (TakeOrderedAndProject; collected to
    * the driver exactly like [[graft.similarity.Similarity.planeCountFor]]'s
    * bounded scalar action — the merge table IS the model, it lives on the
    * driver by construction), and a literal-replace projection. The
    * re-segmented vocabulary is `localCheckpoint`ed each round so lineage
    * stays O(1) across hundreds of merges — the
    * [[graft.similarity.Similarity.trainCodebook]] pattern.
    */
  def train(df: DataFrame, text: Column, numMerges: Int): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = df.sparkSession
    import spark.implicits._
    var vocab = wordCounts(df, text)
      .select(segment(col("term")).as("seg"), col("__wc"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val top = pairCountsSeg(vocab)
        .orderBy(col("pair_count").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val lhs = top(0).getString(0)
        val rhs = top(0).getString(1)
        merges += ((i + 1, lhs, rhs, top(0).getLong(2)))
        vocab = vocab.select(
            replace(col("seg"), lit(s"($lhs) ($rhs)"), lit(s"($lhs$rhs)"))
              .as("seg"),
            col("__wc"))
          .localCheckpoint(true)
        i += 1
      }
    }
    merges.toSeq.toDF("merge_rank", "lhs", "rhs", "pair_count")
  }

  /** Apply a trained merge table to text — the tokenizer-INFERENCE face of
    * [[train]]: each token is character-segmented and the merges replay in
    * rank order as the same literal `"(l) (r)" → "(lr)"` replaces the
    * training loop used, so a term's encoding is bit-identical to its
    * final training segmentation (each training round applies exactly one
    * merge to the vocabulary with this replace; replaying them in order on
    * a single term performs the identical operations). Emits
    * `(doc_id, encoded, n_pieces)` with `encoded` the space-joined symbol
    * sequence.
    *
    * Scale shape: pure map-only projection — the merge table is the MODEL
    * (driver-held, merges-sized), the replace chain compiles into the
    * per-token lambda, and no shuffle or join touches the corpus. `2 +
    * numMerges` expression nodes per token; for tokenizer-sized merge
    * tables (10k+) callers should pre-encode the DISTINCT vocabulary and
    * broadcast-join it back instead — this face is the exact-replay
    * substrate that pattern builds on.
    */
  def encode(df: DataFrame, id: Column, text: Column,
      merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty, "encode needs at least one merge")
    def applyMerges(seg: Column): Column =
      merges.foldLeft(seg) { case (c, (l, r)) =>
        replace(c, lit(s"($l) ($r)"), lit(s"($l$r)"))
      }
    val pieces = flatten(transform(TextAnalysis.tokens(text), t =>
      transform(split(applyMerges(segment(t)), " "),
        s => s.substr(lit(2), length(s) - 2))))
    df.select(id.as("doc_id"), pieces.as("__pieces"))
      .select(col("doc_id"),
        concat_ws(" ", col("__pieces")).as("encoded"),
        size(col("__pieces")).as("n_pieces"))
  }

  /** Tokenizer-swap audit: encode the corpus under two merge tables (the
    * incumbent and the candidate) and report, per group, the token-count
    * totals, their ratio, and how many documents re-tokenize differently
    * — the numbers a tokenizer upgrade is actually judged on (token-budget
    * shift per source, blast radius of re-encoding). Both encodes are the
    * driver-held-model [[encode]] path (merge tables are model-sized);
    * the combine is two equi-joins on doc id plus one group aggregate.
    */
  def swapAudit(df: DataFrame, id: Column, text: Column, group: Column,
      mergesA: Seq[(String, String)],
      mergesB: Seq[(String, String)]): DataFrame = {
    val a = encode(df, id, text, mergesA)
      .select(col("doc_id"), col("n_pieces").as("__na"))
    val b = encode(df, id, text, mergesB)
      .select(col("doc_id"), col("n_pieces").as("__nb"))
    df.select(id.as("doc_id"), group.as("__g"))
      .join(a, Seq("doc_id")).join(b, Seq("doc_id"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__na")).as("tokens_a"),
        sum(col("__nb")).as("tokens_b"),
        sum(when(col("__na") =!= col("__nb"), 1L).otherwise(0L))
          .as("n_changed"))
      .select(col("__g").as("group"), col("n_docs"), col("tokens_a"),
        col("tokens_b"), col("n_changed"),
        round(col("tokens_b").cast("double") /
          col("tokens_a").cast("double"), 6).as("ratio"))
  }
}
