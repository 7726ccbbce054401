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

  /** Per-document token-distribution diagnostics: Shannon entropy of the
    * word histogram, entropy normalized by its `ln(n_distinct)` maximum,
    * and type-token ratio — the lexical-diversity tier of the quality
    * ladder. Near-zero normalized entropy means one token dominates
    * (keyword-stuffing / SEO spam that the x28 repetition rule can miss
    * when the repeats are non-adjacent); a TTR near 1 with high entropy is
    * natural prose. These are standard corpus-filter signals (Gopher-style
    * rules threshold exactly these quantities).
    *
    * Scale shape: rides [[termCounts]] — one tokenize+explode pass,
    * (doc, term) counts partial-aggregated map-side, then a per-doc
    * aggregate over the already-aggregated frame. Nothing holds a whole
    * document's tokens in one row.
    */
  def tokenEntropy(df: DataFrame, id: Column, text: Column): DataFrame = {
    val p = col("cnt").cast("double") / col("doc_len").cast("double")
    termCounts(df, id, text)
      .groupBy(col("doc_id"), col("doc_len").as("n_tokens"))
      .agg(count(lit(1)).as("n_distinct"),
        sum(-p * log(p)).as("__h"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        round(col("__h"), 6).as("entropy"),
        round(when(col("n_distinct") > 1,
          col("__h") / log(col("n_distinct").cast("double")))
          .otherwise(lit(0.0)), 6).as("norm_entropy"),
        round(col("n_distinct").cast("double") / col("n_tokens").cast("double"), 6)
          .as("ttr"))
  }

  /** Per-source unigram KL divergence from the corpus distribution:
    * `KL(source ‖ corpus) = Σ_t p_s(t)·ln(p_s(t)/p_c(t))` — the
    * mixture-diagnostics number that ranks which feeds are lexically
    * off-center (a crawl of code or boilerplate stands out immediately)
    * and the information-theoretic complement of the share-based x83 and
    * bucket-based x85 drift reports. No smoothing is needed: every
    * source term is by construction in the corpus, so p_c > 0 wherever
    * p_s > 0.
    *
    * Scale shape: ONE tokenize+explode pass into the (source, term)
    * count frame (checkpointed — vocabulary×|sources| sized); corpus
    * term counts, per-source totals and the corpus total all derive from
    * THAT frame by further aggregation, so the corpus text is scanned
    * exactly once; totals join back broadcast.
    */
  def sourceDivergence(df: DataFrame, source: Column, text: Column): DataFrame = {
    val st = df.select(source.as("source"),
        explode(TextAnalysis.tokens(text)).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val ct = st.groupBy(col("term")).agg(sum(col("__c")).as("__cc"))
    val stot = st.groupBy(col("source")).agg(sum(col("__c")).as("__st"))
    val ctot = st.agg(sum(col("__c")).as("__ct"))
    val ps = col("__c").cast("double") / col("__st").cast("double")
    val pc = col("__cc").cast("double") / col("__ct").cast("double")
    st.join(ct, "term")
      .join(broadcast(stot), "source")
      .crossJoin(broadcast(ctot))
      .groupBy(col("source"), col("__st").as("n_tokens"))
      .agg(round(sum(ps * log(ps / pc)), 6).as("kl"))
  }

  /** Held-out unigram surprise: Laplace-smoothed negative log likelihood
    * of each EVAL-split document under a model counted ONLY on the
    * TRAIN split — the leakage-free eval loop that [[unigramSurprise]]'s
    * self-scoring is not (a doc scored under counts that include itself
    * is biased low, and the bias grows exactly for the rare-token docs a
    * quality gate most needs to rank correctly). The split is the
    * deterministic hash-bucket rule the x19 splitter uses (salt
    * `"heldout"`, cutoff `trainPerMille` of [[graft.sampling.Sampling.Buckets]]),
    * so the partition is reproducible and engine-mirrorable. Smoothing:
    * `p(t) = (cnt(t)+1)/(total+V)` with `V` = train vocabulary size —
    * out-of-vocabulary tokens get the finite floor `1/(total+V)` and are
    * counted per doc (`n_oov`, the coverage signal).
    *
    * Scale shape: one explode over train into a vocabulary-sized count
    * frame; scalars (total, V) derive from THAT frame and ride back as
    * one broadcast; eval docs explode once and left-join the vocabulary.
    */
  def heldoutSurprise(df: DataFrame, id: Column, text: Column,
      trainPerMille: Int = 8000): DataFrame = {
    require(trainPerMille > 0 && trainPerMille < graft.sampling.Sampling.Buckets,
      s"trainPerMille must be in (0, ${graft.sampling.Sampling.Buckets})")
    val bucket = graft.sampling.Sampling.hashBucket(id, "heldout")
    val toks = df.select(id.as("doc_id"), bucket.as("__b"),
      explode(TextAnalysis.tokens(text)).as("term"))
    val train = toks.filter(col("__b") < trainPerMille)
    val counts = train.groupBy(col("term")).agg(count(lit(1)).as("__cnt"))
      .localCheckpoint(true)
    val scalars = counts.agg(sum(col("__cnt")).as("__total"),
      count(lit(1)).as("__V"))
    val p = (coalesce(col("__cnt"), lit(0L)) + lit(1L)).cast("double") /
      (col("__total") + col("__V")).cast("double")
    toks.filter(col("__b") >= trainPerMille)
      .join(counts, Seq("term"), "left")
      .crossJoin(broadcast(scalars))
      .groupBy(col("doc_id"))
      .agg(round(avg(-log(p)), 6).as("surprise"),
        count(lit(1)).as("n_tokens"),
        count(when(col("__cnt").isNull, 1)).as("n_oov"))
  }

  /** Per-source signature phrases: the top-`k` bigrams of each source by
    * occurrence count (ties → lexicographic) — the quick-look answer to
    * "what is this feed actually full of" that catches boilerplate
    * headers and template phrases a vocabulary-level view (x30) averages
    * away. The per-source twin of the corpus heavy-hitters report.
    *
    * Scale shape: one tokenize pass, bigram counts partial-aggregate
    * map-side to a (source, bigram) frame; the ranking window runs over
    * that ALREADY-AGGREGATED frame (per-source vocabulary, not corpus
    * rows), the same post-aggregate window contract as tfidfTopK.
    */
  def signaturePhrases(df: DataFrame, source: Column, text: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = df
      .select(source.as("source"), TextAnalysis.tokens(text).as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(col("source"),
        explode(transform(sequence(lit(1), size(col("__t")) - 1), i =>
          concat(element_at(col("__t"), i), lit(" "),
            element_at(col("__t"), i + 1)))).as("bigram"))
      .groupBy(col("source"), col("bigram")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("cnt").desc, col("bigram").asc)
    counts.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Per-source n-gram diversity: distinct-unigram and distinct-bigram
    * ratios — the self-BLEU-style mode-collapse diagnostic that matters
    * most for SYNTHETIC data feeds (a generator stuck in a template
    * produces fluent, quality-gate-passing text whose cross-document
    * bigram diversity collapses; per-document signals like x87 entropy or
    * the x28 repetition rule cannot see it because every single document
    * looks fine). Low bi_diversity with normal uni_diversity is the
    * template-generator signature.
    *
    * Scale shape: one scan, two explodes off the same tokenized
    * projection; both counts are per-source aggregates whose distincts
    * partial-aggregate map-side. Bigram keys travel as one
    * separator-joined string, not a struct — half the shuffle width.
    * Sources whose documents are all shorter than two tokens report
    * bigram diversity as null (undefined, not 0 or 1).
    */
  def ngramDiversity(df: DataFrame, key: Column, text: Column): DataFrame = {
    val toks = df.select(key.as("source"), TextAnalysis.tokens(text).as("__t"))
    val us = toks.select(col("source"), explode(col("__t")).as("term"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("term")).as("n_distinct_tokens"))
    val bs = toks.filter(size(col("__t")) >= 2)
      .select(col("source"),
        explode(transform(sequence(lit(1), size(col("__t")) - 1), i =>
          concat(element_at(col("__t"), i), lit("\u001e"),
            element_at(col("__t"), i + 1)))).as("__bg"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_bigrams"),
        countDistinct(col("__bg")).as("n_distinct_bigrams"))
    us.join(bs, Seq("source"), "left")
      .select(col("source"), col("n_tokens"), col("n_distinct_tokens"),
        round(col("n_distinct_tokens").cast("double") /
          col("n_tokens").cast("double"), 6).as("uni_diversity"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_distinct_bigrams"), lit(0L)).as("n_distinct_bigrams"),
        when(col("n_bigrams") > 0,
          round(col("n_distinct_bigrams").cast("double") /
            col("n_bigrams").cast("double"), 6)).as("bi_diversity"))
  }

  /** Positional (doc_id, prev, cur) bigram stream — one narrow
    * sequence-of-structs explode per doc; shared by the bigram LM and the
    * PMI collocation operators so their token pairing can never drift.
    */
  private[text] def bigramStream(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"), TextAnalysis.tokens(text).as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("__t")) - 1), i =>
          struct(element_at(col("__t"), i).as("prev"),
            element_at(col("__t"), i + 1).as("cur")))).as("__b"))
      .select(col("doc_id"), col("__b.prev").as("prev"), col("__b.cur").as("cur"))

  /** Unigram frequency frame (term, __uc), checkpointed: it is
    * vocabulary-sized, and the token total derives from it by one more
    * aggregate — the corpus explode behind it runs exactly once.
    */
  private def unigramCounts(df: DataFrame, text: Column): DataFrame =
    df.select(explode(TextAnalysis.tokens(text)).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("__uc"))
      .localCheckpoint(true)

  /** Interpolated bigram language-model surprise — the next rung above
    * [[unigramSurprise]] on the KenLM-perplexity ladder: per document, the
    * mean negative log of `λ·p(cur|prev) + (1−λ)·p(cur)` over its token
    * bigrams, self-scored against the corpus's own counts. The unigram
    * back-off keeps unseen-in-context tokens finite; word-salad text
    * (every bigram rare relative to its parts) scores high where
    * repetitive boilerplate scores low — a sharper quality gate than
    * unigram frequency alone, which is blind to word ORDER.
    *
    * Scale shape: everything derivable derives from TWO checkpointed
    * vocabulary-sized aggregates — pair counts (histories = their
    * per-prev sums) and unigram counts (token total = their sum) — so the
    * corpus is scanned once for each stream plus once for the scoring
    * join; no aggregate re-runs the tokenize. The scoring join picks up
    * each LM piece on the shuffle key the stream already needs, and the
    * token total rides in as one broadcast scalar.
    */
  def bigramSurprise(df: DataFrame, id: Column, text: Column,
      lambda: Double = 0.75): DataFrame = {
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    val big = bigramStream(df, id, text)
    val bfAll = big.groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).as("__bc"))
      .localCheckpoint(true)
    val hf = bfAll.groupBy(col("prev")).agg(sum(col("__bc")).as("__hc"))
    val uf = unigramCounts(df, text)
    val total = uf.agg(sum(col("__uc")).as("__tt"))
    val p = lit(lambda) * (col("__bc").cast("double") / col("__hc").cast("double")) +
      lit(1.0 - lambda) * (col("__uc").cast("double") / col("__tt").cast("double"))
    // score the VOCABULARY frame, then join the occurrence stream ONCE:
    // histories/unigrams/total attach to bigram TYPES (all
    // vocabulary-sized frames), so the corpus-sized stream crosses exactly
    // one join instead of three. Per-type doubles are the same expression
    // tree as before, so per-occurrence values are bit-identical; round-6
    // absorbs the avg's partial-merge jitter (the x38 argument).
    val typeScored = bfAll
      .join(hf, Seq("prev"))
      .join(uf.select(col("term").as("cur"), col("__uc")), Seq("cur"))
      .crossJoin(broadcast(total))
      .select(col("prev"), col("cur"), (-log(p)).as("__nlp"))
    big.join(typeScored, Seq("prev", "cur"))
      .groupBy(col("doc_id"))
      .agg(round(avg(col("__nlp")), 6).as("surprise"),
        count(lit(1)).as("n_bigrams"))
  }

  /** Interpolated Kneser–Ney bigram surprise — the smoothing KenLM
    * actually ships, one rung above [[bigramSurprise]]'s linear
    * interpolation: instead of backing off to RAW unigram frequency, the
    * lower-order weight goes to the CONTINUATION probability
    * `p_cont(w) = |{v : c(v,w) > 0}| / |bigram types|` — how many distinct
    * contexts a word follows, not how often it occurs. The classic
    * motivation: "francisco" is frequent but follows almost nothing except
    * "san", so raw-frequency back-off badly overestimates it in fresh
    * contexts while KN does not.
    *
    * {{{
    *   p_kn(w|v) = max(c(v,w) − d, 0)/c(v·) + d·N1+(v,·)/c(v·) · p_cont(w)
    * }}}
    *
    * Self-scored against the corpus's own counts, so every scored bigram
    * has c(v,w) ≥ 1 and the probability is always finite — no unseen-mass
    * edge case in this face. Per doc: mean −log p over its bigrams.
    *
    * Scale shape: the [[bigramSurprise]] discipline exactly — ONE
    * checkpointed pair-count frame; histories, continuation counts, and
    * the type total all derive from it by vocabulary-sized aggregates
    * (the corpus explode runs once); the scoring joins ride the keys the
    * bigram stream already shuffles on, and the type total is one
    * broadcast scalar.
    */
  def kneserNeySurprise(df: DataFrame, id: Column, text: Column,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"discount must be in (0,1), got $discount")
    val big = bigramStream(df, id, text)
    val bfAll = big.groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).as("__bc"))
      .localCheckpoint(true)
    val hist = bfAll.groupBy(col("prev"))
      .agg(sum(col("__bc")).as("__hc"), count(lit(1)).as("__n1p"))
    val cont = bfAll.groupBy(col("cur")).agg(count(lit(1)).as("__n1c"))
    val types = bfAll.agg(count(lit(1)).as("__bt"))
    val p = (greatest(col("__bc").cast("double") - lit(discount), lit(0.0)) +
        lit(discount) * col("__n1p").cast("double") *
          (col("__n1c").cast("double") / col("__bt").cast("double"))) /
      col("__hc").cast("double")
    // same one-stream-join shape as [[bigramSurprise]]: probabilities
    // attach to bigram types, the occurrence stream joins once
    val typeScored = bfAll
      .join(hist, Seq("prev"))
      .join(cont, Seq("cur"))
      .crossJoin(broadcast(types))
      .select(col("prev"), col("cur"), (-log(p)).as("__nlp"))
    big.join(typeScored, Seq("prev", "cur"))
      .groupBy(col("doc_id"))
      .agg(round(avg(col("__nlp")), 6).as("kn_surprise"),
        count(lit(1)).as("n_bigrams"))
  }

  /** Pointwise-mutual-information collocations: the `topK` adjacent token
    * pairs (with at least `minCount` occurrences) whose co-occurrence most
    * exceeds chance — `pmi = ln(p(prev,cur) / (p(prev)·p(cur)))`. The
    * corpus-analysis face of the bigram tier: multi-word terms, named
    * entities, and templated phrases surface at the top, which feeds
    * tokenizer vocab decisions and boilerplate pattern discovery.
    *
    * Scale shape: the bigram stream aggregates ONCE to a checkpointed
    * pair-vocabulary frame (its sum is the bigram total, its
    * minCount-filter the join input), unigram counts come from the shared
    * checkpointed frequency frame (their sum is the token total), so each
    * corpus stream is scanned exactly once; the top-k plans as
    * TakeOrderedAndProject over the pair vocabulary.
    */
  def pmiCollocations(df: DataFrame, id: Column, text: Column,
      minCount: Long = 2, topK: Int = 50): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val bfAll = bigramStream(df, id, text)
      .groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).as("pair_count"))
      .localCheckpoint(true)
    val uf = unigramCounts(df, text)
    val nTok = uf.agg(sum(col("__uc")).as("__nt"))
    val nBig = bfAll.agg(sum(col("pair_count")).as("__nb"))
    val bf = bfAll.filter(col("pair_count") >= minCount)
    bf.join(uf.select(col("term").as("prev"), col("__uc").as("__up")), Seq("prev"))
      .join(uf.select(col("term").as("cur"), col("__uc").as("__ucr")), Seq("cur"))
      .crossJoin(broadcast(nBig))
      .crossJoin(broadcast(nTok))
      .select(col("prev"), col("cur"), col("pair_count"),
        round(log((col("pair_count").cast("double") / col("__nb").cast("double")) /
          ((col("__up").cast("double") / col("__nt").cast("double")) *
            (col("__ucr").cast("double") / col("__nt").cast("double")))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("prev").asc, col("cur").asc)
      .limit(topK)
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

  /** Vocabulary coverage curve: for each dial size k, the share of ALL
    * token occurrences covered by the k most frequent terms — the number
    * that decides a tokenizer/vocab budget (and whether an OOV path is a
    * corner case or a firehose). Natural text covers ~90% with a few
    * thousand terms; a curve that climbs slowly flags id-/hash-heavy
    * content no finite vocabulary will fit.
    *
    * Scale shape: the naive form ranks the whole vocabulary with a global
    * window — 10⁸ rows on one reducer at web scale. Here rank enters only
    * through the COUNT-OF-COUNTS spine (the x163 skewStrategy discipline):
    * terms with equal frequency form one class, classes carry (frequency,
    * class size, cumulative terms/mass above), and coverage(k) lands in
    * exactly one class as cumulative-mass-above + (k − terms-above)·c.
    * Ties inside the boundary class all have frequency c, so the curve is
    * EXACT without naming which tied terms are "in". The only window runs
    * over |distinct frequency| rows (≲ thousands at any corpus size).
    */
  def vocabCoverage(df: DataFrame, text: Column,
      ks: Seq[Long] = Seq(100L, 300L, 1000L, 3000L)): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"ks must be >= 1, got $ks")
    val session = df.sparkSession
    import session.implicits._
    val cc = df.select(explode(TextAnalysis.tokens(text)).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("m"))
    val w = Window.orderBy(col("c").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val spine = cc
      .withColumn("rb", coalesce(sum(col("m")).over(w), lit(0L)))
      .withColumn("mb", coalesce(sum(col("c") * col("m")).over(w), lit(0L)))
    val tot = cc.agg(sum(col("m")).as("nk"), sum(col("c") * col("m")).as("nm"))
    val kk = least(col("k"), col("nk"))
    spine.crossJoin(broadcast(tot))
      .join(broadcast(ks.toDF("k")),
        col("rb") < kk && col("rb") + col("m") >= kk)
      .select(col("k"), kk.as("n_vocab_used"),
        round((col("mb") + (kk - col("rb")) * col("c")).cast("double") /
          col("nm").cast("double"), 6).as("coverage"))
  }

  /** Count-of-counts spine shared by [[goodTuring]] and [[vocabRichness]]:
    * one row per observed term frequency r with its class size N_r.
    */
  private def countOfCounts(df: DataFrame, text: Column): DataFrame =
    df.select(explode(TextAnalysis.tokens(text)).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("m"))

  /** Negative-sampling table (word2vec's unigram^0.75, Mikolov et al.
    * 2013): per token, the raw unigram probability, the 3/4-power
    * smoothed sampling probability, and the boost the smoothing gives —
    * rare tokens are over-sampled as negatives/contrastive pairs, head
    * tokens damped. c^0.75 is computed as `sqrt(c·sqrt(c))`: `pow` is
    * not correctly-rounded in IEEE and differs across libm builds, while
    * `sqrt` is — the identity keeps the table bit-reproducible across
    * engines. One vocabulary-sized aggregate plus a 1-row broadcast of
    * the two normalizers.
    */
  def negativeSamplingTable(df: DataFrame, text: Column): DataFrame = {
    val counts = df.select(explode(TextAnalysis.tokens(text)).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val cd = col("cnt").cast("double")
    val smoothed = counts.withColumn("__s", sqrt(cd * sqrt(cd)))
    val tot = smoothed.agg(sum(col("cnt")).as("__n"), sum(col("__s")).as("__z"))
    smoothed.crossJoin(broadcast(tot))
      .select(col("tok"), col("cnt"),
        round(cd / col("__n").cast("double"), 6).as("p_raw"),
        round(col("__s") / col("__z"), 6).as("p_smoothed"),
        round((col("__s") / col("__z")) /
          (cd / col("__n").cast("double")), 6).as("boost"))
  }

  /** Simple Good-Turing frequency re-estimation (Good 1953): for each
    * observed count r, the adjusted count r* = (r+1)·N_{r+1}/N_r — the
    * smoothing that reallocates mass from singletons toward the unseen
    * (the same N_r machinery Kneser-Ney discounting builds on, exposed
    * as its own audit). Sparse high classes with no r+1 neighbor read
    * null rather than a fabricated estimate.
    *
    * Scale shape: everything after the vocabulary aggregate runs on the
    * |distinct frequency| spine — the frame is bounded by the count
    * DOMAIN, so a 100 TB corpus adds rows to N_r values, not to the
    * spine. One spine self-join on r+1, then a TakeOrdered cut to the
    * `maxClasses` LOWEST frequency classes (where GT matters; an
    * absolute r ≤ dial would read empty on a corpus whose rarest term
    * still occurs thousands of times).
    */
  def goodTuring(df: DataFrame, text: Column,
      maxClasses: Int = 10): DataFrame = {
    require(maxClasses >= 1, s"maxClasses must be >= 1, got $maxClasses")
    val cc = countOfCounts(df, text)
    cc.join(cc.select((col("c") - 1).as("c"), col("m").as("__m1")),
        Seq("c"), "left")
      .select(col("c").as("r"), col("m").as("n_r"),
        round((col("c") + 1).cast("double") * col("__m1").cast("double") /
          col("m").cast("double"), 6).as("r_star"))
      .orderBy(col("r").asc)
      .limit(maxClasses)
  }

  /** Vocabulary-richness panel from the same count-of-counts spine:
    * Good-Turing unseen-mass estimate P₀ = N₁/N (the probability the
    * NEXT token is a type never seen — the "how much tail is left"
    * number) and the Chao1 lower bound V + N₁²/(2N₂) on the true
    * vocabulary size. Together they answer whether a tokenizer/vocab
    * budget has actually converged on this corpus or is still mid-curve
    * (x149's Heaps fit gives the trajectory; these give the asymptote).
    * Degenerate N₂ = 0 reads a null Chao1, not an infinity.
    */
  def vocabRichness(df: DataFrame, text: Column): DataFrame = {
    val d = (c: Column) => c.cast("double")
    countOfCounts(df, text)
      .agg(sum(col("c") * col("m")).as("n_tokens"),
        sum(col("m")).as("vocab"),
        coalesce(sum(when(col("c") === 1L, col("m"))), lit(0L)).as("n1"),
        coalesce(sum(when(col("c") === 2L, col("m"))), lit(0L)).as("n2"))
      .select(col("n_tokens"), col("vocab"), col("n1"), col("n2"),
        round(d(col("n1")) / d(col("n_tokens")), 6).as("p0_unseen"),
        when(col("n2") > 0L, round(d(col("vocab")) +
          d(col("n1")) * d(col("n1")) / (lit(2.0) * d(col("n2"))), 6))
          .as("chao1"))
  }

  /** Zipf fit per group: OLS slope/intercept of `ln(freq)` on `ln(rank)`
    * over each group's `topK` most frequent terms (rank 1 = most
    * frequent). Natural text sits near slope −1; a feed whose slope
    * collapses toward 0 is template/boilerplate-dominated (a few tokens
    * repeated at similar rates), and a very steep slope flags
    * degenerate/keyword-stuffed text — a one-number lexical-health
    * signature per source that complements the KL ([[sourceDivergence]])
    * and diversity (x93) views.
    *
    * Scale shape: one tokenize+explode pass into (group, term) counts
    * (map-side combinable), a per-group rank window over the
    * vocabulary-sized frame (the x29/x30 discipline — no window ever sees
    * more than one group's vocabulary), then `regr_slope`/`regr_intercept`
    * over ≤ topK rows per group. Ranking ties break on term order so both
    * engines fit the same points.
    */
  def zipfSlope(df: DataFrame, group: Column, text: Column,
      topK: Int = 100): DataFrame = {
    require(topK >= 2, s"topK must be >= 2 to fit a line, got $topK")
    val counts = df
      .select(group.as("source"), explode(TextAnalysis.tokens(text)).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("__f"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("__f").desc, col("term").asc)
    val x = log(col("__rnk").cast("double"))
    val y = log(col("__f").cast("double"))
    counts.withColumn("__rnk", row_number().over(w))
      .filter(col("__rnk") <= topK)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_terms"),
        round(regr_slope(y, x), 6).as("zipf_slope"),
        round(regr_intercept(y, x), 6).as("intercept"))
  }

  /** Heaps'-law fit: OLS of `ln(vocab size)` on `ln(token count)` over a
    * bucketed corpus-growth curve — V(n) ≈ K·nᵝ, the GROWTH companion to
    * [[zipfSlope]]'s static rank curve. Natural text sits near β ≈ 0.5;
    * β drifting toward 1 means the corpus keeps minting new types
    * (noise, IDs, mojibake), β collapsing toward 0 means new data adds
    * no new vocabulary (template saturation) — the one-number answer to
    * "is the next 10 TB of this feed worth ingesting?".
    *
    * The curve never materializes per-document: documents map to
    * `buckets` fixed id-range buckets (pure arithmetic, no global sort
    * or ntile), each bucket aggregates its token total and its count of
    * FIRST-OCCURRENCE types (a type's first bucket = bucket of its min
    * doc id — one vocabulary-sized min), and two running sums over the
    * ≤`buckets`-row frame yield the (cum_tokens, cum_types) points the
    * line is fitted through. All counts are longs; floats enter at the
    * two logs.
    *
    * Scale shape: one tokenize+explode scan feeding both a per-doc count
    * (map-side combinable) and a per-term min — everything after is
    * bucket-sized. The fit weights buckets equally, so id-correlated
    * load skew shifts points along the curve, not off it.
    */
  def heapsFit(df: DataFrame, id: Column, text: Column,
      buckets: Int = 64): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val tok = df.select(id.as("doc_id"),
        explode(TextAnalysis.tokens(text)).as("term"))
      .localCheckpoint(true) // feeds doc totals AND first occurrences
    val bounds = tok.agg(min(col("doc_id")).as("mn"),
      max(col("doc_id")).as("mx"))
    // `/` is IEEE double division in both engines; the operands stay
    // under 2⁵³ (buckets·id-range), so floor() of it is integer-exact
    def bucketOf(doc: Column): Column =
      floor((lit(buckets.toLong) * (doc - col("mn"))) /
        (col("mx") - col("mn") + lit(1L))).cast("long")
    val perBucketTokens = tok.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("w"))
      .crossJoin(broadcast(bounds))
      .groupBy(bucketOf(col("doc_id")).as("bucket"))
      .agg(sum(col("w")).as("toks"))
    val perBucketTypes = tok.groupBy(col("term"))
      .agg(min(col("doc_id")).as("first_doc"))
      .crossJoin(broadcast(bounds))
      .groupBy(bucketOf(col("first_doc")).as("bucket"))
      .agg(count(lit(1)).as("types"))
    val wb = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val curve = perBucketTokens
      .join(perBucketTypes, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("toks", "types"))
      .withColumn("cum_toks", sum(col("toks")).over(wb))
      .withColumn("cum_types", sum(col("types")).over(wb))
      .filter(col("cum_toks") > 0 && col("cum_types") > 0)
    curve.agg(count(lit(1)).as("n_points"),
      round(regr_slope(log(col("cum_types").cast("double")),
        log(col("cum_toks").cast("double"))), 6).as("heaps_beta"),
      round(regr_intercept(log(col("cum_types").cast("double")),
        log(col("cum_toks").cast("double"))), 6).as("heaps_logk"))
  }

  /** χ² discriminative terms: the `topK` tokens whose document presence
    * most separates a boolean document class from its complement — the
    * feature-selection table behind every "what makes this slice
    * different?" question (which tokens mark the low-quality pool, the
    * flagged language, the contaminated source), and the standard χ²
    * feature ranking for the x79 quality classifier's vocabulary.
    *
    * Per token, the 2×2 presence contingency (a = class docs containing
    * it, b = class docs without, c/d = the complement's split) gives
    * χ² = N(ad − bc)²/((a+b)(c+d)(a+c)(b+d)). All counts are longs from
    * ONE distinct-presence aggregate; products are taken in double (each
    * IEEE-exact from integer inputs, no sum-order dependence), so both
    * engines rank identical values. `minDf` suppresses the df-1 noise
    * tail that χ² notoriously over-ranks.
    *
    * Scale shape: one tokenize→distinct-per-doc explode into a (term,
    * class) presence count (map-side combinable, vocabulary-sized), a
    * broadcast of the 2-row class totals, and a bounded
    * `orderBy(...).limit(k)` (TakeOrderedAndProject — per-partition
    * heaps, no global sort). Ties break (χ², term) for cross-engine
    * stability.
    */
  /** Hill tail-index estimator per group: α = 1/H with
    * H = (1/k)·Σᵢ₌₁..k ln(fᵢ/f₍k₊₁₎) over the k largest term frequencies
    * — the ORDER-STATISTICS estimate of the same frequency-tail exponent
    * [[zipfSlope]] fits by regression. The two disagreeing is itself the
    * signal: OLS is dragged by the mid-ranks (template mass), Hill sees
    * only the head, so template-stuffed feeds show a stable Hill α with a
    * collapsed Zipf slope. Groups with fewer than k+1 distinct terms emit
    * null (the estimator needs the (k+1)-th order statistic); H = 0 (top
    * k+1 frequencies all equal) emits null α, not a division error.
    *
    * Scale shape: the (group, term) count aggregate, one per-group rank
    * window over the vocabulary-sized frame (the x29/x30 discipline),
    * then ≤ k rows per group aggregate. Integer counts until the ln.
    */
  def hillTailIndex(df: DataFrame, group: Column, text: Column,
      k: Int = 50): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = df
      .select(group.as("source"), explode(TextAnalysis.tokens(text)).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("__f"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("__f").desc, col("term").asc)
    val ranked = counts.withColumn("__rnk", row_number().over(w))
      .filter(col("__rnk") <= k + 1)
    val kth = ranked.filter(col("__rnk") === k + 1)
      .select(col("source"), col("__f").as("__fk"))
    ranked.filter(col("__rnk") <= k)
      .join(kth, Seq("source")) // inner: groups lacking the (k+1)-th drop
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_terms"),
        avg(log(col("__f").cast("double") / col("__fk").cast("double")))
          .as("__h"))
      .select(col("source"), col("n_terms"), round(col("__h"), 6).as("h"),
        when(col("__h") > 0.0, round(lit(1.0) / col("__h"), 6)).as("alpha"))
  }

  def chiSqTokens(df: DataFrame, id: Column, text: Column, cls: Column,
      topK: Int = 50, minDf: Long = 5L): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val docs = df.select(id.as("doc_id"), text.as("__t"),
      cls.cast("boolean").as("__c"))
    val totals = docs.agg(
      sum(when(col("__c"), 1L).otherwise(0L)).as("n_pos"),
      sum(when(!col("__c"), 1L).otherwise(0L)).as("n_neg"))
    val pres = docs
      .select(col("doc_id"), col("__c"),
        explode(array_distinct(TextAnalysis.tokens(col("__t")))).as("term"))
      .groupBy(col("term"))
      .agg(sum(when(col("__c"), 1L).otherwise(0L)).as("df_pos"),
        sum(when(!col("__c"), 1L).otherwise(0L)).as("df_neg"))
      .filter(col("df_pos") + col("df_neg") >= minDf)
    val d = (x: Column) => x.cast("double")
    pres.crossJoin(broadcast(totals))
      .withColumn("__a", d(col("df_pos")))
      .withColumn("__b", d(col("n_pos") - col("df_pos")))
      .withColumn("__cc", d(col("df_neg")))
      .withColumn("__dd", d(col("n_neg") - col("df_neg")))
      .withColumn("__num", col("__a") * col("__dd") - col("__b") * col("__cc"))
      .withColumn("chi2", when(
        (col("__a") + col("__b")) * (col("__cc") + col("__dd")) *
          (col("__a") + col("__cc")) * (col("__b") + col("__dd")) > 0.0,
        round(d(col("n_pos") + col("n_neg")) * col("__num") * col("__num") /
          ((col("__a") + col("__b")) * (col("__cc") + col("__dd")) *
            (col("__a") + col("__cc")) * (col("__b") + col("__dd"))), 6)))
      .filter(col("chi2").isNotNull)
      .select(col("term"), col("chi2"), col("df_pos"), col("df_neg"))
      .orderBy(col("chi2").desc, col("term").asc)
      .limit(topK)
  }
}
