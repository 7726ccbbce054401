package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.plans.Native
import graft.text.TextAnalysis

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design: every near-dup method is CANDIDATE-GENERATION first —
  * a linear pass producing a small blocking key (band / signature), a
  * shuffle on that key, and pairwise verification only *within* buckets.
  * Nothing here is O(n²) over the corpus; the only quadratic work is per
  * LSH bucket, which banding keeps small. Hashes are md5-derived so results
  * are engine-independent (oracle-checkable) and stable across runs.
  *
  * The tokenize→shingle→md5 kernels are native codegen expressions
  * ([[graft.plans.Kernels]]); round 2's higher-order-function formulation
  * of the same semantics ran interpreted at ~100× the cost.
  */
object Dedup {

  /** The blocking-bucket skew guard every candidate generator in this
    * library carries (MinHash/SimHash bands, cosine LSH buckets, winnow
    * fingerprints, fuzzy-join deletion neighborhoods): drop the rows of
    * any `keys` bucket holding more than `maxBucket` rows BEFORE the
    * self-join, so degenerate blocks (boilerplate, duplicate floods,
    * ubiquitous tokens) can never make the within-bucket work quadratic
    * in the corpus. The count window hash-partitions on the same keys as
    * the downstream join, so the guard adds no extra exchange.
    */
  private[graft] def capBuckets(df: DataFrame, keys: Seq[Column],
      maxBucket: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keys: _*)
    df.withColumn("__bc", count(lit(1)).over(w))
      .filter(col("__bc") <= maxBucket)
      .drop("__bc")
  }

  /** Exact dedup by content fingerprint: each row keeps its fingerprint and
    * the canonical (minimum) id sharing it. One shuffle on the fingerprint.
    */
  def exactDuplicates(df: DataFrame, id: Column, text: Column): DataFrame = {
    val fp = df.select(id.as("doc_id"), TextAnalysis.fingerprint(text).as("fingerprint"))
    val canon = fp.groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("group_size"))
    fp.join(canon, "fingerprint")
      .select(col("doc_id"), col("fingerprint"), col("canonical_id"),
        (col("doc_id") =!= col("canonical_id")).as("is_duplicate"))
  }

  /** MinHash signature columns from bigram shingles.
    *
    * Each shingle is hashed once with md5 per 4-hash group; the 32 hex
    * chars slice into four independent 8-hex-char (32-bit) hashes, and
    * the signature is the per-slice minimum over the document's distinct
    * shingles. Widths past 4 hash a fresh seeded md5 stream per group of
    * 4 (`"g:" || gram`) — the first four signatures are identical at any
    * width.
    */
  def minhashSignature(text: Column, numHashes: Int = 4): Seq[Column] =
    signatureFromGrams(Native.bigrams(text), numHashes)

  /** (doc_id, sig0..sigK) frame — the gram set and its md5 slice minima are
    * each computed ONCE per row by the native kernels; the per-slice output
    * columns only index the result array (separate projections, which
    * CollapseProject keeps apart because the producer is non-cheap and
    * referenced k times).
    */
  def signatures(df: DataFrame, id: Column, text: Column,
      numHashes: Int = 4): DataFrame = {
    val sliced = df
      .select(id.as("doc_id"), Native.bigrams(text).as("__grams"))
      .select(col("doc_id"), sliceExpr(col("__grams"), numHashes).as("__sig"))
    sliced.select((col("doc_id") +: (0 until numHashes).map(i =>
      element_at(col("__sig"), i + 1).as(s"sig$i"))): _*)
  }

  /** Signature columns from a pre-computed distinct-gram array column.
    * Callers that also need the grams (LSH + verify) should materialize the
    * gram frame once ([[nearDuplicates]] persists it) and derive the
    * signature from it, so the tokenize→shingle chain runs a single time.
    */
  def signatureFromGrams(grams: Column, numHashes: Int = 4): Seq[Column] = {
    val sig = sliceExpr(grams, numHashes)
    (0 until numHashes).map(i => element_at(sig, i + 1).as(s"sig$i"))
  }

  /** b-bit minwise estimation audit (Li & König, WWW 2010): for every
    * verified LSH candidate pair, the Jaccard ESTIMATE recoverable from
    * only the LOW 4·`hexChars` BITS of each minhash slice, beside the
    * exact value — the measurement behind storing 64× less signature:
    * with b bits, P(low bits match) ≈ J + (1−J)·2⁻ᵇ, so
    * Ĵ = (M − 2⁻ᵇ)/(1 − 2⁻ᵇ) with M the matching-slice fraction. The
    * j_exact column is the ground truth the estimate is graded against;
    * at k = 4 hashes the estimate is deliberately coarse (M has 5
    * levels) — the operator reports the storage-accuracy trade, it
    * doesn't hide it.
    *
    * Scale shape: the [[nearDuplicates]] candidate pass (bucketed, never
    * all-pairs) plus one signature projection and two model-..corpus
    * equi-joins on doc id.
    */
  def bBitEstimate(df: DataFrame, id: Column, text: Column,
      hexChars: Int = 1, numHashes: Int = 4): DataFrame = {
    require(hexChars >= 1 && hexChars <= 8,
      s"hexChars must be in [1,8], got $hexChars")
    val pairs = nearDuplicates(df, id, text, threshold = 0.0)
    val lowBits = signatures(df, id, text, numHashes)
      .select((col("doc_id") +: (0 until numHashes).map(i =>
        substring(col(s"sig$i"), 9 - hexChars, hexChars).as(s"b$i"))): _*)
    val eqSum = (0 until numHashes).map(i =>
      when(col(s"__a$i") === col(s"__b$i"), 1).otherwise(0))
      .reduce(_ + _)
    val pinv = 1.0 / math.pow(16.0, hexChars)
    pairs
      .join(lowBits.select((col("doc_id").as("doc_a") +:
        (0 until numHashes).map(i => col(s"b$i").as(s"__a$i"))): _*),
        Seq("doc_a"))
      .join(lowBits.select((col("doc_id").as("doc_b") +:
        (0 until numHashes).map(i => col(s"b$i").as(s"__b$i"))): _*),
        Seq("doc_b"))
      .withColumn("m", eqSum.cast("double") / numHashes.toDouble)
      .select(col("doc_a"), col("doc_b"), col("jaccard").as("j_exact"),
        col("m"),
        round((col("m") - lit(pinv)) / lit(1.0 - pinv), 6).as("j_bbit"))
  }

  /** One-Permutation Hashing signature (Li, Owen & Zhang, NIPS 2012) with
    * Shrivastava-Li "optimal" densification (ICML 2014): ONE 32-bit hash
    * per gram, binned by `h mod bins`; the signature is the per-bin hash
    * minimum, and an empty bin borrows the value of the nearest non-empty
    * bin clockwise — deterministic, so two docs' empty bins borrow
    * consistently and the matched-bin fraction stays an unbiased Jaccard
    * estimator. Versus the classic k-mins signature ([[signatures]]: k
    * full hash passes over every gram) this is the k-fold hashing-cost
    * cut that makes wide signatures affordable at the 100 TB tier.
    *
    * Shape: one explode + two hash aggregates per doc (bin minima, then
    * map assembly); densification is a constant 16×16 coalesce ladder
    * over the per-doc bin MAP — no join, no window, no per-doc blow-up.
    * Emits `(doc_id, sig)` with `sig` a dense `bins`-slot long array.
    */
  def ophSignatures(df: DataFrame, id: Column, text: Column,
      bins: Int = 16): DataFrame = {
    require(bins >= 2 && bins <= 64, s"bins must be in [2,64], got $bins")
    val binned = df
      .select(id.as("doc_id"), explode(Native.bigrams(text)).as("__gram"))
      .select(col("doc_id"),
        graft.sampling.Sampling.hashKey(col("__gram"), lit("oph")).as("__h"))
      .groupBy(col("doc_id"), pmod(col("__h"), lit(bins.toLong)).as("__bin"))
      .agg(min(col("__h")).as("__mv"))
    val slotValue = (s: Column) => coalesce((0 until bins).map(j =>
      element_at(col("__m"), pmod(s + lit(j.toLong), lit(bins.toLong)))): _*)
    binned.groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("__bin"), col("__mv"))))
        .as("__m"))
      .select(col("doc_id"),
        transform(sequence(lit(0L), lit((bins - 1).toLong)), slotValue)
          .as("sig"))
  }

  /** OPH estimation audit, the [[bBitEstimate]] sibling: for every
    * verified LSH candidate pair, the Jaccard estimate recoverable from
    * the one-pass [[ophSignatures]] (matched densified slots / bins)
    * beside the exact value. At 16 bins the estimate quantizes to 17
    * levels — the hash-once trade, reported rather than hidden.
    */
  def ophEstimate(df: DataFrame, id: Column, text: Column,
      bins: Int = 16): DataFrame = {
    val pairs = nearDuplicates(df, id, text, threshold = 0.0)
    val sigs = ophSignatures(df, id, text, bins)
    val matched = aggregate(
      zip_with(col("__siga"), col("__sigb"),
        (x, y) => when(x === y, 1L).otherwise(0L)),
      lit(0L), (acc, e) => acc + e)
    pairs
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("__siga")),
        Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("__sigb")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("jaccard").as("j_exact"),
        round(matched.cast("double") / lit(bins.toDouble), 6).as("j_oph"))
  }

  /** LSH band frame from a signed frame carrying `sig0..sig{numHashes-1}`:
    * `numHashes / rowsPerBand` bands of `rowsPerBand` concatenated
    * signatures, with a skew guard that caps degenerate buckets (empty or
    * boilerplate text) BEFORE the self-join — the window shares the join's
    * hash partitioning, so it adds no extra exchange. The (4, 2) default
    * is the classic 2-band × 2-row banding the narrow chain ships; more
    * hashes buy a finer recall/precision dial (b bands of r rows catch a
    * pair with probability 1 − (1 − j^r)^b at Jaccard j).
    */
  private def cappedBands(signed: DataFrame, maxBucket: Int,
      numHashes: Int = 4, rowsPerBand: Int = 2): DataFrame = {
    require(numHashes % rowsPerBand == 0,
      s"rowsPerBand=$rowsPerBand must divide numHashes=$numHashes")
    // ONE pass: explode an inline array of (band, band_id) structs. A
    // per-band union would scan the signature subtree b times and stack b
    // extra stages onto the plan — pure overhead locally and b redundant
    // scans of the signed frame at scale.
    val bandStructs = (0 until numHashes / rowsPerBand).map { b =>
      struct(
        concat((0 until rowsPerBand).map(r =>
          col(s"sig${b * rowsPerBand + r}")): _*).as("band"),
        lit(b + 1).as("band_id"))
    }
    val bands = signed
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("__bd"))
      .select(col("doc_id"), col("__bd.band").as("band"),
        col("__bd.band_id").as("band_id"))
    capBuckets(bands, Seq(col("band"), col("band_id")), maxBucket)
  }

  /** Signature column expression for `numHashes` hashes: the plain 4-slice
    * kernel for widths ≤ 4, the seeded multi-group kernel beyond — group 0
    * is bit-identical either way, so widening a pipeline never changes its
    * first four signatures.
    */
  private def sliceExpr(grams: Column, numHashes: Int): Column = {
    require(numHashes >= 1 && numHashes <= 256,
      s"numHashes must be in [1,256], got $numHashes")
    val groups = (numHashes + 3) / 4
    if (groups == 1) Native.minhashSlices(grams)
    else Native.minhashSlicesSeeded(grams, groups)
  }

  /** Candidate pairs (doc_a < doc_b, band_id) from a capped band frame. */
  private def bandPairs(capped: DataFrame): DataFrame =
    rawBandPairs(capped)
      .select(col("doc_a"), col("doc_b"), col("band_id"))
      .distinct()

  /** Candidate doc pairs with band_id dropped BEFORE the dedup — callers
    * that don't expose which band matched (the verify pipelines) get one
    * distinct instead of a per-band distinct followed by a second
    * pair-level one (two full shuffles of the candidate frame).
    */
  private def bandPairDocs(capped: DataFrame): DataFrame =
    rawBandPairs(capped).select(col("doc_a"), col("doc_b")).distinct()

  private def rawBandPairs(capped: DataFrame): DataFrame = {
    val a = capped.select(col("band"), col("band_id"), col("doc_id").as("doc_a"))
    val b = capped.select(col("band"), col("band_id"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "band_id"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("band_id"))
  }

  /** MinHash + LSH banding: docs sharing any band of their signature are
    * candidate near-duplicates. Returns candidate pairs
    * (doc_a < doc_b, band_id) — the scalable pre-filter before exact
    * Jaccard verification.
    */
  def minhashCandidates(df: DataFrame, id: Column, text: Column,
      maxBucket: Int = 1000): DataFrame =
    bandPairs(cappedBands(signatures(df, id, text), maxBucket))

  /** Exact n-gram Jaccard similarity between two distinct-shingle-set
    * columns: |A∩B| / |A∪B|. Used to verify LSH candidates.
    */
  def jaccard(gramsA: Column, gramsB: Column): Column = {
    val inter = Native.intersectCount(gramsA, gramsB).cast("double")
    val union = (size(gramsA) + size(gramsB)).cast("double") - inter
    round(inter / greatest(union, lit(1.0)), 6)
  }

  /** LSH candidates verified with exact bigram Jaccard — the full
    * MinHash→band→bucket-join→verify near-dup pipeline, single-pass over
    * the text: the distinct-gram frame is computed once and persisted
    * (memory-and-disk — at corpus scale this is the frame a pipeline would
    * checkpoint), signatures are derived from it, and the verify stage
    * joins candidates back to the same frame. The persist also acts as a
    * projection barrier, keeping the band expressions out of the scan.
    */
  def nearDuplicates(df: DataFrame, id: Column, text: Column,
      threshold: Double = 0.7, maxBucket: Int = 1000): DataFrame =
    nearDuplicatesWide(df, id, text, threshold, numHashes = 4,
      rowsPerBand = 2, maxBucket = maxBucket)

  /** Incremental (delta) near-dup: near-duplicate pairs TOUCHING THE NEW
    * BATCH — each new doc pairs against the existing corpus and the other
    * new docs, but old×old pairs are never generated. This is the daily-
    * ingestion shape at corpus scale: the historical corpus contributes
    * one band-frame scan per increment (linear), while the quadratic-ish
    * candidate work is confined to buckets the new batch actually
    * touches. Re-running [[nearDuplicates]] over the whole union would
    * redo every historical pairing on every increment.
    *
    * Semantics: identical to [[nearDuplicates]] over `old ∪ new` with
    * old×old pairs dropped (spec-asserted) — the band construction, the
    * bucket cap (applied over the UNION's bands, so a bucket's guard
    * doesn't depend on which side its rows came from), and the exact
    * Jaccard verify are the same chain. Ids must be unique across both
    * frames. Output adds `new_a`/`new_b` side flags.
    */
  def incrementalNearDuplicates(oldDf: DataFrame, newDf: DataFrame,
      id: Column, text: Column, threshold: Double = 0.7,
      maxBucket: Int = 1000): DataFrame = {
    val all = oldDf.select(id.as("did"), text.as("__text"), lit(false).as("is_new"))
      .unionByName(
        newDf.select(id.as("did"), text.as("__text"), lit(true).as("is_new")))
    val grams = all.select(col("did"), col("is_new"),
        Native.bigrams(col("__text")).as("grams"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val signed = grams
      .select(col("did").as("doc_id"), col("is_new"),
        sliceExpr(col("grams"), 4).as("__sig"))
      .select((Seq(col("doc_id"), col("is_new")) ++
        (0 until 4).map(i => element_at(col("__sig"), i + 1).as(s"sig$i"))): _*)
    val bands = signed.select(col("doc_id"), col("is_new"),
        explode(array((0 until 2).map { b =>
          struct(concat(col(s"sig${2 * b}"), col(s"sig${2 * b + 1}")).as("band"),
            lit(b + 1).as("band_id"))
        }: _*)).as("__bd"))
      .select(col("doc_id"), col("is_new"),
        col("__bd.band").as("band"), col("__bd.band_id").as("band_id"))
    val capped = capBuckets(bands, Seq(col("band"), col("band_id")), maxBucket)
    // one-sided join: new-batch bands probe the union's bands — candidate
    // work is proportional to the buckets the increment touches, never to
    // the historical corpus pairing with itself
    val probe = capped.filter(col("is_new"))
      .select(col("band"), col("band_id"), col("doc_id").as("__n"))
    val build = capped.select(col("band"), col("band_id"), col("doc_id").as("__o"))
    val cands = probe.join(build, Seq("band", "band_id"))
      .filter(col("__n") =!= col("__o"))
      .select(least(col("__n"), col("__o")).as("doc_a"),
        greatest(col("__n"), col("__o")).as("doc_b"))
      .distinct()
    val flags = grams.select(col("did"), col("is_new"))
    val verified = cands
      .join(grams.select(col("did").as("doc_a"), col("grams").as("ga")), "doc_a")
      .join(grams.select(col("did").as("doc_b"), col("grams").as("gb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), jaccard(col("ga"), col("gb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .join(flags.select(col("did").as("doc_a"), col("is_new").as("new_a")), "doc_a")
      .join(flags.select(col("did").as("doc_b"), col("is_new").as("new_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("jaccard"), col("new_a"), col("new_b"))
    val out = verified.localCheckpoint(true)
    grams.unpersist(false)
    out
  }

  /** Threshold-driven (b, r) auto-tuning for MinHash LSH banding: the
    * banding S-curve `P(catch at Jaccard s) = 1 − (1 − s^r)^b` has its
    * steep midpoint near `s* = (1/b)^(1/r)` (MMDS §3.4.3), so the right
    * (bands, rowsPerBand) for a target similarity threshold is the pair
    * whose midpoint sits closest to it — pairs below the midpoint are
    * mostly filtered, pairs above mostly caught, and verification stays
    * exact either way. Search space: every (b, r) with `b·r ≤ maxHashes`
    * (the signature budget — each hash is one md5 slice per doc).
    * Ties break toward MORE total hashes (a sharper S-curve at the same
    * midpoint — b and r both grow, so the transition narrows) and then
    * toward fewer rows per band. Pure arithmetic on (threshold,
    * maxHashes): no data pass, deterministic, and the returned pair
    * always satisfies [[nearDuplicatesWide]]'s divisibility contract
    * (`numHashes = b·r` is a multiple of `r` by construction).
    */
  def bandingFor(threshold: Double, maxHashes: Int = 64): (Int, Int) = {
    require(threshold > 0.0 && threshold < 1.0,
      s"threshold must be in (0,1), got $threshold")
    require(maxHashes >= 2 && maxHashes <= 256,
      s"maxHashes must be in [2,256], got $maxHashes")
    val candidates = for {
      r <- 1 to maxHashes
      b <- 1 to maxHashes / r
      if b * r >= 2
    } yield (b, r)
    candidates.minBy { case (b, r) =>
      (math.abs(math.pow(1.0 / b, 1.0 / r) - threshold), -b * r, r)
    }
  }

  /** The S-curve itself: probability that a pair at Jaccard `s` shares at
    * least one of `b` bands of `r` rows. Exposed for tuning reports and
    * the spec's bracketing assertions.
    */
  def catchProbability(s: Double, b: Int, r: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, r), b)

  /** [[nearDuplicatesWide]] with (bands, rowsPerBand) chosen by
    * [[bandingFor]] from the verify threshold — the "just give me
    * near-dups at 0.8" face: the signature budget is the only knob left,
    * and the LSH dial lands where the S-curve midpoint brackets the
    * threshold instead of wherever a hand-picked (b, r) happened to sit.
    */
  def nearDuplicatesAuto(df: DataFrame, id: Column, text: Column,
      threshold: Double = 0.7, maxHashes: Int = 64,
      maxBucket: Int = 1000): DataFrame = {
    val (b, r) = bandingFor(threshold, maxHashes)
    nearDuplicatesWide(df, id, text, threshold, numHashes = b * r,
      rowsPerBand = r, maxBucket = maxBucket)
  }

  /** [[nearDuplicates]] with a WIDE signature: `numHashes` minhashes (a
    * multiple of 4 — the seeded kernel hashes a fresh md5 stream per group
    * of 4) banded as `numHashes / rowsPerBand` bands of `rowsPerBand`.
    * More bands raise candidate recall at a fixed Jaccard threshold
    * (catch probability 1 − (1 − j^r)^b), more rows per band raise
    * precision — the standard LSH dial the narrow 4-hash chain pins at
    * b=2, r=2. Verification stays exact, so widening only changes WHICH
    * pairs reach the (cheap) verify stage, never the emitted Jaccard.
    */
  def nearDuplicatesWide(df: DataFrame, id: Column, text: Column,
      threshold: Double = 0.7, numHashes: Int = 8, rowsPerBand: Int = 2,
      maxBucket: Int = 1000): DataFrame = {
    val grams = df.select(id.as("did"), Native.bigrams(text).as("grams"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val signed = grams
      .select(col("did").as("doc_id"), sliceExpr(col("grams"), numHashes).as("__sig"))
      .select((col("doc_id") +:
        (0 until numHashes).map(i => element_at(col("__sig"), i + 1).as(s"sig$i"))): _*)
    val cands = bandPairDocs(cappedBands(signed, maxBucket, numHashes, rowsPerBand))
    val verified = cands
      .join(grams.select(col("did").as("doc_a"), col("grams").as("ga")), "doc_a")
      .join(grams.select(col("did").as("doc_b"), col("grams").as("gb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), jaccard(col("ga"), col("gb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    // materialize the (small) verified-pairs frame eagerly so the gram
    // cache can be dropped HERE instead of leaking until session shutdown;
    // localCheckpoint also truncates lineage, so downstream re-evaluation
    // never re-runs the shingle pass. At cluster scale this is where a
    // pipeline would checkpoint to reliable storage instead.
    val out = verified.localCheckpoint(true)
    grams.unpersist(false)
    out
  }

  /** ASYMMETRIC near-dup: n-gram Jaccard CONTAINMENT `|A∩B| / |A|` (and
    * the mirror `/ |B|`), the measure that catches a short document
    * embedded in a long one — quotes, excerpts, wrapper pages — where
    * symmetric Jaccard is diluted by the long side's extra content and
    * the pair never crosses [[nearDuplicates]]' threshold.
    *
    * Candidates come from RARE-SHINGLE BLOCKING, not MinHash banding:
    * a band match is ~Jaccard-probable, so exactly the pairs this
    * operator exists for (high containment, LOW Jaccard) would be the
    * ones banding misses. Instead, every gram whose global document
    * frequency is in `[minDf, maxDf]` blocks the documents containing it:
    * a contained doc shares ALL its grams with its container, so any
    * rare gram of the short side is a shared block. Misses only pairs
    * whose overlap consists entirely of sub-`minDf`-unique… i.e. never
    * (df ≥ 2 by construction for a shared gram) or ubiquitous grams
    * (boilerplate — the [[sharedSpans]]/[[removeSpans]] family's job).
    *
    * Scale shape: one shingle pass; the gram-df count windows on the
    * gram (one shuffle, same key the pair join uses); `maxDf` bounds
    * every block, so pair fan-out is ≤ |rare grams|·maxDf² — linear in
    * the corpus, never quadratic. Verification is exact on the cached
    * gram sets, and emits both containments plus the Jaccard so callers
    * can see the asymmetry (`contain_a ≫ jaccard` = A lives inside B).
    */
  def containmentPairs(df: DataFrame, id: Column, text: Column,
      threshold: Double = 0.5, minDf: Int = 2, maxDf: Int = 5): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2 (df 1 grams pair nothing), got $minDf")
    require(maxDf >= minDf, s"maxDf must be >= minDf, got $maxDf < $minDf")
    val grams = df.select(id.as("did"), Native.bigrams(text).as("grams"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val e = grams.select(col("did").as("doc_id"), explode(col("grams")).as("gram"))
    // shingle sets are per-doc distinct → per-gram row count = document df
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("gram"))
    val rare = e.withColumn("__df", count(lit(1)).over(w))
      .filter(col("__df") >= minDf && col("__df") <= maxDf)
    val cand = rare.select(col("gram"), col("doc_id").as("doc_a"))
      .join(rare.select(col("gram"), col("doc_id").as("doc_b")), Seq("gram"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    val inter = Native.intersectCount(col("ga"), col("gb")).cast("double")
    val verified = cand
      .join(grams.select(col("did").as("doc_a"), col("grams").as("ga")), "doc_a")
      .join(grams.select(col("did").as("doc_b"), col("grams").as("gb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(inter / greatest(size(col("ga")).cast("double"), lit(1.0)), 6)
          .as("contain_a"),
        round(inter / greatest(size(col("gb")).cast("double"), lit(1.0)), 6)
          .as("contain_b"),
        jaccard(col("ga"), col("gb")).as("jaccard"))
      .filter(greatest(col("contain_a"), col("contain_b")) >= threshold)
    val out = verified.localCheckpoint(true)
    grams.unpersist(false)
    out
  }

  /** SimHash: 16-bit locality-sensitive signature. Bit i of the signature is
    * the sign of the sum over distinct tokens of ±1 according to hex nibble
    * i of the token's md5 (≥ 8 votes +1). Near-dup docs differ in few bits.
    * One fused tokenize+md5+vote kernel pass per row.
    */
  def simhash16(text: Column): Column = Native.simhash16(text)

  /** Hamming distance between two simhash values (bit-count of XOR). */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash-banded near-dup pairs: the 16-bit signature splits into two
    * 8-bit halves; docs sharing either half are candidates (pigeonhole:
    * any pair at hamming ≤ 1 shares a half exactly; recall decays smoothly
    * above — the standard LSH trade), then exact hamming verifies. Same
    * candidate-first shape as [[minhashCandidates]]: one linear signature
    * pass, a shuffle on the 8-bit band key with the same degenerate-bucket
    * cap, quadratic work only within buckets.
    */
  def simhashPairs(df: DataFrame, id: Column, text: Column,
      maxHamming: Int = 2, maxBucket: Int = 1000): DataFrame = {
    val sig = df.select(id.as("doc_id"), simhash16(text).as("simhash"))
    val bands = sig.select(col("doc_id"), col("simhash"),
        explode(array(
          struct(shiftright(col("simhash"), 8).as("band"), lit(1).as("band_id")),
          struct(col("simhash").bitwiseAND(255).as("band"), lit(2).as("band_id"))))
          .as("__bd"))
      .select(col("doc_id"), col("simhash"),
        col("__bd.band").as("band"), col("__bd.band_id").as("band_id"))
    val capped = capBuckets(bands, Seq(col("band"), col("band_id")), maxBucket)
    val a = capped.select(col("band"), col("band_id"),
      col("doc_id").as("doc_a"), col("simhash").as("__sa"))
    val b = capped.select(col("band"), col("band_id"),
      col("doc_id").as("doc_b"), col("simhash").as("__sb"))
    a.join(b, Seq("band", "band_id"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        hammingDistance(col("__sa"), col("__sb")).cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Copy-detection pairs from winnowing fingerprints
    * ([[graft.text.TextAnalysis.winnowFingerprints]]): docs sharing at
    * least `minShared` selected rolling-hash values, with the shared
    * count. Winnowing guarantees any shared span of `w + k − 1` tokens
    * produces a shared fingerprint, so this catches PARTIAL overlap —
    * quoted passages, mirrored sections, template reuse — that whole-doc
    * and near-total-overlap dedup (exact md5, MinHash at high Jaccard)
    * both miss.
    *
    * Same candidate-first scale shape as [[minhashCandidates]]: one
    * kernel pass per doc, a shuffle on the fingerprint blocking key, a
    * `count(*)` window sharing that partitioning caps degenerate
    * fingerprints (ubiquitous boilerplate spans) before the self-join,
    * and the pair aggregate is bounded by within-bucket work.
    */
  def winnowPairs(df: DataFrame, id: Column, text: Column,
      k: Int = 4, w: Int = 4, minShared: Long = 2,
      maxBucket: Int = 1000): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val fp = df.select(id.as("doc_id"),
      explode(graft.text.TextAnalysis.winnowFingerprints(text, k, w)).as("fp"))
    // deliberately NOT persisted across the self-join: this subtree is one
    // cheap kernel + explode + count window, and measured wall-clock is
    // better letting the two sides evaluate in parallel than serializing a
    // materialize-then-join barrier (the sharedSpans gram stage, with its
    // semi-join + heavier explode, lands on the other side of that trade)
    val capped = capBuckets(fp, Seq(col("fp")), maxBucket)
    val a = capped.select(col("fp"), col("doc_id").as("doc_a"))
    val b = capped.select(col("fp"), col("doc_id").as("doc_b"))
    a.join(b, Seq("fp"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared_fingerprints"))
      .filter(col("shared_fingerprints") >= minShared)
  }

  /** Cross-document substring-level dedup (the Lee et al. exact-substring
    * case, arXiv:2107.06499 §4.1, re-expressed as a Spark plan instead of
    * a suffix array): every MAXIMAL token span of at least `minSpanTokens`
    * tokens shared verbatim between two documents, as
    * `(doc_a, doc_b, a_start, b_start, span_len)` with 0-based token
    * offsets. This is the dedup tier between [[exactDuplicates]] (whole
    * doc) and line-level boilerplate removal: it finds the 200-token
    * license block shared by 10 000 otherwise-distinct pages.
    *
    * Plan, both stages linear with capped fan-out:
    *  1. CANDIDATE DOCS — winnow fingerprints with window
    *     `w = minSpanTokens − k + 1`, so any shared span of
    *     `w + k − 1 = minSpanTokens` tokens is GUARANTEED to share a
    *     fingerprint (the winnowing guarantee); docs sharing no
    *     fingerprint are dropped before their positional grams ever
    *     cross a shuffle. At corpus scale most documents share no span,
    *     so this prefilter is what keeps stage 2 from shipping every
    *     token position of every document.
    *  2. SPAN EXTRACTION over survivors — positional k-grams
    *     (`posexplode` of a `transform(sequence(...))` projection, pure
    *     codegen), equi-join on the gram TEXT (exact, no hash
    *     collisions), then gaps-and-islands along each alignment
    *     diagonal `a_pos − b_pos`: consecutive matching positions merge
    *     into one maximal run of `matches + k − 1` tokens. The
    *     `row_number` window partitions by (pair, diagonal) — bounded by
    *     document length, never corpus size.
    *
    * Both the fingerprint and the gram joins route through
    * [[capBuckets]]: a ubiquitous gram ("in the United States") is
    * dropped before it can go quadratic, which truncates spans built on
    * it — the standard recall/size dial every blocking generator here
    * carries (the cap never binds on the test fixture, so the oracle
    * states the uncapped naive rule).
    */
  def sharedSpans(df: DataFrame, id: Column, text: Column,
      minSpanTokens: Int, k: Int = 4, maxBucket: Int = 1000): DataFrame = {
    require(k >= 1 && k <= 13, s"k-gram width must be in [1,13], got $k")
    val w = minSpanTokens - k + 1
    require(w >= 1 && w <= 256,
      s"minSpanTokens must be in [$k, ${k + 255}], got $minSpanTokens")

    val base = df
      .select(id.cast("long").as("doc_id"), TextAnalysis.tokens(text).as("__toks"))
      .filter(size(col("__toks")) >= k)
      .localCheckpoint(true)

    // stage 1: docs that share at least one winnow fingerprint — a
    // superset of all docs sharing a span of >= minSpanTokens tokens.
    // No self-join needed to DETECT sharing: a doc shares its fingerprint
    // bucket with another doc iff the bucket's min/max doc id differs
    // from its own, and those min/max columns ride the SAME window
    // partitioning the bucket cap already pays for — one shuffle, no
    // second evaluation of the winnow subtree, no pair fan-out at all.
    val fp = base.select(col("doc_id"), explode(Native.winnow(
      concat_ws(" ", col("__toks")), k, w)).as("__fp"))
    val wFp = org.apache.spark.sql.expressions.Window.partitionBy(col("__fp"))
    val cand = fp
      .withColumn("__bc", count(lit(1)).over(wFp))
      .withColumn("__mn", min(col("doc_id")).over(wFp))
      .withColumn("__mx", max(col("doc_id")).over(wFp))
      .filter(col("__bc") <= maxBucket &&
        (col("__mn") =!= col("doc_id") || col("__mx") =!= col("doc_id")))
      .select(col("doc_id")).distinct()

    // stage 2: positional k-grams of candidate docs only (same persist
    // rationale: the capped gram frame feeds both sides of the pair join)
    val grams = base.join(cand, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(__toks) - $k), " +
          "i -> concat_ws(' ', slice(__toks, i + 1, " + k + ")))"))
        .as(Seq("pos", "gram")))
    val gc = capBuckets(grams, Seq(col("gram")), maxBucket)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val matches = gc
      .select(col("gram"), col("doc_id").as("doc_a"), col("pos").as("apos"))
      .join(gc.select(col("gram"), col("doc_id").as("doc_b"),
        col("pos").as("bpos")), Seq("gram"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("apos"), col("bpos"))

    // materialize the (small) span frame eagerly so the gram cache drops
    // here instead of leaking until session shutdown — the
    // nearDuplicatesWide pattern; at cluster scale this is the
    // reliable-storage checkpoint
    val out = diagonalIslands(matches, k, minSpanTokens).localCheckpoint(true)
    gc.unpersist(false)
    out
  }

  /** Gaps-and-islands per alignment diagonal — the span collapse shared by
    * [[sharedSpans]] and [[crossSharedSpans]]: consecutive positions (apos
    * unique within a diagonal) merge into one maximal span.
    */
  private def diagonalIslands(matches: DataFrame, k: Int,
      minSpanTokens: Int): DataFrame = {
    val diag = matches.withColumn("diag", col("apos") - col("bpos"))
    val byDiag = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("apos"))
    diag.withColumn("__island", col("apos") - row_number().over(byDiag))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("__island"))
      .agg(min(col("apos")).as("__a0"), count(lit(1)).as("__n"))
      .withColumn("span_len", col("__n") + lit(k - 1).cast("long"))
      .filter(col("span_len") >= minSpanTokens)
      .select(col("doc_a"), col("doc_b"),
        col("__a0").cast("long").as("a_start"),
        (col("__a0") - col("diag")).cast("long").as("b_start"),
        col("span_len"))
  }

  /** Maximal shared spans BETWEEN two frames only — probe (doc_a side)
    * against corpus (doc_b side) — with no within-frame pair work at all.
    * Same output shape and island collapse as [[sharedSpans]]; for a small
    * probe set this is the decontamination-shaped variant: the union-based
    * chain would pay the full corpus×corpus candidate machinery and throw
    * those pairs away.
    *
    * Plan: probe fingerprints/grams are probe-sized and broadcast; the
    * corpus contributes one winnow pass (candidates = corpus docs sharing
    * a fingerprint with ANY probe — a broadcast semi-probe, no self-join,
    * no min/max window) and one positional-gram pass over candidates only.
    * Buckets cap over the CROSS-RELEVANT population (corpus rows matching
    * probe fingerprints / candidate grams), so a degenerate probe
    * fingerprint still can't fan out unboundedly; relative to filtering
    * [[sharedSpans]] over the union this cap binds less often (corpus-
    * corpus volume no longer counts against it) — it can only RECOVER
    * cross spans the union cap would truncate, never lose one. Pair
    * orientation is structural (probe is always `doc_a`), so ids need only
    * be disjoint across the frames, not ordered.
    */
  def crossSharedSpans(probes: DataFrame, probeId: Column, probeText: Column,
      corpus: DataFrame, corpusId: Column, corpusText: Column,
      minSpanTokens: Int, k: Int = 4, maxBucket: Int = 1000): DataFrame = {
    require(k >= 1 && k <= 13, s"k-gram width must be in [1,13], got $k")
    val w = minSpanTokens - k + 1
    require(w >= 1 && w <= 256,
      s"minSpanTokens must be in [$k, ${k + 255}], got $minSpanTokens")
    def prep(df: DataFrame, id: Column, text: Column) = df
      .select(id.cast("long").as("doc_id"), TextAnalysis.tokens(text).as("__toks"))
      .filter(size(col("__toks")) >= k)
      .localCheckpoint(true)
    val pbase = prep(probes, probeId, probeText)
    val cbase = prep(corpus, corpusId, corpusText)
    def winnowFp(base: DataFrame) = base.select(col("doc_id"),
      explode(Native.winnow(concat_ws(" ", col("__toks")), k, w)).as("__fp"))
    def posGrams(base: DataFrame) = base.select(col("doc_id"),
      posexplode(expr(s"transform(sequence(0, size(__toks) - $k), " +
        "i -> concat_ws(' ', slice(__toks, i + 1, " + k + ")))"))
        .as(Seq("pos", "gram")))
    // stage 1: corpus docs sharing a winnow fingerprint with any probe —
    // the winnow guarantee makes this a superset of every cross span
    val pfps = pfpDistinct(winnowFp(pbase))
    val cand = capBuckets(
        winnowFp(cbase).join(broadcast(pfps), Seq("__fp")),
        Seq(col("__fp")), maxBucket)
      .select(col("doc_id")).distinct()
    // stage 2: candidate corpus grams against ALL probe grams (broadcast)
    val cgc = capBuckets(posGrams(cbase.join(cand, Seq("doc_id"), "left_semi")),
      Seq(col("gram")), maxBucket)
    val matches = cgc
      .select(col("gram"), col("doc_id").as("doc_b"), col("pos").as("bpos"))
      .join(broadcast(posGrams(pbase).select(col("gram"),
        col("doc_id").as("doc_a"), col("pos").as("apos"))), Seq("gram"))
      .select(col("doc_a"), col("doc_b"), col("apos"), col("bpos"))
    diagonalIslands(matches, k, minSpanTokens).localCheckpoint(true)
  }

  private def pfpDistinct(pfp: DataFrame): DataFrame =
    pfp.select(col("__fp")).distinct()

  /** INTRA-document repeated spans: maximal token spans of at least
    * `minSpanTokens` that occur twice or more WITHIN one document — the
    * self-similarity counterpart of [[sharedSpans]], and the span-level
    * repetition gate [[graft.text.TextAnalysis.repetitionScore]] (a
    * distinct-bigram ratio) cannot express: template text that repeats a
    * whole 50-token block once keeps a near-perfect bigram ratio but is
    * exactly the degenerate-generation/boilerplate pattern a training
    * corpus should flag.
    *
    * Emits `(doc_id, a_start, b_start, span_len)` with `a_start < b_start`
    * (token offsets of the two occurrences). One maximal span per
    * alignment diagonal: a token block stamped at shift p emits once, a
    * fully degenerate "w w w …" run emits one span per qualifying shift
    * (every pair of occurrences is still summarized by its diagonal, never
    * enumerated pairwise beyond it).
    *
    * Shape: positional k-grams self-joined per (doc, gram) — no cross-doc
    * traffic at all, so the join key carries the doc id and the blocking
    * is structural; a degenerate "word word word …" doc is bounded by the
    * shared `capBuckets` guard on its per-doc gram groups, the same skew
    * discipline as every other candidate generator here. Then the
    * [[sharedSpans]] gaps-and-islands collapse per alignment diagonal.
    */
  def selfRepeatedSpans(df: DataFrame, id: Column, text: Column,
      minSpanTokens: Int, k: Int = 4, maxBucket: Int = 1000): DataFrame = {
    require(k >= 1 && k <= 13, s"k-gram width must be in [1,13], got $k")
    require(minSpanTokens >= k, s"minSpanTokens must be >= $k")
    val base = df
      .select(id.cast("long").as("doc_id"), TextAnalysis.tokens(text).as("__toks"))
      .filter(size(col("__toks")) >= k)
    val grams = base.select(col("doc_id"), posexplode(expr(
      s"transform(sequence(0, size(__toks) - $k), " +
        "i -> concat_ws(' ', slice(__toks, i + 1, " + k + ")))"))
      .as(Seq("pos", "gram")))
    // NOT persisted across the self-join (the winnowPairs tradeoff): this
    // per-doc gram subtree is one explode + count window, cheap enough
    // that letting the two join sides evaluate in parallel beats a
    // materialize-then-join barrier; the cross-doc sharedSpans gram stage
    // (semi-join + heavier fan-in) lands on the other side of that trade
    val gc = capBuckets(grams, Seq(col("doc_id"), col("gram")), maxBucket)
    val matches = gc
      .select(col("doc_id"), col("gram"), col("pos").as("apos"))
      .join(gc.select(col("doc_id"), col("gram"), col("pos").as("bpos")),
        Seq("doc_id", "gram"))
      .filter(col("apos") < col("bpos"))
      .select(col("doc_id"), col("apos"), col("bpos"))
    val diag = matches.withColumn("diag", col("bpos") - col("apos"))
    val byDiag = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"), col("diag"))
      .orderBy(col("apos"))
    diag.withColumn("__island", col("apos") - row_number().over(byDiag))
      .groupBy(col("doc_id"), col("diag"), col("__island"))
      .agg(min(col("apos")).as("__a0"), count(lit(1)).as("__n"))
      .withColumn("span_len", col("__n") + lit(k - 1).cast("long"))
      .filter(col("span_len") >= minSpanTokens)
      .select(col("doc_id"), col("__a0").cast("long").as("a_start"),
        (col("__a0") + col("diag")).cast("long").as("b_start"),
        col("span_len"))
  }

  /** Per-doc summary of [[selfRepeatedSpans]] evidence: the fraction of
    * token positions covered by the LATER occurrence of some repeated
    * span — 0 for clean prose, → 1 for a document that is one block
    * stamped over and over. Overlapping span evidence collapses to
    * distinct positions first (the [[removeSpans]] rationale), so the
    * fraction can never exceed 1. Every input doc emits a row.
    */
  def selfRepeatFraction(docs: DataFrame, id: Column, text: Column,
      spans: DataFrame): DataFrame = {
    val toks = docs.select(id.cast("long").as("doc_id"),
      size(TextAnalysis.tokens(text)).cast("long").as("n_tokens"))
    val rep = spans.select(col("doc_id"),
        explode(sequence(col("b_start").cast("int"),
          (col("b_start") + col("span_len") - 1).cast("int"))).as("pos"))
      .distinct()
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_repeated"))
    toks.join(rep, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_repeated"), lit(0L)).as("n_repeated"),
        when(col("n_tokens") > 0,
          round(coalesce(col("n_repeated"), lit(0L)).cast("double") /
            col("n_tokens").cast("double"), 6))
          .otherwise(lit(0.0)).as("rep_fraction"))
  }

  /** Apply substring-level dedup: rewrite each document with the token
    * spans [[sharedSpans]] attributed to it as the HIGHER-id pair member
    * removed — every duplicated span keeps exactly its lowest-id copy
    * (the Lee et al. one-copy rule, the greedy-survivor convention of
    * [[greedySurvivors]] at span granularity). Emits every input doc as
    * `(doc_id, text_clean, n_removed)` with `text_clean` the surviving
    * tokens space-joined (token-normalized, like every text operator
    * here) and `n_removed` the count of removed token positions.
    *
    * Overlapping spans need no interval merging: intervals explode to
    * (doc, position) rows and a `distinct` collapses overlaps before the
    * anti-join, so nested/staggered span evidence cannot double-remove.
    * Scale shape: the drop set is bounded by total span tokens (span
    * evidence, not corpus size); the anti-join is ONE keyed shuffle of
    * the token stream — the x34 line-dedup class — and the per-doc
    * reassembly window is bounded by document length.
    */
  def removeSpans(docs: DataFrame, id: Column, text: Column,
      spans: DataFrame): DataFrame = {
    val toks = docs.select(id.cast("long").as("doc_id"),
      TextAnalysis.tokens(text).as("__toks"))
    val drop = spans.select(col("doc_b").cast("long").as("doc_id"),
        explode(sequence(col("b_start").cast("int"),
          (col("b_start") + col("span_len") - 1).cast("int"))).as("pos"))
      .distinct()
    val touchedIds = drop.select(col("doc_id")).distinct()
    // positional surgery ONLY for span-touched docs — a small fraction of
    // the corpus (bounded by span evidence). Untouched docs short-circuit
    // below as a map-only projection, so the token-level explode +
    // keyed shuffle never carries the whole corpus.
    val touched = toks.join(touchedIds, Seq("doc_id"), "left_semi")
    val pos = touched.select(col("doc_id"),
      posexplode(col("__toks")).as(Seq("pos", "tok")))
    val kept = pos.join(drop, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok"))).as("text_clean"))
    val removed = drop.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_removed"))
    val fixed = touchedIds
      .join(kept, Seq("doc_id"), "left")
      .join(removed, Seq("doc_id"), "left")
      .select(col("doc_id"),
        // a fully-removed doc has no kept rows: empty survivor text
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
    // untouched docs: token-normalized passthrough (space-joined tokens —
    // exactly what the positional reassembly produces when nothing drops)
    val untouched = toks.join(touchedIds, Seq("doc_id"), "left_anti")
      .select(col("doc_id"),
        concat_ws(" ", col("__toks")).as("text_clean"),
        lit(0L).as("n_removed"))
    untouched.unionByName(fixed)
  }

  /** Embedding-cosine near-duplicate detection over candidate pairs.
    * `pairs` must carry `vec_a`/`vec_b` array columns; emits cosine + flag.
    * For corpus-scale use, generate pairs via LSH bucketing
    * ([[graft.similarity.Similarity.hyperplaneBucket]]), never cross-join.
    */
  def cosinePairs(pairs: DataFrame, vecA: Column, vecB: Column,
      threshold: Double = 0.9): DataFrame =
    pairs
      .withColumn("cosine", graft.similarity.Similarity.cosine(vecA, vecB))
      .withColumn("is_near_dup", col("cosine") >= threshold)

  /** Connected components over near-dup pairs: every doc that appears in a
    * pair is labeled with the MINIMUM doc id reachable through the pair
    * graph (its cluster id), plus an `is_canonical` flag for the one doc a
    * dedup pipeline keeps per cluster. Pair-level near-dup output is not
    * actionable by itself — (a,b) and (b,c) near-dups must collapse to ONE
    * kept doc, not two independent pair decisions.
    *
    * Algorithm: distributed min-label propagation INTERLEAVED WITH POINTER
    * JUMPING. Each round is (1) one shuffle-join of the label frame with
    * the (undirected) edge frame + a min-aggregate (labels flow one hop),
    * then (2) `label(u) ← label(label(u))` — a self-join of the label
    * frame that at least doubles how far the component minimum has
    * travelled. Labels only decrease and the fixed point — min id per
    * component — is unchanged by the jump, so results are identical to
    * plain propagation and partitioning-independent, but convergence takes
    * O(log diameter) rounds instead of O(diameter): a 10 000-node path
    * converges in ~14 rounds (spec-asserted) where plain propagation needs
    * ~10 000. That is the property that keeps an adversarial boilerplate
    * chain at 100 TB from grinding. Both frames localCheckpoint per round:
    * lineage stays O(1), and the self-join reads materialized rows instead
    * of recomputing the propagation subtree twice.
    *
    * Fails loudly if `maxIter` is hit without convergence — a truncated
    * propagation would silently mislabel clusters.
    */
  def duplicateClusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val half = pairs.select(col("doc_a").cast("long").as("u"),
      col("doc_b").cast("long").as("v"))
    val edges = half.union(half.select(col("v").as("u"), col("u").as("v")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var current = edges.groupBy(col("u"))
      .agg(least(col("u"), min(col("v"))).as("label"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val nbr = edges
        .join(current.select(col("u").as("v"), col("label").as("vlabel")), "v")
        .groupBy(col("u")).agg(min(col("vlabel")).as("nlabel"))
      val prop = current.join(nbr, "u")
        .select(col("u"), col("label").as("__old"),
          least(col("label"), col("nlabel")).as("label"))
        .localCheckpoint(true)
      // pointer jump: every label is itself a node id present in the frame
      // (it originated as some u/v), so label(label(u)) is a left join of
      // the frame with itself; coalesce guards the (impossible) miss
      val lookup = prop.select(col("u").as("__lu"), col("label").as("__ll"))
      val next = prop.join(lookup, col("label") === col("__lu"), "left")
        .select(col("u"), col("__old"),
          least(col("label"), coalesce(col("__ll"), col("label"))).as("label"))
        .localCheckpoint(true)
      converged = next.filter(col("label") < col("__old")).limit(1).isEmpty
      current = next.drop("__old")
      iter += 1
    }
    edges.unpersist(false)
    if (!converged)
      throw new IllegalStateException(
        s"duplicateClusters did not converge in $maxIter iterations")
    current.select(col("u").as("doc_id"), col("label").as("cluster_id"),
      (col("u") === col("label")).as("is_canonical"))
  }

  /** EXACT Jaccard-threshold self-join via prefix filtering — the
    * All-Pairs / PPJoin candidate rule (Bayardo et al., WWW 2007; Xiao et
    * al., WWW 2008): every pair of documents whose distinct-SHINGLE
    * Jaccard meets `threshold`, with NO false negatives — the exact
    * complement to [[nearDuplicates]]' probabilistic LSH recall (LSH
    * misses pairs that straddle band boundaries; this operator's
    * contract is completeness).
    *
    * The similarity domain is word `gramWidth`-gram shingle sets, NOT
    * unigram tokens, and that choice is load-bearing twice over: on a
    * templated corpus every document pair shares most of its unigram
    * VOCABULARY (measured here: >99 % of all pairs exceed unigram
    * jaccard 0.1, which makes any threshold's output quadratic), while
    * shingle sets keep word ORDER, so only true near-duplicate families
    * intersect; and prefix lengths track rarity — shingles are rare, so
    * rare-first prefixes are near-singleton posting lists.
    *
    * Candidate rule: order each document's distinct shingles by
    * ascending GLOBAL document frequency (ties by shingle — one
    * deterministic total order shared by all documents), and keep only
    * the first `|d| − ⌈t·|d|⌉ + 1` (the prefix). Two documents with
    * j ≥ t overlap in ≥ ⌈t/(1+t)·(|a|+|b|)⌉ ≥ ⌈t·max(|a|,|b|)⌉
    * shingles, more than either document can exclude from its prefix —
    * so prefixes of qualifying pairs ALWAYS intersect, and the
    * shingle-keyed equi-join over prefixes alone finds every pair. The
    * `min ≥ t·max` size bound (the x104 prefilter) prunes candidates
    * before verification ever touches a shingle array.
    *
    * Scale shape: one fused tokenize→shingle→distinct kernel scan, one
    * gram-vocabulary-sized df aggregate, and a shuffle keyed on prefix
    * shingles. The rare-first order is the load-bearing trick: a
    * shingle's posting list is long only if the shingle is FREQUENT,
    * and frequent shingles sort out of prefixes — so posting lists are
    * short exactly where they would otherwise explode. Verification
    * joins only distinct candidates back to the shingle-array frame.
    * The residual hazard is boilerplate-heavy corpora where
    * mid-frequency shingles fill prefixes; there, raise `threshold` or
    * `gramWidth` (both shrink posting lists) or fall back to LSH — this
    * operator deliberately carries NO capBuckets, because a cap would
    * silently break the exactness it exists to provide.
    */
  def prefixJaccardJoin(df: DataFrame, id: Column, text: Column,
      threshold: Double, gramWidth: Int = 3): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val base = df
      .select(id.as("doc_id"),
        graft.plans.Native.shingles(text, gramWidth).as("toks"))
      .localCheckpoint(true) // feeds df counts, prefixes, AND verification
    val ex = base.select(col("doc_id"), explode(col("toks")).as("tok"))
    val freq = ex.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // rare-first global order: sort (df, token) structs ascending, strip
    // back to the token — deterministic under ties by construction
    val ordered = ex.join(freq, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("st"))
      .select(col("doc_id"),
        transform(col("st"), s => s.getField("tok")).as("toks"))
    val prefix = ordered
      .select(col("doc_id"), size(col("toks")).as("n"),
        explode(slice(col("toks"), lit(1),
          size(col("toks")) -
            ceil(lit(threshold) * size(col("toks"))).cast("int") + 1))
          .as("tok"))
    val cand = prefix
      .select(col("tok"), col("doc_id").as("doc_a"), col("n").as("na"))
      .join(prefix.select(col("tok"), col("doc_id").as("doc_b"),
        col("n").as("nb")), Seq("tok"))
      .filter(col("doc_a") < col("doc_b") &&
        least(col("na"), col("nb")).cast("double") >=
          lit(threshold) * greatest(col("na"), col("nb")).cast("double"))
      .select(col("doc_a"), col("doc_b")).distinct()
    cand
      .join(base.select(col("doc_id").as("doc_a"), col("toks").as("__ta")),
        Seq("doc_a"))
      .join(base.select(col("doc_id").as("doc_b"), col("toks").as("__tb")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        jaccard(col("__ta"), col("__tb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Dedup-threshold sensitivity sweep: the verified-Jaccard histogram
    * over ALL LSH candidate pairs, with a descending cumulative count —
    * "how many pairs would merge at each threshold" in ONE chain pass,
    * the measurement that picks the near-dup threshold instead of
    * folklore (0.7? 0.8?). Buckets are `step`-wide floors of the score;
    * `n_at_or_above` for bucket t counts pairs with jaccard ≥ t.
    *
    * Shape: [[nearDuplicatesWide]] at threshold 0 (same banding, same
    * caps — candidates, not all pairs), then a bucket aggregate to
    * ≤ 1/step rows; the cumulative window runs over that dial-bounded
    * frame only (post-aggregate window contract). The bucket boundary is
    * `floor(jaccard / step)` computed with the SAME double literals in
    * both engines, so boundary values land identically.
    */
  def thresholdSweep(df: DataFrame, id: Column, text: Column,
      step: Double = 0.05, maxBucket: Int = 1000): DataFrame = {
    require(step > 0 && step <= 1, s"step must be in (0, 1], got $step")
    val pairs = nearDuplicatesWide(df, id, text, threshold = 0.0,
      numHashes = 4, rowsPerBand = 2, maxBucket = maxBucket)
    val counts = pairs
      .groupBy(floor(col("jaccard") / step).cast("long").as("__b"))
      .agg(count(lit(1)).as("n_pairs"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__b").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    counts
      .withColumn("n_at_or_above", sum(col("n_pairs")).over(w))
      .select(round(col("__b") * step, 2).as("threshold"),
        col("n_pairs"), col("n_at_or_above"))
  }

  /** LSH banding planner over a MEASURED similarity profile: for each
    * candidate (bands, rowsPerBand) config, the expected candidate-pair
    * count and the expected recall on the high-similarity mass, computed
    * by integrating the banding collision curve p(t) = 1 − (1 − tʳ)ᵇ
    * against [[thresholdSweep]]'s pair histogram — "pick b and r from
    * THIS corpus's dup structure", replacing the folklore defaults the
    * sweep already replaced for the threshold. Each histogram bucket
    * contributes n_pairs·p(mid), mid = bucket + step/2.
    *
    * Scale shape: the sweep frame is ≤ 1/step rows; configs explode as a
    * literal array — the whole planner is a |buckets|·|configs|-row
    * computation after the sweep's one candidate pass. `recall_high` is
    * null when the corpus has no pairs at or above `highThreshold`
    * (nothing to recall).
    */
  def lshPlanner(sweep: DataFrame, configs: Seq[(Int, Int)],
      step: Double = 0.05, highThreshold: Double = 0.7): DataFrame = {
    require(configs.nonEmpty, "configs must be non-empty")
    configs.foreach { case (b, r) =>
      require(b >= 1 && r >= 1, s"bands/rows must be >= 1, got ($b, $r)") }
    val cfg = explode(array(configs.map { case (b, r) =>
      struct(lit(b).as("bands"), lit(r).as("rows_per_band")) }: _*))
    val g = sweep
      .select(col("threshold"), col("n_pairs"), cfg.as("__c"))
      .select(col("threshold"), col("n_pairs"),
        col("__c.bands").as("bands"),
        col("__c.rows_per_band").as("rows_per_band"))
      .withColumn("__p", lit(1.0) - pow(lit(1.0) -
        pow(col("threshold") + lit(step / 2),
          col("rows_per_band").cast("double")),
        col("bands").cast("double")))
    g.groupBy(col("bands"), col("rows_per_band"))
      .agg(
        round(sum(col("n_pairs").cast("double") * col("__p")), 6)
          .as("expected_candidates"),
        when(sum(when(col("threshold") >= highThreshold, col("n_pairs"))
            .otherwise(lit(0L))) > 0L,
          round(sum(when(col("threshold") >= highThreshold,
              col("n_pairs").cast("double") * col("__p")).otherwise(lit(0.0))) /
            sum(when(col("threshold") >= highThreshold, col("n_pairs"))
              .otherwise(lit(0L))).cast("double"), 6))
          .as("recall_high"))
  }

  /** Duplicate-inflation histogram: the distribution of duplicate-cluster
    * sizes over the WHOLE corpus — how much of the dataset is redundant
    * copies, bucketed by family size (the datacard number behind "dedup
    * removed N % of rows", broken down so a single 10 000-copy boilerplate
    * family is distinguishable from five thousand pairs). Docs absent from
    * `clusters` count as singletons (`cluster_size = 1`), so `sum(n_docs)`
    * always equals the corpus row count and `sum(n_excess)` is exactly the
    * row count [[survivors]] would drop.
    *
    * Scale shape: one left join against the pair-bounded cluster frame
    * (AQE-broadcast), then two key-cardinality-shrinking aggregations
    * (corpus → |clusters| → |distinct sizes|); nothing corpus-sized ever
    * sits in one task.
    */
  def dupInflation(docs: DataFrame, id: Column, clusters: DataFrame): DataFrame =
    withClusterKey(docs, id, clusters)
      .select(col("__cid"))
      .groupBy(col("__cid")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("cluster_size")).as("n_docs"),
        sum(col("cluster_size") - 1).as("n_excess"))

  /** Attach each row's duplicate-cluster key as `__cid`, falling back to
    * the row's OWN id for singletons. The fallback is collision-safe by
    * the [[duplicateClusters]] invariant that a cluster id is always some
    * member's minimum doc id — a singleton's id can never collide with
    * another cluster's label. The ONE definition behind [[dupInflation]]
    * and [[graft.sampling.Sampling.clusterSplit]] (and, in SQL, the
    * ClusterChain `coalesce`), so the fallback rule cannot drift.
    */
  private[graft] def withClusterKey(df: DataFrame, id: Column,
      clusters: DataFrame): DataFrame = {
    val c = clusters.select(col("doc_id").as("__cdoc"),
      col("cluster_id").cast("long").as("__cluster"))
    df.join(c, id === col("__cdoc"), "left")
      .withColumn("__cid", coalesce(col("__cluster"), id.cast("long")))
      .drop("__cdoc", "__cluster")
  }

  /** Apply near-dedup to the corpus: drop every non-canonical member of
    * every duplicate cluster ([[duplicateClusters]] over `pairs`), keeping
    * the cluster's minimum-id doc plus all unpaired docs — the step that
    * turns pairwise near-dup evidence into the actual surviving corpus.
    * The drop set is NOT force-broadcast: "docs appearing in a pair" is a
    * corpus FRACTION at web scale (dup families routinely cover 30-50% of
    * a crawl — the [[greedySurvivors]] discipline), so AQE broadcasts when
    * runtime stats say the set fits and shuffles the anti-join otherwise.
    */
  def survivors(docs: DataFrame, id: Column, pairs: DataFrame,
      maxIter: Int = 20): DataFrame = {
    val drop = duplicateClusters(pairs, maxIter)
      .filter(!col("is_canonical"))
      .select(col("doc_id").as("__dup"))
    docs.join(drop, id === col("__dup"), "left_anti")
  }

  /** Score-aware dedup apply: keep the BEST-scoring member of each
    * duplicate cluster (ties → minimum id) rather than [[survivors]]'s
    * minimum-id member — what production dedup actually wants, because
    * cluster members are near- but not exact-duplicates and the copies
    * differ in exactly the ways quality gates measure (one copy is the
    * clean article, another the same text wrapped in boilerplate or
    * truncated; keep-longest / keep-highest-quality picks the clean one,
    * keep-min-id picks whichever was crawled first).
    *
    * Scale shape: the cluster frame is pair-bounded but a corpus FRACTION
    * at web-scale dup densities (the [[greedySurvivors]] discipline), so
    * neither the cluster join nor the loser anti-join is force-broadcast
    * — AQE picks broadcast when runtime stats allow, keyed shuffle
    * otherwise. The per-cluster argmax window runs on the clustered
    * subset only (never the whole corpus), partitioned by cluster id.
    */
  def survivorsBy(docs: DataFrame, id: Column, score: Column,
      pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val clusters = duplicateClusters(pairs, maxIter)
      .select(col("doc_id").as("__cid_doc"), col("cluster_id"))
    val scored = docs.select(id.as("__cid_doc"), score.as("__score"))
      .join(clusters, "__cid_doc")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col("__score").desc, col("__cid_doc").asc)
    val losers = scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > 1).select(col("__cid_doc").as("__dup"))
    docs.join(losers, id === col("__dup"), "left_anti")
  }

  /** Greedy (SemDeDup-style) dedup apply: drop the HIGHER id of every
    * near-dup pair, keep everything else. `pairs` must carry
    * `id_a < id_b`; the drop set is `distinct id_b`, broadcast for the
    * anti-join. Unlike [[survivors]] this never materializes connected
    * components — after the drop, no two surviving docs can form a pair
    * (any pair would have dropped its own id_b), which is the semantic
    * dedup guarantee embedding pipelines actually need; it may drop more
    * than one doc per transitive cluster, which for near-identical
    * embeddings is the intended behavior (SemDeDup, arXiv:2303.09540,
    * keeps one exemplar per ε-ball, not per component). O(1) rounds at
    * any corpus size vs the CC loop's O(log n).
    *
    * Unlike [[survivors]] (whose drop set is provably tiny — only docs in
    * clusters), a semantic drop set can be 30–50% of a web corpus, so the
    * anti-join is NOT force-broadcast: Catalyst/AQE broadcasts it when
    * runtime stats say it fits and shuffles otherwise.
    */
  def greedySurvivors(docs: DataFrame, id: Column, pairs: DataFrame): DataFrame = {
    val drop = pairs.select(col("id_b").as("__dup")).distinct()
    docs.join(drop, id === col("__dup"), "left_anti")
  }

  /** Cross-document n-gram novelty: per document, how much of its content
    * exists verbatim (at `gramWidth`-gram granularity) in at least one
    * OTHER document — the memorization-risk / dedup-diagnostic view.
    * Emits `(doc_id, n_grams, n_shared, novelty)` for EVERY input doc:
    * `n_grams` distinct grams, `n_shared` of them seen elsewhere,
    * `novelty = 1 − shared/n` (1.0 for gram-less docs — vacuously novel).
    * Unlike [[sharedSpans]] this is a per-doc SCALAR, cheap enough to gate
    * on; unlike [[graft.text.TextAnalysis.repetitionScore]] it measures
    * CROSS-doc repetition, not self-repetition.
    *
    * Scale shape: the distinct-shingle kernel runs once per doc; the gram
    * frame aggregates to per-gram doc counts and joins back on the same
    * key (the unigramSurprise shape — groupBy+join rather than a count
    * window, so a degenerate ubiquitous gram is an AQE-splittable skew
    * join, not a single buffered window partition); per-doc totals are one
    * more keyed aggregate. Everything is linear in total grams.
    */
  def gramNovelty(df: DataFrame, id: Column, text: Column,
      gramWidth: Int = 8): DataFrame = {
    val g = df.select(id.as("doc_id"),
      explode(Native.shingles(text, gramWidth)).as("gram"))
    // shingle sets are per-doc distinct, so per-gram row count = doc count
    val dfc = g.groupBy(col("gram")).agg(count(lit(1)).as("__df"))
    val per = g.join(dfc, "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("__n"),
        count(when(col("__df") > 1, 1)).as("__s"))
    df.select(id.as("doc_id")).join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__n"), lit(0L)).as("n_grams"),
        coalesce(col("__s"), lit(0L)).as("n_shared"),
        when(coalesce(col("__n"), lit(0L)) > 0,
          round(lit(1.0) - coalesce(col("__s"), lit(0L)).cast("double") /
            col("__n").cast("double"), 6))
          .otherwise(lit(1.0)).as("novelty"))
  }

  /** Exact source-level content-overlap matrix: Jaccard between each pair
    * of sources' DISTINCT word-n-gram sets — the corpus-level answer to
    * "are these two feeds mirrors of each other?", where [[crossSourceReport]]
    * counts near-dup DOC pairs (two sources can share half their n-grams
    * through templating without any single doc pair crossing the near-dup
    * threshold). Emits one row per source pair with a shared gram
    * (disjoint pairs are implicit zeros — at corpus scale most pairs are,
    * and materializing |sources|² zeros helps nobody).
    *
    * Scale shape: one shingle pass → distinct (source, gram) frame
    * (vocabulary-sized, checkpointed); grams present in more than `maxDf`
    * sources are dropped before pairing (the DISCO stop-gram guard —
    * boilerplate n-grams otherwise fan out quadratically in |sources|),
    * and set sizes are measured on the SAME capped frame so the Jaccard
    * stays internally consistent; the pair aggregate is |sources|²-bounded.
    */
  def sourceOverlap(df: DataFrame, source: Column, text: Column,
      gramWidth: Int = 8, maxDf: Int = 1000): DataFrame = {
    require(maxDf >= 2, s"maxDf must be >= 2, got $maxDf")
    val gs = df.select(source.as("source"),
        explode(Native.shingles(text, gramWidth)).as("gram"))
      .distinct()
      .localCheckpoint(true)
    val counts = gs.groupBy(col("gram")).agg(count(lit(1)).as("__gc"))
    val capped = gs.join(counts.filter(col("__gc") <= maxDf), "gram")
      .select(col("gram"), col("source"))
      .localCheckpoint(true)
    val sizes = capped.groupBy(col("source")).agg(count(lit(1)).as("__n"))
    val a = capped.select(col("gram"), col("source").as("source_a"))
    val b = capped.select(col("gram"), col("source").as("source_b"))
    a.join(b, "gram").filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b")).agg(count(lit(1)).as("__i"))
      .join(broadcast(sizes.select(col("source").as("source_a"),
        col("__n").as("__na"))), "source_a")
      .join(broadcast(sizes.select(col("source").as("source_b"),
        col("__n").as("__nb"))), "source_b")
      .select(col("source_a"), col("source_b"),
        col("__i").as("n_shared_grams"),
        round(col("__i").cast("double") /
          (col("__na") + col("__nb") - col("__i")).cast("double"), 6)
          .as("jaccard"))
  }

  /** LSH recall audit — the dedup-tier twin of the x71 ANN recall
    * harness: on a DETERMINISTIC hash sample of the corpus, compute the
    * exhaustive ground truth (every pair at-or-above `threshold` by exact
    * Jaccard) and measure what fraction the production
    * [[nearDuplicates]] chain finds, per Jaccard band — because banding
    * loss is concentrated just above the threshold (the S-curve's toe),
    * a single recall number hides exactly the band a curator needs to
    * see. "Measure, don't guess": the (b, r) dial is only defensible with
    * this number attached.
    *
    * Scale shape: the exhaustive side is quadratic BY DESIGN and therefore
    * runs only on the sample — `sampleBuckets` bounds it at
    * (rate·|corpus|)², the audit's explicit cost dial; the truth pair
    * frame is broadcast-joined against the found pairs (truth is
    * band-capped-free and tiny). The LSH side is the unmodified
    * production chain on the same sample.
    *
    * Prefer [[recallAuditAdaptive]] in harnesses: a FIXED bucket count is
    * a corpus FRACTION, so the quadratic truth side grows as corpus² —
    * the adaptive face fixes the SAMPLED ROW count instead, which is the
    * only dial that stays flat at 100 TB.
    */
  def recallAudit(df: DataFrame, id: Column, text: Column,
      threshold: Double, sampleBuckets: Int,
      salt: String = "ndrecall"): DataFrame = {
    require(sampleBuckets >= 1 &&
      sampleBuckets <= graft.sampling.Sampling.Buckets,
      s"sampleBuckets out of range: $sampleBuckets")
    val sampled = df
      .filter(graft.sampling.Sampling.hashBucket(id, salt) < sampleBuckets)
      .select(id.as("__sid"), text.as("__stext"))
      .localCheckpoint(true) // truth AND the LSH chain both consume it
    val g = sampled
      .select(col("__sid").as("doc_id"), Native.bigrams(col("__stext")).as("grams"))
      .localCheckpoint(true)
    val truth = g.select(col("doc_id").as("doc_a"), col("grams").as("__ga"))
      .join(broadcast(g.select(col("doc_id").as("doc_b"), col("grams").as("__gb"))),
        col("doc_a") < col("doc_b"))
      // EXACT size-ratio prefilter (similarity-join prefix bound):
      // j = |∩|/|∪| ≤ min/max, so a pair with min < t·max cannot reach the
      // threshold — skip its intersection without touching the truth set
      .filter(least(size(col("__ga")), size(col("__gb"))).cast("double") >=
        lit(threshold) * greatest(size(col("__ga")), size(col("__gb"))).cast("double"))
      .select(col("doc_a"), col("doc_b"),
        jaccard(col("__ga"), col("__gb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    val found = nearDuplicates(sampled, col("__sid"), col("__stext"), threshold)
      .select(col("doc_a").as("__fa"), col("doc_b").as("__fb"))
    val band = least(floor(col("jaccard") / 0.2).cast("int"), lit(4))
    truth
      .join(broadcast(found),
        col("doc_a") === col("__fa") && col("doc_b") === col("__fb"), "left")
      .groupBy(band.as("band"))
      .agg(count(lit(1)).as("n_truth"),
        count(col("__fa")).as("n_found"))
      .select(col("band"), col("n_truth"), col("n_found"),
        round(col("n_found").cast("double") / col("n_truth").cast("double"), 6)
          .as("recall"))
  }

  /** Bucket dial for a target SAMPLED-ROW count: the number of
    * [[graft.sampling.Sampling.Buckets]]-space hash buckets that samples
    * ~`targetRows` rows out of a corpus of `corpusRows`. Pure integer
    * arithmetic (ceiling division, clamped to [1, Buckets]) so a SQL
    * oracle can reproduce it bit-for-bit with BIGINT floor division.
    *
    * This is the self-scaling discipline for quadratic audits: cost
    * ∝ sampledRows², so fixing the row count (not the corpus fraction)
    * keeps the audit flat as the corpus grows — at 10× data the bucket
    * count shrinks 10× and the truth side stays the same size. Corpora
    * at or below `targetRows` clamp to the whole corpus (every bucket),
    * which also preserves small-fixture truth pairs (no extinction).
    */
  def bucketsForTargetRows(targetRows: Long, corpusRows: Long): Int = {
    val b = graft.sampling.Sampling.Buckets.toLong
    require(targetRows >= 1, s"targetRows must be >= 1, got $targetRows")
    // overflow guard: targetRows · Buckets must stay in Long, or the wrap
    // clamps to 1 bucket and a caller asking for "everything" silently
    // gets a 0.01% sample — fail loudly instead (any real dial is far
    // below this bound anyway: it is a sampled-ROW count)
    require(targetRows <= Long.MaxValue / b,
      s"targetRows too large (overflows x$b): $targetRows")
    require(corpusRows >= 1, s"corpusRows must be >= 1, got $corpusRows")
    math.max(1L, math.min(b, (targetRows * b + corpusRows - 1) / corpusRows))
      .toInt
  }

  /** Self-scaling face of [[recallAudit]]: derives the bucket dial from a
    * target sampled-row count via one cheap corpus `count()` (a single
    * column-pruned scan — the price of keeping the quadratic truth side
    * O(targetRows²) instead of O(corpus²) at 100 TB). The count and the
    * derived dial are exact, so the result stays hash-deterministic.
    */
  def recallAuditAdaptive(df: DataFrame, id: Column, text: Column,
      threshold: Double, targetRows: Long,
      salt: String = "ndrecall"): DataFrame = {
    val n = df.select(id.as("__rid")).count()
    recallAudit(df, id, text, threshold,
      sampleBuckets = bucketsForTargetRows(targetRows, math.max(n, 1L)),
      salt = salt)
  }

  /** MinHash ESTIMATE of the source-overlap matrix — the 100 TB face of
    * [[sourceOverlap]]: a source's signature is the element-wise MINIMUM
    * of its documents' minhash signatures (min over a union = min of
    * per-set minima), so the whole matrix reduces to one
    * |sources|×numHashes aggregate and a model-sized pairwise compare —
    * no gram-level join at all, where the exact matrix shuffles the full
    * (source, gram) vocabulary. Estimate = matching-coordinate fraction
    * (E[match] = Jaccard); `numHashes` sets the resolution (σ =
    * √(j(1−j)/k)). Fully deterministic — the estimate is a pure function
    * of the md5 minima, so it hash-compares exactly; it is the ESTIMATOR
    * that is approximate, not the computation.
    */
  def sourceOverlapEstimate(df: DataFrame, source: Column, text: Column,
      numHashes: Int = 8): DataFrame = {
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    val signed = df
      .select(source.as("source") +:
        signatureFromGrams(Native.bigrams(text), numHashes): _*)
      .groupBy(col("source"))
      .agg(min(col("sig0")).as("sig0"),
        (1 until numHashes).map(i => min(col(s"sig$i")).as(s"sig$i")): _*)
      // model-sized (|sources|×k); both pairwise sides consume it — without
      // this the broadcast side re-runs the whole corpus scan + aggregate
      .localCheckpoint(true)
    val a = signed.select(col("source").as("source_a") +:
      (0 until numHashes).map(i => col(s"sig$i").as(s"__a$i")): _*)
    val b = signed.select(col("source").as("source_b") +:
      (0 until numHashes).map(i => col(s"sig$i").as(s"__b$i")): _*)
    val matches = (0 until numHashes)
      .map(i => when(col(s"__a$i") === col(s"__b$i"), 1).otherwise(0))
      .reduce(_ + _)
    a.crossJoin(broadcast(b))
      .filter(col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"),
        matches.as("n_matching"),
        round(matches.cast("double") / numHashes.toDouble, 6)
          .as("est_jaccard"))
  }

  /** Mixture-shift report: each source's share of the corpus BEFORE and
    * AFTER a dedup pass — the number a curator must re-check before
    * training, because dedup is never source-neutral (the feed with the
    * most internal duplication silently loses mixture weight, which is a
    * de-facto re-weighting of the training distribution). Emits one row
    * per source: doc counts and round-6 shares on both sides.
    *
    * `kept` is the surviving-id frame (e.g. [[survivors]]); corpus-sized,
    * so it joins on the id key (one linear keyed shuffle, never a
    * broadcast), then everything collapses to a |sources|-sized aggregate
    * whose totals ride back in one broadcast cross-join.
    */
  def mixtureShift(docSources: DataFrame, id: Column, source: Column,
      kept: DataFrame): DataFrame = {
    val src = docSources.select(id.as("doc_id"), source.as("source"))
    val k = kept.select(col("doc_id").as("__kid"))
    val per = src.join(k, col("doc_id") === col("__kid"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs_before"),
        count(col("__kid")).as("docs_after"))
    val totals = per.agg(sum(col("docs_before")).as("__tb"),
      sum(col("docs_after")).as("__ta"))
    per.crossJoin(broadcast(totals))
      .select(col("source"), col("docs_before"), col("docs_after"),
        round(col("docs_before").cast("double") / col("__tb").cast("double"), 6)
          .as("share_before"),
        round(col("docs_after").cast("double") / col("__ta").cast("double"), 6)
          .as("share_after"))
  }

  /** Soft dedup: instead of DROPPING non-canonical cluster members
    * ([[survivors]]), down-weight every member of a duplicate cluster to
    * `1/cluster_size` and report each source's raw vs effective mass —
    * the policy modern pipelines increasingly prefer over hard dedup
    * (duplication frequency carries signal; deleting it is a lossy,
    * irreversible mixture edit, while soft weights preserve the corpus and
    * let the sampler equalize). One row per source: doc count, effective
    * doc count, char mass, effective char mass.
    *
    * Weights are fixed-point micro-units (`round(1e6/size)/1e6`) so every
    * sum is a merge-order-exact integer sum in double space (the
    * [[graft.analytics.Aggregates.fixedPointAvg]] construction) —
    * deterministic under any partitioning.
    *
    * Scale shape: [[duplicateClusters]] over the pair frame (pair-volume
    * sized), one |clusters|-sized aggregate for sizes, and the weight
    * frame — only docs that appear in a pair, which is a corpus FRACTION
    * at web-scale dup densities, so the join into the corpus scan is NOT
    * force-broadcast (AQE decides — the [[greedySurvivors]] discipline);
    * unpaired docs take weight 1 via the left-join miss. The final
    * |sources|-sized aggregate is the only other corpus-wide shuffle.
    */
  def softDedupWeights(docs: DataFrame, id: Column, source: Column,
      mass: Column, pairs: DataFrame): DataFrame = {
    val clusters = duplicateClusters(pairs) // checkpointed fixed point
    val sizes = clusters
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("__csz"))
    val weights = clusters.join(sizes, "cluster_id")
      .select(col("doc_id").as("__wid"),
        round(lit(1.0e6) / col("__csz").cast("double")).cast("long")
          .as("__wfp"))
    // Exactness: the micro-unit weight and the per-row mass·weight product
    // are LONGs (per-row product ≤ mass·1e6, so a single doc may carry up
    // to ~9e12 chars before overflow), and the running sums accumulate as
    // decimal(38,0) — exact to 1e38, so the merge-order-exact determinism
    // claim holds at any corpus size, unlike a double sum which silently
    // loses integer exactness past 2^53 (~1e6 10 KB docs per source).
    // Both sides divide the SAME exact integer by 1e6 at the end, so the
    // round-6 values agree bit-for-bit with the oracle's HUGEINT sums.
    docs.select(id.as("doc_id"), source.as("source"),
        mass.cast("long").as("__m"))
      .join(weights, col("doc_id") === col("__wid"), "left")
      .select(col("source"), col("__m"),
        coalesce(col("__wfp"), lit(1000000L)).as("__w"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("__w").cast("decimal(38,0)")) / 1.0e6, 6)
          .as("effective_docs"),
        sum(col("__m")).as("char_mass"),
        round(sum((col("__m") * col("__w")).cast("decimal(38,0)")) / 1.0e6, 6)
          .as("effective_chars"))
  }

  /** Cross-source duplication report: near-dup pair volume and mean
    * Jaccard per unordered source pair — the dedup-POLICY view a corpus
    * curator reads before choosing what to drop (a high within-source rate
    * means a crawler re-fetching itself; a high cross-source rate means
    * two feeds mirror each other, and deduplicating them jointly changes
    * each one's effective mixture weight).
    *
    * Takes the verified pair frame (`doc_a`, `doc_b`, `jaccard` — e.g.
    * [[nearDuplicates]]) plus a `(doc_id, source)` lookup. Scale shape:
    * the PAIR frame is bounded by the dup volume — a corpus FRACTION at
    * web-scale dup densities, so neither enrichment join is
    * force-broadcast (AQE broadcasts when small, keyed shuffle when not —
    * the [[greedySurvivors]] discipline); the pair key is normalized
    * `(least, greatest)` so A→B and B→A land in one report row; the last
    * shuffle is the |sources|²-cardinality source-pair aggregate.
    */
  def crossSourceReport(pairs: DataFrame, docSources: DataFrame): DataFrame = {
    val src = docSources.select(col("doc_id"), col("source"))
    val p = pairs.select(col("doc_a"), col("doc_b"), col("jaccard"))
    val withA = src.join(p, src("doc_id") === p("doc_a"))
      .select(col("doc_b"), col("jaccard"), col("source").as("__src_a"))
    val withB = src.join(withA, src("doc_id") === withA("doc_b"))
      .select(col("__src_a"), col("source").as("__src_b"), col("jaccard"))
    withB
      .select(least(col("__src_a"), col("__src_b")).as("source_a"),
        greatest(col("__src_a"), col("__src_b")).as("source_b"),
        col("jaccard"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("dup_pairs"),
        round(avg(col("jaccard")), 6).as("avg_jaccard"))
  }

  /** Continuation stitching: candidate (a, b) pairs where document a's
    * LAST `g` tokens equal document b's FIRST `g` tokens — the
    * crawl-pagination artifact ("page 2 re-serves the last paragraph of
    * page 1") that document-level dedup can't see (the pages are
    * globally distinct) and span dedup only reports as an overlap;
    * stitching names the (predecessor, successor) pair so the pipeline
    * can reassemble the full article instead of training on both halves
    * plus a duplicated seam.
    *
    * Same candidate→verify discipline as every dedup tier here: join on
    * the md5 of the g-token boundary window (tails against heads), cap
    * degenerate boundary keys on BOTH sides (`capBuckets` — a
    * boilerplate footer shared by a million pages is exactly the bucket
    * the cap drops), then verify the actual token windows match so an
    * md5 collision cannot fabricate a stitch. Documents shorter than 2g
    * are excluded (their head and tail overlap — a self-matching
    * window). Output: (doc_a, doc_b, overlap_tokens).
    *
    * Scale shape: one tokenize pass, two boundary projections, one
    * capped equi-join on the boundary hash — candidate volume is
    * bounded by the true continuation volume plus capped-bucket noise,
    * never |corpus|².
    */
  def stitchCandidates(df: DataFrame, id: Column, text: Column,
      g: Int = 8, maxBucket: Int = 1000): DataFrame = {
    require(g >= 2, s"boundary window must be >= 2 tokens, got $g")
    val base = df.select(id.cast("long").as("doc_id"),
        TextAnalysis.tokens(text).as("__t"))
      .filter(size(col("__t")) >= 2 * g)
    val heads = capBuckets(
      base.select(col("doc_id").as("doc_b"),
        md5(concat_ws("\u0001", slice(col("__t"), 1, g))).as("__k"),
        slice(col("__t"), 1, g).as("__h")),
      Seq(col("__k")), maxBucket)
    val tails = capBuckets(
      base.select(col("doc_id").as("doc_a"),
        md5(concat_ws("\u0001", slice(col("__t"), -g, g))).as("__k"),
        slice(col("__t"), -g, g).as("__tl")),
      Seq(col("__k")), maxBucket)
    tails.join(heads, Seq("__k"))
      .filter(col("doc_a") =!= col("doc_b") && col("__tl") === col("__h"))
      .select(col("doc_a"), col("doc_b"),
        lit(g).cast("int").as("overlap_tokens"))
  }

  /** Normalization dedup ladder: how many duplicates each rung of the
    * standard text-normalization cascade exposes —
    *
    *   0 raw        — byte-identical copies
    *   1 casefold   — lower(text)
    *   2 whitespace — runs collapsed to one space, ends trimmed
    *   3 alnum      — everything outside [a-z0-9 ] stripped
    *
    * The marginal column is the curation decision aid: it says which
    * rung actually buys coverage on THIS corpus (a big casefold rung
    * means case-mangling mirrors; a big alnum rung means punctuation
    * perturbation, the classic SEO-spam near-dup) — so the exact-dedup
    * key ([[exactDuplicates]]) can be chosen with evidence instead of
    * convention. Rung l's marginal = distinct(l−1) − distinct(l): the
    * ladder is monotone because each rung's key is a function of the
    * previous rung's.
    *
    * Scale shape: one projection pass computing the four keys, one
    * multi-distinct aggregate (Spark expands to 4× the input rows, each
    * carrying one key — the expand is linear and map-side partial), and
    * a 4-row unpivot of the single result row. No join, no window.
    */
  def normalizationLadder(df: DataFrame, text: Column): DataFrame = {
    val l1 = lower(text)
    val l2 = trim(regexp_replace(l1, "\\s+", " "))
    val l3 = regexp_replace(l2, "[^a-z0-9 ]", "")
    val one = df.agg(count(lit(1)).as("n"),
      countDistinct(text).as("d0"), countDistinct(l1).as("d1"),
      countDistinct(l2).as("d2"), countDistinct(l3).as("d3"))
    val names = Seq("raw", "casefold", "whitespace", "alnum")
    val rungs = (0 to 3).map { i =>
      val prev = if (i == 0) col("n") else col(s"d${i - 1}")
      struct(lit(i).as("level"), lit(names(i)).as("normalization"),
        col("n").as("n_docs"), col(s"d$i").as("n_distinct"),
        (col("n") - col(s"d$i")).as("dups"),
        (prev - col(s"d$i")).as("marginal_dups"),
        round((col("n") - col(s"d$i")).cast("double") /
          col("n").cast("double"), 6).as("dup_rate"))
    }
    one.select(explode(array(rungs: _*)).as("r")).select(col("r.*"))
  }
}
