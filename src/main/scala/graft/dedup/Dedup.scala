package graft.dedup

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design: every near-dup method is CANDIDATE-GENERATION first —
  * a linear pass producing a small blocking key (band / signature), a
  * shuffle on that key, and pairwise verification only *within* buckets.
  * Nothing here is O(n²) over the corpus; the only quadratic work is per
  * LSH bucket, which banding keeps small. Hashes are md5-derived so results
  * are engine-independent (oracle-checkable) and stable across runs.
  */
object Dedup {

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
    * Each shingle is hashed once with md5; the 32 hex chars are sliced into
    * `numHashes` independent 8-hex-char (32-bit) hashes, and the signature
    * is the per-slice minimum over the document's distinct shingles — k
    * minhashes for the price of one md5 per shingle. Max 4 hashes per md5;
    * for more, extend with seeded md5(concat(seed, shingle)).
    */
  def minhashSignature(text: Column, numHashes: Int = 4): Seq[Column] =
    signatureFromGrams(array_distinct(TextAnalysis.shingles(text, 2)), numHashes)

  /** (doc_id, sig0..sigK) frame — md5 is computed ONCE per gram into an
    * intermediate projection; the per-slice columns then only substring it.
    * Two projections stay separate (Catalyst won't collapse a projection
    * whose expensive producer is referenced k times), so this does k× less
    * hashing than deriving each signature column from the text.
    */
  def signatures(df: DataFrame, id: Column, text: Column,
      numHashes: Int = 4): DataFrame = {
    require(numHashes <= 4, "4 slices per md5; use seeded variant for more")
    val hashed = df.select(id.as("doc_id"),
      transform(array_distinct(TextAnalysis.shingles(text, 2)), g => md5(g))
        .as("__ghash"))
    hashed.select((col("doc_id") +: (0 until numHashes).map(i =>
      array_min(transform(col("__ghash"), h => substring(h, i * 8 + 1, 8)))
        .as(s"sig$i"))): _*)
  }

  /** Signature columns from a pre-computed distinct-gram array column.
    * Callers that also need the grams (LSH + verify) should materialize the
    * gram array in a projection first and derive the signature from it —
    * otherwise each of the 4 slice columns re-evaluates the whole
    * tokenize→shingle→distinct chain per row (higher-order functions are
    * interpreted, so Catalyst does not CSE them).
    */
  def signatureFromGrams(grams: Column, numHashes: Int = 4): Seq[Column] = {
    require(numHashes <= 4, "4 slices per md5; use seeded variant for more")
    (0 until numHashes).map { i =>
      array_min(transform(grams, g => substring(md5(g), i * 8 + 1, 8)))
        .as(s"sig$i")
    }
  }

  /** MinHash + LSH banding: docs sharing any band of their signature are
    * candidate near-duplicates. 2 bands × 2 rows from a 4-hash signature.
    * Returns candidate pairs (doc_a < doc_b, band_id) — the scalable
    * pre-filter before exact Jaccard verification.
    */
  def minhashCandidates(df: DataFrame, id: Column, text: Column,
      maxBucket: Int = 1000): DataFrame = {
    val signed = signatures(df, id, text)
    val bands = signed.select(col("doc_id"),
        concat(col("sig0"), col("sig1")).as("band"), lit(1).as("band_id"))
      .unionByName(signed.select(col("doc_id"),
        concat(col("sig2"), col("sig3")).as("band"), lit(2).as("band_id")))
    // LSH skew guard: a degenerate band (empty/boilerplate text) would make
    // its bucket quadratic. Cap bucket size BEFORE the self-join; the window
    // shares the join's hash partitioning, so it adds no extra exchange.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("band_id"))
    val capped = bands.withColumn("__bc", count(lit(1)).over(w))
      .filter(col("__bc") <= maxBucket)
      .drop("__bc")
    val a = capped.select(col("band"), col("band_id"), col("doc_id").as("doc_a"))
    val b = capped.select(col("band"), col("band_id"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "band_id"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("band_id"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity between two shingle-set columns:
    * |A∩B| / |A∪B|. Used to verify LSH candidates.
    */
  def jaccard(gramsA: Column, gramsB: Column): Column = {
    val inter = size(array_intersect(gramsA, gramsB)).cast("double")
    val union = (size(gramsA) + size(gramsB)).cast("double") - inter
    round(inter / greatest(union, lit(1.0)), 6)
  }

  /** LSH candidates verified with exact bigram Jaccard — the full
    * MinHash→band→bucket-join→verify near-dup pipeline.
    */
  def nearDuplicates(df: DataFrame, id: Column, text: Column,
      threshold: Double = 0.7): DataFrame = {
    val grams = df.select(id.as("did"),
      array_distinct(TextAnalysis.shingles(text, 2)).as("grams"))
    val cands = minhashCandidates(df, id, text).select("doc_a", "doc_b").distinct()
    cands
      .join(grams.withColumnRenamed("did", "doc_a").withColumnRenamed("grams", "ga"), "doc_a")
      .join(grams.withColumnRenamed("did", "doc_b").withColumnRenamed("grams", "gb"), "doc_b")
      .select(col("doc_a"), col("doc_b"), jaccard(col("ga"), col("gb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash: 16-bit locality-sensitive signature. Bit i of the signature is
    * the sign of the sum over tokens of ±1 according to bit i of the token's
    * hash (hex nibble i of md5 ≥ 8). Near-dup docs differ in few bits.
    */
  def simhash16(text: Column): Column = {
    // single pass: tokenize+md5 once per row, fold all 16 bit votes in ONE
    // aggregate (an int[16] accumulator), then weight-sum the sign bits.
    // The naive form (one aggregate per bit) re-evaluates the whole
    // tokenize+md5 chain 16x per row — higher-order functions are
    // interpreted, so Catalyst does not CSE the shared subtree.
    val hashes = transform(array_distinct(TextAnalysis.tokens(text)), w => md5(w))
    val hexHigh = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val votes = aggregate(hashes,
      array_repeat(lit(0), 16),
      (acc, h) => zip_with(acc,
        transform(sequence(lit(1), lit(16)),
          i => when(h.substr(i, lit(1)).isInCollection(hexHigh), 1).otherwise(-1)),
        (a, b) => a + b))
    val weights = array((0 until 16).map(i => lit(1L << (15 - i))): _*)
    aggregate(zip_with(votes, weights, (v, w) => when(v > 0, w).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
  }

  /** Hamming distance between two simhash values (bit-count of XOR). */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

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
}
