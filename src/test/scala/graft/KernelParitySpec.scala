package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.plans.Native
import graft.text.TextAnalysis

/** Executable proof of the kernel contract: every native codegen kernel in
  * `graft.plans.Kernels` is BIT-IDENTICAL to the interpreted
  * higher-order-function formulation it replaced (same IEEE operation
  * order, same tokenization, same hash slicing) — checked value-for-value
  * on real documents/embeddings plus adversarial edge cases.
  */
class KernelParitySpec extends SparkSpec {
  import spark.implicits._

  // ── reference (round-2) HOF formulations, kept here as the spec oracle ──

  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def hofNorm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  private def hofCosine(a: Column, b: Column): Column =
    hofDot(a, b) / (hofNorm(a) * hofNorm(b))

  private def hofBigrams(text: Column): Column =
    array_distinct(TextAnalysis.shingles(text, 2))

  private def hofSig(grams: Column, i: Int): Column =
    array_min(transform(grams, g => substring(md5(g), i * 8 + 1, 8)))

  private def hofSimhash(text: Column): Column = {
    val hashes = transform(array_distinct(split(trim(lower(text)), "\\s+")), w => md5(w))
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

  private val edgeTexts = Seq(
    "", " ", "\t\n", "one", "one two", "One  TWO one", "a.b,c!d",
    "的 是 的 在", "  padded   with\tmixed\nwhitespace  ",
    "repeat repeat repeat repeat")

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")
    .select(col("text")).limit(200)
    .unionByName(edgeTexts.toDF("text"))

  test("cosine/dot kernels are bit-identical to the HOF formulation") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(graft.similarity.Similarity.asDouble(col("embedding")).as("v"))
      .limit(100)
    val pairs = emb.withColumn("w", reverse(col("v")))
    val rows = pairs.select(
      Native.cosineRaw(col("v"), col("w")).as("k_cos"),
      hofCosine(col("v"), col("w")).as("h_cos"),
      Native.dot(col("v"), col("w")).as("k_dot"),
      hofDot(col("v"), col("w")).as("h_dot")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)), "cosine differs")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)), "dot differs")
    }
  }

  test("bigram kernel equals array_distinct(shingles) on docs + edge cases") {
    val rows = docs.select(Native.bigrams(col("text")).as("k"),
      hofBigrams(col("text")).as("h")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
    }
  }

  test("shingle kernel equals array_distinct(shingles) at widths 3, 8, 13") {
    for (n <- Seq(3, 8, 13)) {
      val rows = docs.select(Native.shingles(col("text"), n).as("k"),
        array_distinct(TextAnalysis.shingles(col("text"), n)).as("h")).collect()
      rows.foreach(r =>
        assert(r.getSeq[String](0) === r.getSeq[String](1), s"width $n"))
    }
  }

  test("minhash slices kernel equals the md5-substring minima") {
    val g = docs.select(hofBigrams(col("text")).as("grams"))
    val rows = g.select(
      (Native.minhashSlices(col("grams")).as("k") +:
        (0 until 4).map(i => hofSig(col("grams"), i).as(s"h$i"))): _*).collect()
    rows.foreach { r =>
      val k = Option(r.getSeq[String](0))
      val h = (1 to 4).map(i => Option(r.getString(i)))
      if (k.isEmpty) assert(h.forall(_.isEmpty))
      else assert(k.get === h.map(_.get))
    }
  }

  test("simhash kernel equals the 16-bit HOF vote fold") {
    val rows = docs.select(Native.simhash16(col("text")).as("k"),
      hofSimhash(col("text")).as("h")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("token-stat kernels equal their filter/aggregate folds") {
    val t = split(trim(lower(col("text"))), "\\s+")
    val stop = TextAnalysis.defaultStopwords
    val rows = docs.select(
      Native.tokenCount(col("text")).as("k_n"), size(t).as("h_n"),
      Native.tokenHits(col("text"), stop).as("k_hits"),
      size(filter(t, w => w.isInCollection(stop))).as("h_hits"),
      Native.subwordSum(col("text")).as("k_sub"),
      aggregate(t, lit(0L),
        (acc, w) => acc + greatest(ceil(length(w) / 4.0), lit(1L)).cast("long")).as("h_sub"),
      Native.charSum(col("text")).as("k_chars"),
      aggregate(t, lit(0L), (acc, w) => acc + length(w).cast("long")).as("h_chars")).collect()
    rows.foreach { r =>
      assert(r.getInt(0) === r.getInt(1))
      assert(r.getInt(2) === r.getInt(3))
      assert(r.getLong(4) === r.getLong(5))
      assert(r.getLong(6) === r.getLong(7))
    }
  }

  test("jaro-winkler kernel matches the pinned DuckDB reference values") {
    // expectations computed by DuckDB's jaro_winkler_similarity /
    // jaro_similarity (the oracle engine) — the kernel's contract is
    // bit-compatibility with that byte-based, 0.7-boost-gated,
    // integer-half-transposition, 4-byte-prefix variant
    val cases = Seq(
      // (a, b, expected jw)
      ("MARTHA", "MARHTA", 0.9611111111111111),     // 1 transposition + MAR prefix
      ("DIXON", "DICKSONX", 0.8133333333333332),    // DI prefix boost
      ("JELLYFISH", "SMELLYFISH", 0.8962962962962964), // jaro > .7, prefix 0
      ("CRATE", "TRACE", 0.7333333333333334),       // > .7 but no prefix
      ("ab", "axyzw", 0.5666666666666667),          // BELOW boost gate: raw jaro
      ("abc", "abzzzzzzzz", 0.6222222222222222),    // prefix 2 but gated off
      ("abcdef", "bcadef", 0.9444444444444445 + 0.0), // odd mismatches: t = 3/2 = 1
      ("aaaaaaaaaa", "aaaaaaaaab", 0.96),           // prefix capped at 4
      ("AB", "BA", 0.0),                            // window 0: no matches
      ("a", "b", 0.0),
      ("A", "A", 1.0),
      ("", "ABC", 0.0),                             // empty → 0, NOT 1
      ("", "", 0.0),
      // multibyte: BYTE semantics (ü/ï are 2 bytes) — codepoint math
      // would give 0.904762 here, the byte reference gives 0.918981
      ("ünïcode", "ünicode", 0.9189814814814814))
    val got = cases.map { case (a, b, _) => (a, b) }
      .toDF("a", "b")
      .select(col("a"), col("b"), Native.jaroWinkler(col("a"), col("b")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    cases.foreach { case (a, b, want) =>
      assert(got((a, b)) === want, s"jw($a, $b)")
    }
    // the odd-mismatch case pins integer half-transpositions: fractional
    // t = 1.5 would give 0.916667 instead
    assert(math.abs(got(("abcdef", "bcadef")) - 0.916667) > 0.01)
  }
}
