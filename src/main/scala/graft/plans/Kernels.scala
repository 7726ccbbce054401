package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop JVM kernels behind the custom Catalyst expressions in
  * [[KernelExpressions]]. Whole-stage codegen calls these through their
  * static forwarders, so the hot inner loops (vector math, tokenize+hash)
  * run as JIT-compiled Java instead of interpreted higher-order-function
  * trees — the round-2 bench showed interpreted `aggregate`/`zip_with`
  * evaluation costing ~100x a compiled loop on these kernels.
  *
  * Numeric contract: every kernel reproduces the exact IEEE operation order
  * of the column-expression formulation it replaces (left-to-right folds,
  * same cast points), so results are bit-identical to round 2's oracles.
  */
object Kernels {

  @inline private def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Dot product with the association order of
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)`: acc = ((0 + p0) + p1) + ...
    * Null on length mismatch or null element (zip_with pads with null, and
    * null propagates through the fold).
    */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc = acc + elem(a, i, aFloat) * elem(b, i, bFloat)
      i += 1
    }
    acc
  }

  /** Unrounded cosine similarity: dot / (sqrt(||a||²) * sqrt(||b||²)), each
    * sum accumulated left-to-right like the `aggregate` fold it replaces.
    */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var d = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = elem(a, i, aFloat)
      val y = elem(b, i, bFloat)
      d = d + x * y
      na = na + x * x
      nb = nb + y * y
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Spark-identical round-half-up at 6 decimals (Round on DoubleType goes
    * through BigDecimal.valueOf, i.e. the shortest-decimal representation).
    */
  def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Ids of the `n` nearest centroids to `v` by round-6 cosine, ordered
    * (cosine desc, centroid id asc) — the same order as a `row_number`
    * window over `ORDER BY round(cosine, 6) DESC, id` with ids pre-sorted
    * ascending. NaN compares greatest (Double.compare), matching how both
    * Spark and DuckDB order NaN in a descending sort. Null vector elements
    * are unsupported (embedding tables carry none) and read as NaN.
    */
  def nearestCentroids(v: ArrayData, ids: Array[Long], cents: Array[Array[Double]],
      n: Int, isFloat: Boolean): ArrayData = {
    val dim = v.numElements()
    val vd = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      vd(i) = if (v.isNullAt(i)) Double.NaN else elem(v, i, isFloat)
      i += 1
    }
    val topIds = new Array[Long](n)
    val topSims = new Array[Double](n)
    var filled = 0
    var c = 0
    while (c < ids.length) {
      val cv = cents(c)
      // fail fast: a silently-skipped centroid would assign the row to
      // the wrong (or no) cluster with no signal — a ragged embedding is
      // a data bug the pipeline must surface, not absorb
      if (cv.length != dim) {
        throw new IllegalArgumentException(
          s"nearest_centroids: vector dimension $dim does not match " +
            s"centroid ${ids(c)} dimension ${cv.length}")
      } else {
        var d = 0.0
        var na = 0.0
        var nb = 0.0
        var j = 0
        while (j < dim) {
          val x = vd(j)
          val y = cv(j)
          d = d + x * y
          na = na + x * x
          nb = nb + y * y
          j += 1
        }
        val sim = round6(d / (math.sqrt(na) * math.sqrt(nb)))
        // insertion into the fixed top-n, strict > keeps the earlier
        // (smaller) centroid id on ties
        var pos = filled
        while (pos > 0 && java.lang.Double.compare(sim, topSims(pos - 1)) > 0) pos -= 1
        if (pos < n) {
          val last = math.min(filled, n - 1)
          var k = last
          while (k > pos) {
            topIds(k) = topIds(k - 1)
            topSims(k) = topSims(k - 1)
            k -= 1
          }
          topIds(pos) = ids(c)
          topSims(pos) = sim
          if (filled < n) filled += 1
        }
      }
      c += 1
    }
    val out = new Array[Any](filled)
    var k = 0
    while (k < filled) { out(k) = topIds(k); k += 1 }
    new GenericArrayData(out)
  }

  // ── text kernels ───────────────────────────────────────────────────────

  private val Ws = Pattern.compile("\\s+")

  private val Md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  /** `split(trim(lower(text)), "\\s+")` exactly: UTF8String lower + trim
    * (SQL trim strips 0x20 only, unlike java.lang.String#trim), then a
    * limit=-1 regex split — "" yields a single empty token, like Spark.
    */
  def tokens0(text: UTF8String): Array[String] =
    Ws.split(text.toLowerCase.trim.toString, -1)

  private def md5hex(s: String): String = {
    val digest = Md5.get()
    digest.reset()
    val bytes = digest.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(i * 2) = HexChars((bytes(i) >> 4) & 0xf)
      out(i * 2 + 1) = HexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Distinct word n-grams ("tok_i … tok_i+n-1", space-joined),
    * first-occurrence order — `array_distinct(shingles(text, n))` in one
    * pass. n=2 is the bigram kernel rounds 2-4 shipped; decontamination
    * runs at n=8 (the realistic benchmark-collision width).
    */
  def shingleSet(text: UTF8String, n: Int): ArrayData = {
    val t = tokens0(text)
    if (t.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](t.length * 2)
    var i = 0
    while (i <= t.length - n) {
      val sb = new java.lang.StringBuilder
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(t(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** Winnowing fingerprints (the MOSS scheme — Schleimer, Wilkerson &
    * Aiken, SIGMOD '03): hash every POSITIONAL k-gram (first 8 md5 hex
    * chars as an unsigned 32-bit value, the minhash-slice convention),
    * slide a window of `w` consecutive hashes, keep each window's MINIMUM,
    * and emit the distinct selected values sorted ascending. Any shared
    * span of `w + k − 1` tokens between two documents is guaranteed to
    * share a fingerprint, while only ~2/(w+1) of the hashes survive —
    * the local, position-robust fingerprint a rolling-hash dedup tier
    * needs (whole-doc md5 breaks on a single-character edit; these
    * don't). Docs shorter than `k` tokens emit an empty set; docs with
    * fewer than `w` grams winnow one window over all their grams.
    */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val t = tokens0(text)
    if (t.length < k) return new GenericArrayData(Array.empty[Any])
    val m = t.length - k + 1
    val hashes = new Array[Long](m)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(t(i + j))
        j += 1
      }
      hashes(i) = java.lang.Long.parseLong(md5hex(sb.toString).substring(0, 8), 16)
      i += 1
    }
    val selected = new java.util.TreeSet[java.lang.Long]()
    val nw = math.max(m - w + 1, 1)
    var s = 0
    while (s < nw) {
      val hi = math.min(s + w, m)
      var best = hashes(s)
      var p = s + 1
      while (p < hi) {
        if (hashes(p) < best) best = hashes(p)
        p += 1
      }
      selected.add(best)
      s += 1
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }

  /** The 4 MinHash slice minima over a distinct-gram array: one md5 per
    * gram, minimum of each 8-hex-char slice (lexicographic on lowercase hex
    * = unsigned numeric). Null when the gram set is empty — `array_min` of
    * an empty array is null.
    */
  def minhashSlices(grams: ArrayData): ArrayData = {
    val n = grams.numElements()
    if (n == 0) return null
    val mins = new Array[String](4)
    var i = 0
    while (i < n) {
      val h = md5hex(grams.getUTF8String(i).toString)
      var s = 0
      while (s < 4) {
        val sub = h.substring(s * 8, s * 8 + 8)
        if (mins(s) == null || sub.compareTo(mins(s)) < 0) mins(s) = sub
        s += 1
      }
      i += 1
    }
    val out = new Array[Any](4)
    var s = 0
    while (s < 4) { out(s) = UTF8String.fromString(mins(s)); s += 1 }
    new GenericArrayData(out)
  }

  /** Wide MinHash: `4 × groups` independent slice minima. Group 0 hashes
    * the gram as-is (bit-identical to [[minhashSlices]], so the first 4
    * signatures of a wide frame match a narrow one); group `g ≥ 1` hashes
    * `"g:" || gram` — a fresh md5 stream per group, which is how the
    * 4-hashes-per-md5 ceiling lifts without a second hash function. One
    * md5 per (gram, group); null when the gram set is empty.
    */
  def minhashSlicesSeeded(grams: ArrayData, groups: Int): ArrayData = {
    val n = grams.numElements()
    if (n == 0) return null
    val mins = new Array[String](4 * groups)
    var g = 0
    while (g < groups) {
      var i = 0
      while (i < n) {
        val gram = grams.getUTF8String(i).toString
        val h = md5hex(if (g == 0) gram else g.toString + ":" + gram)
        var s = 0
        while (s < 4) {
          val sub = h.substring(s * 8, s * 8 + 8)
          val idx = g * 4 + s
          if (mins(idx) == null || sub.compareTo(mins(idx)) < 0) mins(idx) = sub
          s += 1
        }
        i += 1
      }
      g += 1
    }
    val out = new Array[Any](4 * groups)
    var j = 0
    while (j < 4 * groups) { out(j) = UTF8String.fromString(mins(j)); j += 1 }
    new GenericArrayData(out)
  }

  /** 16-bit SimHash: one tokenize + one md5 per distinct token, all 16 bit
    * votes folded in a single pass (nibble i of the md5 hex ≥ 8 votes +1 on
    * bit 15-i, else -1; bit set when the vote sum is positive).
    */
  def simhash16(text: UTF8String): Long = {
    val t = tokens0(text)
    val seen = new java.util.HashSet[String](t.length * 2)
    val votes = new Array[Int](16)
    var i = 0
    while (i < t.length) {
      if (seen.add(t(i))) {
        val h = md5hex(t(i))
        var j = 0
        while (j < 16) {
          // hex chars are '0'-'9','a'-'f'; >= '8' selects {8,9,a..f}
          votes(j) += (if (h.charAt(j) >= '8') 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 16) {
      if (votes(j) > 0) sig |= 1L << (15 - j)
      j += 1
    }
    sig
  }

  /** Token count: `size(split(trim(lower(text)), "\\s+"))`. */
  def tokenCount(text: UTF8String): Int = tokens0(text).length

  /** Count of tokens contained in `words` —
    * `size(filter(tokens, _.isInCollection(words)))` in one pass. `words`
    * is a plan constant (stopword or language-marker list).
    */
  def tokenHits(text: UTF8String, words: java.util.HashSet[String]): Int = {
    val t = tokens0(text)
    var cnt = 0
    var i = 0
    while (i < t.length) {
      if (words.contains(t(i))) cnt += 1
      i += 1
    }
    cnt
  }

  /** BPE-ish subword proxy: Σ max(⌈len(w)/4⌉, 1) over tokens, with len in
    * codepoints (Spark `length`), mirroring the `aggregate` fold exactly.
    */
  def subwordSum(text: UTF8String): Long = {
    val t = tokens0(text)
    var acc = 0L
    var i = 0
    while (i < t.length) {
      val w = t(i)
      val len = w.codePointCount(0, w.length)
      val pieces = (len + 3) / 4
      acc += (if (pieces < 1) 1 else pieces)
      i += 1
    }
    acc
  }

  /** Σ len(w) over tokens in codepoints — the numerator of avgTokenLen. */
  def charSum(text: UTF8String): Long = {
    val t = tokens0(text)
    var acc = 0L
    var i = 0
    while (i < t.length) {
      val w = t(i)
      acc += w.codePointCount(0, w.length)
      i += 1
    }
    acc
  }

  /** Content-defined chunking (LBFS/rsync-family): split the text at
    * positions where a polynomial hash of the trailing `window` code
    * points has its low `maskBits` bits zero, and emit one packed long
    * per chunk: `len · 2³¹ + contentHash` (both < 2³¹, so the pack is
    * lossless; unpack with `shiftright(x, 31)` / `x & (2³¹−1)`).
    *
    * Integer contract (mirrored term-for-term by the DuckDB oracle —
    * see [[graft.text.Chunking]] for the shared constants):
    *  - code points via `codePointAt` (DuckDB `ord(substring(...))`),
    *  - boundary hash at end-position p (1-based, code points):
    *    fold j=0..w−1 of `(code(c_{p−w+1+j}) · B^j mod M) mod M`,
    *    cut AFTER p when `hash % 2^maskBits == 0`, for p in [w, n−1]
    *    (never at n — the text end is always the final boundary),
    *  - chunk content hash: fold `acc = (acc·B + code) mod M` from 0.
    * M = 2³¹−1 (prime), B = 257. The boundary hash is position-local
    * (content-defined): editing one chunk never moves another chunk's
    * boundaries, which is the whole point of CDC dedup.
    */
  def cdcChunks(text: UTF8String, window: Int, maskBits: Int): ArrayData = {
    val s = text.toString
    val M = 2147483647L
    val B = 257L
    val mask = (1L << maskBits) - 1
    // code-point array (one pass; documents are typically ASCII so this
    // is length(s), but the contract is code points)
    val n = s.codePointCount(0, s.length)
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val codes = new Array[Long](n)
    var ci = 0
    var off = 0
    while (off < s.length) {
      val cp = s.codePointAt(off)
      codes(ci) = cp.toLong
      ci += 1
      off += Character.charCount(cp)
    }
    val pows = new Array[Long](window)
    var pj = 1L
    var j = 0
    while (j < window) { pows(j) = pj; pj = pj * B % M; j += 1 }
    val out = new java.util.ArrayList[Any]()
    var start = 0 // 0-based inclusive start of the current chunk
    var p = window // 1-based end position of the sliding window
    def emit(endExcl: Int): Unit = {
      var h = 0L
      var k = start
      while (k < endExcl) { h = (h * B + codes(k)) % M; k += 1 }
      out.add((endExcl - start).toLong * 2147483648L + h)
      start = endExcl
    }
    while (p <= n - 1) {
      var wh = 0L
      var q = 0
      while (q < window) {
        wh = (wh + codes(p - window + q) * pows(q) % M) % M
        q += 1
      }
      if ((wh & mask) == 0L) emit(p)
      p += 1
    }
    emit(n)
    new GenericArrayData(out.toArray)
  }

  /** |A ∩ B| for two string arrays (already distinct) — the counting core
    * of `size(array_intersect(a, b))` without building the result array.
    */
  def intersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val set = new java.util.HashSet[UTF8String](na * 2)
    var i = 0
    while (i < na) { set.add(a.getUTF8String(i)); i += 1 }
    var cnt = 0
    var j = 0
    val nb = b.numElements()
    while (j < nb) {
      if (set.contains(b.getUTF8String(j))) cnt += 1
      j += 1
    }
    cnt
  }

  /** Symmetric int8 quantization summary of a vector, one fused pass:
    * `[scale, qsum, qnorm2, max_abs_err]` where `scale = max|x| / 127`,
    * `q_i = floor(x_i / scale + 0.5)` (round-half-up toward +∞ — `floor`
    * is IEEE-exact in every engine, unlike decimal `round`), `qsum = Σq_i`,
    * `qnorm2 = Σq_i²`, `max_abs_err = max|q_i·scale − x_i|`. q values are
    * integers in [−127, 127], so the sums are EXACT doubles at any
    * accumulation order; max is order-free — every output is
    * merge/partition-order deterministic. A zero or empty vector yields
    * all-zero stats (nothing to scale). Null elements yield null.
    */
  def int8QuantStats(v: ArrayData, isFloat: Boolean): ArrayData = {
    val n = v.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = math.abs(elem(v, i, isFloat))
      if (x > m) m = x
      i += 1
    }
    if (m == 0.0) return new GenericArrayData(Array(0.0, 0.0, 0.0, 0.0))
    val scale = m / 127.0
    var qsum = 0.0
    var qnorm = 0.0
    var maxErr = 0.0
    i = 0
    while (i < n) {
      val x = elem(v, i, isFloat)
      val q = math.floor(x / scale + 0.5)
      qsum += q
      qnorm += q * q
      val err = math.abs(q * scale - x)
      if (err > maxErr) maxErr = err
      i += 1
    }
    new GenericArrayData(Array(scale, qsum, qnorm, maxErr))
  }

  /** The quantized codes themselves: `q_i = floor(x_i / scale + 0.5)` as
    * int8 (same formula as [[int8QuantStats]] — |x_i| ≤ max|x| bounds q in
    * [−127, 127], so the byte cast never wraps). Zero/empty vectors map to
    * all-zero codes; null elements yield null.
    */
  def int8Codes(v: ArrayData, isFloat: Boolean): ArrayData = {
    val n = v.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = math.abs(elem(v, i, isFloat))
      if (x > m) m = x
      i += 1
    }
    val out = new Array[Byte](n)
    if (m == 0.0) return new GenericArrayData(out)
    val scale = m / 127.0
    i = 0
    while (i < n) {
      out(i) = math.floor(elem(v, i, isFloat) / scale + 0.5).toByte
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Product-quantization codes: split `v` into `m` contiguous subspaces
    * and emit, per subspace, the id of the centroid whose matching
    * subvector minimizes squared L2 distance (strict `<` with ids sorted
    * ascending → ties keep the lowest id). Distances accumulate
    * left-to-right as `d = x − y; s += d·d`, the order the DuckDB oracle
    * mirrors. Dimension mismatches throw (same fail-fast contract as
    * [[nearestCentroids]]); null elements read as NaN, whose distances
    * never win, matching the centroid-assignment convention.
    */
  def pqEncode(v: ArrayData, ids: Array[Long], cents: Array[Array[Double]],
      m: Int, isFloat: Boolean): ArrayData = {
    val dim = v.numElements()
    if (dim % m != 0)
      throw new IllegalArgumentException(
        s"pq_encode: dimension $dim not divisible by m=$m subspaces")
    val sub = dim / m
    val vd = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      vd(i) = if (v.isNullAt(i)) Double.NaN else elem(v, i, isFloat)
      i += 1
    }
    val codes = new Array[Long](m)
    var s = 0
    while (s < m) {
      var best = -1
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < ids.length) {
        val cv = cents(c)
        if (cv.length != dim)
          throw new IllegalArgumentException(
            s"pq_encode: vector dimension $dim does not match " +
              s"centroid ${ids(c)} dimension ${cv.length}")
        var d2 = 0.0
        var j = s * sub
        val hi = (s + 1) * sub
        while (j < hi) {
          val d = vd(j) - cv(j)
          d2 = d2 + d * d
          j += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      if (best < 0)
        throw new IllegalArgumentException(
          s"pq_encode: no finite distance in subspace $s (all-NaN input?)")
      codes(s) = ids(best)
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** Asymmetric-distance (ADC) lookup: given a row's PQ `codes` and a
    * QUERY-side distance table (`table(s)(ordinal)` = squared L2 between
    * the query's subvector `s` and centroid `ordinal`'s), returns the sum
    * over subspaces in subspace order — the approximate query↔row squared
    * distance without touching the row's original vector. Unknown code
    * ids throw (a code not in the codebook is a pipeline bug, not data).
    */
  def pqAdc(codes: ArrayData, ids: Array[Long],
      table: Array[Array[Double]]): java.lang.Double = {
    val m = codes.numElements()
    if (table.length != m)
      throw new IllegalArgumentException(
        s"pq_adc: ${table.length}-subspace table vs $m-code row")
    var acc = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val ord = java.util.Arrays.binarySearch(ids, codes.getLong(s))
      if (ord < 0)
        throw new IllegalArgumentException(
          s"pq_adc: code ${codes.getLong(s)} not in the codebook")
      acc = acc + table(s)(ord)
      s += 1
    }
    acc
  }

  /** Per-query ADC lookup table as a COLUMN value: `table(s)(ordinal)` =
    * squared L2 between the query's subvector `s` and centroid `ordinal`'s
    * matching slice, accumulated in the same left-to-right `d = x − y;
    * acc += d·d` order as [[pqEncode]] (and the driver-side table in
    * `Similarity.adcTable`), so batch and ad-hoc ADC are bit-identical.
    * Null elements read as NaN (the [[nearestCentroids]] convention);
    * dimension mismatches throw.
    */
  def adcTable(v: ArrayData, ids: Array[Long], cents: Array[Array[Double]],
      m: Int, isFloat: Boolean): ArrayData = {
    val dim = v.numElements()
    if (dim % m != 0)
      throw new IllegalArgumentException(
        s"adc_table: dimension $dim not divisible by m=$m subspaces")
    val sub = dim / m
    val vd = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      vd(i) = if (v.isNullAt(i)) Double.NaN else elem(v, i, isFloat)
      i += 1
    }
    val rows = new Array[Any](m)
    var s = 0
    while (s < m) {
      val row = new Array[Double](ids.length)
      var c = 0
      while (c < ids.length) {
        val cv = cents(c)
        if (cv.length != dim)
          throw new IllegalArgumentException(
            s"adc_table: vector dimension $dim does not match " +
              s"centroid ${ids(c)} dimension ${cv.length}")
        var d2 = 0.0
        var j = s * sub
        val hi = (s + 1) * sub
        while (j < hi) {
          val d = vd(j) - cv(j)
          d2 = d2 + d * d
          j += 1
        }
        row(c) = d2
        c += 1
      }
      rows(s) = new GenericArrayData(row)
      s += 1
    }
    new GenericArrayData(rows)
  }

  /** [[pqAdc]] with the distance table arriving as a column value (the
    * batch face: one table per QUERY ROW, broadcast-joined into the codes
    * scan) instead of a plan constant. Same accumulation order, same
    * fail-fast on unknown codes; a malformed (wrong-width) table throws.
    */
  def pqAdcDyn(codes: ArrayData, ids: Array[Long],
      table: ArrayData): java.lang.Double = {
    val m = codes.numElements()
    if (table.numElements() != m)
      throw new IllegalArgumentException(
        s"pq_adc: ${table.numElements()}-subspace table vs $m-code row")
    var acc = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s) || table.isNullAt(s)) return null
      val ord = java.util.Arrays.binarySearch(ids, codes.getLong(s))
      if (ord < 0)
        throw new IllegalArgumentException(
          s"pq_adc: code ${codes.getLong(s)} not in the codebook")
      acc = acc + table.getArray(s).getDouble(ord)
      s += 1
    }
    acc
  }

  /** Jaro–Winkler similarity over raw UTF-8 BYTES — deliberately
    * byte-based (not codepoints) so the kernel is bit-compatible with
    * DuckDB's `jaro_winkler_similarity` (RapidFuzz lineage), pinned
    * empirically: matching window ⌊max/2⌋−1, greedy left-to-right match
    * assignment, HALF-transposition count by integer division, Winkler
    * prefix boost (byte prefix capped at 4, scale 0.1) applied only when
    * jaro > 0.7, and either side empty → 0 (NOT 1, the RapidFuzz
    * convention). O(|a|·window) time, two small boolean scratch arrays —
    * keep inputs to name/key width (the x50 domain), not documents.
    */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s = a.getBytes
    val t = b.getBytes
    val n = s.length
    val m = t.length
    if (n == 0 || m == 0) return 0.0
    val win = math.max(math.max(n, m) / 2 - 1, 0)
    val sM = new Array[Boolean](n)
    val tM = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val hi = math.min(m - 1, i + win)
      var j = math.max(0, i - win)
      var open = true
      while (j <= hi && open) {
        if (!tM(j) && s(i) == t(j)) {
          sM(i) = true; tM(j) = true; matches += 1; open = false
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var mismatch = 0
    var k = 0
    i = 0
    while (i < n) {
      if (sM(i)) {
        while (!tM(k)) k += 1
        if (s(i) != t(k)) mismatch += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    val jaro = (mm / n + mm / m + (mm - mismatch / 2) / mm) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    val cap = math.min(4, math.min(n, m))
    while (p < cap && s(p) == t(p)) p += 1
    jaro + p * 0.1 * (1.0 - jaro)
  }
}
