package graft

import org.apache.spark.sql.functions._

import graft.text.Chunking

/** Content-defined chunking: boundary determinism, reconstruction
  * invariants, shared-chunk detection and the content-locality property
  * that motivates CDC over fixed windows.
  */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def table(rows: Seq[(Long, String)], maskBits: Int = 6) =
    Chunking.chunkTable(rows.toDF("doc_id", "text"), col("doc_id"),
      col("text"), maskBits = maskBits)

  test("chunk lengths partition the document exactly, in order") {
    val text = ("the quick brown fox jumps over the lazy dog " * 20).trim
    val rows = table(Seq((1L, text)))
      .orderBy(col("chunk_idx")).collect()
    assert(rows.map(_.getInt(2)).sum === text.length)
    assert(rows.map(_.getInt(1)).toSeq === rows.indices.toSeq)
    // a low mask (2 bits -> expected 4-char chunks) cuts often; 6 bits
    // rarely — the dial controls granularity
    val fine = table(Seq((1L, text)), maskBits = 2).count()
    assert(fine > rows.length)
  }

  test("identical text yields identical fingerprints; chunks are content-local") {
    val shared = "this exact boilerplate paragraph is pasted into both pages verbatim and should chunk identically"
    val a = s"first document unique preamble text here. $shared"
    val b = s"$shared trailing content belonging only to the second page"
    val chunks = table(Seq((1L, a), (2L, b)))
      .select(col("doc_id"), col("chunk_len"), col("chunk_hash")).collect()
    val ofA = chunks.filter(_.getLong(0) == 1L)
      .map(r => (r.getInt(1), r.getLong(2))).toSet
    val ofB = chunks.filter(_.getLong(0) == 2L)
      .map(r => (r.getInt(1), r.getLong(2))).toSet
    // the shared paragraph produces at least one identical (len, hash)
    // fingerprint in both docs DESPITE different offsets — the property a
    // fixed-window chunker cannot have
    assert((ofA intersect ofB).nonEmpty)
  }

  test("empty and sub-window docs: zero or one chunk") {
    val rows = table(Seq((1L, ""), (2L, "short")))
      .collect().map(r => r.getLong(0) -> ((r.getInt(2), r.getLong(3))))
    assert(!rows.exists(_._1 == 1L)) // empty text -> no chunks
    val one = rows.filter(_._1 == 2L)
    assert(one.length === 1 && one.head._2._1 === 5)
  }

  test("sharedChunks finds the cross-doc paste, redundancy scores it") {
    // varied (non-periodic) text long enough that the 1/64 cut rate
    // yields interior boundaries: this fixed string measures 4 cuts and 3
    // shared >=16-char chunks between the two embeddings (a REPEATED unit
    // would make the rolling hash periodic — all-or-nothing cuts)
    val boiler = (1 to 24)
      .map(i => s"boilerplate$i legal clause term$i governing usage")
      .mkString(" ")
    val docs = Seq(
      (1L, s"alpha page content first ${boiler}and alpha footer"),
      (2L, s"totally different beta article body ${boiler}beta end"),
      (3L, "an unrelated third document with none of the shared block"))
      .toDF("doc_id", "text")
    val shared = Chunking.sharedChunks(docs, col("doc_id"), col("text"))
      .collect()
    assert(shared.nonEmpty)
    shared.foreach { r =>
      assert(r.getLong(2) >= 2L)        // n_docs
      assert(r.getLong(3) >= r.getLong(2)) // occurrences >= docs
      assert(r.getInt(1) >= Chunking.DefaultMinLen)
    }
    val red = Chunking.redundancy(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_ => r.getDouble(3)))))
      .toMap
    // docs 1 and 2 share mass; doc 3 shares none
    assert(red(1L)._2 > 0L && red(2L)._2 > 0L)
    assert(red(3L)._2 === 0L)
    assert(red(3L)._3.contains(0.0) || red(3L)._3.isEmpty)
    red.values.foreach { case (n, s, f) =>
      assert(s <= n)
      f.foreach(v => assert(v >= 0.0 && v <= 1.0))
    }
  }

  test("kernel fold matches an independent reference implementation") {
    // closed-form reference in plain Scala (BigInt-free: the same Long
    // arithmetic, written independently of the kernel's loop structure)
    val M = Chunking.HashM
    val B = Chunking.HashB
    val w = Chunking.DefaultWindow
    val mask = (1L << Chunking.DefaultMaskBits) - 1
    val text = "content defined chunking reference check 0123456789 abcdefghijklmnopqrstuvwxyz repeated " * 4
    val codes = text.codePoints().toArray.map(_.toLong)
    val pows = Chunking.pows(w)
    val cuts = (w to codes.length - 1).filter { p =>
      val wh = (0 until w).foldLeft(0L)((a, j) =>
        (a + codes(p - w + j) * pows(j) % M) % M)
      (wh & mask) == 0L
    }
    val bounds = (0 +: cuts) :+ codes.length
    val want = bounds.sliding(2).map { case Seq(s, e) =>
      (e - s, codes.slice(s, e).foldLeft(0L)((a, c) => (a * B + c) % M))
    }.toSeq
    val got = table(Seq((1L, text))).orderBy(col("chunk_idx"))
      .collect().map(r => (r.getInt(2), r.getLong(3))).toSeq
    assert(got === want)
  }
}
