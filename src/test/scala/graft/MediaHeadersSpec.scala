package graft

import graft.multimodal.MediaHeaders

/** Header-parser unit coverage beyond the x13_real_headers oracle: fixed
  * known-byte fixtures (so the parser is checked against the FORMAT SPEC,
  * not just against our own synthesizer), plus corruption/truncation paths
  * that must land in "unknown" rather than garbage dimensions.
  */
class MediaHeadersSpec extends SparkSpec {

  test("synth round-trip matches the closed form for all three formats") {
    for (id <- 1L to 200L) {
      val h = MediaHeaders.parse(id, MediaHeaders.synthBlob(id))
      if (id % 7 == 0) {
        assert(h.format === "unknown" && h.width.isEmpty && h.height.isEmpty)
      } else {
        val fmt = (id % 3) match {
          case 0 => "png"; case 1 => "jpeg"; case _ => "gif"
        }
        assert(h.format === fmt, s"id=$id")
        assert(h.width === Some(MediaHeaders.synthWidth(id)), s"id=$id")
        assert(h.height === Some(MediaHeaders.synthHeight(id)), s"id=$id")
        val depth = if (id % 3 == 2) MediaHeaders.synthGifDepth(id) else 8
        assert(h.bit_depth === Some(depth), s"id=$id")
      }
    }
  }

  test("fixed GIF fixture: spec-defined byte layout parses exactly") {
    // GIF89a, 640x480, color resolution 8 (packed 0x70 = bits 6-4 set to 7)
    val b = "GIF89a".getBytes("US-ASCII") ++
      Array(0x80, 0x02, 0xe0, 0x01, 0x70, 0x00, 0x00, 0x3b).map(_.toByte)
    val h = MediaHeaders.parse(1L, b)
    assert(h.format === "gif")
    assert(h.width === Some(640) && h.height === Some(480))
    assert(h.bit_depth === Some(8))
  }

  test("fixed PNG fixture: 1x1 8-bit from the PNG spec parses exactly") {
    // Hand-assembled signature + IHDR for a 1x1, bit depth 8, grayscale
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    val ihdrData = Array[Int]('I', 'H', 'D', 'R',
      0, 0, 0, 1, 0, 0, 0, 1, 8, 0, 0, 0, 0)
    val crc = new java.util.zip.CRC32
    crc.update(ihdrData.map(_.toByte), 0, 17)
    val c = crc.getValue.toInt
    val b = (sig ++ Array(0, 0, 0, 13) ++ ihdrData ++
      Array(c >>> 24, (c >>> 16) & 0xff, (c >>> 8) & 0xff, c & 0xff)).map(_.toByte)
    val h = MediaHeaders.parse(1L, b)
    assert(h.format === "png")
    assert(h.width === Some(1) && h.height === Some(1) && h.bit_depth === Some(8))
  }

  test("corruption and truncation land in unknown, never garbage") {
    val pngId = 3L // id%3==0, id%7!=0
    val png = MediaHeaders.synthBlob(pngId)
    val flipped = png.clone(); flipped(18) = (flipped(18) ^ 0x01).toByte
    assert(MediaHeaders.parse(0, flipped).format === "unknown") // CRC catches it
    val jpeg = MediaHeaders.synthBlob(1L)
    assert(MediaHeaders.parse(0, jpeg.take(9)).format === "unknown")
    // JPEG whose stream ends (EOI) before any SOF marker
    val noSof = Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)
    assert(MediaHeaders.parse(0, noSof).format === "unknown")
    assert(MediaHeaders.parse(0, Array[Byte]()).format === "unknown")
    assert(MediaHeaders.parse(0, "plain text".getBytes).format === "unknown")
  }

  test("parseHeaders dataframe surface: schema and null propagation") {
    import org.apache.spark.sql.functions.col
    val ids = spark.range(0, 50).toDF("doc_id")
    val out = MediaHeaders.parseHeaders(spark, MediaHeaders.synthesize(spark, ids))
    assert(out.columns.toSeq ===
      Seq("doc_id", "format", "width", "height", "bit_depth"))
    assert(out.filter(col("format") === "unknown").count() === 8) // ids 0,7,...,49
    assert(out.filter(col("width").isNull) .count() === 8)
    assert(out.count() === 50)
  }

  test("parseWav walks chunks (LIST skip + odd-size pad) and reads LE fields") {
    // id 2: even → LIST chunk with ODD body size precedes fmt, so a
    // parser that ignores the RIFF pad byte lands mid-stream and fails
    val ok = MediaHeaders.parseWav(MediaHeaders.synthWav(2L))
    assert(ok === Some((1, 22050, 24,
      MediaHeaders.synthSamples(2L) * 1000000L / 22050)))
    // id 3: odd → fmt immediately after the RIFF header
    val ok3 = MediaHeaders.parseWav(MediaHeaders.synthWav(3L))
    assert(ok3 === Some((2, 44100, 8,
      MediaHeaders.synthSamples(3L) * 1000000L / 44100)))
    // garbage, truncation, wrong magic all parse as None — never garbage
    assert(MediaHeaders.parseWav(MediaHeaders.synthWav(7L)) === None)
    assert(MediaHeaders.parseWav(MediaHeaders.synthWav(2L).take(20)) === None)
    assert(MediaHeaders.parseWav("RIFFxxxxAVI ".getBytes("US-ASCII")) === None)
    assert(MediaHeaders.parseWav(Array[Byte]()) === None)
    // a WAV with fmt but no data chunk yields no duration → None
    val noData = MediaHeaders.synthWav(3L)
    val cut = noData.take(12 + 8 + 16) // RIFF header + fmt chunk only
    assert(MediaHeaders.parseWav(cut) === None)
  }

  test("parseAudioHeaders surface: schema, formats, duration math") {
    import org.apache.spark.sql.functions.col
    val ids = spark.range(0, 28).toDF("doc_id")
    val out = MediaHeaders.parseAudioHeaders(spark,
      MediaHeaders.synthesizeWav(spark, ids))
    assert(out.columns.toSeq === Seq("doc_id", "format", "channels",
      "sample_rate", "bits_per_sample", "duration_us"))
    assert(out.filter(col("format") === "unknown").count() === 4) // 0,7,14,21
    assert(out.filter(col("duration_us").isNull).count() === 4)
    val r5 = out.filter(col("doc_id") === 5).collect().head
    assert(r5.getInt(2) === 2 && r5.getInt(3) === 16000 && r5.getInt(4) === 24)
    assert(r5.getLong(5) ===
      MediaHeaders.synthSamples(5L) * 1000000L / 16000)
  }
}
