package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.CRC32

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Real (pure-JVM) media container header parsing: PNG IHDR, JPEG SOF0/2,
  * GIF87a/89a logical screen descriptor. These are public byte layouts that
  * need no codec library — width/height/bit-depth come straight from the
  * container bytes, which is exactly what a 100 TB media-ingest pass needs
  * before deciding what to decode (filter by dimensions, route by format,
  * budget frame sampling) without ever invoking a pixel codec.
  *
  * [[Multimodal.DeterministicFakeDecoder]] remains the PIXEL-tier stand-in
  * (this container has no codecs to decode actual image data); header
  * parsing below is not a stub — it reads the real formats.
  */
object MediaHeaders {

  /** Parsed header: `format` is "png" | "jpeg" | "gif" | "unknown"; the
    * dimension fields are null for unknown/corrupt blobs (a quarantine
    * filter downstream, same shape as P15 dead-lettering).
    */
  case class MediaHeader(doc_id: Long, format: String,
      width: Option[Int], height: Option[Int], bit_depth: Option[Int])

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private val PngSig =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG: 8-byte signature, then the IHDR chunk (must be first): 4-byte
    * length (always 13), "IHDR", width/height as 4-byte big-endian, bit
    * depth, color type, compression, filter, interlace, CRC32 over
    * type+data. The CRC is verified — a truncated or bit-flipped header
    * parses as unknown rather than yielding garbage dimensions.
    */
  private def parsePng(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 33) return None
    var i = 0
    while (i < 8) { if (b(i) != PngSig(i)) return None; i += 1 }
    if (be32(b, 8) != 13) return None
    if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R') return None
    val crc = new CRC32
    crc.update(b, 12, 17) // chunk type + 13 data bytes
    if (crc.getValue.toInt != be32(b, 29)) return None
    Some((be32(b, 16), be32(b, 20), b(24) & 0xff))
  }

  /** JPEG: SOI then a marker walk — each segment is FF <marker> <2-byte
    * big-endian length including itself>. Dimensions live in the first
    * start-of-frame marker (SOF0 baseline, SOF1 extended, SOF2
    * progressive): precision byte, then height and width as big-endian
    * 16-bit. Stops at start-of-scan/EOI (no SOF before pixel data = not a
    * parseable image).
    */
  private def parseJpeg(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      val marker = b(i + 1) & 0xff
      if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
        if (i + 8 >= b.length) return None
        return Some((be16(b, i + 7), be16(b, i + 5), b(i + 4) & 0xff))
      } else if (marker == 0xd9 || marker == 0xda) {
        return None // EOI / start-of-scan with no SOF seen
      } else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        i += 2 // standalone markers carry no length
      } else {
        i += 2 + be16(b, i + 2)
      }
    }
    None
  }

  /** GIF: "GIF87a"/"GIF89a", then the logical screen descriptor — width
    * and height as little-endian 16-bit, one packed byte whose bits 6-4
    * hold (color resolution - 1), i.e. bits per primary channel.
    */
  private def parseGif(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 13) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    Some((le16(b, 6), le16(b, 8), (((b(10) & 0xff) >> 4) & 0x07) + 1))
  }

  /** Sniff + parse: tries each container signature in turn. */
  def parse(id: Long, bytes: Array[Byte]): MediaHeader = {
    parsePng(bytes).map { case (w, h, d) =>
      MediaHeader(id, "png", Some(w), Some(h), Some(d))
    }.orElse(parseJpeg(bytes).map { case (w, h, d) =>
      MediaHeader(id, "jpeg", Some(w), Some(h), Some(d))
    }).orElse(parseGif(bytes).map { case (w, h, d) =>
      MediaHeader(id, "gif", Some(w), Some(h), Some(d))
    }).getOrElse(MediaHeader(id, "unknown", None, None, None))
  }

  /** Partition-wise header parse over a `(doc_id, media)` frame — same
    * `mapPartitions` shape as [[Multimodal.decodeFeatures]] (amortizes any
    * per-partition setup; blobs never reach a shuffle: the output is
    * metadata-width).
    */
  def parseHeaders(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(rows => rows.map { case (id, bytes) => parse(id, bytes) })
      .toDF()
  }

  // ── deterministic synthesis (test/oracle harness) ────────────────────────
  // Writes genuinely valid container bytes whose dimensions are a closed
  // form of the id, so a DuckDB oracle can compute the expected parse
  // without any byte handling: any field the parser misreads — offset,
  // endianness, CRC — breaks the hash match.

  /** Closed-form synthetic dimensions (mirrored in the x13_real_headers
    * oracle SQL): format rotates by id%3, every id%7==0 blob is garbage.
    */
  def synthWidth(id: Long): Int = (16 + (id * 7) % 1024).toInt
  def synthHeight(id: Long): Int = (16 + (id * 13) % 768).toInt
  def synthGifDepth(id: Long): Int = (1 + id % 8).toInt

  /** A valid blob for `id` (PNG/JPEG/GIF by id%3; id%7==0 → non-media
    * bytes). JPEG places APP0 and a variable-length comment segment before
    * SOF so the parser's marker walk is actually exercised, and alternates
    * baseline/progressive SOF markers.
    */
  def synthBlob(id: Long): Array[Byte] = {
    if (id % 7 == 0) return s"not media $id".getBytes("UTF-8")
    val w = synthWidth(id)
    val h = synthHeight(id)
    val out = new ByteArrayOutputStream(64)
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16be(v: Int): Unit = { w8(v >> 8); w8(v) }
    def w16le(v: Int): Unit = { w8(v); w8(v >> 8) }
    def w32be(v: Int): Unit = { w16be(v >>> 16); w16be(v) }
    (id % 3) match {
      case 0 => // PNG: signature + IHDR (bit depth 8, truecolor) + real CRC
        out.write(PngSig, 0, 8)
        w32be(13)
        val data = new ByteArrayOutputStream(17)
        data.write('I'); data.write('H'); data.write('D'); data.write('R')
        def d32(v: Int): Unit = {
          data.write((v >>> 24) & 0xff); data.write((v >>> 16) & 0xff)
          data.write((v >>> 8) & 0xff); data.write(v & 0xff)
        }
        d32(w); d32(h)
        data.write(8); data.write(2); data.write(0); data.write(0); data.write(0)
        val chunk = data.toByteArray
        out.write(chunk, 0, chunk.length)
        val crc = new CRC32
        crc.update(chunk, 0, chunk.length)
        w32be(crc.getValue.toInt)
      case 1 => // JPEG: SOI, APP0(JFIF), COM, SOF0/SOF2, EOI
        w16be(0xffd8)
        w16be(0xffe0); w16be(16)
        out.write("JFIF".getBytes("US-ASCII"), 0, 4); w8(0)
        w8(1); w8(1); w8(0); w16be(1); w16be(1); w8(0); w8(0)
        val comment = ("c" * ((id % 5) + 4).toInt).getBytes("US-ASCII")
        w16be(0xfffe); w16be(2 + comment.length)
        out.write(comment, 0, comment.length)
        w16be(if (id % 2 == 0) 0xffc0 else 0xffc2)
        w16be(17); w8(8); w16be(h); w16be(w); w8(3)
        var c = 1
        while (c <= 3) { w8(c); w8(0x11); w8(0); c += 1 }
        w16be(0xffd9)
      case _ => // GIF89a: logical screen descriptor + trailer
        out.write("GIF89a".getBytes("US-ASCII"), 0, 6)
        w16le(w); w16le(h)
        w8((synthGifDepth(id) - 1) << 4) // no global color table
        w8(0); w8(0) // background color index, pixel aspect ratio
        w8(0x3b)
    }
    out.toByteArray
  }

  /** `(doc_id, media)` frame of synthesized blobs for an id frame — the
    * harness input for [[parseHeaders]] in x13_real_headers.
    */
  def synthesize(spark: SparkSession, ids: DataFrame): DataFrame = {
    import spark.implicits._
    ids.select(org.apache.spark.sql.functions.col("doc_id")).as[Long]
      .mapPartitions(it => it.map(id => (id, synthBlob(id))))
      .toDF("doc_id", "media")
  }

  // ── audio (RIFF/WAVE) ────────────────────────────────────────────────────

  /** Parsed WAV header: nulls for non-WAV/corrupt blobs. `duration_us` =
    * ⌊data bytes / block align · 10⁶ / sample rate⌋ in exact integer
    * arithmetic (sample count is integral; only the final division
    * floors), so an oracle can restate it with BIGINT division.
    */
  case class AudioHeader(doc_id: Long, format: String,
      channels: Option[Int], sample_rate: Option[Int],
      bits_per_sample: Option[Int], duration_us: Option[Long])

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** WAV: "RIFF" + size + "WAVE", then a CHUNK WALK (id, LE size,
    * payload, odd sizes padded to even — the RIFF alignment rule) until
    * both the "fmt " chunk (PCM layout: format tag, channels, sample
    * rate, byte rate, block align, bits per sample — all little-endian)
    * and the "data" chunk size are seen. Unknown chunks (LIST, cue …)
    * are skipped by size, which is what makes the walk a real parse
    * rather than a fixed-offset read.
    */
  def parseWav(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "WAVE")
      return None
    var i = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, bits, blockAlign
    var dataSize: Option[Long] = None
    while (i + 8 <= b.length && (fmt.isEmpty || dataSize.isEmpty)) {
      val id = fourcc(b, i)
      val size = le32(b, i + 4)
      val body = i + 8
      if (id == "fmt ") {
        if (size < 16 || body + 16 > b.length) return None
        val channels = le16(b, body + 2)
        val rate = le32(b, body + 4).toInt
        val blockAlign = le16(b, body + 12)
        val bits = le16(b, body + 14)
        if (channels < 1 || rate < 1 || blockAlign < 1) return None
        fmt = Some((channels, rate, bits, blockAlign))
      } else if (id == "data") {
        dataSize = Some(size)
      }
      i = body + size.toInt + (size.toInt & 1) // odd chunk sizes pad a byte
    }
    for ((channels, rate, bits, blockAlign) <- fmt; d <- dataSize)
      yield (channels, rate, bits, d / blockAlign * 1000000L / rate)
  }

  def parseAudio(id: Long, bytes: Array[Byte]): AudioHeader =
    parseWav(bytes).map { case (c, r, bits, us) =>
      AudioHeader(id, "wav", Some(c), Some(r), Some(bits), Some(us))
    }.getOrElse(AudioHeader(id, "unknown", None, None, None, None))

  /** Partition-wise WAV parse — same shape as [[parseHeaders]]. */
  def parseAudioHeaders(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(rows => rows.map { case (id, bytes) =>
        parseAudio(id, bytes) })
      .toDF()
  }

  /** Closed-form synthetic audio parameters (mirrored in the
    * x130_wav_headers oracle): rate rotates over four standard rates,
    * channels/bits over mono-stereo × 8/16/24, `id % 7 == 0` → garbage.
    */
  def synthRate(id: Long): Int =
    Array(8000, 16000, 22050, 44100)((id % 4).toInt)
  def synthChannels(id: Long): Int = (1 + id % 2).toInt
  def synthBits(id: Long): Int = (8 * (1 + id % 3)).toInt
  def synthSamples(id: Long): Long = 100 + (id * 31) % 900

  /** A valid WAV blob for `id` (garbage for `id % 7 == 0`); even ids get
    * a LIST chunk BEFORE fmt so the chunk walk is exercised, and the data
    * payload is physically present (all-zero samples).
    */
  def synthWav(id: Long): Array[Byte] = {
    if (id % 7 == 0) return s"not audio $id".getBytes("UTF-8")
    val channels = synthChannels(id)
    val rate = synthRate(id)
    val bits = synthBits(id)
    val blockAlign = channels * bits / 8
    val dataSize = synthSamples(id) * blockAlign
    val out = new ByteArrayOutputStream(64 + dataSize.toInt)
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    def w32(v: Long): Unit = {
      w8(v.toInt); w8((v >> 8).toInt); w8((v >> 16).toInt); w8((v >> 24).toInt)
    }
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
    val listBody = if (id % 2 == 0) 9 else 0 // ODD size: exercises the pad rule
    val listBytes = if (id % 2 == 0) 8 + listBody + (listBody & 1) else 0
    tag("RIFF"); w32(4 + listBytes + 24 + 8 + dataSize); tag("WAVE")
    if (id % 2 == 0) {
      tag("LIST"); w32(listBody)
      var j = 0
      while (j < listBody + (listBody & 1)) { w8(0); j += 1 }
    }
    tag("fmt "); w32(16)
    w16(1); w16(channels); w32(rate); w32(rate.toLong * blockAlign)
    w16(blockAlign); w16(bits)
    tag("data"); w32(dataSize)
    var j = 0L
    while (j < dataSize) { w8(0); j += 1 }
    out.toByteArray
  }

  /** `(doc_id, media)` frame of synthesized WAV blobs. */
  def synthesizeWav(spark: SparkSession, ids: DataFrame): DataFrame = {
    import spark.implicits._
    ids.select(org.apache.spark.sql.functions.col("doc_id")).as[Long]
      .mapPartitions(it => it.map(id => (id, synthWav(id))))
      .toDF("doc_id", "media")
  }
}
