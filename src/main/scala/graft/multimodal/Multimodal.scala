package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, plus partition-wise decode/feature-extract plumbing.
  *
  * Two tiers:
  *  - CONTAINER HEADERS are parsed for real — [[MediaHeaders]] reads PNG
  *    IHDR (CRC-verified), JPEG SOF0/1/2 via a marker walk, and the GIF
  *    logical screen descriptor, pure-JVM, no codec library.
  *  - The PIXEL tier is stubbed with a deterministic fake (this container
  *    has no image/audio codecs); everything around it — schema, batch
  *    iteration, partition shape, metadata extraction — is real. Swap
  *    [[DeterministicFakeDecoder]] for a codec-backed decoder in
  *    production.
  *
  * Scale notes: media blobs dominate row size, so the pipeline (a) keeps
  * blobs out of shuffles — metadata is derived in a narrow pass and the blob
  * column is dropped before any wide operation; (b) decodes per-partition via
  * `mapPartitions` so decoder init (model load, codec context) amortizes over
  * a whole batch, the same shape as Python's `mapInPandas`.
  */
object Multimodal {

  /** A decoded media record: deterministic metadata a decoder would emit. */
  case class MediaFeatures(doc_id: Long, byte_len: Long, width: Int,
      height: Int, channels: Int, n_frames: Int, brightness: Double)

  /** Decoder contract: bytes → features. Real implementations wrap an image
    * or AV codec; init happens once per partition in [[decodeFeatures]].
    */
  trait MediaDecoder extends Serializable {
    def decode(id: Long, bytes: Array[Byte]): MediaFeatures
  }

  /** FNV-1a over the blob — the stub pixel source every fake-decode value
    * derives from (Long multiplication wraps = arithmetic mod 2⁶⁴, which
    * the oracle restates in HUGEINT).
    */
  private[multimodal] def fnv64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xff)) * 0x100000001b3L; i += 1 }
    h
  }

  /** Deterministic fake decoder: derives plausible metadata purely from the
    * byte content (FNV-1a hash), so tests are reproducible and
    * engine-checkable. A real decoder would parse the container format here.
    */
  object DeterministicFakeDecoder extends MediaDecoder {
    def decode(id: Long, bytes: Array[Byte]): MediaFeatures = {
      val h = fnv64(bytes)
      val w = 64 + (math.floorMod(h, 448L)).toInt
      val ht = 64 + (math.floorMod(h >>> 16, 448L)).toInt
      MediaFeatures(id, bytes.length.toLong, w, ht,
        channels = 3,
        n_frames = 1 + math.floorMod(h >>> 32, 30L).toInt,
        brightness = math.floorMod(h >>> 8, 1000L) / 1000.0)
    }
  }

  /** Average-hash (aHash) perceptual fingerprint as a 64-char bitstring:
    * an 8×8 "thumbnail" of pixel intensities, each bit = pixel above the
    * thumbnail mean — the standard first tier of image dedup (robust to
    * resize/re-encode in the real-pixel world because the thumbnail
    * averages detail away).
    *
    * Pixel tier is the documented stub: intensity k derives from the
    * decode hash as `((h · (2k+1)) mod 2⁶⁴) >>> 56` (top byte of an
    * odd-multiplier mix — deterministic, engine-checkable; a codec-backed
    * decoder would average real grayscale blocks here). The mean compare
    * is integer-exact (`p_k·64 > Σp` — no division), so the bitstring
    * hash-compares across engines.
    */
  def perceptualHash(bytes: Array[Byte]): String = {
    val h = fnv64(bytes)
    val px = new Array[Long](64)
    var k = 0
    while (k < 64) { px(k) = (h * (2L * k + 1)) >>> 56; k += 1 }
    var sum = 0L
    k = 0
    while (k < 64) { sum += px(k); k += 1 }
    val sb = new java.lang.StringBuilder(64)
    k = 0
    while (k < 64) { sb.append(if (px(k) * 64 > sum) '1' else '0'); k += 1 }
    sb.toString
  }

  /** Per-item perceptual hashes with their exact-collision group size —
    * the media-dedup first tier: items sharing a phash are dedup
    * candidates (with real pixels, near-identical images; with the stub,
    * exact byte duplicates). Partition-wise like [[decodeFeatures]]
    * (decoder init amortizes; the blob never crosses a shuffle — only the
    * 64-char hash does). The group-size join is AQE-planned: the
    * collision set is corpus-sized exactly when the corpus is
    * duplicate-heavy.
    */
  def phashGroups(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val ph = media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) => (id, perceptualHash(bytes)) }
      }
      .toDF("doc_id", "phash")
    val g = ph.groupBy(col("phash")).agg(count(lit(1)).as("n_same_phash"))
    ph.join(g, Seq("phash"))
      .select(col("doc_id"), col("phash"), col("n_same_phash"))
  }

  /** Wrap a text table as a fake media table: (doc_id, media binary, meta).
    * Stands in for `spark.read.format("binaryFile")` in tests.
    */
  def asMediaTable(df: DataFrame): DataFrame =
    df.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        octet_length(encode(col("text"), "UTF-8")).as("byte_len"),
        lit("image/fake").as("mime"),
        col("source")).as("meta"))

  /** Partition-wise decode: the Scala analogue of `mapInPandas` — one
    * decoder instance per partition, streamed batch iteration, typed output.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame,
      decoder: MediaDecoder = DeterministicFakeDecoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder init would go here (codec/model load)
        rows.map { case (id, bytes) => decoder.decode(id, bytes) }
      }
  }

  /** Resize planning over decoded features: aspect-preserving scale factor
    * and target box per media item. A real pipeline hands `scale` to the
    * codec; the Spark-side shape (projection over decoded features, blob
    * already dropped) is the part that matters at scale.
    */
  def resizePlan(features: Dataset[MediaFeatures], targetW: Int,
      targetH: Int): DataFrame =
    features.toDF().select(
      col("doc_id"), col("width"), col("height"),
      lit(targetW).as("target_w"), lit(targetH).as("target_h"),
      round(least(lit(targetW) / col("width").cast("double"),
        lit(targetH) / col("height").cast("double")), 6).as("scale"))

  /** Frame sampling: every `everyN`-th frame index per item, exploded to
    * one row per sampled frame — the fan-out shape video feature extraction
    * needs (downstream decode runs per sampled frame, not per video).
    */
  def sampleFrames(features: Dataset[MediaFeatures], everyN: Int): DataFrame =
    features.toDF().select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyN)))
          .as("frame_idx"))

  /** Metadata-only pass, expression-level (no decode): cheap stats available
    * without touching a codec — byte length, md5 content id, a size bucket
    * for downstream partitioning. Blob column dropped on output.
    */
  def mediaMetadata(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("meta.byte_len").as("byte_len"),
      md5(col("media")).as("content_id"),
      (col("meta.byte_len") / 100).cast("long").as("size_bucket"))
}
