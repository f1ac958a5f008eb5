package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample operators.
  *
  * Design for 100 TB:
  *  - bytes stay an opaque BinaryType column in parquet — the engine
  *    never shuffles decoded pixels, only bytes (columnar-compressed)
  *    and small feature vectors;
  *  - decode/featurize are genuinely imperative per-item work (a
  *    codec), so they run in `mapPartitions` on executors — the one
  *    place SURVEY §7.3's "(d) mapPartitions last resort" applies.
  *    Each partition opens ONE codec instance and closes it at task
  *    completion — the setup-once-per-partition pattern that matters
  *    when the real codec has per-process init cost;
  *  - the codec is pluggable behind the [[MediaCodec]] SPI: a
  *    deployment passes its [[MediaCodecProvider]] (JNI/lib-backed)
  *    and nothing else changes. The default is the clearly-marked
  *    STUB provider ([[DigestStubCodecProvider]] — no image/audio
  *    libs in this container): deterministic bytes→features so tests
  *    are reproducible. The Spark-side plumbing — schema, typed
  *    Dataset, partition batching, flatMap fan-out for frames — is
  *    real either way.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaItem(
      media_id: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      n_frames: Int)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      digest: String,
      features: Array[Float])

  final case class Frame(
      media_id: Long,
      frame_idx: Int,
      width: Int,
      height: Int,
      bytes: Array[Byte])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** Deterministic synthetic REAL-WAV audio derived from the
    * documents fixture — unlike [[syntheticMedia]]'s text-byte
    * payloads (which real decoders reject into the stub fallback),
    * these are VALID 16-bit PCM mono WAV files that
    * [[WavCodecProvider]]'s javax.sound decode path actually decodes,
    * so a gate over them exercises the real audio chain end to end.
    *
    * Construction (every choice serves exact oracle replication —
    * the per-window RMS the codec computes must be a closed form
    * both engines evaluate bit-identically):
    *  - `dim` feature windows of 512 samples (two full periods of a
    *    256-sample integer sawtooth `(j mod 256) − 128`);
    *  - window w's amplitude = (hex digit w of md5(text)) + 1,
    *    scaled by `gain` — samples are exact small integers, every
    *    squared term is an exact dyadic double, the window sum is
    *    exact (33 bits < 53), and the RMS is one correctly-rounded
    *    sqrt: engine and DuckDB produce the same float.
    *  - `gain` models a re-encode at different volume (the classic
    *    audio near-dup): features scale exactly ×gain, so cosine
    *    against the gain=1 original is exactly 1.
    * Payload = 44-byte canonical WAV header + the amplitude-indexed
    * PCM blocks, assembled as pure Column expressions (binary
    * literals selected by digest — no UDFs). */
  def syntheticWavMedia(documents: DataFrame, dim: Int = 8,
      gain: Int = 1): DataFrame = {
    require(dim >= 1 && dim <= 32, s"dim must be in [1, 32], got $dim")
    require(gain >= 1 && gain <= 2, s"gain must be 1 or 2, got $gain")
    val window = 512
    val header = wavHeader(dim * window, sampleRate = 16000)
    val blocks = array((1 to 32).map(a => lit(pcmBlock(a, window))): _*)
    val hexCol = md5(col("text"))
    val payload = concat(
      lit(header) +: (0 until dim).map { w =>
        val amp =
          (conv(substring(hexCol, w + 1, 1), 16, 10).cast("int") + 1) * gain
        element_at(blocks, amp)
      }: _*)
    documents.select(
      col("doc_id").as("media_id"),
      lit("audio").as("kind"),
      payload.as("bytes"),
      lit(0).as("width"),
      lit(0).as("height"),
      lit(16000).as("sample_rate"),
      lit(dim).as("n_frames"))
  }

  /** Deterministic synthetic REAL-AVI video derived from the
    * documents fixture — the video sibling of [[syntheticWavMedia]]:
    * a valid RIFF/AVI container holding ONE uncompressed 4×4 gray
    * BMP frame ('00db' — in-container DIB frames are part of the AVI
    * spec and ImageIO decodes BMP, so [[AviMjpegCodecProvider]]'s
    * real demux + real frame decode both run; no JPEG/DCT stands
    * between the pixels and the features).
    *
    * Pixel (x, y) is the gray value (hex digit (4y+x) of md5(text))
    * · 8 · `gain` — gray luma is the value itself ((299+587+114)/1000
    * = 1 exactly), the 4×4 frame pools one pixel per feature cell,
    * so feature i = pixel_i / 255.0f: one float division whose
    * single- vs double-rounded results agree for every byte value
    * (verified exhaustively), making the oracle exact. `gain` = 2
    * models a re-encode at doubled brightness: features scale
    * exactly ×2 (multiplication by 2 is exact), cosine exactly 1.
    * Payload assembled as pure Column expressions (pixel literals
    * selected by digest — no UDFs). */
  def syntheticAviMedia(documents: DataFrame, dim: Int = 16,
      gain: Int = 1): DataFrame = {
    require(dim == 16, s"the 4x4 BMP frame pools to dim 16, got $dim")
    require(gain >= 1 && gain <= 2, s"gain must be 1 or 2, got $gain")
    val pixLits = array((0 to 15).map { d =>
      val v = (d * 8 * gain).toByte
      lit(Array[Byte](v, v, v)) // BGR, gray
    }: _*)
    val hexCol = md5(col("text"))
    // BMP rows are stored bottom-up: row y=3 first; cell i = 4y + x
    val pixels = for (y <- 3 to 0 by -1; x <- 0 to 3) yield {
      val digit = conv(substring(hexCol, y * 4 + x + 1, 1), 16, 10)
        .cast("int") + 1
      element_at(pixLits, digit)
    }
    val payload = concat(lit(aviBmpPrefix) +: pixels: _*)
    documents.select(
      col("doc_id").as("media_id"),
      lit("video").as("kind"),
      payload.as("bytes"),
      lit(4).as("width"),
      lit(4).as("height"),
      lit(0).as("sample_rate"),
      lit(1).as("n_frames"))
  }

  /** Everything before the BMP pixel data: RIFF/AVI + LIST movi +
    * '00db' chunk headers and the 54-byte BMP header for a 4×4
    * 24-bpp bottom-up bitmap (48 pixel bytes follow; rows are
    * 12 bytes — already 4-byte aligned, no padding). */
  private lazy val aviBmpPrefix: Array[Byte] = {
    val bmpLen = 54 + 48
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + 8 + 4 + 8 + 54)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def four(s: String) = bb.put(s.getBytes("US-ASCII"))
    four("RIFF"); bb.putInt(4 + 8 + 4 + 8 + bmpLen) // 'AVI ' + LIST(movi)
    four("AVI ")
    four("LIST"); bb.putInt(4 + 8 + bmpLen); four("movi")
    four("00db"); bb.putInt(bmpLen)
    // BITMAPFILEHEADER
    four("BM"); bb.putInt(bmpLen); bb.putShort(0); bb.putShort(0)
    bb.putInt(54)
    // BITMAPINFOHEADER: 4x4, 1 plane, 24 bpp, BI_RGB
    bb.putInt(40); bb.putInt(4); bb.putInt(4); bb.putShort(1)
    bb.putShort(24); bb.putInt(0); bb.putInt(48)
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    bb.array()
  }

  /** One PCM window: `w` samples of the integer sawtooth scaled by
    * `amp`, as little-endian int16 bytes. */
  private def pcmBlock(amp: Int, w: Int): Array[Byte] = {
    val out = new Array[Byte](w * 2)
    var j = 0
    while (j < w) {
      val s = ((j % 256) - 128) * amp
      out(2 * j) = (s & 0xff).toByte
      out(2 * j + 1) = ((s >> 8) & 0xff).toByte
      j += 1
    }
    out
  }

  /** Canonical 44-byte PCM16-mono WAV header for `nSamples`. */
  private def wavHeader(nSamples: Int, sampleRate: Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII")); bb.put("fmt ".getBytes("US-ASCII"))
    bb.putInt(16); bb.putShort(1); bb.putShort(1)
    bb.putInt(sampleRate); bb.putInt(sampleRate * 2)
    bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    bb.array()
  }

  /** Deterministic synthetic media table derived from the documents
    * fixture (no real media in the container): text bytes stand in for
    * the payload, metadata derived from doc stats. */
  def syntheticMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "utf-8").as("bytes"),
      (col("n_chars") % 1920 + 1).cast("int").as("width"),
      (col("n_chars") % 1080 + 1).cast("int").as("height"),
      lit(16000).as("sample_rate"),
      (col("n_chars") % 30 + 1).cast("int").as("n_frames"))

  private def hex(bytes: Array[Byte]): String =
    bytes.map("%02x".format(_)).mkString

  /** Decode + featurize through the codec SPI. The digest/n_bytes
    * metadata is engine-side (payload identity, codec-independent);
    * the feature vector comes from the provider's codec — the default
    * stub for tests, a JNI/lib-backed implementation in a deployment.
    * One codec per partition, closed at task completion. */
  def decodeAndFeaturize(items: Dataset[MediaItem], dim: Int = 16,
      provider: MediaCodecProvider = DigestStubCodecProvider): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // empty partitions must not pay codec init (model weights, JNI)
      if (!it.hasNext) Iterator.empty
      else {
        val codec = provider.open()
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => codec.close()))
        val md = MessageDigest.getInstance("MD5")
        it.map { m =>
          MediaFeatures(m.media_id, m.kind, m.bytes.length,
            hex(md.digest(m.bytes)), codec.featurize(m, dim))
        }
      }
    }
  }

  /** STUB resize: real impl re-encodes pixels; the stub carries the
    * metadata transformation (aspect-preserving fit into a box) with
    * payload passthrough — the catalyst-visible part is real. */
  def resizeMeta(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(maxW).cast("double") / col("width"),
      lit(maxH).cast("double") / col("height"), lit(1.0))
    media
      .withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }

  /** Frame sampling: one video row fans out to ≤ `maxFrames` frame
    * rows (stride sampling). The stride/cap selection is engine-side;
    * each selected frame decodes through the codec SPI. One codec per
    * partition, closed at task completion. */
  def sampleFrames(items: Dataset[MediaItem], maxFrames: Int,
      provider: MediaCodecProvider = DigestStubCodecProvider): Dataset[Frame] = {
    import items.sparkSession.implicits._
    items.filter(_.kind == "video").mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val codec = provider.open()
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => codec.close()))
        it.flatMap { m =>
          val stride = math.max(1, m.n_frames / maxFrames)
          (0 until m.n_frames by stride).take(maxFrames).map { idx =>
            Frame(m.media_id, idx, m.width, m.height, codec.decodeFrame(m, idx))
          }
        }
      }
    }
  }
}
