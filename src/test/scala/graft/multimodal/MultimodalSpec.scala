package graft.multimodal

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.Multimodal._

/** Closure-side codec with JVM-static lifecycle counters (local mode
  * shares the JVM, so per-partition open/close is observable). */
object MultimodalSpec {
  val opens = new AtomicInteger(0)
  val closes = new AtomicInteger(0)

  object MarkerCodecProvider extends MediaCodecProvider {
    override def open(): MediaCodec = {
      opens.incrementAndGet()
      new MediaCodec {
        override def featurize(item: MediaItem, dim: Int): Array[Float] =
          Array.tabulate(dim)(i => (i + 1).toFloat) // recognizable marker
        override def decodeFrame(item: MediaItem, frameIdx: Int): Array[Byte] =
          Array(42.toByte, frameIdx.toByte)
        override def close(): Unit = { closes.incrementAndGet(); () }
      }
    }
  }
}

class MultimodalSpec extends SparkSpec {

  private def media() = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    syntheticMedia(docs)
  }

  test("synthetic media table has the contract schema") {
    val m = media()
    // compare names+types; nullability of derived columns is a plan
    // property, not part of the contract
    assert(m.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      mediaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(m.count() > 0)
    val kinds = m.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("decodeAndFeaturize: typed round-trip, fixed dim, deterministic") {
    import spark.implicits._
    val items = media().as[MediaItem]
    val f1 = decodeAndFeaturize(items, dim = 16).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    val f2 = decodeAndFeaturize(items, dim = 16).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(f1 == f2) // stub decode is deterministic
    assert(f1.values.forall(_.size == 16))
    // digest matches the engine-side md5 of the same bytes
    val engineDigest = media().select(col("media_id"), md5(col("bytes")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val opDigest = decodeAndFeaturize(items).collect()
      .map(f => f.media_id -> f.digest).toMap
    assert(engineDigest == opDigest)
  }

  test("resizeMeta fits within the box preserving aspect") {
    val r = resizeMeta(media(), 640, 360)
      .select("width", "height", "out_width", "out_height").collect()
    r.foreach { row =>
      val (w, h, ow, oh) = (row.getInt(0), row.getInt(1), row.getInt(2), row.getInt(3))
      assert(ow <= 640 && oh <= 360)
      if (w <= 640 && h <= 360) assert(ow == w && oh == h) // no upscale
    }
  }

  test("a custom codec provider drives featurize + frame decode end-to-end") {
    import spark.implicits._
    import MultimodalSpec._
    opens.set(0); closes.set(0)
    val items = media().as[MediaItem]
    val fs = decodeAndFeaturize(items, dim = 4,
      provider = MarkerCodecProvider).collect()
    assert(fs.nonEmpty &&
      fs.forall(_.features.toSeq == Seq(1f, 2f, 3f, 4f)),
      "features must come from the injected codec, not the stub")
    val frames = sampleFrames(items, maxFrames = 2,
      provider = MarkerCodecProvider).collect()
    assert(frames.nonEmpty && frames.forall(f =>
      f.bytes.length == 2 && f.bytes(0) == 42.toByte
        && f.bytes(1) == f.frame_idx.toByte),
      "frame payloads must come from the injected codec")
    assert(opens.get() > 0 && opens.get() == closes.get(),
      s"codec lifecycle leak: opens=${opens.get()} closes=${closes.get()}")
  }

  test("ImageIO provider really decodes PNG payloads through the SPI") {
    import spark.implicits._
    def png(rgb: Int, w: Int = 32, h: Int = 32,
        splitAt: Option[Int] = None): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, splitAt match {
          case Some(sx) => if (x < sx) 0x000000 else 0xffffff
          case None => rgb
        })
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def item(id: Long, bytes: Array[Byte]) =
      MediaItem(id, "image", bytes, 32, 32, 0, 1)
    val items = Seq(
      item(1, png(0x000000)),             // black
      item(2, png(0xffffff)),             // white
      item(3, png(0, splitAt = Some(16))), // left black / right white
      item(4, "not an image at all".getBytes("UTF-8"))
    ).toDS()
    val fs = decodeAndFeaturize(items, dim = 16,
      provider = ImageIoCodecProvider)
      .collect().map(f => f.media_id -> f.features).toMap
    assert(fs(1L).forall(_ < 0.05f), "black image must pool to ~0")
    assert(fs(2L).forall(_ > 0.95f), "white image must pool to ~1")
    // 4x4 grid over a left-black/right-white image: each row's first
    // two cells dark, last two bright
    val grid = fs(3L).grouped(4).toSeq
    assert(grid.forall(r => r(0) < 0.1f && r(3) > 0.9f),
      s"split image grid off: ${fs(3L).toSeq}")
    // undecodable payload falls back to the stub's digest features
    val stub = DigestStubCodecProvider.open()
    assert(fs(4L).toSeq == stub.featurize(
      item(4, "not an image at all".getBytes("UTF-8")), 16).toSeq)
    // frame 0 of a decodable still = row-major luminance plane
    val codec = ImageIoCodecProvider.open()
    val plane = codec.decodeFrame(item(2, png(0xffffff)), 0)
    assert(plane.length == 32 * 32 && plane.forall(b => (b & 0xff) == 255))
  }

  test("sampleFrames fans out only videos, capped and strided") {
    import spark.implicits._
    val frames = sampleFrames(media().as[MediaItem], maxFrames = 4).collect()
    assert(frames.nonEmpty)
    val byMedia = frames.groupBy(_.media_id)
    assert(byMedia.values.forall(_.length <= 4))
    val videoIds = media().filter(col("kind") === "video")
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(byMedia.keySet.subsetOf(videoIds))
  }
}
