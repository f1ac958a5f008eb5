package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import graft.multimodal.Multimodal.MediaItem

/** A REAL (non-stub) image codec behind the [[MediaCodec]] SPI, built
  * only on the JDK's javax.imageio (PNG/BMP/GIF/JPEG readers ship in
  * every JVM — no native media libraries needed). It exists to prove
  * the SPI with an actual decode: bytes → BufferedImage → pixel
  * features, through exactly the open-per-partition /
  * close-at-task-completion lifecycle the stub uses.
  *
  * featurize: decodes the payload and pools luminance over a
  * ceil(sqrt(dim))² grid — a deterministic, content-sensitive
  * fixed-dimension embedding (the stand-in for a CNN forward pass; a
  * deployment swaps the pooling for its model, nothing else moves).
  * Non-image payloads (audio/video kinds, undecodable bytes) fall
  * back to the digest stub's features so one provider can serve a
  * mixed-modality table; a production stack would register one
  * provider per modality.
  *
  * decodeFrame: still images have one frame — frame 0 re-encodes the
  * decoded image's raw luminance row-major; video demux stays with
  * the deployment codec (JDK has no container demuxer), so other
  * indices fall back to the stub slice.
  */
object ImageIoCodecProvider extends MediaCodecProvider {

  override def open(): MediaCodec = new MediaCodec {
    private val stub = DigestStubCodecProvider.open()

    private def decode(bytes: Array[Byte]): Option[BufferedImage] =
      try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }

    /** Mean luminance (0..1) pooled over a g×g grid, g=ceil(sqrt(dim)),
      * first `dim` cells in row-major order. */
    private def pool(img: BufferedImage, dim: Int): Array[Float] = {
      val g = math.ceil(math.sqrt(dim.toDouble)).toInt
      val out = new Array[Float](dim)
      val counts = new Array[Int](dim)
      val w = img.getWidth
      val h = img.getHeight
      var y = 0
      while (y < h) {
        val gy = y * g / h
        var x = 0
        while (x < w) {
          val cell = gy * g + x * g / w
          if (cell < dim) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 +
              ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
            out(cell) += lum / 255.0f
            counts(cell) += 1
          }
          x += 1
        }
        y += 1
      }
      var i = 0
      while (i < dim) {
        if (counts(i) > 0) out(i) /= counts(i)
        i += 1
      }
      out
    }

    override def featurize(item: MediaItem, dim: Int): Array[Float] =
      decode(item.bytes) match {
        case Some(img) if img.getWidth > 0 && img.getHeight > 0 =>
          pool(img, dim)
        case _ => stub.featurize(item, dim)
      }

    override def decodeFrame(item: MediaItem, frameIdx: Int): Array[Byte] =
      if (frameIdx == 0) decode(item.bytes) match {
        case Some(img) =>
          val w = img.getWidth
          val h = img.getHeight
          val out = new Array[Byte](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              out(y * w + x) = ((((rgb >> 16) & 0xff) * 299 +
                ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000).toByte
              x += 1
            }
            y += 1
          }
          out
        case None => stub.decodeFrame(item, frameIdx)
      }
      else stub.decodeFrame(item, frameIdx)

    override def close(): Unit = stub.close()
  }
}
