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

    override def featurize(item: MediaItem, dim: Int): Array[Float] =
      Luma.decode(item.bytes) match {
        case Some(img) if img.getWidth > 0 && img.getHeight > 0 =>
          Luma.pool(img, dim)
        case _ => stub.featurize(item, dim)
      }

    override def decodeFrame(item: MediaItem, frameIdx: Int): Array[Byte] =
      if (frameIdx == 0) Luma.decode(item.bytes) match {
        case Some(img) => Luma.plane(img)
        case None => stub.decodeFrame(item, frameIdx)
      }
      else stub.decodeFrame(item, frameIdx)

    override def close(): Unit = stub.close()
  }
}

/** Shared luminance helpers for the image-backed codecs
  * ([[ImageIoCodecProvider]] stills, [[AviMjpegCodecProvider]]
  * frames): ITU-R 601 integer luma, grid pooling, plane export. */
private[multimodal] object Luma {

  def decode(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  private def lum(rgb: Int): Int =
    (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
      (rgb & 0xff) * 114) / 1000

  /** Mean luminance (0..1) pooled over a g×g grid, g=ceil(sqrt(dim)),
    * first `dim` cells in row-major order. */
  def pool(img: BufferedImage, dim: Int): Array[Float] = {
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
          out(cell) += lum(img.getRGB(x, y)) / 255.0f
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

  /** Row-major luminance plane (one byte per pixel). */
  def plane(img: BufferedImage): Array[Byte] = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out(y * w + x) = lum(img.getRGB(x, y)).toByte
        x += 1
      }
      y += 1
    }
    out
  }
}
