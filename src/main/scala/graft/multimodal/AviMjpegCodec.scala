package graft.multimodal

import graft.multimodal.Multimodal.MediaItem

/** A REAL (non-stub) video codec behind the [[MediaCodec]] SPI: a
  * minimal RIFF/AVI container demuxer (pure byte-walking, no
  * libraries) over ImageIO JPEG frame decode — Motion-JPEG, the one
  * video coding every JVM can decode because each frame IS a JPEG.
  * It exists to prove the video half of the SPI with an actual
  * container parse + frame decode; a deployment swaps in its
  * libav-backed provider for H.264 etc. and nothing Spark-side moves.
  *
  * Demux: RIFF = "RIFF" u32size "AVI " then a chunk stream; a chunk
  * is fourcc + u32le size + data (even-padded); "LIST" chunks carry a
  * type fourcc and nest. Video frames live in the "movi" LIST (often
  * grouped in nested "rec " LISTs) as "##dc"/"##db" chunks (## =
  * stream digits). The demuxer walks top-level chunks, descends movi
  * and rec lists, and collects frame payloads in stream order —
  * exactly the index-free streaming read a scan-rate pipeline wants
  * (the optional idx1 index is a seek optimization, not needed for
  * forward decode).
  *
  * featurize: samples ≤8 frames evenly, pools each through the shared
  * luminance grid ([[Luma.pool]]), averages — a deterministic
  * content-sensitive video embedding stand-in. decodeFrame(k):
  * JPEG-decodes frame k to the row-major luminance plane (the same
  * frame contract as [[ImageIoCodecProvider]] stills). Non-AVI
  * payloads and undecodable frames fall back to the digest stub,
  * keeping mixed-modality tables servable by one provider.
  */
object AviMjpegCodecProvider extends MediaCodecProvider {

  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  private def isFrameId(id: String): Boolean =
    id.length == 4 && id(0).isDigit && id(1).isDigit &&
      (id.substring(2) == "dc" || id.substring(2) == "db")

  /** Walk a chunk run in [from, until), descending movi/rec LISTs,
    * appending (offset, size) of every video frame chunk. */
  private def walk(b: Array[Byte], from: Int, until: Int,
      frames: scala.collection.mutable.ArrayBuffer[(Int, Int)]): Unit = {
    var o = from
    while (o + 8 <= until) {
      val id = fourcc(b, o)
      val size = u32le(b, o + 4)
      val dataAt = o + 8
      if (size < 0 || dataAt + size > until) return // truncated/corrupt
      val sz = size.toInt
      if (id == "LIST" && sz >= 4) {
        val listType = fourcc(b, dataAt)
        if (listType == "movi" || listType == "rec ")
          walk(b, dataAt + 4, dataAt + sz, frames)
      } else if (isFrameId(id) && sz > 0) {
        frames += ((dataAt, sz))
      }
      o = dataAt + sz + (sz & 1) // chunks are even-padded
    }
  }

  /** Frame payload (offset, size) slices in stream order, or None if
    * the bytes are not a RIFF/AVI container. */
  private[multimodal] def demux(b: Array[Byte]): Option[Seq[(Int, Int)]] = {
    if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ")
      return None
    val end = math.min(b.length.toLong, 8 + u32le(b, 4)).toInt
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    walk(b, 12, end, frames)
    Some(frames.toSeq)
  }

  override def open(): MediaCodec = new MediaCodec {
    private val stub = DigestStubCodecProvider.open()

    private def frameImage(b: Array[Byte], slice: (Int, Int)) =
      Luma.decode(java.util.Arrays.copyOfRange(b, slice._1, slice._1 + slice._2))

    override def featurize(item: MediaItem, dim: Int): Array[Float] =
      demux(item.bytes) match {
        case Some(frames) if frames.nonEmpty =>
          val take = math.min(8, frames.size)
          val picked = (0 until take).map(i => frames(i * frames.size / take))
          val pooled = picked.flatMap(s =>
            frameImage(item.bytes, s).map(Luma.pool(_, dim)))
          if (pooled.isEmpty) stub.featurize(item, dim)
          else {
            val out = new Array[Float](dim)
            pooled.foreach { p =>
              var i = 0
              while (i < dim) { out(i) += p(i); i += 1 }
            }
            var i = 0
            while (i < dim) { out(i) /= pooled.size; i += 1 }
            out
          }
        case _ => stub.featurize(item, dim)
      }

    override def decodeFrame(item: MediaItem, frameIdx: Int): Array[Byte] =
      demux(item.bytes) match {
        case Some(frames) if frameIdx >= 0 && frameIdx < frames.size =>
          frameImage(item.bytes, frames(frameIdx)) match {
            case Some(img) => Luma.plane(img)
            case None => stub.decodeFrame(item, frameIdx)
          }
        case _ => stub.decodeFrame(item, frameIdx)
      }

    override def close(): Unit = stub.close()
  }
}

/** One provider per modality, dispatched on the item's `kind` — the
  * production registry shape the codec Scaladocs describe: stills →
  * ImageIO, audio → javax.sound WAV, video → AVI/MJPEG; unknown kinds
  * → the digest stub. Sub-codecs open lazily (a partition of pure
  * audio never pays image-codec init) and every opened one closes at
  * task completion. */
object ModalityCodecProvider extends MediaCodecProvider {

  override def open(): MediaCodec = new MediaCodec {
    private val opened = scala.collection.mutable.Map.empty[String, MediaCodec]
    private def codecFor(kind: String): MediaCodec =
      opened.getOrElseUpdate(kind, kind match {
        case "image" => ImageIoCodecProvider.open()
        case "audio" => WavCodecProvider.open()
        case "video" => AviMjpegCodecProvider.open()
        case _ => DigestStubCodecProvider.open()
      })

    override def featurize(item: MediaItem, dim: Int): Array[Float] =
      codecFor(item.kind).featurize(item, dim)

    override def decodeFrame(item: MediaItem, frameIdx: Int): Array[Byte] =
      codecFor(item.kind).decodeFrame(item, frameIdx)

    override def close(): Unit = opened.values.foreach(_.close())
  }
}
