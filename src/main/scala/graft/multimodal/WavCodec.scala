package graft.multimodal

import java.io.ByteArrayInputStream

import javax.sound.sampled.{AudioFormat, AudioSystem}

import graft.multimodal.Multimodal.MediaItem

/** A REAL (non-stub) audio codec behind the [[MediaCodec]] SPI, built
  * only on the JDK's javax.sound.sampled (WAV/AIFF/AU readers and the
  * PCM conversion chain ship in every JVM — no native audio libraries
  * needed). Together with [[ImageIoCodecProvider]] (stills) and
  * [[AviMjpegCodecProvider]] (video) it completes the real-decode
  * story for all three modalities the engine's media tables carry.
  *
  * featurize: decodes the payload to 16-bit signed PCM (any source
  * encoding javax.sound can convert — u8/a-law/mu-law/float WAVs all
  * funnel through the same conversion chain), downmixes to mono by
  * channel averaging, then emits per-window RMS energy over `dim`
  * equal time windows, normalized to 0..1 by full scale. That is the
  * deterministic, content-sensitive stand-in for a real fbank/SSL
  * embedding — a deployment swaps the windowed-RMS for its acoustic
  * model, and nothing else (lifecycle, schema, fan-out) moves.
  *
  * decodeFrame: an audio "frame" is a fixed 1024-sample mono hop —
  * frame k returns samples [k·1024, (k+1)·1024) as little-endian
  * 16-bit PCM bytes (short reads return what exists; a frame wholly
  * past the end is empty). Undecodable payloads fall back to the
  * digest stub, mirroring the image codec, so one provider can serve
  * a mixed-modality table.
  */
object WavCodecProvider extends MediaCodecProvider {

  /** Samples per decodeFrame hop (mono, after downmix). */
  val FrameSamples = 1024

  override def open(): MediaCodec = new MediaCodec {
    private val stub = DigestStubCodecProvider.open()

    /** bytes → mono 16-bit samples, or None if javax.sound can't
      * read/convert the payload. */
    private def decodeMono(bytes: Array[Byte]): Option[Array[Short]] =
      try {
        val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
        try {
          val src = in.getFormat
          val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
            src.getSampleRate, 16, src.getChannels,
            2 * src.getChannels, src.getSampleRate, false)
          val pcm = AudioSystem.getAudioInputStream(target, in)
          try {
            val raw = pcm.readAllBytes()
            val ch = target.getChannels
            val n = raw.length / (2 * ch)
            val out = new Array[Short](n)
            var i = 0
            while (i < n) {
              var acc = 0
              var c = 0
              while (c < ch) {
                val o = (i * ch + c) * 2
                acc += ((raw(o) & 0xff) | (raw(o + 1) << 8)).toShort
                c += 1
              }
              out(i) = (acc / ch).toShort
              i += 1
            }
            Some(out)
          } finally pcm.close()
        } finally in.close()
      } catch { case _: Exception => None }

    override def featurize(item: MediaItem, dim: Int): Array[Float] =
      decodeMono(item.bytes) match {
        case Some(samples) if samples.nonEmpty =>
          val out = new Array[Float](dim)
          val n = samples.length
          var w = 0
          while (w < dim) {
            val lo = (w.toLong * n / dim).toInt
            val hi = ((w + 1).toLong * n / dim).toInt
            if (hi > lo) {
              var acc = 0.0
              var i = lo
              while (i < hi) {
                val s = samples(i) / 32768.0
                acc += s * s
                i += 1
              }
              out(w) = math.sqrt(acc / (hi - lo)).toFloat
            }
            w += 1
          }
          out
        case _ => stub.featurize(item, dim)
      }

    override def decodeFrame(item: MediaItem, frameIdx: Int): Array[Byte] =
      decodeMono(item.bytes) match {
        case Some(samples) =>
          val lo = math.min(frameIdx.toLong * FrameSamples, samples.length.toLong).toInt
          val hi = math.min(lo + FrameSamples, samples.length)
          val out = new Array[Byte]((hi - lo) * 2)
          var i = lo
          while (i < hi) {
            out((i - lo) * 2) = (samples(i) & 0xff).toByte
            out((i - lo) * 2 + 1) = ((samples(i) >> 8) & 0xff).toByte
            i += 1
          }
          out
        case None => stub.decodeFrame(item, frameIdx)
      }

    override def close(): Unit = stub.close()
  }
}
