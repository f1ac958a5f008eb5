package graft.multimodal

import java.security.MessageDigest

import graft.multimodal.Multimodal.MediaItem

/** The codec SPI: the ONE seam a deployment implements to give the
  * multimodal operators real decoders (JPEG → pixels → CNN embed,
  * PCM → fbank, container demux → frames) without touching the
  * engine. Everything Spark-side — typed Dataset boundaries, schema,
  * per-partition codec lifecycle, frame fan-out — lives in
  * [[Multimodal]] and is codec-agnostic.
  *
  * Lifecycle: a [[MediaCodecProvider]] (small, Serializable) ships in
  * the task closure; [[MediaCodecProvider.open]] runs ONCE PER
  * PARTITION on the executor (real codecs have per-process init cost:
  * model weights, JNI contexts), and [[MediaCodec.close]] runs at
  * task completion. The codec itself need not be serializable or
  * thread-safe — each task owns its instance.
  */
trait MediaCodec {

  /** Fixed-dimension feature vector for one media payload (the model
    * forward pass in a real deployment). */
  def featurize(item: MediaItem, dim: Int): Array[Float]

  /** Decoded frame `frameIdx` of a video payload (container demux +
    * frame decode in a real deployment). */
  def decodeFrame(item: MediaItem, frameIdx: Int): Array[Byte]

  /** Release native resources; called at task completion. */
  def close(): Unit = ()
}

/** Executor-side factory for [[MediaCodec]] — the object that actually
  * travels in the closure. */
trait MediaCodecProvider extends Serializable {
  def open(): MediaCodec
}

/** The default STUB codec (no media libraries ship in this
  * container): deterministic digest→pseudo-features and slice-based
  * pseudo-frames, so specs are reproducible and the operators have a
  * runnable default. A real deployment passes its own provider to the
  * [[Multimodal]] operators; nothing else changes. */
object DigestStubCodecProvider extends MediaCodecProvider {

  override def open(): MediaCodec = new MediaCodec {
    // one digest per codec instance = one per partition
    private val md = MessageDigest.getInstance("MD5")

    override def featurize(item: MediaItem, dim: Int): Array[Float] = {
      val digest = md.digest(item.bytes).map("%02x".format(_)).mkString
      Array.tabulate(dim) { i =>
        val c = digest.charAt(i % digest.length)
        ((c * 31 + i * 7) % 997) / 997.0f
      }
    }

    override def decodeFrame(item: MediaItem, frameIdx: Int): Array[Byte] = {
      val lo = math.min(frameIdx, math.max(0, item.bytes.length - 1))
      val hi = math.min(item.bytes.length, lo + 64)
      item.bytes.slice(lo, hi)
    }
  }
}
