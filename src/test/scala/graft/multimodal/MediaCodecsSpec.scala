package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.SparkSpec
import graft.multimodal.Multimodal._

/** Real-decode coverage for the audio (javax.sound WAV) and video
  * (RIFF/AVI + MJPEG) codecs, plus the per-modality dispatch
  * provider — all payloads synthesized in-memory (sine-wave PCM
  * wrapped as WAV; JPEG frames wrapped in a hand-built RIFF/AVI),
  * so the tests decode REAL containers without any media fixtures. */
object MediaCodecsSpec {

  /** 16-bit PCM mono WAV bytes at 16 kHz from a sample generator. */
  def wav(samples: Array[Short], channels: Int = 1): Array[Byte] = {
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      raw(i * 2) = (samples(i) & 0xff).toByte
      raw(i * 2 + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(16000f, 16, channels, true, false)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(raw), fmt,
        samples.length / channels),
      AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  def jpeg(rgb: Int, w: Int = 32, h: Int = 32): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(id.getBytes("US-ASCII"))
    val n = data.length
    bos.write(Array[Byte]((n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
      ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte))
    bos.write(data)
    if ((n & 1) == 1) bos.write(0) // even padding
    bos.toByteArray
  }

  private def list(listType: String, parts: Array[Byte]*): Array[Byte] =
    chunk("LIST", listType.getBytes("US-ASCII") ++ parts.flatten)

  /** Minimal MJPEG AVI: hdrl LIST (skipped by the demuxer), then a
    * movi LIST whose SECOND frame is nested in a "rec " group — the
    * grouping real muxers emit for interleaved streams. */
  def avi(frames: Seq[Array[Byte]]): Array[Byte] = {
    val hdrl = list("hdrl", chunk("avih", new Array[Byte](56)))
    val movi = list("movi",
      (frames.take(1).map(chunk("00dc", _)) ++
        (if (frames.size > 1)
          Seq(list("rec ", frames.drop(1).map(chunk("00dc", _)): _*))
        else Nil)): _*)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val bos = new ByteArrayOutputStream()
    bos.write("RIFF".getBytes("US-ASCII"))
    val n = body.length
    bos.write(Array[Byte]((n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
      ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte))
    bos.write(body)
    bos.toByteArray
  }
}

class MediaCodecsSpec extends SparkSpec {
  import MediaCodecsSpec._

  private def item(id: Long, kind: String, bytes: Array[Byte],
      nFrames: Int = 1) = MediaItem(id, kind, bytes, 32, 32, 16000, nFrames)

  test("WAV codec: windowed RMS features track signal energy") {
    val loud = Array.tabulate(8000)(i =>
      (math.sin(2 * math.Pi * 440 * i / 16000.0) * 16384).toShort)
    val silent = new Array[Short](8000)
    val codec = WavCodecProvider.open()
    val f = codec.featurize(item(1, "audio", wav(loud ++ silent)), dim = 8)
    assert(f.length == 8)
    // first half: sine at half scale -> RMS ~ 0.5/sqrt(2) ~ 0.354
    assert(f.take(4).forall(v => v > 0.3f && v < 0.4f),
      s"loud windows off: ${f.toSeq}")
    assert(f.drop(4).forall(_ < 0.01f), s"silent windows off: ${f.toSeq}")
    // deterministic
    val f2 = codec.featurize(item(1, "audio", wav(loud ++ silent)), dim = 8)
    assert(f.toSeq == f2.toSeq)
    codec.close()
  }

  test("WAV codec: stereo downmix, frame hops, stub fallback") {
    val codec = WavCodecProvider.open()
    // stereo: L=8192, R=16384 everywhere -> mono 12288, RMS = 0.375
    val stereo = Array.tabulate(4096)(i =>
      if (i % 2 == 0) 8192.toShort else 16384.toShort)
    val fs = codec.featurize(item(2, "audio", wav(stereo, channels = 2)), 4)
    assert(fs.forall(v => math.abs(v - 0.375f) < 0.01f), fs.toSeq.toString)
    // decodeFrame k = mono samples [1024k, 1024(k+1)) as 16-bit LE
    val ramp = Array.tabulate(3000)(i => i.toShort)
    val it = item(3, "audio", wav(ramp))
    val frame1 = codec.decodeFrame(it, 1)
    assert(frame1.length == 2048)
    val s0 = ((frame1(0) & 0xff) | (frame1(1) << 8)).toShort
    assert(s0 == 1024, s"frame 1 must start at sample 1024, got $s0")
    val frame2 = codec.decodeFrame(it, 2)
    assert(frame2.length == (3000 - 2048) * 2, "tail frame is short")
    assert(codec.decodeFrame(it, 9).isEmpty, "past-the-end frame is empty")
    // undecodable payload -> digest stub features
    val junk = item(4, "audio", "not audio".getBytes("UTF-8"))
    val stub = DigestStubCodecProvider.open()
    assert(codec.featurize(junk, 8).toSeq == stub.featurize(junk, 8).toSeq)
    codec.close()
  }

  test("syntheticWavMedia: real decode, closed-form RMS, gain doubles features exactly") {
    import spark.implicits._
    val fixture = Map(4L -> "some deterministic transcript text",
      7L -> "another document entirely")
    val docs = fixture.toSeq.toDF("doc_id", "text")
    val rows = Multimodal.syntheticWavMedia(docs).as[MediaItem]
      .collect().map(r => r.media_id -> r).toMap
    val codec = WavCodecProvider.open()
    // the payload is a VALID WAV: the real decode path runs (a stub
    // fallback would produce digest features, not the closed form)
    for ((id, it) <- rows) {
      val f = codec.featurize(it, dim = 8)
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(fixture(id).getBytes("UTF-8")).map("%02x".format(_)).mkString
      val expected = (0 until 8).map { w =>
        val a = Integer.parseInt(h.substring(w, w + 1), 16) + 1
        math.sqrt(a.toDouble * a * 2796288.0 / 549755813888.0).toFloat
      }
      assert(f.toSeq == expected, s"doc $id: ${f.toSeq} vs $expected")
    }
    // a 2x-gain re-encode scales every feature EXACTLY x2 (exact
    // dyadic sums + correctly-rounded sqrt), so cosine is exactly 1
    val loud = Multimodal.syntheticWavMedia(docs, gain = 2).as[MediaItem]
      .collect().map(r => r.media_id -> r).toMap
    for ((id, it) <- loud) {
      val f1 = codec.featurize(rows(id), dim = 8)
      val f2 = codec.featurize(it, dim = 8)
      assert(f2.toSeq == f1.map(_ * 2).toSeq, s"doc $id gain drifted")
    }
    codec.close()
  }

  test("syntheticAviMedia: real demux + BMP decode, closed-form pools, gain doubles exactly") {
    import spark.implicits._
    val fixture = Map(2L -> "video transcript body here",
      8L -> "a different clip entirely")
    val docs = fixture.toSeq.toDF("doc_id", "text")
    val rows = Multimodal.syntheticAviMedia(docs).as[MediaItem]
      .collect().map(r => r.media_id -> r).toMap
    val codec = AviMjpegCodecProvider.open()
    for ((id, it) <- rows) {
      val f = codec.featurize(it, dim = 16)
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(fixture(id).getBytes("UTF-8")).map("%02x".format(_)).mkString
      val expected = (0 until 16).map { i =>
        (Integer.parseInt(h.substring(i, i + 1), 16) * 8) / 255.0f
      }
      assert(f.toSeq == expected, s"doc $id: ${f.toSeq} vs $expected")
    }
    // doubled-brightness re-encode: features scale exactly x2
    val bright = Multimodal.syntheticAviMedia(docs, gain = 2).as[MediaItem]
      .collect().map(r => r.media_id -> r).toMap
    for ((id, it) <- bright) {
      val f1 = codec.featurize(rows(id), dim = 16)
      val f2 = codec.featurize(it, dim = 16)
      assert(f2.toSeq == f1.map(_ * 2).toSeq, s"doc $id gain drifted")
    }
    codec.close()
  }

  test("AVI/MJPEG codec: demux + frame decode through a real container") {
    val payload = avi(Seq(jpeg(0x000000), jpeg(0xffffff)))
    val codec = AviMjpegCodecProvider.open()
    val it = item(5, "video", payload, nFrames = 2)
    // frame 0 (top-level 00dc chunk) is black, frame 1 (inside the
    // nested rec list) is white — JPEG is lossy, use loose bounds
    val black = codec.decodeFrame(it, 0)
    assert(black.length == 32 * 32 && black.forall(b => (b & 0xff) < 20))
    val white = codec.decodeFrame(it, 1)
    assert(white.length == 32 * 32 && white.forall(b => (b & 0xff) > 235))
    // featurize averages both frames -> mid-gray
    val f = codec.featurize(it, dim = 16)
    assert(f.forall(v => v > 0.4f && v < 0.6f), f.toSeq.toString)
    // a non-AVI payload falls back to the stub
    val junk = item(6, "video", "not a riff".getBytes("UTF-8"))
    val stub = DigestStubCodecProvider.open()
    assert(codec.featurize(junk, 8).toSeq == stub.featurize(junk, 8).toSeq)
    codec.close()
  }

  test("modality dispatch provider routes each kind to its real codec") {
    import spark.implicits._
    val loud = Array.tabulate(4096)(i =>
      (math.sin(2 * math.Pi * 220 * i / 16000.0) * 23170).toShort)
    val items = Seq(
      item(1, "image", MultimodalSpec2.png(0xffffff)),
      item(2, "audio", wav(loud)),
      item(3, "video", avi(Seq(jpeg(0xffffff)))),
      item(4, "text", "plain text".getBytes("UTF-8"))).toDS()
    val fs = decodeAndFeaturize(items, dim = 4,
      provider = ModalityCodecProvider)
      .collect().map(f => f.media_id -> f.features).toMap
    assert(fs(1L).forall(_ > 0.95f), s"white png: ${fs(1L).toSeq}")
    // amp 23170/32768 ~ 0.707 sine -> RMS ~ 0.5
    assert(fs(2L).forall(v => v > 0.45f && v < 0.55f),
      s"sine wav: ${fs(2L).toSeq}")
    assert(fs(3L).forall(_ > 0.9f), s"white avi: ${fs(3L).toSeq}")
    val stub = DigestStubCodecProvider.open()
    assert(fs(4L).toSeq == stub.featurize(
      item(4, "text", "plain text".getBytes("UTF-8")), 4).toSeq)
    // sampleFrames through the dispatcher decodes real AVI frames
    val frames = sampleFrames(items, maxFrames = 2,
      provider = ModalityCodecProvider).collect()
    assert(frames.length == 1 && frames.head.media_id == 3L &&
      frames.head.bytes.length == 32 * 32 &&
      frames.head.bytes.forall(b => (b & 0xff) > 235))
  }
}

/** PNG helper shared with the modality-dispatch test (kept out of the
  * Spark closure path). */
object MultimodalSpec2 {
  def png(rgb: Int, w: Int = 32, h: Int = 32): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
