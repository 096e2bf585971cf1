package graft.multimodal

import graft.SparkSpec

/** Unit coverage for the REAL audio path: hand-assembled WAV bytes decode
  * through the stock JDK reader to exactly the samples the formula wrote,
  * and the windowed features are checked against hand-computed values —
  * fixture-free proof the codec decodes rather than fingerprints (the
  * ImageCodecSpec pattern, for audio).
  */
class AudioCodecSpec extends SparkSpec {

  test("buildWav → javax.sound decode returns exactly the formula's samples") {
    val id = 5L
    val n = AudioCodec.syntheticWavLength(id)
    val clip = AudioCodec.decode(AudioCodec.syntheticWav(id))
      .getOrElse(fail("JDK WAV reader did not decode the hand-built WAV"))
    assert(clip.samples.length === n)
    assert(clip.sampleRate === 8000.0f && clip.channels === 1)
    for (i <- 0 until n)
      assert(clip.samples(i) === ((id * 31 + i * 17) % 65536).toInt - 32768,
        s"sample $i")
  }

  test("features compute the exact windowed mean-|amplitude|") {
    // 4 samples, dim=2: window 0 ← {0,1}, window 1 ← {2,3}; hand-sum
    val s = Array(100, -200, 32767, -32768)
    val f = AudioCodec.features(s, 2)
    assert(f(0) === ((100L + 200L).toDouble / (2 * 32768.0) * 2.0 - 1.0).toFloat)
    assert(f(1) === ((32767L + 32768L).toDouble / (2 * 32768.0) * 2.0 - 1.0).toFloat)
    // silence → exactly -1; full-scale constant → close to +1
    assert(AudioCodec.features(Array.fill(8)(0), 4).toSeq === Seq.fill(4)(-1.0f))
    // dim > n: trailing windows emit 0f
    assert(AudioCodec.features(Array(0, 0), 4).count(_ == 0f) === 2)
  }

  test("stereo and 8-bit inputs decode through the JDK converters (channel 0 kept)") {
    // stereo PCM16: frames interleave (left, right); decode keeps left
    val left = Array(1000, -2000, 3000)
    val right = Array(-1, -2, -3)
    val dataSize = left.length * 4
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(8000).putInt(8000 * 4).putShort(4).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    left.indices.foreach { i =>
      buf.putShort(left(i).toShort); buf.putShort(right(i).toShort)
    }
    val stereo = AudioCodec.decode(buf.array()).getOrElse(fail("stereo WAV"))
    assert(stereo.channels === 2 && stereo.samples.toSeq === left.toSeq)

    // 8-bit unsigned PCM: the JDK converter widens to full-scale 16-bit
    val vals8 = Array(0, 128, 255)
    val buf8 = java.nio.ByteBuffer.allocate(44 + vals8.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf8.put("RIFF".getBytes("US-ASCII")).putInt(36 + vals8.length)
      .put("WAVE".getBytes("US-ASCII"))
    buf8.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000).putShort(1).putShort(8)
    buf8.put("data".getBytes("US-ASCII")).putInt(vals8.length)
    vals8.foreach(v => buf8.put(v.toByte))
    val mono8 = AudioCodec.decode(buf8.array()).getOrElse(fail("8-bit WAV"))
    // don't pin the converter's exact scaling — assert the shape: min-scale,
    // exact midpoint silence, near-full-scale positive
    assert(mono8.samples(0) === -32768 && mono8.samples(1) === 0)
    assert(mono8.samples(2) >= 32000, s"255 widened to ${mono8.samples(2)}")
  }

  test("decode returns None on corrupt payloads instead of throwing") {
    assert(AudioCodec.decode(Array.emptyByteArray).isEmpty)
    assert(AudioCodec.decode(Array.tabulate[Byte](64)(i => (i * 37).toByte)).isEmpty)
    // a RIFF magic followed by garbage: the reader starts parsing and
    // aborts mid-stream — must degrade to None, never throw
    val riff = "RIFF".getBytes("US-ASCII") ++ Array.fill[Byte](40)(0x7F)
    assert(AudioCodec.decode(riff).isEmpty)
    val truncated = AudioCodec.syntheticWav(3L).take(30)
    assert(AudioCodec.decode(truncated).isEmpty)
  }

  test("JdkMediaCodec routes image+audio to real decoders, video to the stub") {
    val wav = AudioCodec.syntheticWav(9L)
    val viaCodec = Multimodal.JdkMediaCodec.decode("audio", wav, 8)
    val direct = AudioCodec.features(AudioCodec.decode(wav).get.samples, 8)
    assert(viaCodec.toSeq === direct.toSeq)
    assert(viaCodec.toSeq !== Multimodal.decodeStub(wav, 8).toSeq)
    val bmp = ImageCodec.syntheticBmp(9L)
    assert(Multimodal.JdkMediaCodec.decode("image", bmp, 16).toSeq
      === ImageCodec.pool(ImageCodec.decode(bmp).get, 16).toSeq)
    assert(Multimodal.JdkMediaCodec.decode("video", wav, 8).toSeq
      === Multimodal.decodeStub(wav, 8).toSeq)
    val junk = Array.tabulate[Byte](40)(i => (i * 11).toByte)
    assert(Multimodal.JdkMediaCodec.decode("audio", junk, 8).toSeq
      === Multimodal.decodeStub(junk, 8).toSeq)
  }
}
