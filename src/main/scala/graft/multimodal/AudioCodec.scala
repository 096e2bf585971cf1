package graft.multimodal

import java.io.ByteArrayInputStream
import javax.sound.sampled.{AudioFormat, AudioSystem}

/** Real audio codec on the JDK's `javax.sound.sampled` (WAV/AIFF/AU with
  * the stock providers — no external dependency, same zero-dependency
  * trick as [[ImageCodec]]'s `javax.imageio`): decode bytes → PCM16
  * samples → windowed mean-|amplitude| embedding.
  *
  * Feature contract (kept arithmetic-exact on purpose, mirroring
  * [[ImageCodec.pool]]): sample `i` of `n` lands in window
  * `i·dim/n` (integer division), each window accumulates the INTEGER
  * `|sample|` (PCM16, −32768..32767) into a long sum — exact and
  * addition-order-independent — and the feature is
  * `(sum / (count·32768.0)) · 2 − 1 ∈ [−1, 1)`, evaluated in exactly that
  * order. Any engine that can regenerate the sample values reproduces the
  * embedding bit-for-bit (the q73 oracle does, proving the decode without
  * ever parsing a WAV).
  */
object AudioCodec {

  /** Channel-0 PCM16 samples of a decoded clip. */
  final case class Clip(samples: Array[Int], sampleRate: Float, channels: Int)

  private val target = (src: AudioFormat) => new AudioFormat(
    AudioFormat.Encoding.PCM_SIGNED, src.getSampleRate, 16,
    src.getChannels, src.getChannels * 2, src.getSampleRate, false)

  /** Decode audio bytes; None when no installed reader recognizes the
    * container (or the payload is corrupt). Non-PCM16 encodings (8-bit,
    * float, U-law…) are converted through the JDK's own converters; only
    * channel 0 is kept. Catches `NonFatal` for the same reason as
    * [[ImageCodec.decode]]: one corrupt file over an untrusted corpus must
    * degrade to the fall-back-to-stub path, never kill the task.
    */
  def decode(bytes: Array[Byte]): Option[Clip] =
    try {
      val raw = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val fmt = raw.getFormat
      val pcm =
        if (fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
            fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian) raw
        else AudioSystem.getAudioInputStream(target(fmt), raw)
      val ch = pcm.getFormat.getChannels
      val data = pcm.readAllBytes()
      val n = data.length / (2 * ch)
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        val off = i * 2 * ch // channel 0 is first in each frame
        out(i) = ((data(off) & 0xFF) | (data(off + 1) << 8)).toShort.toInt
        i += 1
      }
      Some(Clip(out, pcm.getFormat.getSampleRate, ch))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Windowed mean-|amplitude| embedding — see the contract above. Windows
    * that receive no samples (only when `dim > n`) emit 0f.
    */
  def features(samples: Array[Int], dim: Int): Array[Float] = {
    val n = samples.length
    val sums = new Array[Long](dim)
    val counts = new Array[Long](dim)
    var i = 0
    while (i < n) {
      val w = (i.toLong * dim / n).toInt
      val s = samples(i)
      sums(w) += (if (s < 0) -s.toLong else s.toLong)
      counts(w) += 1
      i += 1
    }
    Array.tabulate(dim) { w =>
      if (counts(w) > 0)
        (sums(w).toDouble / (counts(w) * 32768.0) * 2.0 - 1.0).toFloat
      else 0f
    }
  }

  /** A minimal mono PCM16 WAV (44-byte RIFF header + little-endian
    * samples) — every sample's value comes from `sample(i)`. WAV is simple
    * enough to assemble by hand, which makes REAL decoding testable
    * end-to-end with zero fixtures: build bytes, decode with the stock JDK
    * reader, and every sample is predictable (the q72 BMP trick, for
    * audio).
    */
  def buildWav(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    val dataSize = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(s => buf.putShort(s.toShort))
    buf.array()
  }

  /** Deterministic synthetic clip `id` — sample count and values are pure
    * integer formulas of (id, i), so an oracle can regenerate the exact
    * PCM arithmetically. Lengths deliberately don't divide the window
    * grid evenly (240–336 across a dim-8/16 grid).
    */
  def syntheticWavLength(id: Long): Int = 240 + (id % 7).toInt * 16

  def syntheticWav(id: Long): Array[Byte] =
    buildWav(8000, Array.tabulate(syntheticWavLength(id))(i =>
      ((id * 31 + i * 17) % 65536).toInt - 32768))
}
