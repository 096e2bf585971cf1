package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real image codec on the JDK's `javax.imageio` (PNG, BMP, GIF, JPEG —
  * the standard plugins, no external dependency, headless-safe): decode
  * bytes → pixel grid → pooled float embedding, plus nearest-neighbor
  * resize and PNG re-encode for the [[Multimodal.resizeDecoded]] path.
  *
  * Pooling contract (kept arithmetic-exact on purpose): the image is cut
  * into a `g×g` grid (`g = ceil(sqrt(dim))`, pixel `(x,y)` → cell
  * `(y·g/h)·g + (x·g/w)` in integer division), each cell accumulates the
  * INTEGER luminance `299·r + 587·g + 114·b` into a long sum — exact and
  * addition-order-independent, unlike a float sum — and the feature is
  * `(sum / (count·1000.0)) / 255 · 2 − 1 ∈ [−1, 1]`, evaluated in exactly
  * that order. Any engine that can regenerate the pixel values can
  * therefore reproduce the embedding bit-for-bit (the q72 oracle does,
  * proving the decode correct without the oracle ever parsing an image).
  */
object ImageCodec {

  /** Decode image bytes with ImageIO; None when no installed reader
    * recognizes the format (or the payload is corrupt). Catches
    * `NonFatal`, not just IOException: on malformed/truncated payloads the
    * JDK plugins throw RuntimeExceptions too (ArrayIndexOutOfBounds,
    * IllegalArgument, NegativeArraySize), and over an untrusted corpus one
    * corrupt file must degrade to the documented fall-back-to-stub path,
    * never repeatedly kill the task and fail the job.
    */
  def decode(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Pooled grid embedding of a decoded image — see the contract above.
    * Cells that receive no pixels (only possible when `g` exceeds a side)
    * emit 0f; when `dim < g²` the trailing cells are dropped.
    */
  def pool(img: BufferedImage, dim: Int): Array[Float] = {
    val g = math.ceil(math.sqrt(dim.toDouble)).toInt
    val w = img.getWidth
    val h = img.getHeight
    val argb = img.getRGB(0, 0, w, h, null, 0, w) // one bulk grab, row-major
    val sums = new Array[Long](g * g)
    val counts = new Array[Long](g * g)
    var y = 0
    while (y < h) {
      val cy = y * g / h
      var x = 0
      while (x < w) {
        val p = argb(y * w + x)
        val lum = 299 * ((p >> 16) & 0xFF) + 587 * ((p >> 8) & 0xFF) + 114 * (p & 0xFF)
        val c = cy * g + x * g / w
        sums(c) += lum
        counts(c) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(dim) { i =>
      if (i < g * g && counts(i) > 0)
        (sums(i).toDouble / (counts(i) * 1000.0) / 255.0 * 2.0 - 1.0).toFloat
      else 0f
    }
  }

  /** Deterministic nearest-neighbor rescale (no Graphics2D rendering
    * pipeline — pure index math, identical on every JVM).
    */
  def resize(img: BufferedImage, newW: Int, newH: Int): BufferedImage = {
    val w = img.getWidth
    val h = img.getHeight
    val src = img.getRGB(0, 0, w, h, null, 0, w)
    val dst = new Array[Int](newW * newH)
    var y = 0
    while (y < newH) {
      val sy = y * h / newH
      var x = 0
      while (x < newW) {
        dst(y * newW + x) = src(sy * w + x * w / newW)
        x += 1
      }
      y += 1
    }
    val out = new BufferedImage(newW, newH, BufferedImage.TYPE_INT_RGB)
    out.setRGB(0, 0, newW, newH, dst, 0, newW)
    out
  }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** A minimal 24-bit uncompressed BMP (54-byte header + bottom-up padded
    * rows) — every pixel's color comes from `px(x, y) = (r, g, b)`.
    * BMP is the one mainstream format simple enough to assemble by hand,
    * which makes REAL decoding testable end-to-end with zero fixtures:
    * build bytes, decode with ImageIO, and every pixel is predictable.
    */
  def buildBmp(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(w > 0 && h > 0, s"buildBmp: degenerate dimensions ${w}x$h")
    val rowSize = (w * 3 + 3) / 4 * 4
    val dataSize = rowSize * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1 // bottom-up row order
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val (r, g, b) = px(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var p = w * 3
      while (p < rowSize) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Deterministic synthetic image `id` — dimensions and colors are pure
    * integer formulas of (id, x, y), so an oracle can regenerate the exact
    * pixel grid arithmetically. Sizes deliberately don't divide the pool
    * grid evenly (13–17 × 7–9) to exercise the integer cell mapping.
    */
  def syntheticBmpWidth(id: Long): Int = 13 + (id % 5).toInt
  def syntheticBmpHeight(id: Long): Int = 7 + (id % 3).toInt

  def syntheticBmp(id: Long): Array[Byte] =
    buildBmp(syntheticBmpWidth(id), syntheticBmpHeight(id), (x, y) => (
      ((id * 31 + x * 7 + y * 13) % 256).toInt,
      ((id * 17 + x * 11 + y * 5) % 256).toInt,
      ((id * 23 + x * 3 + y * 19) % 256).toInt))
}
