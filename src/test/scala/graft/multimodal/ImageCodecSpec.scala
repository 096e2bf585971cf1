package graft.multimodal

import graft.SparkSpec

/** Unit coverage for the REAL image path: hand-assembled BMP bytes decode
  * through the stock JDK reader to exactly the pixels the formula wrote, and
  * pooling / resizing are checked against hand-computed values — fixture-free
  * proof the codec decodes rather than fingerprints.
  */
class ImageCodecSpec extends SparkSpec {

  test("buildBmp → ImageIO decode returns exactly the formula's pixels") {
    val id = 5L
    val w = ImageCodec.syntheticBmpWidth(id)
    val h = ImageCodec.syntheticBmpHeight(id)
    val img = ImageCodec.decode(ImageCodec.syntheticBmp(id))
      .getOrElse(fail("JDK BMP reader did not decode the hand-built BMP"))
    assert(img.getWidth === w && img.getHeight === h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = img.getRGB(x, y)
      val (r, g, b) = ((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)
      assert(r === ((id * 31 + x * 7 + y * 13) % 256).toInt, s"r at ($x,$y)")
      assert(g === ((id * 17 + x * 11 + y * 5) % 256).toInt, s"g at ($x,$y)")
      assert(b === ((id * 23 + x * 3 + y * 19) % 256).toInt, s"b at ($x,$y)")
    }
  }

  test("pool computes the exact grid features") {
    // 2x2 checker, dim=4 → g=2: every pixel is its own cell, features are
    // closed-form: white → 1.0, black → -1.0 exactly
    val checker = ImageCodec.buildBmp(2, 2,
      (x, y) => if ((x + y) % 2 == 0) (255, 255, 255) else (0, 0, 0))
    val img = ImageCodec.decode(checker).get
    assert(ImageCodec.pool(img, 4).toSeq === Seq(1.0f, -1.0f, -1.0f, 1.0f))

    // a single flat non-trivial color: every cell gets the same exact value
    val flat = ImageCodec.decode(ImageCodec.buildBmp(3, 2, (_, _) => (10, 20, 30))).get
    val lum = 299 * 10 + 587 * 20 + 114 * 30
    val expected = (lum.toDouble / 1000.0 / 255.0 * 2.0 - 1.0).toFloat
    assert(ImageCodec.pool(flat, 4).toSeq === Seq.fill(4)(expected))

    // non-dividing dims (3x2, g=2): cell 0 ← pixels x∈{0,1},y=0; hand-sum it
    val grad = ImageCodec.decode(ImageCodec.buildBmp(3, 2, (x, y) => (x * 50, y * 80, 0))).get
    val cell0 = (299 * 0 + 587 * 0) + (299 * 50 + 587 * 0) // (0,0) + (1,0)
    val exp0 = (cell0.toDouble / (2 * 1000.0) / 255.0 * 2.0 - 1.0).toFloat
    assert(ImageCodec.pool(grad, 4)(0) === exp0)
  }

  test("resize picks exact nearest-neighbor pixels and encodePng round-trips") {
    val img = ImageCodec.decode(
      ImageCodec.buildBmp(4, 4, (x, y) => (x * 60, y * 60, (x + y) * 30))).get
    val small = ImageCodec.resize(img, 2, 2)
    for (y <- 0 until 2; x <- 0 until 2) // dst(x,y) = src(2x, 2y)
      assert(small.getRGB(x, y) === img.getRGB(x * 2, y * 2), s"pixel ($x,$y)")
    val back = ImageCodec.decode(ImageCodec.encodePng(small))
      .getOrElse(fail("PNG re-encode did not decode"))
    for (y <- 0 until 2; x <- 0 until 2)
      assert(back.getRGB(x, y) === small.getRGB(x, y)) // PNG is lossless
  }

  test("decode returns None on corrupt payloads instead of throwing") {
    assert(ImageCodec.decode(Array.emptyByteArray).isEmpty)
    assert(ImageCodec.decode(Array.tabulate[Byte](64)(i => (i * 37).toByte)).isEmpty)
    // a recognized magic number followed by garbage: the plugin starts
    // parsing and aborts mid-stream — must degrade to None, never throw
    val pngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    assert(ImageCodec.decode(pngMagic ++ Array.fill[Byte](32)(0x7F)).isEmpty)
    val truncated = ImageCodec.syntheticBmp(3L).take(20)
    assert(ImageCodec.decode(truncated).isEmpty)
  }

  test("resizeDecoded downsizes payloads and corrects metadata (Spark)") {
    import spark.implicits._
    val media = spark.createDataset(Seq(
      Multimodal.MediaRecord(1L, "image", "mem://a.bmp",
        ImageCodec.buildBmp(16, 8, (x, y) => (x * 10, y * 20, 0)), 0, 0, 0L),
      Multimodal.MediaRecord(2L, "image", "mem://b.bmp",
        ImageCodec.buildBmp(4, 4, (x, y) => (x, y, 0)), 0, 0, 0L), // under the cap
      Multimodal.MediaRecord(3L, "audio", "mem://c.wav",
        Array[Byte](1, 2, 3), 640, 480, 900L)))
    val out = Multimodal.resizeDecoded(media, maxW = 8, maxH = 8)
      .collect().map(m => m.media_id -> m).toMap
    // 16x8 scaled by min(8/16, 8/8) = 0.5 → 8x4, payload transcoded to PNG
    assert(out(1L).width === 8 && out(1L).height === 4)
    val resized = ImageCodec.decode(out(1L).content).get
    assert(resized.getWidth === 8 && resized.getHeight === 4)
    val expect = ImageCodec.resize(
      ImageCodec.decode(ImageCodec.buildBmp(16, 8, (x, y) => (x * 10, y * 20, 0))).get, 8, 4)
    for (y <- 0 until 4; x <- 0 until 8)
      assert(resized.getRGB(x, y) === expect.getRGB(x, y))
    // within bounds: payload untouched, metadata corrected to true dims
    assert(out(2L).width === 4 && out(2L).height === 4)
    assert(out(2L).content.toSeq === ImageCodec.buildBmp(4, 4, (x, y) => (x, y, 0)).toSeq)
    // non-image rows pass through byte-identical
    assert(out(3L).content.toSeq === Seq[Byte](1, 2, 3) && out(3L).width === 640)
  }

  test("ImageIoCodec decodes images for real and stub-falls-back otherwise") {
    val bmp = ImageCodec.syntheticBmp(9L)
    val viaCodec = Multimodal.ImageIoCodec.decode("image", bmp, 16)
    val direct = ImageCodec.pool(ImageCodec.decode(bmp).get, 16)
    assert(viaCodec.toSeq === direct.toSeq)
    assert(viaCodec.toSeq !== Multimodal.decodeStub(bmp, 16).toSeq)
    val junk = Array.tabulate[Byte](40)(i => (i * 11).toByte)
    assert(Multimodal.ImageIoCodec.decode("image", junk, 16).toSeq
      === Multimodal.decodeStub(junk, 16).toSeq)
    assert(Multimodal.ImageIoCodec.decode("audio", bmp, 16).toSeq
      === Multimodal.decodeStub(bmp, 16).toSeq)
  }
}
