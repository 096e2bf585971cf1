package graft.multimodal

import graft.SparkSpec

class VideoCodecSpec extends SparkSpec {
  import spark.implicits._

  test("decode: synthetic stream roundtrips header, frame count, luma bytes") {
    val v = VideoCodec.decode(VideoCodec.syntheticY4m(7L)).get
    assert((v.width, v.height, v.fpsNum, v.fpsDen) === ((16, 16, 25, 1)))
    assert(v.yPlanes.length === VideoCodec.syntheticFrames(7L))
    // luma content is the closed form — chroma misalignment would shear this
    for (f <- v.yPlanes.indices; p <- Seq(0, 1, 17, 255))
      assert((v.yPlanes(f)(p) & 0xFF) === ((7 * 31 + f * 17 + p * 7) % 256),
        s"f=$f p=$p")
  }

  test("decode: chroma layouts change the frame stride, mono has none") {
    def stream(cs: String, cBytes: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(s"YUV4MPEG2 W4 H2 F30:1 C$cs\n".getBytes("US-ASCII"))
      (0 until 2).foreach { f =>
        bos.write("FRAME\n".getBytes("US-ASCII"))
        (0 until 8).foreach(p => bos.write(f * 100 + p))
        (0 until cBytes).foreach(_ => bos.write(200))
      }
      bos.toByteArray
    }
    for ((cs, cb) <- Seq(("420jpeg", 2 * 2), ("422", 2 * 4), ("444", 2 * 8),
      ("mono", 0))) {
      val v = VideoCodec.decode(stream(cs, cb)).get
      assert(v.yPlanes.length === 2, cs)
      assert(v.yPlanes(1).map(_ & 0xFF).toSeq === (0 until 8).map(_ + 100), cs)
    }
  }

  test("decode: garbage, truncation and foreign markers return None") {
    val good = VideoCodec.syntheticY4m(1L)
    assert(VideoCodec.decode("not a video".getBytes).isEmpty)
    assert(VideoCodec.decode(good.dropRight(1)).isEmpty) // truncated frame
    assert(VideoCodec.decode(good.take(40)).isEmpty) // header only / no frame
    // corrupt the FIRST FRAME marker itself (not the header's F param)
    val marker = "\nFRAME".getBytes("US-ASCII")
    val at = good.indices.find(i => i + marker.length <= good.length &&
      marker.indices.forall(j => good(i + j) == marker(j))).get
    val badMarker = good.clone(); badMarker(at + 1) = 'G'
    assert(VideoCodec.decode(badMarker).isEmpty)
  }

  test("features: pooled luma by hand on a tiny stream") {
    // W4 H2 mono, 1 frame, luma 10,20,30,40,50,60,70,80; dim 2 -> cells of 4
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("YUV4MPEG2 W4 H2 Cmono\nFRAME\n".getBytes("US-ASCII"))
    Seq(10, 20, 30, 40, 50, 60, 70, 80).foreach(bos.write)
    val v = VideoCodec.decode(bos.toByteArray).get
    val f = VideoCodec.features(v, 2)
    assert(math.abs(f(0) - ((25.0 / 255.0) * 2 - 1)) < 1e-6)
    assert(math.abs(f(1) - ((65.0 / 255.0) * 2 - 1)) < 1e-6)
  }

  test("sampleFramesDecoded: real frames with true offsets; stub fallback flagged") {
    val media = spark.createDataset(Seq(
      Multimodal.MediaRecord(1L, "video", "mem://a.y4m",
        VideoCodec.syntheticY4m(1L), 16, 16, 160L),
      Multimodal.MediaRecord(2L, "video", "mem://b.mp4",
        Array.fill[Byte](64)(3), 0, 0, 2500L)))
    val rows = Multimodal.sampleFramesDecoded(media, every = 2, dim = 4)
      .select("media_id", "frame_idx", "offset_ms", "decoded")
      .as[(Long, Int, Long, Boolean)].collect().toSet
    // id 1: 4 frames at 25 fps, every 2nd -> frames 0, 2 at 0 ms, 80 ms
    assert(rows.filter(_._1 == 1L) === Set((1L, 0, 0L, true), (1L, 2, 80L, true)))
    // id 2: unparseable -> duration-derived stub rows, flagged undecoded
    assert(rows.filter(_._1 == 2L) === Set((2L, 0, 0L, false)))
  }
}
