package graft.multimodal

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized roundtrip for [[VideoCodec]]: random geometry / frame-rate /
  * chroma-layout streams built byte-by-byte with random plane contents —
  * the parser must recover every luma byte exactly (a frame-stride bug
  * shears them), and mutated streams must degrade to None, never throw.
  */
class VideoCodecPropertySpec extends SparkSpec {

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  private case class Geom(w: Int, h: Int, fn: Int, fd: Int, cs: String,
                          frames: Seq[Array[Byte]])

  private def chromaBytes(cs: String, w: Int, h: Int): Int =
    if (cs.startsWith("420")) (w / 2) * (h / 2)
    else if (cs == "422") (w / 2) * h
    else if (cs == "444") w * h
    else 0

  private val geomGen: Gen[Geom] = for {
    w <- Gen.oneOf(2, 4, 6, 8)
    h <- Gen.oneOf(2, 4, 6)
    fn <- Gen.choose(1, 60)
    fd <- Gen.choose(1, 3)
    cs <- Gen.oneOf("420jpeg", "420mpeg2", "422", "444", "mono")
    n <- Gen.choose(1, 5)
    frames <- Gen.listOfN(n,
      Gen.listOfN(w * h, Gen.choose(0, 255)).map(_.map(_.toByte).toArray))
  } yield Geom(w, h, fn, fd, cs, frames)

  private def build(g: Geom, seed: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(
      s"YUV4MPEG2 W${g.w} H${g.h} F${g.fn}:${g.fd} C${g.cs}\n".getBytes("US-ASCII"))
    val cb = chromaBytes(g.cs, g.w, g.h)
    g.frames.zipWithIndex.foreach { case (y, f) =>
      bos.write("FRAME\n".getBytes("US-ASCII"))
      bos.write(y)
      (0 until 2 * cb).foreach(q => bos.write(((seed + f * 7 + q) % 256).toInt))
    }
    bos.toByteArray
  }

  test("random streams roundtrip geometry and every luma byte") {
    (1L to 12L).foreach { seed =>
      val g = sample(geomGen, seed)
      val v = VideoCodec.decode(build(g, seed)).get
      assert((v.width, v.height, v.fpsNum, v.fpsDen) ===
        ((g.w, g.h, g.fn, g.fd)), s"seed=$seed $g")
      assert(v.yPlanes.length === g.frames.length, s"seed=$seed")
      v.yPlanes.zip(g.frames).zipWithIndex.foreach { case ((got, exp), f) =>
        assert(got.toSeq === exp.toSeq, s"seed=$seed frame=$f cs=${g.cs}")
      }
    }
  }

  test("mutated streams degrade to None or a valid prefix, never throw") {
    (1L to 12L).foreach { seed =>
      val g = sample(geomGen, seed)
      val bytes = build(g, seed)
      // truncate at every byte in the tail frame region and flip one byte
      val cuts = Seq(bytes.length - 1, bytes.length / 2, 8, 1)
      cuts.foreach { c =>
        val r = VideoCodec.decode(bytes.take(c)) // must not throw
        r.foreach(v => assert(v.yPlanes.length <= g.frames.length))
      }
      val flipped = bytes.clone()
      flipped(sample(Gen.choose(0, bytes.length - 1), seed * 31)) =
        (seed % 256).toByte
      VideoCodec.decode(flipped) // any Option is fine; crashing is not
    }
  }
}
