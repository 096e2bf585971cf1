package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages. Images decode for REAL via [[ImageIoCodec]] (JDK `javax.imageio`:
  * PNG/BMP/GIF/JPEG → pixel grid → pooled embedding, see [[ImageCodec]]);
  * audio decodes for REAL via [[AudioCodec]] (JDK `javax.sound.sampled`:
  * WAV/AIFF/AU → PCM16 → windowed amplitude embedding) through
  * [[JdkMediaCodec]]; video decodes for REAL for uncompressed YUV4MPEG2
  * payloads via [[VideoCodec]] (pure-JVM `.y4m` parser → pooled luma
  * embedding). COMPRESSED video containers (mp4/webm) still go through
  * [[StubCodec]]'s deterministic byte fingerprint — no JDK decoder exists
  * for those and this container ships no video library; the [[Codec]] seam
  * is exactly where a javacv/JNI decoder would plug in without touching
  * any plumbing.
  *
  * Scale notes: payload bytes never shuffle — every stage below is a narrow
  * `mapPartitions` over the scan, features are extracted next to the data,
  * and only compact feature vectors / metadata flow into joins or ANN. Use
  * `spark.read.format("binaryFile")` or parquet-with-binary-column scans;
  * size partitions by bytes (`maxPartitionBytes`), not rows, because rows are
  * megabytes each.
  */
object Multimodal {

  /** A media decoder: `init()` runs once per partition (allocate native
    * readers / disable temp-file caches there, never per row), `decode`
    * turns one payload into a fixed-width feature vector.
    */
  sealed trait Codec extends Serializable {
    def init(): Unit = ()
    def decode(modality: String, content: Array[Byte], dim: Int): Array[Float]
  }

  /** Deterministic byte-fingerprint features — no real decoding. Keeps
    * tests and the q38 oracle exactly reproducible, and is the documented
    * fallback for modalities with no installed decoder.
    */
  case object StubCodec extends Codec {
    override def decode(modality: String, content: Array[Byte], dim: Int): Array[Float] =
      decodeStub(content, dim)
  }

  /** Real image decoding via `javax.imageio`. Images decode to a pooled
    * pixel-grid embedding ([[ImageCodec.pool]]); non-image modalities and
    * payloads no installed reader recognizes fall back to the stub
    * fingerprint (deterministic, keeps the row — a production pipeline
    * would route these to a quarantine sink instead of dropping them).
    */
  case object ImageIoCodec extends Codec {
    // per-partition: keep ImageIO off its disk-backed temp-file cache —
    // decode is pure in-memory work next to the data
    override def init(): Unit = javax.imageio.ImageIO.setUseCache(false)
    override def decode(modality: String, content: Array[Byte], dim: Int): Array[Float] =
      if (modality == "image")
        ImageCodec.decode(content) match {
          case Some(img) => ImageCodec.pool(img, dim)
          case None => decodeStub(content, dim)
        }
      else decodeStub(content, dim)
  }

  /** Every modality with a pure-JVM decoder decoded for REAL: images via
    * [[ImageCodec]] (pooled pixel grid), audio via [[AudioCodec]] (windowed
    * PCM amplitude), uncompressed Y4M video via [[VideoCodec]] (pooled luma
    * across frames); compressed video and undecodable payloads of the real
    * modalities fall back to the stub fingerprint.
    */
  case object JdkMediaCodec extends Codec {
    override def init(): Unit = javax.imageio.ImageIO.setUseCache(false)
    override def decode(modality: String, content: Array[Byte], dim: Int): Array[Float] =
      modality match {
        case "image" => ImageCodec.decode(content)
          .map(ImageCodec.pool(_, dim)).getOrElse(decodeStub(content, dim))
        case "audio" => AudioCodec.decode(content)
          .map(c => AudioCodec.features(c.samples, dim))
          .getOrElse(decodeStub(content, dim))
        case "video" => VideoCodec.decode(content)
          .map(v => VideoCodec.features(v, dim))
          .getOrElse(decodeStub(content, dim))
        case _ => decodeStub(content, dim)
      }
  }

  final case class MediaRecord(media_id: Long, modality: String, uri: String,
                               content: Array[Byte], width: Int, height: Int,
                               durationMs: Long)

  final case class MediaFeatures(media_id: Long, modality: String,
                                 feature: Array[Float], frames: Int)

  /** Byte-fingerprint "decode": hashes byte windows into a deterministic
    * vector. NOT a real decoder — it is the fallback for modalities without
    * one (audio/video here) and the reproducible basis of the q38 oracle;
    * images have the real path in [[ImageIoCodec]].
    */
  def decodeStub(content: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      var h = 1125899906842597L ^ (i * 0x9E3779B97F4A7C15L)
      var j = i
      while (j < content.length) { h = 31 * h + content(j); j += dim }
      out(i) = ((h & 0xFFFF).toFloat / 65535.0f) * 2.0f - 1.0f
      i += 1
    }
    out
  }

  /** Feature extraction as a typed partition-parallel stage: one codec init
    * per partition (the `mapPartitions` boundary is where a real decoder
    * would allocate), one output row per media row.
    */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 64,
                      codec: Codec = StubCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      codec.init() // once per partition, not per row
      it.map { m =>
        val frames = m.modality match {
          case "video" => math.max(1, (m.durationMs / 1000L).toInt)
          case _ => 1
        }
        MediaFeatures(m.media_id, m.modality, codec.decode(m.modality, m.content, dim), frames)
      }
    }
  }

  /** Real image resize: decode with ImageIO, deterministic nearest-neighbor
    * downscale preserving aspect ratio (never upscales), PNG re-encode.
    * Non-images and undecodable payloads pass through unchanged; decoded
    * images also get their width/height metadata corrected to the actual
    * pixel dimensions. Narrow per-partition stage — bytes never shuffle.
    *
    * Format contract: every downscaled payload is TRANSCODED TO PNG
    * regardless of the input format (a record's `uri` extension no longer
    * describes its bytes — sniff the payload, or add a format column, if
    * downstream cares), and the resize grid is `TYPE_INT_RGB`, so any alpha
    * channel in transparent PNG/GIF inputs is dropped — each pixel keeps
    * its RGB components as stored, i.e. transparency flattens onto an
    * undefined (not compositor-blended) background. Media that must keep
    * alpha or its container format should bypass this stage.
    */
  def resizeDecoded(media: Dataset[MediaRecord], maxW: Int, maxH: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        if (m.modality != "image") m
        else ImageCodec.decode(m.content) match {
          case None => m
          case Some(img) =>
            val s = math.min(1.0,
              math.min(maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight))
            if (s >= 1.0) m.copy(width = img.getWidth, height = img.getHeight)
            else {
              val nw = math.max(1, math.floor(img.getWidth * s).toInt)
              val nh = math.max(1, math.floor(img.getHeight * s).toInt)
              val resized = ImageCodec.resize(img, nw, nh)
              m.copy(content = ImageCodec.encodePng(resized), width = nw, height = nh)
            }
        }
      }
    }
  }

  /** REAL frame sampling for Y4M video: one row per kept frame (every
    * `every`-th), each with the frame's ACTUAL decoded luma feature and its
    * true timeline offset from the stream's frame rate. Payloads
    * [[VideoCodec]] cannot parse (compressed containers) degrade to the
    * [[sampleFrames]] byte-slice fingerprint rows so the corpus keeps its
    * rows either way — the per-row `decoded` flag tells the two apart.
    * Narrow per-partition stage; payload bytes never shuffle.
    */
  def sampleFramesDecoded(media: Dataset[MediaRecord], every: Int = 1,
                          dim: Int = 64): DataFrame = {
    require(every >= 1, s"every >= 1: $every")
    import media.sparkSession.implicits._
    media.filter(_.modality == "video").flatMap { m =>
      VideoCodec.decode(m.content) match {
        case Some(v) =>
          (0 until v.yPlanes.length by every).map { f =>
            (m.media_id, f, f.toLong * 1000L * v.fpsDen / v.fpsNum,
              VideoCodec.frameFeature(v.yPlanes(f), dim), true)
          }
        case None =>
          val n = math.max(1, (m.durationMs / 1000L).toInt)
          (0 until n by every).map { f =>
            val len = m.content.length
            val s0 = if (len == 0) 0 else (f.toLong * len / n).toInt
            val s1 = if (len == 0) 0 else ((f + 1L) * len / n).toInt
            (m.media_id, f, f * 1000L,
              decodeStub(java.util.Arrays.copyOfRange(m.content, s0,
                math.max(s0, s1)), dim), false)
          }
      }
    }.toDF("media_id", "frame_idx", "offset_ms", "feature", "decoded")
  }

  /** Frame sampling plumbing for video: emit one row per sampled frame
    * (every `everyMs` of duration), each with the stub-decoded feature of a
    * byte slice — [[sampleFramesDecoded]] is the real path for payloads
    * [[VideoCodec]] can parse.
    */
  def sampleFrames(media: Dataset[MediaRecord], everyMs: Long = 1000L,
                   dim: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "video").flatMap { m =>
      val n = math.max(1, (m.durationMs / everyMs).toInt)
      (0 until n).map { f =>
        // bounded slice [start, nextStart): drop() copies the whole
        // remaining payload per frame — O(frames x payload) allocation,
        // ~180 GB transient for a 100 MB hour-long video — and frames
        // would overlap instead of partitioning the stream
        val len = m.content.length
        val sliceStart = if (len == 0) 0 else (f.toLong * len / n).toInt
        val sliceEnd = if (len == 0) 0 else ((f + 1L) * len / n).toInt
        val slice = java.util.Arrays.copyOfRange(m.content, sliceStart,
          math.max(sliceStart, sliceEnd))
        (m.media_id, f, f * everyMs, decodeStub(slice, dim))
      }
    }.toDF("media_id", "frame_idx", "offset_ms", "feature")
  }

  /** Resize plumbing: metadata transforms stay columnar; only the byte
    * payload transform is stubbed (identity here — a codec would re-encode).
    */
  def resize(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(1.0), least(lit(maxW) / col("width"), lit(maxH) / col("height")))
    media
      .withColumn("width", floor(col("width") * scale).cast("int"))
      .withColumn("height", floor(col("height") * scale).cast("int"))
    // content re-encode: STUB (identity) — plumbing only
  }

  /** Synthesize a deterministic media corpus (for tests/benches): byte
    * payloads derived from ids, mixed modalities.
    */
  def syntheticCorpus(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val id = i
      val modality = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val bytes = Array.tabulate[Byte](256 + (id % 512).toInt)(j => ((id * 31 + j) & 0xFF).toByte)
      MediaRecord(id, modality, s"mem://media/$id", bytes,
        640 + (id % 64).toInt * 10, 480 + (id % 48).toInt * 10, 1000L + (id % 30) * 1000L)
    }
  }
}
