package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages whose Spark-side plumbing (schema, partitioning, batch shape) is
  * real while the codec itself is STUBBED — this container has no image or
  * audio libraries, so `decodeStub` derives a deterministic fake from the
  * bytes. Swap `decodeStub`'s body for a real codec (e.g. javacv / a JNI
  * decoder) without touching any plumbing.
  *
  * Scale notes: payload bytes never shuffle — every stage below is a narrow
  * `mapPartitions` over the scan, features are extracted next to the data,
  * and only compact feature vectors / metadata flow into joins or ANN. Use
  * `spark.read.format("binaryFile")` or parquet-with-binary-column scans;
  * size partitions by bytes (`maxPartitionBytes`), not rows, because rows are
  * megabytes each.
  */
object Multimodal {

  final case class MediaRecord(media_id: Long, modality: String, uri: String,
                               content: Array[Byte], width: Int, height: Int,
                               durationMs: Long)

  final case class MediaFeatures(media_id: Long, modality: String,
                                 feature: Array[Float], frames: Int)

  /** STUB decode: a real implementation would decode `content` with an image
    * library and emit pixel-derived features. This deterministic stand-in
    * hashes byte windows so tests can assert exact values and the pipeline
    * shape is real. ~~~ STUB: replace with actual codec ~~~
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
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real codec would be initialized here, once per partition
      it.map { m =>
        val frames = m.modality match {
          case "video" => math.max(1, (m.durationMs / 1000L).toInt)
          case _ => 1
        }
        MediaFeatures(m.media_id, m.modality, decodeStub(m.content, dim), frames)
      }
    }
  }

  /** Frame sampling plumbing for video: emit one row per sampled frame
    * (every `everyMs` of duration), each with the stub-decoded feature of a
    * byte slice — the real version slices the container at keyframes.
    */
  def sampleFrames(media: Dataset[MediaRecord], everyMs: Long = 1000L,
                   dim: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "video").flatMap { m =>
      val n = math.max(1, (m.durationMs / everyMs).toInt)
      (0 until n).map { f =>
        val sliceStart = if (m.content.isEmpty) 0 else (f * m.content.length / n)
        val slice = m.content.drop(sliceStart)
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
