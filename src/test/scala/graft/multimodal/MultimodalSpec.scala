package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("feature extraction: schema, determinism, one row per media") {
    val corpus = Multimodal.syntheticCorpus(spark, 30)
    val feats = Multimodal.extractFeatures(corpus, dim = 16)
    assert(feats.count() === 30)
    val f = feats.filter(_.media_id == 7L).collect().head
    assert(f.feature.length === 16)
    // determinism: same input -> identical features
    val f2 = Multimodal.extractFeatures(corpus, dim = 16)
      .filter(_.media_id == 7L).collect().head
    assert(f.feature.toSeq === f2.feature.toSeq)
    assert(f.feature.forall(v => v >= -1.0f && v <= 1.0f))
  }

  test("frame sampling emits one row per sampled frame for videos only") {
    val corpus = Multimodal.syntheticCorpus(spark, 30)
    val frames = Multimodal.sampleFrames(corpus, everyMs = 1000L, dim = 8)
    val videos = corpus.filter(_.modality == "video").collect()
    val expected = videos.map(v => math.max(1, (v.durationMs / 1000L).toInt)).sum
    assert(frames.count() === expected)
    assert(frames.columns.toSet === Set("media_id", "frame_idx", "offset_ms", "feature"))
  }

  test("media features flow into ANN search (integration)") {
    import graft.operators.Knn
    import org.apache.spark.sql.functions.col
    val corpus = Multimodal.syntheticCorpus(spark, 60)
    val feats = Multimodal.extractFeatures(corpus, dim = 16)
      .toDF().withColumnRenamed("feature", "embedding")
      .withColumnRenamed("media_id", "vec_id")
    val nn = Knn.bruteForce(feats.where(col("vec_id") < 3), feats, k = 4)
    assert(nn.count() === 12) // 3 queries x 4 neighbors
    assert(nn.where("sim > 1.000001 OR sim < -1.000001").count() === 0)
  }

  test("resize clamps dimensions preserving aspect ratio metadata") {
    import spark.implicits._
    val df = Seq((1L, 1280, 960), (2L, 320, 240)).toDF("media_id", "width", "height")
    val out = Multimodal.resize(df, 640, 480).collect()
      .map(r => r.getAs[Long]("media_id") -> ((r.getAs[Int]("width"), r.getAs[Int]("height")))).toMap
    assert(out(1L) === ((640, 480)))
    assert(out(2L) === ((320, 240))) // never upscaled
  }
}
