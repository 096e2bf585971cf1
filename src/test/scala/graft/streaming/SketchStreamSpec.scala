package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.types._

import java.io.File
import java.nio.file.Files

class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("g", StringType),
    StructField("x", DoubleType)))

  test("micro-batched sketches merge into accurate running per-group quantiles") {
    val tmp = Files.createTempDirectory("graft_skstream_").toFile
    val in = new File(tmp, "in"); in.mkdirs()
    // deterministic per-group values split across 3 batch files; pin mod
    // times so the file source's batch order is stable
    var modT = System.currentTimeMillis() - 60000
    def write(name: String, lines: Seq[String]): Unit = {
      val f = new File(in, name)
      Files.writeString(f.toPath, lines.mkString("\n"))
      modT += 5000
      assert(f.setLastModified(modT))
    }
    def rows(batch: Int): Seq[String] =
      (0 until 2000).map { i =>
        val g = if (i % 2 == 0) "a" else "b"
        // group a: uniform 0..6000 over all batches; b: uniform scaled by 10
        val v = (batch * 2000 + i).toDouble * (if (g == "a") 1 else 10)
        s"""{"g":"$g","x":$v}"""
      }
    write("b0.ndjson", rows(0))
    write("b1.ndjson", rows(1))
    write("b2.ndjson", rows(2))

    val snap = s"$tmp/snap"
    SketchStream.run(spark, in.getAbsolutePath, schema, snap, s"$tmp/ckpt",
      groupCols = Seq("g"), valueCol = "x", k = 200)

    val cur = SketchStream.current(spark, snap).get
    val out = SketchStream.quantiles(cur, Seq("g"), Seq(0.5))
      .select("g", "n", "p50").as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("a")._1 === 3000L && out("b")._1 === 3000L)
    // true medians: a ≈ 3000 (values 0,2,...,5998), b ≈ 30010; KLL@200
    // holds ~1% rank error — allow 3% value slack on uniform data
    assert(math.abs(out("a")._2 - 3000.0) < 180.0, s"a median ${out("a")._2}")
    assert(math.abs(out("b")._2 - 30010.0) < 1800.0, s"b median ${out("b")._2}")

    // incremental resume: a late batch introduces a NEW group and extends an
    // old one; only the delta is sketched, the snapshot version advances
    val vBefore = graft.pipeline.Snapshots.versions(spark, snap, completeOnly = true)
      .map(_._1).max
    write("b3.ndjson", (0 until 1000).map(i => s"""{"g":"c","x":${i.toDouble}}""") ++
      (0 until 1000).map(i => s"""{"g":"a","x":${(6000 + i).toDouble}}"""))
    SketchStream.run(spark, in.getAbsolutePath, schema, snap, s"$tmp/ckpt",
      groupCols = Seq("g"), valueCol = "x", k = 200)
    val cur2 = SketchStream.current(spark, snap).get
    val out2 = SketchStream.quantiles(cur2, Seq("g"), Seq(0.9))
      .select("g", "n", "p90").as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out2("c")._1 === 1000L && out2("a")._1 === 4000L)
    assert(math.abs(out2("c")._2 - 900.0) < 60.0)
    // group a sorted: 3000 even values 0..5998, then 1000 dense 6000..6999;
    // p90 rank 3600 lands 600 into the dense block ≈ 6600
    assert(math.abs(out2("a")._2 - 6600.0) < 300.0, s"a p90 ${out2("a")._2}")
    val vAfter = graft.pipeline.Snapshots.versions(spark, snap, completeOnly = true)
      .map(_._1).max
    assert(vAfter > vBefore)

    // a FRESH checkpoint pointed at the existing sketch snapshot must fail
    // loudly: its batch 0 would merge from an empty base (silent data loss)
    val e = intercept[Exception] {
      SketchStream.run(spark, in.getAbsolutePath, schema, snap,
        s"$tmp/ckpt_fresh", groupCols = Seq("g"), valueCol = "x", k = 200)
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(t => Option(t.getMessage).exists(_.contains("checkpoint"))))
  }
}
