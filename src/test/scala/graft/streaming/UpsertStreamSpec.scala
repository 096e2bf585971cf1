package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.types._

import java.io.File
import java.nio.file.Files

class UpsertStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("v", StringType),
    StructField("seq", LongType),
    StructField(UpsertStream.DeleteCol, BooleanType)))

  test("micro-batched changes maintain a latest-wins snapshot with tombstones") {
    val tmp = Files.createTempDirectory("graft_upstream_").toFile
    val in = new File(tmp, "in"); in.mkdirs()
    def write(name: String, lines: String*): Unit =
      Files.writeString(new File(in, name).toPath, lines.mkString("\n"))

    // initial inserts, an update (same key, higher seq), and a tombstone
    write("b0.ndjson",
      """{"k":1,"v":"a","seq":1}""",
      """{"k":2,"v":"b","seq":1}""",
      """{"k":3,"v":"c","seq":1}""")
    write("b1.ndjson",
      """{"k":2,"v":"b2","seq":2}""",
      """{"k":2,"v":"b1-late","seq":1}""",
      """{"k":3,"seq":3,"__deleted":true}""",
      """{"k":4,"v":"d","seq":2}""")

    val snap = s"$tmp/snap"
    UpsertStream.run(spark, in.getAbsolutePath, schema, snap, s"$tmp/ckpt",
      keys = Seq("k"), orderingCol = "seq")

    val cur = UpsertStream.current(spark, snap).get
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(cur === Map(1L -> "a", 2L -> "b2", 4L -> "d")) // 3 deleted, 2 updated

    // a second run over newly-landed changes resumes from the checkpoint
    write("b2.ndjson", """{"k":1,"seq":9,"__deleted":true}""")
    UpsertStream.run(spark, in.getAbsolutePath, schema, snap, s"$tmp/ckpt",
      keys = Seq("k"), orderingCol = "seq")
    val cur2 = UpsertStream.current(spark, snap).get
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(cur2 === Map(2L -> "b2", 4L -> "d"))

    // a FRESH checkpoint pointed at the existing snapshot must fail loudly:
    // its batch 0 would otherwise merge from an empty base (silent data loss)
    // while current() kept serving the stale versions
    val e = intercept[Exception] {
      UpsertStream.run(spark, in.getAbsolutePath, schema, snap,
        s"$tmp/ckpt_fresh", keys = Seq("k"), orderingCol = "seq")
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => Option(t.getMessage).exists(_.contains("checkpoint"))))
  }

  test("tombstones participate in latest-wins ordering") {
    val tmp = Files.createTempDirectory("graft_uptomb_").toFile
    val in = new File(tmp, "in"); in.mkdirs()
    def write(name: String, lines: String*): Unit =
      Files.writeString(new File(in, name).toPath, lines.mkString("\n"))
    val snap = s"$tmp/snap"

    // ONE micro-batch holding delete(seq 1) then re-insert(seq 2) for k=1:
    // the change-log winner is the insert, so the key must survive — the
    // same two changes split across batches (delete first) also keep it,
    // so the snapshot no longer depends on batch boundaries
    write("b0.ndjson",
      """{"k":1,"seq":1,"__deleted":true}""",
      """{"k":1,"v":"reborn","seq":2}""",
      """{"k":2,"v":"b","seq":5}""")
    UpsertStream.run(spark, in.getAbsolutePath, schema, snap, s"$tmp/ckpt",
      keys = Seq("k"), orderingCol = "seq")
    val cur = UpsertStream.current(spark, snap).get
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(cur === Map(1L -> "reborn", 2L -> "b"),
      s"in-batch delete-then-insert must keep the key: $cur")

    // a STALE tombstone (seq 3 < existing seq 5) arriving later must not
    // destroy the newer row; a genuinely newer one (seq 9) must
    write("b1.ndjson", """{"k":2,"seq":3,"__deleted":true}""")
    UpsertStream.run(spark, in.getAbsolutePath, schema, snap, s"$tmp/ckpt",
      keys = Seq("k"), orderingCol = "seq")
    val cur2 = UpsertStream.current(spark, snap).get
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(cur2 === Map(1L -> "reborn", 2L -> "b"),
      s"stale tombstone deleted a newer row: $cur2")

    write("b2.ndjson", """{"k":2,"seq":9,"__deleted":true}""")
    UpsertStream.run(spark, in.getAbsolutePath, schema, snap, s"$tmp/ckpt",
      keys = Seq("k"), orderingCol = "seq")
    val cur3 = UpsertStream.current(spark, snap).get
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(cur3 === Map(1L -> "reborn"), s"fresh tombstone must delete: $cur3")
  }

  test("snapshot versions resolve through the Hadoop FileSystem API") {
    // a version dir written through the Hadoop FS (no java.io.File involved)
    val tmp = Files.createTempDirectory("graft_upfs_").toFile
    val snap = s"$tmp/snap"
    Seq((1L, "a")).toDF("k", "v").write.parquet(s"$snap/v3")
    Seq((1L, "b")).toDF("k", "v").write.parquet(s"$snap/v7")
    // incomplete version: no _SUCCESS -> must be ignored
    Seq((1L, "c")).toDF("k", "v").write.parquet(s"$snap/v9")
    new File(s"$snap/v9/_SUCCESS").delete()
    val cur = UpsertStream.current(spark, snap).get
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(cur === Map(1L -> "b"))
  }

  test("a maintained aggregate rides the CDC stream (streaming materialized view)") {
    import graft.operators.IncrementalAgg
    import org.apache.spark.sql.{DataFrame, functions => F}
    val tmp = Files.createTempDirectory("graft_upmv_").toFile
    val in = new File(tmp, "in"); in.mkdirs()
    // the file source orders batches by modification time — pin distinct
    // times or sub-ms ties make the batch order (and thus the final
    // latest-wins content) nondeterministic
    var modT = System.currentTimeMillis() - 60000
    def write(name: String, lines: String*): Unit = {
      val f = new File(in, name)
      Files.writeString(f.toPath, lines.mkString("\n"))
      modT += 5000
      assert(f.setLastModified(modT))
    }
    // three batches: inserts; replace k=2 (moves group!) + insert; delete k=1
    write("b0.ndjson",
      """{"k":1,"g":"x","v":10.5,"seq":1}""",
      """{"k":2,"g":"x","v":20.5,"seq":1}""")
    write("b1.ndjson",
      """{"k":2,"g":"y","v":21.5,"seq":2}""",
      """{"k":3,"g":"y","v":30.0,"seq":2}""")
    write("b2.ndjson",
      """{"k":1,"seq":3,"__deleted":true}""")

    val mvSchema = StructType(Seq(
      StructField("k", LongType), StructField("g", StringType),
      StructField("v", DoubleType), StructField("seq", LongType),
      StructField(UpsertStream.DeleteCol, BooleanType)))
    def dec(df: DataFrame): DataFrame =
      df.withColumn("v", F.col("v").cast("decimal(18,4)"))

    var snapshot: DataFrame = dec(
      Seq.empty[(Long, String, Option[Double], Long)].toDF("k", "g", "v", "seq"))
    var agg: DataFrame = IncrementalAgg.full(snapshot, Seq("g"), "v")
    val q = spark.readStream.schema(mvSchema)
      .option("maxFilesPerTrigger", 1).json(in.getAbsolutePath)
      .writeStream
      .option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val changes = dec(graft.operators.DedupLatest(
          batch, Seq("k"), Seq(F.col("seq").desc))
          .withColumn(UpsertStream.DeleteCol,
            F.coalesce(F.col(UpsertStream.DeleteCol), F.lit(false)))
          .select("k", "g", "v", "seq", UpsertStream.DeleteCol))
        // maintain the view BEFORE advancing the snapshot (old contributions
        // come from the pre-merge state), then apply the merge
        agg = IncrementalAgg.maintain(agg, snapshot, changes,
          Seq("k"), Seq("g"), "v").localCheckpoint(true)
        snapshot = snapshot
          .join(changes.select("k"), Seq("k"), "left_anti")
          .unionByName(changes.where(!F.col(UpsertStream.DeleteCol))
            .drop(UpsertStream.DeleteCol))
          .localCheckpoint(true)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // final maintained view == recompute over the final snapshot
    def norm(df: DataFrame) =
      df.select(F.col("g"), F.col("n"), F.col("total").cast("decimal(28,4)"))
        .as[(String, Long, BigDecimal)].collect().toSet
    assert(snapshot.select("k").as[Long].collect().toSet === Set(2L, 3L))
    assert(norm(agg) === norm(IncrementalAgg.full(snapshot, Seq("g"), "v")))
    assert(norm(agg) === Set(("y", 2L, BigDecimal("51.5000"))))
  }
}
