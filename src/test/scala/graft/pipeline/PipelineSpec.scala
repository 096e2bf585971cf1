package graft.pipeline

import graft.SparkSpec
import graft.ingest.{ExportReader, Transforms}
import graft.schema.TypeParser
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import java.io.{File, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

/** End-to-end slice over a synthetic export zip — the reference's
  * minimum-semantics path (SURVEY §7.2): zip → NDJSON members → schema read
  * → dedup → tombstone anti-join → relationalize → parquet + counts.
  */
class PipelineSpec extends SparkSpec {

  private def writeZip(dir: File): String = {
    val zipPath = new File(dir, "export.zip").getAbsolutePath
    val zos = new ZipOutputStream(new FileOutputStream(zipPath))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    entry("Manifest.json", """{"files": 2}""") // filtered out
    entry("HealthKitV2Electrocardiogram_20230512.json",
      """{"ParticipantIdentifier":"p1","HealthKitECGSampleKey":"e1","AverageHeartRate":62,"SubSamples":[{"MicroVolts":1.5,"TimeSinceSampleStart":0.0},{"MicroVolts":2.5,"TimeSinceSampleStart":0.5}],"Source":{"Name":"watch"},"InsertedDate":"2023-05-11T00:00:00"}
{"ParticipantIdentifier":"p1","HealthKitECGSampleKey":"e1","AverageHeartRate":63,"SubSamples":[{"MicroVolts":9.0,"TimeSinceSampleStart":0.0}],"Source":{"Name":"watch"},"InsertedDate":"2023-05-12T00:00:00"}
{"ParticipantIdentifier":"p2","HealthKitECGSampleKey":"e2","AverageHeartRate":70,"SubSamples":[],"Source":{"Name":"phone"},"InsertedDate":"2023-05-12T00:00:00"}""")
    entry("HealthKitV2Electrocardiogram_Deleted_20230512.json",
      """{"ParticipantIdentifier":"p2","HealthKitECGSampleKey":"e2","DeletedDate":"2023-05-12T00:00:00"}""")
    entry("empty.json", "") // zero-byte: filtered out
    zos.close()
    zipPath
  }

  private val ecgSchema = StructType(Seq(
    StructField("ParticipantIdentifier", StringType),
    StructField("HealthKitECGSampleKey", StringType),
    StructField("AverageHeartRate", TypeParser.parse("int")),
    StructField("SubSamples", TypeParser.parse("array<struct<MicroVolts:double,TimeSinceSampleStart:double>>")),
    StructField("Source", TypeParser.parse("struct<Name:string>")),
    StructField("InsertedDate", StringType)))

  private val deletedSchema = StructType(Seq(
    StructField("ParticipantIdentifier", StringType),
    StructField("HealthKitECGSampleKey", StringType),
    StructField("DeletedDate", StringType)))

  test("zip -> dedup -> tombstone -> relationalize -> parquet, with counts") {
    val tmp = Files.createTempDirectory("graft_pipe_").toFile
    val zip = writeZip(tmp)

    val members = ExportReader.listMembers(zip)
    assert(members.map(m => new File(m.name).getName).toSet ===
      Set("HealthKitV2Electrocardiogram_20230512.json",
        "HealthKitV2Electrocardiogram_Deleted_20230512.json"))

    val frames = ExportReader.readExport(spark, zip, "adults_v1", {
      case "HealthKitV2Electrocardiogram" => Some(ecgSchema)
      case "HealthKitV2Electrocardiogram_Deleted" => Some(deletedSchema)
      case _ => None
    })
    assert(frames.keySet === Set("HealthKitV2Electrocardiogram",
      "HealthKitV2Electrocardiogram_Deleted"))

    val out = s"${tmp.getAbsolutePath}/out"
    val result = JsonToParquet.run(spark, "HealthKitV2Electrocardiogram",
      frames("HealthKitV2Electrocardiogram"),
      Some(frames("HealthKitV2Electrocardiogram_Deleted")), out, "run1")

    // dedup kept the later InsertedDate for e1; e2 removed by tombstone
    val parentRoot = s"$out/parquet/dataset_healthkitv2electrocardiogram"
    val parent = Snapshots.read(spark, parentRoot)
    assert(parent.count() === 1)
    val row = parent.collect().head
    assert(row.getAs[Int]("AverageHeartRate") === 63)
    assert(row.getAs[String]("Source_Name") === "watch")
    assert(row.getAs[String]("cohort") === "adults_v1")

    val child = Snapshots.read(spark,
      s"$out/parquet/dataset_healthkitv2electrocardiogram_subsamples")
    assert(child.count() === 1)
    assert(child.collect().head.getAs[Double]("MicroVolts") === 9.0)

    // lineage counts: all four stages present
    val counts = spark.read.option("header", "true")
      .csv(s"$out/record_counts/dataset_healthkitv2electrocardiogram")
    assert(counts.select("event").distinct().count() === 4)

    // rerun publishes a NEW version; history retains the previous one
    JsonToParquet.run(spark, "HealthKitV2Electrocardiogram",
      frames("HealthKitV2Electrocardiogram"),
      Some(frames("HealthKitV2Electrocardiogram_Deleted")), out, "run2")
    assert(Snapshots.versions(spark, parentRoot, completeOnly = true)
      .map(_._1) === Seq(0L, 1L))
    val _ = result
  }

  test("a write that dies mid-run leaves readers on the previous version") {
    import org.apache.spark.sql.functions._
    val tmp = Files.createTempDirectory("graft_snap_").toFile
    val root = s"${tmp.getAbsolutePath}/table"
    val spark2 = spark
    import spark2.implicits._

    Snapshots.writeNew(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root)()
    assert(Snapshots.read(spark, root).count() === 2)

    // a poisoned frame: evaluation throws partway through the write job —
    // the job aborts, and readers stay on the previous complete version
    val poisoned = Seq((3L, "c"), (4L, "boom")).toDF("k", "v")
      .withColumn("v", when($"v" === "boom",
        raise_error(lit("mid-write crash"))).otherwise($"v"))
    intercept[Exception] { Snapshots.writeNew(poisoned, root)() }
    assert(Snapshots.read(spark, root).select("k").as[Long].collect().toSet === Set(1L, 2L))

    // a HARD crash (JVM death mid-commit) leaves a version dir with data
    // files but no _SUCCESS — readers must skip it, and the next writer
    // must not reuse its number
    val v1 = Snapshots.versions(spark, root, completeOnly = false).map(_._1).max + 1
    val debris = new File(s"$root/v$v1"); debris.mkdirs()
    Files.writeString(new File(debris, "part-00000.parquet").toPath, "torn bytes")
    assert(Snapshots.read(spark, root).select("k").as[Long].collect().toSet === Set(1L, 2L))

    Snapshots.writeNew(Seq((5L, "e")).toDF("k", "v"), root)()
    assert(Snapshots.read(spark, root).select("k").as[Long].collect().toSet === Set(5L))
    assert(Snapshots.versions(spark, root, completeOnly = true).map(_._1) === Seq(0L, v1 + 1))

    // retention keeps the newest complete versions and clears crash debris
    Snapshots.writeNew(Seq((6L, "f")).toDF("k", "v"), root)()
    val deleted = Snapshots.prune(spark, root, keep = 2)
    assert(deleted.nonEmpty)
    assert(Snapshots.versions(spark, root, completeOnly = false).map(_._1) ===
      Seq(v1 + 1, v1 + 2))
    assert(Snapshots.read(spark, root).select("k").as[Long].collect().toSet === Set(6L))
  }

  test("audited scan splits clean rows from corrupt raw lines") {
    val tmp = Files.createTempDirectory("graft_audit_").toFile
    Files.writeString(new File(tmp, "d.ndjson").toPath,
      """{"a": "ok1", "b": 1}
        |this is not json
        |{"a": "ok2", "b": 2}
        |{"a": "bad-b", "b": [}""".stripMargin)
    val schema = StructType(Seq(
      StructField("a", StringType),
      StructField("b", org.apache.spark.sql.types.IntegerType)))
    val (clean, corrupt, release) = graft.pipeline.JsonToParquet.scanAudited(
      spark, tmp.getAbsolutePath, schema)
    assert(clean.count() === 2)
    assert(clean.columns.toSeq === Seq("a", "b"))
    val bad = corrupt.collect().map(_.getString(0)).toSet
    assert(bad.size === 2 && bad.exists(_.contains("not json")))
    release() // the hook evicts the cached base scan the tuple shares
  }

  test("extract keeps members distinct when flattened names would collide") {
    val tmp = Files.createTempDirectory("graft_zipcollide_").toFile
    val zipPath = new File(tmp, "c.zip").getAbsolutePath
    val zos = new ZipOutputStream(new FileOutputStream(zipPath))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name)); zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    // both flatten to a_b_c.json under '/'→'_' renaming
    entry("a/b_c.json", "one")
    entry("a_b/c.json", "two")
    zos.close()
    val members = ExportReader.listMembers(zipPath)
    val paths = ExportReader.extract(zipPath, members)
    assert(paths.size === 2 && paths.values.toSet.size === 2)
    assert(Files.readString(new File(paths("a/b_c.json")).toPath) === "one")
    assert(Files.readString(new File(paths("a_b/c.json")).toPath) === "two")
  }

  test("extractTo rejects hostile member names and stages benign ones under the base") {
    val tmp = Files.createTempDirectory("graft_ziphostile_").toFile
    val zipPath = new File(tmp, "h.zip").getAbsolutePath
    val zos = new ZipOutputStream(new FileOutputStream(zipPath))
    zos.putNextEntry(new ZipEntry("sub/ok.json"))
    zos.write("""{"a":1}""".getBytes("UTF-8")); zos.closeEntry(); zos.close()
    val staging = new File(tmp, "staging").getAbsolutePath
    def member(name: String) = ExportReader.Member(name, 1L, None)
    // advisor finding (r14): '..' was rejected but absolute and
    // scheme-qualified names slipped through — Hadoop Path(parent, child)
    // discards the parent for an absolute/qualified child
    for (hostile <- Seq("/etc/passwd", "../up.json", "a/../../up.json",
        "file:/tmp/x.json", "s3a://bucket/x.json")) {
      val e = intercept[IllegalArgumentException] {
        ExportReader.extractTo(spark, zipPath, Seq(member(hostile)), staging)
      }
      assert(e.getMessage.contains("escapes staging dir"), hostile)
    }
    val paths = ExportReader.extractTo(spark, zipPath,
      Seq(member("sub/ok.json")), staging)
    val staged = new org.apache.hadoop.fs.Path(paths("sub/ok.json"))
    assert(staged.toString.contains("/staging/"))
    val fs = staged.getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.makeQualified(staged).toString
      .startsWith(fs.makeQualified(new org.apache.hadoop.fs.Path(staging)).toString + "/"))
  }
}
