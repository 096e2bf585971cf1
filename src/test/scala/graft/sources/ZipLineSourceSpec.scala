package graft.sources

import graft.SparkSpec

import java.io.{File, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

/** A RawLocalFileSystem under a non-`file` scheme: exercises the remote-FS
  * code path (ranged EOCD planning + seek-read through the Hadoop FS API)
  * without needing a real hdfs/s3a endpoint. `java.util.zip.ZipFile` cannot
  * open these paths — only the ranged parser can.
  */
class SeekOnlyFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("seekfs:///")
}

class ZipLineSourceSpec extends SparkSpec {
  import spark.implicits._

  private def makeZip(dir: File, name: String, entries: (String, String)*): String = {
    val f = new File(dir, name)
    val zos = new ZipOutputStream(new FileOutputStream(f))
    entries.foreach { case (n, content) =>
      zos.putNextEntry(new ZipEntry(n))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    f.getAbsolutePath
  }

  private lazy val tmp = Files.createTempDirectory("graft_dsv2_").toFile

  test("reads all members' lines across archives with reference hygiene") {
    val dir = new File(tmp, "a"); dir.mkdirs()
    makeZip(dir, "x.zip",
      "TypeA_20230101.json" -> "{\"v\":1}\n{\"v\":2}\n\n{\"v\":3}",
      "Manifest.json" -> "{\"skip\":true}",
      "empty.json" -> "")
    makeZip(dir, "y.zip",
      "sub/TypeB_20230102.json" -> "{\"v\":4}")

    val df = spark.read.format("graft.sources.ZipLineSource")
      .option("path", s"${dir.getAbsolutePath}/*.zip").load()
    val rows = df.as[(String, String, String)].collect()
    assert(rows.length === 4) // 3 TypeA lines (blank dropped) + 1 TypeB
    assert(rows.count(_._2 == "TypeA_20230101.json") === 3)
    assert(rows.count(_._2 == "sub/TypeB_20230102.json") === 1)
    assert(!rows.exists(_._2.contains("Manifest")))
    assert(!rows.exists(_._2 == "empty.json"))
  }

  test("spanned (multi-disk) archives are rejected loudly at planning") {
    val dir = new File(tmp, "span"); dir.mkdirs()
    val path = makeZip(dir, "span.zip", "a.json" -> "{\"v\":1}")
    // forge the EOCD disk-number fields (offsets +4/+6 from the signature)
    // to claim the archive spans two disks
    val bytes = Files.readAllBytes(new File(path).toPath)
    var i = bytes.length - 22
    while (!(bytes(i) == 0x50 && bytes(i + 1) == 0x4b &&
             bytes(i + 2) == 0x05 && bytes(i + 3) == 0x06)) i -= 1
    bytes(i + 4) = 1; bytes(i + 6) = 1
    Files.write(new File(path).toPath, bytes)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val e = intercept[java.util.zip.ZipException] {
      ZipCentralDirectory.list(fs, new org.apache.hadoop.fs.Path(path))
    }
    assert(e.getMessage.contains("spanned"))
  }

  test("memberRegex pushes the member filter into planning") {
    val dir = new File(tmp, "b"); dir.mkdirs()
    makeZip(dir, "z.zip",
      "TypeA_20230101.json" -> "{\"v\":1}",
      "TypeB_20230101.json" -> "{\"v\":2}")
    val df = spark.read.format("graft.sources.ZipLineSource")
      .option("path", s"${dir.getAbsolutePath}/z.zip")
      .option("memberRegex", "TypeA_.*").load()
    assert(df.select("member").as[String].collect().toSeq === Seq("TypeA_20230101.json"))
  }

  test("bin packing bounds partition size without splitting members") {
    import ZipLineSource.MemberRef
    val members = (1 to 10).map(i => MemberRef("a.zip", s"m$i", 10L, 8, 0L))
    val bins = ZipLineSource.pack(members, maxBytes = 25L)
    assert(bins.flatten.toSet === members.toSet)
    assert(bins.forall(_.map(_.compressedSize).sum <= 25L))
    assert(bins.size === 5) // 10 members x 10 bytes into 25-byte bins
    // an oversized member still gets its own bin rather than being dropped
    val big = ZipLineSource.pack(Seq(MemberRef("a.zip", "huge", 100L, 8, 0L)), maxBytes = 25L)
    assert(big === Seq(Seq(MemberRef("a.zip", "huge", 100L, 8, 0L))))
  }

  test("plans and streams archives on a non-file Hadoop scheme via ranged EOCD reads") {
    val dir = new File(tmp, "remote"); dir.mkdirs()
    makeZip(dir, "r.zip",
      "TypeA_20230101.json" -> "{\"v\":1}\n{\"v\":2}",
      "sub/TypeB_20230102.json" -> "{\"v\":3}",
      "Manifest.json" -> "{\"skip\":true}")
    spark.sparkContext.hadoopConfiguration
      .set("fs.seekfs.impl", classOf[SeekOnlyFs].getName)
    val df = spark.read.format("graft.sources.ZipLineSource")
      .option("path", s"seekfs://${dir.getAbsolutePath}/*.zip").load()
    val rows = df.as[(String, String, String)].collect()
    assert(rows.length === 3)
    assert(rows.forall(_._1.startsWith("seekfs:")))
    assert(rows.count(_._2 == "TypeA_20230101.json") === 2)
    assert(rows.count(_._2 == "sub/TypeB_20230102.json") === 1)
    assert(!rows.exists(_._2.contains("Manifest")))
    // and the high-level ingest path is single-pathed through the same source
    val viaIngest = graft.ingest.ExportReader.readExportsDistributed(
      spark, s"seekfs://${dir.getAbsolutePath}/*.zip")
    assert(viaIngest.count() === 3)
  }

  test("zip64 archives (>65535 entries) plan from the zip64 EOCD") {
    val dir = new File(tmp, "z64"); dir.mkdirs()
    val f = new File(dir, "big.zip")
    val zos = new ZipOutputStream(new FileOutputStream(f))
    val n = 65600 // forces the zip64 EOCD record + locator
    var i = 0
    while (i < n) {
      zos.putNextEntry(new ZipEntry(s"m$i.json"))
      zos.write(s"""{"i":$i}""".getBytes("UTF-8"))
      zos.closeEntry()
      i += 1
    }
    zos.close()
    val df = spark.read.format("graft.sources.ZipLineSource")
      .option("path", f.getAbsolutePath).load()
    assert(df.count() === n.toLong)
    // spot-check content round-trips through the ranged member reads
    val got = df.where($"member" === "m65599.json").select("line").as[String].collect()
    assert(got.toSeq === Seq("""{"i":65599}"""))
  }

  test("stored (uncompressed) members stream through the bounded reader") {
    val dir = new File(tmp, "stored"); dir.mkdirs()
    val f = new File(dir, "s.zip")
    val zos = new ZipOutputStream(new FileOutputStream(f))
    val payload = "{\"v\":42}\n{\"v\":43}".getBytes("UTF-8")
    val e = new ZipEntry("Stored_20230101.json")
    e.setMethod(java.util.zip.ZipOutputStream.STORED)
    e.setSize(payload.length.toLong)
    e.setCompressedSize(payload.length.toLong)
    val crc = new java.util.zip.CRC32(); crc.update(payload)
    e.setCrc(crc.getValue)
    zos.putNextEntry(e); zos.write(payload); zos.closeEntry()
    zos.putNextEntry(new ZipEntry("Deflated_20230101.json"))
    zos.write("{\"v\":44}".getBytes("UTF-8")); zos.closeEntry()
    zos.close()
    val df = spark.read.format("graft.sources.ZipLineSource")
      .option("path", f.getAbsolutePath).load()
    val byMember = df.as[(String, String, String)].collect()
      .groupBy(_._2).view.mapValues(_.map(_._3).toSeq).toMap
    assert(byMember("Stored_20230101.json") === Seq("{\"v\":42}", "{\"v\":43}"))
    assert(byMember("Deflated_20230101.json") === Seq("{\"v\":44}"))
  }

  test("lines parse into schema'd records end-to-end") {
    val dir = new File(tmp, "c"); dir.mkdirs()
    makeZip(dir, "w.zip", "TypeA_20230101.json" -> "{\"v\":7}\n{\"v\":8}")
    val df = spark.read.format("graft.sources.ZipLineSource")
      .option("path", s"${dir.getAbsolutePath}/w.zip").load()
    val parsed = df.select(
      org.apache.spark.sql.functions.from_json(
        $"line",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.IntegerType))))("v").as("v"))
    assert(parsed.as[Int].collect().sorted.toSeq === Seq(7, 8))
  }
}
