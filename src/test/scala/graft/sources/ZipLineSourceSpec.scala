package graft.sources

import graft.SparkSpec

import java.io.{File, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

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
    val members = (1 to 10).map(i => MemberRef("a.zip", s"m$i", 10L))
    val bins = ZipLineSource.pack(members, maxBytes = 25L)
    assert(bins.flatten.toSet === members.toSet)
    assert(bins.forall(_.map(_.compressedSize).sum <= 25L))
    assert(bins.size === 5) // 10 members x 10 bytes into 25-byte bins
    // an oversized member still gets its own bin rather than being dropped
    val big = ZipLineSource.pack(Seq(MemberRef("a.zip", "huge", 100L)), maxBytes = 25L)
    assert(big === Seq(Seq(MemberRef("a.zip", "huge", 100L))))
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
