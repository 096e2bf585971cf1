package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import java.io.{File, FileOutputStream}
import java.nio.file.Files
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._

/** Zip-export source (reference S1/S2: `process_record`,
  * `s3_to_json.py:848-909`): enumerate an export archive's member files —
  * skipping directories, `Manifest*`, and zero-byte entries — and read each
  * NDJSON member into a schema-coerced DataFrame.
  *
  * Scale notes: one export zip is modest (the reference caps raw objects at
  * ~80 GB compressed); members are extracted driver-side then read by Spark's
  * parallel JSON datasource, so the heavy lifting (parse, transform, write)
  * is distributed. For many archives at once use [[readExportsDistributed]],
  * which plans members from ranged central-directory reads on any Hadoop
  * filesystem and streams them executor-side.
  */
object ExportReader {

  final case class Member(name: String, size: Long, metadata: Option[Transforms.FileMetadata])

  /** Reference member filter (`s3_to_json.py:865-871`, same in
    * `dispatch/app.py:104-118`).
    */
  def listMembers(zipPath: String): Seq[Member] = {
    val zf = new ZipFile(zipPath)
    try {
      zf.entries().asScala
        .filterNot(_.isDirectory)
        .filterNot(e => baseName(e.getName).startsWith("Manifest"))
        .filterNot(_.getSize == 0)
        .map(e => Member(e.getName, e.getSize, Transforms.parseFileName(e.getName)))
        .toVector
    } finally zf.close()
  }

  private def baseName(n: String): String = n.substring(n.lastIndexOf('/') + 1)

  /** Extract selected members to a temp dir; returns member → local path.
    * The dir and files register deleteOnExit as a JVM-lifetime backstop;
    * long-lived sessions ingesting many archives should pass a
    * `stagingDir` to [[readExport]] (shared-FS staging they own) or use
    * [[readExportsDistributed]], which never extracts at all.
    */
  def extract(zipPath: String, members: Seq[Member]): Map[String, String] = {
    val dir = Files.createTempDirectory("graft_export_").toFile
    dir.deleteOnExit() // registered FIRST: deleteOnExit runs in reverse order
    val zf = new ZipFile(zipPath)
    try {
      members.map { m =>
        // mirror the member's directory structure — flattening '/'→'_' would
        // collide distinct members like a/b_c.json and a_b/c.json
        val out = new File(dir, m.name)
        require(out.getCanonicalPath.startsWith(dir.getCanonicalPath + File.separator),
          s"zip entry escapes extraction dir: ${m.name}")
        Files.createDirectories(out.getParentFile.toPath)
        var p = out.getParentFile
        while (p != null && !p.getCanonicalPath.equals(dir.getCanonicalPath)) {
          p.deleteOnExit(); p = p.getParentFile
        }
        out.deleteOnExit()
        val in = zf.getInputStream(zf.getEntry(m.name))
        val os = new FileOutputStream(out)
        try in.transferTo(os) finally { os.close(); in.close() }
        m.name -> out.getAbsolutePath
      }.toMap
    } finally zf.close()
  }

  /** [[extract]] through the Hadoop FileSystem to a caller-owned staging
    * dir (HDFS/s3a/...) — the CLUSTER-safe path: driver-local temp files
    * are invisible to executors on a multi-node deployment, so
    * [[readExport]] must stage somewhere every node can read. The caller
    * owns the staging lifetime (delete after the frames are consumed).
    */
  def extractTo(spark: SparkSession, zipPath: String, members: Seq[Member],
                stagingDir: String): Map[String, String] = {
    val base = new org.apache.hadoop.fs.Path(stagingDir,
      "graft_export_" + java.util.UUID.randomUUID().toString.take(8))
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    val baseQ = fs.makeQualified(base).toString
    val zf = new ZipFile(zipPath)
    try {
      members.map { m =>
        // zip-slip guard mirroring extract()'s canonical containment check:
        // '..' segments, absolute names ('/etc/...'), and scheme-qualified
        // names ('s3a://...', 'a:b') must all be rejected — Hadoop's
        // Path(parent, child) DISCARDS the parent for an absolute or
        // qualified child, so any of them would write outside stagingDir
        require(!m.name.split('/').contains("..") && !m.name.startsWith("/") &&
            !m.name.contains(":"),
          s"zip entry escapes staging dir: ${m.name}")
        val out = new org.apache.hadoop.fs.Path(base, m.name)
        require(fs.makeQualified(out).toString.startsWith(baseQ + "/"),
          s"zip entry escapes staging dir: ${m.name}")
        val in = zf.getInputStream(zf.getEntry(m.name))
        val os = fs.create(out, true)
        try in.transferTo(os) finally { os.close(); in.close() }
        m.name -> out.toString
      }.toMap
    } finally zf.close()
  }

  /** Read one export archive into per-routed-type DataFrames with universal
    * properties injected (T1) and subtype re-injection (T2) applied. The
    * caller supplies the declared schema per routed type (catalog-wins
    * semantics: missing fields → null, mistyped → null via PERMISSIVE read).
    */
  def readExport(spark: SparkSession, zipPath: String, cohort: String,
                 schemaFor: String => Option[StructType],
                 stagingDir: Option[String] = None): Map[String, DataFrame] = {
    // driver-local extraction is only readable by executors in LOCAL mode;
    // on a cluster the member paths must land on a shared filesystem
    require(stagingDir.isDefined || spark.sparkContext.isLocal,
      "readExport on a multi-node cluster needs a shared-FS stagingDir " +
        "(driver-local temp files are invisible to executors) — pass " +
        "stagingDir, or use readExportsDistributed for the no-extract path")
    val members = listMembers(zipPath).filter(_.metadata.isDefined)
    val paths = stagingDir match {
      case Some(d) => extractTo(spark, zipPath, members, d)
      case None => extract(zipPath, members)
    }
    members.groupBy(_.metadata.get.routedType).flatMap { case (routedType, ms) =>
      schemaFor(routedType).map { schema =>
        val dfs = ms.map { m =>
          val meta = m.metadata.get
          var df = spark.read.schema(schema).json(paths(m.name))
          if (Transforms.subtypeInjectedTypes.contains(routedType) && meta.subtype.isDefined)
            df = Transforms.withSubtype(df, meta.subtype.get)
          Transforms.withUniversalProperties(df, meta.startDate, meta.endDate, cohort)
        }
        routedType -> dfs.reduce(_ unionByName _)
      }
    }
  }

  /** Distributed variant for MANY archives (the 100 TB ingest path), on ANY
    * Hadoop filesystem — file, hdfs, s3a, ... One code path: the DataSource
    * V2 zip source plans each archive from 2-3 ranged reads of its tail
    * (EOCD + central directory, the reference S9 trick), bin-packs members
    * into size-bounded partitions, and readers seek straight to each
    * member's data and stream lines through one inflater buffer. No archive
    * is ever downloaded whole, no 2 GB-per-file cap, task memory bounded
    * regardless of archive size. Emits (archive, member, line); parse per
    * routed type with `parseMembers`.
    */
  def readExportsDistributed(spark: SparkSession, zipGlob: String): DataFrame =
    spark.read.format("graft.sources.ZipLineSource")
      .option("path", zipGlob)
      .load()

  /** Parse the lines of one routed type out of a distributed-read frame
    * (routing rules = T6/T9: optional subtype segment, `_Deleted` marker).
    */
  def parseMembers(lines: DataFrame, routedType: String, schema: StructType): DataFrame = {
    import org.apache.spark.sql.functions.{from_json, regexp_extract, not}
    val base = regexp_extract(col("member"), "([^/]+)$", 1)
    // EXACTLY Transforms.fileRe's shape (one optional letter-initial
    // subtype segment, date or date-range, .json) — a looser pattern here
    // would route members the driver path's parseFileName rejects, and
    // the two ingest paths would silently produce different datasets
    // from the same archive
    val seg = "(_[A-Za-z][A-Za-z0-9]*)?"
    val dates = "_\\d{8}(-\\d{8})?\\.json$"
    val cond = if (routedType.endsWith("_Deleted")) {
      val t = routedType.stripSuffix("_Deleted")
      base.rlike(s"^${t}${seg}_Deleted$dates")
    } else {
      base.rlike(s"^${routedType}${seg}$dates") &&
        not(base.contains("_Deleted_"))
    }
    lines.where(cond)
      .select(from_json(col("line"), schema).as("r"))
      .select("r.*")
  }

  /** NDJSON dataset sink (reference S3, `write_file_to_json_dataset`,
    * `s3_to_json.py:495-614`): partitioned by cohort, gzip, file-size bound
    * via maxRecordsPerFile instead of manual part-file rolling.
    */
  def writeJsonDataset(df: DataFrame, path: String,
                       maxRecordsPerFile: Long = 1000000L): Unit =
    df.write.mode("append")
      .partitionBy("cohort")
      .option("compression", "gzip")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .json(path)
}
