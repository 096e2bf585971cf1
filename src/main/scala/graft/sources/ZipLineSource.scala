package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 zip-archive line source — the engine-native version of the
  * reference's zip ingest (S1/S2 `process_record`, `s3_to_json.py:848-909`;
  * S9's ranged-GET central-directory listing, `raw_sync/app.py:237-306`).
  *
  * `spark.read.format("graft.sources.ZipLineSource").option("path", glob)`
  * yields `(archive, member, line)` rows from ANY Hadoop filesystem —
  * file, hdfs, s3a, ... Planning reads ONLY each archive's tail: the EOCD +
  * central directory via 2-3 positioned reads per archive
  * ([[ZipCentralDirectory]]), never the archive body, so a 100 GB export on
  * s3a is planned from ~65 KB of ranged bytes. Members are bin-packed into
  * input partitions by compressed size so a thousand tiny members don't
  * become a thousand tasks, and each reader seeks straight to its member's
  * data and STREAMS lines through one inflater — no whole archive (or whole
  * member) is ever materialized, so task memory is one 64 KB inflater buffer
  * regardless of archive size.
  *
  * Options: `path` (path/glob, required), `maxBytesPerPartition` (compressed
  * bytes per input partition, default 128 MiB), `memberRegex` (planning-time
  * member filter — pushdown before any byte of member data is read).
  * Reference member hygiene (skip directories, `Manifest*`, empty entries)
  * is always applied.
  */
class ZipLineSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZipLineSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new ZipLineTable(new CaseInsensitiveStringMap(properties))
}

object ZipLineSource {
  val schema: StructType = StructType(Seq(
    StructField("archive", StringType, nullable = false),
    StructField("member", StringType, nullable = false),
    StructField("line", StringType, nullable = false)))

  /** One member of one archive, fully located at planning time: the reader
    * needs only (offset, size, method) — one seek, zero listing calls.
    */
  final case class MemberRef(archive: String, member: String,
                             compressedSize: Long, method: Int,
                             localHeaderOffset: Long)

  /** Expand a path/glob through the filesystem its scheme names. Returns
    * fully-qualified URIs so executors resolve the same filesystem.
    */
  def expandGlob(pattern: String, conf: Configuration): Seq[String] = {
    val path = new Path(pattern)
    val fs = path.getFileSystem(conf)
    val matched = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Seq.empty)
    matched.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filterNot(_.isDirectory)
      else Seq(st)
    }.map(st => fs.makeQualified(st.getPath).toString).sorted
  }

  /** Central-directory-only member listing with the reference's filter
    * (skip directories, `Manifest*` basenames, empty members).
    */
  def listMembers(archive: String, conf: Configuration,
                  memberRegex: Option[String]): Seq[MemberRef] = {
    val p = new Path(archive)
    ZipCentralDirectory.list(p.getFileSystem(conf), p)
      .filterNot(_.name.endsWith("/"))
      .filterNot { e =>
        e.name.substring(e.name.lastIndexOf('/') + 1).startsWith("Manifest")
      }
      .filterNot(_.uncompressedSize == 0)
      .filter(e => memberRegex.forall(r => e.name.matches(r)))
      // planning-time encryption check: the partition's MemberRef drops
      // the flags field, so a read-time check could not see it
      .map { e =>
        if ((e.flags & 1) != 0)
          throw new java.util.zip.ZipException(
            s"member ${e.name} in $archive is encrypted — unsupported")
        MemberRef(archive, e.name, math.max(e.compressedSize, 0L),
          e.method, e.localHeaderOffset)
      }
  }

  /** First-fit-decreasing bin packing of members into partitions. */
  def pack(members: Seq[MemberRef], maxBytes: Long): Seq[Seq[MemberRef]] = {
    final class Bin { var size = 0L; val ms = scala.collection.mutable.ArrayBuffer.empty[MemberRef] }
    val bins = scala.collection.mutable.ArrayBuffer.empty[Bin]
    members.sortBy(-_.compressedSize).foreach { m =>
      val bin = bins.find(_.size + m.compressedSize <= maxBytes).getOrElse {
        val b = new Bin; bins += b; b
      }
      bin.size += m.compressedSize
      bin.ms += m
    }
    // group each bin by archive so the reader holds one archive stream
    // open per archive instead of reopening on every interleaved member;
    // WITHIN an archive order by physical offset — name order seeks
    // backwards whenever name order differs from write order, and on s3a
    // every backward seek aborts and reopens the HTTP stream
    bins.map(_.ms.sortBy(m => (m.archive, m.localHeaderOffset)).toSeq).toSeq
  }
}

class ZipLineTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = s"ziplines(${options.get("path")})"
  override def schema(): StructType = ZipLineSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ZipScanBuilder(options)
}

class ZipScanBuilder(options: CaseInsensitiveStringMap) extends ScanBuilder {
  override def build(): Scan = new ZipScan(options)
}

class ZipScan(options: CaseInsensitiveStringMap) extends Scan with Batch {
  override def readSchema(): StructType = ZipLineSource.schema
  override def toBatch: Batch = this
  override def description(): String = s"ZipScan(${options.get("path")})"

  // the session's Hadoop conf carries FS credentials/impls (spark.hadoop.*);
  // a bare `new Configuration()` would lose them on both driver and executors
  private def hadoopConf: Configuration =
    SparkSession.active.sessionState.newHadoopConf()

  override def planInputPartitions(): Array[InputPartition] = {
    val pattern = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("ZipLineSource requires option 'path'"))
    val maxBytes = Option(options.get("maxBytesPerPartition"))
      .map(_.toLong).getOrElse(128L * 1024 * 1024)
    val memberRegex = Option(options.get("memberRegex"))
    val conf = hadoopConf
    val archives = ZipLineSource.expandGlob(pattern, conf)
    // tail reads are latency-bound on object stores — list archives in
    // parallel like Spark's own InMemoryFileIndex does for file listing
    val members: Seq[ZipLineSource.MemberRef] =
      if (archives.size <= 1)
        archives.flatMap(a => ZipLineSource.listMembers(a, conf, memberRegex))
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(archives.size, 16))
        try {
          import scala.jdk.CollectionConverters._
          pool.invokeAll(archives.map { a =>
            new java.util.concurrent.Callable[Seq[ZipLineSource.MemberRef]] {
              override def call(): Seq[ZipLineSource.MemberRef] =
                ZipLineSource.listMembers(a, conf, memberRegex)
            }
          }.asJava).asScala.toSeq.flatMap(_.get())
        } finally pool.shutdown()
      }
    ZipLineSource.pack(members, maxBytes)
      .map(ms => ZipInputPartition(ms.toArray): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // ship the driver's Hadoop conf to executors as plain entries (the
    // Configuration class itself is not Serializable)
    import scala.jdk.CollectionConverters._
    val entries = hadoopConf.iterator().asScala
      .map(e => (e.getKey, e.getValue)).toArray
    new ZipReaderFactory(entries)
  }
}

final case class ZipInputPartition(members: Array[ZipLineSource.MemberRef])
  extends InputPartition

class ZipReaderFactory(confEntries: Array[(String, String)])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val conf = new Configuration(false)
    confEntries.foreach { case (k, v) => conf.set(k, v) }
    new ZipPartitionReader(partition.asInstanceOf[ZipInputPartition].members, conf)
  }
}

/** Streams one partition's members line-by-line; holds at most one open
  * archive stream and one inflater at a time, seeking directly to each
  * member's planned offset — no listing calls, no local copies.
  */
class ZipPartitionReader(members: Array[ZipLineSource.MemberRef],
                         conf: Configuration)
  extends PartitionReader[InternalRow] {

  private var idx = -1
  private var archiveIn: FSDataInputStream = _
  private var openArchive: String = _
  private var reader: java.io.BufferedReader = _
  private var current: InternalRow = _

  private def openNextMember(): Boolean = {
    if (reader != null) { reader.close(); reader = null }
    idx += 1
    if (idx >= members.length) return false
    val m = members(idx)
    if (archiveIn == null || openArchive != m.archive) {
      if (archiveIn != null) archiveIn.close()
      val p = new Path(m.archive)
      archiveIn = p.getFileSystem(conf).open(p)
      openArchive = m.archive
    }
    val entry = ZipCentralDirectory.Entry(m.member, m.method,
      m.compressedSize, uncompressedSize = 1L, m.localHeaderOffset)
    reader = new java.io.BufferedReader(new java.io.InputStreamReader(
      ZipCentralDirectory.openMember(archiveIn, entry), "UTF-8"))
    true
  }

  override def next(): Boolean = {
    while (true) {
      if (reader == null && !openNextMember()) return false
      val line = reader.readLine()
      if (line == null) {
        reader.close(); reader = null
      } else if (line.nonEmpty) {
        val m = members(idx)
        current = InternalRow(
          UTF8String.fromString(m.archive),
          UTF8String.fromString(m.member),
          UTF8String.fromString(line))
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current

  override def close(): Unit = {
    if (reader != null) reader.close()
    if (archiveIn != null) archiveIn.close()
  }
}
