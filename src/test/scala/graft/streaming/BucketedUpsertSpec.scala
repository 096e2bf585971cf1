package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.io.File
import java.nio.file.Files

/** The bucketed-snapshot CDC path: same merge semantics as the versioned
  * path, O(delta) per-batch cost (untouched buckets never rewritten),
  * retry-idempotent through the merge semantics alone, and emptied
  * buckets swept rather than left stale.
  */
class BucketedUpsertSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("v", StringType),
    StructField("seq", LongType),
    StructField(UpsertStream.DeleteCol, BooleanType)))

  private def bucketOf(k: Long, n: Int): Int =
    Seq(k).toDF("k")
      .select(pmod(xxhash64(col("k")), lit(n.toLong)).cast("int"))
      .head().getInt(0)

  private def changes(rows: (Long, String, Long, Boolean)*): DataFrame =
    rows.toDF("k", "v", "seq", UpsertStream.DeleteCol)

  private def snapRows(snapDir: String): Set[(Long, String, Long)] =
    UpsertStream.currentBucketed(spark, snapDir).get
      .select("k", "v", "seq").as[(Long, String, Long)].collect().toSet

  test("bucketed stream equals the versioned path on the same change log") {
    val tmp = Files.createTempDirectory("graft_bup_").toFile
    val in = new File(tmp, "in"); in.mkdirs()
    var modT = System.currentTimeMillis() - 60000
    def write(name: String, lines: String*): Unit = {
      val f = new File(in, name)
      Files.writeString(f.toPath, lines.mkString("\n"))
      modT += 5000; assert(f.setLastModified(modT))
    }
    write("b0.ndjson",
      """{"k":1,"v":"a","seq":1}""", """{"k":2,"v":"b","seq":1}""",
      """{"k":3,"v":"c","seq":1}""")
    // update, tombstone-then-reinsert inside one batch, fresh insert
    write("b1.ndjson",
      """{"k":2,"v":"b2","seq":2}""", """{"k":3,"seq":3,"__deleted":true}""",
      """{"k":3,"v":"c2","seq":4}""", """{"k":4,"v":"d","seq":2}""")
    // stale tombstone (seq below the standing row): must be a no-op
    write("b2.ndjson", """{"k":2,"seq":1,"__deleted":true}""")

    UpsertStream.run(spark, in.getAbsolutePath, schema, s"$tmp/snapv",
      s"$tmp/ckptv", keys = Seq("k"), orderingCol = "seq",
      maxFilesPerTrigger = Some(1))
    UpsertStream.runBucketed(spark, in.getAbsolutePath, schema,
      s"$tmp/snapb", s"$tmp/ckptb", keys = Seq("k"), orderingCol = "seq",
      nBuckets = 4, maxFilesPerTrigger = Some(1))

    val versioned = UpsertStream.current(spark, s"$tmp/snapv").get
      .select("k", "v", "seq").as[(Long, String, Long)].collect().toSet
    val bucketed = snapRows(s"$tmp/snapb")
    assert(bucketed === versioned)
    assert(bucketed.map(_._1) === Set(1L, 2L, 3L, 4L))
    assert(bucketed.find(_._1 == 3L).get._2 === "c2")
  }

  test("a delta rewrites only the buckets it touches") {
    val tmp = Files.createTempDirectory("graft_bupio_").toFile
    val snap = s"$tmp/snap"
    val n = 8
    UpsertStream.processBucketedBatch(
      changes((1L to 64L).map(k => (k, s"v$k", 1L, false)): _*),
      snap, Seq("k"), "seq", nBuckets = n)
    val dirs = new File(snap).listFiles()
      .filter(_.getName.startsWith(s"${UpsertStream.BucketCol}="))
    assert(dirs.nonEmpty)
    // pin every bucket dir's content signature (names + mtimes)
    def sig(d: File): Seq[(String, Long)] =
      d.listFiles().map(f => (f.getName, f.lastModified())).toSeq.sorted
    val before = dirs.map(d => d.getName -> sig(d)).toMap
    Thread.sleep(1100) // mtime granularity can be a full second
    val touchedBucket = bucketOf(7L, n)
    UpsertStream.processBucketedBatch(
      changes((7L, "updated", 2L, false)), snap, Seq("k"), "seq", n)
    val after = new File(snap).listFiles()
      .filter(_.getName.startsWith(s"${UpsertStream.BucketCol}="))
      .map(d => d.getName -> sig(d)).toMap
    val touchedName = s"${UpsertStream.BucketCol}=$touchedBucket"
    assert(after(touchedName) !== before(touchedName),
      "the touched bucket must be rewritten")
    (before.keySet - touchedName).foreach { name =>
      assert(after(name) === before(name),
        s"untouched bucket $name was rewritten — the O(delta) contract broke")
    }
    assert(snapRows(snap).find(_._1 == 7L).get._2 === "updated")
    assert(snapRows(snap).size === 64)
  }

  test("a retried batch is a no-op (merge-semantics idempotency)") {
    val tmp = Files.createTempDirectory("graft_bupretry_").toFile
    val snap = s"$tmp/snap"
    UpsertStream.processBucketedBatch(
      changes((1L, "a", 1L, false), (2L, "b", 1L, false)),
      snap, Seq("k"), "seq", nBuckets = 4)
    val delta = changes((1L, "a2", 2L, false), (2L, "", 2L, true),
      (3L, "c", 2L, false))
    UpsertStream.processBucketedBatch(delta, snap, Seq("k"), "seq", 4)
    val once = snapRows(snap)
    // crash-after-write, checkpoint-not-committed: the batch replays whole
    UpsertStream.processBucketedBatch(delta, snap, Seq("k"), "seq", 4)
    assert(snapRows(snap) === once)
    assert(once.map(t => (t._1, t._2)) === Set((1L, "a2"), (3L, "c")))
  }

  test("composite keys bucket on the full key and dedup within a batch") {
    val tmp = Files.createTempDirectory("graft_bupck_").toFile
    val snap = s"$tmp/snap"
    def ck(rows: (Long, Long, String, Long, Boolean)*): DataFrame =
      rows.toDF("k1", "k2", "v", "seq", UpsertStream.DeleteCol)
    UpsertStream.processBucketedBatch(
      ck((1L, 1L, "a", 1L, false), (1L, 2L, "b", 1L, false),
        (2L, 1L, "c", 1L, false)),
      snap, Seq("k1", "k2"), "seq", nBuckets = 4)
    // one batch carrying duplicate composite keys: latest seq wins; the
    // (1,2) row updates while (1,1) and (2,1) stand
    UpsertStream.processBucketedBatch(
      ck((1L, 2L, "stale", 2L, false), (1L, 2L, "fresh", 3L, false)),
      snap, Seq("k1", "k2"), "seq", 4)
    val cur = UpsertStream.currentBucketed(spark, snap).get
      .select("k1", "k2", "v").as[(Long, Long, String)].collect().toSet
    assert(cur === Set((1L, 1L, "a"), (1L, 2L, "fresh"), (2L, 1L, "c")))
  }

  test("the returned touched set is exactly the delta's buckets") {
    val tmp = Files.createTempDirectory("graft_buptouch_").toFile
    val snap = s"$tmp/snap"
    val n = 8
    val t1 = UpsertStream.processBucketedBatch(
      changes((1L to 64L).map(k => (k, s"v$k", 1L, false)): _*),
      snap, Seq("k"), "seq", nBuckets = n)
    assert(t1.toSeq === t1.toSeq.sorted)
    assert(t1.toSet === (1L to 64L).map(bucketOf(_, n)).toSet)
    val t2 = UpsertStream.processBucketedBatch(
      changes((7L, "u", 2L, false), (9L, "u", 2L, false)),
      snap, Seq("k"), "seq", n)
    assert(t2.toSet === Set(bucketOf(7L, n), bucketOf(9L, n)))
    // an empty batch touches nothing
    assert(UpsertStream.processBucketedBatch(
      changes().limit(0), snap, Seq("k"), "seq", n).isEmpty)
  }

  test("a drifted bucket spec is refused, matching spec accepted") {
    val tmp = Files.createTempDirectory("graft_bupspec_").toFile
    val snap = s"$tmp/snap"
    UpsertStream.processBucketedBatch(
      changes((1L, "a", 1L, false)), snap, Seq("k"), "seq", nBuckets = 8)
    assert(new File(snap, UpsertStream.BucketSpecFile).exists())
    // same spec: fine
    UpsertStream.processBucketedBatch(
      changes((2L, "b", 1L, false)), snap, Seq("k"), "seq", nBuckets = 8)
    // different nBuckets: delta keys would hash into foreign buckets
    val e1 = intercept[IllegalArgumentException] {
      UpsertStream.processBucketedBatch(
        changes((3L, "c", 2L, false)), snap, Seq("k"), "seq", nBuckets = 16)
    }
    assert(e1.getMessage.contains("bucket spec mismatch"))
    // different key list: same failure mode
    val e2 = intercept[IllegalArgumentException] {
      UpsertStream.processBucketedBatch(
        changes((3L, "c", 2L, false)).withColumnRenamed("k", "k2"),
        snap, Seq("k2"), "seq", nBuckets = 8)
    }
    assert(e2.getMessage.contains("bucket spec mismatch"))
    // the refused batches left the snapshot untouched
    assert(snapRows(snap).map(_._1) === Set(1L, 2L))
  }

  test("runBucketed writes a per-batch touched-bucket audit") {
    val tmp = Files.createTempDirectory("graft_bupaudit_").toFile
    val in = new File(tmp, "in"); in.mkdirs()
    var modT = System.currentTimeMillis() - 60000
    def write(name: String, lines: String*): Unit = {
      val f = new File(in, name)
      Files.writeString(f.toPath, lines.mkString("\n"))
      modT += 5000; assert(f.setLastModified(modT))
    }
    write("b0.ndjson",
      """{"k":1,"v":"a","seq":1}""", """{"k":2,"v":"b","seq":1}""")
    write("b1.ndjson", """{"k":1,"v":"a2","seq":2}""")
    UpsertStream.runBucketed(spark, in.getAbsolutePath, schema,
      s"$tmp/snap", s"$tmp/ckpt", keys = Seq("k"), orderingCol = "seq",
      nBuckets = 4, maxFilesPerTrigger = Some(1))
    // glob to the files themselves: the underscore-prefixed DIR is hidden
    // to listing, but explicitly-globbed batch-*.json files are not
    val audit = spark.read.json(s"$tmp/snap/_audit/batch-*.json")
      .select("batch_id", "n_touched")
      .as[(Long, Long)].collect().toMap
    assert(audit.keySet === Set(0L, 1L))
    assert(audit(0L) === Set(bucketOf(1L, 4), bucketOf(2L, 4)).size.toLong)
    assert(audit(1L) === 1L)
  }

  test("a reader racing a crashed mid-swap batch sees the OLD complete snapshot") {
    val tmp = Files.createTempDirectory("graft_bupiso_").toFile
    val snap = s"$tmp/snap"
    val n = 4
    UpsertStream.processBucketedBatch(
      changes((1L to 20L).map(k => (k, s"v$k", 1L, false)): _*),
      snap, Seq("k"), "seq", nBuckets = n)
    val before = snapRows(snap)
    // simulate a batch that crashed mid-swap: it STAGED a new generation
    // under the victim bucket (step 3 of the commit protocol) and left
    // its partitioned-write staging dir behind, but never committed the
    // manifest (step 4). Under the pre-manifest protocol this was the
    // window where the victim bucket vanished for concurrent readers.
    val victim = bucketOf(3L, n)
    val bname = s"${UpsertStream.BucketCol}=$victim"
    Seq((3L, "uncommitted", 99L)).toDF("k", "v", "seq")
      .write.parquet(s"$snap/$bname/g00000002")
    Seq((3L, "junk", 99L)).toDF("k", "v", "seq")
      .write.parquet(s"$snap/_staging/$bname")
    // THE isolation contract: a reader resolving the snapshot now sees
    // the previous COMPLETE snapshot — every key of the victim bucket
    // present with its committed value, the crashed write invisible
    assert(snapRows(snap) === before,
      "reader in the crash window must see the old complete snapshot")
    // the interrupted batch replays whole (checkpoint never committed):
    // recovery sweeps the uncommitted generation + staging, then re-merges
    UpsertStream.processBucketedBatch(
      changes((3L, "updated", 2L, false)), snap, Seq("k"), "seq", n)
    val after = snapRows(snap)
    assert(after.map(_._1) === before.map(_._1))
    assert(after.find(_._1 == 3L).get._2 === "updated")
    (before.map(_._1) - 3L).foreach { k =>
      assert(after.find(_._1 == k).get === before.find(_._1 == k).get)
    }
    assert(!new File(snap, "_staging").exists(),
      "recovery must sweep the crashed staging dir")
    // steady state: exactly one committed generation per bucket dir
    new File(snap).listFiles()
      .filter(_.getName.startsWith(s"${UpsertStream.BucketCol}="))
      .foreach { d =>
        assert(d.listFiles().count(_.isDirectory) === 1,
          s"${d.getName} must hold exactly one live generation, " +
            s"found ${d.listFiles().map(_.getName).mkString(",")}")
      }
  }

  test("gate read (dropBucket=false) resolves through the manifest, not the listing") {
    val tmp = Files.createTempDirectory("graft_bupgate_").toFile
    val snap = s"$tmp/snap"
    val n = 4
    UpsertStream.processBucketedBatch(
      changes((1L to 20L).map(k => (k, s"v$k", 1L, false)): _*),
      snap, Seq("k"), "seq", nBuckets = n)
    def gateRows: Set[(Long, String, Long, Int)] =
      UpsertStream.currentBucketed(spark, snap, dropBucket = false).get
        .select(col("k"), col("v"), col("seq"),
          col(UpsertStream.BucketCol).cast("int"))
        .as[(Long, String, Long, Int)].collect().toSet
    val before = gateRows
    // physical bucket column must match the hash assignment
    before.foreach { case (k, _, _, b) => assert(b === bucketOf(k, n)) }
    // crash between manifest-commit and sweep: an UNREFERENCED generation
    // sits on disk under a live bucket. A flat directory read would
    // double-count it; the manifest-resolved gate read must not.
    val victim = bucketOf(3L, n)
    Seq((3L, "garbage", 99L)).toDF("k", "v", "seq")
      .write.parquet(s"$snap/${UpsertStream.BucketCol}=$victim/g99999999")
    assert(spark.read.parquet(snap).count() > before.size.toLong,
      "planted generation must be visible to a flat read (else the test is vacuous)")
    assert(gateRows === before,
      "gate read saw an unreferenced generation — digest would drift on a crash")
  }

  test("the manifest commit is the read transition: versions advance, old ones pruned") {
    val tmp = Files.createTempDirectory("graft_bupman_").toFile
    val snap = s"$tmp/snap"
    def versionsOnDisk: Seq[String] =
      new File(snap, UpsertStream.ManifestDir).listFiles()
        .map(_.getName).filter(_.startsWith("v")).sorted.toSeq
    (1 to 5).foreach { i =>
      UpsertStream.processBucketedBatch(
        changes((1L, s"v$i", i.toLong, false)), snap, Seq("k"), "seq", 4)
    }
    // five commits, retention keeps the latest 3
    assert(versionsOnDisk === Seq("v00000003", "v00000004", "v00000005"))
    assert(snapRows(snap) === Set((1L, "v5", 5L)))
    // a fully-tombstoned snapshot commits an empty manifest: readers get
    // None, not a stale row set
    UpsertStream.processBucketedBatch(
      changes((1L, "", 6L, true)), snap, Seq("k"), "seq", 4)
    assert(UpsertStream.currentBucketed(spark, snap).isEmpty)
    assert(versionsOnDisk.last === "v00000006")
  }

  test("a pre-manifest flat snapshot is adopted: renames only, rows preserved") {
    val tmp = Files.createTempDirectory("graft_bupadopt_").toFile
    val snap = s"$tmp/snap"
    val n = 4
    // fabricate the legacy layout: parquet files DIRECTLY under each
    // __bucket=K dir (what the pre-manifest protocol wrote) + its spec
    changes((1L to 12L).map(k => (k, s"old$k", 1L, false)): _*)
      .drop(UpsertStream.DeleteCol)
      .withColumn(UpsertStream.BucketCol,
        pmod(xxhash64(col("k")), lit(n.toLong)).cast("int"))
      .repartition(col(UpsertStream.BucketCol))
      .write.partitionBy(UpsertStream.BucketCol).parquet(snap)
    Files.writeString(new File(snap, UpsertStream.BucketSpecFile).toPath,
      s"nBuckets=$n;keys=k\n")
    // legacy fallback read works before any batch runs
    assert(snapRows(snap).size === 12)
    // simulate a CRASHED prior adoption: one bucket already wrapped into
    // its gadopt generation (distinct name — with no manifest, gadopt can
    // only be adoption output, never sweepable batch staging). The re-run
    // must finish the others and commit over ALL of them, losing nothing.
    val firstBucket = new File(snap).listFiles()
      .filter(_.getName.startsWith(s"${UpsertStream.BucketCol}="))
      .minBy(_.getName)
    val gdir = new File(firstBucket, "gadopt"); gdir.mkdirs()
    firstBucket.listFiles().filter(_.isFile).foreach(f =>
      assert(f.renameTo(new File(gdir, f.getName))))
    // first batch under the manifest protocol adopts, then merges
    UpsertStream.processBucketedBatch(
      changes((3L, "updated", 2L, false)), snap, Seq("k"), "seq", n)
    val rows = snapRows(snap)
    assert(rows.size === 12)
    assert(rows.find(_._1 == 3L).get._2 === "updated")
    assert(rows.find(_._1 == 4L).get._2 === "old4")
    assert(new File(snap, UpsertStream.ManifestDir).exists())
    // every bucket dir now holds generation dirs only, no flat files
    new File(snap).listFiles()
      .filter(_.getName.startsWith(s"${UpsertStream.BucketCol}="))
      .foreach { d =>
        assert(d.listFiles().forall(_.isDirectory),
          s"${d.getName} still holds flat legacy files")
      }
  }

  test("tombstoning a whole bucket sweeps its partition dir") {
    val tmp = Files.createTempDirectory("graft_bupsweep_").toFile
    val snap = s"$tmp/snap"
    val n = 4
    val keys = 1L to 40L
    UpsertStream.processBucketedBatch(
      changes(keys.map(k => (k, s"v$k", 1L, false)): _*),
      snap, Seq("k"), "seq", nBuckets = n)
    val victim = bucketOf(1L, n)
    val victims = keys.filter(k => bucketOf(k, n) == victim)
    UpsertStream.processBucketedBatch(
      changes(victims.map(k => (k, "", 2L, true)): _*),
      snap, Seq("k"), "seq", n)
    // dynamic overwrite writes no rows for the emptied bucket — the sweep
    // must remove the stale dir, or deleted rows resurrect on read
    assert(!new File(snap, s"${UpsertStream.BucketCol}=$victim").exists(),
      "emptied bucket dir must be swept")
    assert(snapRows(snap).map(_._1) === keys.toSet -- victims)
  }
}
