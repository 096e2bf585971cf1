package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files
import scala.util.Random

/** Randomized reference for the bucketed CDC path: across seeded random
  * change logs (inserts, updates, tombstones, tombstone-then-reinsert,
  * in-batch duplicate keys), the bucketed snapshot after every batch must
  * equal a plain-Scala latest-wins fold of the same change stream — the
  * SftPropertySpec convention of judging an operator against an
  * independent reference implementation rather than against itself.
  * Replays of random batches (crash-retry) are interleaved and must be
  * no-ops.
  */
class BucketedUpsertPropertySpec extends SparkSpec {
  import spark.implicits._

  private def referenceFold(
      batches: Seq[Seq[(Long, String, Long, Boolean)]]): Map[Long, (String, Long)] = {
    // per batch: latest change per key wins (ties to the LAST by seq —
    // within a batch DedupLatest orders by seq desc, and equal seqs are
    // resolved by the window's arbitrary-but-single winner, so the
    // generator below never emits equal (key, seq) pairs in one batch);
    // across batches: a winner applies only against an older-or-equal
    // standing row (the symmetric staleness guard)
    var snap = Map.empty[Long, (String, Long)]
    batches.foreach { b =>
      val winners = b.groupBy(_._1).map { case (k, rows) =>
        rows.maxBy(_._3)
      }
      winners.foreach { case (k, v, seq, del) =>
        snap.get(k) match {
          case Some((_, standing)) if standing > seq => () // stale change
          case _ => if (del) snap -= k else snap += k -> (v, seq)
        }
      }
    }
    snap
  }

  test("bucketed snapshots equal a plain-Scala latest-wins fold, 6 seeds") {
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      val tmp = Files.createTempDirectory(s"graft_bupfz_$seed").toFile
      val snap = s"$tmp/snap"
      val nBuckets = 1 + rnd.nextInt(7)
      val keySpace = 1 + rnd.nextInt(40)
      // strictly increasing seq across the whole log: no equal (key, seq)
      // ambiguity, the reference stays total
      var seq = 0L
      val batches = (0 until 4).map { _ =>
        (0 until (3 + rnd.nextInt(12))).map { _ =>
          seq += 1
          val k = 1L + rnd.nextInt(keySpace)
          val del = rnd.nextDouble() < 0.25
          (k, if (del) "" else s"v$seq", seq, del)
        }
      }
      var applied = Seq.empty[Seq[(Long, String, Long, Boolean)]]
      batches.foreach { b =>
        val df = b.toDF("k", "v", "seq", UpsertStream.DeleteCol)
        UpsertStream.processBucketedBatch(df, snap, Seq("k"), "seq", nBuckets)
        if (rnd.nextDouble() < 0.34) // crash-retry replay: must be a no-op
          UpsertStream.processBucketedBatch(df, snap, Seq("k"), "seq", nBuckets)
        applied :+= b
        val expect = referenceFold(applied)
        val got = UpsertStream.currentBucketed(spark, snap)
          .map(_.select("k", "v", "seq").as[(Long, String, Long)]
            .collect().map(t => t._1 -> (t._2, t._3)).toMap)
          .getOrElse(Map.empty)
        assert(got === expect,
          s"seed=$seed nBuckets=$nBuckets after ${applied.size} batches")
      }
    }
  }
}
