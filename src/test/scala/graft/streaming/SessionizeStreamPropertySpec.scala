package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files
import scala.util.Random

/** Randomized reference for streaming gap-sessionization (completing the
  * property-fold trio with DedupStreamPropertySpec and
  * BucketedUpsertPropertySpec): across seeded random event streams sliced
  * into time-ordered micro-batches — the regime where the event-time
  * timeout rule provably equals the batch gap rule (q149's argument: with
  * a 0-second watermark, an in-gap successor lives in a later slice, so
  * the watermark cannot have passed last+gap) — the streamed sessions
  * must equal a plain-Scala gap fold of the same events.
  */
class SessionizeStreamPropertySpec extends SparkSpec {
  import spark.implicits._

  private def referenceFold(events: Seq[(Long, Long)],
                            gapMs: Long): Set[(Long, Long, Long, Long)] =
    events.groupBy(_._1).flatMap { case (u, evs) =>
      val ts = evs.map(_._2).sorted
      val sessions = ts.tail.foldLeft(Vector(Vector(ts.head))) { (acc, t) =>
        if (t - acc.last.last <= gapMs) acc.init :+ (acc.last :+ t)
        else acc :+ Vector(t)
      }
      sessions.map(s => (u, s.head, s.last, s.size.toLong))
    }.toSet

  test("streamed sessions equal the plain-Scala gap fold, 4 seeds") {
    for (seed <- 1 to 4) {
      val rnd = new Random(seed)
      val gapMs = 1000L
      // whole-ms timestamps (ns = ms * 1e6) so the engine's ns -> us ->
      // Timestamp path is exact; spans chosen so sessions genuinely split
      val events = (0 until 200).map { _ =>
        (rnd.nextInt(8).toLong, 1_000_000L + rnd.nextInt(30) * 400L)
      }
      val expect = referenceFold(events, gapMs)
      assert(expect.size > events.map(_._1).distinct.size,
        s"seed=$seed produced no session splits — widen the time span")

      val root = Files.createTempDirectory(s"graft_ssfz_$seed").toString
      val in = s"$root/in"
      Files.createDirectories(java.nio.file.Paths.get(in))
      val fs = new org.apache.hadoop.fs.Path(in)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val (mn, mx) = (events.map(_._2).min, events.map(_._2).max)
      val span = mx - mn + 1
      // 3 time-ordered slices + the far-future sentinel that advances the
      // watermark past every open session's last + gap (q149's convention)
      val slices = (0 until 3).map { i =>
        events.filter { case (_, t) =>
          t >= mn + span / 3 * i && (t < mn + span / 3 * (i + 1) || i == 2) }
      } :+ Seq((-1L, mx + 10 * gapMs))
      slices.zipWithIndex.foreach { case (rows, i) =>
        val lines = rows.map { case (u, ms) =>
          s"""{"user_id":$u,"ts":${ms * 1000000L}}""" }
        Files.write(java.nio.file.Paths.get(in, s"b$i.json"),
          lines.mkString("\n").getBytes("UTF-8"))
        fs.setTimes(new org.apache.hadoop.fs.Path(s"$in/b$i.json"),
          1000000L * (i + 1), -1)
      }
      SessionizeStream.run(spark, in,
        StructType(Seq(StructField("user_id", LongType),
          StructField("ts", LongType))),
        s"$root/out", s"$root/ckpt", gapMs = gapMs)
      val got = spark.read.parquet(s"$root/out")
        .where(col("user_id") >= 0)
        .select(col("user_id"), unix_millis(col("session_start")),
          unix_millis(col("session_end")), col("n_events"))
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got === expect, s"seed=$seed")
    }
  }
}
