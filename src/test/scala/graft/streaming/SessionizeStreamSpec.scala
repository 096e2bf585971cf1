package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.types._

import java.io.File
import java.nio.file.Files

class SessionizeStreamSpec extends SparkSpec {

  test("flatMapGroupsWithState emits gap-closed sessions exactly once") {
    val tmp = Files.createTempDirectory("graft_sess_").toFile
    val in = new File(tmp, "in"); in.mkdirs()
    val t0 = 1704067200000000000L // 2024-01-01T00:00:00 ns
    def ns(minutes: Long) = t0 + minutes * 60L * 1000000000L
    // user 1: events at 0,10min (one session), then 60min (new session)
    // user 2: single event at 5min
    // batch-per-file so the watermark advances between batches and event-time
    // timeouts fire; the last file is a sentinel far in the future.
    // distinct mtimes => deterministic batch order (the file source orders
    // by modification time; equal stamps would make the order arbitrary)
    def write(name: String, content: String, mtime: Long): Unit = {
      val f = new File(in, name)
      Files.writeString(f.toPath, content)
      assert(f.setLastModified(mtime))
    }
    write("a.ndjson",
      s"""{"user_id":1,"ts":${ns(0)}}
         |{"user_id":1,"ts":${ns(10)}}
         |{"user_id":2,"ts":${ns(5)}}""".stripMargin, 1000000L)
    write("b.ndjson", s"""{"user_id":1,"ts":${ns(60)}}""", 2000000L)
    write("c.ndjson", s"""{"user_id":99,"ts":${ns(600)}}""", 3000000L)

    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", LongType)))
    val out = s"$tmp/out"
    SessionizeStream.run(spark, in.getAbsolutePath, schema, out, s"$tmp/ckpt",
      gapMs = 30L * 60 * 1000)

    val sessions = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("session_start").getTime,
        r.getAs[java.sql.Timestamp]("session_end").getTime,
        r.getAs[Long]("n_events"))).toSet
    def ms(minutes: Long) = (t0 / 1000000L) + minutes * 60000L
    // user 1 first session (0-10, 2 events) closes when 60min event arrives
    // in a later batch; user 2's and user 1's second session close via
    // event-time timeout after the sentinel advances the watermark.
    assert(sessions.contains((1L, ms(0), ms(10), 2L)))
    assert(sessions.contains((2L, ms(5), ms(5), 1L)))
    assert(sessions.contains((1L, ms(60), ms(60), 1L)))
  }

  test("an event far behind the watermark does not kill the query") {
    val tmp = Files.createTempDirectory("graft_sess_late_").toFile
    val in = new File(tmp, "in"); in.mkdirs()
    val t0 = 1704067200000000000L
    def ns(minutes: Long) = t0 + minutes * 60L * 1000000000L
    def write(name: String, content: String, mtime: Long): Unit = {
      val f = new File(in, name)
      Files.writeString(f.toPath, content)
      assert(f.setLastModified(mtime))
    }
    // batch 1 pushes the watermark to 120min; batch 2 delivers an event at
    // 1min for a fresh user — lastTs + gap lands far below the watermark, so
    // an unclamped setTimeoutTimestamp would throw and abort the query
    write("a.ndjson", s"""{"user_id":1,"ts":${ns(120)}}""", 1000000L)
    write("b.ndjson", s"""{"user_id":7,"ts":${ns(1)}}""", 2000000L)
    write("c.ndjson", s"""{"user_id":99,"ts":${ns(600)}}""", 3000000L)

    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", LongType)))
    val out = s"$tmp/out"
    SessionizeStream.run(spark, in.getAbsolutePath, schema, out, s"$tmp/ckpt",
      gapMs = 30L * 60 * 1000)
    val sessions = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"))).toSet
    // both the on-time and the late user's sessions close once the sentinel
    // advances the watermark past their (clamped) timeouts
    assert(sessions.contains((1L, 1L)))
    assert(sessions.contains((7L, 1L)))
  }

  test("streaming sessionization agrees with the batch lag-window formulation") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._

    // real event data: sf0.001 events as NDJSON, plus a far-future sentinel
    // so every real session's event-time timeout fires before the stream ends
    val ev = graft.Tables.read(spark, "/root/testdata/sf0.001", "events")
      .select("user_id", "ts")
    val tmp = Files.createTempDirectory("graft_sess_xcheck_").toFile
    val in = new File(tmp, "in"); in.mkdirs()
    val maxTs = ev.agg(max("ts")).head.getLong(0)
    ev.coalesce(1).write.json(s"$tmp/data")
    new File(s"$tmp/data").listFiles.filter(_.getName.endsWith(".json"))
      .foreach { f =>
        val dst = new File(in, "a_" + f.getName)
        Files.copy(f.toPath, dst.toPath); assert(dst.setLastModified(1000000L))
      }
    write2(in, "zz_sentinel.ndjson",
      s"""{"user_id":-1,"ts":${maxTs + 24L * 3600 * 1000000000L}}""", 2000000L)

    val gapMs = 30L * 60 * 1000
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", LongType)))
    SessionizeStream.run(spark, in.getAbsolutePath, schema, s"$tmp/out",
      s"$tmp/ckpt", gapMs, maxFilesPerTrigger = 1000)
    val streamed = spark.read.parquet(s"$tmp/out")
      .where(col("user_id") >= 0)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

    // batch reference — the q28-style lag/gap formulation over the same
    // data at MILLISECOND precision: the stream's gap math runs on
    // java.sql.Timestamp.getTime, which truncates micros to ms
    val w = Window.partitionBy("user_id").orderBy(col("tms").asc)
    val batch = ev.withColumn("tms", expr("ts DIV 1000000"))
      .withColumn("prev_ts", lag("tms", 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("tms") - col("prev_ts") > lit(gapMs), 1L).otherwise(0L))
      .groupBy("user_id")
      .agg(sum("new_session").as("n_sessions"), count(lit(1)).as("n_events"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

    assert(streamed === batch)
  }

  private def write2(dir: File, name: String, content: String, mtime: Long): Unit = {
    val f = new File(dir, name)
    Files.writeString(f.toPath, content)
    assert(f.setLastModified(mtime))
  }
}
