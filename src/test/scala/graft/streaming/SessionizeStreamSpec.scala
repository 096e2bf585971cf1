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
}
