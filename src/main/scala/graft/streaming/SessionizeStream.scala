package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Custom streaming state: gap-based sessionization with
  * `flatMapGroupsWithState` — the `KeyValueGroupedDataset` path for
  * semantics windowed aggregation can't express (a session closes when a
  * user goes quiet, not on a fixed grid).
  *
  * State per user is one open session (start, last-seen, count); event-time
  * timeout fires once the watermark passes lastTs + gap, emitting the closed
  * session and clearing state — so state size is O(active users), bounded at
  * any scale, and sessions are exactly-once under checkpointing.
  */
object SessionizeStream {

  final case class Event(user_id: Long, event_time: java.sql.Timestamp)
  final case class OpenSession(start: Long, last: Long, n: Long)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long)

  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("event_time", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[OpenSession]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          if (state.hasTimedOut) {
            val s = state.get
            out += Session(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.n)
            state.remove()
          } else {
            val times = batch.map(_.event_time.getTime).toArray.sorted
            var cur = state.getOption.orNull
            times.foreach { t =>
              cur match {
                case null => cur = OpenSession(t, t, 1)
                case OpenSession(st, last, n) if t - last <= gapMs =>
                  cur = OpenSession(st, math.max(last, t), n + 1)
                case OpenSession(st, last, n) => // gap exceeded: close, open new
                  out += Session(userId, new java.sql.Timestamp(st),
                    new java.sql.Timestamp(last), n)
                  cur = OpenSession(t, t, 1)
              }
            }
            if (cur != null) {
              state.update(cur)
              // close the open session once the watermark passes last + gap;
              // clamped above the current watermark — a late event (older than
              // watermark - gap) would otherwise put the timeout at/behind the
              // watermark, which Spark rejects and the query dies
              state.setTimeoutTimestamp(
                math.max(cur.last + gapMs, state.getCurrentWatermarkMs() + 1))
            }
          }
          out.iterator
      }
  }

  /** File-source driver mirroring the batch sessionize query: NDJSON events
    * (`ts` in ns) → per-user gap sessions → parquet, AvailableNow.
    */
  def run(spark: SparkSession, inputDir: String, schema: StructType,
          outputDir: String, checkpointDir: String, gapMs: Long,
          maxFilesPerTrigger: Int = 1): Unit = {
    import spark.implicits._
    val events = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).json(inputDir)
      .select(col("user_id"), expr("timestamp_micros(ts DIV 1000)").as("event_time"))
      .as[Event]
    val q = sessionize(events, gapMs).writeStream
      .format("parquet")
      .option("path", outputDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
