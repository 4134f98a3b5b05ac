package graft.streaming

import graft.SparkSpecBase
import graft.operators.Sessions
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingSessionsSpec extends SparkSpecBase {
  import StreamingSessions._

  test("streaming sessionization matches the batch operator on closed sessions") {
    implicit val s = spark
    import spark.implicits._

    val events = graft.Tables.events(spark, sf("sf0.001"))
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[Event].collect().toSeq

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // two micro-batches split mid-stream (per-user order preserved by sort inside the op)
    val (b1, b2) = events.sortBy(e => (e.ts.getTime, e.event_id)).splitAt(events.size / 2)
    val gap = 1800000000L // 30 min

    val q = sessionizeStream(mem.toDS(), gap)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    // sentinels far past the watermark: the event-time timeout then flushes
    // every still-open session (two batches — the watermark advances at
    // batch end, timeouts fire in the NEXT batch)
    val maxMs = events.map(_.ts.getTime).max
    mem.addData(Event(999999L, new java.sql.Timestamp(maxMs + 86400000L), 1L))
    q.processAllAvailable()
    mem.addData(Event(999998L, new java.sql.Timestamp(maxMs + 2 * 86400000L), 1L))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sess_out")
      .select("user_id", "session_id", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._1 < 999000L).toSet

    val batch = Sessions.sessionStats(
      graft.Tables.events(spark, sf("sf0.001")),
      "user_id", "ts", "event_id", gap)
      .select("user_id", "session_id", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // closed sessions emit on the closing event, open ones on event-time
    // timeout — with the watermark advanced past everything, streaming
    // matches the batch operator EXACTLY
    assert(streamed == batch,
      s"missing=${(batch -- streamed).take(5)} extra=${(streamed -- batch).take(5)}")
  }

  test("watermarked windowed aggregation runs over a stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val df = mem.toDF().toDF("ts", "event_type")
    val q = StreamingSessions.windowedCounts(df, "ts", "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    mem.addData(
      (java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), "click"),
      (java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), "click"),
      (java.sql.Timestamp.valueOf("2024-01-01 00:15:00"), "view"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("win_out").collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum == 3)
    assert(rows.length == 2) // two windows
  }
}
