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
    * session, and an EVENT-TIME timeout emits the open session once the
    * watermark passes its close point — so an idle user's final session IS
    * delivered (a NoTimeout version would hold it forever), deterministically
    * (event-time, not wall-clock, so the parity spec can drive it).
    *
    * Event-time caveat (documented divergence from the batch operator): a
    * micro-batch's events are processed in ts order WITHIN the batch, but
    * late events across batches follow at-least-once semantics — the batch
    * operator is the ground truth for bounded data (parity spec runs both
    * over the same input). */
  def sessionizeStream(events: Dataset[Event], gapMicros: Long,
                       watermark: String = "10 minutes")
                      (implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed the open session's close point: flush it.
            // The state becomes a TOMBSTONE (nEvents = 0) keeping the
            // session counter — removing it would restart the user's
            // numbering at 1 and break parity with the batch operator.
            // State is then one small record per user ever seen, the same
            // cardinality the batch operator's groupBy carries.
            val st = state.get
            state.update(st.copy(nEvents = 0L))
            Iterator.single(SessionOut(userId, st.sessionId, st.nEvents,
              new Timestamp(st.startMicros / 1000L), new Timestamp(st.lastTsMicros / 1000L)))
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L, 0L))
            val out = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val tUs = e.ts.getTime * 1000L
              if (st.nEvents == 0L) { // fresh user or flushed tombstone
                st = SessionState(st.sessionId + 1, tUs, 1L, tUs)
              } else if (tUs - st.lastTsMicros > gapMicros) {
                out += SessionOut(userId, st.sessionId, st.nEvents,
                  new Timestamp(st.startMicros / 1000L), new Timestamp(st.lastTsMicros / 1000L))
                st = SessionState(st.sessionId + 1, tUs, 1L, tUs)
              } else {
                st = st.copy(lastTsMicros = tUs, nEvents = st.nEvents + 1)
              }
            }
            state.update(st)
            // wake when the watermark passes session close (must stay above
            // the current watermark or Spark rejects the timestamp)
            if (st.nEvents > 0L)
              state.setTimeoutTimestamp(math.max(state.getCurrentWatermarkMs() + 1,
                st.lastTsMicros / 1000L + gapMicros / 1000L))
            out.result().iterator
          }
      }
  }
}
