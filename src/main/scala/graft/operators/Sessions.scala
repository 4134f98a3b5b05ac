package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream (the batch analog of a
  * streaming session window; see graft.streaming for the readStream path).
  * One shuffle on the user key, one sort — scales like any window agg.
  */
object Sessions {

  /** Assigns 1-based `session_id` per user: a new session starts when the gap
    * since the previous event exceeds `gapMicros`. `tieBreak` makes the
    * within-timestamp order (and so the boundary placement) deterministic. */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 tieBreak: String, gapMicros: Long): DataFrame = {
    val order = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieBreak))
    val cum = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__prev", lag(unix_micros(col(tsCol)), 1).over(order))
      .withColumn("__new",
        when(col("__prev").isNull ||
          unix_micros(col(tsCol)) - col("__prev") > gapMicros, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(cum))
      .drop("__prev", "__new")
  }

  /** Per-session stats: event count, span, bounds. */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
                   tieBreak: String, gapMicros: Long): DataFrame =
    sessionize(events, userCol, tsCol, tieBreak, gapMicros)
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("t_start"),
        max(col(tsCol)).as("t_end"))
}
