package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the streaming twin of
  * `graft.operators.Dedup.dedupExact` (same md5 content fingerprint), for
  * the arrival-ordered ingest case: the FIRST document seen with a given
  * fingerprint is kept, later copies are dropped.
  *
  * Scale design: `dropDuplicatesWithinWatermark` bounds the dedup state —
  * fingerprints older than the watermark age out of the state store, so an
  * unbounded stream never accumulates unbounded state. The trade (exactly
  * the documented Spark semantic) is that a duplicate arriving later than
  * the watermark delay re-enters; the batch operator is the ground truth
  * for bounded data (parity spec runs both over the same input).
  */
object StreamingDedup {

  /** Keep the first-seen document per content fingerprint; state bounded by
    * `watermark` (e.g. "10 minutes"). Adds the `fp` fingerprint column. */
  def dedupExactStream(docs: DataFrame, tsCol: String, textCol: String,
                       watermark: String): DataFrame =
    docs.withColumn("fp", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
}
