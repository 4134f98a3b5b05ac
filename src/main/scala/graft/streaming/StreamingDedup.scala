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

  /** Streaming NEAR-duplicate dedup — the streaming twin of
    * `Dedup.dedupNear`, at candidate level: a document is kept iff NONE of
    * its MinHash-LSH band keys was claimed by an earlier document within the
    * watermark. Emits (id, window_start) rows for the kept documents once
    * the watermark passes their window.
    *
    * Semantics vs batch: the batch operator verifies candidates with exact
    * Jaccard; a stream cannot re-join shingle sets against an unbounded
    * history, so this drops on band COLLISION alone — precision < 1 by
    * design (an unlucky band collision drops a non-duplicate), recall
    * follows the same 1-(1-s^r)^b LSH curve, and identical/near-identical
    * docs are always caught. The spec checks exact parity against a
    * sequential replay of the same policy.
    *
    * Scale/state design:
    *  - the signature is MAP-ONLY (`Dedup.rowMinhashSig` — a scalar
    *    projection, no blocking aggregate), so rows flow straight to the
    *    dedup operator;
    *  - state is one entry per (band, bucket) seen within the watermark —
    *    `dropDuplicatesWithinWatermark` ages them out;
    *  - the "claimed ALL `bands` of its keys" vote is a watermarked window
    *    aggregate (Spark's multiple-stateful-operator pipeline), emitting
    *    exactly-once per document in append mode.
    */
  def dedupNearStream(docs: DataFrame, tsCol: String, idCol: String,
                      textCol: String, watermark: String,
                      n: Int = 3, k: Int = 64, bands: Int = 16,
                      windowDur: String = "10 seconds"): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    import graft.operators.{Dedup, TextOps}
    val toked = docs.withColumn("toks", TextOps.tokens(col(textCol)))
    val sets = toked
      .filter(size(col("toks")) >= n)
      .withColumn("shingles", TextOps.wordShinglesFromTokens(col("toks"), n))
      .withColumn("sig", Dedup.rowMinhashSig(col("shingles"), k))
    val bandRows = sets.select(col(idCol), col(tsCol),
      posexplode(Dedup.bandKeys(col("sig"), k, bands)))
      .toDF(idCol, tsCol, "band", "bh")
    val claims = bandRows
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("band", "bh")
    val voted = claims
      .groupBy(window(col(tsCol), windowDur), col(idCol))
      .agg(count(lit(1)).as("n_claimed"))
      .filter(col("n_claimed") === bands)
      .select(col(idCol), col("window.start").as("w_start"))
    // docs too short to shingle can't near-dup — the batch twin keeps them
    // (they produce no pairs and survive the anti join), so the stream does
    // too: a stateless map-only branch, emitted immediately
    val short = toked.filter(size(col("toks")) < n)
      .select(col(idCol), window(col(tsCol), windowDur).getField("start").as("w_start"))
    voted.unionByName(short)
  }
}
