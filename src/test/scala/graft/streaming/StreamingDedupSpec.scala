package graft.streaming

import java.sql.Timestamp
import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingDedupSpec extends SparkSpecBase {

  case class Doc(doc_id: Long, ts: Timestamp, text: String)

  test("streaming exact dedup keeps one doc per fingerprint, matching batch distinct") {
    import spark.implicits._

    // documents table with a synthetic arrival time (doc_id order)
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
      .collect().map(r => Doc(r.getLong(0),
        new Timestamp(1700000000000L + r.getLong(0) * 1000L), r.getString(1)))
      .toSeq

    // sf0.001 documents are all distinct — inject exact copies (recopied
    // ids, slightly later arrival within the watermark) to dedup away
    val dups = docs.take(20).map(d =>
      d.copy(doc_id = d.doc_id + 100000L, ts = new Timestamp(d.ts.getTime + 5000L)))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = StreamingDedup.dedupExactStream(mem.toDF(), "ts", "text", "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    val (b1, b2) = docs.splitAt(docs.size / 2)
    mem.addData((b1 ++ dups.take(10)): _*) // 10 dups in the same batch
    q.processAllAvailable()
    mem.addData((b2 ++ dups.drop(10)): _*) // 10 dups across batches
    q.processAllAvailable()
    q.stop()

    val kept = spark.table("dedup_out")
    val batchFps = graft.Tables.documents(spark, sf("sf0.001"))
      .select(md5(col("text")).as("fp")).distinct()
      .collect().map(_.getString(0)).toSet

    // exactly one survivor per distinct fingerprint, covering all of them
    val keptFps = kept.select("fp").collect().map(_.getString(0))
    assert(keptFps.length == keptFps.distinct.length, "duplicate fingerprint kept")
    assert(keptFps.toSet == batchFps,
      s"${keptFps.length} kept vs ${batchFps.size} distinct fingerprints")
    // all 20 injected duplicates were dropped
    assert(keptFps.length == docs.size)
  }
}
