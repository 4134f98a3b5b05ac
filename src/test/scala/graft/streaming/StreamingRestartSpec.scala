package graft.streaming

import java.sql.Timestamp
import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

case class RDoc(doc_id: Long, ts: Timestamp, text: String)
case class RVec(vec_id: Long, ts: Timestamp, emb: Array[Double])

/** Dedup STATE survives a query restart: the claims live in the state
  * store, so a duplicate arriving after stop/recover must still be caught.
  * (OdpSpec/GraphDeltaSpec cover SOURCE offset recovery; this covers the
  * stateful-operator side for the dedup tiers — a restart that silently
  * reset dedup state would re-admit every duplicate after a crash.) */
class StreamingRestartSpec extends SparkSpecBase {
  import spark.implicits._

  private val base = 1700000000000L

  test("exact-dedup claims survive a checkpointed restart") {
    val dir = java.nio.file.Files.createTempDirectory("graft-restart-").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RDoc]
    def start() = StreamingDedup.dedupExactStream(mem.toDF(), "ts", "text", "10 minutes")
      .writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    val q1 = start()
    mem.addData(RDoc(1L, new Timestamp(base), "the only content"))
    q1.processAllAvailable(); q1.stop()

    val q2 = start()
    mem.addData(RDoc(2L, new Timestamp(base + 5000L), "the only content"), // dup ACROSS restart
      RDoc(3L, new Timestamp(base + 5000L), "fresh content here"))
    q2.processAllAvailable(); q2.stop()

    val kept = spark.read.parquet(s"$dir/out").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L), s"post-restart dup must stay dropped: $kept")
  }

  test("semdedup cell state survives a checkpointed restart") {
    val dir = java.nio.file.Files.createTempDirectory("graft-restart-").toString
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RVec]
    def start() = StreamingSemDedup.semDedupStream(mem.toDF(), "ts", "vec_id", "emb",
        cents, watermarkDelayMs = 600000L, minSim = 0.99)
      .writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    val q1 = start()
    mem.addData(RVec(1L, new Timestamp(base), Array(1.0, 0.0)))
    q1.processAllAvailable(); q1.stop()

    val q2 = start()
    mem.addData(RVec(2L, new Timestamp(base + 5000L), Array(1.0, 0.0)), // clone ACROSS restart
      RVec(3L, new Timestamp(base + 5000L), Array(0.0, 1.0)))
    q2.processAllAvailable(); q2.stop()

    val got = spark.read.parquet(s"$dir/out")
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(2), r.getLong(3)))).toMap
    assert(got(1L) == ((false, -1L)))
    assert(got(2L) == ((true, 1L)), s"recovered state must catch the clone: $got")
    assert(got(3L) == ((false, -1L)))
  }
}
