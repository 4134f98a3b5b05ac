package graft.streaming

import java.sql.Timestamp
import graft.SparkSpecBase
import graft.operators.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

case class Vec(vec_id: Long, ts: Timestamp, emb: Array[Double])

class StreamingSemDedupSpec extends SparkSpecBase {

  private val base = 1700000000000L

  /** Sequential replay of the documented policy — the ground truth the
    * stream must match exactly: (ts, id) order, per-cell survivor store
    * with event-time expiry, duplicates never claim state. */
  private def replay(fed: Seq[Vec], cellOf: Map[Long, Int], delayMs: Long,
                     minSim: Double, maxPerCell: Int): Set[Long] = {
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    val store = scala.collection.mutable.Map[Int, List[(Long, Long, Array[Double])]]()
    val kept = scala.collection.mutable.Set[Long]()
    fed.sortBy(r => (r.ts.getTime, r.vec_id)).foreach { r =>
      val cell = cellOf(r.vec_id)
      val tsMs = r.ts.getTime
      val u = unit(r.emb)
      var live = store.getOrElse(cell, Nil).filter(e => e._2 + delayMs >= tsMs)
      val dup = live.exists(e =>
        e._1 != r.vec_id && StreamingSemDedup.dotArr(e._3, u) >= minSim)
      if (!dup) {
        kept += r.vec_id
        if (live.size < maxPerCell) live = live :+ ((r.vec_id, tsMs, u))
      }
      store(cell) = live
    }
    kept.toSet
  }

  test("streaming semdedup: clones drop against the stored survivor, re-enter after expiry") {
    import spark.implicits._
    val e1 = Array(1.0, 0.0, 0.0, 0.0)
    val e2 = Array(0.0, 1.0, 0.0, 0.0)
    val cents = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Vec]
    val out = StreamingSemDedup.semDedupStream(mem.toDF(), "ts", "vec_id", "emb",
      cents, watermarkDelayMs = 10000L, minSim = 0.99)
    val q = out.writeStream.format("memory").queryName("semdd_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(
      Vec(1L, new Timestamp(base), e1),
      Vec(2L, new Timestamp(base + 1000L), e1),   // clone, same batch -> dup of 1
      Vec(3L, new Timestamp(base + 1000L), e2))   // different cell -> kept
    q.processAllAvailable()
    mem.addData(Vec(4L, new Timestamp(base + 5000L), e1)) // cross-batch clone -> dup of 1
    q.processAllAvailable()
    // 25s later: survivor 1's entry (base) is PAST expiry at this row's own
    // event time -> the clone re-enters (the documented watermark trade)
    mem.addData(Vec(5L, new Timestamp(base + 25000L), e1))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("semdd_out")
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(2), r.getLong(3)))).toMap
    assert(got(1L) == ((false, -1L)))
    assert(got(2L) == ((true, 1L)))
    assert(got(3L) == ((false, -1L)))
    assert(got(4L) == ((true, 1L)))
    assert(got(5L) == ((false, -1L)), "post-expiry clone must re-enter")
  }

  test("streaming semdedup: exact parity with the sequential replay on real embeddings") {
    import spark.implicits._
    val corpus = graft.Tables.embeddings(spark, sf("sf0.001"))
    val cents = Similarity.centroidsFor(corpus, "vec_id", "embedding", 8)
    val originals = corpus.select(col("vec_id"),
        Similarity.toDoubleVec(col("embedding")).as("v")).collect()
      .map(r => Vec(r.getLong(0),
        new Timestamp(base + r.getLong(0) * 100L),
        r.getSeq[Double](1).toArray)).sortBy(_.vec_id).toSeq
    // inject clones of the first 10 vectors, arriving shortly after
    val clones = originals.take(10).map(v =>
      v.copy(vec_id = v.vec_id + 100000L,
        ts = new Timestamp(v.ts.getTime + 3000L)))
    val fed = originals ++ clones

    // cell assignment ground truth from the same expression the stream uses
    val cellOf = fed.map(v => (v.vec_id, v.emb)).toDF("vec_id", "emb")
      .select(col("vec_id"), Similarity.cellAssign(col("emb"), cents).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Vec]
    val out = StreamingSemDedup.semDedupStream(mem.toDF(), "ts", "vec_id", "emb",
      cents, watermarkDelayMs = 60000L, minSim = 0.95)
    val q = out.writeStream.format("memory").queryName("semdd_parity")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    val (b1, b2) = originals.splitAt(originals.size / 2)
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData((b2 ++ clones): _*); q.processAllAvailable()
    q.stop()

    val kept = spark.table("semdd_parity").filter(!col("is_dup"))
      .select("id").collect().map(_.getLong(0)).toSet
    val expected = replay(fed, cellOf, 60000L, 0.95, 1024)
    assert(kept == expected,
      s"missing=${(expected -- kept).take(5)} extra=${(kept -- expected).take(5)}")
    // every clone must be flagged (identical vector, same cell, in time)
    val dups = spark.table("semdd_parity").filter(col("is_dup"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(clones.map(_.vec_id).toSet.subsetOf(dups))
  }

  test("maxPerCell cap: beyond the cap survivors are emitted but not stored") {
    import spark.implicits._
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    // 3 distinct directions in cell 0, cap 2: the third is kept but not
    // stored, so a LATER clone of it is also kept (policy contract)
    def v(x: Double, y: Double) = Array(x, y)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Vec]
    val out = StreamingSemDedup.semDedupStream(mem.toDF(), "ts", "vec_id", "emb",
      cents, watermarkDelayMs = 60000L, minSim = 0.99, maxPerCell = 2)
    val q = out.writeStream.format("memory").queryName("semdd_cap")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(
      Vec(1L, new Timestamp(base), v(1.0, 0.0)),
      Vec(2L, new Timestamp(base + 1000L), v(0.8, 0.6)),   // cos 0.80 vs 1
      Vec(3L, new Timestamp(base + 2000L), v(0.9, 0.45)),  // cos < 0.99 vs both; kept, NOT stored
      Vec(4L, new Timestamp(base + 3000L), v(0.9, 0.45)))  // clone of 3 -> kept too
    q.processAllAvailable()
    q.stop()
    val got = spark.table("semdd_cap")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got == Map(1L -> false, 2L -> false, 3L -> false, 4L -> false))
  }
}
