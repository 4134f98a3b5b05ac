package graft.functions

import graft.SparkSpecBase
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class SimHashSketchSpec extends SparkSpecBase {
  import spark.implicits._

  test("sketch signature equals an independently computed vote signature") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select("doc_id", "text").limit(20)
    val viaSketch = Dedup.simhashSigTable(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent relational shape: explicit ±1 votes per bit, sign packing
    val posts = docs
      .select(col("doc_id").as("id"), explode(array_distinct(split(trim(col("text")), "\\s+"))).as("tok"))
      .select(col("id"), Dedup.mdHash60(col("tok")).as("f"))
    val votes = (0 until 60).map { j =>
      sum(shiftrightunsigned(col("f"), j).bitwiseAND(lit(1L)) * 2 - 1).as(s"v$j")
    }
    val viaVotes = posts.groupBy("id").agg(votes.head, votes.tail: _*)
      .select(col("id"),
        (0 until 60).map(j => when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSketch.keySet == viaVotes.keySet)
    viaVotes.foreach { case (id, sig) =>
      assert(viaSketch(id) == sig, s"doc $id sketch != vote signature")
    }
  }

  test("sketch is merge-invariant: same result under any partitioning") {
    val df = (1 to 1000).map(i => (i % 7, (i * 2654435761L) & ((1L << 60) - 1))).toDF("g", "f")
    def run(parts: Int) = {
      df.repartition(parts).createOrReplaceTempView("sh_m")
      spark.sql("SELECT g, simhash_sketch(f) AS s FROM sh_m GROUP BY g")
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    }
    assert(run(1) == run(13))
  }

  test("near-identical docs land within small Hamming distance, disjoint docs far") {
    def sig(rows: Seq[(Long, String)]): Map[Long, Long] =
      Dedup.simhashSigTable(rows.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = (1 to 200).map(i => s"w$i").mkString(" ")
    val near = (1 to 200).map(i => if (i == 7) "CHANGED" else s"w$i").mkString(" ")
    val far = (1000 to 1200).map(i => s"z$i").mkString(" ")
    val s = sig(Seq((1L, base), (2L, near), (3L, far)))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(s(1L), s(2L)) <= 6, s"near pair hamming ${ham(s(1L), s(2L))}")
    assert(ham(s(1L), s(3L)) > 10, s"far pair hamming ${ham(s(1L), s(3L))}")
  }
}
