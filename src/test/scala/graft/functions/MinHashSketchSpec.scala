package graft.functions

import graft.SparkSpecBase
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class MinHashSketchSpec extends SparkSpecBase {
  import spark.implicits._

  test("sketch signature equals the relational-aggregation signature") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select("doc_id", "text").limit(20)
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 3)
    val viaTable = Dedup.minhashSigTable(sets, 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // sketch aggregate over the exploded postings (SQL surface). The table
    // path pre-hashes shingles with mdHash31 (LONG input contract of
    // MinHashSketchAgg), so the spec must feed the same fingerprints.
    sets.select(col("id"), explode(col("shingles")).as("sh"))
      .select(col("id"), Dedup.mdHash31(col("sh")).as("f"))
      .createOrReplaceTempView("mh_posts")
    val viaSketch = spark.sql(
      "SELECT id, minhash_sketch(f, 64) AS sig FROM mh_posts GROUP BY id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSketch.keySet == viaTable.keySet)
    viaTable.foreach { case (id, sig) =>
      assert(viaSketch(id) == sig, s"doc $id sketch != relational signature")
    }
  }

  test("sketch is merge-invariant: same result under any partitioning") {
    val df = (1 to 1000).map(i => (i % 7, s"tok$i")).toDF("g", "v")
    def run(parts: Int) = {
      df.repartition(parts).createOrReplaceTempView("mh_m")
      spark.sql("SELECT g, minhash_sketch(v, 32) AS s FROM mh_m GROUP BY g")
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    }
    assert(run(1) == run(13))
  }

  test("estimated Jaccard from sketches tracks true Jaccard") {
    // two sets with known overlap: 1..100 vs 51..150 -> true J = 50/150
    val df = ((1 to 100).map(i => ("a", s"x$i")) ++ (51 to 150).map(i => ("b", s"x$i")))
      .toDF("g", "v")
    df.createOrReplaceTempView("mh_j")
    val sigs = spark.sql("SELECT g, minhash_sketch(v, 256) AS s FROM mh_j GROUP BY g")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val est = sigs("a").zip(sigs("b")).count { case (x, y) => x == y } / 256.0
    assert(math.abs(est - 1.0 / 3.0) < 0.12, s"estimate $est vs true 0.333")
  }
}
