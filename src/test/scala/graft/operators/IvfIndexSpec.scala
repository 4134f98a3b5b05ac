package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Persisted IVF index: build-once/query-many parity with the inline
  * operator, and proof that queries read only the probed cell partitions. */
class IvfIndexSpec extends SparkSpecBase {

  private lazy val corpus = spark.read.parquet(sf() + "/embeddings.parquet")
  private lazy val queries = corpus.limit(5)
    .select(col("vec_id").as("q_id"), col("embedding"))

  test("ivfQueryIndex returns exactly what inline ivfTopK returns") {
    val path = Files.createTempDirectory("ivf-idx").toString
    Similarity.ivfBuildIndex(corpus, "vec_id", "embedding", path, nCentroids = 16)

    val inline = Similarity.ivfTopK(corpus, "vec_id", queries, "q_id",
        "embedding", k = 10, nCentroids = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val indexed = Similarity.ivfQueryIndex(spark, path, queries, "q_id",
        "embedding", k = 10, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(indexed == inline,
      s"missing=${(inline -- indexed).take(3)} extra=${(indexed -- inline).take(3)}")
  }

  test("rebuild with centroidsFrom reuses the trained codebooks verbatim") {
    val first = Files.createTempDirectory("ivfpq-train").toString
    val rebuilt = Files.createTempDirectory("ivfpq-reuse").toString
    // night 1: trained build; night 2: rebuild over (here: the same) data
    // reusing night 1's centroids + codebooks — no re-training pass
    Similarity.ivfPqBuildIndex(corpus, "vec_id", "embedding", first,
      nCentroids = 8, m = 8, k = 8, trainIters = 2)
    Similarity.ivfPqBuildIndex(corpus, "vec_id", "embedding", rebuilt,
      centroidsFrom = Some(first))
    assert(Similarity.loadCentroids(spark, rebuilt) ==
      Similarity.loadCentroids(spark, first))
    assert(Similarity.loadCodebooks(spark, rebuilt) ==
      Similarity.loadCodebooks(spark, first))
    // identical index content -> identical query results
    val a = Similarity.ivfPqQueryIndex(spark, first, queries, "q_id",
        "embedding", k = 5).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Similarity.ivfPqQueryIndex(spark, rebuilt, queries, "q_id",
        "embedding", k = 5).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("IVFPQ: self-queries rerank to themselves; ADC scan projects codes only") {
    val path = Files.createTempDirectory("ivfpq-idx").toString
    Similarity.ivfPqBuildIndex(corpus, "vec_id", "embedding", path,
      nCentroids = 16, m = 8, k = 16)
    val top = Similarity.ivfPqQueryIndex(spark, path, queries, "q_id",
      "embedding", k = 10, nProbe = 4, rerank = 64)
    val rows = top.collect()
    assert(rows.length == 50)
    // a query that IS a corpus vector must rerank itself to rank 1, sim ~1
    val self = rows.filter(r => r.getInt(3) == 1)
    assert(self.length == 5)
    self.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"rank-1 not self: $r")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
    }
    // exact-rerank sims descend within each query
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val ds = g.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(ds.zip(ds.tail).forall { case (a, b) => a >= b })
    }
    // the ADC stage's scan reads only id/cell/codes — not the vectors
    val plan = top.queryExecution.executedPlan.toString
    val codeScans = "ReadSchema: [^\n]*codes".r.findAllIn(plan).toList
    assert(codeScans.exists(!_.contains("nrm")),
      s"expected a codes-only scan without vectors:\n${codeScans.mkString("\n")}")
  }

  test("index queries prune to the probed cell partitions") {
    val path = Files.createTempDirectory("ivf-idx2").toString
    Similarity.ivfBuildIndex(corpus, "vec_id", "embedding", path, nCentroids = 16)
    val one = queries.limit(1)
    val df = Similarity.ivfQueryIndex(spark, path, one, "q_id", "embedding",
      k = 5, nProbe = 2)
    val plan = df.queryExecution.executedPlan.toString
    // the isin partition filter must reach the cells scan
    assert(plan.contains("PartitionFilters: [cell#") ||
      "cell.* IN ".r.findFirstIn(plan).isDefined,
      s"no partition filter on the cells scan:\n${plan.take(3000)}")
    // 1 query x nProbe 2 -> at most 2 of the 16 cell directories are read
    val scanned = "cell=\\d+".r.findAllIn(plan).toSet
    if (scanned.nonEmpty) assert(scanned.size <= 2, scanned.toString)
    assert(df.count() == 5)
  }
}
