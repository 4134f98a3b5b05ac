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

  test("adaptive nProbe: probe count follows cell density under a candidate budget") {
    import spark.implicits._
    // skewed corpus: one huge cluster (1500 vectors) + 15 sparse clusters
    // (~33 each) on the unit sphere — the geometry fixed nProbe mishandles
    val rnd = new scala.util.Random(11)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val centers = Array.fill(16)(unit(Array.fill(64)(rnd.nextGaussian())))
    val skewed = (0 until 2000).map { i =>
      val c = centers(if (i < 1500) 0 else 1 + i % 15)
      (i.toLong, unit(c.zip(Array.fill(64)(rnd.nextGaussian()))
        .map { case (x, e) => x + 0.08 * e }).map(_.toFloat).toSeq)
    }.toDF("vec_id", "embedding").cache()
    val path = Files.createTempDirectory("ivfpq-adapt").toString
    Similarity.ivfPqBuildIndex(skewed, "vec_id", "embedding", path,
      nCentroids = 16, m = 8, k = 16, trainIters = 3)

    // cellstats: bounded metadata, sums to the corpus, k-means splits the
    // huge cluster but real skew survives (measured ~9x max/min)
    val counts = Similarity.loadCellCounts(spark, path, 16)
    assert(counts.sum == 2000 && counts.max >= 4 * counts.min.max(1L),
      s"cellstats wrong or skew collapsed: $counts")

    // one member of the densest cell + one of the sparsest, same budget =
    // the max cell size: the dense query's own cell exhausts it alone
    val cells = spark.read.parquet(s"$path/cells").select("id", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    val maxCell = counts.indexOf(counts.max)
    val minCell = counts.indexOf(counts.min)
    val denseId = cells.find(_._2 == maxCell).get._1
    val sparseId = cells.find(_._2 == minCell).get._1
    val budget = counts.max
    def queryOf(id: Long) = skewed.filter(col("vec_id") === id)
      .select(col("vec_id").as("q_id"), col("embedding"))
    def probedCells(qs: org.apache.spark.sql.DataFrame): Int =
      Similarity.ivfPqProbes(spark, path, qs, "q_id", "embedding",
        candidateBudget = Some(budget)).count().toInt
    val dCells = probedCells(queryOf(denseId))
    val sCells = probedCells(queryOf(sparseId))
    info(s"probed cells under budget $budget: dense-cell query=$dCells sparse=$sCells")
    // the dense query's first cell already blows the budget -> few cells;
    // the sparse query accumulates many small cells before hitting it
    assert(dCells <= 2, s"dense query over-probed: $dCells cells")
    assert(sCells > dCells, s"sparse query should probe more cells: $sCells vs $dCells")

    // adaptive with a generous budget recalls at least as well as nProbe=1
    // (it probes a superset of cells for every query)
    val qs = skewed.orderBy("vec_id").limit(20)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val truth = Similarity.knnBruteForce(skewed, "vec_id", qs, "q_id",
      "embedding", 10).cache()
    def recall(res: org.apache.spark.sql.DataFrame): Double =
      res.select("q_id", "id").join(truth.select("q_id", "id"),
        Seq("q_id", "id"), "left_semi").count().toDouble / truth.count()
    val rFixed = recall(Similarity.ivfPqQueryIndex(spark, path, qs, "q_id",
      "embedding", k = 10, nProbe = 1, rerank = 32))
    val rAdaptive = recall(Similarity.ivfPqQueryIndex(spark, path, qs, "q_id",
      "embedding", k = 10, rerank = 32, candidateBudget = Some(budget + 100)))
    info(f"skewed corpus recall@10: nProbe=1 fixed=$rFixed%.3f adaptive=$rAdaptive%.3f")
    assert(rAdaptive >= rFixed,
      f"adaptive must not lose to single-probe: $rFixed%.3f vs $rAdaptive%.3f")
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
