package graft.operators

import graft.SparkSpecBase

/** SemDeDup: clones always share a cell (identical vectors see identical
  * centroid sims), so the within-cell pair contract is assertable without
  * predicting which cell any DISTINCT vector lands in. */
class SemDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, Array(1.0, 0.0, 0.0, 0.0)),  // clone group A
    (2L, Array(1.0, 0.0, 0.0, 0.0)),
    (3L, Array(1.0, 0.0, 0.0, 0.0)),
    (4L, Array(0.0, 1.0, 0.0, 0.0)),  // clone group B
    (5L, Array(0.0, 1.0, 0.0, 0.0)),
    (6L, Array(0.0, 0.0, 1.0, 0.0)),
    (7L, Array(0.0, 0.0, 0.0, 1.0)),
    (8L, Array(1.0, 1.0, 0.0, 0.0)),  // 45 deg off A/B: sim 0.707 < 0.99
    (9L, Array(0.0, 0.0, 1.0, 1.0))
  ).toDF("vec_id", "embedding")

  test("within-cell near-identical pairs; keep-lowest survivors") {
    val pairs = Similarity.semDedupPairs(corpus, "vec_id", "embedding",
        minSim = 0.99, nCentroids = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))

    val kept = Similarity.semDedup(corpus, "vec_id", "embedding",
        minSim = 0.99, nCentroids = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 6L, 7L, 8L, 9L))
  }

  test("maxCell drops an over-large cell's pairs whole") {
    val uncapped = Similarity.semDedupPairs(corpus, "vec_id", "embedding",
        minSim = 0.99, nCentroids = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Similarity.semDedupPairs(corpus, "vec_id", "embedding",
        minSim = 0.99, nCentroids = 4, maxCell = Some(2L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // group A's cell holds >= 3 members (the clones co-cell), so cap=2
    // removes every A pair; whatever else survives must be a subset of the
    // uncapped pairs (the cap only ever REMOVES candidates)
    assert(!capped.exists { case (a, b) => Set(1L, 2L, 3L)(a) && Set(1L, 2L, 3L)(b) })
    assert(capped.subsetOf(uncapped))
  }

  test("trained centroids keep the same pair contract on clones") {
    val pairs = Similarity.semDedupPairs(corpus, "vec_id", "embedding",
        minSim = 0.99, nCentroids = 4, trainIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
  }
}
