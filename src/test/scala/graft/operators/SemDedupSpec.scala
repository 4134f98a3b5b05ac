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

  test("cluster-balanced sample caps the dominant mode, keeps sparse cells whole") {
    // a 30-clone mode plus singletons: a uniform 1/3 sample would be ~77%
    // mode; the per-cell cap bounds the mode's contribution at perCell.
    // Sparse ids (983, 88, 455, 699) hash FIRST in the md5 seed order, so
    // the 4 centroids are the 4 distinct sparse vectors — an all-clone
    // seed draw would collapse every vector into one tied cell and turn
    // the sampler into a global cap (correct but not what this asserts).
    val mode = Seq(101L, 102L, 103L, 104L, 105L, 107L, 109L, 110L, 111L,
      112L, 113L, 114L, 115L, 120L, 121L, 122L, 124L, 125L, 126L, 127L,
      129L, 130L, 131L, 132L, 133L, 134L, 135L, 136L, 138L, 139L)
      .map(i => (i, Array(1.0, 0.0, 0.0, 0.0)))
    val rest = Seq(
      (983L, Array(0.0, 1.0, 0.0, 0.0)), (88L, Array(0.0, 0.0, 1.0, 0.0)),
      (455L, Array(0.0, 0.0, 0.0, 1.0)), (699L, Array(0.0, 1.0, 1.0, 0.0)))
    val df = (mode ++ rest).toDF("vec_id", "embedding")
    val out = Similarity.clusterBalancedSample(df, "vec_id", "embedding",
        nCentroids = 4, perCell = 5L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val ids = out.map(_._1).toSet
    assert(ids.subsetOf((mode ++ rest).map(_._1).toSet))
    // every cell contributes at most perCell, with rk dense 1..n
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.length <= 5)
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // the clone mode co-cells (orthogonal-to-everything vectors tie at sim
    // 0 and take the highest cid — 699's own cell), so the mode competes
    // only against 699 under that cell's cap: at most 5 of its 30 members
    // survive, while the sparse vectors in mode-free cells all survive
    val modeIds = mode.map(_._1).toSet
    assert(ids.count(modeIds) <= 5)
    assert(Set(983L, 88L, 455L).subsetOf(ids), s"sample: ${out.sortBy(_._1).toSeq}")
    // determinism: same inputs -> same sample
    val again = Similarity.clusterBalancedSample(df, "vec_id", "embedding",
        nCentroids = 4, perCell = 5L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(again == out.toSet)
  }
}
