package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained (Lloyd k-means) IVF centroids / PQ codebooks vs the hash-seeded
  * defaults, measured on the sf0.1 embeddings (2000 × 64 floats):
  * recall@10 against [[Similarity.knnBruteForce]] ground truth, and PQ L2
  * distortion (guaranteed monotone non-increasing under Lloyd rounds with
  * keep-on-empty clusters — that part is asserted hard; recall is asserted
  * with the measured margin and recorded in COVERAGE.md).
  *
  * Spec-gated, not oracle-gated: k-means is not engine-portable (DuckDB
  * cannot re-derive the same codebooks), which is exactly why hash-seeded
  * stays the gate default and training is the opt-in `trainIters` path. */
class TrainedCodebooksSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet(sf("sf0.1") + "/embeddings.parquet").cache()
  private lazy val queries = emb.orderBy("vec_id").limit(20).cache()
  private lazy val brute = Similarity
    .knnBruteForce(emb, "vec_id", queries, "vec_id", "embedding", 10).cache()

  private def recallAt10(result: DataFrame): Double = {
    val hits = result.select("q_id", "id")
      .join(brute.select("q_id", "id"), Seq("q_id", "id"), "left_semi").count()
    hits.toDouble / brute.count()
  }

  test("trained IVF centroids: recall@10 at equal probe budget >= hash-seeded") {
    val seeded = recallAt10(Similarity.ivfTopK(emb, "vec_id", queries, "vec_id",
      "embedding", 10, nCentroids = 32, nProbe = 2))
    val trained = recallAt10(Similarity.ivfTopK(emb, "vec_id", queries, "vec_id",
      "embedding", 10, nCentroids = 32, nProbe = 2, trainIters = 5))
    info(f"IVF nCentroids=32 nProbe=2: recall@10 seeded=$seeded%.3f trained=$trained%.3f")
    assert(trained >= seeded,
      f"training must not hurt recall: seeded=$seeded%.3f trained=$trained%.3f")
    assert(trained >= 0.3, f"trained recall collapsed: $trained%.3f")
  }

  /** Mean per-element squared reconstruction error of the books over the
    * corpus — the k-means objective (per-subspace L2 distortion, scaled). */
  private def pqDistortion(cbs: Seq[Seq[Seq[Double]]]): Double = {
    val k = cbs.head.length
    val sub = cbs.head.head.length
    val lut = typedLit(cbs.flatten)
    emb.select(col("embedding"),
        Quantize.pqEncode(col("embedding"), cbs).as("codes"))
      .select(col("codes"), posexplode(col("embedding").cast("array<double>")))
      .select(floor(col("pos") / sub).cast("int").as("mi"),
        pmod(col("pos"), lit(sub)).as("j"),
        element_at(col("codes"), floor(col("pos") / sub).cast("int") + 1).as("code"),
        col("col").as("x"))
      .withColumn("c",
        element_at(element_at(lut, col("mi") * k + col("code") + 1), col("j") + 1))
      .agg(avg(($"x" - $"c") * ($"x" - $"c"))).head().getDouble(0)
  }

  test("trained PQ codebooks: distortion strictly improves, ADC recall@10 recorded") {
    val seededCbs = Quantize.pqCodebooks(emb, "vec_id", "embedding", m = 8, k = 16)
    val trainedCbs = Quantize.pqCodebooksTrained(emb, "vec_id", "embedding",
      m = 8, k = 16, iters = 5)

    val dSeeded = pqDistortion(seededCbs)
    val dTrained = pqDistortion(trainedCbs)
    info(f"PQ m=8 k=16: distortion seeded=$dSeeded%.5f trained=$dTrained%.5f " +
      f"(${(1 - dTrained / dSeeded) * 100}%.1f%% lower)")
    // Lloyd rounds with keep-on-empty never increase the objective
    assert(dTrained <= dSeeded,
      f"k-means increased distortion: $dSeeded%.5f -> $dTrained%.5f")

    def adcRecall(cbs: Seq[Seq[Seq[Double]]]): Double = {
      val encoded = emb.select(col("vec_id"),
        Quantize.pqEncode(col("embedding"), cbs).as("codes"))
      recallAt10(Quantize.pqAdcTopK(encoded, "vec_id", "codes", queries,
        "vec_id", "embedding", cbs, 10))
    }
    val rSeeded = adcRecall(seededCbs)
    val rTrained = adcRecall(trainedCbs)
    info(f"PQ ADC recall@10: seeded=$rSeeded%.3f trained=$rTrained%.3f")
    assert(rTrained >= rSeeded,
      f"training must not hurt ADC recall: seeded=$rSeeded%.3f trained=$rTrained%.3f")
    assert(rTrained >= 0.2, f"trained ADC recall collapsed: $rTrained%.3f")
  }

  /** ADC-tier recall at rerank == k: the exact rerank cannot mask ADC
    * ordering quality — recall is the code tier's own, at identical
    * m/k/trainIters budget. */
  private def adcTierRecall(corpus: DataFrame, path: String, qs: DataFrame,
                            truth: DataFrame, residual: Boolean): Double = {
    Similarity.ivfPqBuildIndex(corpus, "vec_id", "embedding", path,
      nCentroids = 32, m = 8, k = 16, trainIters = 5, residual = residual)
    val res = Similarity.ivfPqQueryIndex(spark, path, qs, "vec_id",
      "embedding", k = 10, nProbe = 8, rerank = 10)
    val hits = res.select("q_id", "id")
      .join(truth.select("q_id", "id"), Seq("q_id", "id"), "left_semi").count()
    hits.toDouble / truth.count()
  }

  test("residual IVFPQ: large ADC recall jump on clustered data; no loss on sf0.1; format versioned") {
    val base = java.nio.file.Files.createTempDirectory("ivfpq_res").toString

    // planted clustered corpus — the geometry IVF residual encoding exists
    // for: 32 tight clusters on the unit sphere (member = normalize(center +
    // 0.35·noise), within-cluster cosine ≈ 0.95). Mean-shift residuals
    // collapse near zero, so the same m × k budget resolves within-cluster
    // offsets that raw encoding spends on cluster positions. Deterministic
    // (fixed seed), unit-norm like the driver's embeddings.
    val rnd = new scala.util.Random(42)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val centers = Array.fill(32)(unit(Array.fill(64)(rnd.nextGaussian())))
    val planted = (0 until 2000).map { i =>
      val c = centers(i % 32)
      (i.toLong, unit(c.zip(Array.fill(64)(rnd.nextGaussian()))
        .map { case (x, e) => x + 0.35 * e / 8 }).map(_.toFloat).toSeq)
    }.toDF("vec_id", "embedding").cache()
    val pq = planted.orderBy("vec_id").limit(20).cache()
    val pTruth = Similarity
      .knnBruteForce(planted, "vec_id", pq, "vec_id", "embedding", 10).cache()

    val pRaw = adcTierRecall(planted, s"$base/p_raw", pq, pTruth, residual = false)
    val pRes = adcTierRecall(planted, s"$base/p_res", pq, pTruth, residual = true)
    info(f"planted clustered corpus, ADC-tier recall@10: raw=$pRaw%.3f residual=$pRes%.3f")
    assert(pRes > pRaw,
      f"residual encoding must beat raw on clustered data: raw=$pRaw%.3f residual=$pRes%.3f")

    // driver embeddings (isotropic random — worst case for IVF residuals:
    // cell means are small, residual energy ≈ raw energy). The mean shift is
    // L2-optimal, so residual must stay within seeding noise of raw here.
    val rRaw = adcTierRecall(emb, s"$base/raw", queries, brute, residual = false)
    val rRes = adcTierRecall(emb, s"$base/res", queries, brute, residual = true)
    info(f"sf0.1 embeddings, ADC-tier recall@10: raw=$rRaw%.3f residual=$rRes%.3f")
    assert(rRes >= rRaw - 0.05,
      f"residual encoding lost recall beyond seeding noise: raw=$rRaw%.3f residual=$rRes%.3f")

    // format versioning: new indexes are v4 + flags; missing meta reads as
    // v1 raw, and a 2-column v2 meta reads as opq=false (back-compat)
    assert(Similarity.loadPqMeta(spark, s"$base/res") == ((4, true, false, false)))
    assert(Similarity.loadPqMeta(spark, s"$base/raw") == ((4, false, false, false)))
    assert(Similarity.loadPqMeta(spark, s"$base/nonexistent") == ((1, false, false, false)))
    Seq((2, true)).toDF("version", "residual")
      .write.mode("overwrite").parquet(s"$base/v2meta/meta")
    assert(Similarity.loadPqMeta(spark, s"$base/v2meta") == ((2, true, false, false)))
  }

  test("jacobiEigen diagonalizes a known symmetric matrix") {
    // [[4,1,0],[1,3,1],[0,1,2]] — eigenvalues via characteristic poly check:
    // reconstruct A from (vals, vecs) and compare entrywise
    val a = Array(Array(4.0, 1.0, 0.0), Array(1.0, 3.0, 1.0), Array(0.0, 1.0, 2.0))
    val (vals, vecs) = Quantize.jacobiEigen(a)
    for (i <- 0 until 3; j <- 0 until 3) {
      val recon = (0 until 3).map(e => vals(e) * vecs(e)(i) * vecs(e)(j)).sum
      assert(math.abs(recon - a(i)(j)) < 1e-9,
        s"A[$i][$j]: recon=$recon expected=${a(i)(j)}")
    }
    // rows orthonormal
    for (e1 <- 0 until 3; e2 <- 0 until 3) {
      val d = (0 until 3).map(k => vecs(e1)(k) * vecs(e2)(k)).sum
      assert(math.abs(d - (if (e1 == e2) 1.0 else 0.0)) < 1e-9)
    }
  }

  test("OPQ rotation: ADC-tier recall beats residual-only on anisotropic data; format v3") {
    val base = java.nio.file.Files.createTempDirectory("ivfpq_opq").toString
    // planted SUBSPACE-IMBALANCED corpus — the geometry OPQ's eigenvalue
    // allocation exists for: nearly all variance lives in the first 8 dims,
    // i.e. inside ONE native PQ subspace (the shape of concatenated
    // multi-feature embeddings). Plain PQ spends one 16-code book on all the
    // energy and seven books on noise; OPQ redistributes the strong axes one
    // per subspace. Deterministic (fixed seed), unit-norm.
    val rnd = new scala.util.Random(7)
    val d = 64
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val planted = (0 until 2000).map { i =>
      val x = Array.tabulate(d)(j =>
        rnd.nextGaussian() * (if (j < 8) 1.0 else 0.05))
      (i.toLong, unit(x).map(_.toFloat).toSeq)
    }.toDF("vec_id", "embedding").cache()
    val pq = planted.orderBy("vec_id").limit(20).cache()
    val pTruth = Similarity
      .knnBruteForce(planted, "vec_id", pq, "vec_id", "embedding", 10).cache()

    def tierRecall(path: String, useOpq: Boolean, rounds: Int = 0): Double = {
      Similarity.ivfPqBuildIndex(planted, "vec_id", "embedding", path,
        nCentroids = 32, m = 8, k = 16, trainIters = 5, residual = true,
        opq = useOpq, opqRounds = rounds)
      val res = Similarity.ivfPqQueryIndex(spark, path, pq, "vec_id",
        "embedding", k = 10, nProbe = 8, rerank = 10)
      val hits = res.select("q_id", "id")
        .join(pTruth.select("q_id", "id"), Seq("q_id", "id"), "left_semi").count()
      hits.toDouble / pTruth.count()
    }
    val rRes = tierRecall(s"$base/res", useOpq = false)
    val rOpq = tierRecall(s"$base/opq", useOpq = true)
    info(f"anisotropic corpus, ADC-tier recall@10: residual=$rRes%.3f residual+OPQ=$rOpq%.3f")
    assert(rOpq > rRes,
      f"OPQ must beat residual-only on anisotropic data: $rRes%.3f vs $rOpq%.3f")
    assert(Similarity.loadPqMeta(spark, s"$base/opq") == ((4, true, true, false)))

    // alternating (non-parametric) refinement: codebook training and
    // Procrustes re-solves share one objective, so recall must hold the
    // parametric level; the re-solved R must remain a true rotation
    val rAlt = tierRecall(s"$base/alt", useOpq = true, rounds = 3)
    info(f"anisotropic corpus, ADC-tier recall@10: parametric=$rOpq%.3f alternating(3)=$rAlt%.3f")
    assert(rAlt >= rOpq,
      f"alternating OPQ must hold the parametric level: $rOpq%.3f vs $rAlt%.3f")
    val rot = Similarity.loadRotation(spark, s"$base/alt")
    for (a <- rot.indices; b <- a until rot.length) {
      val dp = rot(a).zip(rot(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(dp - (if (a == b) 1.0 else 0.0)) < 1e-5,
        s"refined R not orthonormal at ($a,$b): $dp")
    }
    // reuse path: centroidsFrom inherits rotation + flags
    Similarity.ivfPqBuildIndex(planted, "vec_id", "embedding", s"$base/reuse",
      centroidsFrom = Some(s"$base/opq"))
    assert(Similarity.loadPqMeta(spark, s"$base/reuse") == ((4, true, true, false)))
    assert(Similarity.loadRotation(spark, s"$base/reuse")
      == Similarity.loadRotation(spark, s"$base/opq"))
  }

  test("LOPQ: per-cell rotations beat one global rotation on per-cluster anisotropy; format v4") {
    val base = java.nio.file.Files.createTempDirectory("ivfpq_lopq").toString
    // planted PER-CLUSTER anisotropy — the geometry LOPQ exists for
    // (Kalantidis & Avrithis, CVPR'14): 8 clusters, cluster g's residual
    // variance concentrated in dim slice [8g, 8g+8). The MIXTURE covariance
    // is near-balanced (every dim is strong in exactly one cluster), so ONE
    // global OPQ rotation has nothing to reallocate; each cell's own
    // rotation spreads its 8 strong dims across the 8 subspaces.
    val rnd = new scala.util.Random(11)
    val d = 64
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val centers = Array.fill(8)(unit(Array.fill(d)(rnd.nextGaussian())))
    val planted = (0 until 2000).map { i =>
      val g = i % 8
      val x = centers(g).zipWithIndex.map { case (c, j) =>
        c + rnd.nextGaussian() * (if (j / 8 == g) 0.45 else 0.02) / 3
      }
      (i.toLong, unit(x).map(_.toFloat).toSeq)
    }.toDF("vec_id", "embedding").cache()
    val pq = planted.orderBy("vec_id").limit(20).cache()
    val pTruth = Similarity
      .knnBruteForce(planted, "vec_id", pq, "vec_id", "embedding", 10).cache()

    def tierRecall(path: String, useOpq: Boolean, useLocal: Boolean): Double = {
      Similarity.ivfPqBuildIndex(planted, "vec_id", "embedding", path,
        nCentroids = 8, m = 8, k = 16, trainIters = 5, residual = true,
        opq = useOpq, localRot = useLocal)
      val res = Similarity.ivfPqQueryIndex(spark, path, pq, "vec_id",
        "embedding", k = 10, nProbe = 4, rerank = 10)
      val hits = res.select("q_id", "id")
        .join(pTruth.select("q_id", "id"), Seq("q_id", "id"), "left_semi").count()
      hits.toDouble / pTruth.count()
    }
    val rRes = tierRecall(s"$base/res", useOpq = false, useLocal = false)
    val rOpq = tierRecall(s"$base/opq", useOpq = true, useLocal = false)
    val rLoc = tierRecall(s"$base/loc", useOpq = false, useLocal = true)
    info(f"per-cluster anisotropy, ADC-tier recall@10: " +
      f"residual=$rRes%.3f +globalOPQ=$rOpq%.3f +LOPQ=$rLoc%.3f")
    assert(rLoc > rOpq,
      f"LOPQ must beat one global rotation here: global=$rOpq%.3f local=$rLoc%.3f")
    assert(rLoc > rRes,
      f"LOPQ must beat residual-only here: res=$rRes%.3f local=$rLoc%.3f")
    assert(Similarity.loadPqMeta(spark, s"$base/loc") == ((4, true, false, true)))

    // reuse path: centroidsFrom inherits the per-cell rotations + flags
    Similarity.ivfPqBuildIndex(planted, "vec_id", "embedding", s"$base/lreuse",
      centroidsFrom = Some(s"$base/loc"))
    assert(Similarity.loadPqMeta(spark, s"$base/lreuse") == ((4, true, false, true)))
    assert(Similarity.loadLocalRotations(spark, s"$base/lreuse", 8, d)
      == Similarity.loadLocalRotations(spark, s"$base/loc", 8, d))
  }

  /** Mean spherical k-means cost (1 − max-dot on unit vectors) of a
    * centroid set over a corpus — the objective both inits compete on. */
  private def meanCost(df: DataFrame, cents: Seq[Seq[Double]]): Double = {
    Similarity.withNorm(df, "id", "vec").filter(col("nrm") > 0)
      .select(transform(col("v"), x => x / col("nrm")).as("u"))
      .select((lit(1.0) - greatest(cents.map(c =>
        call_function("vec_dot", col("u"), typedLit(c))): _*)).as("cost"))
      .agg(avg(col("cost"))).head().getDouble(0)
  }

  test("k-means|| init beats hash seeding on a skew-sized corpus; deterministic") {
    // 8 orthogonal modes in 16d, one dominant (600 rows) vs seven small
    // (25 each): uniform hash seeding lands ~all seeds in the dominant
    // mode and strands the small clusters at cost ~1; distance-spread
    // seeding must cover them. Jitter is a deterministic hash residue.
    val sizes = Seq(600, 25, 25, 25, 25, 25, 25, 25)
    var id = 0L
    val rows = for (c <- 0 until 8; _ <- 0 until sizes(c)) yield {
      id += 1
      val v = Array.fill(16)(0.0f)
      v(2 * c) = 1.0f
      v(2 * c + 1) = ((id * 2654435761L % 1000L) / 10000.0f)
      (id, v.toSeq)
    }
    val df = rows.toDF("id", "vec").cache()
    try {
      val hashC = Similarity.centroidsFor(df, "id", "vec", 8)
      val parC = Similarity.centroidsFor(df, "id", "vec", 8, init = "parallel")
      val parC2 = Similarity.centroidsFor(df, "id", "vec", 8, init = "parallel")
      assert(parC.map(_.toSeq) == parC2.map(_.toSeq),
        "k-means|| init must be a pure function of the corpus")
      val cHash = meanCost(df, hashC)
      val cPar = meanCost(df, parC)
      info(f"spherical cost: hash-seeded=$cHash%.4f kmeans||=$cPar%.4f")
      assert(cPar < cHash,
        f"k-means|| must beat uniform seeding on skewed modes: $cPar%.4f vs $cHash%.4f")
      assert(cPar < 0.02, f"k-means|| failed to cover the planted modes: $cPar%.4f")
    } finally { df.unpersist(); () }
  }
}
