package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding quantization for ANN at scale: symmetric per-vector int8 —
  * scale = max|v|/127, codes = floor(v/scale + 0.5) clamped to [-127, 127].
  * A 64-float vector (256 B) becomes 64 bytes + one double, a 4× memory/IO
  * cut for candidate stores (the coarse tier between full floats and the
  * 64-bit sign sketch of the Hamming ANN).
  *
  * Expression-only and engine-portable by construction: `floor(x + 0.5)`
  * (not `round`, whose half-even/half-up behavior differs across engines)
  * and explicit element-wise double casts make DuckDB mirror every bit, so
  * the gate query hash-compares. Every array input is [[bindOnce]]-bound —
  * scale is referenced per element and would otherwise re-evaluate its whole
  * max-fold per element (the HOF copy footgun).
  */
object Quantize {

  /** Product-quantization codebooks — the ANN memory tier between int8 and
    * the 64-bit sign sketch: D dims split into `m` subspaces, each encoded
    * as the id of its nearest of `k` codebook entries → m bytes per vector
    * (D=64, m=8: 32× smaller than float32).
    *
    * Codebook entries are hash-ordered corpus samples (the IVF seeding
    * recipe — deterministic and md5-derived, so DuckDB re-derives the exact
    * same codebooks from the data and the encode query hash-compares;
    * k-means would encode tighter but is neither portable nor stable).
    * Returns codebooks(mi)(ki)(j): the ki-th entry of subspace mi. */
  def pqCodebooks(corpus: org.apache.spark.sql.DataFrame, idCol: String,
                  vecCol: String, m: Int, k: Int): Seq[Seq[Seq[Double]]] = {
    val seeds = corpus
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .orderBy(pmod(call_function("md5_prefix60", col("id").cast("string")),
        lit(9973)), col("id"))
      .limit(k)
      .select("v").collect().map(_.getSeq[Double](0).toIndexedSeq)
    val d = seeds.head.length
    require(d % m == 0, s"vector dim $d must be divisible by m=$m")
    val sub = d / m
    (0 until m).map(mi => seeds.toSeq.map(s => s.slice(mi * sub, (mi + 1) * sub)))
  }

  /** Lloyd-refined PQ codebooks: the hash-seeded [[pqCodebooks]] start
    * improved by `iters` k-means rounds, ALL m subspaces trained in one
    * distributed pass per round. Shape: encode each vector with the current
    * books ([[pqEncode]] — map-only), posexplode the dims, key each element
    * by (subspace, assigned code, dim-in-subspace), and take per-key mean —
    * the shuffle is map-side combined down to m × k × subDim partials per
    * task, and the driver only ever holds the m × k × subDim codebook
    * doubles. Empty clusters keep their previous entry, so per-subspace L2
    * distortion is monotonically non-increasing in `iters` (asserted in
    * `TrainedCodebooksSpec`).
    *
    * NOT the oracle default — k-means is not engine-portable; hash-seeded
    * stays the gate path and training is opt-in (e.g.
    * `Similarity.ivfPqBuildIndex(trainIters = ...)`). */
  def pqCodebooksTrained(corpus: org.apache.spark.sql.DataFrame, idCol: String,
                         vecCol: String, m: Int, k: Int,
                         iters: Int,
                         init: Option[Seq[Seq[Seq[Double]]]] = None): Seq[Seq[Seq[Double]]] = {
    // init warm-starts Lloyd from caller-supplied books (the alternating-OPQ
    // half-step) instead of the hash-seeded picks
    var cbs = init.getOrElse(pqCodebooks(corpus, idCol, vecCol, m, k))
    if (iters <= 0) return cbs
    val sub = cbs.head.head.length
    val v = corpus.select(col(vecCol).cast("array<double>").as("v")).cache()
    try {
      for (_ <- 0 until iters) {
        // codes staged in their own projection: a generator in the same
        // select strips the argmin struct's field aliases during analysis
        // (getField("cid") then fails on col1/col2)
        val stats = v
          .select(col("v"), pqEncode(col("v"), cbs).as("codes"))
          .select(col("codes"), posexplode(col("v")))
          .select(floor(col("pos") / sub).cast("int").as("mi"),
            pmod(col("pos"), lit(sub)).as("j"),
            element_at(col("codes"), floor(col("pos") / sub).cast("int") + 1).as("code"),
            col("col").as("x"))
          .groupBy("mi", "code", "j")
          .agg(sum("x").as("s"), count(lit(1)).as("n"))
          .collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
            (r.getDouble(3) / r.getLong(4))).toMap
        cbs = cbs.zipWithIndex.map { case (book, mi) =>
          book.zipWithIndex.map { case (old, ki) =>
            if (!stats.contains((mi, ki, 0))) old
            else (0 until sub).map(j => stats((mi, ki, j)))
          }
        }
      }
      cbs
    } finally { v.unpersist(); () }
  }

  /** Parametric OPQ rotation (Ge et al., CVPR 2013, the closed-form variant):
    * PCA-rotate the data, then allocate eigen-dimensions to the `m` PQ
    * subspaces so the per-subspace variance PRODUCTS balance (greedy on
    * log-eigenvalues, capacity D/m each) — the allocation that minimizes
    * expected quantization distortion for Gaussian data at a fixed code
    * budget. Returns R as D rows; rotated vector = `mat_vec(R, v)`.
    *
    * 100 TB shape: covariance is accumulated per-partition (one D×D double
    * array each, the only `mapPartitions` here) and reduced; the driver
    * holds D×D doubles and runs a cyclic-Jacobi eigendecomposition — all
    * bounded metadata, like centroids and codebooks. */
  def opqRotation(corpus: org.apache.spark.sql.DataFrame, vecCol: String,
                  m: Int): Seq[Seq[Double]] = {
    val rows = corpus.select(col(vecCol).cast("array<double>"))
    val d = rows.head().getSeq[Double](0).length
    require(d % m == 0, s"vector dim $d must be divisible by m=$m")
    // per-partition second-moment + mean accumulation → centered covariance
    val (m2, mean, n) = rows.rdd.mapPartitions { it =>
      val acc = Array.ofDim[Double](d * d)
      val mu = Array.ofDim[Double](d)
      var cnt = 0L
      it.foreach { r =>
        val v = r.getSeq[Double](0)
        var i = 0
        while (i < d) {
          val vi = v(i)
          mu(i) += vi
          var j = 0
          while (j < d) { acc(i * d + j) += vi * v(j); j += 1 }
          i += 1
        }
        cnt += 1
      }
      Iterator((acc, mu, cnt))
    }.reduce { (a, b) =>
      var i = 0
      while (i < d * d) { a._1(i) += b._1(i); i += 1 }
      i = 0
      while (i < d) { a._2(i) += b._2(i); i += 1 }
      (a._1, a._2, a._3 + b._3)
    }
    val cov = Array.tabulate(d, d)((i, j) =>
      m2(i * d + j) / n - (mean(i) / n) * (mean(j) / n))
    val (eigVals, eigVecs) = jacobiEigen(cov)
    // greedy log-eigenvalue balancing: biggest first, into the bucket with
    // the smallest accumulated weight. Weights are SHIFTED to non-negative
    // (w = log λ − min log λ): every bucket ends with exactly `sub` factors,
    // so the balance objective is shift-invariant — and without the shift,
    // λ < 1 makes log λ negative and the greedy INVERTS (the bucket that
    // took the biggest eigenvalue looks emptiest and takes them all;
    // measured: one bucket got every strong dimension).
    val sub = d / m
    val logs = eigVals.map(v => math.log(math.max(v, 1e-12)))
    val minLog = logs.min
    val order = eigVals.indices.sortBy(i => -eigVals(i))
    val bucketW = Array.ofDim[Double](m)
    val bucketDims = Array.fill(m)(List.empty[Int])
    order.foreach { ei =>
      val bi = (0 until m).filter(bucketDims(_).length < sub)
        .minBy(bucketW(_))
      bucketW(bi) += logs(ei) - minLog
      bucketDims(bi) = bucketDims(bi) :+ ei
    }
    (0 until m).flatMap(bi => bucketDims(bi).map(ei => eigVecs(ei).toSeq))
  }

  /** Non-parametric OPQ (Ge et al., CVPR 2013, the alternating variant):
    * start from the parametric rotation and alternate (1) PQ codebook
    * training in the rotated geometry with (2) an orthogonal-Procrustes
    * re-solve of R against the codebook reconstructions. Both half-steps
    * minimize the same `‖R·x − decode(encode(R·x))‖²` objective, so the
    * distortion is non-increasing round over round (asserted in
    * `TrainedCodebooksSpec`). Returns (R, trained codebooks) — the books
    * are consistent with the FINAL R, so callers use both as a pair.
    *
    * 100 TB shape: the cross-covariance is a per-partition D×D double
    * accumulation reduced to the driver (the [[opqRotation]] covariance
    * pattern); everything driver-side is D×D bounded metadata. */
  def opqRotationRefined(corpus: org.apache.spark.sql.DataFrame, idCol: String,
                         vecCol: String, m: Int, k: Int, rounds: Int,
                         trainIters: Int): (Seq[Seq[Double]], Seq[Seq[Seq[Double]]]) = {
    import org.apache.spark.sql.functions.col
    var r = opqRotation(corpus, vecCol, m)
    val d = r.length
    val sub = d / m
    var cbs: Seq[Seq[Seq[Double]]] = Seq.empty
    val rows = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("x")).cache()
    try {
      for (round <- 0 until math.max(1, rounds)) {
        if (round > 0) {
          // cross-covariance C = Σ x·ŷᵀ with ŷ = decode(encode(R·x));
          // encode is the expression kernel, decode a closure-side lookup
          val cbArr = cbs.map(_.map(_.toArray).toArray).toArray
          val enc = rows.select(col("x"), pqEncode(rotate(col("x"), r), cbs).as("codes"))
          val c = enc.rdd.mapPartitions { it =>
            val acc = Array.ofDim[Double](d * d)
            val yhat = Array.ofDim[Double](d)
            it.foreach { row =>
              val x = row.getSeq[Double](0)
              val codes = row.getSeq[Int](1)
              var mi = 0
              while (mi < m) {
                val e = cbArr(mi)(codes(mi))
                var j = 0
                while (j < sub) { yhat(mi * sub + j) = e(j); j += 1 }
                mi += 1
              }
              var i = 0
              while (i < d) {
                val xi = x(i)
                var j = 0
                while (j < d) { acc(i * d + j) += xi * yhat(j); j += 1 }
                i += 1
              }
            }
            Iterator(acc)
          }.reduce { (a, b) =>
            var i = 0
            while (i < d * d) { a(i) += b(i); i += 1 }
            a
          }
          r = procrustes(c, d)
        }
        // round 0 trains from the hash seeds (= the parametric path);
        // later rounds warm-start from the previous books so both
        // half-steps descend ONE objective — no reseeding regressions
        val rotated = rows.select(col("id"), rotate(col("x"), r).as("rv"))
        cbs = pqCodebooksTrained(rotated, "id", "rv", m, k, trainIters,
          init = if (round == 0) None else Some(cbs))
      }
      (r, cbs)
    } finally { rows.unpersist(); () }
  }

  /** Orthogonal Procrustes: the rotation maximizing `tr(R·C)` for the
    * cross-covariance C = Σ x·ŷᵀ, i.e. R = V·Uᵀ from the SVD C = U·S·Vᵀ.
    * The SVD derives from Jacobi on CᵀC (giving V and S²) with
    * u_i = C·v_i/σ_i; a near-zero singular value keeps u_i = v_i (a
    * rank-deficient direction — any rotation of it is equally optimal,
    * though R is then only approximately orthogonal there). */
  private[operators] def procrustes(cFlat: Array[Double], d: Int): Seq[Seq[Double]] = {
    val ctc = Array.tabulate(d, d) { (i, j) =>
      var s = 0.0
      var l = 0
      while (l < d) { s += cFlat(l * d + i) * cFlat(l * d + j); l += 1 }
      s
    }
    val (evals, evecs) = jacobiEigen(ctc) // evecs(i) = eigenvector i (row)
    val scale = math.sqrt(evals.map(math.abs).max.max(1e-300))
    val us = Array.tabulate(d) { i =>
      val sigma = math.sqrt(math.max(evals(i), 0.0))
      val cv = Array.tabulate(d) { a =>
        var s = 0.0
        var l = 0
        while (l < d) { s += cFlat(a * d + l) * evecs(i)(l); l += 1 }
        s
      }
      // normalize by ‖C·v‖ (not the eigenvalue-derived σ): the Jacobi
      // eigenvalue error would otherwise leak into u's norm
      val nrm = math.sqrt(cv.map(x => x * x).sum)
      if (sigma > 1e-9 * scale && nrm > 0) cv.map(_ / nrm) else evecs(i).clone()
    }
    // modified Gram–Schmidt over the u's: Jacobi precision on
    // near-degenerate spectra (e.g. many equal noise dims) leaves them only
    // ~1e-5 orthogonal — re-orthonormalize so R is a rotation to machine
    // precision (V is exactly orthogonal: it IS the Jacobi rotation product)
    locally {
      var i = 0
      while (i < d) {
        var j = 0
        while (j < i) {
          var dp = 0.0
          var l = 0
          while (l < d) { dp += us(i)(l) * us(j)(l); l += 1 }
          l = 0
          while (l < d) { us(i)(l) -= dp * us(j)(l); l += 1 }
          j += 1
        }
        var n = 0.0
        var l = 0
        while (l < d) { n += us(i)(l) * us(i)(l); l += 1 }
        val inv = 1.0 / math.sqrt(math.max(n, 1e-300))
        l = 0
        while (l < d) { us(i)(l) *= inv; l += 1 }
        i += 1
      }
    }
    // R = V·Uᵀ = Σ_i v_i·u_iᵀ
    (0 until d).map { a =>
      (0 until d).map { b =>
        var s = 0.0
        var i = 0
        while (i < d) { s += evecs(i)(a) * us(i)(b); i += 1 }
        s
      }
    }
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix — returns
    * (eigenvalues, eigenvectors-as-rows). Driver-side, O(D³) per sweep;
    * D ≤ a few hundred, so microseconds-to-millis territory. */
  private[operators] def jacobiEigen(aIn: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = aIn.length
    val a = Array.tabulate(d, d)((i, j) => aIn(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > 1e-12) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off += apq * apq
          if (math.abs(apq) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // theta == 0 (equal diagonals) takes the full 45° rotation
            val t = if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vpk = v(p)(k); val vqk = v(q)(k)
              v(p)(k) = c * vpk - s * vqk
              v(q)(k) = s * vpk + c * vqk
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Apply a rotation matrix (array of rows) to a vector column — a literal
    * `mat_vec`, codegen'd, map-only. */
  def rotate(vec: Column, r: Seq[Seq[Double]]): Column =
    call_function("mat_vec", typedLit(r), vec.cast("array<double>"))

  /** Encode a vector as its `m` PQ codes (array<int>): per subspace, the
    * codebook entry with minimal L2 distance (ties → lowest id, via
    * lexicographic struct min). All-literal expression tree — map-only,
    * no shuffle, same shape as the IVF cell assignment. */
  def pqEncode(vecIn: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val m = codebooks.length
    val k = codebooks.head.length
    val sub = codebooks.head.head.length
    // one `pq_encode` kernel call (graft.functions.PqEncodeKernel) instead
    // of the staged argmin expression tree: at m=8,k=16 that tree is ~1000
    // nodes, overflows whole-stage codegen and evaluates interpreted (the
    // honest bench measured it at 21 s / 500k rows). Same math, same fold
    // order, same lowest-cid tie-break — bit-parity spec'd.
    call_function("pq_encode", vecIn.cast("array<double>"),
      lit(m), lit(k), lit(sub),
      typedLit(codebooks.flatten.flatten))
  }

  /** ADC (asymmetric distance) top-k over PQ codes: queries keep full
    * precision, corpus rows carry only their m codes — the scan side streams
    * m bytes per vector instead of D floats. Approximate squared L2 =
    * Σ_m LUT_m[code_m], with each LUT_m the query subvector's distances to
    * subspace m's codebook entries (an all-literal expression over the
    * broadcast query row — map-only until the per-query top-k shuffle).
    * Output: (q_id, id, adist, rnk), ascending distance. */
  def pqAdcTopK(encoded: org.apache.spark.sql.DataFrame, idCol: String,
                codesCol: String, queries: org.apache.spark.sql.DataFrame,
                queryId: String, vecCol: String,
                codebooks: Seq[Seq[Seq[Double]]], k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = codebooks.length
    val nCodes = codebooks.head.length
    // LUTs materialize ON THE BROADCAST QUERY ROW (m·nCodes doubles each),
    // so per-candidate scoring is m array lookups, not m·nCodes·sub flops
    val q = broadcast(queries.select(col(queryId).as("q_id"),
        pqLutFlat(col(vecCol).cast("array<double>"), codebooks).as("lutf")))
    val joined = encoded.select(col(idCol).as("id"), col(codesCol).as("codes"))
      .crossJoin(q)
    // bounded-heap top-k instead of the rank window (see
    // Similarity.knnBruteForce — VERDICT r10 item 4: the window shape put
    // |corpus| ADC rows per query on one reducer)
    Similarity.topKExplode(
      joined.withColumn("adist",
        pqAdcFromLut(col("lutf"), col("codes"), m, nCodes)),
      Seq(col("q_id")), col("adist"), firstDesc = false, col("id"), Nil, k)
      .select(col("q_id"), col("id"), col("adist"), col("rnk"))
  }

  /** Flattened ADC lookup table for one query (sub)vector: the m·nCodes
    * squared distances laid out [subspace 0 entries][subspace 1 entries]…,
    * computed ONCE per (query[, cell]) row — the probe/broadcast side —
    * instead of per candidate. Entry math and fold order are identical to
    * the previous inline form, so ADC rankings are bit-identical; only the
    * evaluation count changes (the SIMD-style LUT factoring of PQ ADC,
    * Jégou et al., TPAMI'11 §IV). */
  def pqLutFlat(qvIn: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = bindOnce(qvIn) { qv =>
    val sub = codebooks.head.head.length
    array(codebooks.zipWithIndex.flatMap { case (cbs, mi) =>
      cbs.map { cb =>
        cb.zipWithIndex.map { case (cj, j) =>
          val dd = element_at(qv, mi * sub + j + 1) - lit(cj)
          dd * dd
        }.foldLeft(lit(0.0))(_ + _)
      }
    }: _*)
  }

  /** Σ_m lut[m·nCodes + code_m] — the per-candidate ADC score over a
    * [[pqLutFlat]] table: m element_at lookups inside codegen. */
  def pqAdcFromLut(lutIn: Column, codesIn: Column, m: Int, nCodes: Int): Column =
    bindOnce(lutIn) { lut =>
      bindOnce(codesIn) { codes =>
        (0 until m).map { mi =>
          element_at(lut, lit(mi * nCodes) + element_at(codes, mi + 1) + 1)
        }.foldLeft(lit(0.0))(_ + _)
      }
    }

  /** (scale DOUBLE, q ARRAY<INT>, err DOUBLE) struct: quantization scale,
    * int8 codes, and the L2 reconstruction error — one pass over the row.
    * Zero vectors quantize to all-zero codes with scale 0. */
  def int8QuantStruct(vecIn: Column): Column = bindOnce(vecIn) { v =>
    bindOnce(array_max(transform(v, x => abs(x.cast("double")))) / lit(127.0)) { s =>
      bindOnce(transform(v, x =>
        when(s === lit(0.0), lit(0))
          .otherwise(greatest(lit(-127.0),
            least(lit(127.0), floor(x.cast("double") / s + lit(0.5)))).cast("int")))) { q =>
        val errSq = aggregate(
          zip_with(v, q, (x, c) =>
            (x.cast("double") - c.cast("double") * s) *
              (x.cast("double") - c.cast("double") * s)),
          lit(0.0), (acc, d) => acc + d)
        struct(s.as("scale"), q.as("q"), sqrt(errSq).as("err"))
      }
    }
  }
}
