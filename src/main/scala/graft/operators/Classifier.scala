package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained linear quality classifier — the fastText-style logistic filter
  * every LLM curation stack trains over hashed n-gram features (GPT-3's
  * WebText-similarity filter, LLaMA's Wikipedia-reference classifier,
  * FineWeb-Edu's quality scorer are all this shape: hashed bag-of-ngrams →
  * linear model → per-doc keep score).
  *
  * Training is full-batch gradient descent run as Spark jobs, made
  * ENGINE-EXACT so a fixed-iteration run is oracle-checkable (no other
  * published pipeline trains a bit-reproducible classifier, because float
  * gradient accumulation depends on reduction order):
  *  - features are md5-hashed bigram counts (p48's portable idiom) —
  *    exact integers;
  *  - weights live as scaled integers (1e-9 units), so the per-doc logit
  *    `z_sum = Σ w·x` is an exact BIGINT sum (order-free);
  *  - the sigmoid is the RATIONAL fast sigmoid `0.5 + 0.5·z/(1+|z|)`
  *    (Elliott '93) — abs/add/mul/div are IEEE correctly-rounded, where
  *    exp() differs across libms in the last ulp;
  *  - the per-row error folds back to an integer (`floor((σ−y)·1e6)`), so
  *    the per-feature gradient is again an exact BIGINT sum, and the
  *    weight update `w −= (grad div N) · η_scaled` is pure integer math.
  *
  * Shape at 100 TB: the per-doc sparse feature table (doc, label,
  * array<(f, x)> — ≤`buckets` entries each) is built ONCE (one explode +
  * two partial-agg shuffles) and persisted; each of the (fixed, few)
  * iterations is then ONE job — a map-only `sparse_logit` scoring kernel
  * (weights are a ≤`buckets`-entry literal array — broadcast-free) feeding
  * a single per-feature partial-agg gradient shuffle. The driver only ever
  * holds `buckets` longs — metadata scale, the centroids contract.
  */
object Classifier {

  /** Hashed-bigram feature counts: (doc_id, f, x). */
  private def bigramFeatures(df: DataFrame, idCol: String, textCol: String,
                             buckets: Int): DataFrame =
    graft.operators.spread(df)
      .select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("tk"))
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("tk"), lit(1), size(col("tk")) - 1).as("w1"),
        slice(col("tk"), lit(2), size(col("tk")) - 1).as("w2"))).as("bg"))
      .select(col("doc_id"),
        pmod(call_function("md5_prefix60",
          concat_ws(" ", col("bg.w1"), col("bg.w2"))),
          lit(buckets.toLong)).as("f"))
      .groupBy("doc_id", "f").agg(count(lit(1)).as("x"))

  /** z/1e9 → rational fast sigmoid, in the exact literal op order the
    * oracle mirrors. */
  private def sigma(zInt: Column): Column = {
    val z = zInt.cast("double") / lit(1.0e9)
    lit(0.5) + lit(0.5) * z / (lit(1.0) + abs(z))
  }

  /** Per-doc sparse feature table (doc_id, label, fx) — built ONCE and
    * persisted, shared by [[trainWeights]] and [[trainScoreLr]] so the
    * bit-identical-weights contract covers feature CONSTRUCTION as well as
    * the GD loop. `fx` coalesces to an EMPTY array for documents with
    * fewer than two tokens (no bigrams): their logit is then the exact 0
    * that the oracle's COALESCE(SUM(..), 0) and the streaming
    * `bigram_logit` kernel compute — a NULL fx would instead score such
    * docs NULL and silently drop them from any predicted-gated output. */
  private def featureTable(docs: DataFrame, buckets: Int): DataFrame =
    docs.select(col("doc_id"), col("label"))
      .join(bigramFeatures(docs, "doc_id", "text", buckets)
          .groupBy("doc_id")
          .agg(collect_list(struct(col("f"), col("x"))).as("fx")),
        Seq("doc_id"), "left")
      .withColumn("fx", coalesce(col("fx"),
        expr("CAST(array() AS array<struct<f:bigint,x:bigint>>)")))

  /** Train only, returning the weight vector (1e-9 units, index = bucket)
    * — the artifact the STATELESS streaming scoring twin pins before the
    * stream starts ([[graft.streaming.StreamingDedup.classifierScoreStream]]),
    * and what a real pipeline persists as "the quality model". Identical
    * loop to [[trainScoreLr]] (same feature table, same integer math, same
    * iteration count → bit-identical weights).
    *
    * CACHE-GROWTH NOTE (ADVICE r11): in the default scope the per-corpus
    * feature table stays persisted for the session (see the body comment) —
    * every DISTINCT input plan pins its own MEMORY_AND_DISK entry. A
    * long-lived session training over many different corpora must wrap each
    * call in [[CacheScope.releasing]] or the cache grows without bound. */
  def trainWeights(df: DataFrame, idCol: String, textCol: String,
                   labelCol: Column, buckets: Int = 256, iters: Int = 5,
                   etaScaled: Long = 500L): Array[Long] = {
    val docs = df.select(col(idCol).as("doc_id"), col(textCol).as("text"),
      labelCol.as("label"))
    // CacheScope-tracked like the pair generators' signature tables: in the
    // default scope the feature table stays warm for the session — the
    // p57/p62/p71 family trains over the IDENTICAL plan, so the tokenize+
    // explode+hash extraction is paid once, not once per query (the old
    // explicit unpersist forced each caller to rebuild it); long-lived
    // sessions release it via CacheScope.releasing exactly as documented.
    val docFeats = CacheScope.persistTracked(featureTable(docs, buckets))
    val n = docFeats.count()
    runGd(docFeats, n, buckets, iters, etaScaled)
  }

  /** The GD loop over a persisted (doc_id, label, fx) table — shared by
    * [[trainWeights]] and [[trainScoreLr]] so the two can never drift. */
  private def runGd(docFeats: DataFrame, n: Long, buckets: Int, iters: Int,
                    etaScaled: Long): Array[Long] = {
    val w = Array.fill(buckets)(0L)
    for (_ <- 0 until iters) {
      // e is projected BELOW the explode: in one select Spark would place
      // the scoring expression in the Project above Generate and re-run
      // the sparse_logit fold once per exploded FEATURE, not per doc
      val grads = docFeats
        .select(col("fx"),
          floor((sigma(call_function("sparse_logit", col("fx"),
              typedLit(w.toSeq))) -
            when(col("label"), lit(1.0)).otherwise(lit(0.0))) * lit(1000000.0))
            .cast("long").as("e"))
        .select(explode(col("fx")).as("p"), col("e"))
        .groupBy(col("p.f").as("f")).agg(sum(col("e") * col("p.x")).as("grad"))
        .collect() // bounded: <= buckets rows of metadata
      grads.foreach { r =>
        val f = r.getLong(0).toInt
        w(f) = w(f) - (r.getLong(1) / n) * etaScaled
      }
    }
    w
  }

  /** Train `iters` full-batch steps and score every document.
    * `labelCol` is the boolean training target. Output per doc:
    * (doc_id, z_sum BIGINT, prob, label, predicted, correct) — `predicted`
    * is integer-armed (z_sum >= 0 ⇔ prob >= 0.5). `etaScaled` is the
    * learning rate in 1e-9 weight units per 1e-6 error unit (500 ⇔ η=0.5).
    *
    * CACHE-GROWTH NOTE (ADVICE r11): same contract as [[trainWeights]] —
    * each distinct input plan pins a session-lifetime feature-table cache
    * entry unless the call is wrapped in [[CacheScope.releasing]]. */
  def trainScoreLr(df: DataFrame, idCol: String, textCol: String,
                   labelCol: Column, buckets: Int = 256, iters: Int = 5,
                   etaScaled: Long = 500L): DataFrame = {
    val docs = df.select(col(idCol).as("doc_id"), col(textCol).as("text"),
      labelCol.as("label"))
    // ONE row per document carrying its (≤ buckets-entry) sparse feature
    // list: every iteration's logit is then the map-only `sparse_logit`
    // kernel over this table — no per-iteration (doc ⋈ feats) join +
    // per-doc groupBy. The gradient pass explodes the same arrays with the
    // per-doc error attached, so each GD step is one job with a single
    // per-feature partial-agg shuffle (the old loop ran two joins and two
    // shuffles per step). Exactness is untouched: z is the same exact
    // BIGINT sum (integer adds commute), e the same floored integer.
    // CacheScope-tracked (see trainWeights): default scope keeps the table
    // warm for the session so the plan-identical p57/p62/p71 family shares
    // one feature extraction; releasing scopes drop it after the eager
    // checkpoint below materializes the result.
    val docFeats = CacheScope.persistTracked(featureTable(docs, buckets))
    val n = docFeats.count() // one job; N is part of the update rule

    // weights as an array literal (index f, 0-based) — one codegen source
    // for every iteration (the array rides the references side, not the
    // generated code), so Janino compiles the scoring stage once
    val w = runGd(docFeats, n, buckets, iters, etaScaled)
    def zCol(): Column =
      call_function("sparse_logit", col("fx"), typedLit(w.toSeq))
    // materialize the final scoring pass eagerly: a still-lazy `scored`
    // would re-run the scoring kernel (and under a releasing scope, the
    // whole feature extraction) when the caller finally evaluates. The
    // materialization is an eager LOCAL CHECKPOINT, not persist+count
    // (r8 review): a persist pins a session-lifetime CacheManager entry per
    // invocation, where checkpoint blocks free with the returned DataFrame
    // (ContextCleaner) once the caller drops it.
    docFeats
      .select(col("doc_id"), zCol().as("z_sum"), col("label"))
      .select(col("doc_id"), col("z_sum"),
        sigma(col("z_sum")).as("prob"), col("label"),
        (col("z_sum") >= 0L).as("predicted"),
        ((col("z_sum") >= 0L) === col("label")).as("correct"))
      .localCheckpoint(true)
  }

  /** Classifier EVALUATION report — the "is this filter good enough to
    * gate a corpus" check that belongs between training (p57) and gating
    * (p62): one row with the confusion counts at the z >= 0 decision
    * threshold and the ROC AUC of the score, computed EXACTLY at a fixed
    * logit-bin granularity so it is engine-reproducible (no float rank
    * statistics, no sampling).
    *
    * AUC: scores are binned by truncating integer division of the exact
    * BIGINT logit (`z_sum div binWidth`, clamped to ±(binCap+1) — monotone
    * in z, identical truncation semantics in Spark and DuckDB), then the
    * Mann-Whitney statistic with average-rank tie handling AT BIN
    * GRANULARITY is the all-integer sum U2 = Σ_b pos_b·(2·cumneg_<b +
    * neg_b); auc = U2 / (2·nPos·nNeg) is the single double division.
    * Pairs split by a bin boundary count exactly; ties inside a bin take
    * the standard half credit — the binned AUC underestimates the
    * continuous one by at most the per-bin tie mass, and `binWidth` is a
    * knob (2^22 logit units ≈ 0.004 sigmoid units at z≈0).
    *
    * Shape at 100 TB: the per-bin counts are ONE partial-agg shuffle of
    * ≤ 2·binCap+3 rows; the cumulative-negatives window runs over that
    * bounded bin table (≤4k rows — metadata scale, explicitly NOT a
    * global window over documents), and the confusion counts are one
    * order-free aggregate over the scored table. Output (one row):
    * (n_pos, n_neg, tp, fp, tn, fn, u2, auc). */
  def evalReport(scored: DataFrame, binWidth: Long = 4194304L,
                 binCap: Long = 2047L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bins = scored
      .select(greatest(lit(-binCap - 1L), least(lit(binCap),
        expr(s"z_sum div ${binWidth}L"))).as("bin"), col("label"))
      .groupBy("bin")
      .agg(sum(when(col("label"), 1L).otherwise(0L)).as("pos"),
        sum(when(!col("label"), 1L).otherwise(0L)).as("neg"))
    // bounded single-partition window: input is the ≤(2·binCap+3)-row bin
    // table, never the corpus
    val w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    val u = bins
      .withColumn("cumneg", coalesce(sum(col("neg")).over(w), lit(0L)))
      .agg(sum(col("pos") * (lit(2L) * col("cumneg") + col("neg"))).as("u2"),
        sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"))
    val conf = scored.agg(
      sum(when(col("label") && col("predicted"), 1L).otherwise(0L)).as("tp"),
      sum(when(!col("label") && col("predicted"), 1L).otherwise(0L)).as("fp"),
      sum(when(!col("label") && !col("predicted"), 1L).otherwise(0L)).as("tn"),
      sum(when(col("label") && !col("predicted"), 1L).otherwise(0L)).as("fn"))
    conf.crossJoin(broadcast(u))
      .select(col("n_pos"), col("n_neg"), col("tp"), col("fp"), col("tn"),
        col("fn"), col("u2"),
        (col("u2").cast("double") /
          (lit(2.0) * col("n_pos").cast("double") *
            col("n_neg").cast("double"))).as("auc"))
  }
}
