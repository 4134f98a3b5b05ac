package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshims.SqlShims
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication — the streaming twin of
  * `graft.operators.Dedup.dedupExact` (same md5 content fingerprint), for
  * the arrival-ordered ingest case: the FIRST document seen with a given
  * fingerprint is kept, later copies are dropped.
  *
  * Scale design: `dropDuplicatesWithinWatermark` bounds the dedup state —
  * fingerprints older than the watermark age out of the state store, so an
  * unbounded stream never accumulates unbounded state. The trade (exactly
  * the documented Spark semantic) is that a duplicate arriving later than
  * the watermark delay re-enters; the batch operator is the ground truth
  * for bounded data (parity spec runs both over the same input).
  */
object StreamingDedup {

  /** Streaming twin of [[graft.operators.Urls.dedupByUrl]]: keep the
    * first-seen document per CANONICAL URL within the watermark. The
    * canonical form ([[graft.operators.Urls.urlNormalize]]) is a map-only
    * expression, so rows flow straight to the dedup operator; state is one
    * md5 of the canonical URL (32 hex chars) per distinct URL within the
    * watermark — the same fixed-width-state choice as the exact/paragraph
    * tiers, independent of URL length. Adds the `url_fp` column (null for
    * non-URL rows). Rows WITHOUT a parseable URL bypass the dedup state on
    * a map-only branch and are kept unconditionally, like the batch twin —
    * a shared null/placeholder key would otherwise collapse every URL-less
    * document onto one first arrival. */
  def dedupByUrlStream(docs: DataFrame, tsCol: String, urlCol: String,
                       watermark: String): DataFrame = {
    import graft.operators.Urls
    val urls = docs.filter(Urls.isUrl(col(urlCol)))
      .withColumn("url_fp", md5(Urls.urlNormalize(col(urlCol))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("url_fp")
    val nonUrls = docs.filter(!Urls.isUrl(col(urlCol)))
      .withColumn("url_fp", lit(null).cast("string"))
    urls.unionByName(nonUrls)
  }

  /** Keep the first-seen document per content fingerprint; state bounded by
    * `watermark` (e.g. "10 minutes"). Adds the `fp` fingerprint column. */
  def dedupExactStream(docs: DataFrame, tsCol: String, textCol: String,
                       watermark: String): DataFrame =
    docs.withColumn("fp", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming twin of [[graft.operators.Dedup.snapshotDedup]] — continuous
    * snapshot ingest against an accumulated corpus: rows whose content
    * fingerprint already exists in the (static) corpus fingerprint table
    * are dropped by a stream-static LEFT-ANTI join, and the
    * within-snapshot first-wins rule is the bounded watermark state of
    * [[dedupExactStream]]. The anti join runs BEFORE the stateful
    * operator, so corpus-seen rows never enter the state store — on a
    * recrawl-heavy stream (the common case: most of crawl N+1 was already
    * in the corpus) state holds only the genuinely-new fingerprints.
    * Survivors carry `fp`, ready to append to the corpus table for the
    * next snapshot — the same close-the-loop contract as the batch twin. */
  def snapshotDedupStream(snap: DataFrame, corpusFps: DataFrame,
                          tsCol: String, textCol: String,
                          watermark: String): DataFrame =
    snap.withColumn("fp", md5(col(textCol)))
      .join(corpusFps.select(col("fp")), Seq("fp"), "left_anti")
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming CORPUS CARD — the ingest-monitoring twin of the batch
    * per-source datasheet (p68): tumbling event-time windows of per-source
    * doc/token/short-doc counts, the live view a 100 TB ingest pipeline
    * watches to catch a source going bad (token mass collapsing, short-doc
    * share spiking) while the crawl is still running. All aggregates are
    * order-free integer sums, so a closed window's row equals the batch
    * groupBy over the same slice (parity spec). State: one small count
    * buffer per (window, source) — bounded by the watermark, sources ×
    * windows-in-flight rows, no per-doc state. */
  def corpusCardStream(docs: DataFrame, tsCol: String, srcCol: String,
                       textCol: String, watermark: String,
                       windowDur: String): DataFrame = {
    import graft.operators.TextOps
    val tk = TextOps.tokenCount(col(textCol)).cast("long")
    docs.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col(srcCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(tk).as("n_tokens"),
        sum(when(tk < 20L, 1L).otherwise(0L)).as("n_short"))
  }

  /** Streaming curation pipeline — the streaming twin of the batch cleaning
    * composition (the p17/p46 shape): encoding-artifact gate
    * ([[graft.operators.TextOps.encodingArtifacts]] `looks_clean`) +
    * quality-score threshold, then first-seen exact dedup within the
    * watermark. Both gates are map-only scalar projections — rows that fail
    * them never reach the stateful operator, so the ONLY state is the
    * bounded dedup fingerprint store (smaller than plain dedupExactStream:
    * dirty/low-quality rows don't take a state slot). Adds `q` (quality)
    * and `fp` columns. */
  def cleanStream(docs: DataFrame, tsCol: String, textCol: String,
                  watermark: String, minQuality: Double = 0.3): DataFrame = {
    import graft.operators.TextOps
    val gated = docs
      .filter(TextOps.encodingArtifacts(col(textCol)).getField("looks_clean"))
      .withColumn("q", TextOps.qualityScore(col(textCol)))
      .filter(col("q") >= minQuality)
    dedupExactStream(gated, tsCol, textCol, watermark)
  }

  /** Streaming decontamination — the streaming twin of
    * [[graft.operators.Dedup.decontaminateBloom]]: every arriving document
    * is probed against a PRE-BUILT benchmark Bloom filter
    * ([[graft.operators.Dedup.benchBloomWords]] — pinned before the stream
    * starts, the same frozen-reference contract as the SemDeDup twin's
    * centroids) and dropped when `minShared` or more of its distinct
    * shingles hit. COMPLETELY STATELESS: the verdict is one scalar
    * expression per row (the Bloom rides as a literal, `bloom_contains`
    * probes inside codegen), so there is no state store, no watermark, and
    * the operator composes freely before any stateful stage. Same
    * no-false-negative guarantee as the batch tier: every exact n-gram hit
    * is a Bloom hit; over-drops at the FP rate — the safe direction. */
  def decontaminateBloomStream(docs: DataFrame, textCol: String,
                               bloom: Seq[Long], numHashes: Int = 5,
                               n: Int = 3, minShared: Long = 1L): DataFrame = {
    import graft.operators.{Dedup, TextOps}
    val shs = TextOps.wordShinglesFromTokens(TextOps.tokens(col(textCol)), n)
    val hits = size(filter(shs, sh =>
      call_function("bloom_contains", typedLit(bloom), Dedup.mdHash31(sh),
        lit(numHashes)))).cast("long")
    docs.withColumn("n_shared", hits).filter(col("n_shared") < minShared)
  }

  /** Streaming EMBEDDING decontamination — the streaming twin of
    * [[graft.operators.Similarity.embeddingDecontaminate]]: rows whose
    * cosine to ANY pinned eval vector reaches `minSim` drop. The eval side
    * is unit-normalized on the driver and rides as expression literals
    * (bounded — real eval sets are 10^3..10^5 vectors; beyond literal
    * size, shard the list across chained filters), so this too is a
    * STATELESS map-only filter. Zero-norm rows keep (no direction to
    * match). Adds `max_test_sim`. */
  def embedDecontaminateStream(docs: DataFrame, vecCol: String,
                               testVecs: Seq[Seq[Double]],
                               minSim: Double): DataFrame = {
    import graft.operators.Similarity
    require(testVecs.nonEmpty, "empty eval set")
    val units = testVecs.map { t =>
      val n = math.sqrt(t.map(x => x * x).sum)
      if (n > 0) t.map(_ / n) else t
    }
    val v = Similarity.toDoubleVec(col(vecCol))
    val nrm = call_function("vec_norm", v)
    val sims = units.map(t => call_function("vec_dot", v, typedLit(t)) / nrm)
    val maxSim = if (sims.size == 1) sims.head else greatest(sims: _*)
    docs.withColumn("max_test_sim",
        when(nrm > 0, maxSim).otherwise(lit(0.0)))
      .filter(col("max_test_sim") < minSim)
  }

  /** Streaming quality-classifier scoring — the streaming twin of
    * [[graft.operators.Classifier.trainScoreLr]]'s scoring half: every
    * arriving document is scored under PINNED trained weights
    * ([[graft.operators.Classifier.trainWeights]] — trained on a reference
    * corpus before the stream starts, the frozen-model contract of every
    * deployed quality filter). COMPLETELY STATELESS: the logit is the one
    * compiled `bigram_logit` kernel pass (weights ride as an expression
    * literal, Σ w[md5_prefix60(bigram) mod buckets] — each bigram
    * occurrence contributes its bucket weight once, exactly the batch
    * side's integer z), so there is no state store and the gate composes
    * before any stateful stage. Adds `z_sum`/`prob`/`predicted`; rows
    * with z_sum < minZ drop. */
  def classifierScoreStream(docs: DataFrame, textCol: String,
                            weights: Seq[Long], minZ: Long = 0L): DataFrame = {
    import graft.operators.TextOps
    val z = call_function("bigram_logit", TextOps.tokens(col(textCol)),
      typedLit(weights), lit(weights.size))
    val zd = col("z_sum").cast("double") / lit(1.0e9)
    docs.withColumn("z_sum", z)
      .withColumn("prob", lit(0.5) + lit(0.5) * zd / (lit(1.0) + abs(zd)))
      .withColumn("predicted", col("z_sum") >= lit(0L))
      .filter(col("z_sum") >= lit(minZ))
  }

  final case class PackIn(part: String, id: Long, ts: Timestamp, tk: Long)
  final case class PackSpan(part: String, doc_id: Long, ts: Timestamp,
                            tk: Long, seq_id: Long, span_start: Long,
                            span_len: Long)
  final case class PackState(offset: Long)

  /** Streaming sequence packing — the streaming twin of
    * [[graft.operators.Shards.packSequences]]: documents arriving on a
    * partition key are concatenated in arrival order and cut into
    * fixed-`ctx`-token training sequences, emitting the same
    * (doc, sequence) span rows the batch layout produces. State is ONE
    * Long per partition key (the running token offset) — bounded by the
    * partition-key cardinality, never by stream length, so there is no
    * watermark and no timeout: a shard packer runs for the stream's life
    * and sequence ids keep monotonically growing across micro-batches
    * (checkpoint restart resumes the offset).
    *
    * Ordering contract: batch packs in (partCol, orderCol) order; a stream
    * packs in ARRIVAL order — within one micro-batch group invocation rows
    * process in (ts, id) order, so feeding the batch input in its batch
    * order reproduces the batch layout exactly (parity spec). Zero-token
    * documents emit nothing but hold their place in the offset sum, like
    * the batch twin. */
  def packSequencesStream(docs: DataFrame, partCol: String, idCol: String,
                          tsCol: String, tokensCol: String,
                          ctx: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(partCol).cast("string").as("part"),
        col(idCol).cast("long").as("id"),
        col(tsCol).cast("timestamp").as("ts"),
        col(tokensCol).cast("long").as("tk"))
      .as[PackIn]
      .groupByKey(_.part)
      .flatMapGroupsWithState[PackState, PackSpan](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (part: String, rows: Iterator[PackIn], state: GroupState[PackState]) =>
          var off = state.getOption.map(_.offset).getOrElse(0L)
          val out = Seq.newBuilder[PackSpan]
          rows.toSeq.sortBy(r => (r.ts.getTime, r.id)).foreach { r =>
            if (r.tk > 0) {
              var s = off / ctx
              val s1 = (off + r.tk - 1) / ctx
              while (s <= s1) {
                val start = math.max(s * ctx - off, 0L)
                val len = math.min((s + 1) * ctx - off, r.tk) - start
                out += PackSpan(part, r.id, r.ts, r.tk, s, start, len)
                s += 1
              }
            }
            off += r.tk
          }
          state.update(PackState(off))
          out.result().iterator
      }.toDF()
  }

  /** Streaming NEAR-duplicate dedup — the streaming twin of
    * `Dedup.dedupNear`, at candidate level: a document is kept iff NONE of
    * its MinHash-LSH band keys was claimed by an earlier document within the
    * watermark. Emits (id, window_start) rows for the kept documents once
    * the watermark passes their window.
    *
    * Semantics vs batch: the batch operator verifies candidates with exact
    * Jaccard; a stream cannot re-join shingle sets against an unbounded
    * history, so this drops on band COLLISION alone — precision < 1 by
    * design (an unlucky band collision drops a non-duplicate), recall
    * follows the same 1-(1-s^r)^b LSH curve, and identical/near-identical
    * docs are always caught. The spec checks exact parity against a
    * sequential replay of the same policy.
    *
    * Scale/state design:
    *  - the signature is MAP-ONLY (`Dedup.rowMinhashSig` — a scalar
    *    projection, no blocking aggregate), so rows flow straight to the
    *    dedup operator;
    *  - state is one entry per (band, bucket) seen within the watermark —
    *    `dropDuplicatesWithinWatermark` ages them out;
    *  - the "claimed ALL `bands` of its keys" vote is a watermarked window
    *    aggregate (Spark's multiple-stateful-operator pipeline), emitting
    *    exactly-once per document in append mode.
    */
  def dedupNearStream(docs: DataFrame, tsCol: String, idCol: String,
                      textCol: String, watermark: String,
                      n: Int = 3, k: Int = 64, bands: Int = 16,
                      windowDur: String = "10 seconds"): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    import graft.operators.{Dedup, TextOps}
    val toked = docs.withColumn("toks", TextOps.tokens(col(textCol)))
    val sets = toked
      .filter(size(col("toks")) >= n)
      .withColumn("shingles", TextOps.wordShinglesFromTokens(col("toks"), n))
      .withColumn("sig", Dedup.rowMinhashSig(col("shingles"), k))
    val bandRows = sets.select(col(idCol), col(tsCol),
      posexplode(Dedup.bandKeys(col("sig"), k, bands)))
      .toDF(idCol, tsCol, "band", "bh")
    val claims = bandRows
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("band", "bh")
    val voted = claims
      .groupBy(window(col(tsCol), windowDur), col(idCol))
      .agg(count(lit(1)).as("n_claimed"))
      .filter(col("n_claimed") === bands)
      .select(col(idCol), col("window.start").as("w_start"))
    // docs too short to shingle can't near-dup — the batch twin keeps them
    // (they produce no pairs and survive the anti join), so the stream does
    // too: a stateless map-only branch, emitted immediately
    val short = toked.filter(size(col("toks")) < n)
      .select(col(idCol), window(col(tsCol), windowDur).getField("start").as("w_start"))
    voted.unionByName(short)
  }

  /** Streaming paragraph dedup — the streaming twin of
    * `Dedup.dedupParagraphs`: a paragraph is kept only at its FIRST ARRIVAL
    * within the watermark (arrival order, not (id, pos) order — the same
    * documented divergence as the exact/near tiers); each document is
    * rebuilt from its surviving paragraphs in original order and emitted
    * once the watermark passes its window. A document whose every paragraph
    * was already claimed produces NO output row (absence = fully
    * deduplicated — a stream cannot emit an empty rebuild for a doc whose
    * rows were all dropped upstream).
    *
    * State: one md5 fingerprint entry per distinct paragraph within the
    * watermark (`dropDuplicatesWithinWatermark` on the fingerprint, not the
    * paragraph text — state stores 32 hex chars however long the paragraph
    * is), plus the windowed rebuild aggregate. */
  def dedupParagraphsStream(docs: DataFrame, tsCol: String, idCol: String,
                            textCol: String, watermark: String,
                            sep: String = "\n",
                            windowDur: String = "10 seconds"): DataFrame = {
    val posts = docs.select(col(idCol).as("id"), col(tsCol).as("ts"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))))
      .toDF("id", "ts", "pos", "para")
      .withColumn("fp", md5(col("para")))
    val claims = posts
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
    claims.groupBy(window(col("ts"), windowDur), col("id"))
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("para")))),
          e => e.getField("para")), sep).as("text_kept"),
        count(lit(1)).as("n_kept"))
      .select(col("id").as(idCol), col("window.start").as("w_start"),
        col("text_kept"), col("n_kept"))
  }

  /** One LSH-band row headed into the verify state: the doc's id, event
    * time, bucket key, and its full shingle-fingerprint set. */
  final case class BandRow(id: Long, ts: Timestamp, band: Int, bh: String,
                           fps: Array[Int])
  final case class BucketOwner(ownerId: Long, ownerTsMs: Long)
  /** Phase-1 input row: fingerprints ride only band-0 rows (`fps` null
    * elsewhere) — one registration carrier per doc, not `bands`. */
  final case class P1Row(id: Long, ts: Timestamp, band: Int, bh: String,
                         fps: Array[Int])
  /** Row between the verify stages. kind 0 = registration (doc's own
    * fingerprints, also the presence signal); kind 1 = verify request
    * (loser id in `id`, owner in `aux`, loser fps attached by stage A). */
  final case class StageRow(key: Long, id: Long, ts: Timestamp, kind: Int,
                            fps: Array[Int], aux: Long)
  /** Verify-stage state: the doc's fingerprints plus the max event time
    * observed for this key — timeouts derive from it so an out-of-order row
    * can never move an existing timeout earlier. */
  final case class StageState(fps: Array[Int], maxTsMs: Long)
  /** Bucket state: the first claimant and its fingerprints (bounded: one
    * doc's shingle set per live bucket, aged out by event-time timeout). */
  final case class BucketState(ownerId: Long, ownerTsMs: Long, fps: Array[Int])
  final case class VerifyOut(id: Long, ts: Timestamp, is_dup: Boolean)

  /** Spark's static chained-stateful-operator check rejects ANY aggregation
    * downstream of flatMapGroupsWithState because it cannot infer what event
    * times the user function emits. The verified tiers are provably safe:
    * every emitted row carries the INPUT row's own ts unchanged, and input
    * rows older than the watermark were already dropped by the late-record
    * filter — so no emission is ever late for the downstream aggregate.
    * The flag is session-scoped and read at query start, so instead of
    * mutating the caller's session it is disabled on a PRIVATE CLONE; the
    * input plan is re-bound there and every other query on the caller's
    * session keeps the static check. Queries started from the returned
    * DataFrame run in the clone — a memory sink's table is reachable via
    * `df.sparkSession.table(...)` (or the started query's `sparkSession`). */
  private def relaxedCheckSession(spark: SparkSession): SparkSession = {
    val local = SqlShims.cloneSession(spark)
    local.conf.set(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    local
  }

  /** Streaming near-dedup with an EXACT-VERIFY tier — precision restored to
    * 1 within the watermark: a band collision alone no longer drops a doc;
    * the colliding doc is compared against the bucket owner's stored
    * shingle-fingerprint set and dropped only when true Jaccard ≥
    * `minJaccard`. (The collision-only tier [[dedupNearStream]] trades that
    * precision away for stateless buckets; this tier pays one doc's
    * fingerprint set per live bucket to keep it.)
    *
    * Policy (deterministic, sequentially replayable — the spec's ground
    * truth): docs process in (ts, id) order; the first arrival in a bucket
    * owns it for the watermark lifetime regardless of its own verdict;
    * later arrivals exact-verify against the owner; a doc is dropped iff
    * ANY of its `bands` buckets verifies it against that bucket's owner.
    *
    * Scale/state design: signatures stay map-only; state is one
    * (owner id, fingerprint set) per live (band, bucket) — `bands`× one
    * doc's shingles per bucket, bounded by the event-time timeout that
    * mirrors `dropDuplicatesWithinWatermark` aging; the final keep/drop
    * vote is the same watermarked window aggregate as the collision tier
    * (multiple stateful operators, append mode). */
  def dedupNearStreamVerified(docs: DataFrame, tsCol: String, idCol: String,
                              textCol: String, watermarkDelayMs: Long,
                              minJaccard: Double = 0.5,
                              n: Int = 3, k: Int = 64, bands: Int = 16,
                              windowDur: String = "10 seconds")
                             (implicit spark: SparkSession): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    import graft.operators.{Dedup, TextOps}
    val watermark = s"$watermarkDelayMs milliseconds"
    // see relaxedCheckSession: the check disable lives in a private clone,
    // not the caller's session
    val local = relaxedCheckSession(spark)
    import local.implicits._
    val toked = SqlShims.ofRows(local, docs.queryExecution.logical)
      .withColumn("toks", TextOps.tokens(col(textCol)))
    val sets = toked
      .filter(size(col("toks")) >= n)
      .withColumn("shingles", TextOps.wordShinglesFromTokens(col("toks"), n))
      // 31-bit fingerprints fit Int: HALF the shuffle/state bytes of longs
      .withColumn("fps", transform(col("shingles"), c => Dedup.mdHash31(c).cast("int")))
      .withColumn("sig", Dedup.rowMinhashSig(col("shingles"), k))
    val bandRows = sets.select(col(idCol).as("id"), col(tsCol).as("ts"),
        posexplode(Dedup.bandKeys(col("sig"), k, bands)).as(Seq("band", "bh")),
        col("fps"))
      .withWatermark("ts", watermark)
      .as[BandRow]

    val verdicts = bandRows
      .groupByKey(r => (r.band, r.bh))
      .flatMapGroupsWithState[BucketState, VerifyOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: (Int, String), rows: Iterator[BandRow], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.id))
            var st = state.getOption
            val out = Seq.newBuilder[VerifyOut]
            sorted.foreach { r =>
              st match {
                case None =>
                  st = Some(BucketState(r.id, r.ts.getTime, r.fps))
                  out += VerifyOut(r.id, r.ts, is_dup = false)
                case Some(owner) =>
                  val a = r.fps.toSet
                  val b = owner.fps.toSet
                  val inter = a.intersect(b).size.toDouble
                  val jac = inter / (a.size + b.size - inter)
                  out += VerifyOut(r.id, r.ts, is_dup = r.id != owner.ownerId
                    && jac >= minJaccard)
              }
            }
            st.foreach { s =>
              state.update(s)
              // expire with the same clock as dropDuplicatesWithinWatermark:
              // when the watermark passes owner-arrival + delay (kept above
              // the current watermark, which Spark requires)
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs() + 1,
                s.ownerTsMs + watermarkDelayMs))
            }
            out.result().iterator
          }
      }

    // a doc is kept iff none of its `bands` verdicts flagged it (watermark
    // re-declared: it does not propagate through flatMapGroupsWithState)
    val voted = verdicts.toDF()
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("id"))
      .agg(max(when(col("is_dup"), 1).otherwise(0)).as("flagged"))
      .filter(col("flagged") === 0)
      .select(col("id").as(idCol), col("window.start").as("w_start"))

    val short = toked.filter(size(col("toks")) < n)
      .select(col(idCol), window(col(tsCol), windowDur).getField("start").as("w_start"))
    voted.unionByName(short)
  }

  /** STAGED exact-verify near-dedup — identical policy and output to
    * [[dedupNearStreamVerified]], restructured for scale: bucket claims run
    * on NARROW band rows (bucket state = two longs, not a fingerprint set),
    * and fingerprint sets travel ONCE per stage — attached to band-0 rows
    * into phase 1, re-registered through stages A and B, and fanned out only
    * to actual collisions. The common case (a doc colliding nowhere) never
    * ships its fingerprints to `bands` buckets.
    *
    * Topology notes (hard-won):
    *  - a stream-stream join downstream of flatMapGroupsWithState
    *    permanently pins Spark's simulated watermark (windows never close);
    *  - so does a UNION of watermark branches at different stateful depths;
    *  - a LINEAR chain of flatMapGroupsWithState stages, each re-declaring
    *    the watermark and each emitting every input event time, propagates
    *    correctly — which is why phase 1 emits the registrations itself
    *    (from the band-0 rows) instead of unioning a side branch in.
    *
    * Stage A (keyed by loser id) attaches the loser's stored fingerprints to
    * its collisions; stage B (keyed by owner id) exact-verifies against the
    * owner's. The same windowed vote keeps every unflagged doc. Like the
    * one-phase tier, the chained-stateful-operator check is relaxed in a
    * private session clone (see [[relaxedCheckSession]]) — the caller's
    * session keeps the check. */
  def dedupNearStreamVerifiedStaged(docs: DataFrame, tsCol: String,
                                    idCol: String, textCol: String,
                                    watermarkDelayMs: Long,
                                    minJaccard: Double = 0.5,
                                    n: Int = 3, k: Int = 64, bands: Int = 16,
                                    windowDur: String = "10 seconds")
                                   (implicit spark: SparkSession): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    import graft.operators.{Dedup, TextOps}
    val watermark = s"$watermarkDelayMs milliseconds"
    val local = relaxedCheckSession(spark)
    import local.implicits._
    val toked = SqlShims.ofRows(local, docs.queryExecution.logical)
      .withColumn("toks", TextOps.tokens(col(textCol)))
    val sets = toked
      .filter(size(col("toks")) >= n)
      .withColumn("shingles", TextOps.wordShinglesFromTokens(col("toks"), n))
      .withColumn("fps", array_distinct(
        transform(col("shingles"), c => Dedup.mdHash31(c).cast("int"))))
      .withColumn("sig", Dedup.rowMinhashSig(col("shingles"), k))

    // band rows: fingerprints ride ONLY band 0 (the registration carrier)
    val bandRows = sets.select(col(idCol).as("id"), col(tsCol).as("ts"),
        posexplode(Dedup.bandKeys(col("sig"), k, bands)).as(Seq("band", "bh")),
        col("fps"))
      .select(col("id"), col("ts"), col("band"), col("bh"),
        when(col("band") === 0, col("fps")).as("fps"))
      .withWatermark("ts", watermark)
      .as[P1Row]

    // phase 1: bucket ownership; emits collisions AND (from band-0 rows)
    // the doc registrations that both carry fingerprints downstream and
    // keep every event time visible to the downstream watermark
    val p1out = bandRows
      .groupByKey(r => (r.band, r.bh))
      .flatMapGroupsWithState[BucketOwner, StageRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: (Int, String), rows: Iterator[P1Row], state: GroupState[BucketOwner]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.id))
            var st = state.getOption
            val out = Seq.newBuilder[StageRow]
            sorted.foreach { r =>
              if (r.band == 0)
                out += StageRow(r.id, r.id, r.ts, 0, r.fps, -1L)
              st match {
                case None => st = Some(BucketOwner(r.id, r.ts.getTime))
                case Some(o) =>
                  if (r.id != o.ownerId)
                    out += StageRow(r.id, r.id, r.ts, 1, null, o.ownerId)
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs() + 1, s.ownerTsMs + watermarkDelayMs))
            }
            out.result().iterator
          }
      }.toDF().withWatermark("ts", watermark)

    def stage(in: org.apache.spark.sql.Dataset[StageRow],
              emit: (StageRow, Option[Array[Int]]) => Iterator[StageRow]) =
      in.groupByKey(_.key)
        .flatMapGroupsWithState[StageState, StageRow](
          OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
          (_: Long, rows: Iterator[StageRow], state: GroupState[StageState]) =>
            if (state.hasTimedOut) { state.remove(); Iterator.empty }
            else {
              // registrations (kind 0) first within equal timestamps, so a
              // doc's fingerprints are in state before its own collisions
              val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.kind, r.id))
              val out = Seq.newBuilder[StageRow]
              sorted.foreach { r =>
                val prevMax = state.getOption.map(_.maxTsMs).getOrElse(Long.MinValue)
                if (r.kind == 0)
                  state.update(StageState(r.fps, math.max(prevMax, r.ts.getTime)))
                else state.getOption.foreach(s =>
                  state.update(s.copy(maxTsMs = math.max(prevMax, r.ts.getTime))))
                out ++= emit(r, state.getOption.map(_.fps))
              }
              // timeout from the state-held max — NEVER derived from just
              // this invocation's rows, which could move an existing timeout
              // EARLIER when an out-of-order (older-ts) row arrives and
              // expire a registration while phase-1 buckets still own
              state.getOption.foreach(s =>
                state.setTimeoutTimestamp(math.max(
                  state.getCurrentWatermarkMs() + 1,
                  s.maxTsMs + watermarkDelayMs)))
              out.result().iterator
            }
        }

    // stage A keyed by LOSER id: attach the loser's fingerprints
    val stageA = stage(p1out.as[StageRow], {
      case (r, _) if r.kind == 0 => Iterator.single(r) // registration passthrough
      case (r, Some(loserFps))   =>
        Iterator.single(StageRow(r.aux, r.id, r.ts, 1, loserFps, r.aux))
      case _                     => Iterator.empty // no registration: drop
    }).toDF().withWatermark("ts", watermark)

    // stage B keyed by OWNER id: exact-verify loser vs owner fingerprints
    val stageB = stage(stageA.as[StageRow], {
      case (r, _) if r.kind == 0 =>
        Iterator.single(r.copy(fps = null)) // presence only: no payload downstream
      case (r, Some(ownerFps))   =>
        val a = r.fps.toSet
        val b = ownerFps.toSet
        val inter = a.intersect(b).size.toDouble
        val jac = inter / (a.size + b.size - inter)
        if (jac >= minJaccard)
          Iterator.single(StageRow(r.id, r.id, r.ts, 2, null, -1L))
        else Iterator.empty
      case _                     => Iterator.empty
    }).toDF().withWatermark("ts", watermark)

    val votes = stageB.select(col("id"), col("ts"),
      when(col("kind") === 2, 1).otherwise(0).as("flag"))
    val voted = votes
      .groupBy(window(col("ts"), windowDur), col("id"))
      .agg(max(col("flag")).as("flagged"))
      .filter(col("flagged") === 0)
      .select(col("id").as(idCol), col("window.start").as("w_start"))

    val short = toked.filter(size(col("toks")) < n)
      .select(col(idCol), window(col(tsCol), windowDur).getField("start").as("w_start"))
    voted.unionByName(short)
  }
}
