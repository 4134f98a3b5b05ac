package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-splitting and shard-packing operators for training-data pipelines
  * (beyond-reference tier, same design rules as [[Dedup]]: expression-only,
  * engine-portable hashing so a DuckDB oracle can mirror every stage).
  *
  * Scale design (100 TB):
  *  - split assignment is MAP-ONLY: an md5-derived hash of the salted id
  *    decides the split row-locally — no shuffle, no global state, and the
  *    assignment is reproducible across runs/engines (a re-run of the
  *    pipeline, or a different engine entirely, lands every document in the
  *    same split — the property that matters for never leaking test docs
  *    into training);
  *  - shard packing is one window per partition key (source): the running
  *    token total within each source is a partitioned cumulative sum — each
  *    source sorts independently in parallel, no global ordering. Shards are
  *    contiguous-by-id within a source, so a shard maps to one output file
  *    whose token count is bounded by budget + one document.
  */
object Shards {

  /** Per-mille bucket in [0, 1000) from the salted id — [[Dedup.mdHash31]]
    * keeps it portable (DuckDB: the same md5 prefix arithmetic). */
  def splitBucket(idCol: Column, salt: String): Column =
    pmod(Dedup.mdHash31(concat(lit(salt), idCol.cast("string"))), lit(1000L))

  /** Deterministic train/val/test assignment: adds a `split` column. Buckets
    * `[0, testPermille)` -> test, `[testPermille, testPermille+valPermille)`
    * -> val, rest -> train. Changing `salt` re-deals the split; keeping it
    * fixed makes the assignment stable under any re-partitioning or re-run. */
  def assignSplit(df: DataFrame, idCol: String, salt: String = "graft",
                  valPermille: Int = 100, testPermille: Int = 100): DataFrame = {
    val b = splitBucket(col(idCol), salt)
    df.withColumn("split",
      when(b < testPermille, lit("test"))
        .when(b < testPermille + valPermille, lit("val"))
        .otherwise(lit("train")))
  }

  /** Uniform [0,1) from the salted id — the same md5 arithmetic as
    * [[splitBucket]] at 2^31 grain. Engine-portable (DuckDB mirrors it), so
    * a sample drawn here is REPRODUCIBLE: re-runs, different engines, and
    * different partitionings all keep exactly the same rows. */
  def sampleUniform(idCol: Column, salt: String): Column =
    Dedup.mdHash31(concat(lit(salt), idCol.cast("string"))).cast("double") /
      lit(2147483648.0)

  /** Deterministic stratified Bernoulli sample: keep a row iff
    * u(id) < fraction(stratum). MAP-ONLY — no count pass, no shuffle,
    * no RNG state; the 100 TB shape for corpus downsampling. */
  def sampleStratified(df: DataFrame, idCol: String, strataCol: String,
                       fractions: Map[String, Double], defaultFraction: Double,
                       salt: String = "graft"): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
    df.filter(sampleUniform(col(idCol), salt) < frac)
  }

  /** Temperature-scaled mixture fractions (the multilingual/source-mixing
    * recipe: sampling weight q_s ∝ c_s^alpha flattens the source
    * distribution as alpha → 0): per-stratum Bernoulli fraction
    * f_s = min(1, targetRows · c_s^alpha / Σc^alpha / c_s). Two small
    * aggregates; join the result back (broadcast — strata cardinality is
    * tiny) and filter with [[sampleUniform]] to draw the mixture. */
  def mixtureFractions(df: DataFrame, strataCol: String, alpha: Double,
                       targetRows: Long): DataFrame = {
    val counts = df.groupBy(strataCol).agg(count(lit(1)).as("n"))
    val z = counts.agg(sum(pow(col("n"), alpha)).as("z"))
    counts.crossJoin(broadcast(z))
      .withColumn("fraction", least(lit(1.0),
        lit(targetRows.toDouble) * pow(col("n"), alpha) / col("z") / col("n")))
      .select(col(strataCol), col("n"), col("fraction"))
  }

  /** Draw the temperature mixture: deterministic per-row keep decision
    * against the broadcast per-stratum fractions. */
  def sampleMixture(df: DataFrame, idCol: String, strataCol: String,
                    alpha: Double, targetRows: Long,
                    salt: String = "graft"): DataFrame = {
    val fr = mixtureFractions(df, strataCol, alpha, targetRows)
      .select(col(strataCol), col("fraction"))
    df.join(broadcast(fr), Seq(strataCol))
      .filter(sampleUniform(col(idCol), salt) < col("fraction"))
      .drop("fraction")
  }

  /** Token-budget shard packing: adds `shard_id` such that consecutive (by
    * `orderCol`) documents within each `partCol` group share a shard until
    * the running token total would pass `budget`. shard_id = floor(exclusive
    * running sum / budget): every shard holds < budget + (its last doc)
    * tokens, and assignment is a pure function of the partition's order —
    * deterministic, and SQL-window expressible for the oracle. */
  def packShards(df: DataFrame, partCol: String, orderCol: String,
                 tokensCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(partCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // integral divide (`div`), not floor(double /): a partition whose token
    // total passes 2^53 would misround shard boundaries in double arithmetic
    df.withColumn("shard_id", call_function("div",
      sum(col(tokensCol)).over(w) - col(tokensCol), lit(budget)))
  }

  /** Length-bucketed BATCH planning — the sorted/bucketed dynamic batching
    * every training and inference loader runs (group sequences of similar
    * length, fill each batch to a token budget): batching random-length
    * docs pads every sequence to the batch max, and on a heavy-tailed
    * corpus most FLOPs go to pad tokens; bucketing by length bounds the
    * waste structurally.
    *
    * Layout: `len_bucket` = floor(log2(tokens))+1 (the BIT LENGTH —
    * `length(bin(tk))`, identical in Spark and DuckDB; no transcendental
    * log anywhere), so within a bucket max_len < 2·min_len and padding
    * waste is < 50% before any packing; within (partCol, len_bucket) docs
    * order by (tokens, id) and a running token sum `div budget` assigns
    * `batch_id` (the [[packShards]] integral-cumsum idiom — exact BIGINT,
    * engine-portable). Zero/negative-token docs land in bucket 0.
    *
    * Shape at 100 TB: MAP-ONLY bucket assignment + ONE window per
    * (partCol, len_bucket) — same bounded-partition-key contract as
    * [[packSequences]] (feed a source/date bucket, never a constant);
    * buckets subdivide each partition further (≤ ~40 live log2 tiers), so
    * window partitions only shrink. */
  def lengthBucketBatches(df: DataFrame, partCol: String, idCol: String,
                          tokensCol: String, budget: Long): DataFrame = {
    val bucket = when(col(tokensCol) <= 0, lit(0L))
      .otherwise(length(bin(col(tokensCol))).cast("long"))
    val w = Window.partitionBy(col(partCol), col("len_bucket"))
      .orderBy(col(tokensCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("len_bucket", bucket)
      .withColumn("batch_id", call_function("div",
        sum(col(tokensCol)).over(w) - col(tokensCol), lit(budget)))
  }

  /** Context-window SEQUENCE packing — "concatenate documents in order, cut
    * every `ctx` tokens": the step that turns a curated corpus into the
    * fixed-length training sequences a pretraining loader consumes
    * (sequences cross document boundaries; a long document spans several
    * sequences). Emits one row per (document, sequence) SPAN:
    * input columns + `seq_id` (ctx-token sequence number within the
    * partition) + `span_start` (token offset of the span INSIDE the
    * document) + `span_len` — enough to materialize every sequence by
    * slicing its member documents. Zero-token documents vanish (they
    * contribute no span) but still hold their place in the offset sum.
    *
    * Exactness: offsets are an integer cumulative sum in (partCol,
    * orderCol) order; span bounds are integer div/least/greatest — no
    * doubles anywhere, so the layout is engine-exact.
    *
    * Shape at 100 TB: same as [[packShards]] — ONE window partitioned by
    * partCol (each partition cumsums independently in parallel; feed a
    * bounded partition key — a source/date bucket or packShards' own
    * shard_id — never a constant), then a MAP-ONLY explode of each doc's
    * covered sequence range (≤ 1 + tk/ctx rows per doc; total output is
    * ~corpus_tokens/ctx spans, the training set itself). */
  def packSequences(df: DataFrame, partCol: String, orderCol: String,
                    tokensCol: String, ctx: Long): DataFrame = {
    val w = Window.partitionBy(partCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("tok_start", sum(col(tokensCol)).over(w) - col(tokensCol))
      .filter(col(tokensCol) > 0)
      .withColumn("seq_id", explode(sequence(
        expr(s"tok_start div ${ctx}L"),
        expr(s"(tok_start + $tokensCol - 1L) div ${ctx}L"))))
      .withColumn("span_start",
        greatest(col("seq_id") * ctx - col("tok_start"), lit(0L)))
      .withColumn("span_len",
        least((col("seq_id") + lit(1L)) * ctx - col("tok_start"),
          col(tokensCol)) - col("span_start"))
      .drop("tok_start")
  }

  /** Weighted sample without replacement via PRIORITY SAMPLING (Duffield,
    * Lund & Thorup, JACM'07): each row gets priority `w/u` for a uniform
    * u ∈ (0,1]; the k largest priorities are the sample. Inclusion odds are
    * proportional to weight (heavy rows near-certain, light rows
    * proportionally), which is the resampling step importance-weighting
    * schemes like DSIR (p48) call for — and unlike rejection sampling the
    * output size is EXACTLY k.
    *
    * Determinism (the [[splitBucket]] contract): u is md5-derived from the
    * salted id, so the drawn sample is a pure function of (ids, weights,
    * salt) — reproducible across runs, partitionings, and engines. The
    * priority is staged in exact integers: `(w << 20) div (h30 + 1)` with
    * h30 the salted hash folded to 30 bits — no doubles anywhere, so no
    * accumulation-order or rounding hazard. Overflow bound (documented):
    * weights must stay below 2^43 ≈ 8.8e12; p48's `w_sum` weights peak at
    * tokens-per-doc × 1e6, far inside it.
    *
    * Shape at 100 TB: the priority is MAP-ONLY; the only movement is the
    * global top-k, which Spark executes as TakeOrdered (per-partition
    * heap-k, then a k-row merge on the driver) — no sort, no shuffle of
    * the unsampled mass. */
  def prioritySample(df: DataFrame, idCol: String, weightCol: Column, k: Int,
                     salt: String = "graft"): DataFrame = {
    df.select(col(idCol), weightCol.as("weight"))
      .withColumn("h30", priorityHash(col(idCol), salt))
      .withColumn("priority", expr("weight * 1048576L div (h30 + 1L)"))
      .select(col(idCol), col("weight"), col("priority"))
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)
  }

  private def priorityHash(id: Column, salt: String): Column =
    pmod(Dedup.mdHash31(concat(lit(salt), id.cast("string"))), lit(1L << 30))

  /** [[prioritySample]] per STRATUM: exactly `kPerStratum` rows drawn from
    * every group (fewer only when a group is smaller) — the per-domain
    * quota draw of mixture recipes ("10k docs per source, weighted by
    * length/quality"), where a global sample would let one giant domain
    * starve the rest. Same all-integer md5-seeded priorities; the only
    * movement is ONE rank window partitioned by the stratum (each stratum
    * ranks independently in parallel — no global ordering anywhere).
    * Output: (idCol, strataCol, weight, priority, rk). */
  def prioritySampleStratified(df: DataFrame, idCol: String, strataCol: String,
                               weightCol: Column, kPerStratum: Int,
                               salt: String = "graft"): DataFrame = {
    val w = Window.partitionBy(strataCol)
      .orderBy(col("priority").desc, col(idCol))
    df.select(col(idCol), col(strataCol), weightCol.as("weight"))
      .withColumn("h30", priorityHash(col(idCol), salt))
      .withColumn("priority", expr("weight * 1048576L div (h30 + 1L)"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= kPerStratum)
      .select(col(idCol), col(strataCol), col("weight"), col("priority"),
        col("rk"))
  }

  /** Mixture planning END-TO-END: temperature-weighted per-stratum quotas
    * (sqrt temperature — the UniMax/mT5-style up-weighting of small
    * domains, `k_s ∝ sqrt(n_s)`) DRAWN in the same query by the
    * [[prioritySampleStratified]] machinery — the one-pass "plan the
    * mixture and materialize it" composite of data-mixture recipes.
    *
    * Exactness: `sqrt` is IEEE correctly-rounded in both engines (unlike
    * `pow`/`ln`), and the quota math floor-scales it to integers
    * (`s_k = floor(sqrt(n)*1e6)`, `quota = min(n, targetRows*s_k div Σs)`),
    * so quotas are engine-exact; the draw itself is the all-integer
    * md5-seeded priority rank. For arbitrary temperatures use
    * [[sampleMixture]] (fraction-based, not oracle-gated).
    *
    * Shape at 100 TB: one partial-agg count shuffle (strata cardinality
    * rows), a broadcast quota table, one rank window per stratum — no
    * global ordering. Output: (idCol, strataCol, weight, priority, rk,
    * n, quota) rows of the drawn mixture. */
  def mixtureDraw(df: DataFrame, idCol: String, strataCol: String,
                  weightCol: Column, targetRows: Long,
                  salt: String = "graft"): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n"))
      .withColumn("s", floor(sqrt(col("n").cast("double")) * lit(1000000.0)))
    val tot = counts.agg(sum(col("s")).as("st"))
    // quota product staged through DECIMAL(38,0): at the 100 TB design
    // point `targetRows * s` overflows BIGINT (s = floor(sqrt(n)*1e6) ~ 1e11
    // for a 1e10-row stratum; targetRows ~ 1e9 → ~1e20 > 2^63), which would
    // yield NEGATIVE quotas that silently drop whole strata. Decimal
    // multiply/int-divide are exact to 38 digits in both engines, and the
    // result is a true quota (≤ targetRows), so the Long cast never wraps.
    val quotas = counts.crossJoin(broadcast(tot))
      .withColumn("quota",
        least(col("n"),
          expr(s"(CAST(${targetRows} AS DECIMAL(38,0)) * s) div st")
            .cast("long")))
      .select(col(strataCol), col("n"), col("quota"))
    val w = Window.partitionBy(strataCol)
      .orderBy(col("priority").desc, col(idCol))
    df.select(col(idCol), col(strataCol), weightCol.as("weight"))
      .withColumn("h30", priorityHash(col(idCol), salt))
      .withColumn("priority", expr("weight * 1048576L div (h30 + 1L)"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(quotas), Seq(strataCol))
      .filter(col("rk") <= col("quota"))
      .select(col(idCol), col(strataCol), col("weight"), col("priority"),
        col("rk"), col("n"), col("quota"))
  }

  /** Deterministic FILL-IN-THE-MIDDLE split plan — the FIM transform of
    * code/infilling pretraining (Bavarian et al. 2022, "Efficient Training
    * of Language Models to Fill in the Middle"): a `fimPermille`/1000
    * fraction of documents is split at two uniform token cuts into
    * (prefix, middle, suffix), half of those in PSM order and half SPM;
    * the rest stay plain autoregressive. Where the recipe draws its cuts
    * from an RNG, this plan derives everything from md5 of (salt, id) —
    * the [[splitBucket]] determinism contract: re-runs, re-partitionings,
    * and the DuckDB oracle all place identical cuts. Cut points are two
    * independent uniforms over [0, tk] sorted (least/greatest), exactly
    * the published recipe's `sorted(rng.randint(0, len, 2))`. Output: one
    * row per input doc — (idCol, tk, fim_mode 'psm'|'spm'|'ar', prefix_len,
    * middle_len, suffix_len); zero-length pieces are legal, as in the
    * paper (empty middle still trains the sentinel layout).
    *
    * Shape at 100 TB: MAP-ONLY — three md5 evaluations and integer
    * min/max per row, no shuffle, no RNG state. */
  def fimSplitPlan(df: DataFrame, idCol: String, tokensCol: String,
                   fimPermille: Long = 900L, spmPermille: Long = 500L,
                   salt: String = "graft"): DataFrame = {
    val tk = col(tokensCol).cast("long")
    val cutA = pmod(Dedup.mdHash31(
      concat(lit(salt), col(idCol).cast("string"), lit("_c1"))), tk + 1L)
    val cutB = pmod(Dedup.mdHash31(
      concat(lit(salt), col(idCol).cast("string"), lit("_c2"))), tk + 1L)
    val isFim = splitBucket(col(idCol), salt + "fim") < fimPermille
    val isSpm = splitBucket(col(idCol), salt + "spm") < spmPermille
    df.withColumn("cut1", when(isFim, least(cutA, cutB)).otherwise(tk))
      .withColumn("cut2", when(isFim, greatest(cutA, cutB)).otherwise(tk))
      .withColumn("fim_mode",
        when(!isFim, lit("ar")).when(isSpm, lit("spm")).otherwise(lit("psm")))
      .withColumn("prefix_len", col("cut1"))
      .withColumn("middle_len", col("cut2") - col("cut1"))
      .withColumn("suffix_len", tk - col("cut2"))
      .drop("cut1", "cut2")
  }

  /** Deterministic SPAN-CORRUPTION plan — the mask layout a T5/UL2-style
    * denoising objective needs per document: ~`noisePermille`/1000 of the
    * tokens covered by `meanSpan`-length spans, one row per span
    * (span_ix, span_start, span_len). Where the published recipes draw
    * spans randomly (and must merge overlaps), this plan is a pure
    * function of (id, salt): the document divides into n_spans equal
    * token segments (n_spans = tk·noisePermille div (1000·meanSpan)) and
    * each segment places ONE span at an md5-jittered offset — spans can
    * never overlap by construction, every placement is reproducible
    * across runs/engines (the [[splitBucket]] determinism contract), and
    * the corruption rate is exact: 3·(tk div 20) tokens at the defaults.
    * Segments shorter than meanSpan (degenerate parameters) emit nothing.
    *
    * Shape at 100 TB: MAP-ONLY — an explode of ≤ tk·noise/(1000·span)
    * rows per doc, integer div/mod arithmetic, no shuffle anywhere. */
  def spanCorruptionPlan(df: DataFrame, idCol: String, tokensCol: String,
                         noisePermille: Long = 150L, meanSpan: Long = 3L,
                         salt: String = "graft"): DataFrame = {
    df.withColumn("n_spans",
        expr(s"CAST($tokensCol AS BIGINT) * ${noisePermille}L div ${1000L * meanSpan}L"))
      .filter(col("n_spans") > 0)
      .withColumn("span_ix", explode(sequence(lit(0L), col("n_spans") - 1)))
      .withColumn("seg_start", expr(s"span_ix * CAST($tokensCol AS BIGINT) div n_spans"))
      .withColumn("seg_len",
        expr(s"(span_ix + 1L) * CAST($tokensCol AS BIGINT) div n_spans") - col("seg_start"))
      .filter(col("seg_len") >= meanSpan)
      .withColumn("span_start", col("seg_start") +
        pmod(Dedup.mdHash31(concat(lit(salt), col(idCol).cast("string"),
          lit("_"), col("span_ix").cast("string"))),
          col("seg_len") - lit(meanSpan) + 1L))
      .withColumn("span_len", lit(meanSpan))
      .drop("seg_start", "seg_len")
  }
}
