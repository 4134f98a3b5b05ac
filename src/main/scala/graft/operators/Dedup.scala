package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deduplication operators for training-data pipelines, all expressed as
  * `DataFrame => DataFrame` transformations built from Catalyst expressions
  * (no UDFs — everything stays in whole-stage codegen).
  *
  * Scale design (100 TB):
  *  - exact dedup is one hash-shuffle on the fingerprint;
  *  - shingle-Jaccard is the inverted-index pattern: explode shingles, hash
  *    join on shingle, aggregate pair counts — linear in total postings, with
  *    an optional document-frequency cap to bound hot-shingle skew;
  *  - MinHash-LSH replaces the all-pairs join with per-band bucket joins:
  *    candidates are only generated inside buckets, then verified exactly;
  *  - SimHash bands the 64-bit signature into 16-bit chunks (pigeonhole: any
  *    pair within Hamming distance 3 shares at least one of 4 chunks).
  *
  * Persist lifecycle: the pair generators cache intermediates (shingle sets,
  * signatures, capped postings) through [[CacheScope.persistTracked]]. In a
  * one-shot session that is plain `persist` (released at exit). A LONG-LIVED
  * session should wrap calls in `CacheScope.releasing { ... }`, which
  * materializes the result and unpersists every intermediate — see
  * [[CacheScope]] for the contract ([[graft.operators.CacheLifecycleSpec]]
  * gates it).
  */
object Dedup {

  /** Exact duplicate groups keyed by content fingerprint. Returns one row per
    * distinct content: (fp, keep_id = min id, n_copies). One shuffle. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextOps.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Survivors of exact dedup: first (min-id) row per distinct content.
    * Implemented as a min-id semi-join so arbitrary payload columns survive
    * without a wide shuffle of the whole row through an agg buffer. */
  def dedupExact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactGroups(df, idCol, textCol).select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** INCREMENTAL SNAPSHOT dedup — the "crawl N+1 against the accumulated
    * corpus" operation every periodically-refreshed corpus needs: keep a
    * snapshot row iff (a) its content fingerprint does not already exist in
    * the corpus, and (b) it is the first (min-id) holder of that fingerprint
    * within the snapshot itself. Returns the surviving snapshot rows with
    * their `fp` attached (so the caller can append them to the corpus
    * fingerprint table, which is how the corpus side stays a compact
    * fingerprint-only table across snapshots rather than a re-hash of all
    * prior text).
    *
    * Shape at 100 TB: the corpus side is the accumulated FINGERPRINT table
    * (16-byte rows, not documents); everything hash-partitions on `fp`.
    * The within-snapshot winner is the PARTIAL-AGGREGATABLE `min(id)`
    * pattern of [[dedupExact]] — a hot fingerprint (a crawl where half the
    * pages are the same cookie banner) collapses map-side before the
    * shuffle, where a rank window would drag every copy into one task.
    * No quadratic work, no driver state; the result is a pure function of
    * content, stable under re-partitioning. */
  def snapshotDedup(snapshot: DataFrame, corpusFps: DataFrame,
                    idCol: String, textCol: String): DataFrame = {
    val snapFp = snapshot.withColumn("fp", TextOps.fingerprint(col(textCol)))
    val keep = snapFp.groupBy(col("fp")).agg(min(col(idCol)).as(idCol))
    snapFp.join(keep, Seq("fp", idCol), "left_semi")
      .join(corpusFps.select(col("fp")), Seq("fp"), "left_anti")
  }

  /** Incremental NEAR-dup snapshot dedup — the fuzzy twin of
    * [[snapshotDedup]]: a snapshot row is dropped when ANY corpus document
    * shares a MinHash-LSH band bucket with it and exact-verifies Jaccard
    * >= `minJaccard` (same signature family, band layout, and verify rule
    * as [[minhashLshPairs]], so recall/precision behave identically).
    * Documents shorter than `n` tokens have no shingles and always
    * survive, like the batch pair generators.
    *
    * Where [[decontaminate]] BROADCASTS its reference side (eval
    * benchmarks — tiny), here the reference side is the accumulated
    * CORPUS — far too big to broadcast — so the cross-match is the LSH
    * shape: both sides' band rows meet in a bucket equi-join, candidates
    * verify against the shingle sets, and the snapshot anti-joins the hit
    * list. At 100 TB the corpus side's banded signatures + shingle sets
    * are the artifact an accumulated corpus maintains incrementally
    * (append survivors' rows after each snapshot) rather than re-derived
    * from text; this operator derives them from `corpus` text for the
    * self-contained form. Skew: pass `maxBucket` to engage the same
    * whole-bucket drop guard as the pair generators. */
  def snapshotDedupNear(snapshot: DataFrame, corpus: DataFrame,
                        idCol: String, textCol: String, n: Int = 3,
                        minJaccard: Double = 0.5, k: Int = 64,
                        bands: Int = 16, maxBucket: Option[Long] = None,
                        storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    // Lifecycle: lazy by default (one-shot/bench path — the r9 eager
    // localCheckpoint-then-unpersist here cost an extra materialization and
    // a second snapshot pass, +46% at sf1). Long-lived ingest sessions that
    // call this repeatedly wrap the call in CacheScope.releasing, which
    // materializes the result once and drops both shingle-set caches —
    // gated by CacheLifecycleSpec.
    val snapSets = CacheScope.persistTracked(
      shingleSets(snapshot, idCol, textCol, n), storage)
    val corpSets = CacheScope.persistTracked(
      shingleSets(corpus, idCol, textCol, n), storage)
    def bandRows(sets: DataFrame): DataFrame = {
      val rows = minhashSigTable(sets, k).select(col("id"),
        posexplode(bandKeys(col("sig"), k, bands))).toDF("id", "band", "bh")
      maxBucket match {
        case Some(cap) =>
          val sizes = rows.groupBy("band", "bh").agg(count(lit(1)).as("bn"))
          rows.join(sizes.filter(col("bn") <= cap), Seq("band", "bh"))
            .select("id", "band", "bh")
        case None => rows
      }
    }
    val cand = bandRows(snapSets).as("s")
      .join(bandRows(corpSets).as("c"),
        col("s.band") === col("c.band") && col("s.bh") === col("c.bh"))
      .select(col("s.id").as("id_s"), col("c.id").as("id_c"))
      .distinct()
    val hits = cand
      .join(snapSets.select(col("id").as("id_s"), col("shingles").as("sh_s")), "id_s")
      .join(corpSets.select(col("id").as("id_c"), col("shingles").as("sh_c")), "id_c")
      .withColumn("inter", size(array_intersect(col("sh_s"), col("sh_c"))).cast("long"))
      .withColumn("uni",
        size(col("sh_s")).cast("long") + size(col("sh_c")).cast("long") - col("inter"))
      .filter(col("inter") / col("uni") >= minJaccard)
      .select(col("id_s").as(idCol)).distinct()
    snapshot.join(hits, Seq(idCol), "left_anti")
  }

  /** Per-document distinct word n-gram shingle sets: (id, shingles).
    * Tokens are staged as a column so the shingle kernel and the length
    * filter share one `split()` subtree however the projections collapse. */
  def shingleSets(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    spread(df).select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("toks"))
      // filter on the TOKEN count, not size(shingles): a size(shingles) > 0
      // predicate gets pushed below the projections by Catalyst and inlines
      // the whole shingle expression (5 split() copies) into the Filter,
      // doubling the per-row work. size(toks) >= n is equivalent.
      .filter(size(col("toks")) >= n)
      .select(col("id"), TextOps.wordShinglesFromTokens(col("toks"), n).as("shingles"))

  /** Exact n-gram Jaccard near-duplicate pairs via a shingle inverted index.
    *
    * `maxDocFreq` (optional) drops shingles appearing in more than that many
    * documents before the pair join — the standard skew guard: a stop-shingle
    * shared by 1M docs would otherwise produce 10^12 candidate pairs in one
    * reduce task. When the cap is engaged, set SIZES come from the capped
    * postings too, so jaccard is the exact similarity of the capped-universe
    * sets — pruning the intersection but not the union would systematically
    * underestimate every surviving pair and silently drop true near-dups at
    * the threshold. Disabled (None) for uncapped runs.
    *
    * Output: (id_a, id_b, inter, uni, jaccard) with id_a < id_b,
    * jaccard >= minJaccard.
    *
    * `storage` sets the persist level of the self-join intermediates (shingle
    * sets and capped postings). MEMORY_AND_DISK (= `.cache()` for datasets)
    * is right at bench scale; a 100 TB corpus should pass
    * `StorageLevel.DISK_ONLY` so the postings spill instead of evicting the
    * executors' working memory.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
                   minJaccard: Double, maxDocFreq: Option[Long] = None,
                   storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    pairIntersections(df, idCol, textCol, n, maxDocFreq, storage)
      .withColumn("uni", col("sz_a") + col("sz_b") - col("inter"))
      .withColumn("jaccard", col("inter") / col("uni"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "inter", "uni", "jaccard")

  /** Containment / overlap-coefficient pairs — SUBSET duplication that
    * Jaccard structurally misses: a quote, excerpt or truncated mirror of a
    * big page has `inter/min(|A|,|B|)` ≈ 1 while its Jaccard sits near
    * |small|/|big| (0.5 for a half-page), under every dedup threshold.
    * Broder'97 distinguishes resemblance from containment for exactly this;
    * the asymmetric measure is what catches aggregator/excerpt families.
    * Output: (id_a, id_b, inter, sz_a, sz_b, containment, jaccard) with
    * containment >= minContainment; same posting economy and DF skew cap
    * as [[jaccardPairs]] (shared [[pairIntersections]] skeleton). */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
                       minContainment: Double, maxDocFreq: Option[Long] = None,
                       storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    pairIntersections(df, idCol, textCol, n, maxDocFreq, storage)
      .withColumn("containment",
        col("inter") / least(col("sz_a"), col("sz_b")))
      .withColumn("jaccard",
        col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("containment") >= minContainment)
      .select("id_a", "id_b", "inter", "sz_a", "sz_b", "containment", "jaccard")

  /** Shared pair skeleton: shingle posting lists (optionally DF-capped),
    * the posting self-join, and per-pair intersection counts with both
    * side sizes attached — (id_a, id_b, inter, sz_a, sz_b). */
  private def pairIntersections(df: DataFrame, idCol: String, textCol: String,
                                n: Int, maxDocFreq: Option[Long],
                                storage: StorageLevel): DataFrame = {
    val sets = CacheScope.persistTracked(shingleSets(df, idCol, textCol, n), storage)
    val posts0 = sets.select(col("id"), explode(col("shingles")).as("sh"))
    val posts = maxDocFreq match {
      case Some(cap) =>
        val hot = posts0.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select("sh")
        CacheScope.persistTracked(posts0.join(hot, Seq("sh"), "left_anti"), storage)
      case None => posts0
    }
    val sizes = maxDocFreq match {
      case Some(_) => posts.groupBy("id").agg(count(lit(1)).as("sz"))
      case None => sets.select(col("id"), size(col("shingles")).cast("long").as("sz"))
    }
    val inter = posts.as("a")
      .join(posts.as("b"), col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
  }

  /** Near-duplicate dedup end-to-end: remove every doc that appears as the
    * HIGHER id of a near-dup pair (greedy keep-lowest — the standard
    * one-pass policy; exact connected components would need iterative
    * union-find, overkill for dedup where any one survivor per cluster is
    * acceptable: transitively-linked docs all lose to the cluster's min id
    * directly or via a chain that removes them). Pairs come from
    * [[minhashLshPairs]], so cost is the LSH pipeline + one anti join. */
  def dedupNear(df: DataFrame, idCol: String, textCol: String, n: Int = 3,
                minJaccard: Double = 0.8,
                storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val losers = minhashLshPairs(df, idCol, textCol, n, minJaccard, storage = storage)
      .select(col("id_b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Corpus-level paragraph deduplication (the C4/Falcon recipe tier between
    * exact-doc and near-doc dedup): a paragraph survives only in its FIRST
    * occurrence corpus-wide (lowest (doc id, position)); every other copy is
    * cut and each document's text is rebuilt from its surviving paragraphs
    * in order (possibly empty).
    *
    * Scale shape: explode to (paragraph, doc, pos) postings; the
    * first-occurrence winner per paragraph is `min(struct(id, pos))` — a
    * partial-aggregatable agg, so a paragraph pasted into a million docs
    * combines map-side instead of flooding one reducer; rebuild is one
    * groupBy(doc). Two key shuffles total. */
  def dedupParagraphs(df: DataFrame, idCol: String, textCol: String,
                      sep: String = "\n"): DataFrame = {
    val posts = df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))))
      .toDF("id", "pos", "para")
      .withColumn("fp", md5(col("para")))
    // winner selection keyed on the md5 FINGERPRINT, not the raw text —
    // both key shuffles ship 32 hex chars however long the paragraph is
    // (the streaming twin made the same choice for its claim state)
    val firsts = posts.groupBy("fp")
      .agg(min(struct(col("id"), col("pos"))).as("keep"))
    val kept = posts.join(firsts, Seq("fp"))
      .filter(col("id") === col("keep.id") && col("pos") === col("keep.pos"))
    val rebuilt = kept.groupBy("id")
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("para")))),
          e => e.getField("para")), sep).as("text_kept"),
        count(lit(1)).as("n_kept"))
    df.select(col(idCol).as("id")).join(rebuilt, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("text_kept"), lit("")).as("text_kept"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Exact substring deduplication (the Lee et al. 2021 "Deduplicating
    * Training Data Makes Language Models Better" suffix-array tier): any run
    * of >= k consecutive tokens occurring more than once corpus-wide
    * survives only at its FIRST occurrence (lowest (doc id, start
    * position)); every other occurrence is cut and each document is rebuilt
    * from its surviving tokens (`text_kept`, possibly empty), with kept/cut
    * token counts.
    *
    * The published recipe builds one corpus-wide suffix array — inherently
    * single-machine. The distributed shape here replaces it with positional
    * k-gram fingerprints: a duplicated substring of length L >= k is exactly
    * a run of L-k+1 duplicated k-grams, so cutting the [pos, pos+k) span of
    * every non-first duplicated k-gram and merging overlapping spans per
    * document removes the same maximal duplicated regions with no global
    * sort. First-occurrence offsets may keep a partially-overlapping tail
    * (span granularity is k tokens, like the reference recipe's own
    * length-k boundary slop).
    *
    * Scale (100 TB): the gram postings shuffle is the big cost — same
    * weight class as [[jaccardPairs]]' shingle postings, and keyed on 32-hex
    * md5 so width is k-independent. The winner per gram is
    * `min(struct(id,pos))` + a count: both partial-aggregatable, so a
    * boilerplate gram repeated a billion times combines map-side instead of
    * flooding one reducer (no windowed rank over the gram — that WOULD
    * serialize the hot gram's postings through one task's sort). Span merge
    * is gaps-and-islands windowed per document (per-doc data, bounded by doc
    * length); rebuild is one groupBy(doc). No self-join anywhere, so no
    * quadratic blowup on hot grams — cut volume is linear in postings.
    *
    * The tokenized corpus feeds three branches (gram postings, token
    * positions, per-doc totals); `storage` persists it once instead of
    * re-tokenizing per branch — MEMORY_AND_DISK at bench scale, pass
    * `StorageLevel.DISK_ONLY` at 100 TB so the token arrays spill rather
    * than evict executor working memory (same contract as
    * [[jaccardPairs]]). */
  def dedupSubstrings(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 8,
                      storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    // StorageLevel.NONE = re-tokenize per branch instead of caching (the
    // r11 persist A/B's third arm; default stays MEMORY_AND_DISK)
    val toks = spread(df).select(col(idCol).as("id"),
      TextOps.tokens(col(textCol)).as("toks")).transform(t =>
        if (storage == StorageLevel.NONE) t
        else CacheScope.persistTracked(t, storage))
    // `gram_fps60` kernel: positional k-gram fingerprints as 60-bit md5
    // prefixes in one compiled pass — the staged transform(sequence(...))
    // chain evaluated interpreted per position and shuffled 32-hex strings
    // where this ships longs (oracle mirrors the substring(md5) cast, so
    // collisions merge identically on both sides).
    val grams = toks.filter(size(col("toks")) >= k)
      .select(col("id"),
        posexplode(call_function("gram_fps60", col("toks"), lit(k))))
      .toDF("id", "pos", "g")
    val firsts = grams.groupBy("g")
      .agg(min(struct(col("id"), col("pos"))).as("keep"),
        count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .select("g", "keep")
    val cuts = grams.join(firsts, Seq("g"))
      .filter(!(col("id") === col("keep.id") && col("pos") === col("keep.pos")))
      .select(col("id"), col("pos").as("s"), (col("pos") + k).as("e"))
    // gaps-and-islands: a span starts a new island when it begins after the
    // running max end of everything before it. (doc,pos) is unique, so the
    // ORDER BY s within a doc is total — no tie ambiguity vs the oracle.
    val byS = Window.partitionBy("id").orderBy("s")
    val merged = cuts
      .withColumn("prev_e", max(col("e")).over(byS.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("prev_e").isNull || col("s") > col("prev_e"), 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(byS))
      .groupBy("id", "island").agg(min("s").as("s"), max("e").as("e"))
      .select("id", "s", "e")
    // array-side rebuild: the cut spans per doc (few rows — only docs with
    // duplicated stretches) group to a small span list and join back onto
    // the token arrays; the `cut_spans` kernel removes the spans and
    // rejoins in ONE map-side pass. The previous relational rebuild
    // re-exploded every token of the corpus (a second full-corpus
    // shuffle), anti-joined the span table, and re-sorted each document.
    val spansPerDoc = merged.groupBy("id")
      .agg(collect_list(struct(col("s"), col("e"))).as("spans"))
    toks.join(spansPerDoc, Seq("id"), "left")
      .select(col("id"), size(col("toks")).cast("long").as("n_toks"),
        call_function("cut_spans", col("toks"), col("spans")).as("o"))
      .select(col("id").as(idCol),
        col("o.text_kept").as("text_kept"),
        col("o.n_kept").as("n_kept"),
        (col("n_toks") - col("o.n_kept")).as("n_cut"))
  }

  /** Benchmark decontamination: contaminated corpus documents — those
    * sharing at least `minShared` distinct word n-gram shingles with ANY
    * benchmark document — as (id, n_shared). The standard training-data
    * hygiene op (drop eval-set look-alikes from the training corpus before
    * training; the published recipes use 8-13-gram overlap).
    *
    * Scale design (100 TB): the benchmark side is tiny relative to the
    * corpus — its distinct shingle set is BROADCAST, so the corpus-side scan
    * is map-only (broadcast semi-join per posting) and the only shuffle is
    * the per-doc hit count over the matching postings, which is at most
    * |matches|, not |corpus|. */
  /** (id, sh) shingle postings — the shared prep of BOTH decontamination
    * tiers, kept in one place so their documented exact-hit-subset
    * contract cannot drift: a prep change applied to one tier but not the
    * other would silently break it. */
  private def shinglePosts(df: DataFrame, idCol: String, textCol: String,
                           n: Int): DataFrame =
    shingleSets(df, idCol, textCol, n)
      .select(col("id"), explode(col("shingles")).as("sh"))

  /** Benchmark-side postings: shingles of the bench texts under a synthetic
    * id (the bench id never reaches the output). */
  private def benchShinglePosts(bench: DataFrame, benchText: String,
                                n: Int): DataFrame =
    shinglePosts(bench.select(monotonically_increasing_id().as("bid"),
      col(benchText).as("btext")), "bid", "btext", n)

  def contaminationHits(corpus: DataFrame, corpusId: String, corpusText: String,
                        bench: DataFrame, benchText: String,
                        n: Int = 3, minShared: Long = 1L): DataFrame = {
    val corpusPosts = shinglePosts(corpus, corpusId, corpusText, n)
    val benchShingles = broadcast(
      benchShinglePosts(bench, benchText, n).select("sh").distinct())
    corpusPosts.join(benchShingles, Seq("sh"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Bloom-filter decontamination — the membership-sketch variant of
    * [[contaminationHits]] for when the reference set is too large to
    * broadcast as distinct shingles (the RedPajama-v2-style recipe): the
    * benchmark's shingle fingerprints fold into ONE `bloom_sketch` bit
    * array (mergeable OR — map-side combinable, `numBits/8` bytes however
    * many shingles), which broadcasts to a map-only `bloom_contains` probe
    * per corpus posting.
    *
    * Guarantee vs the exact tier on the same [[mdHash31]] fingerprints: NO
    * false negatives — every exact hit is a bloom hit — and per-posting
    * false positives at rate ~(1-e^(-numHashes*n/numBits))^numHashes, so
    * the flagged set is a slight superset (acceptable for decontamination,
    * where over-dropping is the safe direction). Size numBits ~ 10-15 bits
    * per distinct benchmark shingle for sub-percent FP. Spec-gated, not
    * oracle-gated: the bit layout is engine-internal. */
  def contaminationHitsBloom(corpus: DataFrame, corpusId: String, corpusText: String,
                             bench: DataFrame, benchText: String,
                             n: Int = 3, minShared: Long = 1L,
                             numBits: Int = 1 << 20,
                             numHashes: Int = 5): DataFrame = {
    val benchBloom = benchShinglePosts(bench, benchText, n)
      .agg(call_function("bloom_sketch", mdHash31(col("sh")),
        lit(numBits), lit(numHashes)).as("bloom"))
    val posts = shinglePosts(corpus, corpusId, corpusText, n)
      .select(col("id"), mdHash31(col("sh")).as("fp"))
    posts.crossJoin(broadcast(benchBloom))
      .filter(call_function("bloom_contains", col("bloom"), col("fp"), lit(numHashes)))
      .groupBy("id").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** The benchmark Bloom filter as DRIVER-SIDE bit words (bounded:
    * numBits/64 longs —
    * the centroids contract) — for consumers that must pin the reference
    * set before work starts, e.g. the streaming decontamination twin
    * ([[graft.streaming.StreamingDedup.decontaminateBloomStream]]: a
    * stream cannot re-aggregate the benchmark per micro-batch). */
  def benchBloomWords(bench: DataFrame, benchText: String, n: Int = 3,
                      numBits: Int = 1 << 20,
                      numHashes: Int = 5): Seq[Long] =
    benchShinglePosts(bench, benchText, n)
      .agg(call_function("bloom_sketch", mdHash31(col("sh")),
        lit(numBits), lit(numHashes)).as("bloom"))
      .head().getSeq[Long](0).toSeq

  /** Survivors of decontamination: the corpus minus every contaminated doc
    * (one broadcast semi-join + one anti join). */
  def decontaminate(corpus: DataFrame, corpusId: String, corpusText: String,
                    bench: DataFrame, benchText: String,
                    n: Int = 3, minShared: Long = 1L): DataFrame = {
    val bad = contaminationHits(corpus, corpusId, corpusText, bench, benchText,
      n, minShared).select(col("id").as(corpusId))
    corpus.join(bad, Seq(corpusId), "left_anti")
  }

  /** Survivors of Bloom decontamination ([[contaminationHitsBloom]]): the
    * corpus minus every bloom-flagged doc. Over-drops at the filter's FP
    * rate — the safe direction for eval hygiene; never under-drops. */
  def decontaminateBloom(corpus: DataFrame, corpusId: String, corpusText: String,
                         bench: DataFrame, benchText: String,
                         n: Int = 3, minShared: Long = 1L,
                         numBits: Int = 1 << 20,
                         numHashes: Int = 5): DataFrame = {
    val bad = contaminationHitsBloom(corpus, corpusId, corpusText, bench,
      benchText, n, minShared, numBits, numHashes).select(col("id").as(corpusId))
    corpus.join(bad, Seq(corpusId), "left_anti")
  }

  /** MinHash prime modulus (2^31-1) — universal-hash arithmetic stays within
    * Long range under ANSI mode: a,f < 2^31 so a*f+b < 2^62 + 2^31. */
  private val MinhashP = 2147483647L

  /** 31-bit md5-derived fingerprint, chosen because every engine has md5:
    * the DuckDB oracle mirrors it exactly as
    * `('0x' || substring(md5(x),1,15))::BIGINT % 2147483648`. */
  def mdHash31(c: Column): Column =
    pmod(call_function("md5_prefix60", c), lit(1L << 31))

  /** 60-bit variant (first 15 hex chars of md5) for SimHash bit votes. */
  def mdHash60(c: Column): Column = call_function("md5_prefix60", c)

  /** k-component MinHash signatures via the mergeable
    * [[graft.functions.MinHashSketchAgg]] sketch over md5-derived
    * fingerprints: ONE aggregate whose buffer is k longs, map-side
    * combinable, with generated code independent of k. (Round 1 used k
    * separate `min()` aggregate columns; the generated aggregation class was
    * enormous and Janino compilation dominated the query — 16 s at sf0.1.)
    * Returns (id, sig: array<long>[k]). */
  def minhashSigTable(sets: DataFrame, k: Int): DataFrame =
    sets.select(col("id"), explode(col("shingles")).as("sh"))
      .select(col("id"), mdHash31(col("sh")).as("f"))
      .groupBy("id")
      .agg(call_function("minhash_sketch", col("f"), lit(k)).as("sig"))

  /** Per-row MinHash signature from a shingle array — the MAP-ONLY twin of
    * [[minhashSigTable]]: identical hash family (the `(a_i·f + b_i) mod P`
    * constants of [[graft.functions.MinHashSketchAgg]]) over the same
    * [[mdHash31]] fingerprints, so the two produce identical signatures
    * (parity-tested). Use it when a document's shingles already live in one
    * row: streaming (no blocking groupBy state — the signature is a scalar
    * projection, so it never waits on a watermark) or map-side batch. The
    * aggregate's advantage (mergeable partial state) only matters when a
    * group's values span rows. */
  def rowMinhashSig(shingles: Column, k: Int): Column =
    // fps bound once: without it every one of the k outer lambda elements
    // re-evaluates the md5 transform over the whole shingle array
    bindOnce(transform(shingles, sh => mdHash31(sh))) { fps =>
      transform(sequence(lit(0), lit(k - 1)), i => {
        val ai = pmod(lit(2654435769L) * (i.cast("long") * 2 + 1), lit(2147483645L)) + 1
        val bi = pmod(lit(3266489917L) * (i.cast("long") + 1), lit(2147483647L))
        array_min(transform(fps, f => pmod(ai * f + bi, lit(2147483647L))))
      })
    }

  /** The LSH band keys of a signature: `bands` strings, each the
    * comma-joined slice of r = k/bands components (engine-portable — no
    * murmur3; the p05 oracle mirrors it with array_to_string). Shared by the
    * batch pair join and the streaming dedup. */
  def bandKeys(sigIn: Column, k: Int, bands: Int): Column = {
    val r = k / bands
    // sig bound once: each band's slice would otherwise re-evaluate the
    // whole signature expression (ruinous when sig is an inline rowMinhashSig)
    bindOnce(sigIn) { sig =>
      transform(sequence(lit(0), lit(bands - 1)),
        b => concat_ws(",", slice(sig, b * r + 1, lit(r)).cast("array<string>")))
    }
  }

  /** MinHash-LSH near-duplicate pairs, exactly verified.
    *
    * Pipeline: signature → band hashes (bands × rowsPerBand = k) → explode
    * bands → self-join per (band, bandHash) bucket → distinct candidate pairs
    * → exact Jaccard verification on the candidates only. Every verified pair
    * is a true >= minJaccard pair; recall follows the 1-(1-s^r)^b LSH curve
    * (identical texts are always caught — equal signatures).
    *
    * Same output schema as [[jaccardPairs]], so at high thresholds the two
    * agree and cross-check each other in the test suite.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
                      minJaccard: Double, k: Int = 64, bands: Int = 16,
                      maxBucket: Option[Long] = None,
                      storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    // persisted: the band self-join otherwise evaluates the whole signature
    // aggregation once per branch (plan-verified — no ReusedExchange fires
    // for self-joins on aggregated subtrees). k longs per doc for sig; the
    // shingle sets are the heavy one — pass DISK_ONLY at corpus scale (see
    // jaccardPairs).
    val sets = CacheScope.persistTracked(shingleSets(df, idCol, textCol, n), storage)
    val sig = CacheScope.persistTracked(minhashSigTable(sets, k), storage)
    val bandRows0 = sig.select(col("id"),
      posexplode(bandKeys(col("sig"), k, bands))).toDF("id", "band", "bh")
    // LSH bucket skew guard: a bucket of m docs emits ~m^2/2 candidate pairs
    // on ONE reducer — a 1M-doc boilerplate cluster is 10^12 pairs. Buckets
    // larger than the cap are dropped whole (their members are exact-dedup
    // territory, and each doc still has bands-1 other chances to pair);
    // deterministic, so the capped gate query (p32) oracles exactly.
    val bandRows = maxBucket match {
      case Some(cap) =>
        val sizes = bandRows0.groupBy("band", "bh").agg(count(lit(1)).as("bn"))
        bandRows0.join(sizes.filter(col("bn") <= cap), Seq("band", "bh"))
          .select("id", "band", "bh")
      case None => bandRows0
    }
    val cand = bandRows.as("a")
      .join(bandRows.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val withSets = cand
      .join(sets.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")
    withSets
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("uni",
        size(col("sh_a")).cast("long") + size(col("sh_b")).cast("long") - col("inter"))
      .withColumn("jaccard", col("inter") / col("uni"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "inter", "uni", "jaccard")
  }

  /** 60-bit SimHash signatures via the mergeable
    * [[graft.functions.SimHashAgg]] sketch (see [[minhashSigTable]] for why a
    * single TypedImperativeAggregate beats a wide bank of `sum()` columns):
    * explode distinct tokens, fingerprint each with [[mdHash60]] (so the
    * DuckDB oracle can mirror the bit votes exactly), then one map-side-
    * combinable aggregate whose buffer is 60 ints per doc.
    * Returns (id, sig: long). */
  def simhashSigTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    spread(df)
      .select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("toks"))
      .select(col("id"), explode(array_distinct(col("toks"))).as("tok"))
      .select(col("id"), mdHash60(col("tok")).as("f"))
      .groupBy("id")
      .agg(call_function("simhash_sketch", col("f")).as("sig"))

  /** SimHash near-duplicate pairs within `maxHamming` (< 16-bit-band recall
    * bound: guaranteed complete for maxHamming <= 3 by pigeonhole over 4
    * chunks; larger radii would need more tables).
    * Output: (id_a, id_b, hamming). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3,
                   maxBucket: Option[Long] = None,
                   storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    // persisted for the same self-join double-evaluation reason as in
    // minhashLshPairs; one long per doc
    val sigs = CacheScope.persistTracked(simhashSigTable(df, idCol, textCol), storage)
    val chunks = sigs.select(col("id"), col("sig"), explode(
      transform(sequence(lit(0), lit(3)),
        c => struct(c.as("ci"),
          call_function("shiftrightunsigned", col("sig"), c * 16).bitwiseAND(lit(0xFFFFL)).as("cv")))
    ).as("ch")).select(col("id"), col("sig"), col("ch.ci").as("ci"), col("ch.cv").as("cv"))
    // same bucket skew guard as minhashLshPairs: 16-bit chunks collide
    // heavily on near-constant signature regions at scale
    val capped = maxBucket match {
      case Some(cap) =>
        val sizes = chunks.groupBy("ci", "cv").agg(count(lit(1)).as("bn"))
        chunks.join(sizes.filter(col("bn") <= cap), Seq("ci", "cv"))
          .select("id", "sig", "ci", "cv")
      case None => chunks
    }
    capped.as("a")
      .join(capped.as("b"),
        col("a.ci") === col("b.ci") && col("a.cv") === col("b.cv") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Quality-ranked canonical selection over near-dup clusters — the
    * FineWeb/RefinedWeb survivor rule: where [[Components.dedupClusters]]'s
    * min-id winner is arbitrary, real curation keeps the BEST copy of each
    * duplicated page (boilerplate-stripped mirrors, truncated reposts and
    * the original all land in one cluster; quality decides which survives).
    *
    * Output: every doc with its cluster, `quality` ([[TextOps.qualityScore]]
    * — engine-exact doubles, so the rank order is oracle-comparable),
    * within-cluster rank `rk` (quality DESC, id ASC tie-break) and the
    * `keep` verdict (rk == 1; singletons trivially keep).
    *
    * Shape at 100 TB: pairs → connected components (O(log n) rounds, 2
    * key-shuffles each — p24's machinery unchanged) → quality is MAP-ONLY
    * on the doc stream → ONE rank window partitioned by cluster_id.
    * Cluster sizes are near-dup component sizes — bounded and heavy-tailed
    * but far below partition scale, so the window never sees a giant
    * partition (the pair generator's bucket caps bound them upstream). */
  def keepBestQuality(docs: DataFrame, idCol: String, textCol: String,
                      pairs: DataFrame,
                      checkpointDir: Option[String] = None): DataFrame = {
    val clusters = Components.dedupClusters(docs, idCol, pairs,
      checkpointDir = checkpointDir)
    val quality = docs.select(col(idCol),
      TextOps.qualityScore(col(textCol)).as("quality"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id").orderBy(col("quality").desc, col(idCol))
    clusters.join(quality, Seq(idCol))
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("keep", col("rk") === 1L)
      .select(col(idCol), col("cluster_id"), col("cluster_size"),
        col("quality"), col("rk"), col("keep"))
  }
}
