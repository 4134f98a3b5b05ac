package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al., ACL 2016) — the
  * merge-learning loop every subword tokenizer recipe starts from, run as
  * Spark jobs so the counting passes scale to corpus-sized vocabularies
  * (the driver only ever holds the argmax pair and the merge list).
  *
  * Shape at 100 TB:
  *  - ONE corpus pass collapses the text to a word-frequency table
  *    (explode → partial-agg groupBy — the Zipf head pre-sums map-side);
  *    every later iteration works on word TYPES weighted by frequency,
  *    never the corpus again — the classic BPE economy;
  *  - each merge round is one partial-agg pair-count shuffle over the
  *    type table plus a top-1 (`orderBy.limit(1)` → TakeOrdered, not a
  *    full sort) and a MAP-ONLY fold applying the merge;
  *  - the applied merges stack lazily, so every `checkpointEvery` rounds
  *    the type table is localCheckpoint-ed to cut lineage (the same
  *    iterative-plan discipline as [[Components]]' rounds).
  *
  * The merge fold is the real left-to-right non-overlapping scan
  * ("a a a" under pair (a,a) → ["aa","a"]), expressed as a Catalyst
  * `aggregate` with (emitted, pending) state — no UDF, stays in codegen.
  * Ties in the pair argmax break (count DESC, left ASC, right ASC), so
  * training is deterministic for a given corpus.
  */
object Bpe {

  /** Left-to-right non-overlapping merge of adjacent (a, b) → a+b — the
    * `bpe_merge_step` kernel ([[graft.functions.BpeKernel]]; the prior
    * (emitted, pending) `aggregate` fold evaluated interpreted per row per
    * round and is spec-proven equal to this pairwise scan). */
  private[operators] def mergeStep(symsIn: Column, a: String, b: String): Column =
    call_function("bpe_merge_step", symsIn, lit(a), lit(b))

  /** Train `nMerges` BPE merges over whitespace words of `textCol`.
    * Returns the learned merge table (rank, left, right, merged,
    * pair_count) — rows in merge order. Stops early when no adjacent pair
    * reaches `minCount`.
    *
    * TWO TIERS, bit-identical results (parity-spec'd in `BpeDriverTierSpec`):
    *
    *  - `n_types <= driverTypeMax` (default 2^20): the word-TYPE table is
    *    METADATA scale (a vocabulary, not a corpus). Driver footprint at
    *    the default cap (ADVICE r9 — count the IN-LOOP state, not just the
    *    collected rows): 2^20 (word, freq) rows ~50 MB, PLUS the merge
    *    loop's per-word symbol arrays (one String per code point — for an
    *    avg 8-cp word, ~9 object headers + pointers ≈ 300-500 B/word →
    *    ~0.5 GB at the cap) and the per-round pair-count HashMap (bounded
    *    by distinct adjacent pairs, typically ≪ n_types). Budget ~1 GB of
    *    driver heap at the default cap; lower `driverTypeMax` (it gates on
    *    ROW COUNT, so halve it for long-word corpora) on small drivers. So
    *    the whole merge loop runs on the driver over the collected
    *    (word, freq) rows: 2 jobs total (count + collect) instead of one
    *    pair-count job PER round. This is the r8-verdict "bounded
    *    type-table driver tier": the 10-round loop paid ~10 Spark job
    *    floors at bench scale while the actual argmax work was milliseconds.
    *    Same bounded-driver-state contract as the k-means centroids / GD
    *    gradients (`buckets` rows): the threshold is checked BEFORE
    *    collecting.
    *  - otherwise (a 100 TB corpus can exceed any fixed vocabulary bound —
    *    Heaps' law plus crawl noise): the distributed loop below, where the
    *    driver only ever holds the per-round argmax row.
    */
  def train(df: DataFrame, textCol: String, nMerges: Int,
            minCount: Long = 2L, checkpointEvery: Int = 8,
            driverTypeMax: Long = 1L << 20): DataFrame = {
    // corpus pass via the `token_counts` kernel: each doc collapses to its
    // DISTINCT (word, count) pairs in one compiled scan, so the shuffle
    // sees distinct-per-doc rows — not a string per corpus token (the same
    // map-side TF economy as [[TextOps.vocabulary]]/[[TextOps.tfidfTopK]])
    trainFromWordFreq(df
      .select(explode(call_function("token_counts", col(textCol))).as("tc"))
      .filter(length(col("tc.token")) > 0)
      .groupBy(col("tc.token").as("w")).agg(sum(col("tc.cnt")).as("freq")),
      nMerges, minCount, checkpointEvery, driverTypeMax)
  }

  /** [[train]] from a prebuilt (w, freq) word-type table — shared with
    * [[trainEncodeCounts]] so the composite can reuse ONE tokenize pass. */
  private[operators] def trainFromWordFreq(wordFreq0: DataFrame, nMerges: Int,
                                           minCount: Long, checkpointEvery: Int,
                                           driverTypeMax: Long): DataFrame = {
    val spark = wordFreq0.sparkSession
    import spark.implicits._
    val wordFreq = wordFreq0.persist()
    // tier decision and driver fetch in ONE action: take(cap+1) either
    // returns the whole bounded type table (<= cap rows) or proves it is
    // over the cap with the (cap+1)-th row — never an unbounded collect
    val cap = math.min(driverTypeMax, Int.MaxValue - 1L).toInt
    val head = wordFreq.take(cap + 1)
    if (head.length <= cap) {
      wordFreq.unpersist(blocking = false)
      return trainDriver(head.map(r => (r.getString(0), r.getLong(1))),
          nMerges, minCount)
        .toDF("rank", "left", "right", "merged", "pair_count")
    }
    var words = wordFreq
      .select(split(col("w"), "").as("syms"), col("freq"))
      .persist()

    // ONE job per round: the round's pair-count collect is the action that
    // materializes the (persisted, lazily checkpointed) type table carrying
    // the previous round's merge — the old separate `next.count()`
    // materialization job is gone, and so is the corpus-pass `words.count()`
    // (round 0's collect materializes it). The superseded table unpersists
    // only AFTER the collect proves its successor is cached, so lineage
    // never re-runs the tokenize+explode pass. The LAST accepted merge is
    // recorded but never applied — nothing reads the folded table after it.
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var prev: Option[DataFrame] = None
    var r = 0
    var done = false
    while (r < nMerges && !done) {
      val top = words
        .select(col("freq"), explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1).as("a"),
          slice(col("syms"), lit(2), size(col("syms")) - 1).as("b"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      prev.foreach(_.unpersist(blocking = false))
      prev = None
      if (top.isEmpty || top.head.getLong(2) < minCount) done = true
      else {
        val (a, b, n) = (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        merges += ((r, a, b, a + b, n))
        r += 1
        if (r < nMerges) {
          val next = words
            .select(mergeStep(col("syms"), a, b).as("syms"), col("freq"))
            .persist()
          prev = Some(words)
          // lazy checkpoint: materializes inside the next round's collect
          words = if (r % checkpointEvery == 0) next.localCheckpoint(false) else next
        }
      }
    }
    words.unpersist(blocking = false)
    wordFreq.unpersist(blocking = false)
    prev.foreach(_.unpersist(blocking = false))
    merges.result()
      .toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** The driver-tier merge loop over a BOUNDED collected type table —
    * bit-identical to the distributed loop (parity-spec'd), so the tiers
    * can never train different tokenizers:
    *  - symbols start as the code points of each word, matching Spark's
    *    `split(w, "")` (which never splits a surrogate pair);
    *  - the per-round argmax breaks ties (count DESC, left ASC, right ASC)
    *    under UNSIGNED UTF-8 BYTE order — what Spark's `orderBy` on strings
    *    (UTF8String binary comparison) does, NOT java.lang.String's UTF-16
    *    code-unit order (they differ above the BMP);
    *  - each accepted merge applies the same left-to-right non-overlapping
    *    scan as the `bpe_merge_step` kernel;
    *  - the LAST accepted merge is recorded but never applied, and the
    *    early-stop rule (`max pair count < minCount`) matches. */
  private[operators] def trainDriver(types: Array[(String, Long)],
                                     nMerges: Int, minCount: Long): Seq[(Int, String, String, String, Long)] = {
    var syms: Array[Array[String]] = types.map(t => splitCodePoints(t._1))
    val freq: Array[Long] = types.map(_._2)
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var r = 0
    var done = false
    while (r < nMerges && !done) {
      val counts = new scala.collection.mutable.HashMap[(String, String), Long]
      var i = 0
      while (i < syms.length) {
        val s = syms(i); val f = freq(i)
        var j = 0
        while (j < s.length - 1) {
          val k = (s(j), s(j + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          j += 1
        }
        i += 1
      }
      var best: ((String, String), Long) = null
      counts.foreach { kv =>
        if (best == null) best = kv
        else {
          val c =
            if (kv._2 != best._2) java.lang.Long.compare(best._2, kv._2)
            else {
              val ca = utf8Compare(kv._1._1, best._1._1)
              if (ca != 0) ca else utf8Compare(kv._1._2, best._1._2)
            }
          if (c < 0) best = kv
        }
      }
      if (best == null || best._2 < minCount) done = true
      else {
        val ((a, b), n) = best
        out += ((r, a, b, a + b, n))
        r += 1
        if (r < nMerges) {
          var i2 = 0
          while (i2 < syms.length) {
            syms(i2) = mergeLeftToRight(syms(i2), a, b)
            i2 += 1
          }
        }
      }
    }
    out.result()
  }

  /** Code points of `w` as single-code-point strings — `split(w, "")`. */
  private def splitCodePoints(w: String): Array[String] = {
    val b = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      b += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    b.result()
  }

  /** Unsigned UTF-8 byte comparison — Spark's binary string sort order. */
  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xFF) - (y(i) & 0xFF)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Left-to-right non-overlapping (a, b) → a+b — the `bpe_merge_step`
    * kernel's scan, on a driver-side symbol array. */
  private def mergeLeftToRight(s: Array[String], a: String, b: String): Array[String] = {
    if (s.length < 2) return s
    val buf = new scala.collection.mutable.ArrayBuffer[String](s.length)
    var j = 0
    while (j < s.length) {
      if (j < s.length - 1 && s(j) == a && s(j + 1) == b) { buf += a + b; j += 2 }
      else { buf += s(j); j += 1 }
    }
    buf.toArray
  }

  /** Chars → pieces under an ORDERED merge list (rank order, each merge the
    * same left-to-right non-overlapping scan training used). */
  private[operators] def applyMerges(chars: Column,
                                     merges: Seq[(String, String)]): Column =
    merges.foldLeft(chars) { case (s, (a, b)) => mergeStep(s, a, b) }

  /** Tokenize every document with a trained merge list and count pieces —
    * the "how many tokens is this corpus under MY tokenizer" pass that
    * sizes training runs and shard budgets.
    *
    * Output: (idCol, n_words, n_tokens); n_tokens / n_words is the
    * fertility the tokenizer literature tracks.
    *
    * Shape at 100 TB — the word-TYPE economy (same as [[train]]): the
    * merge fold runs once per DISTINCT word, not once per corpus token
    * ("the" encodes once, not a billion times); per-doc word counts join
    * the type table on the word (the type side is one row per word, so
    * Zipf-head words are AQE-splittable), and the result is one partial-agg
    * per-doc sum. The fold itself is a Catalyst `aggregate` — no UDF. */
  def encodeCounts(df: DataFrame, idCol: String, textCol: String,
                   merges: Seq[(String, String)]): DataFrame = {
    val flat = merges.flatMap(p => Seq(p._1, p._2))
    // count-only kernel: merge symbols interned to ints once, the fold runs
    // over int arrays — no piece-array materialization per word type
    // (bit-parity with size(bpe_pieces(...)) spec'd in PipelineExtrasSpec).
    // TWO shapes, same values:
    //  - SHORT merge lists (<= 64 merges): fold MAP-SIDE per (doc, distinct
    //    word) row, and the whole operator is ONE partial-agg groupBy(id):
    //    `explode_outer` keeps token-less documents as a null row (n = 0),
    //    so no final left join is needed to restore them. The fold is
    //    O(|w|·merges) ns-scale work; the word-TYPE join it replaces costs
    //    a full-corpus posting shuffle by `w` plus the type distinct — two
    //    exchanges that dwarf the re-folded Zipf head at every scale when
    //    the list is short.
    //  - LONG lists (real 32k-vocab tokenizers): the fold per occurrence is
    //    the expensive side, so keep the type economy — fold once per
    //    CORPUS-distinct word, join postings to the type table ("the"
    //    folds once, not once per document).
    if (merges.size <= 64) {
      // `token_counts` emits distinct (token, cnt) per doc straight from
      // the scan; empty-string tokens contribute n = 0 (the row-filter the
      // type-join tier uses would DROP all-empty docs from the output)
      df.select(col(idCol).as("id"),
          explode_outer(call_function("token_counts", col(textCol))).as("tc"))
        .select(col("id"),
          when(length(col("tc.token")) > 0, col("tc.token")).as("w"),
          when(length(col("tc.token")) > 0, col("tc.cnt")).otherwise(lit(0L)).as("n"))
        .withColumn("n_pieces",
          call_function("bpe_piece_count", col("w"), typedLit(flat)))
        .groupBy("id")
        .agg(coalesce(sum(col("n")), lit(0L)).as("n_words"),
          sum(coalesce(col("n") * col("n_pieces"), lit(0L))).as("n_tokens"))
        .select(col("id").as(idCol), col("n_words"), col("n_tokens"))
    } else {
      val perDocWord = df
        .select(col(idCol).as("id"),
          explode(call_function("token_counts", col(textCol))).as("tc"))
        .filter(length(col("tc.token")) > 0)
        .select(col("id"), col("tc.token").as("w"), col("tc.cnt").as("n"))
      val types = perDocWord.select("w").distinct()
        .withColumn("n_pieces",
          call_function("bpe_piece_count", col("w"), typedLit(flat)))
      val perDoc = perDocWord.join(types, "w")
        .groupBy("id")
        .agg(sum(col("n")).as("n_words"),
          sum(col("n") * col("n_pieces")).as("n_tokens"))
      df.select(col(idCol).as("id"))
        .join(perDoc, Seq("id"), "left")
        .select(col("id").as(idCol),
          coalesce(col("n_words"), lit(0L)).as("n_words"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
    }
  }

  /** Full piece sequences per document (MAP-ONLY: the fold runs per token
    * occurrence — use for bounded slices/demos; [[encodeCounts]] is the
    * corpus-scale statistics path). */
  def encodePieces(df: DataFrame, idCol: String, textCol: String,
                   merges: Seq[(String, String)]): DataFrame = {
    val flat = merges.flatMap(p => Seq(p._1, p._2))
    df.select(col(idCol),
      flatten(transform(
        filter(TextOps.tokens(col(textCol)), w => length(w) > 0),
        w => call_function("bpe_pieces", w, typedLit(flat)))).as("pieces"))
  }

  /** [[encodeCounts]] driving its merge list from a [[train]] result frame
    * (collected in rank order — bounded: nMerges rows of metadata). */
  def encodeWithTrained(df: DataFrame, idCol: String, textCol: String,
                        mergesDf: DataFrame): DataFrame = {
    val ms = mergesDf.orderBy("rank").select("left", "right")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    encodeCounts(df, idCol, textCol, ms)
  }

  /** train + encode in one operator, sharing ONE corpus tokenize pass —
    * `train(df) → encodeWithTrained(df)` runs the `token_counts` scan
    * twice (once to build the type table, once for the per-doc counts);
    * here the persisted per-doc (id, w, n) table feeds BOTH the training
    * word-freq aggregation and the encode, and the results are
    * bit-identical to the two-call form (spec'd). Same tiering as each
    * half ([[train]]'s driver tier, [[encodeCounts]]' map-side fold). */
  def trainEncodeCounts(df: DataFrame, idCol: String, textCol: String,
                        nMerges: Int, minCount: Long = 2L,
                        checkpointEvery: Int = 8,
                        driverTypeMax: Long = 1L << 20): DataFrame = {
    val perDocWord = CacheScope.persistTracked(df
      .select(col(idCol).as("id"),
        explode_outer(call_function("token_counts", col(textCol))).as("tc"))
      .select(col("id"),
        when(length(col("tc.token")) > 0, col("tc.token")).as("w"),
        when(length(col("tc.token")) > 0, col("tc.cnt")).otherwise(lit(0L)).as("n")))
    val wordFreq = perDocWord.filter(col("w").isNotNull)
      .groupBy("w").agg(sum(col("n")).as("freq"))
    val mergesDf = trainFromWordFreq(wordFreq, nMerges, minCount,
      checkpointEvery, driverTypeMax)
    val ms = mergesDf.orderBy("rank").select("left", "right")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val flat = ms.flatMap(p => Seq(p._1, p._2))
    if (ms.size <= 64)
      perDocWord
        .withColumn("n_pieces",
          call_function("bpe_piece_count", col("w"), typedLit(flat)))
        .groupBy("id")
        .agg(coalesce(sum(col("n")), lit(0L)).as("n_words"),
          sum(coalesce(col("n") * col("n_pieces"), lit(0L))).as("n_tokens"))
        .select(col("id").as(idCol), col("n_words"), col("n_tokens"))
    else {
      // LONG lists: the word-TYPE-join tier, fed from the SAME cached
      // perDocWord (ADVICE r9: this branch used to fall back to
      // encodeCounts(df, ...), re-running the token_counts corpus scan
      // while the persisted table stayed cached and unread). The null-w
      // rows explode_outer left for token-less docs ride through the left
      // join (null never matches a type row), so — unlike encodeCounts'
      // standalone long tier — no restore join is needed.
      val types = perDocWord.filter(col("w").isNotNull).select("w").distinct()
        .withColumn("n_pieces",
          call_function("bpe_piece_count", col("w"), typedLit(flat)))
      perDocWord.join(types, Seq("w"), "left")
        .groupBy("id")
        .agg(coalesce(sum(col("n")), lit(0L)).as("n_words"),
          sum(coalesce(col("n") * col("n_pieces"), lit(0L))).as("n_tokens"))
        .select(col("id").as(idCol), col("n_words"), col("n_tokens"))
    }
  }
}
