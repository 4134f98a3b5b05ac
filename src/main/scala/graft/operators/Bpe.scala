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
    * reaches `minCount`. */
  def train(df: DataFrame, textCol: String, nMerges: Int,
            minCount: Long = 2L, checkpointEvery: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // corpus pass via the `token_counts` kernel: each doc collapses to its
    // DISTINCT (word, count) pairs in one compiled scan, so the shuffle
    // sees distinct-per-doc rows — not a string per corpus token (the same
    // map-side TF economy as [[TextOps.vocabulary]]/[[TextOps.tfidfTopK]])
    var words = df
      .select(explode(call_function("token_counts", col(textCol))).as("tc"))
      .filter(length(col("tc.token")) > 0)
      .groupBy(col("tc.token").as("w")).agg(sum(col("tc.cnt")).as("freq"))
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
    prev.foreach(_.unpersist(blocking = false))
    merges.result()
      .toDF("rank", "left", "right", "merged", "pair_count")
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
    // `token_counts` kernel: the per-doc TF arrives straight from the scan
    // — no (id, word) groupBy shuffle over every corpus token
    val perDocWord = df
      .select(col(idCol).as("id"),
        explode(call_function("token_counts", col(textCol))).as("tc"))
      .filter(length(col("tc.token")) > 0)
      .select(col("id"), col("tc.token").as("w"), col("tc.cnt").as("n"))
    val flat = merges.flatMap(p => Seq(p._1, p._2))
    // count-only kernel: merge symbols interned to ints once, the fold runs
    // over int arrays — no piece-array materialization per word type
    // (bit-parity with size(bpe_pieces(...)) spec'd in PipelineExtrasSpec)
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
}
