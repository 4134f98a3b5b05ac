package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** Per-document distinct word n-gram shingle sets: (id, shingles).
    * Tokens are staged as a column first so the HOF lambda in
    * wordShinglesFromTokens reads a materialized array, not a re-evaluated
    * `split()` subtree (see the staging warning in TextOps). */
  def shingleSets(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("toks"))
      .select(col("id"), TextOps.wordShinglesFromTokens(col("toks"), n).as("shingles"))
      .filter(size(col("shingles")) > 0)

  /** Exact n-gram Jaccard near-duplicate pairs via a shingle inverted index.
    *
    * `maxDocFreq` (optional) drops shingles appearing in more than that many
    * documents before the pair join — the standard skew guard: a stop-shingle
    * shared by 1M docs would otherwise produce 10^12 candidate pairs in one
    * reduce task. Disabled (None) for oracle-checked correctness runs.
    *
    * Output: (id_a, id_b, inter, uni, jaccard) with id_a < id_b,
    * jaccard >= minJaccard.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
                   minJaccard: Double, maxDocFreq: Option[Long] = None): DataFrame = {
    val sets = shingleSets(df, idCol, textCol, n)
    val posts0 = sets.select(col("id"), explode(col("shingles")).as("sh"))
    val posts = maxDocFreq match {
      case Some(cap) =>
        val hot = posts0.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select("sh")
        posts0.join(hot, Seq("sh"), "left_anti")
      case None => posts0
    }
    val sizes = sets.select(col("id"), size(col("shingles")).cast("long").as("sz"))
    val inter = posts.as("a")
      .join(posts.as("b"), col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("uni", col("sz_a") + col("sz_b") - col("inter"))
      .withColumn("jaccard", col("inter") / col("uni"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "inter", "uni", "jaccard")
  }

  /** MinHash prime modulus (2^31-1) — universal-hash arithmetic stays within
    * Long range under ANSI mode: a,f < 2^31 so a*f+b < 2^62 + 2^31. */
  private val MinhashP = 2147483647L

  /** Shingle xxhash64 fingerprints folded into [0, 2^31) — stage as a column
    * before [[minhashSignature]] (read k times, once per component). */
  def shingleFps(shingles: Column): Column =
    transform(shingles, s => pmod(xxhash64(s), lit(1L << 31)))

  /** k-component MinHash signature from a materialized fingerprint column.
    * The i-th component is min over shingles of ((a_i*f + b_i) mod p) with
    * fixed per-component multipliers — deterministic across runs and cluster
    * layouts. */
  def minhashSignature(fps: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i => {
      val a = pmod(lit(0x9E3779B9L) * (i * 2 + 1), lit(MinhashP - 2)) + lit(1L)
      val b = pmod(lit(0xC2B2AE3DL) * (i + 1), lit(MinhashP))
      array_min(transform(fps, f => pmod(a * f + b, lit(MinhashP))))
    })

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
                      minJaccard: Double, k: Int = 64, bands: Int = 16): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val sets = shingleSets(df, idCol, textCol, n).cache()
    val sig = sets.select(col("id"), shingleFps(col("shingles")).as("fps"))
      .select(col("id"), minhashSignature(col("fps"), k).as("sig"))
    val bandRows = sig.select(col("id"), explode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"), hash(slice(col("sig"), b * r + 1, lit(r))).as("bh")))
    ).as("bb")).select(col("id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
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

  /** 64-bit SimHash from a materialized token-hash array column: bit j of the
    * signature is the sign of the sum over distinct tokens of (+1/-1 per bit
    * j of xxhash64(token)). `fps` must be a column reference — it is read 64
    * times (once per bit) and an inline expression would be re-evaluated each
    * time (HOF lambdas are interpreted, no CSE). */
  def simhashFromFps(fps: Column): Column =
    aggregate(
      transform(sequence(lit(0), lit(63)), j => {
        val vote = aggregate(fps, lit(0L),
          (acc, f) => acc + call_function("shiftrightunsigned", f, j).bitwiseAND(lit(1L)) * 2 - 1)
        when(vote > 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))
      }),
      lit(0L), (acc, bit) => acc.bitwiseOR(bit))

  /** Token xxhash64 fingerprints to stage as a column for [[simhashFromFps]]. */
  def tokenFps(text: Column): Column =
    transform(array_distinct(TextOps.tokens(text)), t => xxhash64(t))

  /** SimHash near-duplicate pairs within `maxHamming` (< 16-bit-band recall
    * bound: guaranteed complete for maxHamming <= 3 by pigeonhole over 4
    * chunks; larger radii would need more tables).
    * Output: (id_a, id_b, hamming). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), tokenFps(col(textCol)).as("fps"))
      .select(col("id"), simhashFromFps(col("fps")).as("sig"))
    val chunks = sigs.select(col("id"), col("sig"), explode(
      transform(sequence(lit(0), lit(3)),
        c => struct(c.as("ci"),
          call_function("shiftrightunsigned", col("sig"), c * 16).bitwiseAND(lit(0xFFFFL)).as("cv")))
    ).as("ch")).select(col("id"), col("sig"), col("ch.ci").as("ci"), col("ch.cv").as("cv"))
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.ci") === col("b.ci") && col("a.cv") === col("b.cv") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
