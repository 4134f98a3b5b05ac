package graft.queries

import graft.{QueryDef, Tables => T}
import graft.operators._
import org.apache.spark.sql.functions._

/** Training-data pipeline operators as driver-checkable queries (SURVEY.md
  * §7.5, the beyond-reference tier): dedup (exact / n-gram Jaccard /
  * MinHash-LSH / SimHash), embedding similarity (brute-force kNN / blocked
  * near-dup / LSH ANN), text analysis (tokens, quality, language-ID,
  * fingerprints), as-of join, sessionization, multimodal plumbing.
  *
  * Queries with `oracle = Some(sql)` are hash-compared against DuckDB — the
  * SQL mirrors the Spark expression tree operation-for-operation (same fold
  * order for float work, same integer/decimal types) so results are
  * bit-identical. Approximate operators (MinHash, SimHash, LSH ANN) get
  * rows-only driver checks plus exactness/recall ScalaTest specs against
  * their exact counterparts.
  */
object PipelineQueries {

  /** Shared DuckDB fragments, kept in lockstep with TextOps/Similarity. */
  private val ToksSql = "string_split_regex(trim(text), '\\s+')"
  private val StopSql = TextOps.Stopwords.map(s => s"'$s'").mkString("(", ", ", ")")
  private def dotSql(a: String, b: String) =
    s"list_reduce(list_transform(range(1, len($a)+1), i -> $a[i]*$b[i]), (x,y) -> x+y)"
  private def normSql(v: String) =
    s"sqrt(list_reduce(list_transform(range(1, len($v)+1), i -> $v[i]*$v[i]), (x,y) -> x+y))"

  /** MinHash-LSH near-dup pair generation (the p05 pipeline) as a reusable
    * CTE chain ending in `pairs(id_a, id_b, inter, uni, jaccard)` — kept in
    * lockstep with [[Dedup.minhashLshPairs]] (md5-derived fingerprints,
    * 64-hash universal family, 16 bands x 4 rows, exact-jaccard verify). */
  private val MinhashPairsCte = s"""t AS (SELECT doc_id, $ToksSql AS tk FROM documents),
        sets AS (SELECT doc_id,
            list_distinct(list_transform(range(0, len(tk)-2),
              i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])) AS shs
          FROM t WHERE len(tk) >= 3),
        posts AS (SELECT doc_id, unnest(shs) AS sh FROM sets),
        fps AS (SELECT doc_id,
            ('0x' || substring(md5(sh), 1, 15))::BIGINT % 2147483648 AS f
          FROM posts),
        comp AS (SELECT doc_id, i,
            MIN((((2654435769 * (2*i + 1)) % 2147483645 + 1) * f
                 + ((3266489917 * (i + 1)) % 2147483647)) % 2147483647) AS h
          FROM fps CROSS JOIN range(64) r(i) GROUP BY doc_id, i),
        sigs AS (SELECT doc_id, list(h ORDER BY i) AS sig FROM comp GROUP BY doc_id),
        bands AS (SELECT doc_id, b AS band,
            array_to_string(sig[b*4 + 1 : b*4 + 4], ',') AS bh
          FROM sigs CROSS JOIN range(16) rb(b)),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
        verified AS (SELECT id_a, id_b,
            CAST(len(list_intersect(sa.shs, sb.shs)) AS BIGINT) AS inter,
            CAST(len(sa.shs) AS BIGINT) + CAST(len(sb.shs) AS BIGINT)
              - CAST(len(list_intersect(sa.shs, sb.shs)) AS BIGINT) AS uni
          FROM cand
          JOIN sets sa ON id_a = sa.doc_id
          JOIN sets sb ON id_b = sb.doc_id),
        pairs AS (SELECT id_a, id_b, inter, uni, jaccard FROM (
            SELECT id_a, id_b, inter, uni, inter / uni AS jaccard FROM verified)
          WHERE jaccard >= 0.5)"""

  val all: Seq[QueryDef] = Seq(

    // ---- p01: exact dedup groups by content fingerprint --------------------
    QueryDef("p01_dedup_exact",
      (s, d) => Dedup.exactGroups(T.documents(s, d), "doc_id", "text")
        .orderBy("fp"),
      Some("""
        SELECT md5(text) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        FROM documents GROUP BY 1 ORDER BY fp""")),

    // ---- p02: per-document text statistics & quality score -----------------
    QueryDef("p02_doc_quality",
      (s, d) => T.documents(s, d).select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextOps.bpeishTokenCount(col("text")).cast("long").as("n_units"),
        TextOps.punctRatio(col("text")).as("punct_ratio"),
        TextOps.stopwordRatio(col("text")).as("stopword_ratio"),
        TextOps.meanTokenLen(col("text")).as("mean_token_len"),
        TextOps.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id"),
      Some(s"""
        WITH t AS (SELECT doc_id, text, $ToksSql AS toks FROM documents)
        SELECT doc_id,
          len(toks) AS n_tokens,
          len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_units,
          CAST(len(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
            / CAST(greatest(len(text), 1) AS DOUBLE) AS punct_ratio,
          CAST(len(list_filter(toks, x -> x IN $StopSql)) AS DOUBLE)
            / CAST(greatest(len(toks), 1) AS DOUBLE) AS stopword_ratio,
          CAST(list_reduce(list_transform(toks, x -> len(x)), (a,b) -> a+b) AS DOUBLE)
            / CAST(greatest(len(toks), 1) AS DOUBLE) AS mean_token_len,
          least(CAST(len(toks) AS DOUBLE) / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.4 AS DOUBLE)
           + least(CAST(len(list_filter(toks, x -> x IN $StopSql)) AS DOUBLE)
                     / CAST(greatest(len(toks), 1) AS DOUBLE) * CAST(10.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.4 AS DOUBLE)
           + (CAST(1.0 AS DOUBLE)
              - least(CAST(len(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                        / CAST(greatest(len(text), 1) AS DOUBLE) * CAST(5.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(0.2 AS DOUBLE)
            AS quality
        FROM t ORDER BY doc_id""")),

    // ---- p03: language-ID heuristic vs the synthetic label -----------------
    QueryDef("p03_langid",
      (s, d) => T.documents(s, d)
        .withColumn("pred_lang", TextOps.langIdPredict(col("text")))
        .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred_lang"),
      Some(s"""
        SELECT lang,
          CASE WHEN CAST(len(list_filter($ToksSql, x -> x IN $StopSql)) AS DOUBLE)
                      / CAST(greatest(len($ToksSql), 1) AS DOUBLE) >= CAST(0.02 AS DOUBLE)
               THEN 'en' ELSE 'unk' END AS pred_lang,
          COUNT(*) AS n
        FROM documents GROUP BY 1, 2 ORDER BY lang, pred_lang""")),

    // ---- p04: exact word-3-gram Jaccard near-dup pairs ---------------------
    QueryDef("p04_jaccard_pairs",
      (s, d) => Dedup.jaccardPairs(T.documents(s, d), "doc_id", "text",
        n = 3, minJaccard = 0.5).orderBy("id_a", "id_b"),
      Some(s"""
        WITH t AS (SELECT doc_id, $ToksSql AS tk FROM documents),
        sets AS (SELECT doc_id,
            list_distinct(list_transform(range(0, len(tk)-2),
              i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])) AS shs
          FROM t WHERE len(tk) >= 3),
        posts AS (SELECT doc_id, unnest(shs) AS sh FROM sets),
        sizes AS (SELECT doc_id, CAST(len(shs) AS BIGINT) AS sz FROM sets),
        inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
          FROM posts a JOIN posts b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b, inter, uni, jaccard FROM (
          SELECT id_a, id_b, i AS inter, sa.sz + sb.sz - i AS uni,
                 i / (sa.sz + sb.sz - i) AS jaccard
          FROM inter
          JOIN sizes sa ON id_a = sa.doc_id
          JOIN sizes sb ON id_b = sb.doc_id)
        WHERE jaccard >= 0.5 ORDER BY id_a, id_b""")),

    // ---- p18: Jaccard pairs WITH the hot-shingle skew cap engaged — the
    // guard that bounds candidate blowup at 100 TB (a shingle shared by 1M
    // docs is 10^12 pairs on one reducer). Oracle mirrors the capped
    // universe exactly: sizes come from the CAPPED postings too, so the
    // score is the true jaccard of the pruned sets (not a biased
    // underestimate), and results hash-match. -----------------------------
    QueryDef("p18_jaccard_capped",
      (s, d) => Dedup.jaccardPairs(T.documents(s, d), "doc_id", "text",
        n = 3, minJaccard = 0.2, maxDocFreq = Some(3L)).orderBy("id_a", "id_b"),
      Some(s"""
        WITH t AS (SELECT doc_id, $ToksSql AS tk FROM documents),
        sets AS (SELECT doc_id,
            list_distinct(list_transform(range(0, len(tk)-2),
              i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])) AS shs
          FROM t WHERE len(tk) >= 3),
        posts0 AS (SELECT doc_id, unnest(shs) AS sh FROM sets),
        hot AS (SELECT sh FROM posts0 GROUP BY sh HAVING COUNT(*) > 3),
        posts AS (SELECT * FROM posts0 WHERE sh NOT IN (SELECT sh FROM hot)),
        sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz
          FROM posts GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
          FROM posts a JOIN posts b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b, inter, uni, jaccard FROM (
          SELECT id_a, id_b, i AS inter, sa.sz + sb.sz - i AS uni,
                 i / (sa.sz + sb.sz - i) AS jaccard
          FROM inter
          JOIN sizes sa ON id_a = sa.doc_id
          JOIN sizes sb ON id_b = sb.doc_id)
        WHERE jaccard >= 0.2 ORDER BY id_a, id_b""")),

    // ---- p05: MinHash-LSH near-dup pairs, exactly verified. The oracle
    // re-derives the whole pipeline: md5-based 31-bit shingle fingerprints
    // (mdHash31), the (a_i*f+b_i) mod P universal-hash family of
    // MinHashSketchAgg, 16x4 band keys, bucket-join candidates, exact
    // Jaccard verification — every stage engine-portable by construction. --
    QueryDef("p05_minhash_pairs",
      (s, d) => Dedup.minhashLshPairs(T.documents(s, d), "doc_id", "text",
        n = 3, minJaccard = 0.5).orderBy("id_a", "id_b"),
      Some(s"""
        WITH $MinhashPairsCte
        SELECT id_a, id_b, inter, uni, jaccard FROM pairs
        ORDER BY id_a, id_b""")),

    // ---- p24: near-dup CLUSTERS — pairs are edges, a duplicate cluster is
    // a connected component (A~B, B~C => {A,B,C} even when A!~C directly).
    // Spark side: alternating large-star/small-star (O(log n) key-shuffle
    // rounds — the 100 TB shape; Components.scala). Oracle: the same LSH
    // pairs + a recursive min-reachability CTE. ---------------------------
    QueryDef("p24_dedup_clusters",
      (s, d) => {
        val docs = T.documents(s, d)
        val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
          n = 3, minJaccard = 0.5)
        Components.dedupClusters(docs, "doc_id", pairs).orderBy("doc_id")
      },
      Some(s"""
        WITH RECURSIVE $MinhashPairsCte,
        sym AS (SELECT id_a AS u, id_b AS v FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs),
        reach(v, x) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM sym) n
          UNION
          SELECT r.v, s.v FROM reach r JOIN sym s ON r.x = s.u),
        cc AS (SELECT v AS doc_id, MIN(x) AS cluster_id FROM reach GROUP BY v),
        assigned AS (SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
          FROM documents d LEFT JOIN cc c USING (doc_id)),
        csizes AS (SELECT cluster_id, COUNT(*) AS cluster_size
          FROM assigned GROUP BY 1)
        SELECT doc_id, cluster_id, cluster_size
        FROM assigned JOIN csizes USING (cluster_id)
        ORDER BY doc_id""")),

    // ---- p06: SimHash near-dup pairs. Oracle mirrors the 60-bit md5
    // fingerprints (mdHash60), the ±1 bit votes of SimHashAgg, sign packing,
    // 4x16-bit banding and the Hamming filter. -----------------------------
    QueryDef("p06_simhash_pairs",
      (s, d) => Dedup.simhashPairs(T.documents(s, d), "doc_id", "text",
        maxHamming = 3).orderBy("id_a", "id_b"),
      Some(s"""
        WITH t AS (SELECT doc_id, list_distinct($ToksSql) AS tks FROM documents),
        posts AS (SELECT doc_id, unnest(tks) AS tok FROM t),
        f AS (SELECT doc_id,
            ('0x' || substring(md5(tok), 1, 15))::BIGINT AS f
          FROM posts),
        votes AS (SELECT doc_id, j,
            SUM(CASE WHEN (f >> j) & 1 = 1 THEN 1 ELSE -1 END) AS v
          FROM f CROSS JOIN range(60) rj(j) GROUP BY doc_id, j),
        sigs AS (SELECT doc_id,
            SUM(CASE WHEN v > 0 THEN (1::BIGINT << j) ELSE 0 END) AS sig
          FROM votes GROUP BY doc_id),
        chunks AS (SELECT doc_id, sig, c, (sig >> (c*16)) & 65535 AS cv
          FROM sigs CROSS JOIN range(4) rc(c)),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
          FROM chunks a JOIN chunks b
            ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id)
        SELECT id_a, id_b, hamming FROM cand
        WHERE hamming <= 3 ORDER BY id_a, id_b""")),

    // ---- p07: brute-force cosine top-k (bit-exact vs DuckDB) ---------------
    QueryDef("p07_knn_cosine",
      (s, d) => {
        val e = T.embeddings(s, d)
        Similarity.knnBruteForce(e, "vec_id",
          e.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
          .withColumnRenamed("id", "vec_id")
          .orderBy("q_id", "rnk")
      },
      Some(s"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        n AS (SELECT vec_id, v, ${normSql("v")} AS nrm FROM e),
        sims AS (SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
            ${dotSql("c.v", "q.v")} / (c.nrm * q.nrm) AS sim
          FROM n c, n q WHERE q.vec_id < 5)
        SELECT q_id, vec_id, sim, rnk FROM (
          SELECT q_id, vec_id, sim,
            CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id)
              AS INTEGER) AS rnk
          FROM sims)
        WHERE rnk <= 10 ORDER BY q_id, rnk""")),

    // ---- p08: exact blocked cosine near-dup join (blocking key = label) ----
    QueryDef("p08_cosine_blocked",
      (s, d) => Similarity.cosineNearDupBlocked(T.embeddings(s, d),
        "vec_id", "embedding", "label", minSim = 0.3).orderBy("id_a", "id_b"),
      Some(s"""
        WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        n AS (SELECT vec_id, label, v, ${normSql("v")} AS nrm FROM e)
        SELECT id_a, id_b, sim FROM (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            ${dotSql("a.v", "b.v")} / (a.nrm * b.nrm) AS sim
          FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
        WHERE sim >= 0.3 ORDER BY id_a, id_b""")),

    // ---- p09: LSH approximate NN. The oracle re-derives VecLshKeys'
    // integer-LCG hyperplanes bit-identically (pure integer ops + one exact
    // dyadic division), reproduces the bucket-collision candidate set, and
    // computes the same fold-order cosine — hash-exact end to end. ----------
    QueryDef("p09_ann_lsh",
      (s, d) => {
        val e = T.embeddings(s, d)
        Similarity.annLshTopK(e, "vec_id", e.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 10)
          .withColumnRenamed("id", "vec_id")
          .orderBy("q_id", "rnk")
      },
      Some(s"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        n AS (SELECT vec_id, v, ${normSql("v")} AS nrm FROM e),
        proj AS (SELECT vec_id, t, j,
            list_reduce(list_transform(range(0, len(v)), d ->
              v[d+1] * (((1103515245 * (t*8191 + j*131 + d) + 12345) % 2147483648)
                        / 2147483648.0 - 0.5)),
              (x, y) -> x + y) AS s
          FROM n CROSS JOIN range(8) rt(t) CROSS JOIN range(8) rj(j)),
        keys AS (SELECT vec_id, t,
            SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS bk
          FROM proj GROUP BY vec_id, t),
        cand AS (SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS id
          FROM keys c JOIN keys q ON c.t = q.t AND c.bk = q.bk
          WHERE q.vec_id < 5),
        sims AS (SELECT cand.q_id, cand.id AS vec_id,
            ${dotSql("c.v", "q.v")} / (c.nrm * q.nrm) AS sim
          FROM cand JOIN n c ON cand.id = c.vec_id JOIN n q ON cand.q_id = q.vec_id)
        SELECT q_id, vec_id, sim, rnk FROM (
          SELECT q_id, vec_id, sim,
            CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id)
              AS INTEGER) AS rnk
          FROM sims)
        WHERE rnk <= 10 ORDER BY q_id, rnk""")),

    // ---- p22: sign-quantized (binary) NN — 64-bit signatures, Hamming
    // pre-rank, exact cosine rerank. Oracle re-derives the signatures from
    // the same integer-LCG planes as p09 (t=0 table), the same xor/popcount
    // distance and both rank windows — hash-exact end to end. --------------
    QueryDef("p22_ann_hamming",
      (s, d) => {
        val e = T.embeddings(s, d)
        Similarity.hammingTopK(e, "vec_id", e.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 10, rerank = 40)
          .withColumnRenamed("id", "vec_id")
          .orderBy("q_id", "rnk")
      },
      Some(s"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        n AS (SELECT vec_id, v, ${normSql("v")} AS nrm FROM e),
        proj AS (SELECT vec_id, j,
            list_reduce(list_transform(range(0, len(v)), d ->
              v[d+1] * (((1103515245 * (j*131 + d) + 12345) % 2147483648)
                        / 2147483648.0 - 0.5)),
              (x, y) -> x + y) AS s
          FROM n CROSS JOIN range(64) rj(j)),
        sigs AS (SELECT vec_id,
            -- bit 63 is the BIGINT sign bit: DuckDB rejects 1<<63, so it is
            -- added as the min-long constant; CAST pulls the HUGEINT SUM
            -- back to the same 64-bit value Spark's long carries
            CAST(SUM(CASE WHEN s > 0 THEN
                CASE WHEN j = 63 THEN -9223372036854775807 - 1
                     ELSE (1::BIGINT << j) END
              ELSE 0 END) AS BIGINT) AS sig
          FROM proj GROUP BY vec_id),
        cand AS (SELECT q.vec_id AS q_id, c.vec_id AS id,
            CAST(bit_count(xor(c.sig, q.sig)) AS INTEGER) AS hamming
          FROM sigs c, sigs q WHERE q.vec_id < 5
          QUALIFY ROW_NUMBER() OVER (PARTITION BY q.vec_id
            ORDER BY bit_count(xor(c.sig, q.sig)), c.vec_id) <= 40),
        sims AS (SELECT cand.q_id, cand.id AS vec_id, cand.hamming,
            ${dotSql("c.v", "q.v")} / (c.nrm * q.nrm) AS sim
          FROM cand JOIN n c ON cand.id = c.vec_id JOIN n q ON cand.q_id = q.vec_id)
        SELECT q_id, vec_id, hamming, sim, rnk FROM (
          SELECT q_id, vec_id, hamming, sim,
            CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id)
              AS INTEGER) AS rnk
          FROM sims)
        WHERE rnk <= 10 ORDER BY q_id, rnk""")),

    // ---- p15: IVF approximate NN. Oracle re-derives the whole index:
    // md5-hash-ordered centroid seeds (portable by construction — see
    // Similarity.ivfTopK), normalized centroids, argmax cell assignment
    // (tie: higher cid, Spark's array_max struct order), nProbe=4 probes
    // (sim DESC, cid DESC — reverse(array_sort) order), exact cosine on
    // candidates. Bit-exact: strict left-to-right double folds both sides. --
    QueryDef("p15_ann_ivf",
      (s, d) => {
        val e = T.embeddings(s, d)
        Similarity.ivfTopK(e, "vec_id", e.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 10, nCentroids = 16, nProbe = 4)
          .withColumnRenamed("id", "vec_id")
          .orderBy("q_id", "rnk")
      },
      Some(s"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        n AS (SELECT vec_id, v, ${normSql("v")} AS nrm FROM e),
        seed AS (SELECT vec_id, v, nrm,
            ROW_NUMBER() OVER (ORDER BY
              ('0x' || substring(md5(CAST(vec_id AS VARCHAR)),1,15))::BIGINT % 9973,
              vec_id) - 1 AS cid
          FROM n QUALIFY cid < 16),
        cent AS (SELECT cid,
            CASE WHEN nrm = 0 THEN v ELSE list_transform(v, x -> x/nrm) END AS cv
          FROM seed),
        asim AS (SELECT n.vec_id, cent.cid, ${dotSql("n.v", "cent.cv")} AS sim
          FROM n CROSS JOIN cent),
        assign AS (SELECT vec_id, cid AS cell FROM asim
          QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid DESC) = 1),
        probes AS (SELECT vec_id AS q_id, cid AS cell FROM asim WHERE vec_id < 5
          QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid DESC) <= 4),
        cand AS (SELECT p.q_id, a.vec_id AS id FROM probes p JOIN assign a ON p.cell = a.cell),
        sims AS (SELECT cand.q_id, cand.id AS vec_id,
            ${dotSql("c.v", "q.v")} / (c.nrm * q.nrm) AS sim
          FROM cand JOIN n c ON cand.id = c.vec_id JOIN n q ON cand.q_id = q.vec_id)
        SELECT q_id, vec_id, sim, rnk FROM (
          SELECT q_id, vec_id, sim,
            CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id)
              AS INTEGER) AS rnk
          FROM sims)
        WHERE rnk <= 10 ORDER BY q_id, rnk""")),

    // ---- p10: winnowing fingerprints (rolling-hash mirror in DuckDB) -------
    QueryDef("p10_winnowing",
      (s, d) => T.documents(s, d)
        .select(col("doc_id"), TextOps.charCodes(col("text")).as("ch"))
        .select(col("doc_id"), TextOps.kgramHashes(col("ch")).as("kgrams"))
        .select(col("doc_id"), TextOps.winnowFromKgrams(col("kgrams")).as("fps"))
        .select(col("doc_id"),
          size(col("fps")).cast("long").as("n_fps"),
          array_min(col("fps")).as("fp_min"),
          array_max(col("fps")).as("fp_max"),
          aggregate(col("fps"), lit(0L), (a, b) => a + b).as("fp_sum"))
        .orderBy("doc_id"),
      Some(s"""
        WITH c AS (SELECT doc_id,
            list_transform(range(1, strlen(text)+1), i -> CAST(unicode(text[i]) AS BIGINT)) AS ch
          FROM documents),
        kg AS (SELECT doc_id,
            CASE WHEN len(ch) >= 8 THEN
              list_transform(range(0, len(ch)-7),
                i -> list_reduce(ch[i+1:i+8], (a,b) -> (a*31+b) % 1000000000000037))
            ELSE [] END AS kgrams
          FROM c),
        fp AS (SELECT doc_id,
            CASE WHEN len(kgrams) >= 4 THEN
              list_sort(list_distinct(list_transform(range(0, len(kgrams)-3),
                i -> list_min(kgrams[i+1:i+4]))))
            ELSE list_sort(list_distinct(kgrams)) END AS fps
          FROM kg)
        SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fps,
          list_min(fps) AS fp_min, list_max(fps) AS fp_max,
          list_reduce(fps, (a,b) -> a+b) AS fp_sum
        FROM fp ORDER BY doc_id""")),

    // ---- p11: as-of join (latest signup at or before each event) -----------
    QueryDef("p11_asof_signup",
      (s, d) => {
        val ev = T.events(s, d)
        val signups = ev.filter(col("event_type") === "signup")
          .groupBy("user_id", "ts")
          .agg(max(col("event_id")).as("signup_event_id"))
          .withColumn("signup_ts", col("ts"))
        AsofJoin.asofJoin(
          ev.select("event_id", "user_id", "ts"), signups,
          keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
          payload = Seq("signup_event_id", "signup_ts"))
          .orderBy("event_id")
      },
      Some("""
        WITH s AS (SELECT user_id, ts, MAX(event_id) AS signup_event_id
                   FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
        SELECT e.event_id, e.user_id, e.ts,
               s.signup_event_id, s.ts AS signup_ts
        FROM events e ASOF LEFT JOIN s
          ON e.user_id = s.user_id AND e.ts >= s.ts
        ORDER BY e.event_id""")),

    // ---- p12: gap-based sessionization (30-min gap) ------------------------
    QueryDef("p12_sessionize",
      (s, d) => Sessions.sessionStats(T.events(s, d), "user_id", "ts",
        tieBreak = "event_id", gapMicros = 1800000000L)
        .orderBy("user_id", "session_id"),
      Some("""
        WITH g AS (SELECT user_id, event_id, ts,
            CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                 THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        se AS (SELECT user_id, ts,
            CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
          FROM g)
        SELECT user_id, session_id, COUNT(*) AS n_events,
               MIN(ts) AS t_start, MAX(ts) AS t_end
        FROM se GROUP BY 1, 2 ORDER BY user_id, session_id""")),

    // ---- p13: multimodal binary plumbing (byte length + fingerprint) -------
    QueryDef("p13_media_bytes",
      (s, d) => Multimodal.attachBinary(T.documents(s, d), "text", "image")
        .select(col("doc_id"),
          length(col("content")).cast("long").as("n_bytes"),
          md5(col("text")).as("fp"),
          col("meta.kind").as("kind"))
        .orderBy("doc_id"),
      Some("""
        SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
               md5(text) AS fp, 'image' AS kind
        FROM documents ORDER BY doc_id""")),

    // ---- p14: stubbed decode + feature extraction via mapPartitions --------
    // (rows-only: the mapPartitions path has no SQL equivalent; determinism
    // and shape are spec-verified)
    // Oracle re-derives the stub codec byte-for-byte: UTF-8 bytes via
    // hex(encode(text)), the (a*31+b) % 1000003 dimension fold, integer
    // lane-0 sum + one float32 division for the feature (see
    // Multimodal.StubCodec — designed portable; a real codec would make this
    // rows-only again, honestly).
    QueryDef("p14_media_decode",
      (s, d) => {
        val media = Multimodal.attachBinary(
          T.documents(s, d).select("doc_id", "text"), "text", "image")
        val decoded = Multimodal.decodeMeta(media, "content")
        Multimodal.extractFeatures(decoded, "content", dim = 8)
          .select(col("doc_id"), col("decoded_width"), col("decoded_height"),
            element_at(col("features"), 1).cast("double").as("f0"),
            size(col("features")).as("feat_dim"))
          .orderBy("doc_id")
      },
      Some("""
        WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
            octet_length(encode(text)) AS olen
          FROM documents),
        ch AS (SELECT doc_id,
            list_transform(range(0, olen),
              i -> ('0x' || substring(hx, 2*i+1, 2))::BIGINT) AS bytes
          FROM b),
        h AS (SELECT doc_id,
            list_reduce(list_prepend(CAST(17 AS BIGINT), bytes),
              (a, c) -> (a*31 + c) % 1000003) AS hv,
            COALESCE(list_sum(list_transform(range(0, len(bytes)),
              i -> CASE WHEN i % 8 = 0 THEN bytes[i+1] ELSE 0 END)), 0) AS lane0
          FROM ch)
        SELECT doc_id,
          CAST((hv % 1920) + 1 AS INT) AS decoded_width,
          CAST(((hv // 1920) % 1080) + 1 AS INT) AS decoded_height,
          CAST(CAST(lane0 AS FLOAT) / CAST(255.0 AS FLOAT) AS DOUBLE) AS f0,
          CAST(8 AS INT) AS feat_dim
        FROM h ORDER BY doc_id""")),

    // ---- p17: composed cleaning pipeline (the end-to-end use case) ---------
    // quality-filter -> exact dedup -> per-source stats: the shape of a real
    // training-data cleaning job, each stage an operator from this module.
    QueryDef("p17_clean_pipeline",
      (s, d) => {
        val scored = T.documents(s, d)
          .withColumn("q", TextOps.qualityScore(col("text")))
          .filter(col("q") >= 0.3)
        val deduped = Dedup.dedupExact(scored, "doc_id", "text")
        deduped.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            min(col("doc_id")).as("first_doc"))
          .orderBy("source")
      },
      Some(s"""
        WITH scored AS (
          SELECT *,
            least(CAST(len($ToksSql) AS DOUBLE) / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.4 AS DOUBLE)
             + least(CAST(len(list_filter($ToksSql, x -> x IN $StopSql)) AS DOUBLE)
                       / CAST(greatest(len($ToksSql), 1) AS DOUBLE) * CAST(10.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.4 AS DOUBLE)
             + (CAST(1.0 AS DOUBLE)
                - least(CAST(len(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                          / CAST(greatest(len(text), 1) AS DOUBLE) * CAST(5.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(0.2 AS DOUBLE)
              AS q
          FROM documents),
        filtered AS (SELECT * FROM scored WHERE q >= 0.3),
        keep AS (SELECT MIN(doc_id) AS doc_id FROM filtered GROUP BY md5(text)),
        deduped AS (SELECT f.* FROM filtered f JOIN keep USING (doc_id))
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               MIN(doc_id) AS first_doc
        FROM deduped GROUP BY source ORDER BY source""")),

    // ---- p16: video-style frame sampling (per-partition stub demuxer) ------
    // ---- p19: embedding-cosine near-dup with NO blocking key: LSH bucket
    // collisions propose narrow (id_a, id_b) candidates, exact cosine
    // verifies >= 0.3. Oracle re-derives the same integer-LCG hyperplanes as
    // p09, the collision pair set, and the bit-exact cosine. ---------------
    QueryDef("p19_cosine_lsh_pairs",
      (s, d) => Similarity.cosineNearDupLsh(T.embeddings(s, d),
        "vec_id", "embedding", minSim = 0.3).orderBy("id_a", "id_b"),
      Some(s"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        n AS (SELECT vec_id, v, ${normSql("v")} AS nrm FROM e),
        proj AS (SELECT vec_id, t, j,
            list_reduce(list_transform(range(0, len(v)), d ->
              v[d+1] * (((1103515245 * (t*8191 + j*131 + d) + 12345) % 2147483648)
                        / 2147483648.0 - 0.5)),
              (x, y) -> x + y) AS s
          FROM n CROSS JOIN range(8) rt(t) CROSS JOIN range(8) rj(j)),
        keys AS (SELECT vec_id, t,
            SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS bk
          FROM proj GROUP BY vec_id, t),
        cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM keys a JOIN keys b ON a.t = b.t AND a.bk = b.bk
            AND a.vec_id < b.vec_id)
        SELECT id_a, id_b, sim FROM (
          SELECT cand.id_a, cand.id_b,
            ${dotSql("a.v", "b.v")} / (a.nrm * b.nrm) AS sim
          FROM cand JOIN n a ON cand.id_a = a.vec_id
                    JOIN n b ON cand.id_b = b.vec_id)
        WHERE sim >= 0.3 ORDER BY id_a, id_b""")),

    // ---- p23: benchmark decontamination — corpus docs sharing word
    // 3-grams with the (broadcast) benchmark set. The 100 TB shape: the
    // benchmark shingle set broadcasts, the corpus scan is map-only, the
    // only shuffle is the per-doc hit count over matches. ------------------
    QueryDef("p23_decontaminate",
      (s, d) => {
        val docs = T.documents(s, d)
        Dedup.contaminationHits(
          docs.filter(col("doc_id") >= 5), "doc_id", "text",
          docs.filter(col("doc_id") < 5), "text", n = 3, minShared = 1L)
          .select(col("id").as("doc_id"), col("n_shared"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH t AS (SELECT doc_id, $ToksSql AS tk FROM documents),
        sets AS (SELECT doc_id,
            list_distinct(list_transform(range(0, len(tk)-2),
              i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])) AS shs
          FROM t WHERE len(tk) >= 3),
        cposts AS (SELECT doc_id, unnest(shs) AS sh FROM sets WHERE doc_id >= 5),
        bsh AS (SELECT DISTINCT unnest(shs) AS sh FROM sets WHERE doc_id < 5)
        SELECT doc_id, COUNT(*) AS n_shared
        FROM cposts WHERE sh IN (SELECT sh FROM bsh)
        GROUP BY 1 HAVING COUNT(*) >= 1 ORDER BY doc_id""")),

    // ---- p20: deterministic train/val/test split. Map-only at any scale —
    // the salted md5 bucket decides the split row-locally, reproducible
    // across runs and engines (the property that keeps test docs out of
    // training forever). Oracle mirrors mdHash31 exactly. ------------------
    QueryDef("p20_split_assign",
      (s, d) => Shards.assignSplit(T.documents(s, d), "doc_id")
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy("split"),
      Some("""
        WITH b AS (SELECT doc_id,
            (('0x' || substring(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              % 2147483648) % 1000 AS bk
          FROM documents)
        SELECT CASE WHEN bk < 100 THEN 'test'
                    WHEN bk < 200 THEN 'val'
                    ELSE 'train' END AS split,
          COUNT(*) AS n_docs, MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        FROM b GROUP BY 1 ORDER BY split""")),

    // ---- p21: token-budget shard packing. One partitioned window per
    // source (each source cumsums independently — no global sort), shard =
    // floor(exclusive running tokens / budget): contiguous shards bounded by
    // budget + one doc, the shape of writing ~fixed-token training files. --
    QueryDef("p21_pack_shards",
      (s, d) => {
        val docs = T.documents(s, d).select(col("doc_id"), col("source"),
          TextOps.tokenCount(col("text")).cast("long").as("tk"))
        Shards.packShards(docs, "source", "doc_id", "tk", budget = 2000L)
          .groupBy("source", "shard_id")
          .agg(count(lit(1)).as("n_docs"), sum(col("tk")).as("shard_tokens"),
            min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
          .orderBy("source", "shard_id")
      },
      Some(s"""
        WITH t AS (SELECT doc_id, source, CAST(len($ToksSql) AS BIGINT) AS tk
          FROM documents),
        w AS (SELECT doc_id, source, tk,
            SUM(tk) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tk AS ecs
          FROM t)
        SELECT source, CAST(ecs // 2000 AS BIGINT) AS shard_id,
          COUNT(*) AS n_docs, CAST(SUM(tk) AS BIGINT) AS shard_tokens,
          MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        FROM w GROUP BY 1, 2 ORDER BY source, shard_id""")),

    // Oracle mirrors the frame-window arithmetic on byte lengths alone:
    // frame = max(1, len/4), min(4, len) windows, last window truncated at
    // len — all integer, no byte content needed.
    QueryDef("p16_media_frames",
      (s, d) => {
        val media = Multimodal.attachBinary(
          T.documents(s, d).select("doc_id", "text"), "text", "video")
        Multimodal.sampleFrames(media, "content", n = 4)
          .select(col("doc_id"),
            size(col("frames")).as("n_frames"),
            aggregate(transform(col("frames"), f => length(f).cast("long")),
              lit(0L), (a, b) => a + b).as("total_frame_bytes"),
            length(element_at(col("frames"), 1)).cast("long").as("first_frame_bytes"))
          .orderBy("doc_id")
      },
      Some("""
        WITH m AS (SELECT doc_id, octet_length(encode(text)) AS olen FROM documents),
        f AS (SELECT doc_id, olen,
            GREATEST(1, olen // 4) AS fr, LEAST(4, olen) AS nf FROM m)
        SELECT doc_id, CAST(nf AS INT) AS n_frames,
          CAST(COALESCE(list_sum(list_transform(range(0, nf),
            i -> GREATEST(0, LEAST(olen, (i+1)*fr) - i*fr))), 0) AS BIGINT)
            AS total_frame_bytes,
          CAST(CASE WHEN nf > 0 THEN LEAST(olen, fr) ELSE NULL END AS BIGINT)
            AS first_frame_bytes
        FROM f ORDER BY doc_id""")),

    // ---- p25: Gopher-style repetition filters. Spark side is MAP-ONLY
    // (top-multiplicity = longest equal run in the sorted gram array — an
    // O(n log n) per-row fold, no explode/groupBy); oracle computes the same
    // values the relational way (unnest + count + max). -------------------
    QueryDef("p25_repetition",
      (s, d) => T.documents(s, d).select(
        col("doc_id"),
        TextOps.dupTokenFrac(TextOps.tokens(col("text"))).as("dup_token_frac"),
        TextOps.topTokenFrac(TextOps.tokens(col("text"))).as("top_token_frac"),
        TextOps.top2gramFrac(TextOps.tokens(col("text"))).as("top_2gram_frac"))
        .withColumn("repetitive",
          col("dup_token_frac") > 0.3 || col("top_2gram_frac") > 0.18)
        .orderBy("doc_id"),
      Some(s"""
        WITH t AS (SELECT doc_id, $ToksSql AS tk FROM documents),
        toks AS (SELECT doc_id, unnest(tk) AS w FROM t),
        wcnt AS (SELECT doc_id, MAX(c) AS topw FROM
          (SELECT doc_id, w, COUNT(*) AS c FROM toks GROUP BY 1, 2) GROUP BY 1),
        g AS (SELECT doc_id,
            list_transform(range(0, len(tk)-1), i -> tk[i+1] || ' ' || tk[i+2]) AS gs
          FROM t WHERE len(tk) >= 2),
        grams AS (SELECT doc_id, unnest(gs) AS gm FROM g),
        gcnt AS (SELECT doc_id, MAX(c) AS topg FROM
          (SELECT doc_id, gm, COUNT(*) AS c FROM grams GROUP BY 1, 2) GROUP BY 1)
        SELECT t.doc_id,
          CAST(len(tk) - len(list_distinct(tk)) AS DOUBLE)
            / CAST(greatest(len(tk), 1) AS DOUBLE) AS dup_token_frac,
          CAST(COALESCE(topw, 0) AS DOUBLE)
            / CAST(greatest(len(tk), 1) AS DOUBLE) AS top_token_frac,
          CAST(COALESCE(topg, 0) AS DOUBLE)
            / CAST(greatest(len(tk) - 1, 1) AS DOUBLE) AS top_2gram_frac,
          (CAST(len(tk) - len(list_distinct(tk)) AS DOUBLE)
             / CAST(greatest(len(tk), 1) AS DOUBLE) > 0.3)
          OR (CAST(COALESCE(topg, 0) AS DOUBLE)
             / CAST(greatest(len(tk) - 1, 1) AS DOUBLE) > 0.18) AS repetitive
        FROM t
        LEFT JOIN wcnt ON t.doc_id = wcnt.doc_id
        LEFT JOIN gcnt ON t.doc_id = gcnt.doc_id
        ORDER BY t.doc_id""")),

    // ---- p26: PII detect + redact. The synthetic corpus carries no PII, so
    // the query deterministically plants one email/IP/phone per doc from
    // doc_id (identically in both engines), then counts and redacts.
    // Patterns live in the Java∩RE2 regex subset; DuckDB regexp_replace
    // needs the 'g' flag to match Spark's replace-all. ---------------------
    QueryDef("p26_pii_redact",
      (s, d) => T.documents(s, d).select(col("doc_id"),
          concat_ws(" ", col("text"),
            concat(lit("contact user"), col("doc_id"), lit("@example.com")),
            concat(lit("host 10.1."), pmod(col("doc_id"), lit(250)), lit(".7")),
            concat(lit("tel +49 555 "),
              lpad(pmod(col("doc_id"), lit(100)).cast("string"), 4, "0")))
            .as("text"))
        .select(col("doc_id"),
          Pii.emailCount(col("text")).cast("long").as("n_emails"),
          Pii.ipv4Count(col("text")).cast("long").as("n_ips"),
          Pii.phoneCount(col("text")).cast("long").as("n_phones"),
          Pii.redact(col("text")).as("redacted"))
        .orderBy("doc_id"),
      Some("""
        WITH w AS (SELECT doc_id,
            concat_ws(' ', text,
              'contact user' || doc_id || '@example.com',
              'host 10.1.' || (doc_id % 250) || '.7',
              'tel +49 555 ' || lpad(CAST(doc_id % 100 AS VARCHAR), 4, '0')) AS text
          FROM documents)
        SELECT doc_id,
          CAST(len(regexp_extract_all(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
          CAST(len(regexp_extract_all(text,
            '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
          CAST(len(regexp_extract_all(text,
            '\+\d{1,3}[ -]\d{3}[ -]\d{4}')) AS BIGINT) AS n_phones,
          regexp_replace(regexp_replace(regexp_replace(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
            '\+\d{1,3}[ -]\d{3}[ -]\d{4}', '<PHONE>', 'g') AS redacted
        FROM w ORDER BY doc_id"""))
  )
}
