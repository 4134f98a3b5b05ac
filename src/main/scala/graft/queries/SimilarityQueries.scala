package graft.queries

import graft.{QueryDef, Tables => T}
import graft.operators._
import org.apache.spark.sql.functions._
import QuerySql._

/** Embedding-similarity gate queries: brute-force kNN, blocked cosine
  * near-dup, hyperplane-LSH ANN, sign-quantized Hamming ANN, IVF ANN. */
object SimilarityQueries {

  val all: Seq[QueryDef] = Seq(

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

    // ---- p28: symmetric per-vector int8 quantization — 4x memory/IO cut
    // for ANN candidate stores. floor(x+0.5) (not round: half-even vs
    // half-up differs across engines) + explicit double casts keep the codes
    // AND the L2 reconstruction error bit-identical to DuckDB. ------------
    QueryDef("p28_quantize_int8",
      (s, d) => T.embeddings(s, d)
        .select(col("vec_id"), Quantize.int8QuantStruct(col("embedding")).as("o"))
        // codes as CSV: the compare harness sorts/hashes rows, which needs
        // scalar cells — the string carries every code at full fidelity
        .select(col("vec_id"), col("o.scale").as("scale"),
          concat_ws(",", col("o.q")).as("q_csv"), col("o.err").as("err"))
        .orderBy("vec_id"),
      Some("""
        WITH sc AS (SELECT vec_id, embedding AS v,
            list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
          FROM embeddings),
        qc AS (SELECT vec_id, v, scale,
            list_transform(v, x -> CASE WHEN scale = 0 THEN 0
              ELSE CAST(greatest(-127.0, least(127.0,
                floor(CAST(x AS DOUBLE) / scale + 0.5))) AS INTEGER) END) AS q
          FROM sc)
        SELECT vec_id, scale, array_to_string(q, ',') AS q_csv,
          sqrt(list_reduce(list_transform(range(1, len(v)+1),
            i -> (CAST(v[i] AS DOUBLE) - CAST(q[i] AS DOUBLE) * scale)
               * (CAST(v[i] AS DOUBLE) - CAST(q[i] AS DOUBLE) * scale)),
            (a, b) -> a + b)) AS err
        FROM qc ORDER BY vec_id""")),

    // ---- p30: product-quantization encode — m=8 subspaces x k=16 entries
    // = 8 codes/vector (32x smaller than float32). Codebooks are the IVF
    // hash-ordered corpus sample (md5-derived => DuckDB re-derives them
    // bit-identically from the data); per-subspace argmin L2, ties to the
    // lowest codebook id. -------------------------------------------------
    QueryDef("p30_pq_codes",
      (s, d) => {
        val e = T.embeddings(s, d)
        val cbs = Quantize.pqCodebooks(e, "vec_id", "embedding", m = 8, k = 16)
        e.select(col("vec_id"),
          concat_ws(",", Quantize.pqEncode(col("embedding"), cbs)).as("codes_csv"))
          .orderBy("vec_id")
      },
      Some("""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        seed AS (SELECT v,
            ROW_NUMBER() OVER (ORDER BY
              ('0x' || substring(md5(CAST(vec_id AS VARCHAR)),1,15))::BIGINT % 9973,
              vec_id) - 1 AS ki
          FROM e QUALIFY ki < 16),
        sub AS (SELECT e.vec_id, m.m, s.ki,
            list_reduce(list_transform(range(0, 8),
              j -> (e.v[m.m*8 + j + 1] - s.v[m.m*8 + j + 1])
                 * (e.v[m.m*8 + j + 1] - s.v[m.m*8 + j + 1])),
              (a, b) -> a + b) AS dist
          FROM e CROSS JOIN range(8) m(m) CROSS JOIN seed s),
        best AS (SELECT vec_id, m, ki,
            ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, ki) AS rnk
          FROM sub QUALIFY rnk = 1)
        SELECT vec_id, string_agg(ki, ',' ORDER BY m) AS codes_csv
        FROM best GROUP BY vec_id ORDER BY vec_id""")),

    // ---- p49: cluster-balanced corpus sampling — per-semantic-cell caps
    // flatten the dominant modes a uniform sample inherits (SemDeDup /
    // SSL-prototypes selection shape). Cells from p38's portable
    // hash-seeded centroids; the within-cell "random" order is md5 over
    // the id, so the sample is deterministic and oracle-checkable. -------
    QueryDef("p49_cluster_sample",
      (s, d) => Similarity.clusterBalancedSample(T.embeddings(s, d),
        "vec_id", "embedding", nCentroids = 16, perCell = 20L)
        .orderBy("vec_id"),
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
        assign AS (SELECT vec_id, CAST(cid AS INTEGER) AS cell FROM asim
          QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid DESC) = 1),
        r AS (SELECT vec_id, cell,
            ROW_NUMBER() OVER (PARTITION BY cell ORDER BY
              ('0x' || substring(md5(CAST(vec_id AS VARCHAR)),1,15))::BIGINT,
              vec_id) AS rk
          FROM assign)
        SELECT vec_id, cell, CAST(rk AS BIGINT) AS rk
        FROM r WHERE rk <= 20 ORDER BY vec_id""")),

    // ---- p54: embedding-space decontamination — per-corpus-row verdict
    // against a held-out eval set (vec_id < 20), the semantic sibling of
    // p23's shingle decontamination. Clones of the first 5 eval vectors
    // are planted into the corpus (ids +200000, both engines identically)
    // so the filter provably catches leakage at sim 1.0; organic near-dups
    // >= 0.8 count too. n_hits is an exact integer (the flag arms off it);
    // max_sim is order-free-exact. ---------------------------------------
    QueryDef("p54_embed_decontaminate",
      (s, d) => {
        val e = T.embeddings(s, d)
        val test = e.filter(col("vec_id") < 20).select("vec_id", "embedding")
        val clones = e.filter(col("vec_id") < 5)
          .select((col("vec_id") + 200000L).as("vec_id"), col("embedding"))
        val corpus = e.filter(col("vec_id") >= 20)
          .select("vec_id", "embedding").unionAll(clones)
        Similarity.embeddingDecontaminate(corpus, "vec_id", test, "vec_id",
          "embedding", minSim = 0.8).orderBy("vec_id")
      },
      Some(s"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        test AS (SELECT vec_id AS t_id, v AS tv, ${normSql("v")} AS tnrm
          FROM e WHERE vec_id < 20),
        corpus AS (SELECT vec_id, v FROM e WHERE vec_id >= 20
                   UNION ALL
                   SELECT vec_id + 200000 AS vec_id, v FROM e WHERE vec_id < 5),
        c AS (SELECT vec_id, v, ${normSql("v")} AS nrm FROM corpus),
        sims AS (SELECT c.vec_id,
            CASE WHEN c.nrm > 0 AND test.tnrm > 0
              THEN ${dotSql("c.v", "test.tv")} / (c.nrm * test.tnrm)
              ELSE 0.0 END AS sim
          FROM c CROSS JOIN test)
        SELECT vec_id,
          CAST(SUM(CASE WHEN sim >= 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
          MAX(sim) AS max_sim,
          CAST(SUM(CASE WHEN sim >= 0.8 THEN 1 ELSE 0 END) AS BIGINT) > 0
            AS contaminated
        FROM sims GROUP BY vec_id ORDER BY vec_id""")),

    // ---- p56: hybrid retrieval — reciprocal-rank fusion (Cormack et al.
    // SIGIR'09) of the BM25 lexical top-50 (p52's scorer) and the dense
    // cosine top-50 for query vector 0 (p07's retriever), doc_id==vec_id
    // row pairing. Rank-only fusion needs no score calibration; integer
    // 1e6 div (60+rank) contributions keep the fused sum exact. ----------
    QueryDef("p56_hybrid_rrf",
      (s, d) => {
        val lex = Retrieval.rankBounded(
            TextOps.bm25TopDocs(T.documents(s, d), "doc_id", "text",
              Seq("dup", "vector", "customer", "batch"), k = 50),
            "doc_id", col("score_sum").desc)
          .select(col("doc_id"), col("rk"))
        val e = T.embeddings(s, d)
        val dense = Similarity.knnBruteForce(e, "vec_id",
            e.filter(col("vec_id") === 0), "vec_id", "embedding", k = 50)
          .select(col("id").as("doc_id"), col("rnk").cast("long").as("rk"))
        Retrieval.rrfFuse(Seq(lex, dense), "doc_id", "rk", k0 = 60, topK = 20)
      },
      Some(s"""
        WITH t AS (SELECT doc_id, $ToksSql AS tk FROM documents),
        docs AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS dl FROM t),
        nn AS (SELECT COUNT(*) AS n_corpus, CAST(SUM(dl) AS BIGINT) AS dl_tot
          FROM docs),
        hits AS (SELECT doc_id, dl, unnest(tk) AS token FROM docs),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf, MAX(dl) AS dl FROM hits
          WHERE token IN ('dup', 'vector', 'customer', 'batch')
          GROUP BY 1, 2),
        dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        s1 AS (SELECT tf.doc_id, tf.tf, tf.dl, dfreq.df, nn.n_corpus,
            CAST(nn.dl_tot AS DOUBLE) / CAST(nn.n_corpus AS DOUBLE) AS avgdl
          FROM tf JOIN dfreq USING (token) CROSS JOIN nn),
        s2 AS (SELECT doc_id,
            1.0 + (CAST(n_corpus AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
              / (CAST(df AS DOUBLE) + 0.5) AS idf,
            (CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE)
              + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))) AS tfw
          FROM s1),
        s3 AS (SELECT doc_id,
            CAST(floor(idf * tfw * 1000000.0) AS BIGINT) AS w FROM s2),
        agg AS (SELECT doc_id, CAST(SUM(w) AS BIGINT) AS score_sum
          FROM s3 GROUP BY 1),
        lex AS (SELECT doc_id, CAST(ROW_NUMBER() OVER
            (ORDER BY score_sum DESC, doc_id) AS BIGINT) AS rk
          FROM agg QUALIFY rk <= 50),
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        nv AS (SELECT vec_id, v, ${normSql("v")} AS nrm FROM e),
        dsims AS (SELECT c.vec_id AS doc_id,
            ${dotSql("c.v", "q.v")} / (c.nrm * q.nrm) AS sim
          FROM nv c, nv q WHERE q.vec_id = 0),
        dense AS (SELECT doc_id, CAST(ROW_NUMBER() OVER
            (ORDER BY sim DESC, doc_id) AS BIGINT) AS rk
          FROM dsims QUALIFY rk <= 50),
        u AS (SELECT doc_id, 1000000 // (60 + rk) AS contrib FROM lex
              UNION ALL
              SELECT doc_id, 1000000 // (60 + rk) AS contrib FROM dense),
        f AS (SELECT doc_id, COUNT(*) AS n_lists,
            CAST(SUM(contrib) AS BIGINT) AS rrf_sum FROM u GROUP BY 1)
        SELECT doc_id, n_lists, rrf_sum,
          CAST(rrf_sum AS DOUBLE) / 1000000.0 AS rrf
        FROM f ORDER BY rrf_sum DESC, doc_id LIMIT 20""")),

    // ---- p69: hard-negative mining — for each query vector, the top-k
    // most-similar vectors with a DIFFERENT label (the contrastive-training
    // negatives a dense-retriever recipe mines). Same broadcast-query +
    // rank-window shape as p07; the label-mismatch filter runs before
    // the dot product, map-side. --------------------------------------------
    QueryDef("p69_hard_negatives",
      (s, d) => {
        val e = T.embeddings(s, d)
        Similarity.hardNegatives(e, "vec_id", e.filter(col("vec_id") < 5),
          "vec_id", "embedding", "label", k = 10)
          .withColumnRenamed("id", "vec_id")
          .orderBy("q_id", "rnk")
      },
      Some(s"""
        WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
        n AS (SELECT vec_id, label, v, ${normSql("v")} AS nrm FROM e),
        sims AS (SELECT q.vec_id AS q_id, q.label AS q_label,
            c.vec_id AS vec_id, c.label AS label,
            ${dotSql("c.v", "q.v")} / (c.nrm * q.nrm) AS sim
          FROM n c, n q WHERE q.vec_id < 5 AND c.label <> q.label)
        SELECT q_id, q_label, vec_id, label, sim, rnk FROM (
          SELECT q_id, q_label, vec_id, label, sim,
            CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC,
              vec_id) AS INTEGER) AS rnk
          FROM sims)
        WHERE rnk <= 10 ORDER BY q_id, rnk"""))
  )
}
