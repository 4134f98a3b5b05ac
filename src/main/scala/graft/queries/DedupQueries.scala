package graft.queries

import graft.{QueryDef, Tables => T}
import graft.operators._
import org.apache.spark.sql.functions._
import QuerySql._

/** Deduplication-family gate queries: exact groups, n-gram Jaccard pairs
  * (plain + skew-capped), MinHash-LSH pairs + connected-component clusters,
  * SimHash banding, embedding-cosine LSH pairs, benchmark decontamination. */
object DedupQueries {

  val all: Seq[QueryDef] = Seq(

    // ---- p29: corpus-level paragraph dedup (C4/Falcon tier). The synthetic
    // corpus is single-line, so the query builds 2-paragraph docs by pairing
    // each doc's text with its successor's (both engines identically): every
    // text then occurs in two docs, and the operator must keep exactly the
    // first occurrence and rebuild the rest. Oracle = window rn=1 over
    // (para -> doc, pos). -------------------------------------------------
    QueryDef("p29_dedup_paragraphs",
      (s, d) => {
        val docs = T.documents(s, d).select("doc_id", "text")
        val nxt = docs.select((col("doc_id") - 1).as("doc_id"),
          col("text").as("text_b"))
        val d2 = docs.join(nxt, Seq("doc_id"), "left")
          .select(col("doc_id"),
            concat_ws("\n", col("text"), col("text_b")).as("text"))
        Dedup.dedupParagraphs(d2, "doc_id", "text").orderBy("doc_id")
      },
      Some("""
        WITH d2 AS (SELECT a.doc_id,
            concat_ws(chr(10), a.text, b.text) AS text
          FROM documents a LEFT JOIN documents b ON b.doc_id = a.doc_id + 1),
        sp AS (SELECT doc_id, string_split(text, chr(10)) AS paras FROM d2),
        posts AS (SELECT doc_id,
            unnest(list_transform(range(0, len(paras)),
              i -> {'pos': i, 'para': paras[i+1]}), recursive := true)
          FROM sp),
        kept AS (SELECT doc_id, pos, para FROM (
            SELECT doc_id, pos, para,
              ROW_NUMBER() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
            FROM posts) WHERE rn = 1),
        rebuilt AS (SELECT doc_id,
            string_agg(para, chr(10) ORDER BY pos) AS text_kept,
            COUNT(*) AS n_kept
          FROM kept GROUP BY doc_id)
        SELECT d2.doc_id,
          COALESCE(r.text_kept, '') AS text_kept,
          COALESCE(r.n_kept, 0) AS n_kept
        FROM d2 LEFT JOIN rebuilt r ON d2.doc_id = r.doc_id
        ORDER BY d2.doc_id""")),


    // ---- p01: exact dedup groups by content fingerprint --------------------
    QueryDef("p01_dedup_exact",
      (s, d) => Dedup.exactGroups(T.documents(s, d), "doc_id", "text")
        .orderBy("fp"),
      Some("""
        SELECT md5(text) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        FROM documents GROUP BY 1 ORDER BY fp""")),

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

    // ---- p32: MinHash-LSH pairs WITH the bucket skew cap engaged — the
    // guard that bounds candidate blowup at 100 TB (a 1M-doc boilerplate
    // cluster sharing a band bucket is 10^12 pairs on one reducer; capped
    // buckets drop whole, deterministically). Oracle mirrors the cap:
    // bucket sizes computed on the SAME band rows, buckets > 3 removed
    // before the candidate join. --------------------------------------
    QueryDef("p32_minhash_capped",
      (s, d) => Dedup.minhashLshPairs(T.documents(s, d), "doc_id", "text",
        n = 3, minJaccard = 0.2, maxBucket = Some(3L)).orderBy("id_a", "id_b"),
      Some(s"""
        WITH t AS (SELECT doc_id, $ToksSql AS tk FROM documents),
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
        bsz AS (SELECT band, bh, COUNT(*) AS bn FROM bands GROUP BY 1, 2),
        capped AS (SELECT b.doc_id, b.band, b.bh
          FROM bands b JOIN bsz USING (band, bh) WHERE bn <= 3),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM capped a JOIN capped b
            ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
        verified AS (SELECT id_a, id_b,
            CAST(len(list_intersect(sa.shs, sb.shs)) AS BIGINT) AS inter,
            CAST(len(sa.shs) AS BIGINT) + CAST(len(sb.shs) AS BIGINT)
              - CAST(len(list_intersect(sa.shs, sb.shs)) AS BIGINT) AS uni
          FROM cand
          JOIN sets sa ON id_a = sa.doc_id
          JOIN sets sb ON id_b = sb.doc_id)
        SELECT id_a, id_b, inter, uni, jaccard FROM (
          SELECT id_a, id_b, inter, uni, inter / uni AS jaccard FROM verified)
        WHERE jaccard >= 0.2 ORDER BY id_a, id_b""")),

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
        sym AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM pairs
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

    // ---- p74: SimHash pairs WITH the chunk-bucket skew cap engaged — the
    // r9 sf10 probe measured p06's task skew growing 6→60 on a hot 16-bit
    // chunk bucket (near-constant signature regions collide at scale); the
    // cap drops oversized buckets whole, deterministically, exactly like
    // p32's MinHash analogue. Oracle mirrors the cap: bucket sizes on the
    // SAME chunk rows, buckets > 8 removed before the candidate join. ----
    QueryDef("p74_simhash_capped",
      (s, d) => Dedup.simhashPairs(T.documents(s, d), "doc_id", "text",
        maxHamming = 3, maxBucket = Some(8L)).orderBy("id_a", "id_b"),
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
        csz AS (SELECT c, cv, COUNT(*) AS bn FROM chunks GROUP BY 1, 2),
        capped AS (SELECT ch.doc_id, ch.sig, ch.c, ch.cv
          FROM chunks ch JOIN csz USING (c, cv) WHERE bn <= 8),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
          FROM capped a JOIN capped b
            ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id)
        SELECT id_a, id_b, hamming FROM cand
        WHERE hamming <= 3 ORDER BY id_a, id_b""")),

    // ---- p77: hub-degree-GUARDED dedup clusters — the skew cap for the
    // clustering family (r9 verdict item 3: the sf10 probe measured p24's
    // giant-component straggler skew growing 8→35 with no oracle-gated
    // mitigation). Nodes whose distinct-neighbor degree exceeds 8 leave the
    // edge set wholesale and survive as singletons; near-dup families are
    // quasi-cliques, so the degree cap is in effect a family-size cap. The
    // p06 simhash graph is the edge set (dense: hub structure to bite on —
    // 130 of ~430 incident nodes exceed the cap at sf0.01). Oracle: the p06
    // pair CTEs + the same degree filter + recursive min-reachability. ----
    QueryDef("p77_clusters_guarded",
      (s, d) => {
        val docs = T.documents(s, d)
        val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
        Components.dedupClustersGuarded(docs, "doc_id", pairs,
          maxDegree = 8L).orderBy("doc_id")
      },
      Some(s"""
        WITH RECURSIVE t AS (SELECT doc_id, list_distinct($ToksSql) AS tks FROM documents),
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
        cand AS MATERIALIZED (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
          FROM chunks a JOIN chunks b
            ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id),
        e AS MATERIALIZED (SELECT id_a AS lo, id_b AS hi FROM cand WHERE hamming <= 3),
        deg AS (SELECT v, COUNT(*) AS n FROM
          (SELECT lo AS v FROM e UNION ALL SELECT hi AS v FROM e) GROUP BY 1),
        hubs AS MATERIALIZED (SELECT v FROM deg WHERE n > 8),
        kept AS MATERIALIZED (SELECT lo, hi FROM e
          WHERE lo NOT IN (SELECT v FROM hubs)
            AND hi NOT IN (SELECT v FROM hubs)),
        -- MATERIALIZED up the chain: the recursive reach below references
        -- sym once per iteration, and DuckDB re-evaluates plain CTEs on
        -- every reference — without these the simhash self-join re-runs
        -- per recursion round (measured: 100+ CPU-minutes at sf1)
        sym AS MATERIALIZED (SELECT lo AS u, hi AS v FROM kept
                UNION ALL SELECT hi, lo FROM kept),
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

    // ---- p78: the PRODUCTION clustering config — BOTH skew caps composed:
    // the p74 chunk-bucket cap on the simhash pair feed (the r10 sf100
    // probe measured p77's one straggler, a 107 s max task, in the
    // UNCAPPED pair generation) AND the p77 hub-degree guard on the
    // cluster graph. Oracle: p74's capped CTEs + p77's guard + reach. ----
    QueryDef("p78_clusters_capped",
      (s, d) => {
        val docs = T.documents(s, d)
        val pairs = Dedup.simhashPairs(docs, "doc_id", "text",
          maxHamming = 3, maxBucket = Some(8L))
        Components.dedupClustersGuarded(docs, "doc_id", pairs,
          maxDegree = 8L).orderBy("doc_id")
      },
      Some(s"""
        WITH RECURSIVE t AS (SELECT doc_id, list_distinct($ToksSql) AS tks FROM documents),
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
        csz AS (SELECT c, cv, COUNT(*) AS bn FROM chunks GROUP BY 1, 2),
        capped AS (SELECT ch.doc_id, ch.sig, ch.c, ch.cv
          FROM chunks ch JOIN csz USING (c, cv) WHERE bn <= 8),
        cand AS MATERIALIZED (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
          FROM capped a JOIN capped b
            ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id),
        e AS MATERIALIZED (SELECT id_a AS lo, id_b AS hi FROM cand WHERE hamming <= 3),
        deg AS (SELECT v, COUNT(*) AS n FROM
          (SELECT lo AS v FROM e UNION ALL SELECT hi AS v FROM e) GROUP BY 1),
        hubs AS MATERIALIZED (SELECT v FROM deg WHERE n > 8),
        kept AS MATERIALIZED (SELECT lo, hi FROM e
          WHERE lo NOT IN (SELECT v FROM hubs)
            AND hi NOT IN (SELECT v FROM hubs)),
        sym AS MATERIALIZED (SELECT lo AS u, hi AS v FROM kept
                UNION ALL SELECT hi, lo FROM kept),
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

    // ---- p36: embedding-cosine LSH pairs WITH the bucket skew cap — the
    // vector-side twin of p32's guard (an identical-embedding cluster
    // collides in EVERY table: m²/2 candidates per table on one reducer at
    // 100 TB). The query plants 8 clones of each of the first 3 vectors
    // (both engines identically): their 9-member buckets exceed cap=8 and
    // drop WHOLE, so no clone pair survives. The synthetic embeddings also
    // cluster by label, so some ORGANICALLY hot buckets get capped too
    // (52 of p19's 208 pairs remain) — exactly the documented cap
    // semantics, mirrored by the oracle = p19's CTE chain + the
    // bucket-size filter. -------------------------------------------------
    QueryDef("p36_cosine_lsh_capped",
      (s, d) => {
        val e = T.embeddings(s, d)
        val clones = e.filter(col("vec_id") < 3)
          .select(col("vec_id"), col("embedding"),
            explode(sequence(lit(1), lit(8))).as("r"))
          .select((col("vec_id") + col("r") * 100000L).as("vec_id"), col("embedding"))
        Similarity.cosineNearDupLsh(
          e.select("vec_id", "embedding").unionAll(clones),
          "vec_id", "embedding", minSim = 0.3, maxBucket = Some(8L))
          .orderBy("id_a", "id_b")
      },
      Some(s"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
                   UNION ALL
                   SELECT vec_id + 100000*r AS vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings CROSS JOIN range(1, 9) rr(r) WHERE vec_id < 3),
        n AS (SELECT vec_id, v, ${normSql("v")} AS nrm FROM e),
        proj AS (SELECT vec_id, t, j,
            list_reduce(list_transform(range(0, len(v)), d ->
              v[d+1] * (((1103515245 * (t*8191 + j*131 + d) + 12345) % 2147483648)
                        / 2147483648.0 - 0.5)),
              (x, y) -> x + y) AS s
          FROM n CROSS JOIN range(8) rt(t) CROSS JOIN range(8) rj(j)),
        keys0 AS (SELECT vec_id, t,
            SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS bk
          FROM proj GROUP BY vec_id, t),
        sizes AS (SELECT t, bk, COUNT(*) AS bn FROM keys0 GROUP BY t, bk),
        keys AS (SELECT k.vec_id, k.t, k.bk FROM keys0 k
                 JOIN sizes s ON k.t = s.t AND k.bk = s.bk WHERE s.bn <= 8),
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

    // ---- p35: URL canonicalization + URL-keyed dedup groups (the C4
    // recipe's first dedup tier). The corpus has no URL column, so the
    // query plants deterministically messy ones (both engines identically):
    // mixed-case scheme/host, userinfo, default vs explicit ports, tracking
    // params in three arrangements, fragments, trailing slashes. Docs
    // sharing (parity, doc_id%13 host, doc_id%7 path) must collapse to ONE
    // canonical URL whatever surface form they carried — 2x13x7 = 182
    // groups from 500 docs at sf0.01. Oracle = the identical regex chain
    // in DuckDB (shared RE2∩Java subset, no lookarounds). ------------------
    QueryDef("p35_url_dedup",
      (s, d) => {
        val planted = T.documents(s, d).select(col("doc_id"),
          concat(
            when(pmod(col("doc_id"), lit(2)) === 0, lit("HTTPS://"))
              .otherwise(lit("http://User:Pass@")),
            lit("WWW.Site"), pmod(col("doc_id"), lit(13)), lit(".Example.COM"),
            when(pmod(col("doc_id"), lit(2)) === 0, lit(":443")).otherwise(lit(":8080")),
            lit("/Articles/item"), pmod(col("doc_id"), lit(7)),
            when(pmod(col("doc_id"), lit(3)) === 0,
                lit("/?utm_source=feed&utm_campaign=Spring&id=7"))
              .when(pmod(col("doc_id"), lit(3)) === 1, lit("?id=7&fbclid=abc123"))
              .otherwise(lit("/?id=7")),
            when(pmod(col("doc_id"), lit(5)) === 0, lit("#section-2")).otherwise(lit("")))
            .as("url"))
        Urls.urlGroups(planted, "doc_id", "url")
          .orderBy("url_norm")
      },
      Some("""
        WITH u AS (SELECT doc_id,
            (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'http://User:Pass@' END) ||
            'WWW.Site' || (doc_id % 13) || '.Example.COM' ||
            (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':8080' END) ||
            '/Articles/item' || (doc_id % 7) ||
            (CASE WHEN doc_id % 3 = 0 THEN '/?utm_source=feed&utm_campaign=Spring&id=7'
                  WHEN doc_id % 3 = 1 THEN '?id=7&fbclid=abc123'
                  ELSE '/?id=7' END) ||
            (CASE WHEN doc_id % 5 = 0 THEN '#section-2' ELSE '' END) AS url
          FROM documents),
        parts AS (SELECT doc_id,
            lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
            lower(regexp_extract(url,
              '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?([^/?#]*)', 1)) AS hp,
            regexp_extract(url,
              '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1) AS rest
          FROM u),
        healed AS (SELECT doc_id, sch, hp,
            regexp_replace(regexp_extract(rest, '^([^?]*)', 1), '/+$', '') AS path,
            regexp_replace(regexp_replace(regexp_replace(
              regexp_extract(rest, '^[^?]*\?(.*)$', 1),
              '(^|&)(?:utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|igshid|mc_cid|mc_eid)=[^&]*',
              '\1', 'g'),
              '&&+', '&', 'g'),
              '^&+|&+$', '', 'g') AS q
          FROM parts),
        norm AS (SELECT doc_id, sch || '://' ||
            (CASE WHEN sch = 'http' THEN regexp_replace(hp, ':80$', '')
                  WHEN sch = 'https' THEN regexp_replace(hp, ':443$', '')
                  ELSE hp END) ||
            path || (CASE WHEN q = '' THEN '' ELSE '?' || q END) AS url_norm
          FROM healed),
        g AS (SELECT url_norm, min(doc_id) AS keep_id, count(*) AS n_copies
              FROM norm GROUP BY 1)
        SELECT url_norm,
          regexp_replace(regexp_extract(url_norm,
            '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?([^/?#]*)', 1),
            ':[0-9]+$', '') AS host,
          keep_id, n_copies
        FROM g ORDER BY url_norm""")),

    // ---- p37: exact substring dedup (Lee et al. suffix-array tier as
    // positional k-gram cut spans). Like p29, the corpus is single-text, so
    // the query pairs each doc with its successor's text (both engines
    // identically): every text's token run then occurs in TWO docs — as a
    // suffix of doc i-1 and a prefix of doc i — so the operator must cut
    // the non-first run while the junction grams stay unique, exercising
    // partial spans + the gaps-and-islands merge. Oracle = the identical
    // chain in DuckDB: ROW_NUMBER first-occurrence (≡ min(struct)),
    // windowed interval merge, NOT-EXISTS rebuild. --------------------------
    QueryDef("p37_dedup_substrings",
      (s, d) => {
        val docs = T.documents(s, d).select("doc_id", "text")
        val nxt = docs.select((col("doc_id") - 1).as("doc_id"),
          col("text").as("text_b"))
        val d2 = docs.join(nxt, Seq("doc_id"), "left")
          .select(col("doc_id"),
            concat_ws(" ", col("text"), col("text_b")).as("text"))
        Dedup.dedupSubstrings(d2, "doc_id", "text", k = 8).orderBy("doc_id")
      },
      Some("""
        WITH d2 AS (SELECT a.doc_id, concat_ws(' ', a.text, b.text) AS text
          FROM documents a LEFT JOIN documents b ON b.doc_id = a.doc_id + 1),
        toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
          FROM d2),
        grams AS (SELECT doc_id,
            unnest(list_transform(range(0, greatest(len(t) - 7, 0)),
              i -> {'pos': i, 'g': ('0x' || substring(
                md5(array_to_string(t[i+1:i+8], ' ')), 1, 15))::BIGINT}),
              recursive := true)
          FROM toks),
        ranked AS (SELECT doc_id, pos,
            ROW_NUMBER() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn,
            COUNT(*) OVER (PARTITION BY g) AS cnt
          FROM grams),
        cuts AS (SELECT doc_id, pos AS s, pos + 8 AS e FROM ranked
          WHERE cnt > 1 AND rn > 1),
        pe AS (SELECT doc_id, s, e,
            MAX(e) OVER (PARTITION BY doc_id ORDER BY s
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e
          FROM cuts),
        isl AS (SELECT doc_id, s, e,
            SUM(CASE WHEN prev_e IS NULL OR s > prev_e THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY s) AS island
          FROM pe),
        merged AS (SELECT doc_id, MIN(s) AS s, MAX(e) AS e FROM isl
          GROUP BY doc_id, island),
        tokpos AS (SELECT doc_id,
            unnest(list_transform(range(0, len(t)),
              i -> {'pos': i, 'tok': t[i+1]}), recursive := true)
          FROM toks),
        kept AS (SELECT tp.doc_id, tp.pos, tp.tok FROM tokpos tp
          WHERE NOT EXISTS (SELECT 1 FROM merged m
            WHERE m.doc_id = tp.doc_id AND tp.pos >= m.s AND tp.pos < m.e)),
        rebuilt AS (SELECT doc_id,
            string_agg(tok, ' ' ORDER BY pos) AS text_kept,
            COUNT(*) AS n_kept
          FROM kept GROUP BY doc_id)
        SELECT d.doc_id, COALESCE(r.text_kept, '') AS text_kept,
          COALESCE(r.n_kept, 0) AS n_kept,
          len(string_split_regex(trim(d.text), '\s+'))
            - COALESCE(r.n_kept, 0) AS n_cut
        FROM d2 d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
        ORDER BY d.doc_id""")),

    // ---- p38: SemDeDup (Abbas et al. 2023) — semantic dedup survivors,
    // WITH the maxCell skew guard engaged (every pair-generator cap is
    // both oracle-gated and soak-measured). Hash-seeded k-means cells
    // block the corpus (p15's portable centroid derivation), all-pairs
    // cosine runs only WITHIN a cell of size <= 40 (bigger cells drop
    // whole before the self-join — their members survive undeduped, the
    // documented cap semantics), and every higher id of a >= minSim pair
    // drops (keep-lowest). Clones of the first 3 vectors are planted
    // (both engines identically, p36's pattern): identical vectors always
    // co-cell, so their clones lose to the originals at sim 1.0 whenever
    // their cell is under the cap (3 of 16 cells exceed 40 at sf0.01
    // and drop whole). Output = surviving vec_ids. ------------
    QueryDef("p38_semdedup",
      (s, d) => {
        val e = T.embeddings(s, d)
        val clones = e.filter(col("vec_id") < 3)
          .select(col("vec_id"), col("embedding"),
            explode(sequence(lit(1), lit(8))).as("r"))
          .select((col("vec_id") + col("r") * 100000L).as("vec_id"), col("embedding"))
        Similarity.semDedup(
          e.select("vec_id", "embedding").unionAll(clones),
          "vec_id", "embedding", minSim = 0.3, nCentroids = 16,
          maxCell = Some(40L))
          .select("vec_id").orderBy("vec_id")
      },
      Some(s"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
                   UNION ALL
                   SELECT vec_id + 100000*r AS vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings CROSS JOIN range(1, 9) rr(r) WHERE vec_id < 3),
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
        sizes AS (SELECT cell, COUNT(*) AS cn FROM assign GROUP BY cell),
        m AS (SELECT n.vec_id, n.v, n.nrm, a.cell FROM n
          JOIN assign a ON n.vec_id = a.vec_id
          JOIN sizes s ON a.cell = s.cell
          WHERE s.cn <= 40),
        losers AS (SELECT DISTINCT b.vec_id AS id_b
          FROM m a JOIN m b ON a.cell = b.cell AND a.vec_id < b.vec_id
          WHERE ${dotSql("a.v", "b.v")} / (a.nrm * b.nrm) >= 0.3)
        SELECT vec_id FROM e
        WHERE vec_id NOT IN (SELECT id_b FROM losers)
        ORDER BY vec_id""")),

    // ---- p55: quality-ranked canonical selection over near-dup clusters —
    // the FineWeb/RefinedWeb survivor rule on top of p24's components: the
    // BEST copy of each duplicated page survives (quality DESC, id ASC
    // tie-break), not the arbitrary min-id one. Quality doubles are the
    // p02-proven engine-exact expression (shared fragment), so the rank
    // order is oracle-comparable. ----------------------------------------
    QueryDef("p55_keep_best",
      (s, d) => {
        val docs = T.documents(s, d)
        val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
          n = 3, minJaccard = 0.5)
        Dedup.keepBestQuality(docs, "doc_id", "text", pairs).orderBy("doc_id")
      },
      Some(s"""
        WITH RECURSIVE $MinhashPairsCte,
        sym AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs),
        reach(v, x) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM sym) n
          UNION
          SELECT r.v, s.v FROM reach r JOIN sym s ON r.x = s.u),
        cc AS (SELECT v AS doc_id, MIN(x) AS cluster_id FROM reach GROUP BY v),
        assigned AS (SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
          FROM documents d LEFT JOIN cc c USING (doc_id)),
        csizes AS (SELECT cluster_id, COUNT(*) AS cluster_size
          FROM assigned GROUP BY 1),
        q AS (SELECT doc_id, ${qualitySql("toks", "text")} AS quality
          FROM (SELECT doc_id, text, $ToksSql AS toks FROM documents)),
        j AS (SELECT a.doc_id, a.cluster_id, cs.cluster_size, q.quality
          FROM assigned a JOIN csizes cs USING (cluster_id)
          JOIN q USING (doc_id)),
        r AS (SELECT *, CAST(ROW_NUMBER() OVER
            (PARTITION BY cluster_id ORDER BY quality DESC, doc_id)
            AS BIGINT) AS rk FROM j)
        SELECT doc_id, cluster_id, cluster_size, quality, rk, rk = 1 AS keep
        FROM r ORDER BY doc_id""")),

    // ---- p59: containment (overlap-coefficient) pairs — subset
    // duplication Jaccard misses (Broder'97's containment vs resemblance):
    // a half-page excerpt has containment 1.0 but Jaccard ~0.5, under
    // every near-dup threshold. Excerpts are PLANTED (doc_id % 11: the
    // first half of the token stream under a fresh id, identically in
    // both engines); DF cap 8 engaged per the p18 skew contract. --------
    QueryDef("p59_containment_pairs",
      (s, d) => {
        val docs = T.documents(s, d)
        val halves = docs.filter(pmod(col("doc_id"), lit(11)) === 0)
          .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
          .select((col("doc_id") + 300000L).as("doc_id"),
            concat_ws(" ", slice(col("tk"), lit(1),
              (size(col("tk")) / 2).cast("int"))).as("text"))
        Dedup.containmentPairs(
          docs.select("doc_id", "text").unionAll(halves),
          "doc_id", "text", n = 3, minContainment = 0.9,
          maxDocFreq = Some(8L)).orderBy("id_a", "id_b")
      },
      Some(s"""
        WITH base AS (SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 300000 AS doc_id,
            array_to_string(tk2[1:len(tk2)//2], ' ') AS text
          FROM (SELECT doc_id, $ToksSql AS tk2 FROM documents)
          WHERE doc_id % 11 = 0),
        t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
          FROM base),
        sets AS (SELECT doc_id,
            list_distinct(list_transform(range(0, len(tk)-2),
              i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])) AS shs
          FROM t WHERE len(tk) >= 3),
        posts0 AS (SELECT doc_id, unnest(shs) AS sh FROM sets),
        hot AS (SELECT sh FROM posts0 GROUP BY sh HAVING COUNT(*) > 8),
        posts AS (SELECT * FROM posts0 WHERE sh NOT IN (SELECT sh FROM hot)),
        sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz
          FROM posts GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
          FROM posts a JOIN posts b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b, inter, sz_a, sz_b, containment, jaccard FROM (
          SELECT id_a, id_b, i AS inter, sa.sz AS sz_a, sb.sz AS sz_b,
                 i / least(sa.sz, sb.sz) AS containment,
                 i / (sa.sz + sb.sz - i) AS jaccard
          FROM inter
          JOIN sizes sa ON id_a = sa.doc_id
          JOIN sizes sb ON id_b = sb.doc_id)
        WHERE containment >= 0.9 ORDER BY id_a, id_b""")),

    // ---- p67: incremental snapshot dedup — "crawl N+1 vs the accumulated
    // corpus": src0 plays the new snapshot, every other source the existing
    // corpus (as its fingerprint table). Survivors are first-in-snapshot
    // AND unseen-in-corpus; one fp window + one anti-join, both hash-
    // partitioned on fp. ----------------------------------------------------
    QueryDef("p67_snapshot_dedup",
      (s, d) => {
        val docs = T.documents(s, d)
        val snap = docs.filter(col("source") === "src0")
          .select("doc_id", "text")
        val corpusFps = docs.filter(col("source") =!= "src0")
          .select(TextOps.fingerprint(col("text")).as("fp"))
        Dedup.snapshotDedup(snap, corpusFps, "doc_id", "text")
          .select("doc_id", "fp").orderBy("doc_id")
      },
      Some("""
        WITH snap AS (SELECT doc_id, md5(text) AS fp
          FROM documents WHERE source = 'src0'),
        corpus AS (SELECT DISTINCT md5(text) AS fp
          FROM documents WHERE source <> 'src0'),
        keep0 AS (SELECT doc_id, fp FROM (
            SELECT doc_id, fp,
              ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
            FROM snap) WHERE rn = 1)
        SELECT doc_id, fp FROM keep0
        WHERE NOT EXISTS (SELECT 1 FROM corpus WHERE corpus.fp = keep0.fp)
        ORDER BY doc_id""")),

    // ---- p72: incremental NEAR-dup snapshot dedup — p67's fuzzy twin:
    // src0 plays the new snapshot, the rest the accumulated corpus; a
    // snapshot doc is dropped when any corpus doc shares a MinHash band
    // bucket and exact-verifies Jaccard >= 0.5. The corpus side is too big
    // to broadcast (unlike p23's benchmark side), so the cross-match is
    // the banded-bucket equi-join shape. Oracle: p05's signature CTEs
    // re-derived per side + the anti join. ---------------------------------
    QueryDef("p72_snapshot_dedup_near",
      (s, d) => {
        val docs = T.documents(s, d)
        Dedup.snapshotDedupNear(
          docs.filter(col("source") === "src0").select("doc_id", "text"),
          docs.filter(col("source") =!= "src0").select("doc_id", "text"),
          "doc_id", "text", n = 3, minJaccard = 0.5)
          .select("doc_id").orderBy("doc_id")
      },
      Some(s"""
        WITH t AS (SELECT doc_id, source, $ToksSql AS tk FROM documents),
        sets AS (SELECT doc_id, source,
            list_distinct(list_transform(range(0, len(tk)-2),
              i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])) AS shs
          FROM t WHERE len(tk) >= 3),
        posts AS (SELECT doc_id, source, unnest(shs) AS sh FROM sets),
        fps AS (SELECT doc_id, source,
            ('0x' || substring(md5(sh), 1, 15))::BIGINT % 2147483648 AS f
          FROM posts),
        comp AS (SELECT doc_id, source, i,
            MIN((((2654435769 * (2*i + 1)) % 2147483645 + 1) * f
                 + ((3266489917 * (i + 1)) % 2147483647)) % 2147483647) AS h
          FROM fps CROSS JOIN range(64) r(i) GROUP BY doc_id, source, i),
        sigs AS (SELECT doc_id, source, list(h ORDER BY i) AS sig
          FROM comp GROUP BY doc_id, source),
        bands AS (SELECT doc_id, source, b AS band,
            array_to_string(sig[b*4 + 1 : b*4 + 4], ',') AS bh
          FROM sigs CROSS JOIN range(16) rb(b)),
        cand AS (SELECT DISTINCT s.doc_id AS id_s, c.doc_id AS id_c
          FROM bands s JOIN bands c
            ON s.band = c.band AND s.bh = c.bh
          WHERE s.source = 'src0' AND c.source <> 'src0'),
        hits AS (SELECT DISTINCT id_s FROM cand
          JOIN sets ss ON id_s = ss.doc_id
          JOIN sets sc ON id_c = sc.doc_id
          WHERE CAST(len(list_intersect(ss.shs, sc.shs)) AS BIGINT)
              / (CAST(len(ss.shs) AS BIGINT) + CAST(len(sc.shs) AS BIGINT)
                 - CAST(len(list_intersect(ss.shs, sc.shs)) AS BIGINT))
            >= 0.5)
        SELECT doc_id FROM documents
        WHERE source = 'src0'
          AND doc_id NOT IN (SELECT id_s FROM hits)
        ORDER BY doc_id"""))
  )
}
