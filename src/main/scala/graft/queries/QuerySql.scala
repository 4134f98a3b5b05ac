package graft.queries

import graft.operators.TextOps

/** DuckDB SQL fragments shared across the gate-query domains, kept in
  * lockstep with the Spark operators they mirror (TextOps tokenization /
  * stopwords, Similarity fold order, Dedup's MinHash-LSH pipeline). */
private[queries] object QuerySql {

  val ToksSql = "string_split_regex(trim(text), '\\s+')"
  val StopSql: String = TextOps.Stopwords.map(s => s"'$s'").mkString("(", ", ", ")")

  def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a)+1), i -> $a[i]*$b[i]), (x,y) -> x+y)"
  def normSql(v: String): String =
    s"sqrt(list_reduce(list_transform(range(1, len($v)+1), i -> $v[i]*$v[i]), (x,y) -> x+y))"

  /** MinHash-LSH near-dup pair generation (the p05 pipeline) as a reusable
    * CTE chain ending in `pairs(id_a, id_b, inter, uni, jaccard)` — kept in
    * lockstep with `Dedup.minhashLshPairs` (md5-derived fingerprints,
    * 64-hash universal family, 16 bands x 4 rows, exact-jaccard verify). */
  val MinhashPairsCte: String = s"""t AS (SELECT doc_id, $ToksSql AS tk FROM documents),
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
}
