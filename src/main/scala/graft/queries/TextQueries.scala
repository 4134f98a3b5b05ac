package graft.queries

import graft.{QueryDef, Tables => T}
import graft.operators._
import org.apache.spark.sql.functions._
import QuerySql._

/** Text-analysis gate queries: quality stats, language-ID, winnowing
  * fingerprints, Gopher-style repetition filters, PII redaction. */
object TextQueries {

  val all: Seq[QueryDef] = Seq(

    // ---- p02: per-document text statistics & quality score -----------------
    QueryDef("p02_doc_quality",
      // ONE token_stats kernel call feeds all six signals (tokenizing per
      // signal was the p02 hot path); values identical to the staged forms
      // (same double compositions, parity-fuzzed in TokenStatsKernelSpec)
      (s, d) => T.documents(s, d)
        .select(col("doc_id"), TextOps.tokenStats(col("text")).as("ts"))
        .select(
          col("doc_id"),
          col("ts.n_tokens").as("n_tokens"),
          col("ts.n_units").as("n_units"),
          (col("ts.n_punct").cast("double") /
            greatest(col("ts.n_chars"), lit(1L)).cast("double")).as("punct_ratio"),
          (col("ts.n_stopwords").cast("double") /
            greatest(col("ts.n_tokens"), lit(1L)).cast("double")).as("stopword_ratio"),
          (col("ts.sum_token_len").cast("double") /
            greatest(col("ts.n_tokens"), lit(1L)).cast("double")).as("mean_token_len"),
          (least(col("ts.n_tokens").cast("double") / lit(100.0), lit(1.0)) * lit(0.4)
            + least(col("ts.n_stopwords").cast("double") /
                greatest(col("ts.n_tokens"), lit(1L)).cast("double") * lit(10.0),
              lit(1.0)) * lit(0.4)
            + (lit(1.0) - least(col("ts.n_punct").cast("double") /
                greatest(col("ts.n_chars"), lit(1L)).cast("double") * lit(5.0),
              lit(1.0))) * lit(0.2)).as("quality"))
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

    // ---- p42: n-gram-profile language ID (Cavnar-Trenkle style) — the real
    // detector (p03's stopword heuristic kept for contrast): per-language
    // trigram-hit scores + argmax, CJK short-circuit, all via replace-based
    // counting that is dialect-free in both engines. Accuracy on real
    // multilingual text is measured in LangIdNgramSpec; this gate pins the
    // scores AND the decision on every document. ---------------------------
    QueryDef("p42_langid_ngram",
      // spread: one cheap round-robin of the raw text (bench-SF parquet is
      // 1-2 splits) so the compiled gram_score scan uses every core; a no-op
      // at corpus scale where the scan already has enough splits
      (s, d) => graft.operators.spread(T.documents(s, d))
        .select(col("doc_id"), TextOps.langIdNgram(col("text")).as("lg"))
        .select(col("doc_id"), col("lg.s_en").as("s_en"), col("lg.s_de").as("s_de"),
          col("lg.s_fr").as("s_fr"), col("lg.s_es").as("s_es"),
          col("lg.pred_lang").as("pred_lang"))
        .orderBy("doc_id"),
      Some(LangIdNgramSql)),

    // ---- p10: winnowing fingerprints (rolling-hash mirror in DuckDB) -------
    QueryDef("p10_winnowing",
      (s, d) => graft.operators.spread(T.documents(s, d))
        .select(col("doc_id"), TextOps.winnowFingerprints(col("text")).as("fps"))
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

    // ---- p25: Gopher-style repetition filters. Spark side is MAP-ONLY
    // (top-multiplicity = longest equal run in the sorted gram array — an
    // O(n log n) per-row fold, no explode/groupBy); oracle computes the same
    // values the relational way (unnest + count + max). -------------------
    QueryDef("p25_repetition",
      // ONE token_stats pass (open-addressing count tables) instead of
      // three tokenizations + two sort-based multiplicity kernels
      (s, d) => T.documents(s, d)
        .select(col("doc_id"), TextOps.tokenStats(col("text")).as("ts"))
        .select(
          col("doc_id"),
          ((col("ts.n_tokens") - col("ts.n_distinct")).cast("double") /
            greatest(col("ts.n_tokens"), lit(1L)).cast("double")).as("dup_token_frac"),
          (col("ts.max_mult").cast("double") /
            greatest(col("ts.n_tokens"), lit(1L)).cast("double")).as("top_token_frac"),
          (col("ts.max_bigram_mult").cast("double") /
            greatest(col("ts.n_tokens") - lit(1L), lit(1L)).cast("double")).as("top_2gram_frac"))
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
              lpad(pmod(col("doc_id"), lit(100)).cast("string"), 4, "0")),
            concat(lit("cell 555-123-"),
              lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")),
            concat(lit("office (212) 555-"),
              lpad(pmod(col("doc_id"), lit(100)).cast("string"), 4, "0")),
            concat(lit("intl +1 (555) 123-"),
              lpad(pmod(col("doc_id"), lit(100)).cast("string"), 4, "0")),
            concat(lit("addr "), (pmod(col("doc_id"), lit(90)) + 10).cast("string"),
              lit(" Oak Street")))
            .as("text"))
        .select(col("doc_id"), Pii.scan(col("text")).as("s"))
        .select(col("doc_id"),
          col("s.n_emails").cast("long").as("n_emails"),
          col("s.n_ips").cast("long").as("n_ips"),
          col("s.n_phones").cast("long").as("n_phones"),
          col("s.n_addresses").cast("long").as("n_addresses"),
          col("s.redacted").as("redacted"))
        .orderBy("doc_id"),
      Some("""
        WITH w AS (SELECT doc_id,
            concat_ws(' ', text,
              'contact user' || doc_id || '@example.com',
              'host 10.1.' || (doc_id % 250) || '.7',
              'tel +49 555 ' || lpad(CAST(doc_id % 100 AS VARCHAR), 4, '0'),
              'cell 555-123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
              'office (212) 555-' || lpad(CAST(doc_id % 100 AS VARCHAR), 4, '0'),
              'intl +1 (555) 123-' || lpad(CAST(doc_id % 100 AS VARCHAR), 4, '0'),
              'addr ' || CAST(doc_id % 90 + 10 AS VARCHAR) || ' Oak Street') AS text
          FROM documents)
        SELECT doc_id,
          CAST(len(regexp_extract_all(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
          CAST(len(regexp_extract_all(text,
            '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
          CAST(len(regexp_extract_all(text,
            '\+\d{1,3}[ -]\(\d{3}\)[ -]?\d{3}-\d{4}|\+\d{1,3}[ -]\d{3}[ -]\d{3}[ -]\d{4}|\+\d{1,3}[ -]\d{3}[ -]\d{4}|\(\d{3}\)[ -]?\d{3}-\d{4}|\b\d{3}[ -]\d{3}[ -]\d{4}\b')) AS BIGINT) AS n_phones,
          CAST(len(regexp_extract_all(text,
            '\b\d{1,5} [A-Z][A-Za-z]+ (Street|Avenue|Boulevard|Road|Lane|Drive|St|Ave|Blvd|Rd|Ln|Dr)\b')) AS BIGINT) AS n_addresses,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
            '\+\d{1,3}[ -]\(\d{3}\)[ -]?\d{3}-\d{4}|\+\d{1,3}[ -]\d{3}[ -]\d{3}[ -]\d{4}|\+\d{1,3}[ -]\d{3}[ -]\d{4}|\(\d{3}\)[ -]?\d{3}-\d{4}|\b\d{3}[ -]\d{3}[ -]\d{4}\b', '<PHONE>', 'g'),
            '\b\d{1,5} [A-Z][A-Za-z]+ (Street|Avenue|Boulevard|Road|Lane|Drive|St|Ave|Blvd|Rd|Ln|Dr)\b', '<ADDRESS>', 'g') AS redacted
        FROM w ORDER BY doc_id""")),

    // ---- p33: corpus vocabulary — token total/document frequencies, the
    // counting pass BPE/WordPiece training and TF-IDF start from. Top-50 by
    // (n_total DESC, token): deterministic tie-break, hash-exact. ----------
    QueryDef("p33_vocabulary",
      (s, d) => TextOps.vocabulary(T.documents(s, d), "doc_id", "text")
        .orderBy(col("n_total").desc, col("token"))
        .limit(50),
      Some(s"""
        WITH toks AS (SELECT doc_id, unnest($ToksSql) AS token FROM documents)
        SELECT token, COUNT(*) AS n_total,
          COUNT(DISTINCT doc_id) AS n_docs
        FROM toks GROUP BY token
        ORDER BY n_total DESC, token LIMIT 50""")),

    // ---- p34: per-source corpus report — the dashboard a curation run
    // emits: doc/token volume, mean quality, repetitive-doc counts. The
    // float subtlety: a SUM of doubles across rows is order-dependent under
    // partial aggregation, so quality sums go through DECIMAL(18,12) (exact,
    // order-independent) and divide back to double — hash-stable. ----------
    QueryDef("p34_corpus_report",
      (s, d) => graft.operators.spread(T.documents(s, d))
        .select(col("doc_id"), col("source"),
          TextOps.qualityScore(col("text")).as("q"),
          TextOps.dupTokenFrac(TextOps.tokens(col("text"))).as("dupf"),
          TextOps.top2gramFrac(TextOps.tokens(col("text"))).as("topg"),
          TextOps.tokenCount(col("text")).cast("long").as("tk"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tk")).cast("long").as("total_tokens"),
          (sum(col("q").cast("decimal(18,12)")).cast("double") /
            count(lit(1))).as("mean_quality"),
          sum(when(col("dupf") > 0.3 || col("topg") > 0.18, 1L).otherwise(0L))
            .cast("long").as("n_repetitive"),
          min(col("doc_id")).as("first_doc"))
        .orderBy("source"),
      Some(s"""
        WITH t AS (SELECT doc_id, source, text, $ToksSql AS tk FROM documents),
        g AS (SELECT doc_id,
            list_transform(range(0, len(tk)-1), i -> tk[i+1] || ' ' || tk[i+2]) AS gs
          FROM t WHERE len(tk) >= 2),
        grams AS (SELECT doc_id, unnest(gs) AS gm FROM g),
        gcnt AS (SELECT doc_id, MAX(c) AS topgc FROM
          (SELECT doc_id, gm, COUNT(*) AS c FROM grams GROUP BY 1, 2) GROUP BY 1),
        scored AS (SELECT t.doc_id, t.source,
            CAST(len(tk) AS BIGINT) AS tkn,
            least(CAST(len(tk) AS DOUBLE) / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.4 AS DOUBLE)
             + least(CAST(len(list_filter(tk, x -> x IN $StopSql)) AS DOUBLE)
                       / CAST(greatest(len(tk), 1) AS DOUBLE) * CAST(10.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.4 AS DOUBLE)
             + (CAST(1.0 AS DOUBLE)
                - least(CAST(len(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                          / CAST(greatest(len(text), 1) AS DOUBLE) * CAST(5.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(0.2 AS DOUBLE)
              AS q,
            CAST(len(tk) - len(list_distinct(tk)) AS DOUBLE)
              / CAST(greatest(len(tk), 1) AS DOUBLE) AS dupf,
            CAST(COALESCE(topgc, 0) AS DOUBLE)
              / CAST(greatest(len(tk) - 1, 1) AS DOUBLE) AS topg
          FROM t LEFT JOIN gcnt ON t.doc_id = gcnt.doc_id)
        SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(tkn) AS BIGINT) AS total_tokens,
          CAST(SUM(CAST(q AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*) AS mean_quality,
          CAST(SUM(CASE WHEN dupf > 0.3 OR topg > 0.18 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_repetitive,
          MIN(doc_id) AS first_doc
        FROM scored GROUP BY source ORDER BY source""")),

    // ---- p39: RefinedWeb/Falcon line-wise corrections (Penedo et al. 2023
    // §3.1.3) — drop boilerplate LINES (nav links, "3 likes" counters,
    // all-caps headers), then the DOC if under half its characters survive.
    // The corpus is single-line, so junk lines are planted per doc_id mod
    // (both engines identically). Map-only; thresholds integer-armed
    // (10*upper > 6*letters, 2*kept >= total) so no float compare exists.
    QueryDef("p39_line_filter",
      (s, d) => {
        val planted = T.documents(s, d).select(col("doc_id"),
          concat(col("text"),
            when(pmod(col("doc_id"), lit(3)) === 0,
                lit("\nHOME\n3 likes"))
              .when(pmod(col("doc_id"), lit(3)) === 1,
                lit("\nTHIS IS AN ALL CAPS SHOUTY HEADER LINE ABOUT NOTHING AT ALL"))
              .otherwise(lit("\nshare")),
            when(pmod(col("doc_id"), lit(7)) === 0,
                concat(lit("\n"), repeat(lit("NAV MENU HOME LOGIN "), 12)))
              .otherwise(lit(""))).as("text"))
        TextOps.lineFilterRebuild(planted, "doc_id", "text")
          .orderBy("doc_id")
      },
      Some("""
        WITH d2 AS (SELECT doc_id, text ||
            (CASE WHEN doc_id % 3 = 0
                THEN chr(10) || 'HOME' || chr(10) || '3 likes'
              WHEN doc_id % 3 = 1
                THEN chr(10) || 'THIS IS AN ALL CAPS SHOUTY HEADER LINE ABOUT NOTHING AT ALL'
              ELSE chr(10) || 'share' END) ||
            (CASE WHEN doc_id % 7 = 0
                THEN chr(10) || repeat('NAV MENU HOME LOGIN ', 12)
              ELSE '' END) AS text
          FROM documents),
        f AS (SELECT doc_id, text,
            list_filter(string_split(text, chr(10)), l ->
              len(string_split_regex(trim(l), '\s+')) >= 3
              AND NOT (len(regexp_replace(l, '[^A-Za-z]', '', 'g')) > 0
                AND 10 * len(regexp_replace(l, '[^A-Z]', '', 'g'))
                  > 6 * len(regexp_replace(l, '[^A-Za-z]', '', 'g')))) AS kl
          FROM d2)
        SELECT doc_id, array_to_string(kl, chr(10)) AS text_kept,
          len(kl) AS n_kept_lines,
          2 * length(array_to_string(kl, chr(10))) >= length(text) AS kept
        FROM f ORDER BY doc_id""")),

    // ---- p40: C4 blocklist filter — word-exact (never substring: "class"
    // must not trip "ass"; \w+ runs, so punctuation-adjacent words still
    // match), case-insensitive engine-side on both sides. Map-only; the
    // blocklist is an expression literal. Output = flag per doc so the
    // hash covers both outcomes. ------------------------------------------
    QueryDef("p40_blocklist",
      (s, d) => T.documents(s, d).select(col("doc_id"),
          TextOps.hasBlockedToken(col("text"), Seq("slow", "Broken", "hash"))
            .as("blocked"))
        .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
          len(list_intersect(regexp_extract_all(lower(text), '\w+'),
            ['slow', 'broken', 'hash'])) > 0 AS blocked
        FROM documents ORDER BY doc_id""")),

    // ---- p43: Gopher document-level rules (Rae et al. 2021 §A1.1) — the
    // third canonical pretraining filter family (p39 = RefinedWeb lines,
    // p40 = C4 blocklist, p25 = Gopher repetition). The corpus is prose-only,
    // so rule-tripping junk (bullet walls, ellipsis teasers, symbol soup) is
    // planted per doc_id mod, identically in both engines. Map-only; every
    // output is BIGINT/BOOLEAN and every threshold integer-armed — the gate
    // hash carries no float anywhere. --------------------------------------
    QueryDef("p43_gopher_rules",
      (s, d) => {
        val planted = T.documents(s, d).select(col("doc_id"),
          concat(col("text"),
            when(pmod(col("doc_id"), lit(5)) === 0,
              concat(lit("\n"), repeat(lit("- bullet item\n"), 9),
                lit("- bullet item"))).otherwise(lit("")),
            when(pmod(col("doc_id"), lit(7)) === 1,
              lit("\nread more...\nclick here...\nsubscribe now..."))
              .otherwise(lit("")),
            when(pmod(col("doc_id"), lit(11)) === 3,
              concat(lit("\n"), repeat(lit("### "), 15))).otherwise(lit("")))
            .as("text"))
        TextOps.gopherRules(planted, "doc_id", "text").orderBy("doc_id")
      },
      Some("""
        WITH d2 AS (SELECT doc_id, text ||
            (CASE WHEN doc_id % 5 = 0
               THEN chr(10) || repeat('- bullet item' || chr(10), 9) || '- bullet item'
               ELSE '' END) ||
            (CASE WHEN doc_id % 7 = 1
               THEN chr(10) || 'read more...' || chr(10) || 'click here...'
                    || chr(10) || 'subscribe now...'
               ELSE '' END) ||
            (CASE WHEN doc_id % 11 = 3
               THEN chr(10) || repeat('### ', 15)
               ELSE '' END) AS text
          FROM documents),
        t AS (SELECT doc_id, text,
            string_split_regex(trim(text), '\s+') AS tk,
            list_transform(string_split(text, chr(10)), l -> trim(l)) AS ln
          FROM d2),
        c AS (SELECT doc_id,
            CAST(len(tk) AS BIGINT) AS n_words,
            CAST(list_reduce(list_transform(tk, x -> len(x)), (a,b) -> a+b) AS BIGINT) AS n_word_chars,
            CAST(len(ln) AS BIGINT) AS n_lines,
            CAST(len(list_filter(ln, l ->
              l LIKE '-%' OR l LIKE '*%' OR l LIKE '•%')) AS BIGINT) AS n_bullet,
            CAST(len(list_filter(ln, l ->
              l LIKE '%...' OR l LIKE '%…')) AS BIGINT) AS n_ellipsis_end,
            CAST((len(text) - len(replace(text, '#', '')))
              + ((len(text) - len(replace(text, '...', ''))) // 3) AS BIGINT) AS n_symbols,
            CAST(len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha_words,
            CAST(len(list_intersect(list_distinct(list_transform(tk, x -> lower(x))),
              ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS n_stopwords
          FROM t)
        SELECT doc_id, n_words, n_word_chars, n_lines, n_bullet,
          n_ellipsis_end, n_symbols, n_alpha_words, n_stopwords,
          (n_words >= 50 AND n_words <= 100000
           AND 3*n_words <= n_word_chars AND n_word_chars <= 10*n_words
           AND 10*n_symbols <= n_words
           AND 10*n_bullet <= 9*n_lines
           AND 10*n_ellipsis_end <= 3*n_lines
           AND 5*n_alpha_words >= 4*n_words
           AND n_stopwords >= 2) AS keep
        FROM c ORDER BY doc_id""")),

    // ---- p44: TF-IDF top-5 terms per document — keyword extraction over
    // the whole corpus. Score = tf*N/df (undamped inverse frequency): only
    // IEEE correctly-rounded ops (multiply, divide), so both engines produce
    // bit-identical doubles — a transcendental ln() could differ in the last
    // ulp between libms and break the hash gate. Ties fully ordered by
    // (score DESC, token ASC). ---------------------------------------------
    QueryDef("p44_tfidf_topk",
      (s, d) => TextOps.tfIdfTopTerms(T.documents(s, d), "doc_id", "text", k = 5)
        .orderBy("doc_id", "rk"),
      Some("""
        WITH toks AS (SELECT doc_id,
            unnest(string_split_regex(trim(text), '\s+')) AS token
          FROM documents),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT COUNT(*) AS n_corpus FROM documents),
        s AS (SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
            (CAST(tf.tf AS DOUBLE) * CAST(n.n_corpus AS DOUBLE))
              / CAST(dfreq.df AS DOUBLE) AS score
          FROM tf JOIN dfreq USING (token) CROSS JOIN n),
        r AS (SELECT *, ROW_NUMBER() OVER
            (PARTITION BY doc_id ORDER BY score DESC, token) AS rk
          FROM s)
        SELECT doc_id, token, tf, df, score, CAST(rk AS BIGINT) AS rk
        FROM r WHERE rk <= 5 ORDER BY doc_id, rk""")),

    // ---- p46: encoding-artifact / mojibake detection — the decode-went-
    // wrong filter every crawl pipeline runs (drop docs with U+FFFD,
    // control soup, or double-encoded UTF-8 tell-tales). Artifacts are
    // PLANTED per doc_id mod identically in both engines (the corpus text
    // itself is clean); counts are literal replace length-deltas plus one
    // ASCII-only C0 regex, keep flag integer-armed — hash-exact. ----------
    QueryDef("p46_encoding_artifacts",
      (s, d) => {
        val planted = T.documents(s, d).select(col("doc_id"),
          when(pmod(col("doc_id"), lit(7)) === 0,
            concat(col("text"), lit(" " + TextOps.MojibakeSeqs.mkString(" "))))
            .when(pmod(col("doc_id"), lit(7)) === 1,
              concat(col("text"), lit("\uFFFD\uFFFDbroken")))
            .when(pmod(col("doc_id"), lit(7)) === 2,
              concat(col("text"), lit("\u0001" * 8 + "ctrl")))
            .otherwise(col("text")).as("t"))
        planted.select(col("doc_id"),
            TextOps.encodingArtifacts(col("t")).as("ea"))
          .select(col("doc_id"),
            col("ea.n_replacement").as("n_replacement"),
            col("ea.n_control").as("n_control"),
            col("ea.n_mojibake").as("n_mojibake"),
            col("ea.looks_clean").as("looks_clean"))
          .orderBy("doc_id")
      },
      Some(EncodingArtifactsSql)),

    // ---- p47: corpus-trained bigram-LM scoring — the CCNet-style
    // perplexity quality filter, self-trained (no external model
    // artifact), add-one smoothed over the corpus vocabulary. Outliers
    // PLANTED per doc_id mod identically in both engines (p46 pattern):
    // per-doc-unique gibberish should score below the band, a repeated
    // boilerplate phrase above it. Smoothed P(w2|w1) is a FLOOR-scaled
    // integer (`(c12+1)*1e6 div (c1+V)` — exact in both engines), the
    // per-doc score an exact BIGINT sum; the only double is one final
    // correctly-rounded division. Keep band integer-armed. ----------------
    QueryDef("p47_lm_score",
      (s, d) => {
        val gib = concat_ws(" ",
          (0 until 12).map(i => concat(lit("g"), col("doc_id"), lit("x" + i))): _*)
        val planted = T.documents(s, d).select(col("doc_id"),
          when(pmod(col("doc_id"), lit(13)) === 0, gib)
            .when(pmod(col("doc_id"), lit(13)) === 1,
              lit("click here to continue " * 50))
            .otherwise(col("text")).as("text"))
        TextOps.lmBigramScore(planted, "doc_id", "text").orderBy("doc_id")
      },
      Some(s"""
        WITH planted AS (SELECT doc_id, CASE
            WHEN doc_id % 13 = 0 THEN concat_ws(' ',
              'g'||doc_id||'x0','g'||doc_id||'x1','g'||doc_id||'x2',
              'g'||doc_id||'x3','g'||doc_id||'x4','g'||doc_id||'x5',
              'g'||doc_id||'x6','g'||doc_id||'x7','g'||doc_id||'x8',
              'g'||doc_id||'x9','g'||doc_id||'x10','g'||doc_id||'x11')
            WHEN doc_id % 13 = 1 THEN repeat('click here to continue ', 50)
            ELSE text END AS text
          FROM documents),
        t AS (SELECT doc_id, $ToksSql AS tk FROM planted),
        v AS (SELECT COUNT(DISTINCT w) AS v
          FROM (SELECT unnest(tk) AS w FROM t)),
        b AS (SELECT doc_id,
            unnest(tk[1:len(tk)-1]) AS w1, unnest(tk[2:len(tk)]) AS w2
          FROM t),
        c12 AS (SELECT w1, w2, COUNT(*) AS n12 FROM b GROUP BY 1, 2),
        c1 AS (SELECT w1, CAST(SUM(n12) AS BIGINT) AS n1 FROM c12 GROUP BY 1),
        lm AS (SELECT w1, w2, ((n12 + 1) * 1000000) // (n1 + v) AS p
          FROM c12 JOIN c1 USING (w1) CROSS JOIN v),
        d AS (SELECT b.doc_id, COUNT(*) AS n_bigrams,
            CAST(SUM(lm.p) AS BIGINT) AS score_sum
          FROM b JOIN lm USING (w1, w2) GROUP BY 1)
        SELECT planted.doc_id,
          COALESCE(n_bigrams, 0) AS n_bigrams, score_sum,
          CAST(score_sum AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS lm_score,
          (COALESCE(n_bigrams, 0) > 0
           AND score_sum * 100 >= n_bigrams * 1000000
           AND score_sum * 10 <= n_bigrams * 6000000) AS keep
        FROM planted LEFT JOIN d USING (doc_id) ORDER BY doc_id""")),

    // ---- p48: DSIR importance weights — target-domain resampling scores
    // (target = the English slice of the corpus) over HASHED bigram
    // features (md5→bucket, the cross-engine hash idiom of p05's LSH).
    // Arithmetic-mean ratio variant for integer exactness; see
    // TextOps.dsirWeights for the divergence note. ------------------------
    QueryDef("p48_dsir_weights",
      (s, d) => TextOps.dsirWeights(T.documents(s, d), "doc_id", "text",
        col("lang") === "en").orderBy("doc_id"),
      Some(s"""
        WITH t AS (SELECT doc_id, lang = 'en' AS is_target, $ToksSql AS tk
          FROM documents),
        feats AS (SELECT doc_id, is_target,
            ('0x' || substring(md5(w1 || ' ' || w2), 1, 15))::BIGINT % 1024 AS f
          FROM (SELECT doc_id, is_target,
              unnest(tk[1:len(tk)-1]) AS w1, unnest(tk[2:len(tk)]) AS w2
            FROM t)),
        counts AS (SELECT f, COUNT(*) AS r_f,
            CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS t_f
          FROM feats GROUP BY 1),
        tot AS (SELECT CAST(SUM(r_f) AS BIGINT) AS r_tot,
            CAST(SUM(t_f) AS BIGINT) AS t_tot FROM counts),
        ratios AS (SELECT f,
            ((t_f + 1) * 1000000 // (r_f + 1)) * (r_tot + 1024)
              // (t_tot + 1024) AS ratio
          FROM counts CROSS JOIN tot),
        d AS (SELECT feats.doc_id, COUNT(*) AS n_feats,
            CAST(SUM(ratio) AS BIGINT) AS w_sum
          FROM feats JOIN ratios USING (f) GROUP BY 1)
        SELECT documents.doc_id, COALESCE(n_feats, 0) AS n_feats, w_sum,
          CAST(w_sum AS DOUBLE) / CAST(n_feats AS DOUBLE) AS dsir_weight,
          (COALESCE(n_feats, 0) > 0 AND w_sum >= n_feats * 1000000) AS selected
        FROM documents LEFT JOIN d USING (doc_id) ORDER BY doc_id""")),

    // ---- p50: distributed BPE tokenizer training — the merge-learning
    // loop of Sennrich et al. 2016 as Spark jobs (one corpus pass to a
    // word-frequency table, then per-round pair-count shuffles + a
    // map-only codegen merge fold). The oracle UNROLLS all 10 training
    // rounds as chained materialized CTEs (QuerySql.bpeMergesOracle):
    // pair counts, argmax tie-break, the greedy non-overlapping merge
    // fold (run-parity windows), and the minCount early stop — so
    // training hash-matches DuckDB end to end. Exactness is additionally
    // spec'd in TextExtrasSpec against the paper's corpus. ---------------
    QueryDef("p50_bpe_merges",
      (s, d) => Bpe.train(T.documents(s, d), "text", nMerges = 10)
        .orderBy("rank"),
      Some(bpeMergesOracle(10))),

    // ---- p51: per-document duplication rate — fraction of a doc's
    // distinct 5-gram shingles that occur in other documents (the
    // Dolma/RedPajama-v2 corpus-report signal; memorization-risk proxy).
    // Exact integers; one double division; keep band integer-armed. ------
    QueryDef("p51_dup_rate",
      (s, d) => TextOps.duplicationRate(T.documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some(s"""
        WITH t AS (SELECT doc_id, $ToksSql AS tk FROM documents),
        s AS (SELECT doc_id, CASE WHEN len(tk) >= 5 THEN
            list_distinct(list_transform(range(0, len(tk)-4), i ->
              tk[i+1]||' '||tk[i+2]||' '||tk[i+3]||' '||tk[i+4]||' '||tk[i+5]))
          ELSE [] END AS shs FROM t),
        posts AS (SELECT doc_id, ('0x' || substring(md5(unnest(shs)), 1, 15))::BIGINT AS sh FROM s),
        dfq AS (SELECT sh, COUNT(*) AS df FROM posts GROUP BY 1),
        d AS (SELECT posts.doc_id, COUNT(*) AS n_grams,
            CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
          FROM posts JOIN dfq USING (sh) GROUP BY 1)
        SELECT documents.doc_id, COALESCE(n_grams, 0) AS n_grams, n_shared,
          CAST(n_shared AS DOUBLE) / CAST(n_grams AS DOUBLE) AS dup_frac,
          (COALESCE(n_grams, 0) > 0 AND n_shared * 5 <= n_grams * 3) AS keep
        FROM documents LEFT JOIN d USING (doc_id) ORDER BY doc_id""")),

    // ---- p52: BM25 ranked retrieval — top-20 docs for a fixed bag-of-
    // terms query ("dup" is the corpus's one rare token — high IDF; the
    // others are common, so tf/doc-length saturation discriminates).
    // Rational (log-free) IDF + floor-scaled integer per-term weights so
    // the per-doc sum is an exact BIGINT; see TextOps.bm25TopDocs. -------
    QueryDef("p52_bm25_topk",
      (s, d) => TextOps.bm25TopDocs(T.documents(s, d), "doc_id", "text",
        queryTerms = Seq("dup", "vector", "customer", "batch"), k = 20),
      Some(s"""
        WITH t AS (SELECT doc_id, $ToksSql AS tk FROM documents),
        docs AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS dl FROM t),
        n AS (SELECT COUNT(*) AS n_corpus, CAST(SUM(dl) AS BIGINT) AS dl_tot
          FROM docs),
        hits AS (SELECT doc_id, dl, unnest(tk) AS token FROM docs),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf, MAX(dl) AS dl FROM hits
          WHERE token IN ('dup', 'vector', 'customer', 'batch')
          GROUP BY 1, 2),
        dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        s1 AS (SELECT tf.doc_id, tf.tf, tf.dl, dfreq.df, n.n_corpus,
            CAST(n.dl_tot AS DOUBLE) / CAST(n.n_corpus AS DOUBLE) AS avgdl
          FROM tf JOIN dfreq USING (token) CROSS JOIN n),
        s2 AS (SELECT doc_id,
            1.0 + (CAST(n_corpus AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
              / (CAST(df AS DOUBLE) + 0.5) AS idf,
            (CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE)
              + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))) AS tfw
          FROM s1),
        s3 AS (SELECT doc_id,
            CAST(floor(idf * tfw * 1000000.0) AS BIGINT) AS w FROM s2),
        agg AS (SELECT doc_id, COUNT(*) AS n_terms,
            CAST(SUM(w) AS BIGINT) AS score_sum FROM s3 GROUP BY 1)
        SELECT doc_id, n_terms, score_sum,
          CAST(score_sum AS DOUBLE) / 1000000.0 AS bm25
        FROM agg ORDER BY score_sum DESC, doc_id LIMIT 20""")),

    // ---- p53: weighted corpus sampling by PRIORITY SAMPLING (Duffield-
    // Lund-Thorup) over the p48 DSIR importance weights — the resampling
    // step that turns importance weights into an actual drawn subset.
    // Exactly k rows out, md5-seeded (reproducible across engines/runs),
    // all-integer priorities. ---------------------------------------------
    QueryDef("p53_priority_sample",
      (s, d) => {
        val wts = TextOps.dsirWeights(T.documents(s, d), "doc_id", "text",
            col("lang") === "en")
          .select(col("doc_id"),
            (coalesce(col("w_sum"), lit(0L)) + 1L).as("wt"))
        Shards.prioritySample(wts, "doc_id", col("wt"), k = 100)
      },
      Some(s"""
        WITH t AS (SELECT doc_id, lang = 'en' AS is_target, $ToksSql AS tk
          FROM documents),
        feats AS (SELECT doc_id, is_target,
            ('0x' || substring(md5(w1 || ' ' || w2), 1, 15))::BIGINT % 1024 AS f
          FROM (SELECT doc_id, is_target,
              unnest(tk[1:len(tk)-1]) AS w1, unnest(tk[2:len(tk)]) AS w2
            FROM t)),
        counts AS (SELECT f, COUNT(*) AS r_f,
            CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS t_f
          FROM feats GROUP BY 1),
        tot AS (SELECT CAST(SUM(r_f) AS BIGINT) AS r_tot,
            CAST(SUM(t_f) AS BIGINT) AS t_tot FROM counts),
        ratios AS (SELECT f,
            ((t_f + 1) * 1000000 // (r_f + 1)) * (r_tot + 1024)
              // (t_tot + 1024) AS ratio
          FROM counts CROSS JOIN tot),
        d AS (SELECT feats.doc_id, COUNT(*) AS n_feats,
            CAST(SUM(ratio) AS BIGINT) AS w_sum
          FROM feats JOIN ratios USING (f) GROUP BY 1),
        base AS (SELECT documents.doc_id, COALESCE(w_sum, 0) + 1 AS weight
          FROM documents LEFT JOIN d USING (doc_id)),
        pri AS (SELECT doc_id, weight,
            (weight * 1048576) // (((('0x' || substring(
              md5('graft' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              % 2147483648) % 1073741824) + 1) AS priority
          FROM base)
        SELECT doc_id, weight, priority FROM pri
        ORDER BY priority DESC, doc_id LIMIT 100""")),

    // ---- p57: TRAINED quality classifier — 5 full-batch GD steps of a
    // logistic model over hashed bigram features, then per-doc scoring, all
    // engine-exact (integer logit/gradient sums, rational fast sigmoid,
    // truncating-division updates) so even the TRAINING is hash-compared.
    // The positive class is a planted marker phrase (doc_id % 3), the
    // fastText-filter shape of GPT-3/LLaMA/FineWeb-Edu curation. ----------
    QueryDef("p57_quality_classifier",
      (s, d) => {
        val docs = T.documents(s, d).select(col("doc_id"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(col("text"), lit(" qz mark qz mark qz mark")))
            .otherwise(col("text")).as("text"),
          (pmod(col("doc_id"), lit(3)) === 0).as("y"))
        Classifier.trainScoreLr(docs, "doc_id", "text", col("y"),
          buckets = 256, iters = 5).orderBy("doc_id")
      },
      Some(lrOracle(
        """SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN text || ' qz mark qz mark qz mark'
                  ELSE text END AS text,
             doc_id % 3 = 0 AS label
           FROM documents""",
        iters = 5, buckets = 256, etaScaled = 500L))),

    // ---- p58: BPE tokenization under the p50-trained merges — per-doc
    // subword counts (fertility = n_tokens/n_words), the corpus-sizing
    // pass for training-run and shard budgets. Word-TYPE economy: the
    // merge fold runs once per distinct word (the count-only
    // `bpe_piece_count` interned-int kernel). Oracle: the p50 round chain
    // re-applied — the final type table IS the encoded vocabulary, joined
    // back through per-doc word counts (QuerySql.bpeEncodeOracle); also
    // spec'd vs a reference JVM BPE in PipelineExtrasSpec. ---------------
    QueryDef("p58_bpe_encode",
      (s, d) => Bpe.trainEncodeCounts(T.documents(s, d), "doc_id", "text",
        nMerges = 10).orderBy("doc_id"),
      Some(bpeEncodeOracle(10))),

    // ---- p75: per-source tokenizer FERTILITY datasheet — train the p50
    // tokenizer, encode the corpus (ONE shared tokenize pass via
    // trainEncodeCounts), and roll tokens/words up per source: the
    // corpus-sizing number tokenizer reports publish (fertility >> 1 on a
    // domain means the token budget buys fewer words there). All-BIGINT
    // sums; fertility is one correctly-rounded double division. ----------
    QueryDef("p75_bpe_fertility",
      (s, d) => {
        val docs = T.documents(s, d)
        docs.select(col("doc_id"), col("source"))
          .join(Bpe.trainEncodeCounts(docs, "doc_id", "text", nMerges = 10),
            Seq("doc_id"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_words")).as("words"),
            sum(col("n_tokens")).as("tokens"))
          // ADVICE r9: guard the zero-word edge — Spark's Divide returns
          // NULL on /0 but DuckDB IEEE float division returns inf/nan, so
          // both sides null it explicitly (oracle uses NULLIF)
          .withColumn("fertility",
            when(col("words") > 0,
              col("tokens").cast("double") / col("words").cast("double")))
          .orderBy("source")
      },
      Some(bpeFertilityOracle(10))),

    // ---- p62: classifier-gated priority sampling — the FineWeb-Edu
    // pipeline shape end-to-end in ONE query: train the p57 logistic
    // quality filter (5 engine-exact GD steps), keep the docs it predicts
    // positive, and draw an exact-k weighted sample with confidence
    // (z_sum+1) as the weight through the p53 all-integer md5-seeded
    // priority. The oracle chains the identical unrolled training CTEs
    // (QuerySql.lrCtes — the very chain p57 hash-proves) into the
    // priority draw, so training, gating, and sampling are ALL
    // hash-compared in one row set. ---------------------------------------
    QueryDef("p62_classifier_sample",
      (s, d) => {
        val docs = T.documents(s, d).select(col("doc_id"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(col("text"), lit(" qz mark qz mark qz mark")))
            .otherwise(col("text")).as("text"),
          (pmod(col("doc_id"), lit(3)) === 0).as("y"))
        val scored = Classifier.trainScoreLr(docs, "doc_id", "text", col("y"),
          buckets = 256, iters = 5)
        val kept = scored.filter(col("predicted"))
          .select(col("doc_id"), (col("z_sum") + 1L).as("wt"))
        Shards.prioritySample(kept, "doc_id", col("wt"), k = 100)
      },
      Some(s"""
        WITH ${lrCtes(
          """SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN text || ' qz mark qz mark qz mark'
                  ELSE text END AS text,
             doc_id % 3 = 0 AS label
           FROM documents""",
          iters = 5, buckets = 256, etaScaled = 500L)},
        kept AS (SELECT doc_id, z_sum + 1 AS weight FROM z5 WHERE z_sum >= 0),
        pri AS (SELECT doc_id, weight,
            (weight * 1048576) // (((('0x' || substring(
              md5('graft' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              % 2147483648) % 1073741824) + 1) AS priority
          FROM kept)
        SELECT doc_id, weight, priority FROM pri
        ORDER BY priority DESC, doc_id LIMIT 100""")),

    // ---- p70: corpus-wide repeated n-gram mining — the boilerplate /
    // memorization audit: top word 3-grams by document frequency with an
    // example doc each. Distinct-per-doc shingles from the word_shingles
    // kernel; one partial-agg shuffle + TakeOrdered top-k. ------------------
    QueryDef("p70_repeated_ngrams",
      (s, d) => TextOps.repeatedNgrams(T.documents(s, d), "doc_id", "text",
        n = 3, minDocs = 2L, topK = 100),
      Some(s"""
        WITH t AS (SELECT doc_id, $ToksSql AS tk FROM documents),
        sets AS (SELECT doc_id,
            list_distinct(list_transform(range(0, len(tk)-2),
              i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])) AS shs
          FROM t WHERE len(tk) >= 3),
        g AS (SELECT unnest(shs) AS gram, doc_id FROM sets)
        SELECT gram, COUNT(*) AS n_docs, MIN(doc_id) AS example_doc
        FROM g GROUP BY 1 HAVING COUNT(*) >= 2
        ORDER BY n_docs DESC, gram LIMIT 100""")),

    // ---- p71: classifier EVALUATION report — confusion counts at the
    // z>=0 threshold plus exact binned-logit ROC AUC (all-integer
    // Mann-Whitney with average-rank ties at bin granularity; one final
    // double division) over p57's bit-reproducible training chain. The
    // missing check between training (p57) and gating (p62). -------------
    QueryDef("p71_classifier_eval",
      (s, d) => {
        val docs = T.documents(s, d).select(col("doc_id"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(col("text"), lit(" qz mark qz mark qz mark")))
            .otherwise(col("text")).as("text"),
          (pmod(col("doc_id"), lit(3)) === 0).as("y"))
        val scored = Classifier.trainScoreLr(docs, "doc_id", "text", col("y"),
          buckets = 256, iters = 5)
        Classifier.evalReport(scored)
      },
      Some(s"""
        WITH ${lrCtes(
          """SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN text || ' qz mark qz mark qz mark'
                    ELSE text END AS text,
               doc_id % 3 = 0 AS label
             FROM documents""", iters = 5, buckets = 256, etaScaled = 500L)},
        -- MATERIALIZED: z5 is read twice (bins + confusion); DuckDB inlines
        -- multi-referenced CTEs, which would re-run the whole 5-iteration
        -- training chain per reference (measured 365 s vs 16 s at sf1)
        z5m AS MATERIALIZED (SELECT * FROM z5),
        b AS (SELECT greatest(-2048, least(2047, z_sum // 4194304)) AS bin,
            CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS pos,
            CAST(SUM(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) AS neg
          FROM z5m GROUP BY 1),
        c AS (SELECT bin, pos, neg,
            COALESCE(CAST(SUM(neg) OVER (ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
              0) AS cumneg FROM b),
        u AS (SELECT CAST(SUM(pos * (2 * cumneg + neg)) AS BIGINT) AS u2,
            CAST(SUM(pos) AS BIGINT) AS n_pos,
            CAST(SUM(neg) AS BIGINT) AS n_neg FROM c),
        cf AS (SELECT
            CAST(SUM(CASE WHEN label AND z_sum >= 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS tp,
            CAST(SUM(CASE WHEN NOT label AND z_sum >= 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS fp,
            CAST(SUM(CASE WHEN NOT label AND z_sum < 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS tn,
            CAST(SUM(CASE WHEN label AND z_sum < 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS fn
          FROM z5m)
        SELECT n_pos, n_neg, tp, fp, tn, fn, u2,
          CAST(u2 AS DOUBLE) / (2.0 * CAST(n_pos AS DOUBLE)
            * CAST(n_neg AS DOUBLE)) AS auc
        FROM cf CROSS JOIN u""")),

    // ---- p73: filter ablation A/B — the full Gopher recipe (keep_a) vs a
    // relaxed variant (keep_b: minWords 20, no alpha/stopword rules, no
    // bullet cap) over ONE gopher_stats scan, counted per (source, keep_a,
    // keep_b) with token mass — the recipe-comparison report a curation
    // iteration reads before switching configs. -----------------------------
    QueryDef("p73_filter_ablation",
      (s, d) => {
        val stats = T.documents(s, d).select(col("source"),
          call_function("gopher_stats", col("text")).as("g"))
          .select(col("source"),
            col("g.n_words").as("n_words"),
            col("g.n_word_chars").as("n_word_chars"),
            col("g.n_lines").as("n_lines"),
            col("g.n_bullet").as("n_bullet"),
            col("g.n_ellipsis_end").as("n_ellipsis_end"),
            col("g.n_symbols").as("n_symbols"),
            col("g.n_alpha_words").as("n_alpha_words"),
            col("g.n_stopwords").as("n_stopwords"))
        val keepA =
          col("n_words") >= 50 && col("n_words") <= 100000 &&
            lit(3) * col("n_words") <= col("n_word_chars") &&
            col("n_word_chars") <= lit(10) * col("n_words") &&
            lit(10) * col("n_symbols") <= col("n_words") &&
            lit(10) * col("n_bullet") <= lit(9) * col("n_lines") &&
            lit(10) * col("n_ellipsis_end") <= lit(3) * col("n_lines") &&
            lit(5) * col("n_alpha_words") >= lit(4) * col("n_words") &&
            col("n_stopwords") >= 2
        val keepB =
          col("n_words") >= 20 && col("n_words") <= 100000 &&
            lit(3) * col("n_words") <= col("n_word_chars") &&
            col("n_word_chars") <= lit(10) * col("n_words") &&
            lit(10) * col("n_symbols") <= col("n_words") &&
            lit(10) * col("n_ellipsis_end") <= lit(3) * col("n_lines")
        TextOps.filterAblation(stats, "source",
          Seq("keep_a" -> keepA, "keep_b" -> keepB), col("n_words"))
          .orderBy("source", "keep_a", "keep_b")
      },
      Some(s"""
        WITH t AS (SELECT source, text, $ToksSql AS tk,
            list_transform(string_split(text, chr(10)), l -> trim(l)) AS ln
          FROM documents),
        c AS (SELECT source,
            CAST(len(tk) AS BIGINT) AS n_words,
            CAST(list_reduce(list_transform(tk, x -> len(x)),
              (a,b) -> a+b) AS BIGINT) AS n_word_chars,
            CAST(len(ln) AS BIGINT) AS n_lines,
            CAST(len(list_filter(ln, l ->
              l LIKE '-%' OR l LIKE '*%' OR l LIKE '•%')) AS BIGINT) AS n_bullet,
            CAST(len(list_filter(ln, l ->
              l LIKE '%...' OR l LIKE '%…')) AS BIGINT) AS n_ellipsis_end,
            CAST((len(text) - len(replace(text, '#', '')))
              + ((len(text) - len(replace(text, '...', ''))) // 3)
              AS BIGINT) AS n_symbols,
            CAST(len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]')))
              AS BIGINT) AS n_alpha_words,
            CAST(len(list_intersect(list_distinct(list_transform(tk,
              x -> lower(x))),
              ['the','be','to','of','and','that','have','with']))
              AS BIGINT) AS n_stopwords
          FROM t),
        f AS (SELECT source, n_words,
            (n_words >= 50 AND n_words <= 100000
             AND 3*n_words <= n_word_chars AND n_word_chars <= 10*n_words
             AND 10*n_symbols <= n_words
             AND 10*n_bullet <= 9*n_lines
             AND 10*n_ellipsis_end <= 3*n_lines
             AND 5*n_alpha_words >= 4*n_words
             AND n_stopwords >= 2) AS keep_a,
            (n_words >= 20 AND n_words <= 100000
             AND 3*n_words <= n_word_chars AND n_word_chars <= 10*n_words
             AND 10*n_symbols <= n_words
             AND 10*n_ellipsis_end <= 3*n_lines) AS keep_b
          FROM c)
        SELECT source, keep_a, keep_b, COUNT(*) AS n_docs,
          CAST(SUM(n_words) AS BIGINT) AS n_tokens
        FROM f GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))
  )
}
