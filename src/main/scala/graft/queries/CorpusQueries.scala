package graft.queries

import graft.{QueryDef, Tables => T}
import graft.operators._
import org.apache.spark.sql.functions._
import QuerySql._

/** Corpus/event/multimodal gate queries: as-of join, sessionization, media
  * plumbing, the end-to-end clean pipeline, splits and shard packing. */
object CorpusQueries {

  val all: Seq[QueryDef] = Seq(

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


    // ---- p16: video-style frame sampling (per-partition stub demuxer).
    // Oracle mirrors the frame-window arithmetic on byte lengths alone:
    // frame = max(1, len/4), min(4, len) windows, last window truncated at
    // len — all integer, no byte content needed. --------------------------
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

    // ---- p41: REAL media container headers — PNG/JPEG/GIF/BMP/WAV parsed
    // from actual on-disk-format bytes (handcrafted canonical fixtures incl.
    // adversarial cases), all in codegen'd scalar built-ins over the hex
    // rendering; the oracle replays the identical bounded scans in DuckDB
    // (see QuerySql.mediaHeadersSql / MediaHeaders.parseHeader). ------------
    QueryDef("p41_media_headers",
      (s, d) => {
        import s.implicits._
        MediaHeaders.fixtures.toDF("media_id", "hx")
          .withColumn("content", unhex(col("hx")))
          .select(col("media_id"),
            MediaHeaders.parseHeader(col("content")).as("hd"))
          .select(col("media_id"), col("hd.fmt").as("fmt"),
            col("hd.width").as("width"), col("hd.height").as("height"),
            col("hd.duration_ms").as("duration_ms"))
          .orderBy("media_id")
      },
      Some(mediaHeadersSql(MediaHeaders.fixtures))),

    // ---- p45: MP4 (ISO-BMFF) + MP3 headers — the video/audio containers a
    // multimodal crawl actually contains, same bounded-scan technique as
    // p41 (box walk for moov/mvhd; ID3 skip + MPEG1 Layer III frame parse);
    // fixtures include truncated and corrupt cases. Oracle replays the
    // walks in DuckDB (QuerySql.avHeadersSql). ----------------------------
    QueryDef("p45_av_headers",
      (s, d) => {
        import s.implicits._
        MediaHeaders.avFixtures.toDF("media_id", "hx")
          .withColumn("content", unhex(col("hx")))
          .select(col("media_id"),
            MediaHeaders.parseHeader(col("content")).as("hd"))
          .select(col("media_id"), col("hd.fmt").as("fmt"),
            col("hd.width").as("width"), col("hd.height").as("height"),
            col("hd.duration_ms").as("duration_ms"))
          .orderBy("media_id")
      },
      Some(avHeadersSql(MediaHeaders.avFixtures))),

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

    // ---- p27: deterministic stratified sampling — md5-uniform per row vs a
    // per-stratum fraction. Map-only and REPRODUCIBLE: re-runs, other
    // engines, and any repartitioning keep exactly the same rows (the
    // property that makes a 100 TB downsample auditable). ------------------
    QueryDef("p27_sample_stratified",
      (s, d) => Shards.sampleStratified(T.documents(s, d), "doc_id", "source",
        Map("src0" -> 0.8, "src1" -> 0.5, "src2" -> 0.2),
        defaultFraction = 0.3, salt = "samp")
        .select(col("doc_id"), col("source"),
          Shards.sampleUniform(col("doc_id"), "samp").as("u"))
        .orderBy("doc_id"),
      Some("""
        SELECT doc_id, source,
          CAST(('0x' || substring(md5('samp' || doc_id), 1, 15))::BIGINT
               % 2147483648 AS DOUBLE) / 2147483648.0 AS u
        FROM documents
        WHERE CAST(('0x' || substring(md5('samp' || doc_id), 1, 15))::BIGINT
               % 2147483648 AS DOUBLE) / 2147483648.0
          < CASE source WHEN 'src0' THEN 0.8 WHEN 'src1' THEN 0.5
                        WHEN 'src2' THEN 0.2 ELSE 0.3 END
        ORDER BY doc_id""")),

    // ---- p31: the round-4 curation pipeline END-TO-END — repetition gate
    // -> PII redaction (planted deterministically, as p26) -> stratified
    // 60% sample -> token-budget shard packing — composed from the same
    // operators the individual gates verify, and hash-compared as a WHOLE
    // (each stage's oracle fragment chained into one SQL). -----------------
    QueryDef("p31_curate_pipeline",
      (s, d) => {
        val docs = T.documents(s, d)
        val clean = docs
          .withColumn("ts", TextOps.tokenStats(col("text"))) // one pass, both gates
          .withColumn("dup_frac",
            (col("ts.n_tokens") - col("ts.n_distinct")).cast("double") /
              greatest(col("ts.n_tokens"), lit(1L)).cast("double"))
          .withColumn("topg",
            col("ts.max_bigram_mult").cast("double") /
              greatest(col("ts.n_tokens") - lit(1L), lit(1L)).cast("double"))
          .filter(!(col("dup_frac") > 0.3 || col("topg") > 0.18))
          .drop("ts")
        val withPii = clean.withColumn("text",
          concat_ws(" ", col("text"),
            concat(lit("contact user"), col("doc_id"), lit("@example.com")),
            concat(lit("host 10.1."), pmod(col("doc_id"), lit(250)), lit(".7"))))
        val redacted = withPii
          .withColumn("ps", Pii.scan(col("text"))) // one kernel call, 3 fields
          .withColumn("n_pii",
            (col("ps.n_emails") + col("ps.n_ips")).cast("long"))
          .withColumn("text", col("ps.redacted"))
          .drop("ps")
        val sampled = Shards.sampleStratified(redacted, "doc_id", "source",
          Map.empty, defaultFraction = 0.6, salt = "cur")
          .withColumn("tk", TextOps.tokenCount(col("text")).cast("long"))
        Shards.packShards(sampled, "source", "doc_id", "tk", budget = 1500L)
          .groupBy("source", "shard_id")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("tk")).cast("long").as("shard_tokens"),
            sum(col("n_pii")).cast("long").as("n_pii_redacted"),
            min(col("doc_id")).as("first_doc"))
          .orderBy("source", "shard_id")
      },
      Some(s"""
        WITH t AS (SELECT doc_id, source, text, $ToksSql AS tk FROM documents),
        g AS (SELECT doc_id,
            list_transform(range(0, len(tk)-1), i -> tk[i+1] || ' ' || tk[i+2]) AS gs
          FROM t WHERE len(tk) >= 2),
        grams AS (SELECT doc_id, unnest(gs) AS gm FROM g),
        gcnt AS (SELECT doc_id, MAX(c) AS topg FROM
          (SELECT doc_id, gm, COUNT(*) AS c FROM grams GROUP BY 1, 2) GROUP BY 1),
        clean AS (SELECT t.doc_id, t.source, t.text FROM t
          LEFT JOIN gcnt ON t.doc_id = gcnt.doc_id
          WHERE NOT (
            CAST(len(tk) - len(list_distinct(tk)) AS DOUBLE)
              / CAST(greatest(len(tk), 1) AS DOUBLE) > 0.3
            OR CAST(COALESCE(topg, 0) AS DOUBLE)
              / CAST(greatest(len(tk) - 1, 1) AS DOUBLE) > 0.18)),
        planted AS (SELECT doc_id, source,
            concat_ws(' ', text,
              'contact user' || doc_id || '@example.com',
              'host 10.1.' || (doc_id % 250) || '.7') AS text
          FROM clean),
        red AS (SELECT doc_id, source,
            CAST(len(regexp_extract_all(text,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
            + CAST(len(regexp_extract_all(text,
              '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_pii,
            regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
              '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
              '\\+\\d{1,3}[ -]\\(\\d{3}\\)[ -]?\\d{3}-\\d{4}|\\+\\d{1,3}[ -]\\d{3}[ -]\\d{3}[ -]\\d{4}|\\+\\d{1,3}[ -]\\d{3}[ -]\\d{4}|\\(\\d{3}\\)[ -]?\\d{3}-\\d{4}|\\b\\d{3}[ -]\\d{3}[ -]\\d{4}\\b', '<PHONE>', 'g'),
              '\\b\\d{1,5} [A-Z][A-Za-z]+ (Street|Avenue|Boulevard|Road|Lane|Drive|St|Ave|Blvd|Rd|Ln|Dr)\\b', '<ADDRESS>', 'g') AS text
          FROM planted),
        samp AS (SELECT *,
            CAST(len($ToksSql) AS BIGINT) AS tk2
          FROM red
          WHERE CAST(('0x' || substring(md5('cur' || doc_id), 1, 15))::BIGINT
                % 2147483648 AS DOUBLE) / 2147483648.0 < 0.6),
        w AS (SELECT doc_id, source, n_pii, tk2,
            SUM(tk2) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tk2 AS ecs
          FROM samp)
        SELECT source, CAST(ecs // 1500 AS BIGINT) AS shard_id,
          COUNT(*) AS n_docs, CAST(SUM(tk2) AS BIGINT) AS shard_tokens,
          CAST(SUM(n_pii) AS BIGINT) AS n_pii_redacted,
          MIN(doc_id) AS first_doc
        FROM w GROUP BY 1, 2 ORDER BY source, shard_id""")),

    // ---- p60: stratified priority sampling — exactly 10 rows PER SOURCE
    // drawn by length-weighted md5-seeded priorities (the per-domain quota
    // draw of mixture recipes; a global top-k would let one giant domain
    // starve the rest). All-integer p53 priorities; one rank window per
    // stratum, no global ordering. --------------------------------------
    QueryDef("p60_stratified_priority",
      (s, d) => Shards.prioritySampleStratified(
        T.documents(s, d), "doc_id", "source",
        (col("n_chars").cast("long") + 1L), kPerStratum = 10)
        .orderBy("doc_id"),
      Some("""
        WITH base AS (SELECT doc_id, source,
            CAST(n_chars AS BIGINT) + 1 AS weight FROM documents),
        pri AS (SELECT doc_id, source, weight,
            (weight * 1048576) // (((('0x' || substring(
              md5('graft' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              % 2147483648) % 1073741824) + 1) AS priority
          FROM base),
        r AS (SELECT *, CAST(ROW_NUMBER() OVER
            (PARTITION BY source ORDER BY priority DESC, doc_id)
            AS BIGINT) AS rk FROM pri)
        SELECT doc_id, source, weight, priority, rk FROM r
        WHERE rk <= 10 ORDER BY doc_id""")),

    // ---- p61: mixture planning end-to-end — temperature quotas (sqrt
    // temperature, floor-scaled-integer arithmetic: sqrt is IEEE
    // correctly-rounded in both engines, pow/ln are not) chained into the
    // p60 per-stratum priority draw in ONE query: plan the mixture, then
    // materialize it. quota = min(n_s, 200 * floor(sqrt(n_s)*1e6) div
    // Σ floor(sqrt(n_t)*1e6)); draw = all-integer md5 priorities. --------
    QueryDef("p61_mixture_draw",
      (s, d) => Shards.mixtureDraw(
        T.documents(s, d), "doc_id", "source",
        (col("n_chars").cast("long") + 1L), targetRows = 200)
        .orderBy("doc_id"),
      Some("""
        WITH base AS (SELECT doc_id, source,
            CAST(n_chars AS BIGINT) + 1 AS weight FROM documents),
        cnt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
          FROM base GROUP BY 1),
        sc AS (SELECT source, n,
            CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT) AS s
          FROM cnt),
        tot AS (SELECT CAST(SUM(s) AS BIGINT) AS st FROM sc),
        q AS (SELECT source, n, least(n, (200 * s) // st) AS quota
          FROM sc, tot),
        pri AS (SELECT doc_id, source, weight,
            (weight * 1048576) // (((('0x' || substring(
              md5('graft' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              % 2147483648) % 1073741824) + 1) AS priority
          FROM base),
        r AS (SELECT *, CAST(ROW_NUMBER() OVER
            (PARTITION BY source ORDER BY priority DESC, doc_id)
            AS BIGINT) AS rk FROM pri)
        SELECT doc_id, r.source, weight, priority, rk, n, quota
        FROM r JOIN q ON r.source = q.source
        WHERE rk <= quota ORDER BY doc_id""")),

    // ---- p76: length-bucketed batch planning — the sorted/bucketed
    // dynamic batching of training and inference loaders: bucket by BIT
    // LENGTH of the token count (floor(log2)+1 — length(bin(tk)), identical
    // both engines, no transcendental log), order by (tokens, id) within
    // (source, bucket), fill batches to a 1024-token budget via the
    // integral-cumsum idiom. Padding waste within a bucket is < 50% by
    // construction (max_len < 2·min_len). ---------------------------------
    QueryDef("p76_length_batching",
      (s, d) => {
        val docs = T.documents(s, d).select(col("doc_id"), col("source"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        Shards.lengthBucketBatches(docs, "source", "doc_id", "n_tokens",
            budget = 1024L)
          .orderBy("doc_id")
      },
      Some(s"""
        WITH t AS (SELECT doc_id, source, CAST(len($ToksSql) AS BIGINT) AS n_tokens
          FROM documents),
        b AS (SELECT doc_id, source, n_tokens,
            CASE WHEN n_tokens <= 0 THEN 0
                 ELSE CAST(length(bin(n_tokens)) AS BIGINT) END AS len_bucket
          FROM t)
        SELECT doc_id, source, n_tokens, len_bucket,
          -- DuckDB SUM(BIGINT) OVER widens to HUGEINT; cast back before //
          CAST(SUM(n_tokens) OVER (PARTITION BY source, len_bucket
              ORDER BY n_tokens, doc_id ROWS UNBOUNDED PRECEDING)
            - n_tokens AS BIGINT) // 1024 AS batch_id
        FROM b ORDER BY doc_id""")),

    // ---- p63: context-window sequence packing — concat docs in (source,
    // doc_id) order, cut every 512 tokens, emit one row per (doc, sequence)
    // span (the GPT/Megatron pretraining data layout: which slice of which
    // document lands in which fixed-length training sequence). Integer
    // cumsum + div only — engine-exact. ------------------------------------
    QueryDef("p63_pack_sequences",
      (s, d) => {
        val docs = T.documents(s, d).select(col("doc_id"), col("source"),
          TextOps.tokenCount(col("text")).cast("long").as("tk"))
        Shards.packSequences(docs, "source", "doc_id", "tk", ctx = 512L)
          .orderBy("source", "seq_id", "doc_id")
      },
      Some(s"""
        WITH t AS (SELECT doc_id, source, CAST(len($ToksSql) AS BIGINT) AS tk
          FROM documents),
        w AS (SELECT doc_id, source, tk,
            -- DuckDB SUM(BIGINT) widens to HUGEINT; pull back for range()
            CAST(SUM(tk) OVER (PARTITION BY source ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) - tk AS BIGINT) AS tok_start
          FROM t),
        sp AS (SELECT doc_id, source, tk, tok_start,
            unnest(range(tok_start // 512,
                         (tok_start + tk - 1) // 512 + 1)) AS seq_id
          FROM w WHERE tk > 0)
        SELECT doc_id, source, tk, seq_id,
          greatest(seq_id * 512 - tok_start, 0) AS span_start,
          least((seq_id + 1) * 512 - tok_start, tk)
            - greatest(seq_id * 512 - tok_start, 0) AS span_len
        FROM sp ORDER BY source, seq_id, doc_id""")),

    // ---- p64: MULTIMODAL sequence packing — each doc's budget is its text
    // tokens PLUS the ViT patch grid of its attached image (ceil(w/14) ×
    // ceil(h/14), the vision-transformer patch count an interleaved
    // image-text loader reserves), then the p63 concat-and-cut layout at
    // ctx=2048. Decode dims come from the stub codec (real mapPartitions
    // plumbing, deterministic fake decode — the documented multimodal
    // contract), which the oracle re-derives byte-for-byte like p14.
    // Patch math is all-integer ((w+13) div 14). -------------------------
    QueryDef("p64_pack_multimodal",
      (s, d) => {
        val media = Multimodal.attachBinary(
          T.documents(s, d).select("doc_id", "source", "text"), "text", "image")
        val costed = Multimodal.decodeMeta(media, "content")
          .select(col("doc_id"), col("source"),
            (TextOps.tokenCount(col("text")).cast("long") +
              expr("(CAST(decoded_width AS BIGINT) + 13L) div 14L") *
              expr("(CAST(decoded_height AS BIGINT) + 13L) div 14L"))
              .as("tk"))
        Shards.packSequences(costed, "source", "doc_id", "tk", ctx = 2048L)
          .orderBy("source", "seq_id", "doc_id")
      },
      Some(s"""
        WITH b AS (SELECT doc_id, source, text, hex(encode(text)) AS hx,
            octet_length(encode(text)) AS olen
          FROM documents),
        ch AS (SELECT doc_id, source, text,
            list_transform(range(0, olen),
              i -> ('0x' || substring(hx, 2*i+1, 2))::BIGINT) AS bytes
          FROM b),
        h AS (SELECT doc_id, source, text,
            list_reduce(list_prepend(CAST(17 AS BIGINT), bytes),
              (a, c) -> (a*31 + c) % 1000003) AS hv
          FROM ch),
        t AS (SELECT doc_id, source,
            CAST(len($ToksSql) AS BIGINT)
              + (((hv % 1920) + 14) // 14)
                * ((((hv // 1920) % 1080) + 14) // 14) AS tk
          FROM h),
        w AS (SELECT doc_id, source, tk,
            CAST(SUM(tk) OVER (PARTITION BY source ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) - tk AS BIGINT) AS tok_start
          FROM t),
        sp AS (SELECT doc_id, source, tk, tok_start,
            unnest(range(tok_start // 2048,
                         (tok_start + tk - 1) // 2048 + 1)) AS seq_id
          FROM w WHERE tk > 0)
        SELECT doc_id, source, tk, seq_id,
          greatest(seq_id * 2048 - tok_start, 0) AS span_start,
          least((seq_id + 1) * 2048 - tok_start, tk)
            - greatest(seq_id * 2048 - tok_start, 0) AS span_len
        FROM sp ORDER BY source, seq_id, doc_id""")),

    // ---- p65: deterministic span-corruption plan — the T5/UL2 denoising
    // mask layout (~15% of tokens in 3-token spans), placed by segmented
    // md5 jitter so spans never overlap and every placement is a pure
    // function of (doc_id, salt). Map-only; all-integer div/mod. ----------
    QueryDef("p65_span_corruption",
      (s, d) => {
        val docs = T.documents(s, d).select(col("doc_id"),
          TextOps.tokenCount(col("text")).cast("long").as("tk"))
        Shards.spanCorruptionPlan(docs, "doc_id", "tk")
          .orderBy("doc_id", "span_ix")
      },
      Some(s"""
        WITH t AS (SELECT doc_id, CAST(len($ToksSql) AS BIGINT) AS tk
          FROM documents),
        n AS (SELECT doc_id, tk, tk * 150 // 3000 AS n_spans
          FROM t WHERE tk * 150 // 3000 > 0),
        sp AS (SELECT doc_id, tk, n_spans,
            unnest(range(0, n_spans)) AS span_ix FROM n),
        seg AS (SELECT doc_id, tk, n_spans, span_ix,
            span_ix * tk // n_spans AS seg_start,
            (span_ix + 1) * tk // n_spans - span_ix * tk // n_spans AS seg_len
          FROM sp)
        SELECT doc_id, tk, n_spans, span_ix,
          seg_start + ((('0x' || substring(md5('graft'
              || CAST(doc_id AS VARCHAR) || '_'
              || CAST(span_ix AS VARCHAR)), 1, 15))::BIGINT
            % 2147483648) % (seg_len - 2)) AS span_start,
          CAST(3 AS BIGINT) AS span_len
        FROM seg WHERE seg_len >= 3 ORDER BY doc_id, span_ix""")),

    // ---- p66: deterministic fill-in-the-middle split plan — the FIM
    // transform (Bavarian et al. 2022): 90% of docs get two md5-jittered
    // token cuts into (prefix, middle, suffix), half PSM / half SPM order;
    // the rest stay autoregressive. Map-only, all-integer; the oracle
    // mirrors the three md5 draws exactly. ---------------------------------
    QueryDef("p66_fim_split",
      (s, d) => {
        val docs = T.documents(s, d).select(col("doc_id"),
          TextOps.tokenCount(col("text")).cast("long").as("tk"))
        Shards.fimSplitPlan(docs, "doc_id", "tk").orderBy("doc_id")
      },
      Some(s"""
        WITH t AS (SELECT doc_id, CAST(len($ToksSql) AS BIGINT) AS tk
          FROM documents),
        h AS (SELECT doc_id, tk,
            (('0x' || substring(md5('graft' || CAST(doc_id AS VARCHAR)
              || '_c1'), 1, 15))::BIGINT % 2147483648) % (tk + 1) AS ca,
            (('0x' || substring(md5('graft' || CAST(doc_id AS VARCHAR)
              || '_c2'), 1, 15))::BIGINT % 2147483648) % (tk + 1) AS cb,
            (('0x' || substring(md5('graftfim' || CAST(doc_id AS VARCHAR)),
              1, 15))::BIGINT % 2147483648) % 1000 < 900 AS isfim,
            (('0x' || substring(md5('graftspm' || CAST(doc_id AS VARCHAR)),
              1, 15))::BIGINT % 2147483648) % 1000 < 500 AS isspm
          FROM t),
        c AS (SELECT doc_id, tk,
            CASE WHEN isfim THEN least(ca, cb) ELSE tk END AS cut1,
            CASE WHEN isfim THEN greatest(ca, cb) ELSE tk END AS cut2,
            CASE WHEN NOT isfim THEN 'ar' WHEN isspm THEN 'spm'
                 ELSE 'psm' END AS fim_mode
          FROM h)
        SELECT doc_id, tk, fim_mode, cut1 AS prefix_len,
          cut2 - cut1 AS middle_len, tk - cut2 AS suffix_len
        FROM c ORDER BY doc_id""")),

    // ---- p68: corpus card — the per-(source, lang) datasheet a corpus
    // release ships (and the first report a 100 TB curation run produces):
    // doc/token/char totals, distinct-content count, short-doc count, and
    // an integer-scaled quality sum, ROLLED UP to per-source and corpus
    // grand totals in the same pass. Quality doubles are floor-scaled to
    // BIGINT per row BEFORE summing, so every aggregate is order-free and
    // engine-exact. One partial-agg rollup shuffle; grouping-set expansion
    // is map-side. ---------------------------------------------------------
    QueryDef("p68_corpus_card",
      (s, d) => {
        val docs = T.documents(s, d).select(col("doc_id"), col("source"),
          col("lang"), col("text"),
          TextOps.tokenCount(col("text")).cast("long").as("tk"))
        docs
          .withColumn("q6",
            floor(TextOps.qualityScore(col("text")) * lit(1000000.0))
              .cast("long"))
          .withColumn("fp", TextOps.fingerprint(col("text")))
          .rollup("source", "lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("tk")).as("n_tokens"),
            sum(length(col("text")).cast("long")).as("n_chars"),
            countDistinct(col("fp")).as("n_unique"),
            sum(when(col("tk") < 20, 1L).otherwise(0L)).as("n_short"),
            sum(col("q6")).as("q6_sum"))
          .orderBy(col("source").asc_nulls_first, col("lang").asc_nulls_first)
      },
      Some(s"""
        WITH t AS (SELECT doc_id, source, lang, text,
            CAST(len($ToksSql) AS BIGINT) AS tk,
            CAST(floor((${qualitySql(ToksSql, "text")}) * 1000000.0)
              AS BIGINT) AS q6,
            md5(text) AS fp
          FROM documents)
        SELECT source, lang, COUNT(*) AS n_docs,
          CAST(SUM(tk) AS BIGINT) AS n_tokens,
          CAST(SUM(CAST(len(text) AS BIGINT)) AS BIGINT) AS n_chars,
          COUNT(DISTINCT fp) AS n_unique,
          CAST(SUM(CASE WHEN tk < 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
          CAST(SUM(q6) AS BIGINT) AS q6_sum
        FROM t GROUP BY ROLLUP(source, lang)
        ORDER BY source ASC NULLS FIRST, lang ASC NULLS FIRST"""))
  )
}
