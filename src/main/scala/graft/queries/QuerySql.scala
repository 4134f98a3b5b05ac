package graft.queries

import graft.operators.TextOps

/** DuckDB SQL fragments shared across the gate-query domains, kept in
  * lockstep with the Spark operators they mirror (TextOps tokenization /
  * stopwords, Similarity fold order, Dedup's MinHash-LSH pipeline). */
private[queries] object QuerySql {

  val ToksSql = "string_split_regex(trim(text), '\\s+')"
  val StopSql: String = TextOps.Stopwords.map(s => s"'$s'").mkString("(", ", ", ")")

  /** p02's quality-score expression ([[graft.operators.TextOps.qualityScore]]
    * mirror) over a token-list ref and a text ref — factored so p55 ranks
    * cluster survivors by the identical doubles p02 hash-proves. */
  def qualitySql(toks: String, text: String): String =
    s"""least(CAST(len($toks) AS DOUBLE) / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.4 AS DOUBLE)
           + least(CAST(len(list_filter($toks, x -> x IN $StopSql)) AS DOUBLE)
                     / CAST(greatest(len($toks), 1) AS DOUBLE) * CAST(10.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.4 AS DOUBLE)
           + (CAST(1.0 AS DOUBLE)
              - least(CAST(len(regexp_replace($text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                        / CAST(greatest(len($text), 1) AS DOUBLE) * CAST(5.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(0.2 AS DOUBLE)"""

  /** The rational fast sigmoid in p57's exact literal op order. */
  def lrSig(z: String): String =
    s"0.5 + 0.5 * (CAST($z AS DOUBLE) / 1000000000.0)" +
      s" / (1.0 + abs(CAST($z AS DOUBLE) / 1000000000.0))"

  /** The CTE body of the unrolled training loop — `docs` through
    * `z$iters` (per-doc final logits), no WITH / final SELECT, so
    * composites (p62's classifier-gated sample) can chain more stages
    * onto the identical training chain p57 hash-proves. */
  def lrCtes(plantedDocs: String, iters: Int, buckets: Int,
             etaScaled: Long): String = {
    def sig(z: String): String = lrSig(z)
    val steps = (0 until iters).map { t =>
      val wUpd =
        if (t == 0) s"SELECT f, -(grad // n) * $etaScaled AS w FROM g0 CROSS JOIN nn"
        else s"""SELECT w$t.f, w$t.w - (g$t.grad // n) * $etaScaled AS w
          FROM w$t JOIN g$t USING (f) CROSS JOIN nn"""
      s"""e$t AS (SELECT doc_id, CAST(floor(((${sig("z_sum")})
            - CASE WHEN label THEN 1.0 ELSE 0.0 END) * 1000000.0) AS BIGINT) AS e
          FROM z$t),
        g$t AS (SELECT f, CAST(SUM(e * x) AS BIGINT) AS grad
          FROM e$t JOIN feats USING (doc_id) GROUP BY 1),
        w${t + 1} AS ($wUpd),
        z${t + 1} AS (SELECT t.doc_id, t.label,
            COALESCE(CAST(SUM(fx.w * fx.x) AS BIGINT), 0) AS z_sum
          FROM t LEFT JOIN (SELECT feats.doc_id, w${t + 1}.w, feats.x
            FROM feats JOIN w${t + 1} USING (f)) fx USING (doc_id)
          GROUP BY 1, 2)"""
    }.mkString(",\n        ")
    s"""docs AS ($plantedDocs),
        t AS (SELECT doc_id, label, $ToksSql AS tk FROM docs),
        feats AS (SELECT doc_id, f, COUNT(*) AS x FROM (
            SELECT doc_id,
              ('0x' || substring(md5(w1 || ' ' || w2), 1, 15))::BIGINT
                % $buckets AS f
            FROM (SELECT doc_id,
                unnest(tk[1:len(tk)-1]) AS w1, unnest(tk[2:len(tk)]) AS w2
              FROM t))
          GROUP BY 1, 2),
        nn AS (SELECT COUNT(*) AS n FROM docs),
        z0 AS (SELECT doc_id, label, CAST(0 AS BIGINT) AS z_sum FROM t),
        $steps"""
  }

  /** p57's full training loop unrolled to SQL — `iters` fixed-point GD
    * steps of [[graft.operators.Classifier.trainScoreLr]], exactly
    * mirrored: integer z/grad sums, the rational fast sigmoid in the same
    * literal op order, truncating integer division in the update. */
  def lrOracle(plantedDocs: String, iters: Int, buckets: Int,
               etaScaled: Long): String =
    s"""
        WITH ${lrCtes(plantedDocs, iters, buckets, etaScaled)}
        SELECT doc_id, z_sum, ${lrSig("z_sum")} AS prob, label,
          z_sum >= 0 AS predicted, (z_sum >= 0) = label AS correct
        FROM z$iters ORDER BY doc_id"""

  def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a)+1), i -> $a[i]*$b[i]), (x,y) -> x+y)"
  def normSql(v: String): String =
    s"sqrt(list_reduce(list_transform(range(1, len($v)+1), i -> $v[i]*$v[i]), (x,y) -> x+y))"

  /** p42 n-gram language-ID oracle: DuckDB mirror of
    * `TextOps.langIdNgramPredict` — same profiles (from the same Seq), same
    * replace-based counting, same tie-break cascade. */
  val LangIdNgramSql: String = {
    def score(grams: Seq[String]): String =
      grams.map(g => s"(length(t) - length(replace(t, '$g', '')))")
        .mkString("(", " + ", ")")
    val Seq(en, de, fr, es) = TextOps.LangProfiles.map(p => score(p._2))
    s"""
        WITH p AS (SELECT doc_id, ' ' || lower(text) || ' ' AS t FROM documents),
        sc AS (SELECT doc_id, t, $en AS s_en, $de AS s_de, $fr AS s_fr,
                 $es AS s_es,
                 length(t) - length(regexp_replace(t, '[一-鿿]', '', 'g')) AS han
          FROM p)
        SELECT doc_id, CAST(s_en AS BIGINT) AS s_en, CAST(s_de AS BIGINT) AS s_de,
          CAST(s_fr AS BIGINT) AS s_fr, CAST(s_es AS BIGINT) AS s_es,
          CASE WHEN han * 20 >= length(t) THEN 'zh'
               WHEN s_en + s_de + s_fr + s_es = 0 THEN 'unk'
               WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
               WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
               WHEN s_fr >= s_es THEN 'fr'
               ELSE 'es' END AS pred_lang
        FROM sc ORDER BY doc_id"""
  }

  // ---- p41 media-header oracle: DuckDB mirror of MediaHeaders.parseHeader.
  // DuckDB 1.0 cannot slice BLOBs, so (like the Spark side) everything runs
  // over the UPPER hex rendering: byte i lives at hex chars i*2-1..i*2.

  /** Unsigned byte at 1-based byte offset `off` (a SQL expression). */
  private def hxByte(off: String): String =
    s"('0x' || substring(h, ($off)*2-1, 2))::BIGINT"

  /** Unsigned big-endian `n`-byte int at byte offset `off`. */
  private def hxBe(off: String, n: Int): String =
    s"('0x' || substring(h, ($off)*2-1, ${n * 2}))::BIGINT"

  /** Unsigned little-endian `n`-byte int at byte offset `off`. */
  private def hxLe(off: String, n: Int): String =
    (0 until n).map(i => s"${hxByte(s"($off)+$i")} * ${1L << (8 * i)}")
      .mkString("(", " + ", ")")

  private def jpegStepSql(off: String): String = s"""
      CASE WHEN $off <= 0 THEN $off
           WHEN length(h) < (($off)+3)*2 THEN 0
           WHEN substring(h, ($off)*2-1, 2) <> 'FF' THEN 0
           WHEN substring(h, ($off)*2+1, 2) IN ('C0','C1','C2','C3') THEN -($off)
           ELSE $off + 2 + ${hxBe(s"($off)+2", 2)} END"""

  private def riffStepSql(off: String, idHex: String): String = s"""
      CASE WHEN $off <= 0 THEN $off
           WHEN length(h) < (($off)+7)*2 THEN 0
           WHEN substring(h, ($off)*2-1, 8) = '$idHex' THEN -($off)
           ELSE $off + 8 + ${hxLe(s"($off)+4", 4)} + (${hxLe(s"($off)+4", 4)} % 2) END"""

  /** Unrolled single-integer-state scan as a CTE chain `pfx0..pfxN`;
    * mirrors MediaHeaders.chain (state: >0 next offset, <0 found, 0 dead). */
  private def scanCtes(pfx: String, init: Int, steps: Int,
                       step: String => String): String = {
    val head = s"${pfx}0 AS (SELECT media_id, h, CAST($init AS BIGINT) AS off FROM b)"
    val rest = (1 to steps).map { i =>
      s"$pfx$i AS (SELECT media_id, h, ${step("off")} AS off FROM $pfx${i - 1})"
    }
    (head +: rest).mkString(",\n        ")
  }

  /** The full p41 oracle: VALUES fixtures → format dispatch + header fields,
    * in lockstep with `MediaHeaders.parseHeader`. */
  def mediaHeadersSql(fixtures: Seq[(Int, String)]): String = {
    val values = fixtures.map { case (id, hx) => s"($id, '$hx')" }.mkString(", ")
    s"""
        WITH fx(media_id, hx) AS (VALUES $values),
        b AS (SELECT media_id, upper(hx) AS h FROM fx),
        ${scanCtes("j", 3, 8, jpegStepSql)},
        jf AS (SELECT media_id, CASE WHEN off < 0 AND length(h) >= (-off+8)*2
                 THEN -off END AS sof FROM j8),
        ${scanCtes("wf", 13, 4, riffStepSql(_, "666D7420"))},
        wff AS (SELECT media_id, CASE WHEN off < 0 AND length(h) >= (-off+19)*2
                 THEN -off END AS fmtoff FROM wf4),
        ${scanCtes("wd", 13, 4, riffStepSql(_, "64617461"))},
        wdf AS (SELECT media_id, CASE WHEN off < 0 AND length(h) >= (-off+7)*2
                 THEN -off END AS dataoff FROM wd4),
        m AS (SELECT b.media_id, h, sof, fmtoff, dataoff,
                h LIKE '89504E470D0A1A0A%' AS is_png,
                h LIKE 'FFD8%' AS is_jpeg,
                h LIKE '47494638%' AS is_gif,
                h LIKE '424D%' AS is_bmp,
                (h LIKE '52494646%' AND length(h) >= 24
                  AND substring(h, 17, 8) = '57415645') AS is_wav,
                CASE WHEN fmtoff IS NOT NULL
                  THEN ${hxLe("fmtoff+16", 4)} END AS byte_rate,
                CASE WHEN dataoff IS NOT NULL
                  THEN ${hxLe("dataoff+4", 4)} END AS data_size
          FROM b JOIN jf USING (media_id) JOIN wff USING (media_id)
                 JOIN wdf USING (media_id))
        SELECT media_id,
          CASE WHEN is_png THEN 'png' WHEN is_jpeg THEN 'jpeg'
               WHEN is_gif THEN 'gif' WHEN is_bmp THEN 'bmp'
               WHEN is_wav THEN 'wav' ELSE 'unknown' END AS fmt,
          CAST(CASE WHEN is_png AND length(h) >= 40 THEN ${hxBe("17", 4)}
               WHEN is_jpeg THEN ${hxBe("sof+7", 2)}
               WHEN is_gif AND length(h) >= 16 THEN ${hxLe("7", 2)}
               WHEN is_bmp AND length(h) >= 44 THEN ${hxLe("19", 4)}
               END AS INTEGER) AS width,
          CAST(CASE WHEN is_png AND length(h) >= 48 THEN ${hxBe("21", 4)}
               WHEN is_jpeg THEN ${hxBe("sof+5", 2)}
               WHEN is_gif AND length(h) >= 20 THEN ${hxLe("9", 2)}
               WHEN is_bmp AND length(h) >= 52 THEN ${hxLe("23", 4)}
               END AS INTEGER) AS height,
          CASE WHEN is_wav AND byte_rate > 0
               THEN CAST(floor(data_size * 1000 / byte_rate) AS BIGINT)
               END AS duration_ms
        FROM m ORDER BY media_id"""
  }

  /** p46 encoding-artifact oracle: DuckDB mirror of
    * `TextOps.encodingArtifacts` over the SAME planted inputs (mojibake
    * sample / U+FFFD / C0 controls appended per doc_id mod). Generated from
    * the same [[TextOps.MojibakeSeqs]] constants; counts via literal
    * `replace` length-deltas (integer `//` division — the deltas are exact
    * multiples) and one ASCII-only RE2 class for C0 controls. */
  val EncodingArtifactsSql: String = {
    val moji = TextOps.MojibakeSeqs
      .map(s => s"((length(t) - length(replace(t, '$s', ''))) // ${s.length})")
      .mkString("(", " + ", ")")
    val sample = TextOps.MojibakeSeqs.mkString(" ")
    s"""
        WITH p AS (SELECT doc_id, CASE CAST(doc_id % 7 AS INT)
            WHEN 0 THEN text || ' $sample'
            WHEN 1 THEN text || chr(65533) || chr(65533) || 'broken'
            WHEN 2 THEN text || repeat(chr(1), 8) || 'ctrl'
            ELSE text END AS t FROM documents),
        c AS (SELECT doc_id, t,
            length(t) - length(replace(t, chr(65533), '')) AS n_rep,
            length(t) - length(regexp_replace(t,
              '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g')) AS n_ctl,
            $moji AS n_moji
          FROM p)
        SELECT doc_id,
          CAST(n_rep AS BIGINT) AS n_replacement,
          CAST(n_ctl AS BIGINT) AS n_control,
          CAST(n_moji AS BIGINT) AS n_mojibake,
          (n_rep = 0 AND n_moji = 0 AND n_ctl * 200 <= length(t)) AS looks_clean
        FROM c ORDER BY doc_id"""
  }

  // ---- p45 MP4/MP3 oracle: DuckDB mirror of MediaHeaders' ISO-BMFF box
  // walk + MPEG frame-header parse. Reads use TRY_CAST + explicit length
  // guards to reproduce BinRead's null-on-out-of-range contract exactly.

  /** Guarded unsigned BE `n`-byte read: NULL when out of range (BinRead). */
  private def hxBeG(off: String, n: Int): String =
    s"CASE WHEN ($off) >= 1 AND length(h) >= (($off)+${n - 1})*2 " +
      s"THEN TRY_CAST('0x' || substring(h, ($off)*2-1, ${n * 2}) AS BIGINT) END"

  private def boxStepSql(typeHex: String)(off: String): String = s"""
      CASE WHEN $off <= 0 THEN $off
           WHEN length(h) < (($off)+7)*2 THEN 0
           WHEN substring(h, (($off)+4)*2-1, 8) = '$typeHex' THEN -($off)
           WHEN ${hxBeG(off, 4)} < 8 THEN 0
           ELSE $off + ${hxBeG(off, 4)} END"""

  /** RIFF LIST-scan step matching LIST + form 4CC (a short form substring
    * simply fails the compare and the scan skips on, like BinRead's NULL). */
  private def riffListStepSql(off: String, formHex: String): String = s"""
      CASE WHEN $off <= 0 THEN $off
           WHEN length(h) < (($off)+7)*2 THEN 0
           WHEN substring(h, ($off)*2-1, 8) = '4C495354'
                AND substring(h, (($off)+8)*2-1, 8) = '$formHex' THEN -($off)
           ELSE $off + 8 + ${hxLe(s"($off)+4", 4)} + (${hxLe(s"($off)+4", 4)} % 2) END"""

  private def kbpsCaseSql(idx: String, ks: Seq[Int]): String =
    s"CASE ($idx) " + ks.zipWithIndex.map { case (k, i) => s"WHEN ${i + 1} THEN $k" }
      .mkString(" ") + " END"

  /** The full p45 oracle. NOTE: the fixture set contains no image formats,
    * so only AVI contributes width/height here; add image branches if image
    * fixtures ever join `avFixtures`. */
  def avHeadersSql(fixtures: Seq[(Int, String)]): String = {
    import graft.operators.MediaHeaders.{V1L1, V1L2, V1L3, V2L1, V2L23}
    val values = fixtures.map { case (id, hx) => s"($id, '$hx')" }.mkString(", ")
    val mvhdSteps = (1 to 6).map { i =>
      s"mv$i AS (SELECT media_id, h, ${boxStepSql("6D766864")("off")} AS off FROM mv${i - 1})"
    }.mkString(",\n        ")
    val listSteps = (1 to 4).map { i =>
      s"lh$i AS (SELECT media_id, h, ${riffListStepSql("off", "6864726C")} AS off FROM lh${i - 1})"
    }.mkString(",\n        ")
    val avihSteps = (1 to 4).map { i =>
      s"av$i AS (SELECT media_id, h, ${riffStepSql("off", "61766968")} AS off FROM av${i - 1})"
    }.mkString(",\n        ")
    s"""
        WITH fx(media_id, hx) AS (VALUES $values),
        b AS (SELECT media_id, upper(hx) AS h FROM fx),
        bx0 AS (SELECT media_id, h, CAST(1 AS BIGINT) AS off FROM b),
        ${(1 to 6).map { i =>
      s"bx$i AS (SELECT media_id, h, ${boxStepSql("6D6F6F76")("off")} AS off FROM bx${i - 1})"
    }.mkString(",\n        ")},
        moovf AS (SELECT media_id, CASE WHEN off < 0 THEN -off END AS moov FROM bx6),
        mv0 AS (SELECT b.media_id, h,
            CASE WHEN moov IS NOT NULL THEN moov + 8 ELSE 0 END AS off
          FROM b JOIN moovf USING (media_id)),
        $mvhdSteps,
        mvf AS (SELECT media_id, CASE WHEN off < 0 AND length(h) >= (-off+8)*2
                 THEN -off END AS m FROM mv6),
        tk0 AS (SELECT b.media_id, h,
            CASE WHEN moov IS NOT NULL THEN moov + 8 ELSE 0 END AS off
          FROM b JOIN moovf USING (media_id)),
        ${(1 to 6).map { i =>
      s"tk$i AS (SELECT media_id, h, ${boxStepSql("7472616B")("off")} AS off FROM tk${i - 1})"
    }.mkString(",\n        ")},
        tkf AS (SELECT media_id, CASE WHEN off < 0 THEN -off END AS trak FROM tk6),
        th0 AS (SELECT b.media_id, h,
            CASE WHEN trak IS NOT NULL THEN trak + 8 ELSE 0 END AS off
          FROM b JOIN tkf USING (media_id)),
        ${(1 to 6).map { i =>
      s"th$i AS (SELECT media_id, h, ${boxStepSql("746B6864")("off")} AS off FROM th${i - 1})"
    }.mkString(",\n        ")},
        thf AS (SELECT media_id, CASE WHEN off < 0 AND length(h) >= (-off+8)*2
                 THEN -off END AS t FROM th6),
        tdim AS (SELECT thf.media_id,
            CASE WHEN ${hxBeG("t+8", 1)} = 1 THEN ${hxBeG("t+96", 4)}
                 ELSE ${hxBeG("t+84", 4)} END AS wfx,
            CASE WHEN ${hxBeG("t+8", 1)} = 1 THEN ${hxBeG("t+100", 4)}
                 ELSE ${hxBeG("t+88", 4)} END AS hfx
          FROM thf JOIN b USING (media_id)),
        lh0 AS (SELECT media_id, h, CAST(13 AS BIGINT) AS off FROM b),
        $listSteps,
        lhf AS (SELECT media_id, CASE WHEN off < 0 THEN -off END AS lh FROM lh4),
        av0 AS (SELECT b.media_id, h,
            CASE WHEN lh IS NOT NULL THEN lh + 12 ELSE 0 END AS off
          FROM b JOIN lhf USING (media_id)),
        $avihSteps,
        avf AS (SELECT media_id, CASE WHEN off < 0 AND length(h) >= (-off+47)*2
                 THEN -off END AS av FROM av4),
        fr AS (SELECT media_id, h,
            CASE WHEN length(h) >= 20 AND substring(h, 1, 6) = '494433'
                 THEN 11 + ${hxBeG("7", 1)} * 2097152 + ${hxBeG("8", 1)} * 16384
                      + ${hxBeG("9", 1)} * 128 + ${hxBeG("10", 1)}
                 ELSE 1 END AS fo0 FROM b),
        frv AS (SELECT media_id, h,
            CASE WHEN ${hxBeG("fo0", 1)} = 255
                  AND ${hxBeG("fo0+1", 1)} >= 224
                 THEN fo0 END AS fo FROM fr),
        kb AS (SELECT media_id, fo,
            CASE WHEN (${hxBeG("fo+1", 1)} // 8) % 4 = 3 THEN
              CASE WHEN (${hxBeG("fo+1", 1)} // 2) % 4 = 3
                     THEN ${kbpsCaseSql(s"${hxBeG("fo+2", 1)} // 16", V1L1)}
                   WHEN (${hxBeG("fo+1", 1)} // 2) % 4 = 2
                     THEN ${kbpsCaseSql(s"${hxBeG("fo+2", 1)} // 16", V1L2)}
                   WHEN (${hxBeG("fo+1", 1)} // 2) % 4 = 1
                     THEN ${kbpsCaseSql(s"${hxBeG("fo+2", 1)} // 16", V1L3)} END
             WHEN (${hxBeG("fo+1", 1)} // 8) % 4 IN (0, 2) THEN
              CASE WHEN (${hxBeG("fo+1", 1)} // 2) % 4 = 3
                     THEN ${kbpsCaseSql(s"${hxBeG("fo+2", 1)} // 16", V2L1)}
                   WHEN (${hxBeG("fo+1", 1)} // 2) % 4 IN (1, 2)
                     THEN ${kbpsCaseSql(s"${hxBeG("fo+2", 1)} // 16", V2L23)} END
             END AS kbps FROM frv),
        m4 AS (SELECT media_id, h, m, ${hxBeG("m+8", 1)} AS ver FROM mvf JOIN b USING (media_id)),
        m4f AS (SELECT media_id, m,
            CASE WHEN ver = 1 THEN ${hxBeG("m+28", 4)} ELSE ${hxBeG("m+20", 4)} END AS ts,
            CASE WHEN ver = 1 THEN ${hxBeG("m+32", 8)} ELSE ${hxBeG("m+24", 4)} END AS dur
          FROM m4),
        og0 AS (SELECT media_id, h,
            list_max(list_filter(range(greatest(1, length(h)//2 - 65999),
                greatest(1, length(h)//2 - 2)),
              p -> substring(h, 2*p - 1, 8) = '4F676753')) AS lp,
            28 + ${hxBeG("27", 1)} AS pk FROM b),
        ogx AS (SELECT media_id,
            CASE WHEN substring(h, pk*2-1, 14) = '01766F72626973'
                   THEN ${hxLe("pk+12", 4)}
                 WHEN substring(h, pk*2-1, 16) = '4F70757348656164'
                   THEN 48000 END AS ograte,
            ${hxLe("lp+6", 7)} AS og7, ${hxBeG("lp+13", 1)} AS oghi,
            CASE WHEN substring(h, pk*2-1, 14) = '807468656F7261'
                   THEN ${hxBeG("pk+14", 3)} END AS ogw,
            CASE WHEN substring(h, pk*2-1, 14) = '807468656F7261'
                   THEN ${hxBeG("pk+17", 3)} END AS ogh
          FROM og0),
        d AS (SELECT b.media_id, h, av,
            (length(h) >= 16 AND substring(h, 9, 8) = '66747970') AS is_mp4,
            ((length(h) >= 6 AND substring(h, 1, 6) = '494433') OR
             (${hxBeG("1", 1)} = 255 AND ${hxBeG("2", 1)} >= 224)) AS is_mp3,
            (h LIKE '52494646%' AND length(h) >= 24
              AND substring(h, 17, 8) = '41564920') AS is_avi,
            CASE WHEN av IS NOT NULL THEN ${hxLe("av+8", 4)} END AS micro,
            CASE WHEN av IS NOT NULL THEN ${hxLe("av+24", 4)} END AS frames,
            ts, dur, fo, kbps, wfx, hfx, ograte, og7, oghi, ogw, ogh
          FROM b JOIN m4f USING (media_id) JOIN kb USING (media_id)
                 JOIN avf USING (media_id) JOIN tdim USING (media_id)
                 JOIN ogx USING (media_id))
        SELECT media_id,
          CASE WHEN h LIKE '89504E470D0A1A0A%' THEN 'png'
               WHEN h LIKE 'FFD8%' THEN 'jpeg'
               WHEN h LIKE '47494638%' THEN 'gif'
               WHEN h LIKE '424D%' THEN 'bmp'
               WHEN h LIKE '52494646%' AND length(h) >= 24
                    AND substring(h, 17, 8) = '57415645' THEN 'wav'
               WHEN is_avi THEN 'avi'
               WHEN h LIKE '4F676753%' THEN 'ogg'
               WHEN is_mp4 THEN 'mp4'
               WHEN is_mp3 THEN 'mp3'
               ELSE 'unknown' END AS fmt,
          CAST(CASE WHEN is_avi AND av IS NOT NULL
                 THEN ${hxLe("av+40", 4)}
               WHEN is_mp4 AND wfx > 0 THEN wfx // 65536
               WHEN h LIKE '4F676753%' THEN ogw
               END AS INTEGER) AS width,
          CAST(CASE WHEN is_avi AND av IS NOT NULL
                 THEN ${hxLe("av+44", 4)}
               WHEN is_mp4 AND hfx > 0 THEN hfx // 65536
               WHEN h LIKE '4F676753%' THEN ogh
               END AS INTEGER) AS height,
          CASE WHEN is_avi AND micro > 0 AND micro <= 10000000
                 THEN CAST(floor(frames * micro / 1000) AS BIGINT)
               WHEN is_mp4 AND ts > 0
                 THEN CAST(floor(dur * 1000 / ts) AS BIGINT)
               WHEN h LIKE '4F676753%' AND ograte > 0 AND oghi = 0
                 THEN CAST(floor(og7 * 1000 / ograte) AS BIGINT)
               WHEN is_mp3 AND kbps IS NOT NULL
                 THEN CAST(floor((length(h) // 2 - fo + 1) * 8 / kbps) AS BIGINT)
               END AS duration_ms
        FROM d ORDER BY media_id"""
  }

  /** MinHash-LSH near-dup pair generation (the p05 pipeline) as a reusable
    * CTE chain ending in `pairs(id_a, id_b, inter, uni, jaccard)` — kept in
    * lockstep with `Dedup.minhashLshPairs` (md5-derived fingerprints,
    * 64-hash universal family, 16 bands x 4 rows, exact-jaccard verify). */
  val MinhashPairsCte: String = s"""t AS (SELECT doc_id, $ToksSql AS tk FROM documents),
        sets AS MATERIALIZED (SELECT doc_id,
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
        pairs AS MATERIALIZED (SELECT id_a, id_b, inter, uni, jaccard FROM (
            SELECT id_a, id_b, inter, uni, inter / uni AS jaccard FROM verified)
          WHERE jaccard >= 0.5)"""
  // MATERIALIZED on `sets` (read three times: posts + both verify sides)
  // and `pairs` (read twice by p24's sym, then once per RECURSION ROUND of
  // its reach CTE — DuckDB re-evaluates plain CTEs at every reference, so
  // without this the whole LSH chain re-ran per round; same fix as p77's
  // oracle, measured 100+ CPU-minutes there). Values unchanged.
  /** p50/p58 BPE oracle: the `nMerges` training rounds UNROLLED as chained
    * MATERIALIZED CTEs (inlining would expand the round chain
    * exponentially). Each round mirrors [[graft.operators.Bpe.train]]
    * exactly: pair counts weighted by word-type frequency, argmax with the
    * (n DESC, a, b) tie-break, and the left-to-right NON-OVERLAPPING merge
    * fold — greedy non-overlap is relational as "within each run of
    * consecutive candidate positions, odd ROW_NUMBERs merge" (adjacent
    * candidates only occur when left==right). The `ok_r` scalars mirror the
    * minCount=2 early stop cumulatively: a failed round keeps every later
    * round's rows (and merge application) out, whatever they compute. */
  private def bpeRoundsCte(nMerges: Int): String = {
    val parts = Seq.newBuilder[String]
    parts += s"""w0f AS MATERIALIZED (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM
      (SELECT unnest($ToksSql) AS w FROM documents) WHERE len(w) > 0 GROUP BY 1),
    s_0 AS MATERIALIZED (SELECT w, freq, list_transform(range(1, len(w)+1), i -> w[i]) AS syms FROM w0f)"""
    for (r <- 0 until nMerges) {
      val ok = (0 to r).map(j => s"(SELECT n FROM top_$j) >= 2").mkString(" AND ")
      parts += s"""pc_$r AS MATERIALIZED (SELECT p.a AS a, p.b AS b, CAST(SUM(freq) AS BIGINT) AS n FROM
      (SELECT freq, unnest(list_transform(range(1, len(syms)), i -> {'a': syms[i], 'b': syms[i+1]})) AS p
       FROM s_$r WHERE len(syms) >= 2) GROUP BY 1, 2),
    top_$r AS MATERIALIZED (SELECT a, b, n FROM pc_$r ORDER BY n DESC, a, b LIMIT 1),
    ok_$r AS MATERIALIZED (SELECT ($ok) AS ok),
    pos_$r AS MATERIALIZED (SELECT w, freq, syms, unnest(range(1, len(syms)+1)) AS i FROM s_$r),
    cnd_$r AS MATERIALIZED (SELECT pos_$r.w, i FROM pos_$r, top_$r, ok_$r
      WHERE ok_$r.ok AND i < len(syms) AND syms[i] = top_$r.a AND syms[i+1] = top_$r.b),
    grp_$r AS MATERIALIZED (SELECT w, i, i - ROW_NUMBER() OVER (PARTITION BY w ORDER BY i) AS g FROM cnd_$r),
    tak_$r AS MATERIALIZED (SELECT w, i, (ROW_NUMBER() OVER (PARTITION BY w, g ORDER BY i) % 2 = 1) AS take FROM grp_$r),
    s_${r + 1} AS MATERIALIZED (SELECT p.w, p.freq,
        list(CASE WHEN COALESCE(t.take, false) THEN p.syms[p.i] || p.syms[p.i+1] ELSE p.syms[p.i] END ORDER BY p.i) AS syms
      FROM pos_$r p
      LEFT JOIN tak_$r t ON p.w = t.w AND p.i = t.i
      LEFT JOIN tak_$r tp ON p.w = tp.w AND p.i = tp.i + 1
      WHERE NOT COALESCE(tp.take, false)
      GROUP BY p.w, p.freq)"""
    }
    parts.result().mkString(",\n    ")
  }

  /** p50: the trained merge table after `nMerges` rounds. */
  def bpeMergesOracle(nMerges: Int): String = {
    val rows = (0 until nMerges).map(r =>
      s"""SELECT $r AS rank, a AS "left", b AS "right", a||b AS merged, n AS pair_count FROM top_$r WHERE (SELECT ok FROM ok_$r)""")
      .mkString("\n      UNION ALL ")
    s"""WITH ${bpeRoundsCte(nMerges)}
    SELECT CAST(rank AS INTEGER) AS rank, "left", "right", merged, pair_count
    FROM ($rows) ORDER BY rank"""
  }

  /** p75: per-SOURCE tokenizer fertility datasheet under the trained
    * merges — tokens/words per source, the corpus-sizing number every
    * tokenizer report publishes (fertility >> 1 on a domain means the
    * tokenizer fragments it and the token budget buys fewer words there).
    * Chains the same MATERIALIZED round CTEs as p50/p58; the fertility
    * ratio is ONE correctly-rounded double division of exact BIGINTs. */
  def bpeFertilityOracle(nMerges: Int): String =
    s"""WITH ${bpeRoundsCte(nMerges)},
    wp AS MATERIALIZED (SELECT w, CAST(len(syms) AS BIGINT) AS n_pieces FROM s_$nMerges),
    pdw AS MATERIALIZED (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS n FROM
      (SELECT doc_id, unnest($ToksSql) AS w FROM documents) WHERE len(w) > 0 GROUP BY 1, 2),
    enc AS MATERIALIZED (SELECT doc_id, SUM(n) AS n_words, SUM(n * n_pieces) AS n_tokens FROM pdw JOIN wp USING (w) GROUP BY 1)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(COALESCE(n_words, 0)) AS BIGINT) AS words,
      CAST(SUM(COALESCE(n_tokens, 0)) AS BIGINT) AS tokens,
      CAST(SUM(COALESCE(n_tokens, 0)) AS DOUBLE)
        / NULLIF(CAST(SUM(COALESCE(n_words, 0)) AS DOUBLE), 0) AS fertility
    FROM documents LEFT JOIN enc USING (doc_id)
    GROUP BY source ORDER BY source"""

  /** p58: per-doc word/piece counts under the trained merges — the final
    * type table s_N IS the encoded vocabulary (training and encoding share
    * the word-type set), joined back through per-doc word counts. */
  def bpeEncodeOracle(nMerges: Int): String =
    s"""WITH ${bpeRoundsCte(nMerges)},
    wp AS MATERIALIZED (SELECT w, CAST(len(syms) AS BIGINT) AS n_pieces FROM s_$nMerges),
    pdw AS MATERIALIZED (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS n FROM
      (SELECT doc_id, unnest($ToksSql) AS w FROM documents) WHERE len(w) > 0 GROUP BY 1, 2),
    enc AS MATERIALIZED (SELECT doc_id, SUM(n) AS n_words, SUM(n * n_pieces) AS n_tokens FROM pdw JOIN wp USING (w) GROUP BY 1)
    SELECT documents.doc_id, CAST(COALESCE(n_words, 0) AS BIGINT) AS n_words,
      CAST(COALESCE(n_tokens, 0) AS BIGINT) AS n_tokens
    FROM documents LEFT JOIN enc USING (doc_id) ORDER BY doc_id"""

}
