package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** REAL media container header parsers — PNG / JPEG / GIF / BMP / WAV plus
  * MP4 (ISO-BMFF) / MP3 — over opaque binary columns, replacing the stub
  * dimension fold for payloads that actually are media files (ref: erpl-web
  * treats HTTP media bodies as opaque blobs; this gives them typed
  * width/height/duration metadata without any codec library).
  *
  * Fields are read straight from the bytes with the codegen `bin_be/bin_le`
  * kernel ([[graft.functions.BinRead]]): map-only, no UDFs, no shuffle, no
  * `hex()` staging (the previous hex-string rendering held 2x the binary in
  * memory and built a much larger expression tree). The DuckDB oracles
  * replay the identical reads over the hex rendering — same integer results.
  *
  * Variable-position structures use a BOUNDED scan (8 JPEG segments, 4 RIFF
  * chunks, 6 ISO-BMFF boxes per level) expressed as an unrolled step chain.
  * The scan state is ONE integer column: positive = next offset to inspect,
  * negative = found at -offset, 0 = dead (corrupt/truncated). One-column
  * state keeps the unroll linear and engine-portable.
  *
  * Formats (all offsets 1-based byte positions):
  *  - PNG: 8-byte signature, IHDR width BE32 @17, height BE32 @21.
  *  - JPEG: segment scan from @3; SOFn (C0-C3) → height BE16 @sof+5,
  *    width BE16 @sof+7.
  *  - GIF: "GIF8" signature, width LE16 @7, height LE16 @9.
  *  - BMP: "BM", width LE32 @19, height LE32 @23 (positive-height DIBs).
  *  - WAV: "RIFF"+"WAVE", chunk scan from @13 for "fmt " (byte-rate LE32 @
  *    fmt+16) and "data" (size LE32 @data+4); duration_ms =
  *    floor(data_size · 1000 / byte_rate).
  *  - MP4: "ftyp" @5; top-level box walk ([size BE32][type 4CC]) for
  *    "moov", child walk inside for "mvhd"; v0: timescale BE32 @m+20,
  *    duration BE32 @m+24; v1: @m+28 / BE64 @m+32. duration_ms =
  *    floor(duration · 1000 / timescale). 64-bit box sizes (size==1) and
  *    size<8 kill the scan (corrupt → NULL, never garbage).
  *  - MP3: ID3v2 tag (syncsafe size @7..10) skipped, then one MPEG frame
  *    header: version (MPEG1/2/2.5) x layer (I/II/III) select the bitrate
  *    table, duration_ms = floor(payload_bytes · 8 / kbps) — the standard
  *    CBR estimate. Reserved version/layer bits → NULL.
  *  - AVI: "RIFF"+"AVI "; top-level chunk scan for LIST(hdrl), avih
  *    subchunk inside → micro-sec-per-frame/total-frames (duration) and
  *    width/height straight from the main header.
  *  - OGG: the duration clock lives at the END of the stream — the last
  *    page's granule position — so the head-anchored step chains can't
  *    reach it. The bounded BACKWARD `bin_rfind` kernel locates the final
  *    "OggS" inside a 66 KB tail window (an OGG page caps at 65307 bytes,
  *    so the window always holds the last page header); granule units come
  *    from the FIRST page's codec id header (Vorbis: its rate field;
  *    Opus: always 48 kHz). Granule is read as 7 bytes + a high-byte
  *    guard, so the -1 "no packet ends here" sentinel nulls out instead of
  *    going negative.
  */
object MediaHeaders {

  /** Unsigned big-endian `n`-byte read at 1-based byte offset (NULL when out
    * of range — see BinRead's contract; that NULL is the truncation guard). */
  private def be(b: Column, off: Column, n: Int): Column =
    call_function("bin_be", b, off, lit(n))

  private def le(b: Column, off: Column, n: Int): Column =
    call_function("bin_le", b, off, lit(n))

  /** One JPEG segment-scan step over state `off` (see scan-state contract
    * in the object doc). SOF0-SOF3 markers carry the frame dimensions. */
  private def jpegStep(b: Column, off: Column): Column =
    when(off <= 0, off)
      .when(be(b, off, 4).isNull, lit(0L))
      .when(be(b, off, 1) =!= 0xFF, lit(0L))
      .when(be(b, off + 1, 1).between(0xC0, 0xC3), -off)
      .otherwise(off + 2 + be(b, off + 2, 2))

  /** One RIFF chunk-scan step looking for the 4CC whose BE32 value is
    * `idBe`; chunks are 8-byte header + payload padded to even length. */
  private def riffStep(b: Column, off: Column, idBe: Long): Column =
    when(off <= 0, off)
      .when(be(b, off, 8).isNull, lit(0L))
      .when(be(b, off, 4) === idBe, -off)
      .otherwise(off + 8 + le(b, off + 4, 4) + pmod(le(b, off + 4, 4), lit(2L)))

  /** One RIFF LIST-scan step matching a LIST chunk with form type `formBe`
    * (a too-short form read compares NULL -> falls through to the skip). */
  private def riffListStep(b: Column, off: Column, formBe: Long): Column =
    when(off <= 0, off)
      .when(be(b, off, 8).isNull, lit(0L))
      .when(be(b, off, 4) === List4cc && be(b, off + 8, 4) === formBe, -off)
      .otherwise(off + 8 + le(b, off + 4, 4) + pmod(le(b, off + 4, 4), lit(2L)))

  /** One ISO-BMFF box-walk step looking for box type `typeBe`
    * ([size BE32][type 4CC] headers; size 0/1/<8 = unwalkable → dead). */
  private def boxStep(b: Column, off: Column, typeBe: Long): Column =
    when(off <= 0, off)
      .when(be(b, off, 8).isNull, lit(0L))
      .when(be(b, off + 4, 4) === typeBe, -off)
      .when(be(b, off, 4) < 8, lit(0L))
      .otherwise(off + be(b, off, 4))

  /** Unrolled scan chain. Each step's state is staged through [[bindOnce]]
    * so the next step sees a lambda VALUE, not the previous step's expression
    * tree — a step references its state ~6×, so inlining would grow the tree
    * 6^steps (observed: OOM at analysis time); binding keeps it linear. */
  private def chain(b: Column, init: Column, steps: Int,
                    step: (Column, Column) => Column): Column =
    (0 until steps).foldLeft(init)((acc, _) => bindOnce(acc)(step(b, _)))

  private val JpegScanSteps = 8
  private val RiffScanSteps = 4
  private val BoxScanSteps = 6

  private val Moov = 0x6D6F6F76L // "moov"
  private val Mvhd = 0x6D766864L // "mvhd"
  private val Trak = 0x7472616BL // "trak"
  private val Tkhd = 0x746B6864L // "tkhd"
  private val List4cc = 0x4C495354L // "LIST"
  private val Hdrl = 0x6864726CL // "hdrl"
  private val Avih = 0x61766968L // "avih"

  // MPEG bitrate tables (kbps) by version x layer, index 1..14 (index 0 =
  // free-format, 15 = bad — both refuse to NULL). MPEG2 and MPEG2.5 share
  // tables, and Layer II/III merge in the v2 family (ISO/IEC 11172-3 /
  // 13818-3 annex tables).
  private[graft] val V1L1 = Seq(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private[graft] val V1L2 = Seq(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private[graft] val V1L3 = Seq(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private[graft] val V2L1 = Seq(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private[graft] val V2L23 = Seq(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  private def kbpsTable(idx: Column, ks: Seq[Int]): Column =
    ks.zipWithIndex.tail.foldLeft(when(idx === 1, lit(ks.head.toLong))) {
      case (acc, (k, i)) => acc.when(idx === (i + 1), lit(k.toLong))
    }

  /** Parsed header struct (fmt, width, height, duration_ms) from a binary
    * content column. Unknown/truncated payloads → fmt 'unknown' / NULLs. */
  def parseHeader(content: Column): Column = bindOnce(content) { b =>
    val isPng = be(b, lit(1L), 4) === 0x89504E47L && be(b, lit(5L), 4) === 0x0D0A1A0AL
    val isJpeg = be(b, lit(1L), 2) === 0xFFD8L
    val isGif = be(b, lit(1L), 4) === 0x47494638L
    val isBmp = be(b, lit(1L), 2) === 0x424DL
    val isWav = be(b, lit(1L), 4) === 0x52494646L && be(b, lit(9L), 4) === 0x57415645L
    val isAvi = be(b, lit(1L), 4) === 0x52494646L && be(b, lit(9L), 4) === 0x41564920L
    val isOgg = be(b, lit(1L), 4) === 0x4F676753L // "OggS" capture pattern
    val isMp4 = be(b, lit(5L), 4) === 0x66747970L // "ftyp" after the size word
    // frame sync (FFE) or an ID3v2 container
    val isMp3 = be(b, lit(1L), 3) === 0x494433L ||
      (be(b, lit(1L), 1) === 0xFFL && be(b, lit(2L), 1).bitwiseAND(0xE0) === 0xE0L)

    // when() skips NULL conditions (truncated reads) exactly like false — a
    // payload too short for any signature lands on 'unknown'
    val fmt = when(isPng, "png").when(isJpeg, "jpeg").when(isGif, "gif")
      .when(isBmp, "bmp").when(isWav, "wav").when(isAvi, "avi")
      .when(isOgg, "ogg").when(isMp4, "mp4")
      .when(isMp3, "mp3").otherwise("unknown")

    // JPEG: bounded segment scan; -st = SOF marker offset when found, and
    // the whole 9-byte SOF head must be readable
    val jpegSof = bindOnce(chain(b, lit(3L), JpegScanSteps, jpegStep)) { st =>
      when(st < 0 && be(b, -st + 8, 1).isNotNull, -st)
    }
    // WAV: independent bounded chunk scans for "fmt " and "data"
    val wavFmt = bindOnce(chain(b, lit(13L), RiffScanSteps,
      riffStep(_, _, 0x666D7420L))) { st =>
      when(st < 0 && be(b, -st + 19, 1).isNotNull, -st)
    }
    val wavData = bindOnce(chain(b, lit(13L), RiffScanSteps,
      riffStep(_, _, 0x64617461L))) { st =>
      when(st < 0 && be(b, -st + 7, 1).isNotNull, -st)
    }
    // MP4: top-level walk for moov, then child walk inside for mvhd
    val mvhdOff = bindOnce(chain(b, lit(1L), BoxScanSteps,
      boxStep(_, _, Moov))) { moovSt =>
      bindOnce(chain(b, when(moovSt < 0, -moovSt + 8).otherwise(lit(0L)),
        BoxScanSteps, boxStep(_, _, Mvhd))) { st =>
        when(st < 0 && be(b, -st + 8, 1).isNotNull, -st)
      }
    }
    // MP4 video dims: moov → FIRST trak → tkhd; width/height are 16.16
    // fixed point at tkhd body offset 76/80 (v0) or 88/92 (v1). Audio
    // tracks carry zeros there — gated to NULL below. (Only the first trak
    // is inspected: a nested per-trak scan would square the tree; real
    // muxers put the video track first.)
    val tkhdOff = bindOnce(chain(b, lit(1L), BoxScanSteps,
      boxStep(_, _, Moov))) { moovSt =>
      bindOnce(chain(b, when(moovSt < 0, -moovSt + 8).otherwise(lit(0L)),
        BoxScanSteps, boxStep(_, _, Trak))) { trakSt =>
        bindOnce(chain(b, when(trakSt < 0, -trakSt + 8).otherwise(lit(0L)),
          BoxScanSteps, boxStep(_, _, Tkhd))) { st =>
          when(st < 0 && be(b, -st + 8, 1).isNotNull, -st)
        }
      }
    }
    val mp4W = bindOnce(tkhdOff) { t =>
      bindOnce(when(be(b, t + 8, 1) === 1, be(b, t + 96, 4))
        .otherwise(be(b, t + 84, 4))) { fx =>
        when(isMp4 && fx > 0, floor(fx / 65536).cast("long"))
      }
    }
    val mp4H = bindOnce(tkhdOff) { t =>
      bindOnce(when(be(b, t + 8, 1) === 1, be(b, t + 100, 4))
        .otherwise(be(b, t + 88, 4))) { fx =>
        when(isMp4 && fx > 0, floor(fx / 65536).cast("long"))
      }
    }
    // AVI: top-level scan for LIST(hdrl), then avih subchunk inside; the
    // avih body carries dwMicroSecPerFrame / dwTotalFrames / dwWidth /
    // dwHeight (fields 1, 5, 9, 10 of the 14-DWORD main header)
    val avihOff = bindOnce(chain(b, lit(13L), RiffScanSteps,
      riffListStep(_, _, Hdrl))) { ls =>
      bindOnce(chain(b, when(ls < 0, -ls + 12).otherwise(lit(0L)),
        RiffScanSteps, riffStep(_, _, Avih))) { st =>
        when(st < 0 && be(b, -st + 47, 1).isNotNull, -st) // body through height
      }
    }
    // OGG Theora video: picture dims are BE24 at id-packet offsets 14/17
    // (\x80"theora" VMAJ VMIN VREV FMBW16 FMBH16 PICW24 PICH24). Duration
    // stays NULL — Theora granules encode keyframe state, not a clock.
    val oggW = bindOnce(lit(28L) + be(b, lit(27L), 1)) { pk =>
      when(isOgg && be(b, pk, 7) === 0x807468656F7261L, be(b, pk + 14, 3))
    }
    val oggH = bindOnce(lit(28L) + be(b, lit(27L), 1)) { pk =>
      when(isOgg && be(b, pk, 7) === 0x807468656F7261L, be(b, pk + 17, 3))
    }
    val width =
      when(isPng, be(b, lit(17L), 4))
        .when(isJpeg, be(b, jpegSof + 7, 2))
        .when(isGif, le(b, lit(7L), 2))
        .when(isBmp, le(b, lit(19L), 4))
        .when(isAvi, le(b, avihOff + 40, 4))
        .when(isMp4, mp4W)
        .when(isOgg, oggW)
    val height =
      when(isPng, be(b, lit(21L), 4))
        .when(isJpeg, be(b, jpegSof + 5, 2))
        .when(isGif, le(b, lit(9L), 2))
        .when(isBmp, le(b, lit(23L), 4))
        .when(isAvi, le(b, avihOff + 44, 4))
        .when(isMp4, mp4H)
        .when(isOgg, oggH)
    // WAV duration: data bytes over byte-rate (both from the chunk scan);
    // guard the zero byte-rate a corrupt fmt chunk would produce
    val wavMs = bindOnce(le(b, wavFmt + 16, 4)) { byteRate =>
      when(isWav && byteRate > 0,
        floor(le(b, wavData + 4, 4) * 1000 / byteRate).cast("long"))
    }
    // MP4 duration: mvhd v0/v1 timescale + duration (mvhd offset bound once —
    // its value feeds five reads, and its tree is the double box walk)
    val mp4Ms = bindOnce(mvhdOff) { m =>
      bindOnce(be(b, m + 8, 1)) { ver =>
        bindOnce(when(ver === 1, be(b, m + 28, 4)).otherwise(be(b, m + 20, 4))) { ts =>
          bindOnce(when(ver === 1, be(b, m + 32, 8)).otherwise(be(b, m + 24, 4))) { dur =>
            when(isMp4 && ts > 0, floor(dur * 1000 / ts).cast("long"))
          }
        }
      }
    }
    // AVI duration: dwTotalFrames x dwMicroSecPerFrame; the micro-per-frame
    // sanity cap (10 s/frame) also keeps the long product within double
    // precision for any real frame count
    val aviMs = bindOnce(avihOff) { a =>
      bindOnce(le(b, a + 8, 4)) { micro =>
        when(isAvi && micro > 0 && micro <= 10000000L,
          floor(le(b, a + 24, 4) * micro / 1000).cast("long"))
      }
    }
    // OGG: granule-per-second from the first page's codec id packet
    // (packet starts after the 27-byte page header + segment table), last
    // page located backwards with bin_rfind; see the format note above
    val oggMs = bindOnce(lit(28L) + be(b, lit(27L), 1)) { pk =>
      bindOnce(
        when(be(b, pk, 7) === 0x01766F72626973L, le(b, pk + 12, 4)) // "\x01vorbis"
          .when(be(b, pk, 8) === 0x4F70757348656164L, lit(48000L))) { rate => // "OpusHead"
        bindOnce(call_function("bin_rfind", b, lit(0x4F676753L), lit(4), lit(66000))) { lp =>
          when(isOgg && rate > 0 && le(b, lp + 13, 1) === 0,
            floor(le(b, lp + 6, 7) * 1000 / rate).cast("long"))
        }
      }
    }
    // MP3: first audio frame sits after an optional ID3v2 tag (syncsafe
    // size); duration is the standard CBR estimate over the frame bytes.
    // Full version/layer coverage: MPEG1/2/2.5 x Layer I/II/III bitrate
    // tables; reserved version (01) or layer (00) bits refuse -> NULL.
    val mp3Ms = bindOnce(
      when(be(b, lit(1L), 3) === 0x494433L,
        lit(11L) + be(b, lit(7L), 1) * 2097152L + be(b, lit(8L), 1) * 16384L +
          be(b, lit(9L), 1) * 128L + be(b, lit(10L), 1))
        .otherwise(lit(1L))) { off =>
      bindOnce(when(be(b, off, 1) === 0xFFL &&
        be(b, off + 1, 1).bitwiseAND(0xE0) === 0xE0L, off)) { fo =>
        bindOnce(floor(be(b, fo + 1, 1) / 8).cast("long").bitwiseAND(3L)) { ver =>
          bindOnce(floor(be(b, fo + 1, 1) / 2).cast("long").bitwiseAND(3L)) { layer =>
            bindOnce(floor(be(b, fo + 2, 1) / 16).cast("long")) { idx =>
              // ver: 0=MPEG2.5, 1=reserved, 2=MPEG2, 3=MPEG1; layer:
              // 0=reserved, 1=III, 2=II, 3=I — reserved rows yield NULL kbps
              bindOnce(
                when(ver === 3,
                  when(layer === 3, kbpsTable(idx, V1L1))
                    .when(layer === 2, kbpsTable(idx, V1L2))
                    .when(layer === 1, kbpsTable(idx, V1L3)))
                  .when(ver === 2 || ver === 0,
                    when(layer === 3, kbpsTable(idx, V2L1))
                      .when(layer === 2 || layer === 1, kbpsTable(idx, V2L23)))) { kbps =>
                when(isMp3 && kbps.isNotNull,
                  floor((length(b).cast("long") - fo + 1) * 8 / kbps).cast("long"))
              }
            }
          }
        }
      }
    }

    struct(
      fmt.as("fmt"),
      width.cast("int").as("width"),
      height.cast("int").as("height"),
      coalesce(wavMs, aviMs, mp4Ms, oggMs, mp3Ms).as("duration_ms"))
  }

  /** Deterministic on-disk-format fixtures (hex) used by the p41 gate query
    * and `MediaHeadersSpec` — handcrafted canonical headers, one per format
    * plus adversarial cases (chunk indirection, truncation, non-media).
    * Expected parse results are in the spec. */
  val fixtures: Seq[(Int, String)] = Seq(
    // 1: PNG 640x480 (sig + IHDR + dummy CRC)
    1 -> ("89504E470D0A1A0A" + "0000000D" + "49484452" +
      "00000280" + "000001E0" + "0806000000" + "D3B4C2A1"),
    // 2: JPEG 1024x768 — SOI, APP0(JFIF), DQT stub, SOF0, EOI: the SOF sits
    //    behind two skippable segments, exercising the scan
    2 -> ("FFD8" + "FFE000104A46494600010100004800480000" +
      "FFDB0005010203" +
      "FFC00011" + "08" + "0300" + "0400" + "03" + "011100" + "021101" + "031101" +
      "FFD9"),
    // 3: GIF89a 320x200
    3 -> ("474946383961" + "4001" + "C800" + "0000003B"),
    // 4: WAV pcm mono 8kHz 16-bit, 32000 data bytes -> 2000 ms
    4 -> ("52494646" + "247D0000" + "57415645" + "666D7420" + "10000000" +
      "0100" + "0100" + "401F0000" + "803E0000" + "0200" + "1000" +
      "64617461" + "007D0000"),
    // 5: WAV with a LIST chunk BEFORE fmt/data (scan must skip it);
    //    stereo 48kHz 16-bit (byte rate 192000), 320000 data bytes -> 1666 ms
    5 -> ("52494646" + "00000000" + "57415645" +
      "4C495354" + "04000000" + "494E464F" +
      "666D7420" + "10000000" + "0100" + "0200" + "80BB0000" + "00EE0200" +
      "0400" + "1000" + "64617461" + "00E20400"),
    // 6: BMP 800x600 (BITMAPINFOHEADER)
    6 -> ("424D" + "00000000" + "00000000" + "36000000" + "28000000" +
      "20030000" + "58020000" + "01001800"),
    // 7: truncated PNG (signature only) -> png, NULL dims
    7 -> "89504E470D0A1A0A",
    // 8: not a media file ("not a media file" UTF-8) -> unknown
    8 -> "6E6F742061206D656469612066696C65",
    // 9: JPEG with a corrupt segment chain (second marker not FF-led) ->
    //    jpeg, NULL dims (scan dies instead of reading garbage)
    9 -> ("FFD8" + "FFE00004AABB" + "00C00011DEAD"))

  /** mvhd box body (hex), full 100/112-byte layout with zeroed rate/volume/
    * matrix/next-track fields — real-format bytes, not a truncated stub. */
  private def mvhdHex(version: Int, timescale: Long, duration: Long): String = {
    def be32(v: Long) = f"$v%08X"
    def be64(v: Long) = f"$v%016X"
    val body =
      if (version == 0) "00" + "000000" + be32(0) + be32(0) + be32(timescale) + be32(duration)
      else "01" + "000000" + be64(0) + be64(0) + be32(timescale) + be64(duration)
    val tail = "00010000" + "0100" + "0000" + "00" * 8 +
      ("00000001" + "00000000" * 2 + "00000000" + "00000001" + "00000000" +
        "00000000" + "00000000" + "40000000") + "00000000" * 6 + "00000002"
    val full = body + tail
    be32(8 + full.length / 2) + "6D766864" + full
  }

  private def box(tpe: String, bodyHex: String): String =
    f"${8 + bodyHex.length / 2}%08X" + tpe.getBytes("ASCII").map(b => f"$b%02X").mkString + bodyHex

  /** tkhd box (hex), full v0 (84-byte) / v1 (96-byte) body layout; width
    * and height are 16.16 fixed point in the last two DWORDs. */
  private def tkhdHex(version: Int, w: Long, h: Long): String = {
    def be32(v: Long) = f"$v%08X"
    def be64(v: Long) = f"$v%016X"
    val times =
      if (version == 0) "00" + "000000" + be32(0) + be32(0) + be32(1) + be32(0) + be32(0)
      else "01" + "000000" + be64(0) + be64(0) + be32(1) + be32(0) + be64(0)
    val body = times + be32(0) * 2 /* reserved */ +
      "0000" + "0000" + "0000" + "0000" /* layer/alt/volume/reserved */ +
      ("00010000" + "00000000" * 2 + "00000000" + "00010000" + "00000000" +
        "00000000" + "00000000" + "40000000") /* identity matrix */ +
      be32(w << 16) + be32(h << 16)
    box("tkhd", body) // a complete child box; caller wraps it in box("trak", ...)
  }

  /** MP4/MP3 fixtures for the p45 gate query: real container layouts plus
    * truncated/corrupt cases. */
  val avFixtures: Seq[(Int, String)] = {
    val ftyp = box("ftyp", "69736F6D" + "00000200" + "69736F6D" + "6D703431")
    Seq(
      // 1: minimal mp4 — ftyp + moov(mvhd v0): timescale 600, dur 3000 -> 5000 ms
      1 -> (ftyp + box("moov", mvhdHex(0, 600L, 3000L))),
      // 2: mp4 with 64-bit mvhd (v1): timescale 90000, dur 450000 -> 5000 ms
      2 -> (ftyp + box("moov", mvhdHex(1, 90000L, 450000L))),
      // 3: mp4 with a free box before moov, and a udta box before mvhd
      //    inside it (both walks must skip): timescale 1000, dur 2500 -> 2500 ms
      3 -> (ftyp + box("free", "00" * 12) +
        box("moov", box("udta", "00" * 4) + mvhdHex(0, 1000L, 2500L))),
      // 4: bare mp3 — MPEG1 Layer III 128 kbps 44.1 kHz, 1600 bytes -> 100 ms
      4 -> ("FFFB9000" + "00" * 1596),
      // 5: mp3 behind an ID3v2 tag (10-byte tag payload, syncsafe size):
      //    800 audio bytes at 128 kbps -> 50 ms
      5 -> ("494433" + "0400" + "00" + "0000000A" + "00" * 10 +
        "FFFB9000" + "00" * 796),
      // 6: truncated mp4 (ftyp only) -> mp4, NULL duration
      6 -> ftyp,
      // 7: MPEG2.5 Layer III (FFE2), idx 1 -> 8 kbps; 64 bytes -> 64 ms
      7 -> ("FFE21000" + "00" * 60),
      // 8: mp4 with corrupt box chain inside moov (child size 0) -> mp4,
      //    NULL duration (walk dies)
      8 -> (ftyp + box("moov", "00000000" + "75647461" + "00" * 8)),
      // 9: not a media file -> unknown
      9 -> "6E6F7468696E6720746F207365652068657265",
      // 10: MPEG2 Layer III (FFF3), idx 9 -> 80 kbps; 1200 bytes -> 120 ms
      10 -> ("FFF39000" + "00" * 1196),
      // 11: MPEG1 Layer II (FFFD), idx 8 -> 128 kbps; 1600 bytes -> 100 ms
      11 -> ("FFFD8000" + "00" * 1596),
      // 12: MPEG1 Layer I (FFFF), idx 4 -> 128 kbps; 3200 bytes -> 200 ms
      12 -> ("FFFF4000" + "00" * 3196),
      // 13: reserved VERSION bits (FFEB: ver 01) -> mp3, NULL duration
      13 -> ("FFEB9000" + "00" * 60),
      // 14: reserved LAYER bits (FFF1: layer 00) -> mp3, NULL duration
      14 -> ("FFF19000" + "00" * 60),
      // 15: AVI 640x480, 300 frames @ 33333 us/frame -> 9999 ms
      15 -> aviHex(33333L, 300L, 640L, 480L, junk = false),
      // 16: AVI with an odd-sized JUNK chunk before LIST(hdrl): the scan
      //     must skip it WITH the even-padding byte
      16 -> aviHex(33333L, 300L, 640L, 480L, junk = true),
      // 17: OGG page header -> fmt only (duration needs the last page)
      17 -> ("4F676753" + "0002" + "00" * 20),
      // 18: truncated AVI (RIFF+form only) -> avi, NULLs
      18 -> ("52494646" + "00000000" + "41564920"),
      // 19: mp4 with a VIDEO trak (tkhd v0, 1920x1080 as 16.16 fixed
      //     point) after mvhd: dims + duration both parse
      19 -> (ftyp + box("moov", mvhdHex(0, 600L, 3000L) +
        box("trak", tkhdHex(0, 1920L, 1080L)))),
      // 20: mp4 whose first trak is AUDIO (tkhd dims zero) -> duration
      //     parses, dims NULL (zeros gate to NULL, never 0x0)
      20 -> (ftyp + box("moov", mvhdHex(1, 90000L, 450000L) +
        box("trak", tkhdHex(1, 0L, 0L)))),
      // 21: OGG Vorbis, 2 pages: id header declares 44100 Hz, the EOS
      //     page's granule 441000 samples -> 10000 ms (tail-scan parse)
      21 -> (oggPage(0x02, 0L, vorbisIdHex(44100L)) +
        oggPage(0x04, 441000L, "00" * 10)),
      // 22: OGG Opus (granule always 48 kHz): EOS granule 96000 -> 2000 ms
      22 -> (oggPage(0x02, 0L, OpusHeadHex) +
        oggPage(0x04, 96000L, "00" * 10)),
      // 23: single OGG page with granule -1 ("no packet ends here"):
      //     the high-byte guard refuses -> ogg, NULL duration
      23 -> oggPage(0x02, -1L, vorbisIdHex(44100L)),
      // 24: OGG Theora video 1280x720 — picture dims from the BOS id
      //     packet; duration NULL (Theora granules are not a clock)
      24 -> oggPage(0x02, 0L, TheoraIdHex))
  }

  private def le32(v: Long): String =
    (0 until 4).map(i => f"${(v >> (8 * i)) & 0xFF}%02X").mkString
  private def le16(v: Long): String =
    (0 until 2).map(i => f"${(v >> (8 * i)) & 0xFF}%02X").mkString
  private def le64(v: Long): String =
    (0 until 8).map(i => f"${(v >> (8 * i)) & 0xFF}%02X").mkString

  /** One OGG page (hex): version 0, header-type flags, LE64 granule, fixed
    * serial/sequence, zero CRC (these parsers never verify CRCs), single
    * segment holding the whole payload (≤ 255 bytes). */
  private def oggPage(htype: Int, granule: Long, payloadHex: String): String =
    "4F676753" + "00" + f"$htype%02X" + le64(granule) + le32(1L) + le32(0L) +
      le32(0L) + "01" + f"${payloadHex.length / 2}%02X" + payloadHex

  /** Vorbis identification header packet (hex): \x01"vorbis", version 0,
    * 2 channels, the given rate, zero bitrates, blocksizes, framing bit. */
  private def vorbisIdHex(rate: Long): String =
    "01" + "766F72626973" + le32(0L) + "02" + le32(rate) +
      le32(0L) * 3 + "B8" + "01"

  /** OpusHead packet (hex): version 1, 2 channels, preskip 312, input rate
    * 48000 (informational — granule units are ALWAYS 48 kHz for Opus). */
  private def OpusHeadHex: String =
    "4F70757348656164" + "01" + "02" + le16(312L) + le32(48000L) + le16(0L) + "00"

  /** Theora identification header (hex) through the picture dims:
    * \x80"theora", version 3.2.1, 80x45 macroblocks, 1280x720 picture. */
  private def TheoraIdHex: String = {
    def be16(v: Long) = f"$v%04X"
    def be24(v: Long) = f"$v%06X"
    "80" + "7468656F7261" + "03" + "02" + "01" +
      be16(80L) + be16(45L) + be24(1280L) + be24(720L)
  }
  private def fourcc(s: String): String =
    s.getBytes("ASCII").map(c => f"$c%02X").mkString
  private def riffChunk(id: String, bodyHex: String): String =
    fourcc(id) + le32(bodyHex.length / 2) + bodyHex +
      (if ((bodyHex.length / 2) % 2 == 1) "00" else "") // even padding

  /** Minimal real-layout AVI: RIFF("AVI ") + optional JUNK + LIST(hdrl)
    * holding a full 56-byte avih main header. */
  private def aviHex(micro: Long, frames: Long, w: Long, h: Long, junk: Boolean): String = {
    val avihBody = le32(micro) + le32(0) * 3 + le32(frames) +
      le32(0) + le32(1) + le32(0) + le32(w) + le32(h) + le32(0) * 4
    val hdrl = fourcc("LIST") + le32(4 + 8 + avihBody.length / 2) + fourcc("hdrl") +
      riffChunk("avih", avihBody)
    val pre = if (junk) riffChunk("JUNK", "00" * 5) else ""
    fourcc("RIFF") + le32(0) + fourcc("AVI ") + pre + hdrl
  }
}
