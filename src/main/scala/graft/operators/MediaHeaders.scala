package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** REAL media container header parsers — PNG / JPEG / GIF / BMP / WAV — over
  * opaque binary columns, replacing the stub dimension fold for payloads that
  * actually are media files (ref: erpl-web treats HTTP media bodies as opaque
  * blobs; this gives them typed width/height/duration metadata without any
  * codec library).
  *
  * Everything is built from codegen'd scalar built-ins over the HEX rendering
  * of the bytes (`hex(content)` then fixed-offset / scanned `substring`s) —
  * map-only, no UDFs, no shuffle, and byte-for-byte reproducible in DuckDB
  * SQL, which has no BLOB slicing but identical hex-string functions (the
  * p41 oracle mirrors every step).
  *
  * Variable-position structures use a BOUNDED scan (8 JPEG segments, 4 RIFF
  * chunks) expressed as an unrolled step chain. The scan state is ONE integer
  * column: positive = next offset to inspect, negative = found at -offset,
  * 0 = dead (corrupt/truncated). One-column state keeps the unroll linear
  * and engine-portable (no struct fold; DuckDB 1.0's list_reduce takes no
  * initial value).
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
  */
object MediaHeaders {

  /** hex-pair count guard: field at byte `off`, `n` bytes wide is readable. */
  private def canRead(h: Column, off: Column, n: Int): Column =
    length(h) >= (off + (n - 1)) * 2

  private def canRead(h: Column, off: Int, n: Int): Column =
    length(h) >= lit((off + (n - 1)) * 2)

  /** Unsigned big-endian integer of `n` bytes at 1-based byte offset. */
  private def be(h: Column, off: Column, n: Int): Column =
    conv(h.substr(off * 2 - 1, lit(n * 2)), 16, 10).cast("long")

  /** Unsigned little-endian integer of `n` bytes at 1-based byte offset. */
  private def le(h: Column, off: Column, n: Int): Column =
    (0 until n).map(i => be(h, off + i, 1) * (1L << (8 * i)): Column)
      .reduce(_ + _)

  private def bytesAt(h: Column, off: Column, n: Int): Column =
    h.substr(off * 2 - 1, lit(n * 2))

  /** One JPEG segment-scan step over state `off` (see scan-state contract
    * in the object doc). SOF0-SOF3 markers carry the frame dimensions. */
  private def jpegStep(h: Column, off: Column): Column =
    when(off <= 0, off)
      .when(!canRead(h, off, 4), lit(0L))
      .when(bytesAt(h, off, 1) =!= "FF", lit(0L))
      .when(bytesAt(h, off + 1, 1).isin("C0", "C1", "C2", "C3"), -off)
      .otherwise(off + 2 + be(h, off + 2, 2))

  /** One RIFF chunk-scan step looking for the chunk id whose hex is
    * `idHex`; chunks are 8-byte header + payload padded to even length. */
  private def riffStep(h: Column, off: Column, idHex: String): Column =
    when(off <= 0, off)
      .when(!canRead(h, off, 8), lit(0L))
      .when(bytesAt(h, off, 4) === idHex, -off)
      .otherwise(off + 8 + le(h, off + 4, 4) + pmod(le(h, off + 4, 4), lit(2L)))

  /** Unrolled scan chain. Each step's state is staged through [[bindOnce]]
    * so the next step sees a lambda VALUE, not the previous step's expression
    * tree — a step references its state ~6×, so inlining would grow the tree
    * 6^steps (observed: OOM at analysis time); binding keeps it linear. */
  private def chain(h: Column, init: Column, steps: Int,
                    step: (Column, Column) => Column): Column =
    (0 until steps).foldLeft(init)((acc, _) => bindOnce(acc)(step(h, _)))

  private val JpegScanSteps = 8
  private val RiffScanSteps = 4

  /** Parsed header struct (fmt, width, height, duration_ms) from a binary
    * content column. Unknown/truncated payloads → fmt 'unknown' / NULLs. */
  def parseHeader(content: Column): Column = bindOnce(hex(content)) { h =>
    val isPng = h.startsWith("89504E470D0A1A0A")
    val isJpeg = h.startsWith("FFD8")
    val isGif = h.startsWith("47494638")
    val isBmp = h.startsWith("424D")
    val isWav = h.startsWith("52494646") &&
      when(canRead(h, 9, 4), bytesAt(h, lit(9L), 4) === "57415645")
        .otherwise(lit(false))

    val fmt = when(isPng, "png").when(isJpeg, "jpeg").when(isGif, "gif")
      .when(isBmp, "bmp").when(isWav, "wav").otherwise("unknown")

    // JPEG: bounded segment scan; -st = SOF marker offset when found
    val jpegSof = bindOnce(chain(h, lit(3L), JpegScanSteps, jpegStep)) { st =>
      when(st < 0 && canRead(h, -st, 9), -st)
    }
    // WAV: independent bounded chunk scans for "fmt " and "data"
    val wavFmt = bindOnce(chain(h, lit(13L), RiffScanSteps,
      riffStep(_, _, "666D7420"))) { st =>
      when(st < 0 && canRead(h, -st, 20), -st)
    }
    val wavData = bindOnce(chain(h, lit(13L), RiffScanSteps,
      riffStep(_, _, "64617461"))) { st =>
      when(st < 0 && canRead(h, -st, 8), -st)
    }

    val width =
      when(isPng && canRead(h, 17, 4), be(h, lit(17L), 4))
        .when(isJpeg, be(h, jpegSof + 7, 2))
        .when(isGif && canRead(h, 7, 2), le(h, lit(7L), 2))
        .when(isBmp && canRead(h, 19, 4), le(h, lit(19L), 4))
    val height =
      when(isPng && canRead(h, 21, 4), be(h, lit(21L), 4))
        .when(isJpeg, be(h, jpegSof + 5, 2))
        .when(isGif && canRead(h, 9, 2), le(h, lit(9L), 2))
        .when(isBmp && canRead(h, 23, 4), le(h, lit(23L), 4))
    // duration: data bytes over byte-rate (both from the chunk scan); guard
    // the zero byte-rate a corrupt fmt chunk would produce
    val durationMs = bindOnce(le(h, wavFmt + 16, 4)) { byteRate =>
      when(isWav && byteRate > 0,
        floor(le(h, wavData + 4, 4) * 1000 / byteRate).cast("long"))
    }

    struct(
      fmt.as("fmt"),
      width.cast("int").as("width"),
      height.cast("int").as("height"),
      durationMs.as("duration_ms"))
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
}
