package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Real container-header parsing over the handcrafted format fixtures —
  * expected values are the ones a real decoder would report (PNG/JPEG/GIF/
  * BMP dims, WAV duration from byte rate), asserted explicitly here in
  * addition to the p41 oracle hash gate. */
class MediaHeadersSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val parsed: Map[Int, (String, Option[Int], Option[Int], Option[Long])] =
    MediaHeaders.fixtures.toDF("media_id", "hx")
      .withColumn("content", unhex(col("hx")))
      .select(col("media_id"), MediaHeaders.parseHeader(col("content")).as("hd"))
      .select("media_id", "hd.fmt", "hd.width", "hd.height", "hd.duration_ms")
      .collect()
      .map { r =>
        r.getInt(0) -> ((r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getInt(2)),
          if (r.isNullAt(3)) None else Some(r.getInt(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))
      }.toMap

  test("PNG / GIF / BMP fixed-offset dimensions") {
    assert(parsed(1) == (("png", Some(640), Some(480), None)))
    assert(parsed(3) == (("gif", Some(320), Some(200), None)))
    assert(parsed(6) == (("bmp", Some(800), Some(600), None)))
  }

  test("JPEG: SOF found behind skippable segments; corrupt chain dies to NULL") {
    assert(parsed(2) == (("jpeg", Some(1024), Some(768), None)))
    assert(parsed(9) == (("jpeg", None, None, None)))
  }

  test("WAV: duration from byte rate; LIST chunk before fmt/data is skipped") {
    assert(parsed(4) == (("wav", None, None, Some(2000L))))
    // 320000 bytes at 192000 B/s -> 1666.67 ms, floored
    assert(parsed(5) == (("wav", None, None, Some(1666L))))
  }

  test("truncated and non-media payloads degrade to NULLs, never error") {
    assert(parsed(7) == (("png", None, None, None)))
    assert(parsed(8) == (("unknown", None, None, None)))
  }

  private lazy val parsedAv: Map[Int, (String, Option[Int], Option[Int], Option[Long])] =
    MediaHeaders.avFixtures.toDF("media_id", "hx")
      .withColumn("content", unhex(col("hx")))
      .select(col("media_id"), MediaHeaders.parseHeader(col("content")).as("hd"))
      .select("media_id", "hd.fmt", "hd.width", "hd.height", "hd.duration_ms")
      .collect()
      .map { r =>
        r.getInt(0) -> ((r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getInt(2)),
          if (r.isNullAt(3)) None else Some(r.getInt(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))
      }.toMap

  test("MP4: mvhd v0/v1 durations; box-skipping walks; corrupt chain dies to NULL") {
    assert(parsedAv(1) == (("mp4", None, None, Some(5000L)))) // v0 600/3000
    assert(parsedAv(2) == (("mp4", None, None, Some(5000L)))) // v1 90000/450000
    assert(parsedAv(3) == (("mp4", None, None, Some(2500L)))) // free + udta skipped
    assert(parsedAv(6) == (("mp4", None, None, None)))        // ftyp only
    assert(parsedAv(8) == (("mp4", None, None, None)))        // zero-size child box
  }

  test("MP3: CBR duration; ID3v2 tag skipped; reserved version bits refuse") {
    assert(parsedAv(4) == (("mp3", None, None, Some(100L)))) // 1600 B @ 128 kbps
    assert(parsedAv(5) == (("mp3", None, None, Some(50L))))  // 800 B behind ID3
    assert(parsedAv(9) == (("unknown", None, None, None)))
  }

  test("MP3: MPEG2/2.5 and Layer I/II bitrate tables; reserved bits refuse") {
    assert(parsedAv(7) == (("mp3", None, None, Some(64L))))   // MPEG2.5 L3 @ 8 kbps
    assert(parsedAv(10) == (("mp3", None, None, Some(120L)))) // MPEG2 L3 @ 80 kbps
    assert(parsedAv(11) == (("mp3", None, None, Some(100L)))) // MPEG1 L2 @ 128 kbps
    assert(parsedAv(12) == (("mp3", None, None, Some(200L)))) // MPEG1 L1 @ 128 kbps
    assert(parsedAv(13) == (("mp3", None, None, None)))       // reserved version
    assert(parsedAv(14) == (("mp3", None, None, None)))       // reserved layer
  }

  test("AVI: avih dims + frame-count duration; JUNK skipped; truncated -> NULLs") {
    assert(parsedAv(15) == (("avi", Some(640), Some(480), Some(9999L))))
    assert(parsedAv(16) == (("avi", Some(640), Some(480), Some(9999L))))
    assert(parsedAv(18) == (("avi", None, None, None)))
  }

  test("OGG: truncated head page stays NULL (no codec id packet to read)") {
    assert(parsedAv(17) == (("ogg", None, None, None)))
  }

  test("OGG: last-page granule via the backward tail scan; Vorbis/Opus rates") {
    assert(parsedAv(21) == (("ogg", None, None, Some(10000L)))) // 441000 @ 44.1 kHz
    assert(parsedAv(22) == (("ogg", None, None, Some(2000L))))  // 96000 @ 48 kHz fixed
    assert(parsedAv(23) == (("ogg", None, None, None)))         // granule -1 sentinel
  }

  test("OGG Theora: picture dims from the BOS id packet; no fake duration") {
    assert(parsedAv(24) == (("ogg", Some(1280), Some(720), None)))
  }

  test("MP4 video dims from the first trak's tkhd; audio-track zeros gate to NULL") {
    assert(parsedAv(19) == (("mp4", Some(1920), Some(1080), Some(5000L))))
    assert(parsedAv(20) == (("mp4", None, None, Some(5000L))))
  }

  test("bin_rfind: LAST occurrence, window bound honored, absent -> NULL") {
    val df = Seq(
      (1, "00" + "4F676753" + "00" * 3 + "4F676753" + "00" * 2), // two hits
      (2, "00" * 6),                                             // absent
      (3, "4F676753" + "00" * 20)                                // outside a 8-byte window
    ).toDF("id", "hx").withColumn("b", unhex(col("hx")))
    val out = df.select(col("id"),
        call_function("bin_rfind", col("b"), lit(0x4F676753L), lit(4), lit(66000)).as("all"),
        call_function("bin_rfind", col("b"), lit(0x4F676753L), lit(4), lit(8)).as("tail8"))
      .collect().map(r => r.getInt(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(out(1) == ((Some(9L), Some(9L))))  // second (last) hit, 1-based
    assert(out(2) == ((None, None)))
    assert(out(3) == ((Some(1L), None)))      // 8-byte tail window misses it
  }

  test("parse is map-only scalar work: binary kernel, no shuffle, no UDF") {
    val df = MediaHeaders.fixtures.toDF("media_id", "hx")
      .withColumn("content", unhex(col("hx")))
      .select(MediaHeaders.parseHeader(col("content")).as("hd"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("ScalaUDF"),
      s"unexpected UDF:\n$plan")
    // fields are read straight off the bytes — no hex-string staging (the
    // executed plan constant-folds the literal fixtures to a LocalTableScan,
    // so the kernel is asserted on the analyzed plan)
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("bin_be"), s"binary kernel missing:\n$analyzed")
    assert("""(?<!un)hex\(""".r.findFirstIn(analyzed).isEmpty,
      s"hex staging crept back:\n$analyzed") // unhex(hx) input decode is fine
  }
}
