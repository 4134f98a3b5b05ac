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

  test("parse is map-only scalar work: no shuffle, no UDF in the plan") {
    val df = MediaHeaders.fixtures.toDF("media_id", "hx")
      .withColumn("content", unhex(col("hx")))
      .select(MediaHeaders.parseHeader(col("content")).as("hd"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("ScalaUDF"),
      s"unexpected UDF:\n$plan")
  }
}
