package graft.testkit

import org.apache.spark.sql.SparkSession
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** r9 scale probe: run the data-heavy query family at a given SF dir with
  * per-query task profiles (straggler evidence), one JSON line per query.
  *
  * Methodology — slopes, not absolutes: the SAME harness runs at sf1 and
  * sf10 (tools/make_sf10.py) and the artifact compares its own two
  * readings, so constant overheads divide out. Caches are cleared between
  * queries: each profile is self-contained (the steady-state bench is
  * graft.Bench's job; this one measures how a single query's wall time,
  * task count, and worst task scale with 10x the data).
  *
  * Usage: Test/runMain graft.testkit.ScaleProbe <sfDir> <outJson> [q1,q2,..]
  */
object ScaleProbe {
  /** The data-heavy family. The UNCAPPED pair generator (p04) is probed
    * separately and is EXPECTED to blow up at sf10 on boilerplate-heavy
    * data (sum-of-DF^2 growth — its first probe attempt spilled 67 GB of
    * shuffle before dying): the capped variants (p18/p32) are the
    * documented at-scale configuration, so THEY carry the slope claim. */
  private val DefaultFamily = Seq(
    "p18_jaccard_capped", "p05_minhash_pairs", "p32_minhash_capped",
    "p06_simhash_pairs", "p24_dedup_clusters", "p37_dedup_substrings",
    "p55_keep_best", "p72_snapshot_dedup_near", "q02_revenue_by_nation")

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outPath = args(1)
    val family = if (args.length > 2) args(2).split(",").toSeq else DefaultFamily
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def clearCaches(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    def force(name: String): Unit =
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()

    val rows = scala.collection.mutable.ArrayBuffer[String]()
    def flush(): Unit = Files.write(Paths.get(outPath),
      (s"""{"sf":"$sfDir","cpus":$cpus,"rows":[${rows.mkString(",")}]}""" + "\n")
        .getBytes(StandardCharsets.UTF_8))
    family.foreach { name =>
      clearCaches()
      val row = try {
        force(name) // warmup (codegen, footers)
        val profiles = (1 to 2).map { _ =>
          clearCaches()
          val (_, prof) = TaskStats.profile(spark) { force(name) }
          prof
        }
        val best = profiles.minBy(_.wallMs)
        println(best.summary(name))
        val loadavg = try new String(Files.readAllBytes(Paths.get("/proc/loadavg")),
          StandardCharsets.UTF_8).trim.split("\\s+")(0) catch { case _: Throwable => "" }
        s"""{"query":"$name","wall_s":${best.wallMs / 1000.0},""" +
          s""""tasks":${best.tasks.size},"max_task_ms":${best.maxTaskMs},""" +
          s""""median_task_ms":${best.medianTaskMs},""" +
          s""""max_shuffle_write_rec":${best.maxSwRecords},""" +
          s""""max_shuffle_read_rec":${best.maxSrRecords},""" +
          s""""loadavg1":"$loadavg"}"""
      } catch { case e: Throwable =>
        println(s"FAIL $name: ${String.valueOf(e.getMessage).take(200)}")
        s"""{"query":"$name","failed":${"\""}${String.valueOf(e.getMessage)
          .replaceAll("[\"\\\\\n\r]", " ").take(160)}${"\""}}"""
      }
      rows += row
      flush() // incremental: a late crash keeps every earlier row
    }
    println(s"wrote $outPath")
    spark.stop()
  }
}
