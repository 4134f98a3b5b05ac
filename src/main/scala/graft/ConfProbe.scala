package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Dev probe for the r12 q-suite fixed-cost investigation (VERDICT r11
  * item 6): times a query subset warm (3 passes, best reported) under an
  * arbitrary set of session-config overrides, with Spark job counts as the
  * load-independent evidence. NOT part of the timed bench path.
  *
  * Usage:
  *   SPARK_GRAFT_ONLY=q01_pricing_summary,q02_revenue_by_nation \
  *   GRAFT_PROBE_CONF="spark.sql.adaptive.coalescePartitions.parallelismFirst=false;spark.x=y" \
  *   sbt 'runMain graft.ConfProbe /root/testdata/sf0.1'
  */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
    sys.env.get("GRAFT_PROBE_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val i = kv.indexOf('=')
        b.config(kv.take(i).trim, kv.drop(i + 1).trim)
      })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    // pure per-query floor: N trivial actions (1-partition range -> noop),
    // timed warm — what this Spark on this box charges for ANY query
    // regardless of plan (job submit + stage + task + commit + AQE wrap)
    if (sys.env.contains("GRAFT_PROBE_FLOOR")) {
      for (i <- 1 to 3) {
        spark.range(0, 1000000, 1, 1).write.mode("overwrite").format("noop").save()
      }
      for (i <- 1 to 10) {
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        spark.range(0, 1000000, 1, 1).write.mode("overwrite").format("noop").save()
        println(f"[confprobe] floor pass $i ${(System.nanoTime() - t0) / 1e9}%7.3f s  jobs=${jobs.get() - j0}")
      }
      val t1 = System.nanoTime()
      val sorted = spark.range(0, 1000000, 1, 8).orderBy(org.apache.spark.sql.functions.col("id").desc)
      sorted.write.mode("overwrite").format("noop").save()
      println(f"[confprobe] floor orderBy ${(System.nanoTime() - t1) / 1e9}%7.3f s")
      spark.stop(); return
    }
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val sel = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // warmup
    sel.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => }
    }
    var total = 0.0
    sel.foreach { case (name, fn) =>
      var best = Double.MaxValue
      var bestJobs = 0
      for (_ <- 1 to 3) {
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        if (dt < best) { best = dt; bestJobs = jobs.get() - j0 }
      }
      total += best
      println(f"[confprobe] $name%-34s $best%7.3f s  jobs=$bestJobs")
    }
    println(f"[confprobe] TOTAL $total%7.3f s over ${sel.size} queries")
    spark.stop()
  }
}
