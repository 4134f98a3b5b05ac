package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev probe for VERDICT r10 item 5: A/B the dedupSubstrings token-corpus
  * persist (MEMORY_AND_DISK vs DISK_ONLY vs no-persist/re-tokenize) at a
  * given SF, p37's exact input shape. Caches are cleared between arms so a
  * prior arm's CacheManager entry (and its storage level) cannot leak. */
object P37Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/sf1"
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def d2 = {
      val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      val nxt = docs.select((col("doc_id") - 1).as("doc_id"),
        col("text").as("text_b"))
      docs.join(nxt, Seq("doc_id"), "left")
        .select(col("doc_id"),
          concat_ws(" ", col("text"), col("text_b")).as("text"))
    }
    def clearAll(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    val arms = Seq(
      "NONE(re-tokenize)" -> StorageLevel.NONE,
      "DISK_ONLY" -> StorageLevel.DISK_ONLY,
      "MEMORY_AND_DISK" -> StorageLevel.MEMORY_AND_DISK)
    for ((name, level) <- arms) {
      clearAll()
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        graft.operators.Dedup.dedupSubstrings(d2, "doc_id", "text", k = 8,
            storage = level)
          .orderBy("doc_id")
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[p37probe] $name%-18s " +
        times.map(t => f"$t%6.2f").mkString(" ") +
        f"  best=${times.min}%6.2f s")
    }
    spark.stop()
  }
}
