package graft.testkit
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** One-off micro-benchmark: native word_shingles kernel vs the HOF chain. */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val toks = graft.Tables.documents(spark, "/root/testdata/sf0.1")
      .select(TextOps.tokens(col("text")).as("t")).cache()
    toks.count()
    def time(label: String, c: org.apache.spark.sql.Column): Unit = {
      // warm
      toks.select(sum(size(c))).collect()
      val t0 = System.nanoTime()
      (1 to 10).foreach(_ => toks.select(sum(size(c))).collect())
      println(f"$label%-8s ${(System.nanoTime()-t0)/1e9}%.2f s / 10 passes")
    }
    time("hof",    TextOps.wordShinglesHof(col("t"), 3))
    time("kernel", TextOps.wordShinglesFromTokens(col("t"), 3))
    spark.stop()
  }
}
