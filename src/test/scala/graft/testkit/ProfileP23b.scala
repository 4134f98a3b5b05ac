package graft.testkit

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextOps}

object ProfileP23b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-30s ${(System.nanoTime()-t0)/1e9}%.2f s  ($n rows)")
    }
    t("tokens only") {
      docs.select(size(TextOps.tokens(col("text"))).cast("long").as("n")).agg(sum(col("n"))).count()
    }
    t("shingleSets full corpus") {
      Dedup.shingleSets(docs, "doc_id", "text", 3).count()
    }
    t("shingleSets + explode") {
      Dedup.shingleSets(docs, "doc_id", "text", 3)
        .select(col("id"), explode(col("shingles")).as("sh")).count()
    }
    val p = Dedup.shingleSets(docs, "doc_id", "text", 3)
      .select(col("id"), explode(col("shingles")).as("sh"))
      .queryExecution.executedPlan.toString
    println("split( occurrences in plan: " + "split\\(".r.findAllIn(p).size)
    println(p.take(3000))
    spark.stop()
  }
}
