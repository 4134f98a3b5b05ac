package graft.testkit

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

object ProfileP23 {
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
      println(f"$label%-28s ${(System.nanoTime()-t0)/1e9}%.2f s  ($n rows)")
    }
    t("corpus posts") {
      Dedup.shingleSets(docs.filter(col("doc_id") >= 5), "doc_id", "text", 3)
        .select(col("id"), explode(col("shingles")).as("sh")).count()
    }
    t("bench shingles distinct") {
      Dedup.shingleSets(docs.filter(col("doc_id") < 5)
        .select(monotonically_increasing_id().as("bid"), col("text").as("btext")),
        "bid", "btext", 3)
        .select(explode(col("shingles")).as("sh")).distinct().count()
    }
    t("hits (full)") {
      Dedup.contaminationHits(docs.filter(col("doc_id") >= 5), "doc_id", "text",
        docs.filter(col("doc_id") < 5), "text").count()
    }
    t("hits again (warm)") {
      Dedup.contaminationHits(docs.filter(col("doc_id") >= 5), "doc_id", "text",
        docs.filter(col("doc_id") < 5), "text").count()
    }
    spark.stop()
  }
}
