package graft.testkit

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextOps}

/** Scratch profiler for the heavy dedup queries at sf0.1. */
object ProfileP04 {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    t("tokens only") {
      docs.select(TextOps.tokens(col("text")).as("t")).selectExpr("sum(size(t))").collect()
    }
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 3)
    t("shingle sets") { sets.selectExpr("sum(size(shingles))").collect() }
    t("shingle sets again") { sets.selectExpr("sum(size(shingles))").collect() }
    val posts = sets.select(col("id"), explode(col("shingles")).as("sh"))
    t("posts count") { println(posts.count()) }
    t("join+group") {
      val inter = posts.as("a")
        .join(posts.as("b"), col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(count(lit(1)).as("inter"))
      println(inter.count())
    }
    t("full p04") {
      println(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5).count())
    }
    t("full p05 minhash") {
      println(Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 0.5).count())
    }
    t("full p06 simhash") {
      println(Dedup.simhashPairs(docs, "doc_id", "text", 3).count())
    }
    spark.stop()
  }
}
