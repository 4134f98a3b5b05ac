package graft.testkit
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object ProfileP05 {
  def t[A](l: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"== $l: ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 3).cache()
    t("sets materialize") { sets.count() }
    val sig = Dedup.minhashSigTable(sets, 64)
    t("signatures") { sig.count() }
    val r = 4
    val bandRows = sig.select(col("id"), explode(
      transform(sequence(lit(0), lit(15)),
        b => struct(b.as("band"), hash(slice(col("sig"), b * r + 1, lit(r))).as("bh")))
    ).as("bb")).select(col("id"), col("bb.band").as("band"), col("bb.bh").as("bh")).cache()
    t("band rows") { println(bandRows.count()) }
    val cand = bandRows.as("a").join(bandRows.as("b"),
      col("a.band") === col("b.band") && col("a.bh") === col("b.bh") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    t("candidates") { println(cand.count()) }
  }
}
