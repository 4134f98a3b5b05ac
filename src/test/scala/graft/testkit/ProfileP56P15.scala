package graft.testkit

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Retrieval, Similarity, TextOps}

/** Stage-attribution profiler for the two remaining sf1 weak rows the r9
  * verdict demanded profiles for (item 5): p56 hybrid RRF and p15 IVF ANN.
  * Writes PROFILE_p56_p15_<tag>.json.
  *
  * Usage: Test/runMain graft.testkit.ProfileP56P15 <sfDir> <tag>
  */
object ProfileP56P15 {
  private val out = scala.collection.mutable.LinkedHashMap[String, Double]()
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    val dt = (System.nanoTime() - t0) / 1e9
    out(label) = math.rint(dt * 1000) / 1000
    println(f"== $label: $dt%.2f s"); r
  }
  private def force(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/sf1"
    val tag = if (args.length > 1) args(1) else "sf1_r10"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docs(dir: String) = spark.read.parquet(s"$dir/documents.parquet")
    def embs(dir: String) = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

    def p56(dir: String): DataFrame = {
      val lex = Retrieval.rankBounded(
          TextOps.bm25TopDocs(docs(dir), "doc_id", "text",
            Seq("dup", "vector", "customer", "batch"), k = 50),
          "doc_id", col("score_sum").desc)
        .select(col("doc_id"), col("rk"))
      val e = embs(dir)
      val dense = Similarity.knnBruteForce(e, "vec_id",
          e.filter(col("vec_id") === 0), "vec_id", "embedding", k = 50)
        .select(col("id").as("doc_id"), col("rnk").cast("long").as("rk"))
      Retrieval.rrfFuse(Seq(lex, dense), "doc_id", "rk", k0 = 60, topK = 20)
    }
    def p15(dir: String): DataFrame = {
      val e = embs(dir)
      Similarity.ivfTopK(e, "vec_id", e.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 10, nCentroids = 16, nProbe = 4)
    }

    // JIT warmup (not recorded)
    force(p56("/root/testdata/sf0.01")); force(p15("/root/testdata/sf0.01"))

    // ---- p56 ----
    t("p56_full_run1") { force(p56(sfDir)) }
    t("p56_full_run2") { force(p56(sfDir)) }
    t("p56_bm25_only") {
      force(TextOps.bm25TopDocs(docs(sfDir), "doc_id", "text",
        Seq("dup", "vector", "customer", "batch"), k = 50))
    }
    t("p56_lex_ranked") {
      force(Retrieval.rankBounded(
        TextOps.bm25TopDocs(docs(sfDir), "doc_id", "text",
          Seq("dup", "vector", "customer", "batch"), k = 50),
        "doc_id", col("score_sum").desc))
    }
    t("p56_dense_knn_only") {
      val e = embs(sfDir)
      force(Similarity.knnBruteForce(e, "vec_id",
        e.filter(col("vec_id") === 0), "vec_id", "embedding", k = 50))
    }

    // ---- p15 ----
    t("p15_full_run1") { force(p15(sfDir)) }
    t("p15_full_run2") { force(p15(sfDir)) }
    t("p15_centroid_seed_job") {
      Similarity.centroidsFor(embs(sfDir), "vec_id", "embedding", 16)
    }
    t("p15_corpus_cell_assign") {
      val e = embs(sfDir)
      val cents = Similarity.centroidsFor(e, "vec_id", "embedding", 16)
      force(e.select(Similarity.cellAssign(col("embedding")
        .cast("array<double>"), cents).as("cell"))
        .groupBy("cell").count())
    }

    val json = out.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    val w = new java.io.PrintWriter(s"/root/repo/PROFILE_p56_p15_$tag.json")
    w.println(s"""{"sf":"$sfDir","stages":{$json}}""")
    w.close()
    spark.stop()
  }
}
