package graft.testkit

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.TextOps

/** Stage-attribution profiler for p47 (bigram-LM corpus scoring) — the
  * committed artifact the r9 verdict demanded in place of narrative
  * steady-state claims. Writes PROFILE_p47_<tag>.json with the wall of
  * each constituent stage plus two full end-to-end runs.
  *
  * Usage: Test/runMain graft.testkit.ProfileP47 <sfDir> <tag>
  */
object ProfileP47 {
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

    def planted(dir: String): DataFrame = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val gib = concat_ws(" ",
        (0 until 12).map(i => concat(lit("g"), col("doc_id"), lit("x" + i))): _*)
      docs.select(col("doc_id"),
        when(pmod(col("doc_id"), lit(13)) === 0, gib)
          .when(pmod(col("doc_id"), lit(13)) === 1,
            lit("click here to continue " * 50))
          .otherwise(col("text")).as("text"))
    }

    // JIT warmup on the small tier (not recorded)
    force(TextOps.lmBigramScore(planted("/root/testdata/sf0.01"), "doc_id", "text"))

    val df = planted(sfDir)
    // full operator, twice: run1 ~ what a bench pass pays (page cache from
    // warmup only), run2 the steady repeat
    t("full_run1") { force(TextOps.lmBigramScore(df, "doc_id", "text")) }
    t("full_run2") { force(TextOps.lmBigramScore(df, "doc_id", "text")) }

    // ---- stage attribution (each stage forced standalone) ----
    val base = df.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
    t("scan_tokenize") { force(base.select(sum(size(col("toks")))) ) }
    val posts = base.select(col("doc_id"),
      explode_outer(call_function("word_bigrams", col("toks"))).as("bg"))
    t("scan_tokenize_bigrams") { force(posts.select(count(col("bg")))) }
    // r10 shape: ONE scan builds the type table carrying bigram keys AND
    // 1-token docs' lone tokens (singleton keys are space-free)
    val typeCounts = base.select(
        explode_outer(call_function("word_bigrams", col("toks"))).as("bg"),
        when(size(col("toks")) === 1, col("toks")(0)).as("lone"))
      .select(coalesce(col("bg"), col("lone")).as("key"))
      .filter(col("key").isNotNull)
      .groupBy("key").agg(count(lit(1)).as("n12")).persist()
    t("typecounts_build_persist") { typeCounts.count() }
    val c12 = typeCounts.filter(col("key").contains(" "))
      .select(col("key").as("bg"), col("n12"))
    val vocabN = typeCounts
      .select(explode(array(substring_index(col("key"), " ", 1),
        substring_index(col("key"), " ", -1))).as("t"))
      .agg(countDistinct(col("t")).as("v"))
    t("vocab_from_cached_types") { force(vocabN) }
    val lm = c12
      .withColumn("n1", sum(col("n12")).over(
        Window.partitionBy(substring_index(col("bg"), " ", 1))))
      .crossJoin(broadcast(vocabN))
      .select(col("bg"), expr("(n12 + 1L) * 1000000L div (n1 + v)").as("p"))
    t("lm_window_over_cached_types") { force(lm) }
    t("score_join_given_cached_types") {
      force(posts.as("po").join(lm.as("lm"), col("po.bg") === col("lm.bg"), "left")
        .groupBy("doc_id")
        .agg(count(col("po.bg")).as("n_bigrams"), sum(col("p")).as("score_sum")))
    }
    typeCounts.unpersist(blocking = true)

    val json = out.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    val w = new java.io.PrintWriter(s"/root/repo/PROFILE_p47_$tag.json")
    w.println(s"""{"sf":"$sfDir","stages":{$json}}""")
    w.close()
    spark.stop()
  }
}
