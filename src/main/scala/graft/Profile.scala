package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Dev profiling harness: times individual stages of the heavy pipeline
  * queries so bench regressions can be attributed (run with
  * `sbt 'runMain graft.Profile <sfDir> <which>'`). Not part of the library
  * surface; kept for future perf rounds. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val which = if (args.length > 1) args(1) else "all"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)

    // warmup base reads
    docs.count(); emb.count()

    if (which == "all" || which == "p07") {
      time("p07.withNorm(corpus)") {
        Similarity.withNorm(emb, "vec_id", "embedding").count()
      }
      time("p07.sims-no-window") {
        val c = Similarity.withNorm(emb, "vec_id", "embedding")
        val q = broadcast(Similarity.withNorm(emb.filter(col("vec_id") < 5), "vec_id", "embedding")
          .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn")))
        c.crossJoin(q)
          .withColumn("sim", Similarity.dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
          .count()
      }
      time("p07.full") {
        Similarity.knnBruteForce(emb, "vec_id", emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 10).count()
      }
      time("p07.full-2nd-run") {
        Similarity.knnBruteForce(emb, "vec_id", emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 10).count()
      }
    }

    if (which == "all" || which == "p05") {
      time("p05.shingleSets") {
        Dedup.shingleSets(docs, "doc_id", "text", 3).count()
      }
      time("p05.minhashSig") {
        Dedup.minhashSigTable(Dedup.shingleSets(docs, "doc_id", "text", 3), 64).count()
      }
      time("p05.full") {
        Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 0.5).count()
      }
    }

    if (which == "all" || which == "p06") {
      time("p06.sigTable") {
        Dedup.simhashSigTable(docs, "doc_id", "text").count()
      }
      time("p06.full") {
        Dedup.simhashPairs(docs, "doc_id", "text", 3).count()
      }
    }

    if (which == "all" || which == "p09") {
      time("p09.full") {
        Similarity.annLshTopK(emb, "vec_id", emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 10).count()
      }
      time("p09.full2") {
        Similarity.annLshTopK(emb, "vec_id", emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 10).count()
      }
      time("p09.corpusKeys") {
        Similarity.withNorm(emb, "vec_id", "embedding")
          .select(col("vec_id"), posexplode(
            call_function("vec_lsh_keys", col("v"), lit(8), lit(8))))
          .count()
      }
    }

    if (which == "all" || which == "p15") {
      time("p15.full") {
        Similarity.ivfTopK(emb, "vec_id", emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 10, nCentroids = 16, nProbe = 4).count()
      }
      time("p15.full2") {
        Similarity.ivfTopK(emb, "vec_id", emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 10, nCentroids = 16, nProbe = 4).count()
      }
    }

    if (which == "all" || which == "p12") {
      val ev = Tables.events(spark, sfDir)
      ev.count()
      time("p12.full") {
        Sessions.sessionStats(ev, "user_id", "ts",
          tieBreak = "event_id", gapMicros = 1800000000L).count()
      }
      time("p12.full2") {
        Sessions.sessionStats(ev, "user_id", "ts",
          tieBreak = "event_id", gapMicros = 1800000000L).count()
      }
    }

    if (which == "all" || which == "p04") {
      time("p04.full") {
        Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5).count()
      }
    }
    spark.stop()
  }
}
