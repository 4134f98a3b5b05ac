package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The scale techniques the 100 TB design leans on, demonstrated and
  * asserted on plans: salted skew joins (result parity), bucketed
  * co-located joins (no shuffle). */
class ScaleTechniquesSpec extends SparkSpecBase {
  import spark.implicits._

  test("saltedJoin returns exactly the plain join's rows, spread over salts") {
    val orders = spark.read.parquet(sf() + "/orders.parquet")
    val customer = spark.read.parquet(sf() + "/customer.parquet")
    val plain = orders.join(customer, orders("o_custkey") === customer("c_custkey"))
      .select("o_orderkey", "c_custkey").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = Skew.saltedJoin(
      orders.withColumnRenamed("o_custkey", "k"),
      customer.withColumnRenamed("c_custkey", "k"),
      Seq("k"), saltExpr = xxhash64(col("o_orderkey")), nSalts = 8)
      .select("o_orderkey", "k").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted == plain)
  }

  test("twoPhaseCollect equals direct collect_list (sorted)") {
    val df = Seq((1, "a"), (1, "b"), (1, "c"), (2, "z")).toDF("k", "v")
    val direct = df.groupBy("k").agg(array_sort(collect_list($"v")).as("v_list"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    val two = Skew.twoPhaseCollect(df, Seq("k"), "v", xxhash64($"v"), 4)
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    assert(two == direct)
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a fresh in-memory catalog doesn't know about leftover managed-table
    // dirs from a previous JVM — clear the locations too
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("b_orders", "b_lineitem").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh, t))
    }
    val orders = spark.read.parquet(sf() + "/orders.parquet")
    val lineitem = spark.read.parquet(sf() + "/lineitem.parquet")
    orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    // hint merge: stop AQE broadcasting the (tiny at sf0.001) build side —
    // at real scale both sides are fact tables and SMJ is the plan anyway
    val joined = spark.table("b_orders").hint("merge")
      .join(spark.table("b_lineitem"), "o_orderkey")
    joined.count() // finalize AQE
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan.take(800))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n${plan.take(1500)}")
    // parity with the plain join
    val plainCount = orders.join(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey").count()
    assert(joined.count() == plainCount)
  }

  test("end-to-end corpus publish: clean -> dedup -> split -> pack -> partitioned parquet") {
    // the full training-data publishing shape: every stage an operator from
    // this module, landing as hive-partitioned parquet whose directory tree
    // IS the split/source layout a 100 TB consumer lists, prunes, and reads
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val cleaned = Dedup.dedupExact(
      docs.filter(TextOps.qualityScore(col("text")) >= 0.3), "doc_id", "text")
    val split = Shards.assignSplit(cleaned, "doc_id")
    // pack independently per (split, source): a shard never spans splits
    val packed = Shards.packShards(
      split.withColumn("tk", TextOps.tokenCount(col("text")).cast("long"))
        .withColumn("pk", concat_ws("/", col("split"), col("source"))),
      "pk", "doc_id", "tk", budget = 5000L).drop("pk")
    val out = java.nio.file.Files.createTempDirectory("graft_publish").toString
    try {
      packed.write.mode("overwrite")
        .partitionBy("split", "source").parquet(out)
      val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).toSet
      assert(dirs.exists(_.startsWith("split=train")) && dirs.size >= 2, dirs.toString)
      // partition pruning: a split=train read lists only that subtree
      val back = spark.read.parquet(out)
      assert(back.count() == packed.count())
      val train = back.filter(col("split") === "train")
      assert(train.count() ==
        packed.filter(col("split") === "train").count())
      // every (split, source, shard) honors the budget bound (modulo its
      // last doc)
      val viol = back.groupBy("split", "source", "shard_id")
        .agg(sum("tk").as("t"), max("tk").as("m"))
        .filter(col("t") - col("m") >= 5000L).count()
      assert(viol == 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }
}
