package graft.functions

import graft.SparkSpecBase
import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Native word_shingles vs the HOF chain it replaced: byte-identical
  * output (content AND first-occurrence order) on the real corpus and on
  * crafted edges — the property that keeps every shingle-derived oracle
  * hash unchanged across the swap. */
class WordShinglesSpec extends SparkSpecBase {
  import spark.implicits._

  test("kernel output is identical to the HOF chain on the corpus") {
    for (n <- Seq(2, 3, 8)) {
      // null-safe inequality: a plain =!= evaluates to NULL (row dropped,
      // diff silently 0) on exactly the NULL-vs-[] divergence class a
      // null-handling bug would introduce
      val diff = graft.Tables.documents(spark, sf("sf0.001"))
        .select(TextOps.tokens(col("text")).as("t"))
        .select(TextOps.wordShinglesFromTokens(col("t"), n).as("a"),
          TextOps.wordShinglesHof(col("t"), n).as("b"))
        .filter(!(col("a") <=> col("b")))
        .count()
      assert(diff == 0L, s"n=$n: $diff rows diverge from the HOF reference")
    }
  }

  test("NULL token array yields an empty shingle set, like the HOF's otherwise branch") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("a b c d"))).toDF("id", "text")
      .select($"id", when($"text".isNotNull, TextOps.tokens($"text")).as("t"))
    val out = df.select($"id",
        TextOps.wordShinglesFromTokens($"t", 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(out(1L) == Nil, "NULL input must yield [], not NULL")
    assert(out(2L) == List("a b c", "b c d"))
  }

  test("edges: short docs empty, duplicates keep first-occurrence order") {
    val df = Seq(
      (1L, "a b"),                  // shorter than n=3 -> empty
      (2L, "a b c"),                // exactly one shingle
      (3L, "x y x y x y"),          // repeats: distinct keeps first order
      (4L, "")                      // [""] after split -> shorter than n
    ).toDF("id", "text")
    val out = df.select($"id",
        TextOps.wordShinglesFromTokens(TextOps.tokens($"text"), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(out(1L) == Nil)
    assert(out(2L) == List("a b c"))
    assert(out(3L) == List("x y x", "y x y"))
    assert(out(4L) == Nil)
  }

  test("expression stays inside whole-stage codegen") {
    val df = graft.Tables.documents(spark, sf("sf0.001"))
      .select(TextOps.wordShinglesFromTokens(TextOps.tokens(col("text")), 3).as("s"))
      .select(sum(size(col("s"))))
    df.collect()
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val finalPlan = formatted.split("== Initial Plan ==").head
    // the PROJECT carrying word_shingles specifically must be starred — a
    // starred HashAggregate alone would also appear if the expression fell
    // out of codegen (CodegenFallback) while the agg stage stayed compiled
    assert(finalPlan.contains("* Project"), finalPlan.take(1500))
  }
}
