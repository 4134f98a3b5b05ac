package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Regression tests for the ADVICE r9 findings fixed in round 10.
  * (The CacheScope throw-release fix is gated in CacheLifecycleSpec; the
  * Bpe long-tier shared-scan fix in BpeDriverTierSpec; the Bench
  * contention-retry fix is main-inline and carries its evidence in the
  * artifact's runs_per_query field.) */
class AdviceR10Spec extends SparkSpecBase {
  import spark.implicits._

  test("p75 fertility is NULL (not inf/nan) for a zero-word source") {
    // a source whose docs are all whitespace: words = 0 after tokenize —
    // Spark Divide yields NULL, DuckDB IEEE division yields inf; the guard
    // must make both engines emit NULL (oracle uses NULLIF)
    val dir = java.nio.file.Files.createTempDirectory("p75guard").toString
    val docs = Seq(
      (0L, "srcA", "low low low lower lower newest newest widest widest"),
      (1L, "srcA", "low low lower lower newest newest newest widest"),
      (2L, "srcB", "   "),
      (3L, "srcB", "")
    ).toDF("doc_id", "source", "text")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("p75_bpe_fertility")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("srcB").isNullAt(out("srcB").fieldIndex("fertility")),
      s"zero-word source must have NULL fertility: ${out("srcB")}")
    val a = out("srcA")
    assert(!a.isNullAt(a.fieldIndex("fertility")) &&
      a.getDouble(a.fieldIndex("fertility")) >= 1.0,
      s"non-empty source keeps a real fertility: $a")
  }
}
