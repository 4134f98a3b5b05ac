package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Regression specs for the r7 ADVICE defects that are observable from the
  * public API (the keyset-carve overflow has its own spec in
  * `graft.sources.odata.KeysetCarveSpec`). */
class AdviceR8Spec extends SparkSpecBase {
  import spark.implicits._

  test("embeddingDecontaminate: zero-norm rows are never flagged (NaN guard)") {
    // corpus row 10 is the zero vector; pre-fix 0/0=NaN and Spark's
    // NaN-greatest ordering made `sim >= minSim` TRUE against every eval row
    val corpus = Seq(
      (10L, Array(0f, 0f, 0f)),
      (11L, Array(1f, 0f, 0f)),
      (12L, Array(0f, 1f, 0f))).toDF("id", "embedding")
    val test = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(0f, 0f, 0f))).toDF("id", "embedding") // zero eval vector too
    val out = Similarity.embeddingDecontaminate(corpus, "id", test, "id",
        "embedding", minSim = 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(out(10L) == ((0L, false)), s"zero-norm corpus row flagged: $out")
    assert(out(11L) == ((1L, true)))  // exact match with eval vector 1
    assert(out(12L) == ((0L, false)))
  }

  test("max_multiplicity tolerates null array elements") {
    val df = Seq(1).toDF("i").select(
      call_function("max_multiplicity",
        array(lit("a"), lit(null), lit("a"), lit("b"), lit(null))).as("m"),
      call_function("max_multiplicity",
        array(lit(null).cast("string"))).as("allNull"))
    val r = df.collect().head
    assert(r.getLong(0) == 2L) // nulls skipped: a,a,b -> 2
    assert(r.getLong(1) == 0L) // only nulls -> 0, like an empty array
  }
}
