package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Regression tests for the round-9 external-review findings (ADVICE.md):
  *  1. `block_cosine_pairs` on a RAGGED block (mixed dimensionality) must
  *     fail loudly instead of silently truncating/zero-padding — silent
  *     coercion produced sims that diverge from the staged per-pair form
  *     while still looking like valid cosines;
  *  2. `mixtureDraw`'s quota product `targetRows * s` must not overflow
  *     BIGINT at 100 TB stratum sizes (it is staged through DECIMAL(38,0)
  *     now) — overflow yielded NEGATIVE quotas that silently dropped whole
  *     strata;
  *  3. the stub `$batch` maxpagesize/nextLink finding is covered e2e in
  *     [[graft.sources.odata.BatchReadSpec]]. */
class AdviceR9Spec extends SparkSpecBase {
  import spark.implicits._

  test("block_cosine_pairs fails loudly on ragged dimensionality") {
    val df = Seq(
      (1L, 0, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, 0, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (3L, 0, Array(1.0f, 0.0f)) // ragged: dim 2 in a dim-4 block
    ).toDF("vec_id", "label", "embedding")
    val ex = intercept[Throwable] {
      Similarity.cosineNearDupBlocked(df, "vec_id", "embedding", "label", 0.1)
        .collect()
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: chain(e.getCause))
    assert(chain(ex).exists(m => m != null && m.contains("ragged block")),
      s"expected a ragged-block error, got: ${chain(ex).mkString(" | ")}")
    // uniform blocks keep working
    val ok = Similarity.cosineNearDupBlocked(
      df.filter($"vec_id" =!= 3L), "vec_id", "embedding", "label", 0.1)
      .collect()
    assert(ok.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("mixtureDraw quotas survive targetRows*s beyond Long range") {
    // s ≈ sqrt(20)*1e6 ≈ 4.5e6 per stratum; targetRows = 2^62 makes the
    // naive BIGINT product overflow by far. The decimal-staged quota is
    // min(n, huge) = n, so EVERY row must be drawn; the pre-fix negative
    // quota silently emptied both strata.
    val df = (0 until 40).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "src")
    val out = Shards.mixtureDraw(df, "id", "src", lit(1L),
      targetRows = Long.MaxValue / 2)
    val got = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 20L, "b" -> 20L), s"strata dropped: $got")
    assert(out.select("quota").distinct().collect().forall(_.getLong(0) == 20L))
  }
}
