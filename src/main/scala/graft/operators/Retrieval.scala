package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranked-retrieval fusion — the glue between the lexical ([[TextOps.bm25TopDocs]])
  * and dense ([[Similarity.knnBruteForce]] / ANN) retrievers that together
  * form the standard hybrid retriever of modern RAG / curation stacks.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09):
    * `score(d) = Σ_lists 1/(k0 + rank_i(d))` — the rank-only fusion rule
    * that needs no score calibration between retrievers (BM25 sums and
    * cosines are not commensurable; ranks are).
    *
    * Determinism: each contribution is the FLOOR-scaled integer
    * `1e6 div (k0 + rank)` so the per-doc sum is an exact BIGINT — the
    * double form would depend on accumulation order across engines. The
    * final `rrf` double is one correctly-rounded division. Ties are fully
    * ordered by (rrf_sum DESC, id).
    *
    * Shape at 100 TB: the inputs are already top-k lists (bounded — the
    * retrievers did the data-scale work); fusion is a union of k-row
    * frames, one partial-agg groupBy, and a TakeOrdered. Nothing here
    * touches the corpus again. */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, rankCol: String,
              k0: Int = 60, topK: Int = 20): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val contribs = lists.map(df => df.select(col(idCol),
      expr(s"1000000L div (${k0}L + $rankCol)").as("contrib")))
    contribs.reduce(_ unionAll _)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_lists"), sum(col("contrib")).as("rrf_sum"))
      .select(col(idCol), col("n_lists"), col("rrf_sum"),
        (col("rrf_sum").cast("double") / lit(1000000.0)).as("rrf"))
      .orderBy(col("rrf_sum").desc, col(idCol))
      .limit(topK)
  }

  /** Attach a dense rank column `rk` (1-based, fully ordered by
    * `orderBy` + id tie-break) to a BOUNDED result frame. The global
    * row_number window is single-partition by construction — callers must
    * only pass already-top-k frames (the retrievers' outputs), never a
    * corpus-scale one; that contract is what keeps hybrid fusion cheap. */
  def rankBounded(df: DataFrame, idCol: String, orderBy: Column): DataFrame =
    df.withColumn("rk", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(orderBy, col(idCol)))
      .cast("long"))
}
