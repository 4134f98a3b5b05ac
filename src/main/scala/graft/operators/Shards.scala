package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-splitting and shard-packing operators for training-data pipelines
  * (beyond-reference tier, same design rules as [[Dedup]]: expression-only,
  * engine-portable hashing so a DuckDB oracle can mirror every stage).
  *
  * Scale design (100 TB):
  *  - split assignment is MAP-ONLY: an md5-derived hash of the salted id
  *    decides the split row-locally — no shuffle, no global state, and the
  *    assignment is reproducible across runs/engines (a re-run of the
  *    pipeline, or a different engine entirely, lands every document in the
  *    same split — the property that matters for never leaking test docs
  *    into training);
  *  - shard packing is one window per partition key (source): the running
  *    token total within each source is a partitioned cumulative sum — each
  *    source sorts independently in parallel, no global ordering. Shards are
  *    contiguous-by-id within a source, so a shard maps to one output file
  *    whose token count is bounded by budget + one document.
  */
object Shards {

  /** Per-mille bucket in [0, 1000) from the salted id — [[Dedup.mdHash31]]
    * keeps it portable (DuckDB: the same md5 prefix arithmetic). */
  def splitBucket(idCol: Column, salt: String): Column =
    pmod(Dedup.mdHash31(concat(lit(salt), idCol.cast("string"))), lit(1000L))

  /** Deterministic train/val/test assignment: adds a `split` column. Buckets
    * `[0, testPermille)` -> test, `[testPermille, testPermille+valPermille)`
    * -> val, rest -> train. Changing `salt` re-deals the split; keeping it
    * fixed makes the assignment stable under any re-partitioning or re-run. */
  def assignSplit(df: DataFrame, idCol: String, salt: String = "graft",
                  valPermille: Int = 100, testPermille: Int = 100): DataFrame = {
    val b = splitBucket(col(idCol), salt)
    df.withColumn("split",
      when(b < testPermille, lit("test"))
        .when(b < testPermille + valPermille, lit("val"))
        .otherwise(lit("train")))
  }

  /** Token-budget shard packing: adds `shard_id` such that consecutive (by
    * `orderCol`) documents within each `partCol` group share a shard until
    * the running token total would pass `budget`. shard_id = floor(exclusive
    * running sum / budget): every shard holds < budget + (its last doc)
    * tokens, and assignment is a pure function of the partition's order —
    * deterministic, and SQL-window expressible for the oracle. */
  def packShards(df: DataFrame, partCol: String, orderCol: String,
                 tokensCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(partCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // integral divide (`div`), not floor(double /): a partition whose token
    // total passes 2^53 would misround shard boundaries in double arithmetic
    df.withColumn("shard_id", call_function("div",
      sum(col(tokensCol)).over(w) - col(tokensCol), lit(budget)))
  }
}
