package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed (the
  * 100 TB reality: one hot customer/shingle/bucket key can pin an entire
  * join on a single reducer).
  *
  * [[saltedJoin]] implements the classic replicate-and-salt pattern:
  * the skewed (big) side gets a salt in [0, n) derived from a caller-chosen
  * DETERMINISTIC expression (e.g. `xxhash64(col("row_id"))` — anything that
  * varies within a key), and the small side is exploded n-fold so every
  * (key, salt) pair finds its match. Results are identical to the plain
  * join; the hot key's rows now spread over n reducers.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) solves the same problem adaptively for sort-merge joins — use
  * salting when AQE can't see the skew (e.g. an aggregation after the join
  * keyed the same way, or a broadcast-ineligible dimension).
  */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltExpr: Column, nSalts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(nSalts > 0)
    val bigS = big.withColumn("__salt", pmod(saltExpr, lit(nSalts)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1)))).withColumn("__salt", col("__salt").cast("int"))
    bigS.join(smallS, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase (salted) aggregation for expensive buffers (collect_list,
    * percentile sketches) over skewed keys: partial per (keys, salt) then a
    * final merge per keys. For algebraic aggs (sum/count/min/max) Spark's
    * map-side partial aggregation already does this — use only when the agg
    * buffer itself is the bottleneck. */
  def twoPhaseCollect(df: DataFrame, keys: Seq[String], valueCol: String,
                      saltExpr: Column, nSalts: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(saltExpr, lit(nSalts)))
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(collect_list(col(valueCol)).as("__part"))
    partial.groupBy(keys.map(col): _*)
      .agg(array_sort(flatten(collect_list(col("__part")))).as(s"${valueCol}_list"))
  }
}
