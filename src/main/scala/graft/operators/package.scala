package graft

import org.apache.spark.sql.DataFrame

package object operators {

  /** Spread a small-file input across the cluster before expression-heavy
    * per-row work (shingling, signatures, vector math): a single 2 MB parquet
    * file arrives as ONE input partition, which would serialize tens of
    * millions of interpreted higher-order-function evaluations onto one core.
    *
    * No-op when the input is already parallel enough (the 100 TB case —
    * real inputs arrive in thousands of partitions; this extra round-robin
    * shuffle would be pure waste there, so it is conditional). */
  private[graft] def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < math.max(2, target / 2)) df.repartition(target)
    else df
  }
}
