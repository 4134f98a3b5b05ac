package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{array, element_at, transform}

package object operators {

  /** let-binding for column expressions: evaluates `value` ONCE per row and
    * hands `body` a materialized lambda VARIABLE instead of an expression.
    *
    * Catalyst copies — does not CSE — subexpressions referenced inside
    * higher-order-function lambdas, and CollapseProject re-inlines staged
    * projection columns into downstream operators (including Generate), so
    * an expensive array expression referenced per lambda element is
    * re-evaluated per element: the shingle explode of a 5 k-doc corpus was
    * re-running `split()` per shingle access (observed 14 copies of the
    * token subtree in one plan; 15 s where 1 s was expected). A
    * single-element `transform` is the barrier: its input is evaluated once,
    * and the lambda variable is a value, not an expression — this also works
    * in streaming plans, where a `.cache()` barrier is unavailable. */
  private[graft] def bindOnce(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

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
