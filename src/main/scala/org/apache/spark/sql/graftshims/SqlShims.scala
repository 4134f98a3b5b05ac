package org.apache.spark.sql.graftshims

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Narrow accessors for two `private[sql]` Spark internals that have no
  * public equivalent (the standard extension-library technique — a file in
  * an `org.apache.spark.sql` subpackage).
  *
  * Used by `graft.streaming.StreamingDedup` to scope the
  * `statefulOperator.checkCorrectness` conf override to a private session
  * clone instead of mutating the caller's session (a library must not flip
  * a global safety flag as a side effect of building a DataFrame).
  */
object SqlShims {

  /** A session sharing `spark`'s SparkContext and state with a CLONED
    * runtime conf / catalog: conf changes made on the clone are invisible
    * to `spark` (unlike `newSession()`, the clone also inherits runtime
    * conf values set after startup, so behavior matches the caller's
    * session in every other respect). */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[ClassicSession].cloneSession()

  /** Re-bind a logical plan to `spark` (i.e. `Dataset.ofRows`): the
    * resulting DataFrame is analyzed/executed under `spark`'s conf. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
