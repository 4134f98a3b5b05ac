package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (merge) join — an operator Spark SQL lacks natively (DuckDB has
  * `ASOF JOIN`, which is the oracle for it). For each left row, attach the
  * payload of the latest right row with the same keys and
  * right.time <= left.time.
  *
  * Implementation is the scalable union-sort trick, NOT a range self-join:
  * tag both sides, union, and run one window pass partitioned by the keys
  * ordered by (time, side) with right rows sorting before left rows on time
  * ties (inclusive <= semantics); `last(payload, ignoreNulls)` over the
  * unbounded-preceding frame carries the most recent right payload forward.
  * Cost: one shuffle on the keys + one sort — the same cost profile as a
  * sort-merge join, with no candidate blow-up however dense the right side.
  *
  * The right side must be unique per (keys, time) — pre-aggregate ties first
  * or the carried payload is nondeterministic.
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
    val r = right.select(
      (keys.map(col) :+ col(rightTime).as("__t") :+ lit(0).as("__side")) ++
        payload.map(col): _*)
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(u) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select((leftCols ++ payload).map(col): _*)
  }
}
