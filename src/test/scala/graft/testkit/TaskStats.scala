package graft.testkit

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** One finished task's cost: wall duration plus the shuffle record counts —
  * records are deterministic (same data, same plan → same counts), so skew
  * assertions key on them; durations are reported, not asserted. */
final case class TaskStat(stageId: Int, durMs: Long,
                          srRecords: Long, swRecords: Long)

/** Per-run task profile captured by [[TaskStats.profile]]. */
final case class TaskProfile(wallMs: Long, tasks: Seq[TaskStat]) {
  def maxTaskMs: Long = if (tasks.isEmpty) 0L else tasks.map(_.durMs).max
  def maxSwRecords: Long = if (tasks.isEmpty) 0L else tasks.map(_.swRecords).max
  def maxSrRecords: Long = if (tasks.isEmpty) 0L else tasks.map(_.srRecords).max
  def medianTaskMs: Long = {
    if (tasks.isEmpty) return 0L
    val s = tasks.map(_.durMs).sorted
    s(s.length / 2)
  }
  def summary(label: String): String =
    f"$label%-28s wall=${wallMs}%6d ms  tasks=${tasks.size}%4d  " +
      f"maxTask=${maxTaskMs}%6d ms  medTask=${medianTaskMs}%4d ms  " +
      f"maxShufWrite=${maxSwRecords}%9d rec  maxShufRead=${maxSrRecords}%9d rec"
}

/** Straggler measurement harness: registers a [[SparkListener]] for the
  * duration of `body`, drains the listener bus, and returns every finished
  * task's duration + shuffle record counts. Caches are NOT touched: shared
  * persisted intermediates (shingle sets, the soak corpus) staying warm
  * across consecutive profiled runs is the steady state the comparison
  * wants — a caller needing isolation clears the catalog cache itself. */
object TaskStats {
  def profile[A](spark: SparkSession)(body: => A): (A, TaskProfile) = {
    val buf = mutable.ArrayBuffer[TaskStat]()
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = buf.synchronized {
        val m = e.taskMetrics
        if (m != null && e.taskInfo != null && e.taskInfo.successful)
          buf += TaskStat(e.stageId, e.taskInfo.duration,
            m.shuffleReadMetrics.recordsRead, m.shuffleWriteMetrics.recordsWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    try {
      val r = body
      org.apache.spark.graftlisten.BusDrain.drain(spark.sparkContext)
      val wallMs = (System.nanoTime() - t0) / 1000000L
      (r, TaskProfile(wallMs, buf.synchronized(buf.toVector)))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
