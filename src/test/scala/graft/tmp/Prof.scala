package graft.tmp
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = mutable.ArrayBuffer[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        if (ms > 200) stages += s"s${si.stageId}:${ms}ms/${si.numTasks}t"
      }
    })
    for (r <- 1 to 2) {
      stages.clear()
      val s = System.nanoTime()
      val df = graft.SparkEntry.queries("q02_revenue_by_nation")(spark, "/tmp/sf1")
      df.write.format("noop").mode("overwrite").save()
      println(f"PROF q02 r$r ${(System.nanoTime() - s) / 1e9}%.3f s :: ${stages.mkString(" ")}")
      if (r == 2) {
        val p = df.queryExecution.executedPlan.toString
        p.linesIterator.filter(l => l.contains("Join") || l.contains("Exchange"))
          .foreach(l => println("PLANLINE " + l.trim.take(110)))
      }
    }
    spark.stop()
  }
}
