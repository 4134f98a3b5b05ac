package graft.testkit

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual end-to-end drive of the library surface: stub OData server +
  * `spark.read.format("odata")` + catalog SQL. Run with
  * `sbt 'Test/runMain graft.testkit.DemoDrive'`. */
object DemoDrive {
  def main(args: Array[String]): Unit = {
    val stub = new ODataStub(v2 = false).start()
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.catalog.nw", "graft.sources.odata.ODataCatalog")
      .config("spark.sql.catalog.nw.url", stub.serviceUrl)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val df = spark.read.format("odata")
      .option("url", stub.serviceUrl + "/Customers").load()
      .filter(col("Country") === "Germany")
      .select("CustomerID", "CompanyName", "Revenue")
    df.show(5, truncate = false)
    df.explain("formatted")

    println("== catalog SQL ==")
    spark.sql("SHOW TABLES IN nw.main").show()
    spark.sql("SELECT CustomerID, Revenue FROM nw.main.Customers WHERE Revenue > 15000 ORDER BY CustomerID").show()

    println("== server saw ==")
    stub.requests.foreach(r => println("  " + r))
    stub.stop()
    spark.stop()
  }
}
