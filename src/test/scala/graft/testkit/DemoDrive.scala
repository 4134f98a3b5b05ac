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

    println("== delta sharing ==")
    import spark.implicits._
    val shareDir = java.nio.file.Files.createTempDirectory("demo-share")
    (0 until 50).map(i => (i.toLong, s"it$i")).toDF("id", "name")
      .write.parquet(shareDir.toString + "/t")
    stub.shareFiles = java.nio.file.Files.list(java.nio.file.Paths.get(shareDir.toString + "/t"))
      .toArray.map(_.asInstanceOf[java.nio.file.Path]).filter(_.toString.endsWith(".parquet")).toSeq
    stub.shareSchemaJson = (0 until 1).map(i => (i.toLong, "x")).toDF("id", "name").schema.json
    val profile = graft.sources.deltashare.DeltaShareProfile(s"http://localhost:${stub.port}", None)
    val shared = graft.sources.deltashare.DeltaShare.read(spark, profile, "sales", "core", "tx")
    println(s"shared table rows: ${shared.count()}")

    println("== rest-items write ==")
    Seq(("w1", 1), ("w2", 2)).toDF("name", "qty").write.format("rest-items")
      .option("url", s"http://localhost:${stub.port}/items").mode("append").save()
    println(s"items POSTed: ${stub.postedItems.size}")

    println("== http_get ==")
    graft.sources.http.HttpFunctions.httpGet(spark, stub.serviceUrl + "/Customers?$top=2").show(truncate = false)

    println("== business central catalog ==")
    spark.conf.set("spark.sql.catalog.bc", "graft.sources.services.BusinessCentralCatalog")
    spark.conf.set("spark.sql.catalog.bc.url", s"http://localhost:${stub.port}")
    spark.conf.set("spark.sql.catalog.bc.company", "c1")
    spark.sql("SELECT CustomerID, Country FROM bc.main.Customers WHERE Country = 'France' LIMIT 3").show()

    val gstub = new GraphStub().start()
    println("== sharepoint lists catalog (read-write) ==")
    spark.conf.set("spark.sql.catalog.sp", "graft.sources.services.SharePointListsCatalog")
    spark.conf.set("spark.sql.catalog.sp.url", gstub.baseUrl)
    spark.conf.set("spark.sql.catalog.sp.site", "Finance")
    spark.sql("SHOW TABLES IN sp.main").show()
    spark.sql("SELECT id, Title, Amount FROM sp.main.`Budget List` WHERE Amount > 5.0 LIMIT 3").show()
    spark.sql("UPDATE sp.main.`Budget List` SET Title = 'Demo' WHERE id = '3'")
    println(s"sharepoint PATCHes: ${gstub.patchedItems.size}")

    println("== sac catalog ==")
    spark.conf.set("spark.sql.catalog.sac", "graft.sources.services.SacCatalog")
    spark.conf.set("spark.sql.catalog.sac.url", s"http://localhost:${stub.port}")
    spark.conf.set("spark.sql.catalog.sac.models", "Customers")
    spark.sql("SELECT CustomerID, Country FROM sac.main.Customers WHERE Country = 'Germany' LIMIT 3").show()

    println("== graph delta CDC stream ==")
    val ckpt = java.nio.file.Files.createTempDirectory("demo-gd-ckpt").toUri.toString
    val gdOut = java.nio.file.Files.createTempDirectory("demo-gd-out").toString
    def deltaOnce(): Unit = {
      val q = spark.readStream.format("graph-delta")
        .option("url", s"${gstub.baseUrl}/users/delta")
        .option("schemaDdl", "id STRING, displayName STRING, jobTitle STRING, removedReason STRING")
        .load()
        .writeStream.format("parquet").option("path", gdOut)
        .option("checkpointLocation", ckpt).outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    deltaOnce()
    gstub.userDeltas += Seq("""{"id":"u9","displayName":"New User","jobTitle":"Analyst"}""")
    deltaOnce()
    println(s"delta rows landed: ${spark.read.parquet(gdOut).count()} (5 initial + 1 delta)")

    println("== copy-to formats ==")
    Seq(("Demo Row", 9.5)).toDF("Title", "Amount").write.format("sharepoint-list")
      .option("url", gstub.baseUrl).option("site", "Finance").option("list", "Budget")
      .mode("append").save()
    Seq(("North", "7", "2.00")).toDF("Region", "Qty", "Price").write.format("graph-excel")
      .option("url", gstub.baseUrl).option("path", "book.xlsx").option("table", "Sales")
      .mode("append").save()
    println(s"sharepoint items created: ${gstub.createdItems.size}, excel row batches: ${gstub.appendedRows.size}")
    gstub.stop()

    println("== server saw ==")
    stub.requests.foreach(r => println("  " + r))
    stub.stop()
    spark.stop()
  }
}
