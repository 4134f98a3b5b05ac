package graft.writes

import graft.SparkSpecBase
import graft.testkit.GraphStub
import org.scalatest.BeforeAndAfterAll

/** The reference COPY-TO formats as `df.write.format(...)` sinks
  * (`graph_sharepoint_copy.cpp:169-175`, `graph_excel_copy.cpp:209-215`):
  * resolution driver-side, per-partition POSTs executor-side. */
class CopyFormatsSpec extends SparkSpecBase with BeforeAndAfterAll {

  private var stub: GraphStub = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    stub = new GraphStub().start()
  }
  override def afterAll(): Unit = {
    if (stub != null) stub.stop()
    super.afterAll()
  }

  test("sharepoint-list sink POSTs one fields-wrapped item per row") {
    import spark.implicits._
    stub.createdItems.clear()
    Seq(("Copy A", 1.5), ("Copy B", 2.5)).toDF("Title", "Amount")
      .write.format("sharepoint-list")
      .option("url", stub.baseUrl)
      .option("site", "Finance").option("list", "Budget")
      .mode("append").save()
    assert(stub.createdItems.size == 2, stub.createdItems.toString)
    assert(stub.createdItems.forall(_.startsWith("""{"fields":{""")))
    assert(stub.createdItems.exists(_.contains(""""Title":"Copy A"""")))
    assert(stub.createdItems.exists(_.contains(""""Amount":2.5""")))
  }

  test("graph-excel sink appends chunked values to the named table") {
    import spark.implicits._
    stub.appendedRows.clear()
    Seq(("West", "9", "3.25"), ("East", "1", "0.50")).toDF("Region", "Qty", "Price")
      .repartition(1) // one chunk -> one rows/add POST
      .write.format("graph-excel")
      .option("url", stub.baseUrl)
      .option("path", "book.xlsx").option("table", "Sales")
      .mode("append").save()
    assert(stub.appendedRows.size == 1, stub.appendedRows.toString)
    val body = stub.appendedRows.head
    assert(body.startsWith("""{"values":["""))
    assert(body.contains("""["West","9","3.25"]"""))
    assert(body.contains("""["East","1","0.50"]"""))
  }
}
