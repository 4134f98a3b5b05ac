package graft.sources.services

import graft.SparkSpecBase
import graft.testkit.ODataStub
import org.scalatest.BeforeAndAfterAll

/** The `ATTACH (TYPE business_central)` preset catalog e2e against the stub:
  * table listing from the API-root metadata, company-scoped entity URLs,
  * filter/projection pushdown reaching the wire
  * (`business_central_storage.cpp:84-129`, `business_central_catalog.cpp:22-49`). */
class BusinessCentralCatalogSpec extends SparkSpecBase with BeforeAndAfterAll {

  private var stub: ODataStub = _

  override def beforeAll(): Unit = {
    stub = new ODataStub(v2 = false).start()
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.bc",
      "graft.sources.services.BusinessCentralCatalog")
    spark.conf.set("spark.sql.catalog.bc.url", s"http://localhost:${stub.port}")
    spark.conf.set("spark.sql.catalog.bc.company", "c1")
  }
  override def afterAll(): Unit = {
    spark.conf.unset("spark.sql.catalog.bc.company")
    spark.conf.unset("spark.sql.catalog.bc.url")
    spark.conf.unset("spark.sql.catalog.bc")
    if (stub != null) stub.stop()
    super.afterAll()
  }

  test("SHOW TABLES lists the environment's entities (companies excluded)") {
    val tables = spark.sql("SHOW TABLES IN bc.main").collect()
      .map(_.getAs[String]("tableName")).toSet
    assert(tables.contains("Customers"))
    assert(!tables.contains("companies"))
  }

  test("SELECT scans the company-scoped URL with filter+projection pushdown") {
    stub.requests.clear()
    val rows = spark.sql(
      "SELECT CustomerID, Country FROM bc.main.Customers WHERE Country = 'Germany'").collect()
    assert(rows.length == 7)
    val wire = stub.requests.filter(_.contains("/api/v2.0/companies(c1)/Customers"))
    assert(wire.nonEmpty, stub.requests.toString)
    assert(wire.exists(r => r.contains("$filter=") && r.contains("Germany")), wire.toString)
    assert(wire.exists(_.contains("$select=")), wire.toString)
  }

  test("writes are rejected at planning: BC storage is read-only") {
    stub.postedItems.clear()
    intercept[Exception] {
      spark.sql("INSERT INTO bc.main.Customers VALUES ('X', 'Nope', 'DE', 1, TIMESTAMP '2024-01-01 00:00:00')")
    }
    // rejected by capability, not by the wire: nothing was POSTed
    assert(stub.postedItems.isEmpty)
  }
}
