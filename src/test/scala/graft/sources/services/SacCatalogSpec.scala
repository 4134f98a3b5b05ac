package graft.sources.services

import graft.SparkSpecBase
import graft.testkit.ODataStub
import org.scalatest.BeforeAndAfterAll

/** The `ATTACH (TYPE sac)` preset catalog e2e against the stub: configured
  * models as tables (the reference's own model discovery is a stub,
  * `sac_catalog.cpp:37-60`), scans through `/api/v1/odata/{kind}/{model}`
  * (`sac_url_builder.cpp:18`) with pushdown, read-only capability. */
class SacCatalogSpec extends SparkSpecBase with BeforeAndAfterAll {

  private var stub: ODataStub = _

  override def beforeAll(): Unit = {
    stub = new ODataStub(v2 = false).start()
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.sac", "graft.sources.services.SacCatalog")
    spark.conf.set("spark.sql.catalog.sac.url", s"http://localhost:${stub.port}")
    // one default-kind (planning) model + one with an explicit kind
    spark.conf.set("spark.sql.catalog.sac.models", "Customers, analytical:Customers2")
  }
  override def afterAll(): Unit = {
    spark.conf.unset("spark.sql.catalog.sac.models")
    spark.conf.unset("spark.sql.catalog.sac.url")
    spark.conf.unset("spark.sql.catalog.sac")
    if (stub != null) stub.stop()
    super.afterAll()
  }

  test("SHOW TABLES lists exactly the configured models") {
    val tables = spark.sql("SHOW TABLES IN sac.main").collect()
      .map(_.getAs[String]("tableName")).toSet
    assert(tables == Set("Customers", "Customers2"))
  }

  test("SELECT scans the planning model URL with filter+projection pushdown") {
    stub.requests.clear()
    val rows = spark.sql(
      "SELECT CustomerID, Country FROM sac.main.Customers WHERE Country = 'Germany'").collect()
    assert(rows.length == 7)
    val wire = stub.requests.filter(_.contains("/api/v1/odata/planning/Customers"))
    assert(wire.nonEmpty, stub.requests.toString)
    assert(wire.exists(r => r.contains("$filter=") && r.contains("Germany")), wire.toString)
    assert(wire.exists(_.contains("$select=")), wire.toString)
  }

  test("ghost namespaces are rejected, not silently treated as main") {
    intercept[Exception] {
      spark.sql("SHOW TABLES IN sac.nonexistent").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT * FROM sac.bogus.Customers").collect()
    }
  }

  test("writes are rejected at planning: SAC storage is read-only") {
    stub.postedItems.clear()
    intercept[Exception] {
      spark.sql("INSERT INTO sac.main.Customers VALUES ('X', 'Nope', 'DE', 1, TIMESTAMP '2024-01-01 00:00:00')")
    }
    assert(stub.postedItems.isEmpty)
  }
}
