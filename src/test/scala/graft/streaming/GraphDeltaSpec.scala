package graft.streaming

import java.nio.file.Files
import graft.SparkSpecBase
import graft.testkit.GraphStub
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll

/** Graph `/delta` CDC streaming e2e against the stub: initial two-page load,
  * deltaLink resume across query restarts, change rounds delivered
  * incrementally (public protocol: nextLink pages, deltaLink on the final
  * page, the link itself is the token). */
class GraphDeltaSpec extends SparkSpecBase with BeforeAndAfterAll {

  private var stub: GraphStub = _

  override def beforeAll(): Unit = {
    stub = new GraphStub().start()
    super.beforeAll()
  }
  override def afterAll(): Unit = {
    if (stub != null) stub.stop()
    super.afterAll()
  }

  private val Ddl = "id STRING, displayName STRING, userPrincipalName STRING, " +
    "mail STRING, jobTitle STRING, department STRING, accountEnabled BOOLEAN, " +
    "removedReason STRING"

  private def changed(i: Int, title: String) =
    s"""{"id":"u$i","displayName":"User $i","userPrincipalName":"user$i@contoso.com",""" +
      s""""mail":"user$i@contoso.com","jobTitle":"$title","department":"R&D","accountEnabled":true}"""

  test("initial load pages through nextLink; delta rounds resume from the deltaLink across restarts") {
    stub.userDeltas.clear()
    val ckpt = Files.createTempDirectory("gd-ckpt").toUri.toString
    val out = Files.createTempDirectory("gd-out").toString
    def runOnce(): Unit = {
      val df = spark.readStream.format("graph-delta")
        .option("url", s"${stub.baseUrl}/users/delta")
        .option("schemaDdl", Ddl)
        .load()
      val q = df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }

    runOnce() // initial load: 3 + 2 users over two pages
    assert(spark.read.parquet(out).count() == 5)

    stub.userDeltas += Seq(changed(1, "Principal Engineer"), changed(6, "New Hire"))
    runOnce() // restart: only the delta round arrives (token resumed)
    val all = spark.read.parquet(out)
    assert(all.count() == 7, s"expected 7 rows, got ${all.count()}")
    assert(all.filter("jobTitle = 'Principal Engineer'").count() == 1)
    assert(all.filter("id = 'u6'").count() == 1)

    // the resume GET carried the deltaLink token, and the initial walk ran once
    val reqs = stub.requests.filter(_.contains("/users/delta"))
    assert(reqs.exists(_.contains("$deltatoken=T0")), reqs.mkString("\n"))
    assert(reqs.count(r => r.contains("GET") && !r.contains("deltatoken") &&
      !r.contains("__page")) == 1, reqs.mkString("\n"))

    // empty delta: no new rows, no progress batch
    runOnce()
    assert(spark.read.parquet(out).count() == 7)

    // deleted-object tombstone: @removed becomes a typed removedReason row
    stub.userDeltas += Seq("""{"id":"u2","@removed":{"reason":"deleted"}}""")
    runOnce()
    val tomb = spark.read.parquet(out).filter("removedReason = 'deleted'")
    assert(tomb.count() == 1 && tomb.head().getAs[String]("id") == "u2")
    // live rows carry a null marker — deletions are distinguishable
    assert(spark.read.parquet(out).filter("removedReason IS NULL").count() == 7)

    // token expiry: 410 Gone triggers a one-shot resync from the Location
    // restart URL instead of wedging the stream (at-least-once re-delivery)
    val before = spark.read.parquet(out).count()
    stub.expireNextDelta = true
    runOnce()
    val after = spark.read.parquet(out).count()
    assert(after == before + 5, s"resync should re-deliver the 5 current users, got ${after - before}")
  }

  test("SharePoint list-item CDC: fields unwrap + top-level id + tombstones") {
    stub.listItemDeltas.clear()
    val ckpt = Files.createTempDirectory("gl-ckpt").toUri.toString
    val out = Files.createTempDirectory("gl-out").toString
    val deltaUrl =
      s"${stub.baseUrl}/sites/${stub.SiteId}/lists/${stub.ListId}/items/delta"
    def runOnce(): Unit = {
      val df = spark.readStream.format("graph-delta")
        .option("url", deltaUrl)
        .option("schemaDdl",
          "id STRING, Title STRING, Amount DOUBLE, removedReason STRING")
        .option("unwrap", "fields")
        .load()
      val q = df.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }

    runOnce() // initial sync: 3 items, typed via the fields facet
    val first = spark.read.parquet(out)
    assert(first.count() == 3)
    val r1 = first.filter("id = '1'").head()
    assert(r1.getAs[String]("Title") == "Item 1")
    assert(r1.getAs[Double]("Amount") == 1.5)

    stub.listItemDeltas += Seq(
      """{"id":"1","webUrl":"https://x/items/1","fields":{"Title":"Item 1 (edited)","Amount":99.5,"id":"1"}}""",
      """{"id":"2","@removed":{"reason":"deleted"}}""")
    runOnce() // delta round: one edit + one tombstone
    val all = spark.read.parquet(out)
    assert(all.count() == 5)
    assert(all.filter("Title = 'Item 1 (edited)'").head().getAs[Double]("Amount") == 99.5)
    val tomb = all.filter("removedReason = 'deleted'")
    assert(tomb.count() == 1 && tomb.head().getAs[String]("id") == "2")
  }

  test("resource-agnostic: a mailbox (messages) CDC stream with its own token space") {
    stub.messageDeltas.clear()
    val ckpt = Files.createTempDirectory("gm-ckpt").toUri.toString
    val out = Files.createTempDirectory("gm-out").toString
    def runOnce(): Unit = {
      val df = spark.readStream.format("graph-delta")
        .option("url", s"${stub.baseUrl}/me/messages/delta")
        .option("schemaDdl", "id STRING, subject STRING, isRead BOOLEAN")
        .load()
      val q = df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }

    runOnce() // initial mailbox sync
    assert(spark.read.parquet(out).count() == 4)

    stub.messageDeltas += Seq(
      """{"id":"m5","subject":"New mail","isRead":false}""",
      """{"id":"m1","subject":"Subject 1 (edited)","isRead":true}""")
    runOnce() // only the delta arrives, resumed from the M-token
    val all = spark.read.parquet(out)
    assert(all.count() == 6)
    assert(all.filter("subject = 'Subject 1 (edited)'").count() == 1)
    val reqs = stub.requests.filter(_.contains("/me/messages/delta"))
    assert(reqs.exists(_.contains("$deltatoken=M0")), reqs.mkString("\n"))
  }
}
