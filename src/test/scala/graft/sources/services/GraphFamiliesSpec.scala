package graft.sources.services

import graft.SparkSpecBase
import graft.testkit.GraphStub
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

/** End-to-end specs for the Microsoft Graph families (Entra, SharePoint,
  * Outlook, Teams, Planner) against the in-process [[GraphStub]] — the port
  * of the reference's `graph_*` table-function surface. */
class GraphFamiliesSpec extends SparkSpecBase with BeforeAndAfterAll {

  private var stub: GraphStub = _
  private def base: String = stub.baseUrl

  override def beforeAll(): Unit = {
    super.beforeAll()
    stub = new GraphStub().start()
  }
  override def afterAll(): Unit = {
    if (stub != null) stub.stop()
    super.afterAll()
  }

  // ---- Entra ----------------------------------------------------------------

  test("graph_users: fixed schema, nextLink pagination, account_enabled default") {
    val df = Graph.users(spark, base)
    assert(df.columns.toSeq == Seq("id", "display_name", "user_principal_name",
      "mail", "job_title", "department", "account_enabled"))
    val rows = df.collect()
    assert(rows.length == 5) // 3 on page 1 + 2 via @odata.nextLink
    assert(rows.map(_.getString(0)).toSet == Set("u1", "u2", "u3", "u4", "u5"))
  }

  test("graph_groups and graph_devices read their fixed schemas") {
    val g = Graph.groups(spark, base).collect()
    assert(g.length == 2)
    assert(g.find(_.getString(0) == "g2").get.getAs[String]("mail") == null)
    val d = Graph.devices(spark, base).collect()
    assert(d.head.getAs[String]("operating_system") == "Windows")
  }

  test("graph_signin_logs flattens status.errorCode to Success/Failure") {
    val s = Graph.signinLogs(spark, base).orderBy("id").collect()
    assert(s.map(_.getAs[String]("status")).toSeq == Seq("Success", "Failure"))
  }

  // ---- SharePoint -----------------------------------------------------------

  test("resolveSiteId: id passthrough, URL path lookup, name search") {
    assert(Graph.resolveSiteId(spark, stub.SiteId, base) == stub.SiteId)
    assert(Graph.resolveSiteId(spark,
      "https://contoso.sharepoint.com/sites/Finance", base) == stub.SiteId)
    assert(stub.requests.exists(_.contains("/sites/contoso.sharepoint.com:/sites/Finance:")))
    assert(Graph.resolveSiteId(spark, "Finance", base) == stub.SiteId)
    assert(stub.requests.exists(_.contains("/sites?search=Finance")))
  }

  test("graph_show_sites / show_drives / show_lists") {
    val sites = Graph.showSites(spark, base).collect()
    assert(sites.length == 1 && sites.head.getAs[String]("display_name") == "Finance Site")
    val drives = Graph.showDrives(spark, "Finance", base).collect()
    assert(drives.head.getAs[String]("drive_type") == "documentLibrary")
    val lists = Graph.showLists(spark, "Finance", base).collect()
    assert(lists.head.getAs[String]("name") == "Budget")
  }

  test("graph_describe_list maps facets to column_type with reference precedence") {
    val d = Graph.describeList(spark, "Finance", "Budget", base).collect()
      .map(r => r.getAs[String]("name") -> r.getAs[String]("column_type")).toMap
    assert(d("Title") == "text")
    assert(d("Amount") == "number")
    assert(d("Approved") == "boolean")
    assert(d("DueDate") == "dateTime")
    assert(d("Cost") == "currency")
  }

  test("graph_list_items: facet-typed columns, fields unwrap, paging, internal columns skipped") {
    val df = Graph.listItems(spark, "Finance", "Budget List", base)
    // schema: id + facet-typed columns; _Hidden / Edit / case-dup ID skipped
    assert(df.columns.toSeq == Seq("id", "Title", "Amount", "Approved", "DueDate", "Cost"))
    assert(df.schema("Amount").dataType.typeName == "double")
    assert(df.schema("Approved").dataType.typeName == "boolean")
    assert(df.schema("DueDate").dataType.typeName == "timestamp")
    assert(df.schema("Cost").dataType.typeName == "double")
    val rows = df.orderBy(col("id").cast("int")).collect()
    assert(rows.length == 7) // 3 pages of 3/3/1
    assert(rows.head.getAs[String]("Title") == "Item 1")
    assert(rows.head.getAs[Double]("Amount") == 1.5)
    assert(rows(1).getAs[Boolean]("Approved"))
  }

  test("list item mutations: create POSTs fields, update PATCHes, delete DELETEs") {
    import spark.implicits._
    val created = Graph.createListItems(spark,
      Seq(("New A", 9.5), ("New B", 1.0)).toDF("Title", "Amount"),
      "Finance", "Budget", base).collect()
    assert(created.length == 2 && created.forall(_.getAs[Int]("status") == 201))
    assert(created.flatMap(r => Option(r.getAs[String]("item_id"))).length == 2)
    assert(stub.createdItems.forall(_.startsWith("""{"fields":{""")))
    val updated = Graph.updateListItems(spark,
      Seq(("3", "Renamed")).toDF("item_id", "Title"), "Finance", "Budget", base).collect()
    assert(updated.head.getAs[Int]("status") == 200)
    assert(stub.patchedItems.exists { case (id, b) => id == "3" && b.contains("Renamed") })
    val deleted = Graph.deleteListItems(spark,
      Seq("5").toDF("item_id"), "Finance", "Budget", base).collect()
    assert(deleted.head.getAs[Int]("status") == 204)
    assert(stub.deletedItems.contains("5"))
  }

  // ---- Outlook --------------------------------------------------------------

  test("outlook routing: empty user -> /me, UPN -> /users/{encoded}, GUID -> /users/{guid}") {
    Graph.calendars(spark, "", base).collect()
    assert(stub.requests.exists(_.startsWith("GET /v1.0/me/calendars")))
    Graph.calendars(spark, "ada@contoso.com", base).collect()
    assert(stub.requests.exists(_.startsWith("GET /v1.0/users/ada%40contoso.com/calendars")) ||
      stub.requests.exists(_.startsWith("GET /v1.0/users/ada@contoso.com/calendars")))
    val guid = "12345678-1234-1234-1234-123456789012"
    Graph.calendars(spark, guid, base).collect()
    assert(stub.requests.exists(_.startsWith(s"GET /v1.0/users/$guid/calendars")))
  }

  test("graph_calendar_events: plain /events and date-bounded calendarView") {
    val all = Graph.calendarEvents(spark, "", baseUrl = base).collect()
    assert(all.length == 3)
    assert(all.head.getAs[String]("start_time") == "2024-06-11T09:00:00")
    assert(all.head.getAs[String]("organizer_email") == "user1@contoso.com")
    // bare dates normalize to T00:00:00 and bound the view (events 1..2 only)
    val bounded = Graph.calendarEvents(spark, "",
      startDate = Some("2024-06-11"), endDate = Some("2024-06-13"), baseUrl = base).collect()
    assert(bounded.length == 2)
    assert(stub.requests.exists(r => r.contains("/me/calendarView") &&
      r.contains("startDateTime=2024-06-11T00:00:00") &&
      r.contains("endDateTime=2024-06-13T00:00:00")))
  }

  test("graph_contacts: first email / first business phone, nulls survive") {
    val c = Graph.contacts(spark, "", base).orderBy("id").collect()
    assert(c.head.getAs[String]("email") == "ada@contoso.com")
    assert(c.head.getAs[String]("business_phone") == "+1-666")
    assert(c(1).getAs[String]("email") == null)
  }

  test("graph_messages: folder name joined; folder param scopes the URL") {
    val m = Graph.messages(spark, "", baseUrl = base).orderBy("id").collect()
    assert(m.length == 3)
    assert(m.head.getAs[String]("folder_name") == "Inbox")
    assert(m(2).getAs[String]("folder_name") == "Archive")
    val scoped = Graph.messages(spark, "", folder = Some("f2"), baseUrl = base).collect()
    assert(scoped.length == 1 && scoped.head.getAs[String]("id") == "m3")
    assert(stub.requests.exists(_.contains("/me/mailFolders/f2/messages")))
  }

  test("graph_mail_folders fixed schema incl. item counts") {
    val f = Graph.mailFolders(spark, "", base).orderBy("id").collect()
    assert(f.head.getAs[Int]("total_item_count") == 2)
    assert(f.head.getAs[Int]("unread_item_count") == 1)
  }

  // ---- Teams ----------------------------------------------------------------

  test("teams family: joinedTeams, channels, members (role default), channel messages") {
    val t = Graph.myTeams(spark, "", base).collect()
    assert(t.head.getAs[String]("display_name") == "Eng Team")
    val ch = Graph.teamChannels(spark, stub.TeamId, base).collect()
    assert(ch.length == 2)
    val mem = Graph.teamMembers(spark, stub.TeamId, base).orderBy("id").collect()
    assert(mem.head.getAs[String]("role") == "owner")
    assert(mem(1).getAs[String]("role") == "member") // empty roles -> default
    val msg = Graph.channelMessages(spark, stub.TeamId, "ch1", base).collect()
    assert(msg.head.getAs[String]("from_name") == "User 1")
    assert(msg.head.getAs[String]("body_content") == "hello")
  }

  // ---- Planner --------------------------------------------------------------

  test("planner family: plans, buckets, tasks, per-row create_task") {
    import spark.implicits._
    val plans = Graph.plannerPlans(spark, "g1", base).collect()
    assert(plans.head.getAs[String]("title") == "Launch")
    val buckets = Graph.plannerBuckets(spark, stub.PlanId, base).collect()
    assert(buckets.length == 2)
    val tasks = Graph.plannerTasks(spark, stub.PlanId, base).collect()
    assert(tasks.head.getAs[Int]("percent_complete") == 50)
    val created = Graph.plannerCreateTasks(spark,
      Seq((stub.PlanId, "New task", "b1")).toDF("plan_id", "title", "bucket_id"), base)
      .collect()
    assert(created.head.getAs[Int]("status") == 201)
    assert(created.head.getAs[String]("task_id") == "task-1")
    assert(stub.createdTasks.head.contains(""""planId":"pl-1""""))
    assert(stub.createdTasks.head.contains(""""bucketId":"b1""""))
  }

  // ---- pushdown through the fixed-schema scan -------------------------------

  test("$select pruning pushes through the fixed-schema Graph scan") {
    stub.requests.clear()
    Graph.users(spark, base).select("id", "display_name").collect()
    // pruned read asks the server for the camelCase source fields only
    assert(stub.requests.exists(r =>
      r.contains("$select=") && r.contains("id") && r.contains("displayName")))
  }
}
