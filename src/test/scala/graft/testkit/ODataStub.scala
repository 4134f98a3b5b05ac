package graft.testkit

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** In-process OData v2/v4 stub server (zero egress — SURVEY.md §5 port
  * strategy): serves a `$metadata` EDMX document and a `Customers` entity set
  * with server-side `$filter`/`$select`/`$top`/`$skip`/`$count` evaluation and
  * nextLink pagination, and records every request URL so tests can assert
  * what was pushed down.
  */
class ODataStub(v2: Boolean, pageSize: Int = 5) {

  val requests = mutable.ListBuffer[String]()

  /** When set, every /svc request must carry matching basic credentials —
    * 401 otherwise, recorded in [[unauthorized]]. Regression harness for the
    * round-1 unauthenticated-$metadata-probe bug: a secured service rejects
    * anonymous probes, so the test asserts `unauthorized.isEmpty`. */
  var requireBasic: Option[(String, String)] = None
  val unauthorized = mutable.ListBuffer[String]()

  private def authorized(ex: HttpExchange): Boolean = requireBasic match {
    case None => true
    case Some((u, p)) =>
      val expected = "Basic " + java.util.Base64.getEncoder
        .encodeToString(s"$u:$p".getBytes(StandardCharsets.UTF_8))
      Option(ex.getRequestHeaders.getFirst("Authorization")).contains(expected)
  }

  def makeRows(n: Int): Seq[Map[String, Any]] = (0 until n).map { i =>
    Map(
      "CustomerID" -> s"C${"%02d".format(i)}",
      "CompanyName" -> s"Company $i",
      "Country" -> (if (i % 3 == 0) "Germany" else if (i % 3 == 1) "France" else "Mexico"),
      "Revenue" -> (1000L * (i + 1)),
      "Founded" -> (946684800000L + i * 86400000L)) // 2000-01-01 + i days
  }

  /** 20 deterministic customers (tests may resize/replace the set). */
  @volatile var rows: Seq[Map[String, Any]] = makeRows(20)

  /** When true, DELETE calls actually remove the row from [[rows]] — the
    * bulk-delete loop terminates on the live set like a real service. */
  @volatile var applyDeletes: Boolean = false

  /** ODP delta queue: each pushDelta() becomes one delta batch; token Tk =
    * "k batches already consumed". */
  val deltas = mutable.ListBuffer[Seq[Map[String, Any]]]()
  def pushDelta(rows: Seq[Map[String, Any]]): Unit = deltas.synchronized { deltas += rows }

  /** REST item sink: rows POSTed to /items collect here. */
  val postedItems = mutable.ListBuffer[String]()

  /** Raw bodies POSTed to /token. */
  val tokenRequests = mutable.ListBuffer[String]()

  /** When != 200, /$count endpoints answer with this status (e.g. 501 = a
    * server without $count support; 403 = auth failure on the probe). */
  var countStatus: Int = 200

  /** When != 200, any data request carrying `$skip` answers with this status
    * — models Graph collections and delta feeds that reject offset paging
    * (keyset-fallback regression harness). */
  var skipStatus: Int = 200

  /** When != 200, any request carrying `$apply` answers with this status —
    * models servers without aggregation-extension support (the probe must
    * fail and the aggregation stay in Spark). */
  var applyStatus: Int = 200

  /** Raw bodies POSTed to /$batch (JSON batch round-trips). */
  val batchBodies = mutable.ListBuffer[String]()
  private val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  val patchedKeys = mutable.ListBuffer[(String, String)]() // (key, body)
  val flakyCounts = mutable.Map[String, Int]()
  var counterHits = 0
  val deletedKeys = mutable.ListBuffer[String]()

  /** Delta-Sharing fixture: share/schema/table -> parquet files served at
    * /files/<name> as "presigned" URLs. */
  var shareFiles: Seq[java.nio.file.Path] = Seq.empty
  var shareSchemaJson: String = ""

  /** Ad-hoc routes: (method, path) -> body served as application/json. */
  val extraBodies = mutable.Map[(String, String), String]()

  private var server: HttpServer = _
  def port: Int = server.getAddress.getPort
  def serviceUrl: String = s"http://localhost:$port/svc"

  def start(): this.type = {
    server = HttpServer.create(new InetSocketAddress("localhost", 0), 0)
    server.createContext("/", new Handler)
    // small daemon pool: executor-distributed operations (bulk delete) hit
    // the stub concurrently; shared state is synchronized where mutated
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(16,
      r => { val t = new Thread(r); t.setDaemon(true); t }))
    server.start()
    this
  }
  def stop(): Unit = if (server != null) server.stop(0)

  private def shareNdjsonMeta: String =
    s"""{"protocol":{"minReaderVersion":1}}
       |{"metaData":{"id":"m1","format":{"provider":"parquet"},"schemaString":${jsonStr(shareSchemaJson)},"partitionColumns":[]}}
       |""".stripMargin

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private val metadataXml: String = {
    val dtType = if (v2) "Edm.DateTime" else "Edm.DateTimeOffset"
    val versionAttr = if (v2) "" else """Version="4.0""""
    val dsAttr = if (v2) """m:DataServiceVersion="2.0" xmlns:m="http://schemas.microsoft.com/ado/2007/08/dataservices/metadata"""" else ""
    s"""<?xml version="1.0" encoding="utf-8"?>
       |<edmx:Edmx xmlns:edmx="http://docs.oasis-open.org/odata/ns/edmx" $versionAttr>
       |  <edmx:DataServices $dsAttr>
       |    <Schema xmlns="http://docs.oasis-open.org/odata/ns/edm" Namespace="Stub">
       |      <EntityType Name="Customer">
       |        <Key><PropertyRef Name="CustomerID"/></Key>
       |        <Property Name="CustomerID" Type="Edm.String" Nullable="false"/>
       |        <Property Name="CompanyName" Type="Edm.String"/>
       |        <Property Name="Country" Type="Edm.String"/>
       |        <Property Name="Revenue" Type="Edm.Int64"/>
       |        <Property Name="Founded" Type="$dtType"/>
       |        <NavigationProperty Name="Orders" Type="Collection(Stub.Order)"/>
       |      </EntityType>
       |      <EntityType Name="Order">
       |        <Key><PropertyRef Name="OrderID"/></Key>
       |        <Property Name="OrderID" Type="Edm.Int32" Nullable="false"/>
       |        <Property Name="Amount" Type="Edm.Double"/>
       |        <NavigationProperty Name="Items" Type="Collection(Stub.Item)"/>
       |      </EntityType>
       |      <EntityType Name="Item">
       |        <Key><PropertyRef Name="ItemID"/></Key>
       |        <Property Name="ItemID" Type="Edm.Int32" Nullable="false"/>
       |        <Property Name="Qty" Type="Edm.Int32"/>
       |      </EntityType>
       |      <EntityContainer Name="Container">
       |        <EntitySet Name="Customers" EntityType="Stub.Customer"/>
       |        <EntitySet Name="OdpCustomers" EntityType="Stub.Customer"/>
       |        <EntitySet Name="companies" EntityType="Stub.Customer"/>
       |      </EntityContainer>
       |    </Schema>
       |  </edmx:DataServices>
       |</edmx:Edmx>""".stripMargin
  }

  private class Handler extends HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val path = ex.getRequestURI.getPath
      val rawQ = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      val decoded = path + (if (rawQ.isEmpty) "" else "?" + URLDecoder.decode(rawQ, StandardCharsets.UTF_8))
      requests.synchronized { requests += decoded }
      if (path.startsWith("/svc") && !authorized(ex)) {
        unauthorized.synchronized { unauthorized += decoded }
        respond(ex, 401, "text/plain", "unauthorized")
      } else try route(ex, path, parseQuery(rawQ)) catch {
        case e: Exception => respond(ex, 500, "text/plain", e.toString)
      }
    }
  }

  private def parseQuery(raw: String): Map[String, String] =
    raw.split('&').filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf('=')
      val (k, v) = if (i < 0) (kv, "") else (kv.take(i), kv.drop(i + 1))
      URLDecoder.decode(k, StandardCharsets.UTF_8) ->
        URLDecoder.decode(v, StandardCharsets.UTF_8)
    }.toMap

  private def route(ex: HttpExchange, path: String, q: Map[String, String]): Unit =
    path match {
      case p if extraBodies.synchronized { extraBodies.contains((ex.getRequestMethod, p)) } =>
        respond(ex, 200, "application/json",
          extraBodies.synchronized { extraBodies((ex.getRequestMethod, p)) })
      case "/svc/$metadata" =>
        respond(ex, 200, "application/xml", metadataXml)
      case "/svc/Customers/$count" =>
        if (countStatus != 200) respond(ex, countStatus, "text/plain", "count disabled")
        else {
          val filtered = applyFilter(rows, q.get("$filter"))
          respond(ex, 200, "text/plain", filtered.size.toString)
        }
      case p if p.startsWith("/svc/Customers(") && ex.getRequestMethod == "PATCH" =>
        val key = p.stripPrefix("/svc/Customers(").stripSuffix(")")
          .stripPrefix("'").stripSuffix("'")
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        patchedKeys.synchronized { patchedKeys += (key -> body) }
        respond(ex, 200, "application/json", "{}")
      case p if p.startsWith("/svc/Customers(") && ex.getRequestMethod == "DELETE" =>
        val key = p.stripPrefix("/svc/Customers(").stripSuffix(")")
          .stripPrefix("'").stripSuffix("'")
        deletedKeys.synchronized {
          deletedKeys += key
          if (applyDeletes) rows = rows.filterNot(_("CustomerID") == key)
        }
        respond(ex, 200, "application/json", "{}")
      case "/svc/Customers" if ex.getRequestMethod == "POST" =>
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        postedItems.synchronized { postedItems += body }
        respond(ex, 201, "application/json", body)
      case p if p.endsWith("/$batch") && ex.getRequestMethod == "POST" =>
        // OData JSON batch: POST sub-requests hit the item sinks; GET
        // sub-requests are served from the Customers fixture (other sets
        // answer an empty page) so read-side batching is drivable e2e
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        batchBodies.synchronized { batchBodies += body }
        val reqs = jsonMapper.readTree(body).get("requests")
        // sub-request GET urls recorded like top-level requests: specs
        // assert on the data urls a scan produced regardless of transport
        (0 until reqs.size).foreach { i =>
          val r = reqs.get(i)
          if (r.get("method").asText == "GET") {
            val u = r.get("url").asText
            val rel = u.indexOf("://") match {
              case -1 => u
              case p  => u.substring(u.indexOf('/', p + 3))
            }
            // "batch:" marker: specs matching data urls see them; specs
            // counting INDEPENDENT round-trips can exclude them
            requests.synchronized { requests += "batch:" + java.net.URLDecoder.decode(rel, "UTF-8") }
          }
        }
        val resps = (0 until reqs.size).map { i =>
          val r = reqs.get(i)
          val id = r.get("id").asText
          val u = r.get("url").asText.stripSuffix("/")
          val method = r.get("method").asText
          if (method == "POST" && (u.endsWith("Customers") || u.endsWith("items"))) {
            postedItems.synchronized { postedItems += r.get("body").toString }
            s"""{"id":"$id","status":201,"body":{}}"""
          } else if (method == "GET") {
            val (path, rawQ) = u.indexOf('?') match {
              case -1 => (u, "")
              case q  => (u.take(q), u.drop(q + 1))
            }
            val sq = parseQuery(rawQ)
            if (sq.contains("$apply")) {
              if (applyStatus != 200)
                s"""{"id":"$id","status":$applyStatus,"body":{}}"""
              else {
                val body = applyBody(sq("$apply"), sq.get("$top").map(_.toInt),
                  sq.get("$orderby"))
                s"""{"id":"$id","status":200,"body":$body}"""
              }
            } else if (path.split('/').last == "Customers") {
              // honor the sub-request's `Prefer: odata.maxpagesize` (ADVICE
              // r8): serve only the first page and a nextLink, so the
              // production preloaded-page + follow-up-GET continuation is
              // exercised end-to-end. Shaping (filter/order/skip) is shared
              // with serveRows, so the continuation slices the same sequence.
              val mps = preferPageSize(
                Option(r.get("headers")).flatMap(h => Option(h.get("Prefer")))
                  .map(_.asText))
              val data = shapeRows(sq)
              val explicitTop = sq.get("$top").map(_.toInt)
              val limited = explicitTop.map(data.take).getOrElse(data)
              val (slice, more) = mps match {
                case Some(m) if explicitTop.isEmpty && limited.size > m =>
                  (limited.take(m), true)
                case _ => (limited, false)
              }
              val select = sq.get("$select").map(_.split(',').map(_.trim).toSeq)
              val items = slice.map(jsonObj(_, select)).mkString("[", ",", "]")
              val next =
                if (!more) None
                else {
                  val keep = sq.filter { case (k, _) => k.startsWith("$") }
                    .map { case (k, v) =>
                      s"$k=${java.net.URLEncoder.encode(v, "UTF-8")}" }
                  Some(s"$serviceUrl/Customers?${(keep ++ Seq("__page=1")).mkString("&")}")
                }
              val body = s"""{"value":$items${next.map(l =>
                s""","@odata.nextLink":"$l"""").getOrElse("")}}"""
              s"""{"id":"$id","status":200,"body":$body}"""
            } else s"""{"id":"$id","status":200,"body":{"value":[]}}"""
          } else s"""{"id":"$id","status":400,"body":{}}"""
        }
        respond(ex, 200, "application/json",
          s"""{"responses":[${resps.mkString(",")}]}""")
      case "/svc/Customers" =>
        serveRows(ex, q)
      case "/svc/OdpCustomers" =>
        serveOdp(ex, q)
      case "/svc" | "/svc/" =>
        respond(ex, 200, "application/json", """{"value":[{"name":"Customers","url":"Customers"}]}""")
      case "/sap/opu/odata/iwfnd/catalogservice;v=2/ServiceCollection" =>
        // Gateway catalog with $expand=EntitySets (v2 envelope): one service
        // carrying ODP-patterned and plain entity sets
        respond(ex, 200, "application/json",
          s"""{"d":{"results":[
             |{"ID":"ZSVC_1","Description":"Sales service",
             |"ServiceUrl":"http://localhost:$port/svc",
             |"EntitySets":{"results":[
             |  {"ID":"ENTITYOFSALESORDER","Description":"EntityOfSalesOrder"},
             |  {"ID":"FactsOfRevenue","Description":"FactsOfRevenue"},
             |  {"ID":"AttrOfCustomer","Description":"AttrOfCustomer"},
             |  {"ID":"Customers","Description":"Plain set"}]}}]}}"""
            .stripMargin.replace("\n", ""))
      case "/flaky" =>
        // fails twice per "key", then succeeds — for retry tests
        val key = q.getOrElse("key", "k")
        val n = flakyCounts.synchronized {
          val v = flakyCounts.getOrElse(key, 0) + 1; flakyCounts(key) = v; v
        }
        if (n <= 2) respond(ex, 503, "text/plain", "try again")
        else respond(ex, 200, "text/plain", s"ok after $n")
      case "/workbook/range" =>
        respond(ex, 200, "application/json",
          """{"address":"Sheet1!A1:C3","values":[["Name","Qty","Price"],["apple","3","1.25"],["pear",null,"0.99"]]}""")
      case "/counter" =>
        val n = counterHits.synchronized { counterHits += 1; counterHits }
        respond(ex, 200, "text/plain", s"hit $n")
      case "/token" if ex.getRequestMethod == "POST" =>
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        tokenRequests.synchronized { tokenRequests += body }
        if (body.contains("grant_type=client_credentials") && body.contains("client_id="))
          respond(ex, 200, "application/json",
            """{"access_token":"cc-token-123","token_type":"Bearer","expires_in":3600}""")
        else if (body.contains("grant_type=authorization_code") &&
          body.contains("code=auth-code-42") && body.contains("code_verifier="))
          respond(ex, 200, "application/json",
            """{"access_token":"pkce-token-9","refresh_token":"r1","token_type":"Bearer","expires_in":3600}""")
        else respond(ex, 400, "application/json", """{"error":"invalid_request"}""")
      case "/items" if ex.getRequestMethod == "POST" =>
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        postedItems.synchronized { postedItems += body }
        respond(ex, 201, "application/json", """{"ok":true}""")
      // ---- Delta Sharing endpoints ----
      case "/shares" =>
        respond(ex, 200, "application/json", """{"items":[{"name":"sales"}]}""")
      case "/shares/sales/schemas" =>
        respond(ex, 200, "application/json", """{"items":[{"name":"core"}]}""")
      case "/shares/sales/schemas/core/tables" =>
        respond(ex, 200, "application/json", """{"items":[{"name":"tx"}]}""")
      case "/shares/sales/schemas/core/tables/tx/metadata" =>
        respond(ex, 200, "application/x-ndjson", shareNdjsonMeta)
      case "/shares/sales/schemas/core/tables/tx/query" =>
        val files = shareFiles.zipWithIndex.map { case (p, i) =>
          s"""{"file":{"url":"http://localhost:$port/files/f$i","id":"f$i","size":${java.nio.file.Files.size(p)}}}"""
        }
        respond(ex, 200, "application/x-ndjson",
          (Seq(shareNdjsonMeta.trim) ++ files).mkString("\n"))
      case p if p.startsWith("/files/") =>
        val idx = p.stripPrefix("/files/f").toInt
        val bytes = java.nio.file.Files.readAllBytes(shareFiles(idx))
        ex.getResponseHeaders.set("Content-Type", "application/octet-stream")
        ex.sendResponseHeaders(200, bytes.length)
        val os = ex.getResponseBody; os.write(bytes); os.close()
      // generic service-shaped fallbacks: any path ending in /$metadata or
      // /Customers behaves like the /svc service — lets the service-family
      // URL builders (BC companies(...), Dataverse /api/data/v9.2, Graph,
      // Datasphere consumption paths) run end-to-end against the stub
      case p if p.endsWith("/$metadata") =>
        respond(ex, 200, "application/xml", metadataXml)
      case p if p.endsWith("/Customers") && ex.getRequestMethod == "GET" =>
        serveRows(ex, q)
      case p if p.endsWith("/companies") && ex.getRequestMethod == "GET" =>
        serveRows(ex, q)
      case p if p.endsWith("/EntityDefinitions") =>
        respond(ex, 200, "application/json",
          """{"value":[{"LogicalName":"account","SchemaName":"Account","EntitySetName":"accounts","PrimaryIdAttribute":"accountid","IsCustomEntity":false},
            |{"LogicalName":"new_widget","SchemaName":"new_Widget","EntitySetName":"new_widgets","PrimaryIdAttribute":"new_widgetid","IsCustomEntity":true}]}"""
            .stripMargin.replace("\n", ""))
      case p if p.endsWith("/Customers/$count") =>
        if (countStatus != 200) respond(ex, countStatus, "text/plain", "count disabled")
        else respond(ex, 200, "text/plain",
          applyFilter(rows, q.get("$filter")).size.toString)
      case _ => respond(ex, 404, "text/plain", s"not found: $path")
    }

  /** ODP endpoint: initial load returns the snapshot + a delta link; a
    * `!deltatoken=Tk` request returns batches k.. and the advanced token.
    * `Prefer: odata.track-changes` is acknowledged via Preference-Applied. */
  private def serveOdp(ex: HttpExchange, q: Map[String, String]): Unit = {
    val token = q.get("!deltatoken")
    val (slice, consumed) = deltas.synchronized {
      token match {
        case None => (rows, 0)
        case Some(t) =>
          val k = t.stripPrefix("T").toInt
          (deltas.drop(k).flatten.toSeq, deltas.size)
      }
    }
    val newToken = s"T${if (token.isEmpty) 0 else consumed}"
    val items = slice.map(r => jsonObj(r, None)).mkString("[", ",", "]")
    val link = s"$serviceUrl/OdpCustomers?!deltatoken=$newToken"
    val body =
      if (v2) s"""{"d":{"results":$items,"__delta":"$link"}}"""
      else s"""{"value":$items,"@odata.deltaLink":"$link"}"""
    Option(ex.getRequestHeaders.getFirst("Prefer")).foreach { p =>
      if (p.contains("odata.track-changes"))
        ex.getResponseHeaders.set("Preference-Applied", "odata.track-changes")
    }
    respond(ex, 200, "application/json", body)
  }

  /** `Prefer: odata.maxpagesize=N` → N (the page size a client ASKED for —
    * real services honor it; the stub does too so preloaded-first-page +
    * nextLink continuation is drivable end-to-end). */
  private def preferPageSize(prefer: Option[String]): Option[Int] =
    prefer.flatMap("odata\\.maxpagesize=(\\d+)".r.findFirstMatchIn(_))
      .map(_.group(1).toInt)

  /** Shared row shaping ($filter + $orderby + $skip) — used by BOTH the
    * top-level GET and the `$batch` sub-request path, so a batched first
    * page and its nextLink continuation slice one consistent sequence. */
  private def shapeRows(q: Map[String, String]): Seq[Map[String, Any]] = {
    var data = applyFilter(rows, q.get("$filter"))
    q.get("$orderby").foreach { ob =>
      val keys = ob.split(',').map(_.trim).map { part =>
        val bits = part.split("\\s+")
        (bits(0), bits.length > 1 && bits(1).equalsIgnoreCase("desc"))
      }
      val ord = new Ordering[Map[String, Any]] {
        def compare(a: Map[String, Any], b: Map[String, Any]): Int = {
          keys.foreach { case (f, desc) =>
            val c = (a(f), b(f)) match {
              case (x: Long, y: Long) => x.compareTo(y)
              case (x, y) => x.toString.compareTo(y.toString)
            }
            if (c != 0) return if (desc) -c else c
          }
          0
        }
      }
      data = data.sorted(ord)
    }
    q.get("$skip").map(_.toInt).foreach(n => data = data.drop(n))
    data
  }

  private def serveRows(ex: HttpExchange, q: Map[String, String]): Unit = {
    if (q.contains("$skip") && skipStatus != 200) {
      respond(ex, skipStatus, "text/plain", "$skip not supported"); return
    }
    if (q.contains("$apply")) {
      if (applyStatus != 200) respond(ex, applyStatus, "text/plain", "$apply not supported")
      else serveApply(ex, q("$apply"), q.get("$top").map(_.toInt), q.get("$orderby"))
      return
    }
    var data = shapeRows(q)
    val explicitTop = q.get("$top").map(_.toInt)
    explicitTop.foreach(n => data = data.take(n))
    // nextLink pagination for unlimited scans; a requested
    // `Prefer: odata.maxpagesize` overrides the stub's default page size
    // (what real services do — and what makes a batched first page and its
    // follow-up GETs slice the same sequence at the same granularity)
    val psz = preferPageSize(Option(ex.getRequestHeaders.getFirst("Prefer")))
      .getOrElse(pageSize)
    val page = q.getOrElse("__page", "0").toInt
    val (slice, hasMore) =
      if (explicitTop.isDefined) (data, false)
      else (data.slice(page * psz, (page + 1) * psz),
        data.size > (page + 1) * psz)
    val select = q.get("$select").map(_.split(',').map(_.trim).toSeq)
    val expandRaw = q.getOrElse("$expand", "")
    val expand = expandRaw.contains("Orders")
    val expandItems = expandRaw.contains("Items") // Orders/Items or Orders($expand=Items)
    val items = slice.map(r => jsonObj(r, select, expand, expandItems)).mkString("[", ",", "]")
    val nextLink =
      if (!hasMore) None
      else {
        val keep = q.filter { case (k, _) => k.startsWith("$") }
          .map { case (k, v) => s"$k=${java.net.URLEncoder.encode(v, "UTF-8")}" }
        Some(s"$serviceUrl/Customers?${(keep ++ Seq(s"__page=${page + 1}")).mkString("&")}")
      }
    val body =
      if (v2)
        s"""{"d":{"results":$items${nextLink.map(l => s""","__next":"$l"""").getOrElse("")}}}"""
      else
        s"""{"value":$items${nextLink.map(l => s""","@odata.nextLink":"$l"""").getOrElse("")}}"""
    respond(ex, 200, "application/json", body)
  }

  /** Tiny `$apply` evaluator: `filter(...)` / `groupby((cols),aggregate(...))`
    * / bare `aggregate(...)` stages separated by '/'. Aggregate specs:
    * `$count as X` and `Col with sum|min|max|average|countdistinct as X`.
    * `$orderby`/`$top` evaluate AFTER the pipeline, over the group rows
    * (OData aggregation spec section on system query options). */
  private def serveApply(ex: HttpExchange, apply: String, top: Option[Int],
                         orderby: Option[String] = None): Unit =
    respond(ex, 200, "application/json", applyBody(apply, top, orderby))

  private def applyBody(apply: String, top: Option[Int],
                        orderby: Option[String] = None): String = {
    var data = rows
    var groupCols: Seq[String] = Seq.empty
    var aggSpecs: Seq[(String, String, String)] = Seq.empty // (fn, col, alias)
    def parseAggs(s: String): Seq[(String, String, String)] =
      s.split(',').map(_.trim).toSeq.map { spec =>
        val m1 = "^\\$count as (\\w+)$".r.findFirstMatchIn(spec)
        val m2 = "^(\\w+) with (\\w+) as (\\w+)$".r.findFirstMatchIn(spec)
        (m1, m2) match {
          case (Some(m), _) => ("count", "", m.group(1))
          case (_, Some(m)) => (m.group(2), m.group(1), m.group(3))
          case _ => throw new IllegalArgumentException(s"bad aggregate spec: $spec")
        }
      }
    // '/' only separates stages in our URLs (no literals contain it)
    apply.split('/').map(_.trim).foreach {
      case s if s.startsWith("filter(") && s.endsWith(")") =>
        data = applyFilter(data, Some(s.stripPrefix("filter(").stripSuffix(")")))
      case s if s.startsWith("groupby(") && s.endsWith(")") =>
        val inner = s.stripPrefix("groupby(").stripSuffix(")")
        val m = "^\\(([^)]*)\\),aggregate\\((.*)\\)$".r.findFirstMatchIn(inner)
          .getOrElse(throw new IllegalArgumentException(s"bad groupby: $inner"))
        groupCols = m.group(1).split(',').map(_.trim).toSeq.filter(_.nonEmpty)
        aggSpecs = parseAggs(m.group(2))
      case s if s.startsWith("aggregate(") && s.endsWith(")") =>
        aggSpecs = parseAggs(s.stripPrefix("aggregate(").stripSuffix(")"))
      case s => throw new IllegalArgumentException(s"bad $$apply stage: $s")
    }
    def num(v: Any): Double = v match {
      case l: Long => l.toDouble; case i: Int => i.toDouble
      case d: Double => d; case s: String => s.toDouble
    }
    val groups: Seq[(Seq[(String, Any)], Seq[Map[String, Any]])] =
      if (groupCols.isEmpty) Seq((Seq.empty, data))
      else data.groupBy(r => groupCols.map(c => c -> r(c))).toSeq
        .sortBy(_._1.map(_._2.toString).mkString("|")).map { case (k, v) => (k, v) }
    // typed group rows first (so $orderby can compare), then JSON rendering
    val outRows: Seq[Seq[(String, Any)]] = groups.map { case (key, grp) =>
      val aggVals: Seq[(String, Any)] = aggSpecs.map { case (fn, col, alias) =>
        val v: Any = fn match {
          case "count" => grp.size.toLong
          case "countdistinct" => grp.map(_(col)).distinct.size.toLong
          case "sum" =>
            val s = grp.map(r => num(r(col))).sum
            if (s == s.floor) s.toLong else s
          case "min" | "max" =>
            val vs = grp.map(_(col))
            if (vs.forall(_.isInstanceOf[Long])) {
              val l = vs.map(_.asInstanceOf[Long]); if (fn == "min") l.min else l.max
            } else { val ss = vs.map(_.toString); if (fn == "min") ss.min else ss.max }
          case "average" => grp.map(r => num(r(col))).sum / grp.size
        }
        alias -> v
      }
      key ++ aggVals
    }
    val sorted = orderby match {
      case None => outRows
      case Some(ob) =>
        val keys = ob.split(',').map(_.trim).map { part =>
          val bits = part.split("\\s+")
          (bits(0), bits.length > 1 && bits(1).equalsIgnoreCase("desc"))
        }
        val ord = new Ordering[Seq[(String, Any)]] {
          def compare(a: Seq[(String, Any)], b: Seq[(String, Any)]): Int = {
            val ma = a.toMap; val mb = b.toMap
            keys.foreach { case (f, desc) =>
              val c = (ma(f), mb(f)) match {
                case (x: Long, y: Long) => x.compareTo(y)
                case (x: Double, y: Double) => x.compareTo(y)
                case (x, y) => x.toString.compareTo(y.toString)
              }
              if (c != 0) return if (desc) -c else c
            }
            0
          }
        }
        outRows.sorted(ord)
    }
    val limited = top.map(sorted.take).getOrElse(sorted).map { row =>
      row.map { case (c, v) =>
        v match {
          case s: String => s""""$c":"$s""""
          case l: Long => if (v2) s""""$c":"$l"""" else s""""$c":$l"""
          case other => s""""$c":$other"""
        }
      }.mkString("{", ",", "}")
    }
    if (v2) s"""{"d":{"results":${limited.mkString("[", ",", "]")}}}"""
    else s"""{"value":${limited.mkString("[", ",", "]")}}"""
  }

  /** Deterministic orders per customer: customer i has i%3 orders. */
  def ordersOf(customerIdx: Int): Seq[(Int, Double)] =
    (0 until customerIdx % 3).map(k => (customerIdx * 10 + k, customerIdx * 100 + k + 0.5))

  /** Deterministic items per order: order o has (o%2)+1 items. */
  def itemsOf(orderId: Int): Seq[(Int, Int)] =
    (0 to orderId % 2).map(k => (orderId * 100 + k, k + 1))

  private def jsonObj(r: Map[String, Any], select: Option[Seq[String]],
                      expand: Boolean = false, expandItems: Boolean = false): String = {
    val fields = Seq("CustomerID", "CompanyName", "Country", "Revenue", "Founded")
      .filter(f => select.forall(_.contains(f)))
    val expandJson =
      if (!expand) None
      else {
        val idx = r("CustomerID").toString.stripPrefix("C").toInt
        val os = ordersOf(idx).map { case (oid, amt) =>
          val itemsJson =
            if (!expandItems) ""
            else {
              val is = itemsOf(oid).map { case (iid, qty) =>
                s"""{"ItemID":$iid,"Qty":$qty}"""
              }.mkString("[", ",", "]")
              "," + (if (v2) s""""Items":{"results":$is}""" else s""""Items":$is""")
            }
          s"""{"OrderID":$oid,"Amount":$amt$itemsJson}"""
        }.mkString("[", ",", "]")
        Some(if (v2) s""""Orders":{"results":$os}""" else s""""Orders":$os""")
      }
    (fields.map { f =>
      val v = r(f) match {
        case s: String => "\"" + s + "\""
        case l: Long if f == "Founded" =>
          if (v2) s""""/Date($l)/""""
          else "\"" + java.time.Instant.ofEpochMilli(l).toString + "\""
        case l: Long =>
          if (v2) "\"" + l.toString + "\"" else l.toString // v2 serializes Int64 as string
        case other => other.toString
      }
      s""""$f":$v"""
    } ++ expandJson).mkString("{", ",", "}")
  }

  // ---- tiny $filter evaluator (eq/ne/gt/ge/lt/le, and/or, startswith) ------
  private def applyFilter(data: Seq[Map[String, Any]], filter: Option[String]): Seq[Map[String, Any]] =
    filter match {
      case None => data
      case Some(f) => data.filter(r => evalFilter(f.trim, r))
    }

  def evalFilter(expr: String, row: Map[String, Any]): Boolean = {
    val e = stripParens(expr.trim)
    splitTop(e, " or ") match {
      case Some((l, r)) => evalFilter(l, row) || evalFilter(r, row)
      case None => splitTop(e, " and ") match {
        case Some((l, r)) => evalFilter(l, row) && evalFilter(r, row)
        case None => evalComparison(e, row)
      }
    }
  }

  private def stripParens(s: String): String = {
    var e = s.trim
    while (e.startsWith("(") && e.endsWith(")") && balanced(e.substring(1, e.length - 1)))
      e = e.substring(1, e.length - 1).trim
    e
  }
  private def balanced(s: String): Boolean = {
    var d = 0
    s.foreach { c =>
      if (c == '(') d += 1 else if (c == ')') d -= 1
      if (d < 0) return false
    }
    d == 0
  }
  private def splitTop(s: String, op: String): Option[(String, String)] = {
    var depth = 0; var inStr = false; var i = 0
    while (i < s.length - op.length + 1) {
      val c = s.charAt(i)
      if (c == '\'') inStr = !inStr
      else if (!inStr && c == '(') depth += 1
      else if (!inStr && c == ')') depth -= 1
      if (!inStr && depth == 0 && s.regionMatches(i, op, 0, op.length))
        return Some((s.take(i), s.drop(i + op.length)))
      i += 1
    }
    None
  }

  private def evalComparison(e: String, row: Map[String, Any]): Boolean = {
    if (e.startsWith("startswith(")) {
      val inner = e.stripPrefix("startswith(").stripSuffix(")")
      val Array(f, v) = inner.split(",", 2).map(_.trim)
      return row(f).toString.startsWith(v.stripPrefix("'").stripSuffix("'"))
    }
    if (e.startsWith("not ")) return !evalFilter(e.stripPrefix("not "), row)
    val m = "^(\\w+) (eq|ne|gt|ge|lt|le) (.+)$".r.findFirstMatchIn(e)
      .getOrElse(throw new IllegalArgumentException(s"bad filter: $e"))
    val (field, op, litRaw) = (m.group(1), m.group(2), m.group(3).trim)
    val actual = row.get(field).orNull
    if (litRaw == "null")
      return if (op == "eq") actual == null else actual != null
    val cmp: Int = actual match {
      case s: String => s.compareTo(litRaw.stripPrefix("'").stripSuffix("''").stripSuffix("'"))
      case l: Long   => l.compareTo(litRaw.toLong)
      case i: Int    => i.toLong.compareTo(litRaw.toLong)
      case null      => return false
      case other     => other.toString.compareTo(litRaw)
    }
    op match {
      case "eq" => cmp == 0
      case "ne" => cmp != 0
      case "gt" => cmp > 0
      case "ge" => cmp >= 0
      case "lt" => cmp < 0
      case "le" => cmp <= 0
    }
  }

  private def respond(ex: HttpExchange, status: Int, ct: String, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", ct)
    ex.sendResponseHeaders(status, bytes.length)
    val os = ex.getResponseBody
    os.write(bytes); os.close()
  }
}
