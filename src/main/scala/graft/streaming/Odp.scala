package graft.streaming

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.types.StructType
import graft.sources.http.{HttpAuth, HttpCore}
import graft.sources.odata.{EdmxParser, ODataJson, ODataUrl}

/** SAP ODP incremental / CDC reads — the reference's only streaming
  * capability (SURVEY.md §2.6; `src/odp_*.cpp`, ~3.3k LoC):
  *
  *  - subscription lifecycle INITIAL_LOAD → DELTA_FETCH (+ ERROR/TERMINATED)
  *    (`odp_subscription_state_manager.hpp:25-27`);
  *  - the initial load sends `Prefer: odata.track-changes`
  *    (+ `odata.maxpagesize=n`), acknowledged via `Preference-Applied`
  *    (`odp_http_request_factory.cpp:159-184`);
  *  - the delta token arrives in the delta link (v2 `!deltatoken=` /
  *    v4 `@odata.deltaLink`) and the next read appends it to the URL;
  *  - durable state: subscriptions + per-request audit rows
  *    (`odp_subscription_repository.cpp:594-634`).
  *
  * Two tiers, matching SURVEY §2.6:
  *  1. [[OdpReader]] — batch-incremental parity (exactly what the reference
  *     does: each call returns the new rows and persists the token);
  *  2. [[OdpMicroBatchStream]] via `spark.readStream.format("odp")` — the
  *     idiomatic Spark mapping where Offset = delta token and the Spark
  *     checkpoint supplies restart durability. Delivery is at-least-once —
  *     whatever the server resends, like the reference.
  */
final case class OdpSubscription(
    subscriptionId: String,
    deltaToken: Option[String],
    status: String, // INITIAL_LOAD | DELTA_FETCH | TERMINATED
    preferenceApplied: Boolean,
    batch: Long = -1L) // streaming-tier micro-batch counter (own field,
                       // NOT overloaded onto status — lifecycle parity with
                       // `odp_subscription_state_manager.hpp:25-27`)

/** Durable token + audit store, one JSON file per subscription + an
  * append-only audit log (the port of `erpl_web.odp_subscriptions` /
  * `odp_subscription_audit`). Resolved through Hadoop's FileSystem so the
  * dir may be any Spark-reachable URI — `file:///`, `hdfs://`, `s3a://` —
  * which is exactly what Spark hands us as a checkpointLocation; on a real
  * cluster the token survives pod loss alongside the checkpoint. */
class OdpStateStore(dir: String) {
  import org.apache.hadoop.fs.{FileSystem, Path}
  private val hadoopConf =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())
  private val base = new Path(dir)
  private val fs: FileSystem = base.getFileSystem(hadoopConf)
  fs.mkdirs(base)

  private def fileFor(id: String) = new Path(base, s"$id.json")
  private val auditFile = new Path(base, "audit.jsonl")

  private def readString(p: Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }
  private def writeString(p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  def load(id: String): Option[OdpSubscription] = {
    val f = fileFor(id)
    if (!fs.exists(f)) None
    else {
      val n = ODataJson.parse(readString(f))
      Some(OdpSubscription(
        n.get("subscription_id").asText,
        Option(n.get("delta_token")).filter(!_.isNull).map(_.asText),
        n.get("status").asText,
        n.get("preference_applied").asBoolean,
        Option(n.get("batch")).map(_.asLong).getOrElse(-1L)))
    }
  }

  def save(s: OdpSubscription): Unit = {
    val tok = s.deltaToken.map(t => "\"" + t.replace("\"", "\\\"") + "\"").getOrElse("null")
    writeString(fileFor(s.subscriptionId),
      s"""{"subscription_id":"${s.subscriptionId}","delta_token":$tok,""" +
        s""""status":"${s.status}","preference_applied":${s.preferenceApplied},""" +
        s""""batch":${s.batch}}""")
  }

  def remove(id: String): Unit = fs.delete(fileFor(id), false)

  def list(): Seq[OdpSubscription] = {
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".json"))
      .flatMap(p => load(p.getName.stripSuffix(".json")))
  }

  /** Audit parity: timestamps, http status, rows fetched, token before/after,
    * duration (`odp_subscription_repository.cpp:594-634`). */
  def audit(id: String, httpStatus: Int, rows: Long,
            tokenBefore: Option[String], tokenAfter: Option[String],
            durationMs: Long): Unit = {
    val line =
      s"""{"ts":"${java.time.Instant.now()}","subscription_id":"$id",""" +
        s""""http_status":$httpStatus,"rows_fetched":$rows,""" +
        s""""token_before":${tokenBefore.map("\"" + _ + "\"").getOrElse("null")},""" +
        s""""token_after":${tokenAfter.map("\"" + _ + "\"").getOrElse("null")},""" +
        s""""duration_ms":$durationMs}""" + "\n"
    // append-with-create: HDFS-style appends aren't universal, so rewrite
    // read+concat for portability (audit volume is one line per fetch)
    val prior = if (fs.exists(auditFile)) readString(auditFile) else ""
    writeString(auditFile, prior + line)
  }
}

final case class OdpFetchResult(rows: Seq[Row], newToken: Option[String],
                                preferenceApplied: Boolean, httpStatus: Int)

/** Driver-side ODP page loop: one full load or delta fetch, following
  * nextLinks, capturing the delta token from the final page. (The reference's
  * scan is also effectively single-threaded — SURVEY §3.1; the row volume of
  * a CDC delta is bounded by change rate, not table size.) */
class OdpClient(schema: StructType, auth: HttpAuth = HttpAuth(),
                maxPageSize: Option[Int] = None, http: HttpCore = HttpCore.shared) {

  private val V2TokenRe = """[!?]deltatoken=([^&\s"]+)""".r

  def fetch(url: String, token: Option[String]): OdpFetchResult = {
    val first = token match {
      case Some(t) => ODataUrl.parse(url).withParam("!deltatoken", t).render
      case None    => url
    }
    val prefer = (Seq("odata.track-changes") ++
      maxPageSize.map(n => s"odata.maxpagesize=$n")).mkString(", ")
    val headers = if (token.isEmpty) Map("Prefer" -> prefer) else Map.empty[String, String]

    val toRow = CatalystTypeConverters.createToScalaConverter(schema)
    var rows = Vector.newBuilder[Row]
    var next: Option[String] = Some(first)
    var newToken: Option[String] = None
    var prefApplied = false
    var status = 0
    while (next.isDefined) {
      val resp = http.get(next.get, headers = headers, auth = auth, useCache = false)
      status = resp.status
      if (resp.status != 200)
        throw new RuntimeException(s"ODP GET ${next.get} -> HTTP ${resp.status}")
      prefApplied |= resp.headers.get("preference-applied").exists(_.contains("track-changes"))
      val root = ODataJson.parse(resp.text)
      val page = ODataJson.extractPage(root)
      page.rows.foreach { n =>
        rows += toRow(ODataJson.decodeRow(n, schema)).asInstanceOf[Row]
      }
      // delta link: v4 @odata.deltaLink / v2 __delta on the last page
      val deltaLink = Option(root.get("@odata.deltaLink")).map(_.asText)
        .orElse(Option(root.path("d").get("__delta")).map(_.asText))
      deltaLink.foreach { l =>
        newToken = V2TokenRe.findFirstMatchIn(l).map(_.group(1))
          .orElse(Some(l.substring(l.lastIndexOf('=') + 1)))
      }
      next = page.nextLink
    }
    OdpFetchResult(rows.result(), newToken, prefApplied, status)
  }
}

/** Batch-incremental ODP reads with durable local state — reference parity
  * tier. Named controls match the reference's: `forceFullLoad`,
  * `importDeltaToken`, `maxPageSize` (`odp_odata_read_functions.cpp:33-50`).
  */
class OdpReader(spark: SparkSession, url: String, stateDir: String,
                auth: HttpAuth = HttpAuth(), maxPageSize: Option[Int] = None,
                httpOverride: Option[HttpCore] = None) {

  val subscriptionId: String = java.util.UUID.nameUUIDFromBytes(
    url.getBytes(StandardCharsets.UTF_8)).toString
  val store = new OdpStateStore(stateDir)

  lazy val schema: StructType = {
    val serviceRoot = url.substring(0, url.lastIndexOf('/'))
    val setName = url.substring(url.lastIndexOf('/') + 1)
    val resp = httpOverride.getOrElse(HttpCore.shared).get(serviceRoot + "/$metadata", auth = auth)
    EdmxParser.parse(resp.text).schemaOfSet(setName)
  }

  def read(forceFullLoad: Boolean = false,
           importDeltaToken: Option[String] = None): DataFrame = {
    val prior = store.load(subscriptionId)
    val token =
      if (forceFullLoad) None
      else importDeltaToken.orElse(prior.flatMap(_.deltaToken))
    val t0 = System.currentTimeMillis()
    val client = new OdpClient(schema, auth, maxPageSize,
      httpOverride.getOrElse(HttpCore.shared))
    val res = client.fetch(url, token)
    store.save(OdpSubscription(subscriptionId,
      res.newToken.orElse(token),
      if (res.newToken.isDefined || token.isDefined) "DELTA_FETCH" else "INITIAL_LOAD",
      res.preferenceApplied))
    store.audit(subscriptionId, res.httpStatus, res.rows.size,
      token, res.newToken.orElse(token), System.currentTimeMillis() - t0)
    spark.createDataFrame(
      spark.sparkContext.parallelize(res.rows.toSeq, math.max(1, res.rows.size / 10000)),
      schema)
  }

  def listSubscriptions(): Seq[OdpSubscription] = store.list()
  def removeSubscription(): Unit = store.remove(subscriptionId)
}
