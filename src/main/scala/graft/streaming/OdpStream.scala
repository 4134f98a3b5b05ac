package graft.streaming

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.sources.http.HttpAuth
import graft.sources.odata.{EdmxParser, ODataJson}
import graft.sources.http.HttpCore
import scala.jdk.CollectionConverters._

/** ODP CDC as an idiomatic Structured Streaming source (SURVEY.md §2.6 tier
  * 2): `spark.readStream.format("odp").option("url", ...).load()`.
  *
  * Offset = (batch counter, delta token). Each trigger's `latestOffset()`
  * performs the actual ODP fetch (initial load with `Prefer:
  * odata.track-changes`, then delta fetches with the stored token) and
  * buffers the decoded rows; `planInputPartitions` serves the buffered batch.
  * The delta token is ALSO persisted in the [[OdpStateStore]] (stateDir
  * option) so a restarted query resumes the server-side subscription — the
  * Spark checkpoint handles batch bookkeeping, the store handles the token,
  * mirroring the reference's subscriptions table. Delivery is at-least-once
  * (whatever the server resends), like the reference.
  */
class OdpStreamSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "odp"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val url = options.get("url")
    val serviceRoot = url.substring(0, url.lastIndexOf('/'))
    val setName = url.substring(url.lastIndexOf('/') + 1)
    val resp = HttpCore.shared.get(serviceRoot + "/$metadata")
    EdmxParser.parse(resp.text).schemaOfSet(setName)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new OdpStreamTable(schema, properties.asScala.toMap)
}

class OdpStreamTable(schema: StructType, options: Map[String, String])
  extends Table with SupportsRead {
  override def name(): String = s"odp(${options("url")})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new OdpMicroBatchStream(schema, options, checkpointLocation)
    }
}

final case class OdpOffset(batch: Long, token: Option[String]) extends Offset {
  override def json(): String =
    s"""{"batch":$batch,"token":${token.map("\"" + _ + "\"").getOrElse("null")}}"""
}
object OdpOffset {
  def fromJson(s: String): OdpOffset = {
    val n = ODataJson.parse(s)
    OdpOffset(n.get("batch").asLong,
      Option(n.get("token")).filter(!_.isNull).map(_.asText))
  }
}

class OdpMicroBatchStream(schema: StructType, options: Map[String, String],
                          checkpointLocation: String) extends MicroBatchStream {

  private val url = options("url")
  private val stateDir = options.getOrElse("statedir",
    checkpointLocation.stripSuffix("/") + "/odp-state")
  private val auth = HttpAuth(options.get("bearertoken"),
    options.get("user"), options.get("password"))
  private val maxPageSize = options.get("pagesize").map(_.toInt)

  private val store = new OdpStateStore(stateDir)
  private val subId = java.util.UUID.nameUUIDFromBytes(
    url.getBytes("UTF-8")).toString
  private val client = new OdpClient(schema, auth, maxPageSize)

  // buffered rows per batch id (this instance's fetches only)
  private val buffers = new java.util.concurrent.ConcurrentHashMap[Long, Array[InternalRow]]()
  @volatile private var lastPlanned: OdpOffset = _

  override def initialOffset(): Offset = OdpOffset(-1L, None)
  override def deserializeOffset(json: String): Offset = OdpOffset.fromJson(json)

  override def latestOffset(): Offset = {
    val prior = store.load(subId)
    val token = prior.flatMap(_.deltaToken)
    val batch = prior.map(_.batch).getOrElse(-1L)
    val t0 = System.currentTimeMillis()
    val res = client.fetch(url, token)
    if (res.rows.isEmpty && res.newToken.forall(t => token.contains(t)) && batch >= 0) {
      // no progress: stay at current offset
      OdpOffset(batch, token)
    } else {
      val next = batch + 1
      val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToCatalystConverter(schema)
      buffers.put(next, res.rows.map(r => conv(r).asInstanceOf[InternalRow]).toArray)
      store.save(OdpSubscription(subId, res.newToken.orElse(token),
        if (token.isDefined || batch >= 0) "DELTA_FETCH" else "INITIAL_LOAD",
        res.preferenceApplied, next))
      store.audit(subId, res.httpStatus, res.rows.size, token,
        res.newToken.orElse(token), System.currentTimeMillis() - t0)
      OdpOffset(next, res.newToken.orElse(token))
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[OdpOffset]
    val e = end.asInstanceOf[OdpOffset]
    lastPlanned = e
    val rows = (s.batch + 1 to e.batch).flatMap(b =>
      Option(buffers.get(b)).getOrElse(Array.empty[InternalRow])).toArray
    Array(OdpRowsPartition(rows))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val rows = partition.asInstanceOf[OdpRowsPartition].rows
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < rows.length }
        override def get(): InternalRow = rows(i)
        override def close(): Unit = ()
      }
    }

  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[OdpOffset]
    buffers.keySet().asScala.filter(_ <= e.batch).foreach(buffers.remove(_))
  }

  override def stop(): Unit = ()
}

final case class OdpRowsPartition(rows: Array[InternalRow]) extends InputPartition
