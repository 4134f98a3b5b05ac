package graft.writes

import graft.sources.odata.ODataJson

/** OData JSON batch round-trips (OData 4.01 `$batch`; the same shape
  * Microsoft Graph serves at `/$batch`) — N sub-requests in ONE HTTP
  * round-trip. The reference has no batching at all (every INSERT row is its
  * own POST, `graph_sharepoint_functions.cpp:843+`); this is beyond-reference
  * but essential at scale: a 1M-row INSERT at one POST per row is 1M
  * round-trips of latency, at batch size 20 it is 50k.
  *
  * Only the homogeneous POST case is built (the write path's need); the
  * format trivially extends to mixed methods. */
object ODataJsonBatch {

  /** Batch body POSTing each JSON object in `bodies` to `url`. The 4.01
    * spec allows absolute or service-root-relative sub-request URIs; the
    * OData catalog write path passes the RELATIVE form (Microsoft Graph
    * rejects absolute ones). Ids are 1-based ordinals, so failures map back
    * to buffer positions. */
  def buildPostBatch(url: String, bodies: Seq[String]): String =
    bodies.zipWithIndex.map { case (b, i) =>
      s"""{"id":"${i + 1}","method":"POST","url":${JsonEncode.str(url)},""" +
        s""""headers":{"Content-Type":"application/json"},"body":$b}"""
    }.mkString("""{"requests":[""", ",", "]}")

  /** Batch body of GET sub-requests (the READ side: N first pages / probes
    * in one round-trip). `urls` are service-root-relative, ids 1-based. */
  def buildGetBatch(urls: Seq[String],
                    extraHeaders: Map[String, String] = Map.empty): String = {
    val hdrs = (Map("Accept" -> "application/json") ++ extraHeaders)
      .map { case (k, v) => s"${JsonEncode.str(k)}:${JsonEncode.str(v)}" }
      .mkString("{", ",", "}")
    urls.zipWithIndex.map { case (u, i) =>
      s"""{"id":"${i + 1}","method":"GET","url":${JsonEncode.str(u)},""" +
        s""""headers":$hdrs}"""
    }.mkString("""{"requests":[""", ",", "]}")
  }

  /** (id, status, body-as-json-text) per sub-response, in response order —
    * the GET counterpart of [[responseStatuses]]. Missing bodies → "{}". */
  def getResponses(body: String): Seq[(String, Int, String)] = {
    val rs = ODataJson.parse(body).get("responses")
    if (rs == null || !rs.isArray)
      throw new RuntimeException(s"malformed $$batch response: ${body.take(200)}")
    (0 until rs.size).map { i =>
      val r = rs.get(i)
      (Option(r.get("id")).map(_.asText).getOrElse(""),
        Option(r.get("status")).map(_.asInt).getOrElse(0),
        Option(r.get("body")).map(_.toString).getOrElse("{}"))
    }
  }

  /** (id, status) per sub-response, in response order. */
  def responseStatuses(body: String): Seq[(String, Int)] = {
    val rs = ODataJson.parse(body).get("responses")
    if (rs == null || !rs.isArray)
      throw new RuntimeException(s"malformed $$batch response: ${body.take(200)}")
    (0 until rs.size).map { i =>
      val r = rs.get(i)
      (Option(r.get("id")).map(_.asText).getOrElse(""),
        Option(r.get("status")).map(_.asInt).getOrElse(0))
    }
  }
}
