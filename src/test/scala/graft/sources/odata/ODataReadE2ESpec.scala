package graft.sources.odata

import graft.SparkSpecBase
import graft.testkit.ODataStub
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

/** End-to-end: Spark DataFrame reads against the in-process OData stub —
  * the port's equivalent of the reference's sqllogictests against live
  * Northwind (SURVEY.md §5), asserting both results AND what reached the
  * server (pushdown observability, §7.2's success criteria). */
class ODataReadE2ESpec extends SparkSpecBase with BeforeAndAfterAll {

  var v4: ODataStub = _
  var v2: ODataStub = _

  override def beforeAll(): Unit = {
    v4 = new ODataStub(v2 = false).start()
    v2 = new ODataStub(v2 = true).start()
    super.beforeAll()
  }
  override def afterAll(): Unit = {
    if (v4 != null) v4.stop()
    if (v2 != null) v2.stop()
    super.afterAll()
  }

  private def read(stub: ODataStub, extra: (String, String)*) = {
    var r = spark.read.format("odata")
      .option("url", stub.serviceUrl + "/Customers")
    extra.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  test("v4: schema inferred from $metadata; full scan pages via nextLink") {
    val df = read(v4)
    assert(df.schema.fieldNames.toSeq ==
      Seq("CustomerID", "CompanyName", "Country", "Revenue", "Founded"))
    assert(df.schema("Revenue").dataType.typeName == "long")
    assert(df.schema("Founded").dataType.typeName == "timestamp")
    assert(df.collect().length == 20) // collect: count() would push to /$count
    // pagination: 20 rows / pageSize 5 -> at least 4 data requests
    assert(v4.requests.count(_.contains("__page=")) >= 3)
  }

  test("v4: filter/select/limit pushed down to the server") {
    v4.requests.clear()
    val df = read(v4)
      .filter(col("Country") === "Germany")
      .select("CustomerID", "Revenue")
      .limit(3)
    val rows = df.collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getString(0).startsWith("C")))
    val dataReqs = v4.requests.filter(r => r.contains("/Customers?"))
    assert(dataReqs.exists(_.contains("Country eq 'Germany'")),
      s"no \\$$filter in: $dataReqs")
    assert(dataReqs.exists(_.contains("$select=CustomerID,Revenue")),
      s"no \\$$select in: $dataReqs")
    assert(dataReqs.exists(_.contains("$top=3")), s"no \\$$top in: $dataReqs")
  }

  test("v4: numeric comparison filter pushed; residual filters still correct") {
    v4.requests.clear()
    val df = read(v4).filter(col("Revenue") > 15000L)
    assert(df.collect().length == 5) // revenues 16000..20000
    assert(v4.requests.exists(_.contains("Revenue gt 15000")))
  }

  test("v4: offset pushes $skip") {
    v4.requests.clear()
    val df = read(v4).orderBy("CustomerID").offset(15)
    // offset pushdown only fires when Spark plans it against the source;
    // validate rows either way
    assert(df.collect().length == 5)
  }

  test("v2: d.results envelope, string Int64, /Date()/ timestamps decode") {
    val df = read(v2)
    val rows = df.orderBy("CustomerID").collect()
    assert(rows.length == 20)
    assert(rows(0).getAs[Long]("Revenue") == 1000L) // "1000" string -> long
    val ts = rows(0).getAs[java.sql.Timestamp]("Founded")
    assert(ts.toInstant.toString.startsWith("2000-01-01")) // /Date(946684800000)/
  }

  test("v2: $format=json forced and filter pushed with v2 dialect") {
    v2.requests.clear()
    val df = read(v2).filter(col("Country") === "France")
    assert(df.collect().length == 7)
    val dataReqs = v2.requests.filter(_.contains("/Customers?"))
    assert(dataReqs.exists(_.contains("$format=json")), s"no format in $dataReqs")
    assert(dataReqs.exists(_.contains("Country eq 'France'")))
  }

  test("parallel scan: $count probe + $skip/$top range partitions") {
    v4.requests.clear()
    val df = read(v4, "parallelism" -> "4", "partitionRows" -> "5")
    assert(df.collect().length == 20)
    assert(v4.requests.exists(_.contains("/Customers/$count")),
      s"no count probe in ${v4.requests}")
    val ranged = v4.requests.filter(r => r.contains("$skip=") && r.contains("$top="))
    assert(ranged.size >= 2, s"expected ranged partitions, got: ${v4.requests}")
  }

  test("parallel scan: server rejecting $skip falls back to keyset windows") {
    v4.skipStatus = 501
    try {
      v4.requests.clear()
      val df = read(v4, "parallelism" -> "4", "partitionRows" -> "5")
      val ids = df.collect().map(_.getString(0)).toSeq
      assert(ids.length == 20 && ids.distinct.length == 20,
        s"keyset union wrong: $ids") // disjoint + complete windows
      // boundary sweep: keys-only ordered pages
      val sweeps = v4.requests.filter(r =>
        r.contains("$select=CustomerID") && r.contains("$orderby=CustomerID"))
      assert(sweeps.nonEmpty, s"no boundary sweep in ${v4.requests}")
      // 4 partition windows over boundaries C04/C09/C14
      val windows = v4.requests.filter(r =>
        r.contains("/Customers?") && r.contains("$filter=") &&
          !r.contains("$orderby") && (r.contains(" gt ") || r.contains(" le ")))
      assert(windows.exists(_.contains("CustomerID le 'C04'")), s"got $windows")
      assert(windows.exists(r => r.contains("CustomerID gt 'C04'") &&
        r.contains("CustomerID le 'C09'")), s"got $windows")
      assert(windows.exists(_.contains("CustomerID gt 'C14'")), s"got $windows")
      // no $skip-paged data was served
      assert(!v4.requests.exists(r => r.contains("$skip=") && r.contains("$top=5")),
        s"offset ranges used despite 501: ${v4.requests}")
    } finally v4.skipStatus = 200
  }

  test("parallel scan: composite-key keyset windows use row-value or-chains") {
    v4.skipStatus = 501
    try {
      v4.requests.clear()
      // partitionKey names a composite key; the server rejects $skip, so the
      // planner must carve disjoint (Country, CustomerID) tuple windows
      val df = read(v4, "parallelism" -> "4", "partitionRows" -> "5",
        "partitionKey" -> "Country,CustomerID")
      val ids = df.collect().map(_.getString(0)).toSeq
      assert(ids.length == 20 && ids.distinct.length == 20,
        s"composite keyset union wrong: $ids") // disjoint + complete windows
      // boundary sweep selects + orders by BOTH key properties
      val sweeps = v4.requests.filter(r =>
        r.contains("$select=Country,CustomerID") &&
          r.contains("$orderby=Country,CustomerID"))
      assert(sweeps.nonEmpty, s"no composite boundary sweep in ${v4.requests}")
      // window filters are row-value expansions:
      //   Country gt 'X' or (Country eq 'X' and CustomerID gt 'Cnn')
      val windows = v4.requests.filter(r =>
        r.contains("/Customers?") && r.contains("$filter=") && !r.contains("$orderby"))
      assert(windows.size >= 2, s"expected composite windows, got ${v4.requests}")
      assert(windows.exists(r => r.contains(" or (Country eq ") &&
        r.contains(" and CustomerID gt ")), s"no gt or-chain in $windows")
      assert(windows.exists(r => r.contains(" or (Country eq ") &&
        r.contains(" and CustomerID le ")), s"no le or-chain in $windows")
      assert(!v4.requests.exists(r => r.contains("$skip=") && r.contains("$top=5")),
        s"offset ranges used despite 501: ${v4.requests}")
    } finally v4.skipStatus = 200
  }

  test("parallel scan: keysetOrder=desc sweeps and windows in descending key order") {
    v4.skipStatus = 501
    try {
      v4.requests.clear()
      val df = read(v4, "parallelism" -> "4", "partitionRows" -> "5",
        "keysetOrder" -> "desc")
      val ids = df.collect().map(_.getString(0)).toSeq
      assert(ids.length == 20 && ids.distinct.length == 20,
        s"desc keyset union wrong: $ids")
      // sweep pages order by the key DESC
      val sweeps = v4.requests.filter(r =>
        r.contains("$select=CustomerID") && r.contains("$orderby=CustomerID desc"))
      assert(sweeps.nonEmpty, s"no desc boundary sweep in ${v4.requests}")
      // windows flip: first = ge highest boundary, middles lt+ge, tail = lt
      val windows = v4.requests.filter(r =>
        r.contains("/Customers?") && r.contains("$filter=") &&
          !r.contains("$orderby") && (r.contains(" ge ") || r.contains(" lt ")))
      assert(windows.exists(_.contains("CustomerID ge 'C15'")), s"got $windows")
      assert(windows.exists(r => r.contains("CustomerID lt 'C15'") &&
        r.contains("CustomerID ge 'C10'")), s"got $windows")
      assert(windows.exists(_.contains("CustomerID lt 'C05'")), s"got $windows")
    } finally v4.skipStatus = 200
  }

  test("capped sweep re-splits the tail numerically (integral key)") {
    v4.skipStatus = 501
    try {
      v4.requests.clear()
      // per=5; keysetSweepMax=5 stops the sweep after ONE batch (boundary
      // Revenue=5000) with 15 of 20 rows un-carved -> numeric tail over
      // (5000, 20000] in 3 uniform windows of 5000
      val df = read(v4, "parallelism" -> "4", "partitionRows" -> "5",
        "partitionKey" -> "Revenue", "keysetSweepMax" -> "5")
      val ids = df.collect().map(_.getString(0)).toSeq
      assert(ids.length == 20 && ids.distinct.length == 20,
        s"numeric tail union wrong: $ids")
      // max probe: keys-only desc top=1
      assert(v4.requests.exists(r => r.contains("$orderby=Revenue desc") &&
        r.contains("$top=1")), s"no max probe in ${v4.requests}")
      val windows = v4.requests.filter(r =>
        r.contains("/Customers?") && r.contains("$filter=") && !r.contains("$orderby"))
      assert(windows.exists(_.contains("Revenue le 5000")), s"got $windows")
      assert(windows.exists(r => r.contains("Revenue gt 5000") &&
        r.contains("Revenue le 10000")), s"got $windows")
      assert(windows.exists(r => r.contains("Revenue gt 10000") &&
        r.contains("Revenue le 15000")), s"got $windows")
      assert(windows.exists(r => r.contains("Revenue gt 15000") &&
        !r.contains(" le ")), s"open tail missing: $windows")
    } finally v4.skipStatus = 200
  }

  test("capped DESC sweep carves the tail numerically toward a min probe") {
    v4.skipStatus = 501
    try {
      v4.requests.clear()
      // desc sweep batch: Revenue 20000..16000 -> boundary 16000; tail =
      // {Revenue < 16000} carved (999,5999],(5999,10999],(10999,15999]
      // with the bottom window left open
      val df = read(v4, "parallelism" -> "4", "partitionRows" -> "5",
        "partitionKey" -> "Revenue", "keysetSweepMax" -> "5",
        "keysetOrder" -> "desc")
      val ids = df.collect().map(_.getString(0)).toSeq
      assert(ids.length == 20 && ids.distinct.length == 20,
        s"desc numeric tail union wrong: $ids")
      // min probe: keys-only ASC top=1 (plus the desc sweep itself)
      assert(v4.requests.exists(r => r.contains("$orderby=Revenue&") ||
        r.endsWith("$orderby=Revenue")), s"no min probe in ${v4.requests}")
      val windows = v4.requests.filter(r =>
        r.contains("/Customers?") && r.contains("$filter=") && !r.contains("$orderby"))
      assert(windows.exists(_.contains("Revenue ge 16000")), s"got $windows")
      assert(windows.exists(r => r.contains("Revenue gt 10999") &&
        r.contains("Revenue le 15999")), s"got $windows")
      assert(windows.exists(r => r.contains("Revenue le 5999") &&
        !r.contains(" gt ")), s"open bottom missing: $windows")
    } finally v4.skipStatus = 200
  }

  test("composite-key numeric tail adds the boundary-sliver tuple window") {
    v4.skipStatus = 501
    try {
      v4.requests.clear()
      val df = read(v4, "parallelism" -> "4", "partitionRows" -> "5",
        "partitionKey" -> "Revenue,CustomerID", "keysetSweepMax" -> "5")
      val ids = df.collect().map(_.getString(0)).toSeq
      assert(ids.length == 20 && ids.distinct.length == 20,
        s"composite numeric tail union wrong: $ids")
      val windows = v4.requests.filter(r =>
        r.contains("/Customers?") && r.contains("$filter=") && !r.contains("$orderby"))
      // tail rows sharing the boundary's first key ride a tuple-comparison
      // sliver window; the numeric ranges carve strictly beyond it
      assert(windows.exists(r => r.contains(" or (Revenue eq 5000") &&
        r.contains("Revenue le 5000")), s"no boundary sliver in $windows")
      assert(windows.exists(r => r.contains("Revenue gt 5000") &&
        r.contains("Revenue le 10000")), s"got $windows")
      assert(windows.exists(r => r.contains("Revenue gt 15000") &&
        !r.contains(" le ")), s"open tail missing: $windows")
    } finally v4.skipStatus = 200
  }

  test("numeric tail refinement: empty stretches dropped, dense windows re-split") {
    v4.skipStatus = 501
    val saved = v4.rows
    try {
      // 5 sparse low keys (the swept batch) + 35 keys clustered near 1e6:
      // the uniform tail carve is mostly empty stretches plus one dense
      // window holding all 35 rows
      v4.rows = (0 until 5).map(i => Map[String, Any](
        "CustomerID" -> s"L$i", "CompanyName" -> s"Low $i",
        "Country" -> "Germany", "Revenue" -> (10L * (i + 1)),
        "Founded" -> 946684800000L)) ++
        (0 until 35).map(i => Map[String, Any](
          "CustomerID" -> s"H${"%02d".format(i)}", "CompanyName" -> s"High $i",
          "Country" -> "France", "Revenue" -> (1000000L + i),
          "Founded" -> 946684800000L))
      v4.requests.clear()
      val df = read(v4, "parallelism" -> "8", "partitionRows" -> "5",
        "partitionKey" -> "Revenue", "keysetSweepMax" -> "5")
      val ids = df.collect().map(_.getString(0)).toSeq
      assert(ids.length == 40 && ids.distinct.length == 40,
        s"refined tail union wrong: $ids")
      // count probes refined the carve
      assert(v4.requests.count(_.contains("/Customers/$count?")) >= 3,
        s"no refinement count probes in ${v4.requests}")
      val windows = v4.requests.filter(r =>
          r.contains("/Customers?") && r.contains("$filter=") && !r.contains("$orderby"))
        .map(_.replaceAll("[&?]__page=\\d+", "")).distinct // fold page walks
      // empty uniform stretches are dropped at planning: head window + the
      // dense re-split only (uniform-without-refinement would be 13+)
      assert(windows.size <= 9, s"empty stretches fetched: $windows")
      // the dense cluster was split into multiple sub-windows
      val dense = windows.filter(_.contains("Revenue gt 9"))
      assert(dense.size >= 3, s"dense cluster not re-split: $windows")
    } finally { v4.rows = saved; v4.skipStatus = 200 }
  }

  test("parallel scan: pushed filter rides inside the keyset windows") {
    v4.skipStatus = 501
    try {
      v4.requests.clear()
      val df = read(v4, "parallelism" -> "4", "partitionRows" -> "3")
        .filter(col("Country") === "Germany")
      val ids = df.collect().map(_.getString(0)).toSeq
      assert(ids.length == 7 && ids.distinct.length == 7, s"got $ids")
      // the sweep and every window carry the pushed predicate too
      val winReqs = v4.requests.filter(r => r.contains(" le ") || r.contains(" gt "))
      assert(winReqs.nonEmpty && winReqs.forall(_.contains("Country eq 'Germany'")),
        s"window requests missing pushed filter: $winReqs")
    } finally v4.skipStatus = 200
  }

  test("groupBy agg pushes $apply=groupby — only group rows transferred") {
    v4.requests.clear()
    val df = read(v4).groupBy("Country")
      .agg(sum("Revenue").as("rev"), count(lit(1)).as("cnt"))
    val out = df.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map("Germany" -> ((70000L, 7L)), "France" -> ((77000L, 7L)),
      "Mexico" -> ((63000L, 6L))), s"got $out")
    assert(v4.requests.exists(_.contains(
      "$apply=groupby((Country),aggregate(Revenue with sum as agg0,$count as agg1))")),
      s"no $$apply groupby in ${v4.requests}")
    // zero entity rows: every data request to the set carries $apply
    val plain = v4.requests.filter(r => r.contains("/Customers?") && !r.contains("$apply"))
    assert(plain.isEmpty, s"entity rows were fetched for a pushed agg: $plain")
  }

  test("pushed filter folds into the $apply pipeline as a filter() stage") {
    v4.requests.clear()
    val df = read(v4).filter(col("Revenue") > 5000L)
      .groupBy("Country").agg(avg("Revenue").as("a"))
    val out = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("Germany") == 13000.0 && out.size == 3, s"got $out")
    val applied = v4.requests.filter(_.contains("$apply=filter("))
    assert(applied.exists(r => r.contains("Revenue gt 5000") &&
      r.contains("/groupby((Country),aggregate(Revenue with average as agg0))")),
      s"filter not folded into $$apply: ${v4.requests}")
  }

  test("global agg (no groupBy) pushes a bare aggregate() pipeline") {
    v4.requests.clear()
    val row = read(v4).agg(sum("Revenue").as("s"), avg("Revenue").as("a")).head()
    assert(row.getLong(0) == 210000L && row.getDouble(1) == 10500.0, s"got $row")
    assert(v4.requests.exists(_.contains(
      "$apply=aggregate(Revenue with sum as agg0,Revenue with average as agg1)")),
      s"no bare aggregate() in ${v4.requests}")
  }

  test("min/max/countDistinct push through $apply") {
    v4.requests.clear()
    val df = read(v4).groupBy("Country").agg(
      min("CustomerID").as("lo"), max("CustomerID").as("hi"),
      countDistinct("Revenue").as("d"))
    val out = df.collect().map(r =>
      r.getString(0) -> ((r.getString(1), r.getString(2), r.getLong(3)))).toMap
    assert(out("Germany") == (("C00", "C18", 7L)), s"got $out")
    assert(v4.requests.exists(r => r.contains("CustomerID with min as agg0") &&
      r.contains("CustomerID with max as agg1") &&
      r.contains("Revenue with countdistinct as agg2")), v4.requests.toString)
  }

  test("partial $apply: per-keyset-window aggregation merged by Spark") {
    v4.requests.clear()
    // partitionRows=5 < 20 rows -> partial mode carves keyset windows; each
    // partition runs groupby server-side and Spark's final agg merges them
    val df = read(v4, "parallelism" -> "4", "partitionRows" -> "5")
      .groupBy("Country").agg(sum("Revenue").as("rev"), count(lit(1)).as("cnt"))
    val out = df.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map("Germany" -> ((70000L, 7L)), "France" -> ((77000L, 7L)),
      "Mexico" -> ((63000L, 6L))), s"got $out")
    // multiple $apply partitions, each with the key window folded in as a
    // filter() stage INSIDE the pipeline (before the groupby)
    val applies = v4.requests.filter(r => r.contains("$apply=filter(") &&
      r.contains("/groupby((Country),aggregate(Revenue with sum as agg0,$count as agg1))"))
    assert(applies.size >= 2, s"expected windowed $$apply partitions: ${v4.requests}")
    assert(applies.exists(_.contains("CustomerID le ")), s"no window bound: $applies")
    // entity rows never transferred: non-$apply requests are only the
    // keys-only boundary sweeps and the /$count sizing probes
    val plain = v4.requests.filter(r =>
      r.contains("/Customers?") && !r.contains("$apply") && !r.contains("$count"))
    assert(plain.forall(_.contains("$select=CustomerID")),
      s"entity rows fetched for a partial agg: $plain")
  }

  test("partial $apply disabled keeps the complete single-request pushdown") {
    v4.requests.clear()
    val df = read(v4, "parallelism" -> "4", "partitionRows" -> "5",
      "applyPartial" -> "false")
      .groupBy("Country").agg(sum("Revenue").as("rev"))
    val out = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("Germany" -> 70000L, "France" -> 77000L, "Mexico" -> 63000L))
    val applies = v4.requests.filter(_.contains("$apply="))
    // probe + the one complete data request; no filter() window stages
    assert(applies.nonEmpty && applies.forall(!_.contains("$apply=filter(")),
      s"windowed pipelines despite applyPartial=false: $applies")
  }

  test("TopN over a pushed aggregate pushes $orderby + $top after $apply") {
    v4.requests.clear()
    val df = read(v4).groupBy("Country").agg(sum("Revenue").as("rev"))
      .orderBy(col("rev").desc).limit(2)
    val out = df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("France", 77000L), ("Germany", 70000L)), s"got $out")
    assert(v4.requests.exists(r =>
      r.contains("$apply=groupby((Country),aggregate(Revenue with sum as agg0))") &&
        r.contains("$orderby=agg0 desc") && r.contains("$top=2")),
      s"TopN not pushed after $$apply: ${v4.requests}")
  }

  test("LIMIT over a pushed aggregate caps group rows via $top") {
    v4.requests.clear()
    val df = read(v4).groupBy("Country").agg(sum("Revenue").as("rev")).limit(2)
    assert(df.collect().length == 2)
    assert(v4.requests.exists(r => r.contains("$apply=groupby((Country)") &&
      r.contains("$top=2") && !r.contains("$orderby")),
      s"limit not pushed over $$apply groups: ${v4.requests}")
  }

  test("server rejecting $apply keeps the aggregation in Spark — still correct") {
    v4.applyStatus = 400
    try {
      v4.requests.clear()
      val df = read(v4).groupBy("Country").agg(sum("Revenue").as("rev"))
      val out = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out == Map("Germany" -> 70000L, "France" -> 77000L, "Mexico" -> 63000L))
      // probe failed -> entity pages fetched, no successful $apply data flow
      assert(v4.requests.exists(r => r.contains("/Customers?") && !r.contains("$apply")),
        s"expected an entity scan fallback in ${v4.requests}")
    } finally v4.applyStatus = 200
  }

  test("COUNT(*) is answered by /$count alone — no data transferred") {
    v4.requests.clear()
    val n = read(v4).count()
    assert(n == 20)
    val dataReqs = v4.requests.filter(r => r.contains("/Customers?") && !r.contains("$count"))
    assert(dataReqs.isEmpty, s"data was fetched for a count: $dataReqs")
    assert(v4.requests.exists(_.contains("/Customers/$count")))
  }

  test("filtered COUNT(*) pushes the filter into /$count") {
    v4.requests.clear()
    val n = read(v4).filter(col("Country") === "Germany").count()
    assert(n == 7)
    assert(v4.requests.exists(r =>
      r.contains("/Customers/$count") && r.contains("Country eq 'Germany'")),
      v4.requests.toString)
  }

  test("COUNT(*): server without /$count (501) falls back to a page walk") {
    v4.countStatus = 501
    try {
      v4.requests.clear()
      assert(read(v4).count() == 20)
      assert(v4.requests.exists(r => r.contains("/Customers?") && !r.contains("$count")),
        s"expected a page-walk fallback in ${v4.requests}")
    } finally v4.countStatus = 200
  }

  test("COUNT(*): auth failure (403) on /$count rethrows — never a page walk") {
    v4.countStatus = 403
    try {
      v4.requests.clear()
      val e = intercept[Exception](read(v4).count())
      def chain(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).toSeq
      assert(chain(e).exists(m => m != null && m.contains("403")), e.toString)
      val dataReqs = v4.requests.filter(r => r.contains("/Customers?") && !r.contains("$count"))
      assert(dataReqs.isEmpty, s"auth failure triggered a page crawl: $dataReqs")
    } finally v4.countStatus = 200
  }

  test("ORDER BY + LIMIT pushes $orderby + $top (beyond-reference TopN)") {
    v4.requests.clear()
    val df = read(v4).orderBy(col("Revenue").desc).limit(3).select("CustomerID", "Revenue")
    val rows = df.collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(20000L, 19000L, 18000L))
    val dataReqs = v4.requests.filter(_.contains("/Customers?"))
    assert(dataReqs.exists(r => r.contains("$orderby=Revenue desc") && r.contains("$top=3")),
      s"no TopN pushdown in: $dataReqs")
  }

  test("multi-key ORDER BY pushes a comma-joined $orderby") {
    v4.requests.clear()
    val df = read(v4).orderBy(col("Country"), col("Revenue").desc).limit(5)
    assert(df.count() == 5)
    assert(v4.requests.exists(_.contains("$orderby=Country,Revenue desc")),
      v4.requests.filter(_.contains("Customers?")).toString)
  }

  test("scan custom metrics report pages/rows/bytes fetched") {
    val df = read(v4)
    df.collect()
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.collect { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b })
      .head
    val m = scan.metrics
    assert(m.contains("odataRowsFetched") && m("odataRowsFetched").value == 20, m.keys)
    assert(m("odataPagesFetched").value >= 4) // 20 rows / pageSize 5
    assert(m("odataBytesFetched").value > 1000)
  }

  test("explain shows pushed filters reached the scan description") {
    val df = read(v4).filter(col("Country") === "Mexico").select("CustomerID")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("odata "), plan)
  }

  test("options top/skip behave like the reference named params") {
    val df = read(v4, "top" -> "4", "skip" -> "2")
    assert(df.collect().length == 4)
  }

  test("$expand produces a nested array<struct> column with spliced data") {
    v4.requests.clear()
    val df = read(v4, "expand" -> "Orders")
    val ordersField = df.schema("Orders")
    assert(ordersField.dataType.typeName == "array")
    val inner = ordersField.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(inner.fieldNames.toSeq == Seq("OrderID", "Amount"))

    val rows = df.select("CustomerID", "Orders").orderBy("CustomerID").collect()
    assert(rows.length == 20)
    // customer i has i%3 orders with deterministic ids/amounts
    val c2 = rows.find(_.getString(0) == "C02").get
    val orders = c2.getSeq[org.apache.spark.sql.Row](1)
    assert(orders.map(o => (o.getInt(0), o.getDouble(1))) == Seq((20, 200.5), (21, 201.5)))
    assert(rows.find(_.getString(0) == "C03").get.getSeq[org.apache.spark.sql.Row](1).isEmpty)
    assert(v4.requests.exists(_.contains("$expand=Orders")))
  }

  test("SQL INSERT INTO a catalog entity set POSTs entities (writable ATTACH)") {
    v4.postedItems.clear()
    val cat = s"wcat${v4.port}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.odata.ODataCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.url", v4.serviceUrl)
    spark.sql(
      s"""INSERT INTO $cat.main.Customers
         |SELECT 'C98' AS CustomerID, 'New Co' AS CompanyName, 'Spain' AS Country,
         |       CAST(7 AS BIGINT) AS Revenue, TIMESTAMP '2024-01-01 00:00:00' AS Founded
         |""".stripMargin)
    assert(v4.postedItems.size == 1, v4.postedItems.toString)
    assert(v4.postedItems.head.contains(""""CustomerID":"C98""""))
    assert(v4.postedItems.head.contains(""""Revenue":7"""))
  }

  test("INSERT with insertBatchSize groups rows into $batch round-trips") {
    v4.postedItems.clear()
    v4.batchBodies.clear()
    val cat = s"bcat${v4.port}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.odata.ODataCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.url", v4.serviceUrl)
    spark.conf.set(s"spark.sql.catalog.$cat.insertBatchSize", "4")
    spark.sql(
      s"""INSERT INTO $cat.main.Customers
         |SELECT concat('B', id) AS CustomerID, 'Batch Co' AS CompanyName,
         |       'Spain' AS Country, id AS Revenue,
         |       TIMESTAMP '2024-01-01 00:00:00' AS Founded
         |FROM (SELECT * FROM range(10) ORDER BY id) t
         |""".stripMargin.replace("\n", " "))
    // all 10 entities arrived, none as a bare per-row POST
    assert(v4.postedItems.size == 10, v4.postedItems.toString)
    assert((0 until 10).forall(i =>
      v4.postedItems.exists(_.contains(s""""CustomerID":"B$i""""))))
    assert(v4.batchBodies.nonEmpty, "no $batch round-trips recorded")
    // every round-trip carried at most batchSize sub-requests, and the
    // round-trip count is far below the row count
    val sizes = v4.batchBodies.map(b => "\"method\":\"POST\"".r.findAllIn(b).size)
    assert(sizes.sum == 10 && sizes.forall(_ <= 4), sizes.toString)
    // sub-request URLs are SERVICE-ROOT-RELATIVE (Graph-compatible), derived
    // from the $metadata-resolved root, not a path-segment strip
    assert(v4.batchBodies.forall(_.contains(""""url":"/Customers"""")),
      v4.batchBodies.headOption.getOrElse(""))
    spark.conf.unset(s"spark.sql.catalog.$cat.insertBatchSize")
  }

  test("SQL DELETE FROM a catalog entity set issues per-key DELETE calls") {
    v4.deletedKeys.clear()
    val cat = s"dcat${v4.port}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.odata.ODataCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.url", v4.serviceUrl)
    spark.sql(s"DELETE FROM $cat.main.Customers WHERE Country = 'Mexico'")
    // customers with i%3==2 -> C02, C05, ..., C20
    assert(v4.deletedKeys.sorted == (2 until 20 by 3).map(i => f"C$i%02d"),
      v4.deletedKeys.toString)
  }

  test("bulk DELETE streams key pages into distributed executor deletes") {
    val big = new ODataStub(v2 = false).start()
    try {
      big.rows = big.makeRows(12000)
      big.applyDeletes = true
      @volatile var maxTasks = 0
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          maxTasks = math.max(maxTasks, s.stageInfo.numTasks)
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        val cat = s"bdel${big.port}"
        spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.odata.ODataCatalog")
        spark.conf.set(s"spark.sql.catalog.$cat.url", big.serviceUrl)
        // 11999 matches — above the (default 10000) bulk threshold
        spark.sql(s"DELETE FROM $cat.main.Customers WHERE Revenue > 1000")
        assert(big.deletedKeys.size == 11999, s"deleted ${big.deletedKeys.size}")
        assert(big.rows.map(_("CustomerID")) == Seq("C00"), s"survivors: ${big.rows.size}")
        // no driver key buffering: keys arrived as bounded $top first pages,
        // never as one unbounded walk
        val keyPages = big.requests.filter(r =>
          r.contains("$select=CustomerID") && r.contains("$top=1000"))
        assert(keyPages.size >= 12, s"expected >=12 bounded key pages, got ${keyPages.size}")
        // executor distribution: the delete stages ran with many tasks
        val deadline = System.nanoTime() + 5000000000L
        while (maxTasks <= 1 && System.nanoTime() < deadline) Thread.sleep(50)
        assert(maxTasks > 1, s"deletes were not distributed (maxTasks=$maxTasks)")
      } finally spark.sparkContext.removeSparkListener(listener)
    } finally big.stop()
  }

  test("nested $expand (v4): Orders($expand=Items) gives two-level structs and parenthesized URL") {
    v4.requests.clear()
    val df = read(v4, "expand" -> "Orders($expand=Items)")
    val inner = df.schema("Orders").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(inner.fieldNames.toSeq == Seq("OrderID", "Amount", "Items"))
    val items = inner("Items").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(items.fieldNames.toSeq == Seq("ItemID", "Qty"))
    val c2 = df.select("CustomerID", "Orders").filter(col("CustomerID") === "C02").head()
    val orders = c2.getSeq[org.apache.spark.sql.Row](1)
    // order 21 is odd -> 2 items (ids 2100, 2101); order 20 even -> 1 item
    val byId = orders.map(o => o.getInt(0) -> o.getSeq[org.apache.spark.sql.Row](2)).toMap
    assert(byId(20).map(_.getInt(0)) == Seq(2000))
    assert(byId(21).map(_.getInt(0)) == Seq(2100, 2101))
    assert(v4.requests.exists(_.contains("$expand=Orders($expand=Items)")),
      v4.requests.filter(_.contains("expand")).toString)
  }

  test("nested $expand slash path (v2): Orders/Items renders slash syntax and decodes results-wrappers") {
    v2.requests.clear()
    val df = read(v2, "expand" -> "Orders/Items").select("CustomerID", "Orders")
    val c5 = df.filter(col("CustomerID") === "C05").head()
    val orders = c5.getSeq[org.apache.spark.sql.Row](1)
    assert(orders.map(_.getInt(0)) == Seq(50, 51))
    // v2 wraps both levels in {"results": ...}; both must decode
    val items51 = orders.find(_.getInt(0) == 51).get.getSeq[org.apache.spark.sql.Row](2)
    assert(items51.map(_.getInt(0)) == Seq(5100, 5101))
    val dataReqs = v2.requests.filter(_.contains("/Customers?"))
    assert(dataReqs.exists(_.contains("$expand=Orders/Items")), s"reqs: $dataReqs")
  }

  test("per-expand $select narrows the nested struct and renders v4 options") {
    v4.requests.clear()
    val df = read(v4, "expand" -> "Orders($select=OrderID)")
    val inner = df.schema("Orders").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(inner.fieldNames.toSeq == Seq("OrderID"))
    assert(df.select("CustomerID", "Orders").filter(col("CustomerID") === "C02").head()
      .getSeq[org.apache.spark.sql.Row](1).map(_.getInt(0)) == Seq(20, 21))
    assert(v4.requests.exists(_.contains("$expand=Orders($select=OrderID)")),
      v4.requests.filter(_.contains("expand")).toString)
  }

  test("SQL UPDATE on a catalog entity set PATCHes by key (SupportsRowLevelOperations)") {
    v4.patchedKeys.clear()
    val cat = s"ucat${v4.port}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.odata.ODataCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.url", v4.serviceUrl)
    spark.sql(
      s"UPDATE $cat.main.Customers SET CompanyName = 'Patched Co' WHERE Country = 'Germany'")
    // customers with i%3==0 -> C00, C03, ..., C18
    assert(v4.patchedKeys.map(_._1).sorted == (0 until 20 by 3).map(i => f"C$i%02d"),
      v4.patchedKeys.toString)
    assert(v4.patchedKeys.forall(_._2.contains(""""CompanyName":"Patched Co"""")),
      v4.patchedKeys.headOption.toString)
  }

  test("$expand on v2 unwraps the results-wrapper and mirrors navs into $select") {
    v2.requests.clear()
    val df = read(v2, "expand" -> "Orders").select("CustomerID", "Orders")
    val c5 = df.filter(col("CustomerID") === "C05").head()
    val orders = c5.getSeq[org.apache.spark.sql.Row](1)
    assert(orders.map(_.getInt(0)) == Seq(50, 51))
    val dataReqs = v2.requests.filter(_.contains("/Customers?"))
    assert(dataReqs.exists(r => r.contains("$expand=Orders") && r.contains("Orders") &&
      r.contains("$select=") && r.contains("CustomerID")), s"reqs: $dataReqs")
  }

  test("runtime filtering: broadcast-join In filter reaches $filter at execution (SupportsRuntimeFiltering)") {
    import spark.implicits._
    v4.requests.clear()
    val cat = s"rfcat${v4.port}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.odata.ODataCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.url", v4.serviceUrl)
    // dim must NOT be a LocalRelation (ConvertToLocalRelation folds the
    // selective filter away and dynamic pruning never arms) and the dim
    // predicate must survive BooleanSimplification as a comparison —
    // `flag = true` simplifies to a bare attribute, which isLikelySelective
    // rejects. Parquet + string equality is also the realistic dim shape.
    val dimDir = java.nio.file.Files.createTempDirectory("rf_dim").toString
    Seq(("C01", "keep"), ("C05", "keep"), ("C09", "drop"))
      .toDF("cid", "tag").write.mode("overwrite").parquet(dimDir)
    spark.read.parquet(dimDir).createOrReplaceTempView("rf_dim")
    // selective predicate on the dim side is what arms dynamic pruning
    val joined = spark.sql(
      s"""SELECT c.CustomerID, c.Revenue, d.cid
         |FROM $cat.main.Customers c
         |JOIN rf_dim d ON c.CustomerID = d.cid
         |WHERE d.tag = 'keep'""".stripMargin)
    val rows = joined.collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("C01", "C05"))
    val dataReqs = v4.requests.filter(_.contains("/Customers?"))
    assert(dataReqs.nonEmpty, s"no data requests logged: ${v4.requests}")
    // EVERY page fetch must carry the join-produced In: an unfiltered request
    // would mean the scan paged the whole remote set before the join pruned
    assert(dataReqs.forall(r => r.contains("$filter=") &&
      r.contains("CustomerID eq 'C01'") && r.contains("CustomerID eq 'C05'")),
      s"runtime In did not reach the server: $dataReqs")
    assert(dataReqs.forall(!_.contains("C09")), s"un-kept key leaked: $dataReqs")
    // plan-level proof: the scan node carries a dynamic pruning subquery
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning in plan:\n$plan")
  }

  test("runtime filtering: >50 join keys falls back to an unfiltered scan (cap respected)") {
    import spark.implicits._
    v4.requests.clear()
    // 60 distinct keys exceed the compiler's In cap → filter() leaves the
    // scan unfiltered; the join itself still applies the predicate
    val dimDir = java.nio.file.Files.createTempDirectory("rf_dim_big").toString
    (0 until 60).map(i => (f"C$i%02d", "keep")).toDF("cid", "tag")
      .write.mode("overwrite").parquet(dimDir)
    spark.read.parquet(dimDir).createOrReplaceTempView("rf_dim_big")
    val cat = s"rfcat${v4.port}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.odata.ODataCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.url", v4.serviceUrl)
    val joined = spark.sql(
      s"""SELECT c.CustomerID FROM $cat.main.Customers c
         |JOIN rf_dim_big d ON c.CustomerID = d.cid WHERE d.tag = 'keep'""".stripMargin)
    assert(joined.collect().length == 20) // all stub customers match
    // pruning DID arm (otherwise this test is vacuous) …
    assert(joined.queryExecution.executedPlan.toString.toLowerCase
      .contains("dynamicpruning"), "dynamic pruning never armed")
    // … but the >cap In was refused, so no $filter reached the server
    val dataReqs = v4.requests.filter(_.contains("/Customers?"))
    assert(dataReqs.nonEmpty && dataReqs.forall(!_.contains("$filter=")),
      s"cap not respected: $dataReqs")
  }
  test("keyset windows fetch their first pages in ONE $batch round-trip") {
    v4.skipStatus = 501 // force the keyset path
    try {
      v4.requests.clear(); v4.batchBodies.clear()
      val df = read(v4, "parallelism" -> "4", "partitionRows" -> "5")
      val ids = df.collect().map(_.getString(0)).toSeq
      assert(ids.length == 20 && ids.distinct.length == 20,
        s"keyset union wrong under batched first pages: $ids")
      // exactly one $batch POST carried every window's first page
      assert(v4.batchBodies.size == 1, s"batch POSTs: ${v4.batchBodies.size}")
      val subGets = v4.requests.filter(_.startsWith("batch:"))
      assert(subGets.size >= 4 && subGets.forall(_.contains("$filter=")),
        s"sub-GETs: $subGets")
      // no INDEPENDENT per-window data GET was needed (stub serves whole
      // windows in the batched page)
      val independent = v4.requests.filter(r => !r.startsWith("batch:") &&
        r.contains("/Customers?") && r.contains("$filter=") &&
        (r.contains(" gt ") || r.contains(" le ")) && !r.contains("$select="))
      assert(independent.isEmpty, s"window GETs escaped the batch: $independent")
    } finally v4.skipStatus = 200
  }

  test("batchFirstPages=false keeps per-window first-page GETs") {
    v4.skipStatus = 501
    try {
      v4.requests.clear(); v4.batchBodies.clear()
      val df = read(v4, "parallelism" -> "4", "partitionRows" -> "5",
        "batchFirstPages" -> "false")
      assert(df.collect().length == 20)
      assert(v4.batchBodies.isEmpty, s"unexpected $$batch: ${v4.batchBodies}")
      val windows = v4.requests.filter(r => r.contains("/Customers?") &&
        r.contains("$filter=") && !r.contains("$orderby") &&
        (r.contains(" gt ") || r.contains(" le ")))
      assert(windows.size >= 4, s"expected per-window GETs, got ${v4.requests}")
    } finally v4.skipStatus = 200
  }

  test("partial $apply windows also ride the first-page $batch") {
    v4.skipStatus = 501
    try {
      v4.requests.clear(); v4.batchBodies.clear()
      val df = read(v4, "parallelism" -> "4", "partitionRows" -> "5")
        .groupBy("Country").agg(sum("Revenue").as("rev"))
      val out = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // 20 customers, Country = i%3: Germany rows i=0,3,..18; revenue 1000*(i+1)
      val exp = (0 until 20).groupBy(i => i % 3 match {
        case 0 => "Germany"; case 1 => "France"; case _ => "Mexico"
      }).map { case (c, is) => c -> is.map(i => 1000L * (i + 1)).sum }
      assert(out == exp, s"got $out")
      assert(v4.batchBodies.nonEmpty, "no $batch for partial $apply windows")
      val applySubs = v4.requests.filter(r => r.startsWith("batch:") &&
        r.contains("$apply="))
      assert(applySubs.nonEmpty, s"no $$apply sub-GETs: ${v4.requests}")
    } finally v4.skipStatus = 200
  }

}
