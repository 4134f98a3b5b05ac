package graft.queries

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Host-engine relational operators exercised by the harness (SURVEY.md §2.5):
  * scans, filter/project, hash/broadcast joins, partial+final aggregation,
  * grouping sets (rollup/cube), distinct, windows, sorts/top-k, set ops, and
  * the scalar function library (string/date/json).
  *
  * Determinism contract with the DuckDB oracle:
  *  - every double-valued aggregate is computed over DECIMAL casts and the
  *    exact decimal result is cast to DOUBLE at the end, so the value is
  *    bit-identical regardless of partitioning / accumulation order;
  *  - every query has a total ORDER BY;
  *  - dialect result-type differences (year(), row_number(), sum(int)) are
  *    cast explicitly on the DuckDB side to match Spark's types.
  *
  * Scale notes (100 TB): `nation`/`region`/`supplier` are broadcast; fact-fact
  * joins (lineitem⋈orders) shuffle on the join key, which is also the natural
  * bucketing key; AQE handles skew.
  */
object HostQueries {

  // Narrow decimal widths so every intermediate stays inside BOTH engines'
  // 38-digit decimal limit (DuckDB silently falls back to inexact DOUBLE
  // arithmetic past 38; Spark truncates scale) — exactness is what makes the
  // oracle hash-compare deterministic under any partitioning.
  private def dec2(c: String): Column = col(c).cast("decimal(12,2)")
  private def dec4(c: String): Column = col(c).cast("decimal(6,4)")
  /** revenue term used across TPC-H-style queries, decimal-exact */
  private def revenueExpr: Column =
    sum(dec2("l_extendedprice") * (lit(1) - dec4("l_discount"))).cast("double")
  private val RevenueSql =
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE)"

  val all: Seq[QueryDef] = Seq(

    // ---- q01: TPC-H Q1 style pricing summary (filter + wide agg) ----------
    QueryDef("q01_pricing_summary",
      (s, d) => T.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec2("l_quantity")).cast("double").as("sum_qty"),
          sum(dec2("l_extendedprice")).cast("double").as("sum_base_price"),
          sum(dec2("l_extendedprice") * (lit(1) - dec4("l_discount"))).cast("double").as("sum_disc_price"),
          sum(dec2("l_extendedprice") * (lit(1) - dec4("l_discount")) * (lit(1) + dec4("l_tax")))
            .cast("decimal(30,6)").cast("double").as("sum_charge"),
          (sum(dec2("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(dec2("l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
          (sum(dec4("l_discount")).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""
        SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE) AS sum_disc_price,
          CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4))) * (1 + CAST(l_tax AS DECIMAL(6,4)))) AS DECIMAL(30,6)) AS DOUBLE) AS sum_charge,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
          CAST(SUM(CAST(l_discount AS DECIMAL(6,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
          COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ---- q02: TPC-H Q5 style revenue by nation (4-way join, bcast dims) ---
    QueryDef("q02_revenue_by_nation",
      (s, d) => T.lineitem(s, d)
        .join(T.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(T.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(revenueExpr.as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name"),
      Some(s"""
        SELECT r_name, n_name, $RevenueSql AS revenue, COUNT(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name""")),

    // ---- q03: TPC-H Q3 style top-k revenue orders ------------------------
    QueryDef("q03_top_revenue_orders",
      (s, d) => T.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1997-01-01 00:00:00").cast("timestamp"))
        .join(T.orders(s, d).filter(col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(T.customer(s, d).filter(col("c_mktsegment") === "BUILDING"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(revenueExpr.as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10),
      Some(s"""
        SELECT l_orderkey, o_orderdate, $RevenueSql AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND c_mktsegment = 'BUILDING'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10""")),

    // ---- q04: TPC-H Q4 style EXISTS (left-semi join w/ extra condition) ---
    QueryDef("q04_order_priority",
      (s, d) => {
        val o = T.orders(s, d); val l = T.lineitem(s, d)
        o.join(l, col("l_orderkey") === col("o_orderkey") &&
                  col("l_shipdate") > col("o_orderdate"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // ---- q05: window row_number / per-customer top-3 orders ---------------
    QueryDef("q05_customer_order_rank",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        T.orders(s, d)
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
          .orderBy("o_custkey", "rnk")
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
            CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rnk
          FROM orders) t
        WHERE rnk <= 3
        ORDER BY o_custkey, rnk""")),

    // ---- q06: running total window (unbounded preceding frame) ------------
    QueryDef("q06_running_totals",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T.orders(s, d)
          .withColumn("running_spend", sum(dec2("o_totalprice")).over(w).cast("double"))
          .select("o_custkey", "o_orderkey", "running_spend")
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""
        SELECT o_custkey, o_orderkey,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        FROM orders
        ORDER BY o_custkey, o_orderkey""")),

    // ---- q07: set operations (INTERSECT / EXCEPT / UNION ALL) -------------
    QueryDef("q07_setops",
      (s, d) => {
        val rich  = T.customer(s, d).filter(col("c_acctbal") > 1000).select("c_custkey")
        val buyer = T.orders(s, d).select(col("o_custkey").as("c_custkey"))
        val both     = rich.intersect(buyer).withColumn("tag", lit("both"))
        val balOnly  = rich.except(buyer).withColumn("tag", lit("only_bal"))
        both.unionAll(balOnly)
          .select("tag", "c_custkey")
          .orderBy("tag", "c_custkey")
      },
      Some("""
        SELECT 'both' AS tag, c_custkey FROM (
          SELECT c_custkey FROM customer WHERE c_acctbal > 1000
          INTERSECT SELECT o_custkey FROM orders)
        UNION ALL
        SELECT 'only_bal' AS tag, c_custkey FROM (
          SELECT c_custkey FROM customer WHERE c_acctbal > 1000
          EXCEPT SELECT o_custkey FROM orders)
        ORDER BY tag, c_custkey""")),

    // ---- q08: anti join (customers without orders) ------------------------
    QueryDef("q08_customers_without_orders",
      (s, d) => T.customer(s, d)
        .join(T.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey""")),

    // ---- q09: ROLLUP grouping sets -----------------------------------------
    QueryDef("q09_rollup_nation_revenue",
      (s, d) => {
        // Dataset-API rollup over a join chain trips Spark's ambiguous-
        // self-join check on the grouping columns; SQL resolution doesn't.
        T.orders(s, d).createOrReplaceTempView("g_orders")
        T.customer(s, d).createOrReplaceTempView("g_customer")
        broadcast(T.nation(s, d)).createOrReplaceTempView("g_nation")
        broadcast(T.region(s, d)).createOrReplaceTempView("g_region")
        s.sql("""
          SELECT COALESCE(r_name,'ALL') AS region_name,
                 COALESCE(n_name,'ALL') AS nation_name,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend,
                 COUNT(*) AS n_orders
          FROM g_orders
          JOIN g_customer ON o_custkey = c_custkey
          JOIN g_nation   ON c_nationkey = n_nationkey
          JOIN g_region   ON n_regionkey = r_regionkey
          GROUP BY ROLLUP(r_name, n_name)
          ORDER BY region_name, nation_name""")
      },
      Some("""
        SELECT COALESCE(r_name,'ALL') AS region_name, COALESCE(n_name,'ALL') AS nation_name,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend,
          COUNT(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
        ORDER BY region_name, nation_name""")),

    // ---- q10: date functions + agg -----------------------------------------
    QueryDef("q10_orders_by_year",
      (s, d) => T.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("yr"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
             sum(dec2("o_totalprice")).cast("double").as("total_price"))
        .orderBy("yr", "o_orderstatus"),
      Some("""
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr, o_orderstatus,
          COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY 1, 2
        ORDER BY 1, 2""")),

    // ---- q11: JSON extraction over events ----------------------------------
    QueryDef("q11_event_json",
      (s, d) => T.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
             sum(col("k")).as("sum_k"),
             max(col("k")).as("max_k"))
        .orderBy("event_type"),
      Some("""
        SELECT event_type, COUNT(*) AS n_events,
          CAST(SUM(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS BIGINT) AS sum_k,
          CAST(MAX(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS BIGINT) AS max_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // ---- q12: time-bucketed event aggregation (streaming-window analog) ----
    QueryDef("q12_daily_event_stats",
      (s, d) => T.events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
             sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"),
             countDistinct(col("user_id")).as("n_users"))
        .orderBy("day", "event_type"),
      Some("""
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
          COUNT(*) AS n_events,
          CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
          COUNT(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2""")),

    // ---- q13: CUBE grouping sets --------------------------------------------
    QueryDef("q13_cube_status_priority",
      (s, d) => T.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"))
        .orderBy("status", "priority"),
      Some("""
        SELECT COALESCE(o_orderstatus,'ALL') AS status,
               COALESCE(o_orderpriority,'ALL') AS priority,
               COUNT(*) AS n
        FROM orders
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY status, priority""")),

    // ---- q14: multi distinct aggregation ------------------------------------
    QueryDef("q14_distinct_parts_suppliers",
      (s, d) => T.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
             countDistinct(col("l_suppkey")).as("n_supps"),
             count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag"),
      Some("""
        SELECT l_returnflag,
          COUNT(DISTINCT l_partkey) AS n_parts,
          COUNT(DISTINCT l_suppkey) AS n_supps,
          COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // ---- q15: join + agg + top-k --------------------------------------------
    QueryDef("q15_top_parts_by_quantity",
      (s, d) => T.lineitem(s, d)
        .join(broadcast(T.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_partkey", "p_name")
        .agg(sum(dec2("l_quantity")).cast("double").as("total_qty"))
        .orderBy(col("total_qty").desc, col("p_partkey"))
        .limit(20),
      Some("""
        SELECT p_partkey, p_name,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_partkey, p_name
        ORDER BY total_qty DESC, p_partkey
        LIMIT 20""")),

    // ---- q17: string function library over part -----------------------------
    QueryDef("q17_string_functions",
      (s, d) => T.part(s, d)
        .filter(col("p_type").like("%ECO%") || col("p_name").startsWith("red"))
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          substring(col("p_name"), 1, 8).as("name_prefix"),
          length(col("p_name")).cast("long").as("name_len"),
          regexp_replace(col("p_type"), "[AEIOU]", "_").as("type_masked"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          lpad(col("p_size").cast("string"), 4, "0").as("size_pad"))
        .orderBy("p_partkey"),
      Some("""
        SELECT p_partkey,
          UPPER(p_brand) AS brand_u,
          SUBSTRING(p_name, 1, 8) AS name_prefix,
          CAST(LENGTH(p_name) AS BIGINT) AS name_len,
          regexp_replace(p_type, '[AEIOU]', '_', 'g') AS type_masked,
          concat_ws('|', p_brand, p_type) AS brand_type,
          lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad
        FROM part
        WHERE p_type LIKE '%ECO%' OR p_name LIKE 'red%'
        ORDER BY p_partkey""")),

    // ---- q18: conditional aggregation (CASE pivot) --------------------------
    QueryDef("q18_conditional_agg",
      (s, d) => T.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
          sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_p"),
          sum(when(col("o_orderstatus") === "F", dec2("o_totalprice"))
            .otherwise(lit(0).cast("decimal(12,2)"))).cast("double").as("f_total"))
        .orderBy("o_orderpriority"),
      Some("""
        SELECT o_orderpriority,
          CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
          CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
          CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
          CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(12,2))
                        ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS f_total
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // ---- q19: correlated scalar subquery (latest order per customer) --------
    QueryDef("q19_latest_order",
      (s, d) => {
        T.customer(s, d).createOrReplaceTempView("g19_customer")
        T.orders(s, d).createOrReplaceTempView("g19_orders")
        s.sql("""
          SELECT c_custkey, c_name,
            (SELECT MAX(o_orderdate) FROM g19_orders WHERE o_custkey = c_custkey) AS last_order
          FROM g19_customer
          WHERE c_acctbal > 9000
          ORDER BY c_custkey""")
      },
      Some("""
        SELECT c_custkey, c_name,
          (SELECT MAX(o_orderdate) FROM orders WHERE o_custkey = c_custkey) AS last_order
        FROM customer
        WHERE c_acctbal > 9000
        ORDER BY c_custkey""")),

    // ---- q20: lead/lag window functions over events -------------------------
    QueryDef("q20_event_gaps",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        T.events(s, d)
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .withColumn("gap_us", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
          .groupBy("event_type", "prev_type")
          .agg(count(lit(1)).as("n"), max(col("gap_us")).as("max_gap_us"))
          .orderBy("event_type", "prev_type")
      },
      Some("""
        WITH g AS (SELECT event_type,
            lag(event_type) OVER w AS prev_type,
            epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT event_type, prev_type, COUNT(*) AS n, MAX(gap_us) AS max_gap_us
        FROM g GROUP BY 1, 2 ORDER BY event_type, prev_type""")),

    // ---- q16: agg-subquery join (above-nation-average customers) ------------
    QueryDef("q16_above_avg_customers",
      (s, d) => {
        val c = T.customer(s, d)
        val natAvg = c.groupBy("c_nationkey")
          .agg((sum(dec2("c_acctbal")).cast("double") / count(lit(1))).as("nation_avg"))
        c.join(natAvg, Seq("c_nationkey"))
          .filter(col("c_acctbal") > col("nation_avg"))
          .select("c_custkey", "c_name", "c_acctbal")
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        JOIN (SELECT c_nationkey,
                CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS nation_avg
              FROM customer GROUP BY c_nationkey) na
          USING (c_nationkey)
        WHERE c_acctbal > nation_avg
        ORDER BY c_custkey""")),

    // ---- q21: PIVOT (RelationalGroupedDataset.pivot with explicit values —
    // deterministic column set, no value-discovery job) ---------------------
    QueryDef("q21_pivot_priority",
      (s, d) => T.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("yr"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(sum(dec2("o_totalprice")).cast("double"))
        .orderBy("yr"),
      Some("""
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
          CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
            THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS "1-URGENT",
          CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'
            THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS "2-HIGH",
          CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM'
            THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS "3-MEDIUM",
          CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
            THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS "4-NOT SPECIFIED",
          CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
            THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS "5-LOW"
        FROM orders GROUP BY 1 ORDER BY yr""")),

    // ---- q22: explicit GROUPING SETS (beyond the q09 ROLLUP / q13 CUBE
    // shapes: an arbitrary, non-hierarchical set list) ----------------------
    QueryDef("q22_grouping_sets",
      (s, d) => T.orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(dec2("o_totalprice")).cast("double").as("total_price"))
        .orderBy("o_orderstatus", "o_orderpriority"),
      Some("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderpriority), ())
        ORDER BY o_orderstatus, o_orderpriority"""))
  )
}
