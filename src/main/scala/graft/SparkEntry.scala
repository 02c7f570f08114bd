package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.analytics.{PageAnalytics, QzMastery, RegisterAnalytics, Tpch}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a matching DuckDB oracle in `oracleSql`
  * (unless the operator is not SQL-expressible, e.g. hash-seeded LSH).
  * Column names and value arithmetic are aligned between both sides:
  * double aggregations go through exact DECIMAL(18,6) sums (order-
  * independent, identical across engines) and only the final arithmetic
  * step runs in double.
  */
object SparkEntry {

  /** Exact, order-independent sum of a double column: cast each value to
    * DECIMAL(18,6) (exact for this corpus's ≤2-decimal doubles), sum
    * exactly, cast the total back to double. Oracle mirror:
    * `CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)`. */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 6))).cast("double")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_platform_agg")(spark, "/root/testdata/sf0.001")

  // ---- derived qz_log stand-in over `events` (the harness tables carry no
  // qz log; the mapping is deterministic and mirrored in the oracle SQL).
  private def qzFromEvents(events: DataFrame): DataFrame =
    events.select(
      (col("user_id") % 50).as("uid"),
      (col("user_id") % 4).as("courseid"),
      (col("event_id") % 5).as("pointid"),
      (col("event_id") % 30).cast("string").as("questionid"),
      when(col("value") > 10.0, "1").otherwise("0").as("istrue"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("createtime"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J1: dimension decode (when/otherwise) + keyed aggregate
    "q1_platform_agg" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val platform = when(col("user_id") % 3 === 1, "PC")
        .when(col("user_id") % 3 === 2, "APP")
        .otherwise("Other")
      ev.groupBy(platform.as("platform"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
    }),
    // J1: sliding event-time window counts (60s/6s semantics at 1h/6min)
    "q2_sliding_window" -> ((s, dir) => {
      RegisterAnalytics.slidingCounts(
        Tables.events(s, dir), col("ts"), col("event_type"),
        "1 hour", "6 minutes")
        .withColumnRenamed("key", "event_type")
    }),
    // J1: cumulative per-key totals (updateStateByKey as batch analog)
    "q3_cumulative_daily" -> ((s, dir) => {
      RegisterAnalytics.cumulativeDaily(
        Tables.events(s, dir), col("ts"), col("event_type"))
        .withColumnRenamed("key", "event_type")
    }),
    // J2: knowledge-point mastery (collect_set + conditional sums + rates)
    "q4_qz_mastery" -> ((s, dir) =>
      QzMastery.mastery(qzFromEvents(Tables.events(s, dir)))),
    // J3: JSON field extraction + aggregate
    "q5_props_extract" -> ((s, dir) => {
      val k = get_json_object(col("props"), "$.k")
      Tables.events(s, dir)
        .select(when(k === "", null).otherwise(k).cast("long").as("k"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"))
    }),
    // J4: day-partitioned archive layout as an aggregate
    "q6_day_buckets" -> ((s, dir) =>
      PageAnalytics.dayBuckets(
          Tables.events(s, dir), col("ts"), col("event_type"))
        .withColumnRenamed("key", "event_type")),
    // Batch surface: scan+pushdown, joins, windows, top-k, set ops
    "q7_pricing_summary" -> ((s, dir) => Tpch.pricingSummary(s, dir)),
    "q8_region_revenue" -> ((s, dir) => Tpch.regionRevenue(s, dir)),
    "q9_top_customers" -> ((s, dir) => Tpch.topCustomers(s, dir)),
    "q10_priority_heavy" -> ((s, dir) => Tpch.priorityWithHeavyItems(s, dir)),
    "q11_customers_no_orders" -> ((s, dir) => Tpch.customersWithoutOrders(s, dir)),
    "q12_supplier_part_rank" -> ((s, dir) => Tpch.supplierPartRank(s, dir)),
    "q13_segment_setops" -> ((s, dir) => Tpch.segmentSetOps(s, dir)),
    "q14_events_by_segment" -> ((s, dir) => Tpch.eventsBySegment(s, dir)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_platform_agg" ->
      """SELECT CASE WHEN user_id % 3 = 1 THEN 'PC'
        |            WHEN user_id % 3 = 2 THEN 'APP'
        |            ELSE 'Other' END AS platform,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1""".stripMargin,
    "q2_sliding_window" ->
      """SELECT strftime(make_timestamp(s * 1000000), '%Y-%m-%d %H:%M:%S') AS window_start,
        |       event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM (SELECT event_type,
        |             unnest(generate_series(
        |               CAST(floor(epoch(ts) / 360) AS BIGINT) * 360 - 3240,
        |               CAST(floor(epoch(ts) / 360) AS BIGINT) * 360,
        |               360)) AS s
        |      FROM events)
        |GROUP BY 1, 2""".stripMargin,
    "q3_cumulative_daily" ->
      """SELECT day, event_type,
        |       CAST(SUM(registrations) OVER (PARTITION BY event_type ORDER BY day) AS BIGINT)
        |         AS cum_registrations
        |FROM (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
        |             COUNT(*) AS registrations
        |      FROM events GROUP BY 1, 2)""".stripMargin,
    "q4_qz_mastery" ->
      """WITH qz AS (
        |  SELECT user_id % 50 AS uid, user_id % 4 AS courseid,
        |         event_id % 5 AS pointid,
        |         CAST(event_id % 30 AS VARCHAR) AS questionid,
        |         CASE WHEN value > 10.0 THEN '1' ELSE '0' END AS istrue,
        |         strftime(ts, '%Y-%m-%d %H:%M:%S') AS createtime
        |  FROM events),
        |agg AS (
        |  SELECT uid, courseid, pointid,
        |         string_agg(DISTINCT questionid, ',' ORDER BY questionid) AS questionids,
        |         CAST(COUNT(*) AS BIGINT) AS qz_sum,
        |         CAST(COUNT(DISTINCT questionid) AS BIGINT) AS qz_count,
        |         CAST(SUM(CASE WHEN istrue = '1' THEN 1 ELSE 0 END) AS BIGINT) AS qz_istrue,
        |         MIN(createtime) AS createtime
        |  FROM qz GROUP BY 1, 2, 3)
        |SELECT uid, courseid, pointid, questionids, qz_sum, qz_count,
        |       qz_istrue, createtime,
        |       CAST(qz_istrue AS DOUBLE) / CAST(qz_sum AS DOUBLE) AS correct_rate,
        |       CAST(qz_count AS DOUBLE) / 30.0 AS qz_detail_rate,
        |       (CAST(qz_count AS DOUBLE) / 30.0) *
        |         (CAST(qz_istrue AS DOUBLE) / CAST(qz_sum AS DOUBLE)) AS mastery_rate
        |FROM agg""".stripMargin,
    "q5_props_extract" ->
      """SELECT CAST(NULLIF(regexp_extract(props, '"k":\s*(\d+)', 1), '') AS BIGINT) AS k,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "q6_day_buckets" ->
      """SELECT strftime(ts, '%Y%m%d') AS dt, event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q7_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) *
        |           (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
        |  CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2""".stripMargin,
    "q8_region_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY 1, 2""".stripMargin,
    "q9_top_customers" ->
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 10""".stripMargin,
    "q10_priority_heavy" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45.0)
        |GROUP BY 1""".stripMargin,
    "q11_customers_no_orders" ->
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |GROUP BY 1""".stripMargin,
    "q12_supplier_part_rank" ->
      """SELECT l_suppkey, l_partkey, part_revenue, rnk FROM (
        |  SELECT l_suppkey, l_partkey, part_revenue,
        |         CAST(row_number() OVER (PARTITION BY l_suppkey
        |              ORDER BY part_revenue DESC, l_partkey) AS INT) AS rnk
        |  FROM (SELECT l_suppkey, l_partkey,
        |          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |               (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        |            AS part_revenue
        |        FROM lineitem GROUP BY 1, 2))
        |WHERE rnk <= 3""".stripMargin,
    "q13_segment_setops" ->
      """SELECT c_custkey, 'intersect' AS op FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  INTERSECT
        |  SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT c_custkey, 'except' AS op FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  EXCEPT
        |  SELECT o_custkey FROM orders)""".stripMargin,
    "q14_events_by_segment" ->
      """SELECT c_mktsegment,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1""".stripMargin,
  )
}
