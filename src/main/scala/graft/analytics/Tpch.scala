package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Batch-analytics surface over the TPC-H-ish harness tables: scan +
  * pushdown, hash/broadcast joins, semi/anti joins, analytic window
  * functions, top-k, set ops.
  *
  * The reference has no dataflow joins (SURVEY.md §2.4) — this module is the
  * engine's general-purpose batch surface, required by the correctness
  * harness and by any real deployment.
  *
  * Scale notes: dimension joins (`region`, `nation`) are explicitly
  * broadcast; fact-fact joins shuffle on their keys and rely on AQE for
  * skew. All money arithmetic runs in exact DECIMAL (order-independent,
  * engine-portable); doubles appear only as final outputs.
  */
object Tpch {

  private val D12_2 = DecimalType(12, 2)
  private val D4_2 = DecimalType(4, 2)
  private def one = lit(1).cast(DecimalType(3, 2))

  private def price = col("l_extendedprice").cast(D12_2)
  private def disc = col("l_discount").cast(D4_2)
  private def tax = col("l_tax").cast(D4_2)
  private def qty = col("l_quantity").cast(D12_2)

  /** TPC-H Q1: pricing summary. Single hash aggregate after a pushed-down
    * timestamp range filter; partial aggregation map-side. */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(qty).cast("double").as("sum_qty"),
        sum(price).cast("double").as("sum_base_price"),
        sum(price * (one - disc)).cast("double").as("sum_disc_price"),
        sum(price * (one - disc) * (one + tax)).cast("double").as("sum_charge"),
        (sum(qty).cast("double") / count(lit(1)).cast("double")).as("avg_qty"),
        (sum(price).cast("double") / count(lit(1)).cast("double")).as("avg_price"),
        (sum(disc).cast("double") / count(lit(1)).cast("double")).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** Revenue per region/nation: fact-fact shuffle joins for
    * lineitem⋈orders⋈customer, explicit broadcast for the tiny dims. */
  def regionRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), (price * (one - disc)).as("rev"))
    val ord = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    val nat = Tables.nation(s, dir)
    val reg = Tables.region(s, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(col("rev")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Top-k customers by total order value: aggregate-then-sort; the sort
    * runs on #customers rows (post-agg), never on raw orders. Deterministic
    * tie-break on the key. */
  def topCustomers(s: SparkSession, dir: String, k: Int = 10): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(sum(col("o_totalprice").cast(D12_2)).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(k)

  /** TPC-H Q4-style: orders having at least one heavy lineitem — left-semi
    * join (no fan-out, no dedup pass). */
  def priorityWithHeavyItems(s: SparkSession, dir: String): DataFrame = {
    val heavy = Tables.lineitem(s, dir)
      .filter(col("l_quantity") > 45.0)
      .select(col("l_orderkey"))
    Tables.orders(s, dir)
      .join(heavy, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
  }

  /** Customers with no big-ticket orders, per market segment — left-anti
    * join against a pushed-down filtered build side. */
  def customersWithoutOrders(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_totalprice") > 300000.0),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))

  /** Top-3 parts per supplier by revenue — ranking window function over
    * pre-aggregated (supplier, part) partials.
    *
    * Default plan (`preAggregate = true`): the skew-safe two-exchange
    * shape — map-side partial aggregation combines each split's
    * (supp, part) rows before any shuffle, so no task's input exceeds
    * the supplier's DISTINCT parts even when one supplier dominates the
    * raw table (AQE cannot split window partitions, so skew must be
    * handled before the window either way). At 100 TB a hot key is the
    * failure mode that kills the job; paying one extra exchange over
    * already-tiny partials is the cheap insurance.
    *
    * `preAggregate = false` opts into the single-shuffle plan:
    * hash-partitioning raw rows on suppkey alone satisfies both the
    * (suppkey, partkey) aggregation (subset clustering) and the
    * window's suppkey clustering, making the agg→window pipeline
    * exchange-free after one raw-row shuffle — but it trades away
    * map-side combine and concentrates each supplier's raw rows on one
    * task. Right only when keys are known-uniform and raw rows barely
    * outnumber (supp, part) pairs. */
  def supplierPartRank(s: SparkSession, dir: String, topN: Int = 3,
      preAggregate: Boolean = true): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val partitioned = if (preAggregate) li else li.repartition(col("l_suppkey"))
    val rev = partitioned
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(price * (one - disc)).cast("double").as("part_revenue"))
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("part_revenue").desc, col("l_partkey"))
    rev.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topN)
  }

  /** Relational set ops: BUILDING-segment customers who did / did not place
    * an order (INTERSECT / EXCEPT on keys), labeled and unioned. */
  def segmentSetOps(s: SparkSession, dir: String): DataFrame = {
    val building = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val orderers = Tables.orders(s, dir)
      .select(col("o_custkey").as("c_custkey"))
    building.intersect(orderers).withColumn("op", lit("intersect"))
      .unionAll(building.except(orderers).withColumn("op", lit("except")))
  }

  /** Stream-table enrichment pattern: events joined to the customer
    * table (events.user_id → c_custkey), aggregated per segment. No
    * broadcast hint — customer grows with the scale factor, so the
    * planner/AQE decides: broadcast below the threshold, shuffle join
    * above it. */
  def eventsBySegment(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    ev.join(cust, ev("user_id") === cust("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double")
          .as("total_value"))
  }
}
