package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** Co-located joins over bucketed tables: the join-key shuffle happens
  * once at write time, then every join on the key is exchange-free. */
class BucketingSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  /** Fresh bucketed tables, written once per suite run no matter which
    * test executes first — each test calls this instead of depending on
    * a sibling test's side effects (reordering- and single-test-safe). */
  private lazy val ensureBucketed: Unit = {
    for (t <- Seq("b_lineitem", "b_orders")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$t")
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(loc, true)
    }
    Bucketing.writeBucketed(
      Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity"),
      "b_lineitem", Seq("l_orderkey"), buckets = 4)
    Bucketing.writeBucketed(
      Tables.orders(spark, dir).select("o_orderkey", "o_totalprice"),
      "b_orders", Seq("o_orderkey"), buckets = 4)
  }

  test("bucketed fact-fact join runs with zero exchanges") {
    ensureBucketed

    // force the non-broadcast path: at test scale the planner would
    // broadcast, which bypasses (and hides) the bucketed join
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
      val n = joined.count()
      assert(n > 0)

      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle, plan was:\n$plan")

      // same join on the raw (unbucketed) parquet shuffles both sides
      val raw = Tables.lineitem(spark, dir).select("l_orderkey")
        .join(Tables.orders(spark, dir).select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"))
      raw.count()
      assert(raw.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("join + aggregation on the bucket key run with zero exchanges " +
    "end-to-end, matching the shuffled-plan result") {
    ensureBucketed
    // the bucket distribution satisfies BOTH the join and the keyed
    // aggregation: neither adds an Exchange
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val agg = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(12,2)")).as("qty"))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
        agg.queryExecution.executedPlan)
      val got = agg.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2))).toSet
      val dir = "/root/testdata/sf0.001"
      val plain = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(12,2)")).as("qty"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2))).toSet
      assert(got === plain)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("writePartitioned: parquet and orc round-trip byte-equal data, " +
    "readers prune partitions, replay overwrites only its own " +
    "partitions") {
    import graft.operators.Layout
    import java.nio.file.Files
    import spark.implicits._
    val docs = Seq(
      (1L, "src0", "alpha"), (2L, "src0", "beta"),
      (3L, "src1", "gamma"), (4L, "src2", "delta")
    ).toDF("doc_id", "source", "text")
    for (fmt <- Seq("parquet", "orc")) {
      val dir = s"${Files.createTempDirectory(s"wpart-$fmt-")}/t"
      Layout.writePartitioned(docs, dir, Seq("source"), format = fmt)
      val back = spark.read.format(fmt).load(dir)
      assert(back.select($"doc_id", $"source", $"text")
        .as[(Long, String, String)].collect().toSet ===
        docs.as[(Long, String, String)].collect().toSet)
      // partition pruning: the source predicate lands in PartitionFilters
      val plan = back.filter($"source" === "src1")
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [isnotnull(source"), plan)
      // dynamic overwrite: rewriting ONLY src0 leaves src1/src2 intact
      val v2 = Seq((9L, "src0", "epsilon")).toDF("doc_id", "source", "text")
      Layout.writePartitioned(v2, dir, Seq("source"), format = fmt)
      val after = spark.read.format(fmt).load(dir)
        .select($"doc_id", $"source", $"text")
        .as[(Long, String, String)].collect().toSet
      assert(after === Set((9L, "src0", "epsilon"),
        (3L, "src1", "gamma"), (4L, "src2", "delta")), fmt)
    }
    val e = intercept[IllegalArgumentException] {
      Layout.writePartitioned(docs, "/tmp/x", Seq("source"),
        format = "csv")
    }
    assert(e.getMessage.contains("parquet or orc"))
    val e2 = intercept[IllegalArgumentException] {
      Layout.writePartitioned(docs, "/tmp/x", Seq())
    }
    assert(e2.getMessage.contains("partitionCols"))
  }
}
