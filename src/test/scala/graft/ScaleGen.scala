package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (test scope): synthesize a 10× scale decade from sf0.1 —
  * ten id-shifted shards per table, written OUTSIDE the read-only
  * testdata tree (default /tmp/sf1) — so the full bench can measure
  * per-query scaling exponents over a real decade (SCALE.md "Measured
  * scaling").
  *
  * Shard k shifts every surrogate key by k·10⁹ (k·1000 for the int
  * nation/region keys), keeping all intra-shard join relationships
  * intact; dimension NAMES are unchanged, so name-keyed aggregates
  * merge across shards (10× group mass, same group count — the
  * realistic shape). Text and embeddings are deterministically
  * PERTURBED per shard (every 7th token tagged; a per-shard epsilon on
  * vectors) so cross-shard duplicate/near-dup density stays organic —
  * naive replication would square the duplicate pair count and poison
  * the exponent measurement with workload growth that is not data
  * growth.
  *
  * Run: sbt "Test/runMain graft.ScaleGen /root/testdata/sf0.1 /tmp/sf1"
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Engine.session(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt, appName = "graft-scale-gen")

    val SHIFT = 1000000000L

    def shards(t: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until copies).map(k => f(t, k)).reduce(_ unionByName _)

    def shiftCols(df: DataFrame, k: Int, longKeys: Seq[String],
        intKeys: Seq[String] = Nil): DataFrame = {
      val step1 = longKeys.foldLeft(df)((d, c) =>
        d.withColumn(c, col(c) + lit(SHIFT * k)))
      intKeys.foldLeft(step1)((d, c) =>
        d.withColumn(c, col(c) + lit(1000 * k)))
    }

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scale-gen] $name: ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }

    write("region", shards(Tables.region(spark, src))(
      (t, k) => shiftCols(t, k, Nil, Seq("r_regionkey"))))
    write("nation", shards(Tables.nation(spark, src))(
      (t, k) => shiftCols(t, k, Nil, Seq("n_nationkey", "n_regionkey"))))
    write("customer", shards(Tables.customer(spark, src))(
      (t, k) => shiftCols(t, k, Seq("c_custkey"), Seq("c_nationkey"))))
    write("supplier", shards(Tables.supplier(spark, src))(
      (t, k) => shiftCols(t, k, Seq("s_suppkey"), Seq("s_nationkey"))))
    write("part", shards(Tables.part(spark, src))(
      (t, k) => shiftCols(t, k, Seq("p_partkey"))))
    write("orders", shards(Tables.orders(spark, src))(
      (t, k) => shiftCols(t, k, Seq("o_orderkey", "o_custkey"))))
    write("lineitem", shards(Tables.lineitem(spark, src))(
      (t, k) => shiftCols(t, k,
        Seq("l_orderkey", "l_partkey", "l_suppkey"))))
    write("events", shards(Tables.events(spark, src))(
      (t, k) => shiftCols(t, k, Seq("event_id", "user_id"))))

    // documents: ids shift; shard k > 0 splices the shard tag into the
    // MIDDLE of every token — a per-token VALUE map (not positional),
    // so two within-shard near-duplicates transform identically and
    // keep their similarity, while cross-shard exact/near-dup density
    // collapses to organic levels at ANY gram size (an end-of-token
    // suffix leaves most char-3-grams shared; a mid-token splice
    // breaks them) — naive replication would square duplicate pair
    // counts and poison scaling-exponent measurement with workload
    // growth that is not data growth
    write("documents", shards(Tables.documents(spark, src)) { (t, k) =>
      val shifted = shiftCols(t, k, Seq("doc_id"))
      if (k == 0) shifted
      else shifted
        .withColumn("text",
          when(col("text").isNotNull,
            concat_ws(" ",
              transform(split(col("text"), " "), { tok =>
                val half = (length(tok) / 2 + 1).cast("int")
                when(length(tok) > 0,
                  concat(tok.substr(lit(1), half), lit("~" + k),
                    tok.substr(half + 1, length(tok))))
                  .otherwise(tok)
              }))))
        .withColumn("n_chars",
          when(col("text").isNotNull, length(col("text")).cast("long"))
            .otherwise(col("n_chars")))
    })

    // embeddings: ids shift; shard k > 0 adds a deterministic per-shard
    // per-dimension epsilon so vectors stay distinct but neighborhoods
    // keep organic density
    write("embeddings", shards(Tables.embeddings(spark, src)) { (t, k) =>
      val shifted = shiftCols(t, k, Seq("vec_id"))
      if (k == 0) shifted
      else shifted.withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          (x + lit(0.0037f * k) * (lit(1.0f) +
            (i % 5).cast("float") * lit(0.21f))).cast("float")))
    })

    spark.stop()
  }
}
