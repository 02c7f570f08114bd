package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Throwaway micro-bench for round-17 A/Bs (test scope, not part of any
  * suite). Interleaves variants in ONE JVM so box noise hits both arms. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(appName = "scratch")
    import graft.operators.{Dedup, Graph}

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Tables.documents(spark, dir)
    def edges = Dedup.simhashPairs(docs, maxHamming = 3, poly = true)

    // pageRank with a lineage-cut CADENCE: checkpoint every k rounds
    // instead of every round (same math, same output)
    def pageRankCadence(k: Int): DataFrame = {
      val damping = 0.85; val iters = 10
      val sym = edges
        .filter(col("doc_a").isNotNull && col("doc_b").isNotNull)
        .select(col("doc_a").as("u"), col("doc_b").as("v"))
        .union(edges
          .filter(col("doc_a").isNotNull && col("doc_b").isNotNull)
          .select(col("doc_b").as("u"), col("doc_a").as("v")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("deg"))
        .select(col("u").as("node"), col("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val n = deg.count()
      val teleport = (1.0 - damping) / n
      var ranks = deg.select(col("node"), lit(1.0 / n).as("r"))
      for (i <- 1 to iters) {
        val contrib = ranks.join(deg, Seq("node"))
          .select(col("node").as("u"), (col("r") / col("deg")).as("c"))
        val next = sym.join(contrib, Seq("u"))
          .groupBy(col("v"))
          .agg((lit(teleport) + lit(damping) * sum(col("c"))).as("r"))
          .select(col("v").as("node"), col("r"))
        ranks = if (i % k == 0 || i == iters)
          next.localCheckpoint(eager = false) else next
      }
      ranks.select(col("node"), round(col("r"), 6).as("pr"))
        .select(col("node").as("doc_id"), col("pr"))
    }

    def current(): DataFrame =
      Graph.pageRank(edges).select(col("node").as("doc_id"), col("pr"))

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "cur-k1" -> (() => current()),
      "cad-k2" -> (() => pageRankCadence(2)),
      "cad-k5" -> (() => pageRankCadence(5)))
    arms.foreach { case (_, f) => noop(f()) } // warm
    val t = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (_ <- 0 until 4; (arm, f) <- arms) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      noop(f())
      t(arm) = t(arm) :+ (System.nanoTime() - t0) / 1e9
    }
    for ((arm, _) <- arms) {
      val ts = t(arm)
      println(f"[scratch] x63/$arm best=${ts.min}%6.3f " +
        f"med=${ts.sorted.apply(ts.size / 2)}%6.3f " +
        s"all=${ts.map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
