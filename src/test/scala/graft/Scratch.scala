package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Throwaway micro-bench for round-17 A/Bs (test scope, not part of any
  * suite). Interleaves variants in ONE JVM so box noise hits both arms. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(appName = "scratch")
    import graft.operators.{Dedup, Materialize}
    import graft.functions.{PrefixExprs, ShingleExprs}

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Tables.documents(spark, dir)
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    val delta = docs.filter(col("doc_id") % 7 === 0)

    // "old" jaccardIndex: identical to Dedup.jaccardIndex but WITHOUT
    // the docs materialization (the pre-round-17 shape)
    def jaccardIndexOld(threshold: Double, n: Int,
        blockCol: Option[String]): Dedup.JaccardIndex = {
      val tLow = BigDecimal.valueOf(threshold) - BigDecimal("1e-12")
      val blk = blockCol.map(c => col(c)).getOrElse(lit(""))
      val g = corpus
        .select(col("doc_id").as("id"), blk.as("blk"),
          ShingleExprs.shingleSetChars(col("text"), n).as("ng"))
        .filter(col("ng").isNotNull)
        .withColumn("sz", size(col("ng")))
        .localCheckpoint(eager = true)
      val gramDf = g.select(explode(col("ng")).as("gram"))
        .groupBy(col("gram")).agg(count(lit(1)).as("df"))
      val dictRow = gramDf
        .agg(array_sort(collect_list(struct(col("gram"), col("df"))))
          .as("gd"))
        .select(
          transform(col("gd"), x => x.getField("gram")).as("dict_grams"),
          transform(col("gd"), x => x.getField("df")).as("dict_dfs"))
      val idxDocs = g.crossJoin(broadcast(dictRow))
        .select(col("id"), col("blk"), col("ng"), col("sz"),
          PrefixExprs.rankedPrefixGrams(col("ng"),
            col("dict_grams"), col("dict_dfs"), tLow).as("prefix"))
      Dedup.JaccardIndex(idxDocs, gramDf, threshold, n)
    }

    def x117Old(): DataFrame =
      Dedup.containmentPairsDelta(delta, jaccardIndexOld(0.9, 12, None))
    def x117New(): DataFrame =
      Dedup.containmentPairsDelta(delta,
        Dedup.jaccardIndex(corpus, threshold = 0.9, n = 12))
    def x101Old(): DataFrame =
      Dedup.ngramJaccardDelta(delta, jaccardIndexOld(0.5, 3, Some("source")),
        blockCol = Some("source"))
    def x101New(): DataFrame =
      Dedup.ngramJaccardDelta(delta,
        Dedup.jaccardIndex(corpus, threshold = 0.5, n = 3,
          blockCol = Some("source")),
        blockCol = Some("source"))

    // interleaved: old,new,old,new,... 4 rounds each after 1 warm-up each
    def ab(name: String, mk: Map[String, () => DataFrame]): Unit = {
      mk.values.foreach(f => noop(f())) // warm both arms
      val times = scala.collection.mutable.Map.empty[String, List[Double]]
        .withDefaultValue(Nil)
      for (_ <- 0 until 4; (arm, f) <- mk.toSeq.sortBy(_._1)) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        noop(f())
        times(arm) = times(arm) :+ (System.nanoTime() - t0) / 1e9
      }
      for ((arm, ts) <- times.toSeq.sortBy(_._1))
        println(f"[scratch] $name/$arm best=${ts.min}%6.3f " +
          s"all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    ab("x117", Map("old" -> (() => x117Old()), "new" -> (() => x117New())))
    ab("x101", Map("old" -> (() => x101Old()), "new" -> (() => x101New())))
    spark.stop()
  }
}
