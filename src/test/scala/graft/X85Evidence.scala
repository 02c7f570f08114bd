package graft

import org.apache.spark.sql.functions._

/** Candidate-mass evidence for the x85 scaling disposition (test scope
  * only, never ships): per SF, counts the three relations that drive
  * SpanDedup.excise's cost — window occurrences (data-linear by
  * construction), duplicated fingerprints, and span join-back rows
  * (the "candidate mass", ∝ duplicated-window occurrences = the
  * output-driving excision work). Usage:
  *   sbt "Test/runMain graft.X85Evidence <dir> [<dir> ...]"
  */
object X85Evidence {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: X85Evidence <sfDir> [...]")
    val spark = Engine.session(appName = "x85evidence")
    val L = 20 // x85's windowTokens
    args.foreach { dir =>
      val docs = Tables.documents(spark, dir)
        .filter(col("text").isNotNull)
      val occ = docs.select(col("doc_id").as("_id"),
          posexplode(graft.functions.TokenWindowExprs
            .tokenWindowFps(col("text"), L)).as(Seq("_p0", "_fp")))
        .select(col("_id"), col("_p0").as("_pos"), col("_fp"))
      val byFp = occ.groupBy(col("_fp")).agg(count(lit(1)).as("_df"))
      val nOcc = occ.count()
      val dup = byFp.filter(col("_df") > 1)
        .agg(count(lit(1)).as("fps"), sum(col("_df")).as("occ"),
          max(col("_df")).as("maxDf"))
        .collect()(0)
      val nDocs = docs.count()
      println(s"X85EVIDENCE dir=$dir docs=$nDocs windows=$nOcc " +
        s"dupFps=${dup.getLong(0)} spanRows=${dup.getLong(1)} " +
        s"maxDf=${dup.getLong(2)}")
    }
    spark.stop()
  }
}
