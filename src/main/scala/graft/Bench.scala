package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): run every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  *
  * Queries execute to a noop sink — full plan execution (scan, shuffles,
  * codegen) without driver-side collection, so the number measures the
  * engine, not result transfer. A small warm-up query absorbs one-time JVM
  * and codegen cost before anything is timed.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session(appName = "graft-bench")

    // warm-up: touch each table family once, exercise codegen paths
    Tables.lineitem(spark, sfDir).limit(1000)
      .write.format("noop").mode("overwrite").save()
    Tables.events(spark, sfDir).limit(1000)
      .write.format("noop").mode("overwrite").save()

    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) => name -> time(fn)
    }
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
