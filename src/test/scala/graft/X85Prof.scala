package graft

/** Dev profiling harness for the span-dedup family (x85/x112) — test
  * scope only, never ships. Usage:
  *   sbt "Test/runMain graft.X85Prof <warmDir> <profDir> [query ...]"
  * e.g. warmDir=/root/testdata/sf0.001 profDir=/tmp/sf1. */
object X85Prof {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: X85Prof <warmDir> <profDir> [query ...]")
    val (warmDir, profDir) = (args(0), args(1))
    val qs = if (args.length > 2) args.drop(2).toSeq
      else Seq("x112_span_dedup_all", "x85_span_dedup")
    val spark = Engine.session(appName = "x85prof")
    def run(n: String, dir: String, report: Boolean): Unit = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      if (report) println(f"$n%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    qs.foreach(run(_, warmDir, report = false)) // warm JIT/codegen
    for (_ <- 0 until 2) qs.foreach(run(_, profDir, report = true))
    spark.stop()
  }
}
