package graft

/** Dev plan-dump for the x85/x112 divergence — test scope only.
  * Usage: sbt "Test/runMain graft.X85Plan <dir> <outPrefix>" */
object X85Plan {
  def main(args: Array[String]): Unit = {
    val Array(dir, out) = args.take(2)
    val spark = Engine.session(appName = "x85plan")
    Seq("x85_span_dedup", "x112_span_dedup_all").foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$out.$n.txt"),
        df.queryExecution.executedPlan.toString
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
