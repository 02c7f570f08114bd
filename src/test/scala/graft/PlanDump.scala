package graft

/** Dump `.explain("formatted")` for queries to plans/<tag>/<q>_<suffix>.txt
  * (test scope, never ships). Usage:
  *   sbt "Test/runMain graft.PlanDump <dir> <tag> <suffix> <query> [...]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanDump <dataDir> <tag> <suffix> <query> [query ...]")
    val (dir, tag, suffix) = (args(0), args(1), args(2))
    val spark = Engine.session(appName = "plandump")
    val out = new java.io.File(s"plans/$tag")
    out.mkdirs()
    for (q <- args.drop(3)) {
      val plan = SparkEntry.queries(q)(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        new java.io.File(out, s"${q}_$suffix.txt").toPath,
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote plans/$tag/${q}_$suffix.txt")
    }
    spark.stop()
  }
}
