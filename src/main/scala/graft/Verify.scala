package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query names (builder-side
    // spot checks); the driver passes exactly (sfDir, outDir)
    val Array(sfDir, outDir) = args.take(2)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // same engine configuration the benchmark runs (AQE, broadcast
    // threshold, UTC) — the correctness gate must validate the engine
    // as benchmarked, not a differently-configured twin
    val spark = Engine.session(
      master = s"local[$cpus]",
      shufflePartitions = cpus.toInt,
      appName = "graft-verify")
    new java.io.File(outDir).mkdirs()
    var failed = 0
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // remove any stale output first: a query that fails at analysis
      // time writes nothing, and a leftover dir from a previous run
      // would be silently graded in its place
      val target = Paths.get(s"$outDir/$name")
      if (Files.isDirectory(target)) {
        import scala.jdk.CollectionConverters._
        scala.util.Using.resource(Files.walk(target)) { stream =>
          stream.iterator().asScala.toSeq.reverse.foreach(Files.delete)
        }
      }
      System.err.println(s"[verify] running $name")
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    if (failed > 0)
      System.err.println(s"[verify] $failed of ${SparkEntry.queries.size} " +
        "queries failed; their output dirs are absent")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
