package graft
object ExplainX85 {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(appName = "x85prof")
    def run(n: String): Unit = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, "/tmp/sf1")
        .write.format("noop").mode("overwrite").save()
      println(f"$n%-22s ${(System.nanoTime()-t0)/1e9}%8.2f s")
    }
    // warm
    SparkEntry.queries("x85_span_dedup")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    SparkEntry.queries("x112_span_dedup_all")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    for (_ <- 0 until 2) { run("x112_span_dedup_all"); run("x85_span_dedup") }
    spark.stop()
  }
}
