package graft

import org.apache.spark.sql.functions._

import graft.operators.Materialize

/** The reliable-checkpoint branch of [[Materialize.eager]] — local
  * runs always take localCheckpoint, so this spec is the ONLY
  * exercise of the persist-then-checkpoint idiom (round-11 advisory:
  * without the persist, the eager action computes the child once and
  * ReliableCheckpointRDD's write job recomputes the unpersisted
  * lineage — a silent 2× on every cluster call site). The shared
  * SparkContext's checkpoint dir is restored in finally so no other
  * suite changes branch. */
class MaterializeSpec extends SparkTestBase {
  import spark.implicits._

  test("reliable branch: correct rows, lineage cut to a checkpoint " +
    "scan, and nothing left registered in the CacheManager") {
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty,
      "precondition: the shared context must start without a " +
        "checkpoint dir (other suites rely on the local branch)")
    // earlier suites in the shared JVM may have left cache entries
    // (operators persist internally); start from a clean CacheManager
    // so the leak assert below sees only THIS call's residue
    spark.sharedState.cacheManager.clearCache()
    val dir = java.nio.file.Files
      .createTempDirectory("graft_materialize_spec_").toString
    sc.setCheckpointDir(dir)
    try {
      val df = (1 to 100).toDF("x")
        .groupBy(($"x" % 7).as("k")).agg(sum($"x").as("s"))
      val out = Materialize.eager(df)
      // correct content
      assert(out.as[(Int, Long)].collect().toMap ===
        (1 to 100).groupBy(_ % 7).map { case (k, xs) =>
          k -> xs.map(_.toLong).sum })
      // lineage is CUT: the materialized plan is a scan of checkpoint
      // blocks, not the original aggregate
      val plan = out.queryExecution.optimizedPlan.toString
      assert(!plan.contains("Aggregate"), plan)
      // checkpoint files actually exist under the dir (the reliable
      // branch, not a localCheckpoint)
      def anyFile(f: java.io.File): Boolean = {
        val kids = Option(f.listFiles()).getOrElse(Array.empty)
        kids.exists(k => k.isFile && k.getName.startsWith("part-")) ||
          kids.exists(anyFile)
      }
      assert(anyFile(new java.io.File(dir)), s"no checkpoint files in $dir")
      // the idiom's persist was released: no cache entry leaked into
      // the session (the round-8 cache-lifecycle discipline)
      assert(spark.sharedState.cacheManager.isEmpty,
        "Materialize.eager left a CacheManager entry registered")
      // and the returned frame survives re-reads (reads files, not
      // the released cache)
      assert(out.count() === 7L)
    } finally {
      // checkpointDir is private[spark]; restore None reflectively so
      // every other suite keeps the local branch
      sc.getClass.getMethod("checkpointDir_$eq", classOf[Option[_]])
        .invoke(sc, None)
      spark.sharedState.cacheManager.clearCache()
    }
  }
}
