package graft

import scala.collection.mutable

/** Dev profiling harness (test scope, never ships): per-query stage
  * breakdown — wall time, job count, and the top stages by task time
  * with their shuffle/input volumes. Usage:
  *   sbt "Test/runMain graft.Prof <warmDir> <profDir> <query> [query ...]"
  */
object Prof {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: Prof <warmDir> <profDir> <query> [query ...]")
    val (warmDir, profDir) = (args(0), args(1))
    val qs = args.drop(2).toSeq
    val spark = Engine.session(appName = "prof")
    // experiment knob: PROF_MIN_PARTITION_SIZE=64k shrinks AQE's coalesce
    // floor so CPU-dense small-byte shuffles keep their parallelism
    sys.env.get("PROF_MIN_PARTITION_SIZE").foreach { v =>
      spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize", v)
    }

    final case class St(name: String, var ms: Long = 0L, var tasks: Int = 0,
        var taskMs: Long = 0L, var shufR: Long = 0L, var shufW: Long = 0L,
        var in: Long = 0L, var out: Long = 0L, var gcMs: Long = 0L,
        var cpuMs: Long = 0L)
    val stages = mutable.ArrayBuffer.empty[St]
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val m = si.taskMetrics
          val st = St(si.name.takeWhile(_ != '\n'))
          st.ms = (for {a <- si.completionTime; b <- si.submissionTime}
            yield a - b).getOrElse(0L)
          st.tasks = si.numTasks
          if (m != null) {
            st.taskMs = m.executorRunTime
            st.shufR = m.shuffleReadMetrics.totalBytesRead
            st.shufW = m.shuffleWriteMetrics.bytesWritten
            st.in = m.inputMetrics.bytesRead
            st.out = m.outputMetrics.bytesWritten
            st.gcMs = m.jvmGCTime
            st.cpuMs = m.executorCpuTime / 1000000L
          }
          stages.synchronized { stages += st }; ()
        }
      })

    def run(n: String, dir: String): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    for (q <- qs) {
      run(q, warmDir) // warm codegen/JIT
      Thread.sleep(300)
      stages.synchronized(stages.clear()); jobs.set(0)
      val t = run(q, profDir)
      Thread.sleep(500) // let listener drain
      val snap = stages.synchronized(stages.toVector)
      println(f"\n=== $q  wall=$t%.2fs  jobs=${jobs.get}  stages=${snap.size}  " +
        f"sumStageWall=${snap.map(_.ms).sum / 1e3}%.2fs  " +
        f"sumTaskTime=${snap.map(_.taskMs).sum / 1e3}%.2fs  " +
        f"sumCpu=${snap.map(_.cpuMs).sum / 1e3}%.2fs  " +
        f"sumGc=${snap.map(_.gcMs).sum / 1e3}%.2fs ===")
      for (st <- snap.sortBy(-_.ms).take(14))
        println(f"  ${st.ms / 1e3}%6.2fs wall ${st.taskMs / 1e3}%7.2fs task " +
          f"${st.cpuMs / 1e3}%6.2fs cpu ${st.gcMs / 1e3}%5.2fs gc " +
          f"n=${st.tasks}%4d in=${st.in / 1e6}%6.1fMB sr=${st.shufR / 1e6}%5.1fMB " +
          f"sw=${st.shufW / 1e6}%5.1fMB  ${st.name.take(60)}")
    }
    spark.stop()
  }
}
