package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Local-mode defaults tuned for the test harness (`local[32]`, 32 shuffle
  * partitions) but every setting is scale-motivated: AQE handles runtime
  * re-planning (coalescing small shuffle partitions, splitting skewed ones —
  * replacing the reference's hand-rolled salting, dead code at
  * RegisterStreaming.scala:105-118), and the broadcast threshold keeps
  * dimension joins shuffle-free.
  */
object Engine {
  /** Broadcast-join threshold, env-tunable (SPARK_GRAFT_BROADCAST_MB).
    * Default = Spark's 10 MB: in single-JVM local mode, building hash
    * relations for tables in the 10–64 MB band (e.g. the ngram join's
    * per-block gram-frequency table at bench scale) measurably loses to
    * a key-equality shuffle. On a multi-executor cluster broadcasting
    * that band saves shuffling the fact side — raise the env var there. */
  private def broadcastThreshold: String =
    (sys.env.getOrElse("SPARK_GRAFT_BROADCAST_MB", "10").toLong
      * 1024 * 1024).toString

  /** AQE coalesce floor (spark.sql.adaptive.coalescePartitions
    * .minPartitionSize), env-tunable (SPARK_GRAFT_MIN_PARTITION_SIZE).
    * Spark's default (1m) sizes partitions by BYTES, which serializes
    * CPU-dense byte-small stages: a 2.9 MB shuffle of q-gram candidate
    * pairs coalesces to 2 tasks and the verify kernel runs on 2 of 32
    * cores (measured on x70: the verify stage fell 0.99 s → 0.40 s at
    * 64k, identical results — OPTIMIZATION_r16.md). 64k only bites when
    * a stage's whole shuffle is megabytes — at production scale
    * partitions sit at the advisory size (coalescing targets
    * advisoryPartitionSizeInBytes) and this floor is inert. */
  private def minPartitionSize: String =
    sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k")

  def session(
      master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      shufflePartitions: Int =
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        minPartitionSize)
      // reliable checkpoints (the Materialize discipline) must be
      // garbage-collected with their plans — Spark's default (false)
      // would retain every checkpoint directory forever on a cluster
      // with a checkpoint dir configured
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", broadcastThreshold)
      // streaming state off-heap: HDFSBackedStateStore keeps every key
      // on the JVM heap (executor OOM once keyed state outgrows
      // memory); RocksDB spills to local disk and incrementally
      // checkpoints, which is the only state store that survives
      // 100 TB-scale key cardinality. Validated by the streaming specs
      // (SparkTestBase uses the same provider).
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // getOrCreate returns any pre-existing session with builder configs
    // silently ignored — re-assert the runtime-settable ones so engine
    // semantics (UTC, AQE, shuffle width) hold regardless of who created
    // the JVM's session first
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize",
      minPartitionSize)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastThreshold)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
