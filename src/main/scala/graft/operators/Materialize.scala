package graft.operators

import org.apache.spark.sql.DataFrame

/** Checkpoint-style materialization for multi-consumer intermediate
  * relations inside operators that RETURN a plan referencing them.
  *
  * `Dataset.persist` is the wrong tool there: the caller receives only
  * the final plan, has no handle to the persisted child, and therefore
  * can never `unpersist` it — CacheManager entries accumulate across
  * repeated calls (per micro-batch, per trainer round, per Bench
  * iteration). A checkpoint cuts lineage and materializes blocks that
  * the ContextCleaner releases once the returned plan is
  * garbage-collected — the cache-lifecycle discipline adopted in
  * [[Dedup.containmentPairs]] (round-8 advisory) and extended here.
  * NOTE on the reliable branch: the ContextCleaner deletes RELIABLE
  * checkpoint files only when
  * `spark.cleaner.referenceTracking.cleanCheckpoints` is true (Spark's
  * default is false) — [[graft.Engine.session]] sets it, so sessions
  * built there release both branches; a foreign session with a
  * checkpoint dir but without that flag retains the files.
  *
  * TRADE (the no-checkpoint-dir branch): `localCheckpoint` blocks are
  * unreplicated and non-recomputable, so losing an executor mid-job
  * fails the query instead of recomputing. On a real cluster set a
  * checkpoint dir (`sparkContext.setCheckpointDir`) and the reliable
  * branch persists to durable storage; in local mode the trade is free
  * (one JVM — executor loss IS driver loss).
  */
object Materialize {

  /** Materialize `df` eagerly (one job now) and cut its lineage.
    * Eager is the multi-consumer contract: every consumer — including
    * driver-side `collect`s that must agree with the returned plan on
    * nondeterministic physical properties like `spark_partition_id` —
    * reads the SAME materialized blocks. */
  def eager(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      // persist-then-checkpoint (the idiom from the RDD.checkpoint
      // scaladoc): without it the reliable branch computes the child
      // TWICE — the eager action materializes the lineage once, then
      // ReliableCheckpointRDD's write job recomputes the unpersisted
      // lineage to produce the checkpoint files. Persist first so the
      // write job reads the cached blocks; unpersist after — the
      // returned plan reads the checkpoint files, not the cache, so
      // nothing is left registered in the CacheManager. EXCEPT when the
      // caller already cached this very plan: persist() would then be a
      // no-op on the caller's CacheManager entry and the unpersist in
      // finally would silently evict THEIR cache — skip the pair and
      // let the write job read the pre-existing blocks directly.
      val alreadyCached = df.sparkSession.sharedState.cacheManager
        .lookupCachedData(
          df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]])
        .isDefined
      if (alreadyCached) df.checkpoint(eager = true)
      else {
        val cached = df.persist()
        try cached.checkpoint(eager = true)
        finally cached.unpersist(blocking = false)
      }
    } else df.localCheckpoint(eager = true)

}
