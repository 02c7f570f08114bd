package graft

import org.apache.spark.sql.SparkSession

/** Stable, cross-JVM locations for BUILT-ONCE model artifacts (IVF
  * indexes, tokenizer vocabularies, centroid models) used by the gate
  * queries: the production lifecycle is "an offline job builds the
  * artifact once; every later consumer — other JVMs included — loads
  * it", which a `java.io.tmpdir` path keyed by PID cannot express
  * (it is rebuilt per process and leaks per run).
  *
  * Layout: `<spark warehouse>/graft_artifacts/<name>_<key>` — the
  * warehouse root is the one stable, writable, per-deployment
  * location a Spark session always has. `key` should include a DATA
  * fingerprint ([[tableFingerprint]]) so an artifact can never be
  * served against a changed input table: same data ⇒ same key ⇒ load;
  * regenerated data ⇒ new key ⇒ rebuild. Code evolution is handled by
  * the artifact formats' own version stamps (every loader here
  * validates version + completeness and FAILS LOUDLY on mismatch) —
  * [[cached]] turns that loud failure into delete-and-rebuild-once,
  * the self-healing the round-12 advisory asked for (a torn write
  * surfaces as a load error, not a poisoned cache).
  */
object Artifacts {

  /** The artifact root under the session's warehouse dir. */
  def root(s: SparkSession): java.io.File = {
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val base =
      if (wh.startsWith("file:")) new java.io.File(new java.net.URI(wh))
      else new java.io.File(wh)
    new java.io.File(base, "graft_artifacts")
  }

  /** Content fingerprint of one parquet table under a testdata dir:
    * a polynomial hash over every file's (relative name, length,
    * mtime) — cheap (directory metadata only, no data read) and
    * changes whenever the table is regenerated, which is exactly the
    * staleness an artifact cache must track. */
  def tableFingerprint(dir: String, table: String): String = {
    val target = new java.io.File(dir, table + ".parquet")
    def files(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.sortBy(_.getName)
        .flatMap(files)
      else Seq(f)
    var h = 1125899906842597L // large prime seed
    def mix(x: Long): Unit = { h = h * 31 + x }
    for (f <- files(target)) {
      f.getName.foreach(c => mix(c.toLong))
      mix(f.length()); mix(f.lastModified())
    }
    java.lang.Long.toHexString(h)
  }

  /** Load the artifact at `<root>/<name>_<key>`, building it first if
    * absent; on a LOAD FAILURE (torn previous build, version bump,
    * corrupt files) delete the directory, rebuild once, and load
    * again — a second failure propagates. `load` must validate
    * EAGERLY (all artifact loaders here collect their meta/stamps at
    * call time), otherwise a torn artifact would surface after this
    * call returns.
    *
    * Builds are ATOMIC regardless of the builder: `build` writes into
    * a sibling temp directory that is renamed into place only on
    * success, so a crash mid-build leaves the committed path empty
    * (next caller rebuilds) instead of a partial directory that must
    * round-trip through the self-heal path — and a concurrent builder
    * losing the rename race simply adopts the winner's (identical,
    * deterministic) artifact. */
  def cached[T](s: SparkSession, name: String, key: String)(
      build: String => Unit)(load: String => T): T = {
    val dir = new java.io.File(root(s), s"${name}_$key")
    dir.getParentFile.mkdirs()
    def buildAtomically(): Unit = {
      val tmp = new java.io.File(dir.getParentFile,
        dir.getName + ".build-" + ProcessHandle.current().pid())
      delete(tmp)
      try {
        build(tmp.toString)
        if (!tmp.renameTo(dir))
          require(dir.isDirectory,
            s"Artifacts.cached: rename to $dir failed and no artifact " +
              "exists (concurrent loser would have found the winner's)")
      } finally delete(tmp)
    }
    if (!dir.isDirectory) buildAtomically()
    try load(dir.toString)
    catch {
      case scala.util.control.NonFatal(_) =>
        delete(dir)
        buildAtomically()
        load(dir.toString)
    }
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(delete)
    f.delete(): Unit
  }
}
