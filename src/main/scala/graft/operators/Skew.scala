package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * AQE's runtime skew-join splitting (`spark.sql.adaptive.skewJoin`,
  * enabled in [[graft.Engine]]) handles MOST skew transparently by
  * splitting oversized post-shuffle partitions. What it cannot fix is a
  * single hot KEY: all rows of one key land in one map-side hash bucket,
  * and no partition split separates rows that hash identically. At
  * 100 TB a power-law key (the null-ish user, the top domain, the empty
  * string) routinely concentrates 1–10% of a fact table on one task —
  * salting is the standard fix, applied here as a deterministic plan
  * rewrite rather than a manual incantation at every call site.
  */
object Skew {

  /** Inner equi-join with the LEFT (large, skewed) side salted across
    * `saltFactor` sub-keys and the RIGHT side replicated once per salt —
    * result rows are EXACTLY those of `left.join(right, leftKey ===
    * rightKey)`, but each hot key's probe rows spread over `saltFactor`
    * tasks instead of one.
    *
    * Scale shape: the left side is never read twice and never grows —
    * its salt is a deterministic hash of the WHOLE row spread uniformly
    * over sub-keys (`xxhash64` over all left columns, so co-identical
    * rows still distribute; no RNG, plans stay replayable). The right
    * side explodes ×`saltFactor` BEFORE its exchange — the right price
    * for the dimension-like sides salting targets (small enough to
    * replicate, too big or too mixed to broadcast wholesale). Both
    * sides then shuffle on (key, salt): `saltFactor` × the key
    * cardinality of uniform sub-keys, the hot key now `saltFactor`
    * partitions wide.
    *
    * Null join keys match nothing (standard equi-join semantics) and
    * are dropped from both sides before the exchange rather than
    * shuffled to a dead partition — at corpus scale the null key is
    * often the biggest hot key of all. */
  def saltedJoin(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column, saltFactor: Int = 16): DataFrame = {
    require(saltFactor >= 1,
      s"saltedJoin: saltFactor must be >= 1, got $saltFactor")
    val lCols = left.columns
    require(!lCols.contains("_salt") && !right.columns.contains("_salt"),
      "saltedJoin: a '_salt' column already exists on an input")
    require(!lCols.contains("_sk") && !right.columns.contains("_sk"),
      "saltedJoin: a '_sk' column already exists on an input")
    val l = left
      .withColumn("_sk", leftKey)
      .filter(col("_sk").isNotNull)
      .withColumn("_salt",
        pmod(xxhash64(lCols.map(col): _*), lit(saltFactor)).cast("int"))
    val r = right
      .withColumn("_sk", rightKey)
      .filter(col("_sk").isNotNull)
      .withColumn("_salt",
        explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, Seq("_sk", "_salt")).drop("_sk", "_salt")
  }
}
