package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Dataset profiling — the look-before-you-train pass over a new corpus
  * drop: per-column null rates, cardinalities, and value/length ranges,
  * as relational rows (one per column) a quality dashboard or a schema
  * gate can consume directly.
  *
  * Scale shape: ONE aggregation over the input produces every column's
  * stats simultaneously — the scan is paid once, not once per column.
  * With `exactDistinct = true` the multi-distinct aggregate plans
  * through Catalyst's Expand (input duplicated ×|distinct columns|
  * before the exchange — exact, but the expansion is the price); the
  * default `false` uses HyperLogLog++ (`approx_count_distinct`), which
  * keeps everything map-side combinable: one pass, one fixed-width
  * sketch per column per partition, shuffle volume independent of the
  * data. At 100 TB use the default and treat cardinalities as ±2%.
  */
object Profile {

  /** Profile `cols` (default: every column) of `df` in one pass.
    *
    * Output, one row per column, stacked in the given column order:
    * `column, n_rows, n_null, n_distinct, min_num, max_num` (numeric
    * columns, as double) and `min_len, max_len, avg_len` (string
    * columns, of the non-null values). Stats that don't apply to the
    * column's type are null. */
  def profile(df: DataFrame, cols: Seq[String] = Nil,
      exactDistinct: Boolean = false): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    for (c <- names) require(byName.contains(c),
      s"profile: no such column '$c' (have ${df.columns.mkString(", ")})")

    val stats = names.map { c =>
      val t = byName(c)
      val distinct =
        if (exactDistinct) count_distinct(col(c))
        else approx_count_distinct(col(c))
      val (minN, maxN) = t match {
        case _: NumericType =>
          (min(col(c)).cast("double"), max(col(c)).cast("double"))
        case _ => (lit(null).cast("double"), lit(null).cast("double"))
      }
      val (minL, maxL, avgL) = t match {
        case StringType =>
          (min(length(col(c))).cast("long"),
            max(length(col(c))).cast("long"),
            round(avg(length(col(c))), 6))
        case _ => (lit(null).cast("long"), lit(null).cast("long"),
          lit(null).cast("double"))
      }
      struct(
        lit(c).as("column"),
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col(c))).as("n_null"),
        distinct.cast("long").as("n_distinct"),
        minN.as("min_num"), maxN.as("max_num"),
        minL.as("min_len"), maxL.as("max_len"), avgL.as("avg_len"))
    }
    // one agg row carrying every per-column struct, exploded to rows —
    // inline (explode of a literal-sized array) so no second shuffle
    df.agg(array(stats: _*).as("_s"))
      .select(explode(col("_s")).as("s"))
      .select(col("s.*"))
  }
}
