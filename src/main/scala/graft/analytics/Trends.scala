package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series quality control over the event log: daily-volume
  * anomaly scores and per-type linear trends.
  *
  * Reference scope: the reference's dashboards read raw per-key counts;
  * volume-anomaly detection ("did clicks crater on Tuesday?") and trend
  * fits are the first monitoring layers a pipeline team adds on top.
  *
  * Both operators are engine-exact by construction: every aggregate is
  * an integer sum (exact), and the derived statistics use only
  * exactly-rounded IEEE operations (+, −, ×, ÷, sqrt — sqrt IS
  * correctly rounded per IEEE-754, unlike log/exp), evaluated in the
  * same expression shape the DuckDB oracles replay — so doubles match
  * bit-for-bit with no rounding tolerance.
  */
object Trends {

  private def floorDay(tsUs: org.apache.spark.sql.Column) =
    ((tsUs - ((tsUs % 86400000000L) + 86400000000L) % 86400000000L) /
      86400000000L).cast("long")

  /** Per-(type, day) event counts with a population z-score against
    * that type's daily distribution: z = (n − mean) / √(E[n²] − mean²),
    * null when the variance is zero (a flat series has no anomalies).
    *
    * Scale shape: one map-side-combinable count on (type, day); the
    * per-type moment aggregate reduces to |types| rows and broadcasts
    * back — the daily-count relation never shuffles twice.
    *
    * Output: (event_type, day, n, z). */
  def dailyCountAnomaly(events: DataFrame, typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val counts = events
      .filter(col(typeCol).isNotNull && col(tsCol).isNotNull)
      .select(col(typeCol), floorDay(unix_micros(col(tsCol))).as("day"))
      .groupBy(col(typeCol), col("day")).agg(count(lit(1)).as("n"))
    val stats = counts.groupBy(col(typeCol))
      .agg(count(lit(1)).as("k"), sum(col("n")).as("m"),
        sum(col("n") * col("n")).as("ss"))
    counts.join(broadcast(stats), typeCol)
      .withColumn("_mean", col("m").cast("double") / col("k").cast("double"))
      .withColumn("_var", col("ss").cast("double") / col("k").cast("double")
        - col("_mean") * col("_mean"))
      .select(col(typeCol), col("day"), col("n"),
        when(col("_var") > 0,
          (col("n").cast("double") - col("_mean")) / sqrt(col("_var")))
          .as("z"))
  }

  /** Least-squares line through each type's (day, daily count) series:
    * slope = (k·Σxy − Σx·Σy) / (k·Σx² − (Σx)²), intercept =
    * (Σy·Σx² − Σx·Σxy) / (k·Σx² − (Σx)²). Numerator and denominator
    * stay in exact BIGINT arithmetic until the final division (x = day
    * number ≈ 2·10⁴, so the products sit far below the 2⁶³ bound for
    * any realistic day range and daily volume; a corpus with ≳10¹³
    * daily events would cast the sums to double first).
    *
    * Scale shape: same as [[dailyCountAnomaly]] — one (type, day)
    * count, one |types|-row aggregate. Output: (event_type, n_days,
    * slope, intercept); both null for a single-day series. */
  def dailyTrend(events: DataFrame, typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val counts = events
      .filter(col(typeCol).isNotNull && col(tsCol).isNotNull)
      .select(col(typeCol), floorDay(unix_micros(col(tsCol))).as("day"))
      .groupBy(col(typeCol), col("day")).agg(count(lit(1)).as("y"))
    val den = col("k") * col("sxx") - col("sx") * col("sx")
    counts.groupBy(col(typeCol))
      .agg(count(lit(1)).as("k"),
        sum(col("day")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("day") * col("y")).as("sxy"),
        sum(col("day") * col("day")).as("sxx"))
      .select(col(typeCol), col("k").as("n_days"),
        when(den =!= 0,
          (col("k") * col("sxy") - col("sx") * col("sy")).cast("double") /
            den.cast("double")).as("slope"),
        when(den =!= 0,
          (col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double") /
            den.cast("double")).as("intercept"))
  }
}
