package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J2 (knowledge-point mastery) arithmetic as a pure batch aggregate
  * (reference QzPointStreaming.scala:124-184).
  *
  * Input columns: uid, courseid, pointid, questionid (string),
  * istrue ("0"/"1"), createtime (sortable string).
  *
  * The reference maintains this per-key state in MySQL with one SELECT +
  * one UPSERT per key per batch — its scalability ceiling. Here the whole
  * computation is one hash aggregate: partial aggregation happens map-side,
  * a single shuffle on the composite grouping key, and the distinct
  * question-id set is a `collect_set` bounded by the 30-questions-per-point
  * domain (QzPointStreaming.scala:171). The streaming variant keeps the
  * identical per-key state in the state store (see
  * graft.streaming.QzMasteryStream).
  */
object QzMastery {

  /** Questions per knowledge point, hard-coded 30 in the reference
    * (QzPointStreaming.scala:171); a constant here. */
  val QuestionsPerPoint = 30.0

  /** Shared rate arithmetic (QzPointStreaming.scala:166-172). The detail
    * rate is capped only in approx mode: the sketch can overestimate the
    * distinct count, while exact mode reproduces the reference's
    * uncapped formula verbatim (dirty data beyond 30 questions/point
    * yields rates > 1 there too). */
  private def withRates(agg: DataFrame, capDetail: Boolean): DataFrame = {
    val rawDetail = col("qz_count").cast("double") / lit(QuestionsPerPoint)
    agg
      .withColumn("correct_rate",
        col("qz_istrue").cast("double") / col("qz_sum").cast("double"))
      .withColumn("qz_detail_rate",
        if (capDetail) least(rawDetail, lit(1.0)) else rawDetail)
      .withColumn("mastery_rate", col("qz_detail_rate") * col("correct_rate"))
  }

  def mastery(qz: DataFrame): DataFrame =
    withRates(
      qz.groupBy(col("uid"), col("courseid"), col("pointid"))
        .agg(
          sort_array(collect_set(col("questionid"))).as("qset"),
          count(lit(1)).as("qz_sum"),
          sum(when(col("istrue") === "1", 1L).otherwise(0L)).as("qz_istrue"),
          min(col("createtime")).as("createtime"))
        // qz_count derives from the collected set: a countDistinct
        // alongside other aggregates would trigger the Expand-based
        // distinct rewrite, doubling the shuffled rows for a value the
        // set already carries
        .withColumn("qz_count", size(col("qset")).cast("long"))
        .withColumn("questionids", array_join(col("qset"), ","))
        .drop("qset")
        .select(col("uid"), col("courseid"), col("pointid"),
          col("questionids"), col("qz_sum"), col("qz_count"),
          col("qz_istrue"), col("createtime")),
      capDetail = false)

  /** Degraded mode for open question universes (SURVEY.md §2.3): the
    * exact distinct set (`collect_set` + `countDistinct`) is replaced by
    * a HyperLogLog++ sketch with bounded relative error — fixed-width
    * aggregation state regardless of per-key cardinality, no question-id
    * list in the output. Exact mode remains the default because the
    * reference's domain is 30 questions/point. */
  def masteryApprox(qz: DataFrame, rsd: Double = 0.05): DataFrame =
    withRates(
      qz.groupBy(col("uid"), col("courseid"), col("pointid"))
        .agg(
          count(lit(1)).as("qz_sum"),
          approx_count_distinct(col("questionid"), rsd).as("qz_count"),
          sum(when(col("istrue") === "1", 1L).otherwise(0L)).as("qz_istrue"),
          min(col("createtime")).as("createtime")),
      capDetail = true)
}
