package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed event models for the reference's three log formats
  * (reconstructed from its parsing code — FIXTURES.md §A).
  */
object Models {
  /** register_topic TSV: `user_id \t platform_code \t create_time`
    * (reference RegisterStreaming.scala:75-87). */
  case class RegisterEvent(userId: Long, platform: String,
      createTime: java.sql.Timestamp)

  /** qz_log TSV: `uid \t courseid \t pointid \t questionid \t istrue \t
    * createtime` (reference QzPointStreaming.scala:66-76). */
  case class QzEvent(uid: Int, courseid: Int, pointid: Int,
      questionid: String, istrue: String, createtime: String)

  /** page_topic JSON (reference PageStreaming.scala:78-85); absent keys → "". */
  case class PageView(uid: String, appId: String, deviceId: String,
      ip: String, lastPageId: String, pageId: String, nextPageId: String)

  /** Video-learning event declared in the reference (Models.scala:3-16). */
  case class LearnEvent(userId: Int, cwareId: Int, videoId: Int,
      chapterId: Int, edutypeId: Int, subjectId: Int, sourceType: String,
      speed: Int, ts: Long, te: Long, ps: Int, pe: Int)
}

/** Parsers from a raw-line `DataFrame` (single string column) to typed rows.
  *
  * All parsing is pure Catalyst column expressions (codegen'd) — no
  * mapPartitions closures. Malformed lines are dropped by arity/validity
  * filters, matching the reference's behavior (RegisterStreaming.scala:75,
  * QzPointStreaming.scala:66, PageStreaming.scala:68-72) but with a single
  * parse per record (the reference parses JSON twice — do-not-copy bug,
  * SURVEY.md §7.5).
  */
object LogParsers {
  private def fields(value: Column): Column = split(value, "\t")

  /** Platform-code dimension decode: "1"→PC, "2"→APP, else Other
    * (reference RegisterStreaming.scala:79-84). A 3-row dimension — a
    * `when/otherwise` expression, never a join. */
  def platformOf(code: Column): Column =
    when(code === "1", "PC").when(code === "2", "APP").otherwise("Other")

  /** TSV, arity 3 → (userId, platform, createTime). Malformed values
    * (non-numeric id, unparseable timestamp) drop the line via try_cast/
    * try_to_timestamp — under Spark 4's default ANSI mode a plain cast
    * would THROW and kill the streaming query on one dirty record. */
  def parseRegister(lines: DataFrame, valueCol: String = "value"): DataFrame = {
    val f = fields(col(valueCol))
    lines
      .filter(size(f) === 3)
      .select(
        f.getItem(0).try_cast(LongType).as("userId"),
        platformOf(f.getItem(1)).as("platform"),
        try_to_timestamp(f.getItem(2), lit("yyyy-MM-dd HH:mm:ss"))
          .as("createTime"))
      .filter(col("userId").isNotNull && col("createTime").isNotNull)
  }

  /** TSV, arity 6 → qz_log fields (reference QzPointStreaming.scala:66-76).
    * Non-numeric key fields drop the line (try_cast, same ANSI rationale
    * as [[parseRegister]]). */
  def parseQz(lines: DataFrame, valueCol: String = "value"): DataFrame = {
    val f = fields(col(valueCol))
    lines
      .filter(size(f) === 6)
      .select(
        f.getItem(0).try_cast(IntegerType).as("uid"),
        f.getItem(1).try_cast(IntegerType).as("courseid"),
        f.getItem(2).try_cast(IntegerType).as("pointid"),
        f.getItem(3).as("questionid"),
        f.getItem(4).as("istrue"),
        f.getItem(5).as("createtime"))
      .filter(col("uid").isNotNull && col("courseid").isNotNull &&
        col("pointid").isNotNull)
  }

  private val pageFields = Seq("uid", "app_id", "device_id", "ip",
    "last_page_id", "page_id", "next_page_id")
  // _corrupt_record captures unparseable lines (PERMISSIVE mode yields a
  // struct of nulls, not a null struct, so a bare isNotNull can't drop them)
  private val pageSchema = StructType(
    (pageFields :+ "_corrupt_record").map(StructField(_, StringType)))

  /** JSON page view; single from_json, invalid JSON dropped, absent keys → ""
    * (reference PageStreaming.scala:68-88). */
  def parsePage(lines: DataFrame, valueCol: String = "value"): DataFrame = {
    val parsed = lines
      .select(from_json(col(valueCol), pageSchema,
        Map("columnNameOfCorruptRecord" -> "_corrupt_record")).as("j"))
      .filter(col("j").isNotNull && col("j._corrupt_record").isNull)
    parsed.select(pageFields.map(n =>
      coalesce(col(s"j.$n"), lit("")).as(n)): _*)
  }
}
