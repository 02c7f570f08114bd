package graft

import graft.sources.LogParsers

class LogParsersSpec extends SparkTestBase {
  import spark.implicits._

  test("register: platform mapping and arity filter") {
    val lines = Seq(
      "100\t1\t2019-07-16 16:01:55",
      "101\t2\t2019-07-16 16:01:56",
      "102\t9\t2019-07-16 16:01:57",
      "bad line",
      "103\t1\t2019-07-16 16:01:58\textra").toDF("value")
    val got = LogParsers.parseRegister(lines)
      .select("userId", "platform").as[(Long, String)].collect().toSet
    assert(got === Set((100L, "PC"), (101L, "APP"), (102L, "Other")))
  }

  test("qz: six-field parse, malformed dropped") {
    val lines = Seq(
      "1005\t505\t29\t1\t1\t2019-09-12 11:17:48",
      "1005\t505\t29\t1\t1", // arity 5 -> dropped
      "1006\t506\t30\t2\t0\t2019-09-12 11:17:49").toDF("value")
    val got = LogParsers.parseQz(lines).collect()
    assert(got.length === 2)
    val r = LogParsers.parseQz(lines)
      .filter($"uid" === 1005).head()
    assert(r.getAs[Int]("courseid") === 505)
    assert(r.getAs[String]("istrue") === "1")
  }

  test("dirty field values drop the line instead of throwing (ANSI mode)") {
    // Spark 4 runs with ANSI mode ON: a plain cast/to_timestamp would
    // throw on these rows and kill a streaming query mid-batch
    val reg = Seq(
      "100\t1\t2019-07-16 16:01:55",
      "not-a-number\t1\t2019-07-16 16:01:56", // bad id
      "101\t2\tnot-a-timestamp" // bad time
    ).toDF("value")
    val got = LogParsers.parseRegister(reg).select("userId")
      .as[Long].collect().toSeq
    assert(got === Seq(100L))

    val qz = Seq(
      "1005\t505\t29\tq1\t1\t2019-09-12 11:17:48",
      "x\t505\t29\tq1\t1\t2019-09-12 11:17:49" // non-numeric uid
    ).toDF("value")
    assert(LogParsers.parseQz(qz).count() === 1)
  }

  test("page: single json parse, absent keys default to empty string") {
    val lines = Seq(
      """{"uid":"100","app_id":"1","device_id":"d-42","ip":"1.2.3.4","last_page_id":"1","page_id":"2","next_page_id":"3"}""",
      """{"uid":"101","page_id":"7"}""",
      "not json at all {{{").toDF("value")
    val got = LogParsers.parsePage(lines).collect()
    assert(got.length === 2)
    val partial = LogParsers.parsePage(lines).filter($"uid" === "101").head()
    assert(partial.getAs[String]("page_id") === "7")
    assert(partial.getAs[String]("device_id") === "")
    assert(partial.getAs[String]("next_page_id") === "")
  }
}
