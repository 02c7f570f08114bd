package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import org.apache.spark.util.AccumulatorV2

import graft.operators.ModelScoring
import graft.operators.ModelScoring.{QualityClassifier, StubClassifier}

class ModelScoringSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(n: Int) =
    (1 to n).map(i => (i.toLong, s"doc number $i with words w${i % 5}"))
      .toDF("doc_id", "text")

  test("stub scoring: deterministic, pure per-document (batch size and " +
    "partitioning never change results)") {
    val d = docs(97)
    def run(df: org.apache.spark.sql.DataFrame, bs: Int) =
      ModelScoring.scoreDocuments(df, batchSize = bs)
        .as[(Long, Double, String)].collect().toSet
    val base = run(d, 64)
    assert(base === run(d, 1))
    assert(base === run(d.repartition(13), 7))
    // scores match the stub's per-doc definition
    val direct = d.as[(Long, String)].collect().map { case (id, t) =>
      (id, math.BigDecimal(StubClassifier.scoreBatch(Array(t))(0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    base.foreach { case (id, s, l) =>
      assert(s === direct(id), s"doc $id")
      assert(l === (if (s >= 0.5) "keep" else "drop"))
    }
  }

  test("null and degenerate text score 0 and drop") {
    val d = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
    val got = ModelScoring.scoreDocuments(d)
      .as[(Long, Double, String)].collect().toSet
    assert(got === Set((1L, 0.0, "drop"), (2L, 0.0, "drop"),
      (3L, 0.0, "drop")))
  }

  test("batch contract: bounded batch sizes covering every doc; open() " +
    "once per task; ragged classifier output fails loudly") {
    // accumulator-backed probe classifier: observes the batch shapes the
    // operator actually feeds a model runner
    val batchSizes = new CollectionAcc
    val openCalls = spark.sparkContext.longAccumulator("opens")
    spark.sparkContext.register(batchSizes, "batches")
    val probe = new QualityClassifier {
      override def open(): Unit = openCalls.add(1)
      def scoreBatch(texts: Array[String]): Array[Double] = {
        batchSizes.add(texts.length)
        texts.map(_ => 1.0)
      }
    }
    val n = 103
    val parts = 4
    val got = ModelScoring.scoreDocuments(docs(n).repartition(parts),
      probe, batchSize = 10)
    assert(got.count() === n)
    val sizes = batchSizes.value
    assert(sizes.sum === n, s"every doc scored exactly once: $sizes")
    assert(sizes.forall(_ <= 10), s"batches bounded by batchSize: $sizes")
    assert(openCalls.value === parts, "open() once per task")

    val ragged = new QualityClassifier {
      def scoreBatch(texts: Array[String]): Array[Double] = Array(0.5)
    }
    val e = intercept[org.apache.spark.SparkException] {
      ModelScoring.scoreDocuments(docs(5), ragged, batchSize = 3).count()
    }
    assert(e.getMessage.contains("aligned") ||
      Option(e.getCause).exists(_.getMessage.contains("aligned")))
  }

  test("the seam runs unchanged on a stream: scores equal batch scores") {
    implicit val sql = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = ModelScoring.scoreDocuments(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("stream_scores")
      .outputMode("append").start()
    val rows = (1 to 40).map(i => (i.toLong, s"streamed doc $i w${i % 3}"))
    try {
      input.addData(rows.take(20)); q.processAllAvailable()
      input.addData(rows.drop(20)); q.processAllAvailable()
      val streamed = spark.table("stream_scores")
        .as[(Long, Double, String)].collect().toSet
      val batch = ModelScoring.scoreDocuments(rows.toDF("doc_id", "text"))
        .as[(Long, Double, String)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }
}

/** Accumulator collecting per-call batch sizes across tasks. */
class CollectionAcc extends AccumulatorV2[Int, Seq[Int]] {
  private var buf = Vector.empty[Int]
  def isZero: Boolean = buf.isEmpty
  def copy(): CollectionAcc = { val a = new CollectionAcc; a.buf = buf; a }
  def reset(): Unit = buf = Vector.empty
  def add(v: Int): Unit = synchronized { buf :+= v }
  def merge(other: AccumulatorV2[Int, Seq[Int]]): Unit =
    synchronized { buf ++= other.value }
  def value: Seq[Int] = buf
}
