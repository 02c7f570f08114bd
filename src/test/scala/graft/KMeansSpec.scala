package graft

import org.apache.spark.sql.functions._

import graft.operators.KMeans

/** Distributed Lloyd's k-means: known-answer clustering, the
  * determinism contract (partitioning independence — the assignment
  * argmin and centroid sums must not depend on physical layout),
  * empty-cluster preservation, validity filtering, and the balanced
  * sample's ordering law. Engine-vs-engine bit agreement is proven by
  * the x131–x133 DuckDB oracles. */
class KMeansSpec extends SparkTestBase {
  import spark.implicits._

  private def embs(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("lloyd separates two obvious blobs and reports near-zero d2 " +
    "at the centers") {
    val d = embs(
      0L -> Seq(0.0f, 0.0f), 1L -> Seq(1.0f, 1.0f),  // seeds
      2L -> Seq(0.01f, -0.01f), 3L -> Seq(0.02f, 0.0f),
      4L -> Seq(0.99f, 1.01f), 5L -> Seq(1.02f, 0.98f))
    val a = KMeans.lloyd(d, k = 2, iters = 3)
      .orderBy("vec_id").as[(Long, Int, Double)].collect()
    assert(a.map(_._2).toSeq === Seq(0, 1, 0, 0, 1, 1))
    assert(a.forall(_._3 < 0.01))
  }

  test("assignments and d2 are independent of input partitioning") {
    val base = (0 until 120).map(i =>
      (i.toLong, Seq.tabulate(8)(j =>
        (math.sin(i * 0.7 + j) * 0.4).toFloat)))
    val d1 = base.toDF("vec_id", "embedding")
    val d2 = base.reverse.toDF("vec_id", "embedding").repartition(7)
    val r1 = KMeans.lloyd(d1, k = 3, iters = 3)
      .orderBy("vec_id").as[(Long, Int, Double)].collect().toSeq
    val r2 = KMeans.lloyd(d2, k = 3, iters = 3)
      .orderBy("vec_id").as[(Long, Int, Double)].collect().toSeq
    assert(r1 === r2)
  }

  test("invalid vectors (null, empty, null element) are dropped; " +
    "argmin ties break to the smallest cluster id") {
    val d = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)),
      (2L, null.asInstanceOf[Seq[Float]]), (3L, Seq.empty[Float]))
      .toDF("vec_id", "embedding")
      .union(Seq((4L, Seq[java.lang.Float](null, 1.0f)))
        .toDF("vec_id", "embedding"))
    // vec 5 equidistant from both seeds -> cluster 0 by the tie rule
    val d5 = d.union(Seq((5L, Seq(0.5f, 0.0f))).toDF("vec_id", "embedding"))
    val a = KMeans.lloyd(d5, k = 2, iters = 1)
      .orderBy("vec_id").as[(Long, Int, Double)].collect()
    assert(a.map(_._1).toSeq === Seq(0L, 1L, 5L)) // 2, 3, 4 dropped
    // after one update each seed centroid absorbs its own point (5 is
    // a tie to cluster 0, pulled in by the update); the tie must go to
    // cluster 0 both before and after
    assert(a.find(_._1 == 5L).get._2 === 0)
  }

  test("a vector of a different dimensionality than the model is " +
    "dropped (batch) — no NPE in the trainer, no NULL cluster") {
    val d = embs(
      0L -> Seq(0.0f, 0.0f), 1L -> Seq(1.0f, 1.0f),
      2L -> Seq(0.1f, 0.1f),
      3L -> Seq(0.5f, 0.5f, 0.5f)) // corrupt: dim 3 among dim-2 seeds
    val a = KMeans.lloyd(d, k = 2, iters = 2)
      .orderBy("vec_id").as[(Long, Int, Double)].collect()
    assert(a.map(_._1).toSeq === Seq(0L, 1L, 2L)) // 3 dropped
    // and assign() against trained centroids drops it too
    val cents = KMeans.trainCentroids(d, k = 2, iters = 2)
    assert(KMeans.assign(d, cents).count() === 3)
  }

  test("an emptied cluster keeps its previous centroid") {
    // k=3 but only two blobs: seed 2's cluster empties after round 1
    // (everything near seeds 0/1); it must keep the seed centroid, so
    // a later vector AT that spot still lands in cluster 2 on the
    // final assignment
    val d = embs(
      0L -> Seq(0.0f, 0.0f), 1L -> Seq(1.0f, 0.0f),
      2L -> Seq(10.0f, 10.0f), // seed 2, isolated
      3L -> Seq(0.1f, 0.0f), 4L -> Seq(0.9f, 0.0f))
    val a = KMeans.lloyd(d, k = 3, iters = 2)
      .orderBy("vec_id").as[(Long, Int, Double)].collect()
    assert(a.find(_._1 == 2L).get._2 === 2)
  }

  test("summary: sizes sum to the corpus, inertia is the decimal-exact " +
    "sum of d2") {
    val base = (0 until 60).map(i =>
      (i.toLong, Seq.tabulate(4)(j =>
        (math.cos(i * 1.3 + j) * 0.3).toFloat)))
    val d = base.toDF("vec_id", "embedding")
    val a = KMeans.lloyd(d, k = 2, iters = 2)
    val s = KMeans.summary(a).as[(Int, Long, Double)].collect()
    assert(s.map(_._2).sum === 60L)
    val byCl = a.as[(Long, Int, Double)].collect()
      .groupBy(_._2).view.mapValues(_.map(r => BigDecimal(r._3)).sum)
    s.foreach { case (cl, _, inertia) =>
      assert(BigDecimal(inertia) === byCl(cl))
    }
  }

  test("distributed and driver-local Lloyd agree bit for bit: " +
    "ivfCentroids (lloydIterateLocal on the collected sample) equals " +
    "trainCentroids (lloydIterate aggregates) on the same corpus") {
    // mildly irregular values so sums/divisions exercise real doubles
    val rnd = new scala.util.Random(7)
    val d = (0 until 60).map(i =>
      (i.toLong, Seq.fill(6)((rnd.nextDouble() * 4 - 2).toFloat)))
      .toDF("vec_id", "embedding")
    val dist = KMeans.trainCentroids(d, k = 4, iters = 5)
      .select($"cluster", $"centroid").as[(Int, Seq[Double])]
      .collect().toMap
    val local = graft.operators.Similarity.ivfCentroids(
        d, nLists = 4, iters = 5)
      .select($"cluster", $"centroid").as[(Int, Seq[Double])]
      .collect().toMap
    assert(local.keySet === dist.keySet)
    // BIT-exact, not approximately equal: integer-valued quantized
    // sums are order-free and the one division is shared
    dist.foreach { case (c, cent) => assert(local(c) === cent) }
  }

  test("balancedSample: m closest per cluster, (d2 ASC, id ASC) order, " +
    "agrees with a window-rank reference") {
    val base = (0 until 90).map(i =>
      (i.toLong, Seq.tabulate(6)(j =>
        (math.sin(i * 2.1 + j * 0.5) * 0.45).toFloat)))
    val d = base.toDF("vec_id", "embedding")
    val a = KMeans.lloyd(d, k = 3, iters = 2)
    val got = KMeans.balancedSample(a, m = 4)
      .orderBy("cluster", "rnk")
      .as[(Int, Int, Long, Double)].collect().toSeq
    val ref = a.as[(Long, Int, Double)].collect()
      .groupBy(_._2).toSeq.flatMap { case (cl, rows) =>
        rows.sortBy(r => (r._3, r._1)).take(4).zipWithIndex
          .map { case (r, i) => (cl, i + 1, r._1, r._3) }
      }.sortBy(r => (r._1, r._2))
    assert(got === ref)
  }
}
