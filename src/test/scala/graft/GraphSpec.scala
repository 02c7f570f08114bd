package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)],
      driverMaxEdges: Long = 1000000L): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("doc_a", "doc_b"),
      driverMaxEdges = driverMaxEdges)
      .as[(Long, Long)].collect().toMap

  test("chain graph collapses to its minimum (forces multiple rounds " +
    "on the distributed route; both routes agree)") {
    // a 16-node path is the adversarial diameter case the pointer
    // shortcut exists for: plain one-hop propagation needs 15 rounds
    val chain = (1L until 16L).map(i => (i, i + 1))
    val want = (1L to 16L).map(_ -> 1L).toMap
    assert(components(chain) === want)                    // driver route
    assert(components(chain, driverMaxEdges = 0) === want) // distributed
  }

  test("disjoint components keep separate minima") {
    val got = components(Seq((5L, 3L), (3L, 9L), (20L, 30L), (40L, 40L)))
    assert(got === Map(3L -> 3L, 5L -> 3L, 9L -> 3L,
      20L -> 20L, 30L -> 20L, 40L -> 40L))
  }

  test("parallel edges, self-loops, null endpoints, empty input") {
    val got = components(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 2L)))
    assert(got === Map(1L -> 1L, 2L -> 1L))
    val withNulls = Seq((Some(1L), Some(2L)), (None, Some(7L)),
      (Some(8L), None)).toDF("doc_a", "doc_b")
    assert(Graph.connectedComponents(withNulls)
      .as[(Long, Long)].collect().toMap === Map(1L -> 1L, 2L -> 1L))
    assert(Graph.connectedComponents(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")).isEmpty)
  }

  test("randomized graphs match a brute-force union-find") {
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 5) {
      val n = 30 + trial * 10
      val edges = Seq.fill(n)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      // driver-side union-find as the reference
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(k => k -> find(k)).toMap
      // union-find roots are the min of each component only because
      // unions always hang the larger root under the smaller
      assert(components(edges) === want, s"trial $trial (driver)")
      assert(components(edges, driverMaxEdges = 0) === want,
        s"trial $trial (distributed)")
    }
  }

  test("dupClusters: singletons, sizes, canonical flags") {
    val docs = (1L to 8L).toDF("doc_id")
    val pairs = Seq((2L, 5L), (5L, 7L), (3L, 4L)).toDF("doc_a", "doc_b")
    val got = Graph.dupClusters(docs, pairs)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(got === Set(
      (1L, 1L, 1L, true),
      (2L, 2L, 3L, true), (5L, 2L, 3L, false), (7L, 2L, 3L, false),
      (3L, 3L, 2L, true), (4L, 3L, 2L, false),
      (6L, 6L, 1L, true), (8L, 8L, 1L, true)))
  }

  /** Dense reference PageRank over the symmetrized edge set, same
    * teleport/damping arithmetic as the operator. */
  private def refPageRank(edges: Seq[(Long, Long)], damping: Double,
      iters: Int): Map[Long, Double] = {
    val es = (edges ++ edges.map(_.swap)).distinct
    val nodes = es.map(_._1).distinct.sorted
    val deg = es.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n = nodes.size
    val teleport = (1.0 - damping) / n
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val in = es.groupBy(_._2)
      r = nodes.map { v =>
        v -> (teleport + damping *
          in(v).map { case (u, _) => r(u) / deg(u) }.sum)
      }.toMap
    }
    r.map { case (k, v) =>
      k -> BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble }
  }

  test("pageRank: symmetric graphs uniform, path graph matches the " +
    "dense reference, mass conserved, partitioning-independent") {
    // triangle: perfect symmetry -> uniform 1/3
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("doc_a", "doc_b")
    val triGot = Graph.pageRank(tri).as[(Long, Double)].collect().toMap
    assert(triGot.values.forall(v => math.abs(v - 1.0 / 3) < 1e-6), triGot)

    // path 1-2-3 plus far component 10-11: reference comparison
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val want = refPageRank(edges, 0.85, 10)
    val got = Graph.pageRank(edges.toDF("doc_a", "doc_b"))
      .as[(Long, Double)].collect().toMap
    assert(got === want)
    // the center of the path outranks its leaves
    assert(got(2L) > got(1L) && got(2L) > got(3L))
    // rank is a distribution over the node set (mass conserved)
    assert(math.abs(got.values.sum - 1.0) < 1e-4, got.values.sum)

    // same answer regardless of input partitioning
    val repart = Graph.pageRank(edges.toDF("doc_a", "doc_b").repartition(7))
      .as[(Long, Double)].collect().toMap
    assert(repart === got)
  }

  test("clusterAwareSplit: no near-dup pair straddles splits, " +
    "singletons match the plain doc-keyed split, fractions land") {
    import graft.operators.Corpus
    val rnd = new scala.util.Random(3)
    val n = 400L
    val docs = (1L to n).toDF("doc_id")
    // random chains/cliques over the first half; second half singletons
    val pairs = (1 to 300).map { _ =>
      val a = 1L + rnd.nextLong(n / 2)
      val b = 1L + rnd.nextLong(n / 2)
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).toDF("doc_a", "doc_b")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Graph.clusterAwareSplit(docs, pairs, splits)
      .as[(Long, Long, String)].collect()
    assert(got.length === n)
    val byId = got.map(r => r._1 -> r).toMap
    // the leakage guarantee: both endpoints of every pair share a split
    for ((a, b) <- pairs.as[(Long, Long)].collect())
      assert(byId(a)._3 === byId(b)._3 && byId(a)._2 === byId(b)._2,
        s"pair ($a,$b) straddles splits")
    // a singleton's cluster id is itself -> identical to the plain split
    val plain = docs
      .withColumn("split", Corpus.assignSplit(col("doc_id"), splits))
      .as[(Long, String)].collect().toMap
    val inPairs = pairs.as[(Long, Long)].collect()
      .flatMap(p => Seq(p._1, p._2)).toSet
    for ((id, cid, sp) <- got if !inPairs(id)) {
      assert(cid === id)
      assert(sp === plain(id), s"singleton $id diverged from plain split")
    }
    // all three splits are populated at this size
    assert(got.map(_._3).toSet === Set("train", "val", "test"))
  }

  test("connectedComponentsDelta: randomized old/new edge splits equal " +
    "full recompute on the union, on both cost routes") {
    val rnd = new scala.util.Random(61)
    for (trial <- 0 until 5) {
      val nNodes = 60
      val all = (0 until 90).map { _ =>
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong)
      }.filter(e => e._1 != e._2)
      val (oldE, newE) = all.splitAt(all.size / 2)
      val oldDf = oldE.toDF("doc_a", "doc_b")
      val newDf = newE.toDF("doc_a", "doc_b")
      val full = Graph.connectedComponents(
        oldDf.unionByName(newDf))
        .as[(Long, Long)].collect().toSet
      for (cap <- Seq(1000000L, 0L)) { // driver union-find / distributed
        val oldLbl = Graph.connectedComponents(oldDf,
          driverMaxEdges = cap)
        val got = Graph.connectedComponentsDelta(oldLbl, newDf,
          driverMaxEdges = cap)
          .as[(Long, Long)].collect().toSet
        assert(got === full, s"trial=$trial cap=$cap")
      }
    }
  }

  test("connectedComponentsDelta: new nodes, merges across old " +
    "components, and untouched components all land right") {
    // old: {1,2,3} (label 1), {10,11} (label 10), {20,21} (label 20)
    val oldE = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val oldLbl = Graph.connectedComponents(oldE)
    // delta: new node 30 bridges the 10- and 20-components; new pair
    // 40-41 is its own new component; {1,2,3} untouched
    val newE = Seq((11L, 30L), (30L, 20L), (40L, 41L))
      .toDF("doc_a", "doc_b")
    val got = Graph.connectedComponentsDelta(oldLbl, newE)
      .as[(Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 1L), (2L, 1L), (3L, 1L),
      (10L, 10L), (11L, 10L), (20L, 10L), (21L, 10L), (30L, 10L),
      (40L, 40L), (41L, 40L)))
    // clustersFromLabels finishes like dupClusters: singleton corpus
    // docs absent from the labeling stay their own cluster
    val docs = (Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L, 30L, 40L, 41L,
      99L)).toDF("doc_id")
    val fin = Graph.clustersFromLabels(docs,
      Graph.connectedComponentsDelta(oldLbl, newE))
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(fin(99L) === ((99L, 1L, true)))
    assert(fin(30L) === ((10L, 5L, false)))
    assert(fin(10L) === ((10L, 5L, true)))
  }

  test("pageRank: empty edges yield empty ranks; bad params rejected") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Graph.pageRank(empty).count() === 0L)
    intercept[IllegalArgumentException] {
      Graph.pageRank(empty, damping = 1.0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(empty, iters = -1)
    }
  }
}
