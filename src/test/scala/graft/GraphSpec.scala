package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toMap

  test("chain graph collapses to its minimum (forces multiple rounds)") {
    // a 16-node path is the adversarial diameter case the pointer
    // shortcut exists for: plain one-hop propagation needs 15 rounds
    val chain = (1L until 16L).map(i => (i, i + 1))
    val got = components(chain)
    assert(got === (1L to 16L).map(_ -> 1L).toMap)
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
      assert(components(edges) === want, s"trial $trial")
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
}
