package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.algo.{Hits, HitsConfig, K1Coloring, Paths}

/** BFS / SSSP / collapse-path / random-walk / HITS / K1-coloring. */
class PathsSpec extends AnyFunSuite with SparkTestBase {

  // 0→1→2→3, 0→4→3 (short side), 3→5; 6 isolated
  val edges: Seq[(Long, Long)] = Seq(0L -> 1L, 1L -> 2L, 2L -> 3L, 0L -> 4L, 4L -> 3L, 3L -> 5L)
  lazy val graph = graphOf(7, edges)

  test("bfs levels from source") {
    val d = collectLongMap(Paths.bfs(graph, 0L), "id", "dist")
    assert(d == Map(0L -> 0L, 1L -> 1L, 4L -> 1L, 2L -> 2L, 3L -> 2L, 5L -> 3L))
  }

  test("sssp with weights prefers the cheaper longer path") {
    val g = weightedGraphOf(5, Seq(
      (0L, 1L, 10.0), (0L, 2L, 1.0), (2L, 3L, 1.0), (3L, 1L, 1.0), (1L, 4L, 1.0)))
    val d = collectMap(Paths.sssp(g, 0L), "id", "dist")
    assert(d == Map(0L -> 0.0, 2L -> 1.0, 3L -> 2.0, 1L -> 3.0, 4L -> 4.0))
  }

  test("collapsePath rewrites two-hop paths as direct edges") {
    val e = graph.edges
    val out = Paths.collapsePath(Seq(e, e)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((0L, 2L), (1L, 3L), (0L, 3L), (2L, 5L), (4L, 5L)), s"got $out")
  }

  test("random walks are deterministic, follow edges, stop at sinks") {
    val w1 = Paths.randomWalks(graph, steps = 3, walksPerNode = 2)
    val w2 = Paths.randomWalks(graph, steps = 3, walksPerNode = 2)
    assert(w1.exceptAll(w2).isEmpty && w2.exceptAll(w1).isEmpty)
    // every step transition is a real edge
    val trans = w1.alias("a").join(w1.alias("b"),
        col("a.walkId") === col("b.walkId") && col("b.step") === col("a.step") + 1)
      .select(col("a.nodeId").as("src"), col("b.nodeId").as("dst"))
    val edgeSet = edges.toSet
    assert(trans.collect().forall(r => edgeSet.contains((r.getLong(0), r.getLong(1)))))
    // walks from isolated node 6 have only step 0
    assert(w1.filter(col("startId") === 6L && col("step") > 0).count() == 0)
  }

  test("biased random walks (p/q): deterministic, edge-respecting, distribution shifts") {
    // triangle 0-1-2 (both directions) plus a 1->3 spur: from 1, a q<1 walk
    // prefers exploring OUT of the previous node's neighborhood (3), a q>1
    // walk prefers staying inside the triangle (2), and p<<1 backtracks.
    val tri = Seq(0L -> 1L, 1L -> 0L, 1L -> 2L, 2L -> 1L, 2L -> 0L, 0L -> 2L, 1L -> 3L)
    val g = graphOf(4, tri)
    def walks(p: Double, q: Double) =
      Paths.randomWalks(g, steps = 6, walksPerNode = 40, seed = 11L,
        returnFactor = p, inOutFactor = q)
    // determinism, and contract parity with the uniform walker
    val a = walks(0.5, 2.0)
    val b = walks(0.5, 2.0)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.columns.toSeq == Seq("walkId", "startId", "step", "nodeId"))
    // every transition is a real edge
    val trans = a.alias("x").join(a.alias("y"),
        col("x.walkId") === col("y.walkId") && col("y.step") === col("x.step") + 1)
      .select(col("x.nodeId").as("src"), col("y.nodeId").as("dst"))
    val edgeSet = tri.toSet
    assert(trans.collect().forall(r => edgeSet.contains((r.getLong(0), r.getLong(1)))))
    // distribution: strong return bias (p tiny) must produce MORE immediate
    // backtracks (t-1 == t+1) than strong away bias (p huge)
    def backtracks(df: org.apache.spark.sql.DataFrame): Long =
      df.alias("x").join(df.alias("y"),
          col("x.walkId") === col("y.walkId") && col("y.step") === col("x.step") + 2)
        .filter(col("x.nodeId") === col("y.nodeId")).count()
    val back = backtracks(walks(0.05, 1.0))
    val away = backtracks(walks(20.0, 1.0))
    assert(back > away,
      s"p=0.05 backtracks ($back) should exceed p=20 backtracks ($away)")
    // q: from node 1 after arriving 0->1, candidate 3 is NOT adjacent to 0
    // (out-bias target); low q should visit 3 more often than high q
    def spurVisits(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(col("nodeId") === 3L).count()
    val explore = spurVisits(walks(1.0, 0.05))
    val stay    = spurVisits(walks(1.0, 20.0))
    assert(explore > stay,
      s"q=0.05 spur visits ($explore) should exceed q=20 spur visits ($stay)")
  }

  test("hits: authorities and hubs on a star") {
    // 1,2,3 all point to 0 -> 0 is the authority; 1,2,3 equal hubs
    val g = graphOf(4, Seq(1L -> 0L, 2L -> 0L, 3L -> 0L))
    val r = Hits.run(g, HitsConfig(maxIterations = 10)).collect()
      .map(x => x.getLong(0) -> ((x.getDouble(1), x.getDouble(2)))).toMap
    assert(math.abs(r(0L)._2 - 1.0) < 1e-9)           // auth(0) = 1 after L2
    assert(math.abs(r(1L)._1 - 1.0 / math.sqrt(3)) < 1e-9)
    assert(r(0L)._1 == 0.0 && r(1L)._2 == 0.0)
  }

  test("k1 coloring produces a proper coloring") {
    val k4 = for (i <- 0L until 4L; j <- (i + 1) until 4L) yield i -> j
    val g = graphOf(4, k4)
    val colors = collectLongMap(K1Coloring.run(g), "id", "color")
    // K4 needs 4 distinct colors
    assert(colors.values.toSet.size == 4, s"got $colors")

    val line = graphOf(6, (0L until 5L).map(i => i -> (i + 1)))
    val lc = collectLongMap(K1Coloring.run(line), "id", "color")
    (0L until 5L).foreach(i => assert(lc(i) != lc(i + 1), s"conflict at $i: $lc"))
    assert(lc.values.max <= 1L, s"line graph should 2-color, got $lc")
  }
}
