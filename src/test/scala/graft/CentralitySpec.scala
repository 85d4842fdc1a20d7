package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.algo.{MsBfs, Scc, Paths}
import graft.core.Orientation

class CentralitySpec extends AnyFunSuite with SparkTestBase {

  private def collectD(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("betweenness: path graph (Brandes hand value)") {
    // undirected path 0-1-2-3-4: betweenness = 0, 3, 4, 3, 0
    val g = graphOf(5, Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)))
    val b = collectD(MsBfs.betweenness(g, orientation = Orientation.Undirected))
    assert(b == Map(0L -> 0.0, 1L -> 3.0, 2L -> 4.0, 3L -> 3.0, 4L -> 0.0))
  }

  test("betweenness: star center carries everything") {
    // undirected star center 0, leaves 1..4: center = C(4,2) pairs * 1 = 6
    val g = graphOf(5, Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)))
    val b = collectD(MsBfs.betweenness(g, orientation = Orientation.Undirected))
    assert(b(0L) == 6.0 && (1L to 4L).forall(b(_) == 0.0))
  }

  test("betweenness: equal split across two shortest paths") {
    // square 0-1, 0-2, 1-3, 2-3 (undirected): pair (0,3) splits over 1 and 2
    val g = graphOf(4, Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L)))
    val b = collectD(MsBfs.betweenness(g, orientation = Orientation.Undirected))
    assert(b == Map(0L -> 0.5, 1L -> 0.5, 2L -> 0.5, 3L -> 0.5))
  }

  test("closeness on the path graph (reference formula comp/farness)") {
    val g = graphOf(5, Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)))
    val c = collectD(MsBfs.closeness(g))
    // node 2: farness = 2+1+1+2 = 6, comp = 4 -> 4/6
    assert(math.abs(c(2L) - 4.0 / 6.0) < 1e-12)
    // node 0: farness = 1+2+3+4 = 10 -> 4/10
    assert(math.abs(c(0L) - 0.4) < 1e-12)
  }

  test("closeness Wasserman-Faust scales by comp/(n-1)") {
    // two components: edge 0-1, edge 2-3, isolated handled too
    val g = graphOf(4, Seq((0L, 1L), (2L, 3L)))
    val c = collectD(MsBfs.closeness(g, wassermanFaust = true))
    // node 0: comp=1, farness=1 -> (1/1)*(1/3)
    assert(math.abs(c(0L) - 1.0 / 3.0) < 1e-12)
  }

  test("harmonic centrality on the path graph") {
    val g = graphOf(5, Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)))
    val h = collectD(MsBfs.harmonic(g))
    // node 0: (1/1 + 1/2 + 1/3 + 1/4) / 4
    assert(math.abs(h(0L) - (1.0 + 0.5 + 1.0 / 3 + 0.25) / 4.0) < 1e-12)
  }

  test("allShortestPaths: all-pairs distance stream on a directed path") {
    // 0->1->2: reachable pairs and hop distances, self pairs at 0
    val g = graphOf(3, Seq((0L, 1L), (1L, 2L)))
    val rows = MsBfs.allShortestPaths(g)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(rows == Map(
      (0L, 0L) -> 0.0, (0L, 1L) -> 1.0, (0L, 2L) -> 2.0,
      (1L, 1L) -> 0.0, (1L, 2L) -> 1.0,
      (2L, 2L) -> 0.0))
  }

  test("allShortestPaths: source restriction bounds the output") {
    val g = graphOf(4, Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    val spark = g.vertices.sparkSession
    import spark.implicits._
    val srcs = Seq(0L).toDF("id")
    val rows = MsBfs.allShortestPaths(g, sources = Some(srcs)).collect()
    assert(rows.map(_.getLong(0)).toSet == Set(0L) && rows.length == 4)
  }

  test("centrality local tail matches the distributed path exactly") {
    // seeded random digraph: 40 nodes, 120 edges (parallel edges included)
    val rnd   = new scala.util.Random(11L)
    val edges = Seq.fill(120)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val g = graphOf(40, edges)
    def approxEq(a: Map[Long, Double], b: Map[Long, Double]): Boolean =
      a.keySet == b.keySet && a.forall { case (k, v) => math.abs(v - b(k)) < 1e-9 }
    val bL = collectD(MsBfs.betweenness(g, orientation = Orientation.Undirected))
    val bD = collectD(MsBfs.betweenness(g, orientation = Orientation.Undirected,
      localTailThreshold = -1L))
    assert(approxEq(bL, bD), "betweenness local != distributed")
    val cL = collectD(MsBfs.closeness(g))
    val cD = collectD(MsBfs.closeness(g, localTailThreshold = -1L))
    assert(approxEq(cL, cD), "closeness local != distributed")
    val hL = collectD(MsBfs.harmonic(g))
    val hD = collectD(MsBfs.harmonic(g, localTailThreshold = -1L))
    assert(approxEq(hL, hD), "harmonic local != distributed")
    val aL = MsBfs.allShortestPaths(g)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val aD = MsBfs.allShortestPaths(g, localTailThreshold = -1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(aL == aD, "allShortestPaths local != distributed")
  }

  test("scc: two cycles joined by a one-way bridge") {
    // cycle A: 0->1->2->0; bridge 2->3; cycle B: 3->4->3; tail 5 (4->5)
    val g = graphOf(6, Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L),
      (3L, 4L), (4L, 3L), (4L, 5L)))
    val scc = Scc.run(g).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scc(0L) == 0L && scc(1L) == 0L && scc(2L) == 0L)
    assert(scc(3L) == 3L && scc(4L) == 3L)
    assert(scc(5L) == 5L)
  }

  test("scc on a DAG: all singletons") {
    val g = graphOf(4, Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L)))
    val scc = Scc.run(g).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scc == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("scc distributed path (threshold 0) matches local tarjan") {
    // mixed graph: two cycles, a bridge, a DAG tail — forced through the
    // coloring/peeling rounds by disabling the local-solve handoff
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L),
      (3L, 4L), (4L, 3L), (4L, 5L), (5L, 6L), (6L, 7L), (7L, 5L))
    val g = graphOf(8, edges)
    val dist = Scc.run(g, localSolveThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = Scc.localTarjan((0L to 7L).toArray, edges.toArray).toMap
    assert(dist == local)
    assert(dist(0L) == 0L && dist(3L) == 3L && dist(5L) == 5L)
  }

  test("localTarjan: nested cycles and self-contained components") {
    val nodes = Array(10L, 11L, 12L, 13L, 14L)
    val edges = Array((10L, 11L), (11L, 10L), (11L, 12L),
      (12L, 13L), (13L, 14L), (14L, 12L))
    val m = Scc.localTarjan(nodes, edges).toMap
    assert(m(10L) == 10L && m(11L) == 10L)
    assert(m(12L) == 12L && m(13L) == 12L && m(14L) == 12L)
  }

  test("dfs preorder with ascending-neighbor order and exits") {
    //      0 -> {1, 4}; 1 -> {2, 3}; 4 -> {5}
    val g = graphOf(6, Seq((0L, 1L), (0L, 4L), (1L, 2L), (1L, 3L), (4L, 5L)))
    val order = Paths.dfs(g, 0L).collect()
      .sortBy(_.getLong(1)).map(_.getLong(0)).toSeq
    assert(order == Seq(0L, 1L, 2L, 3L, 4L, 5L))
    // target exit stops the walk
    val cut = Paths.dfs(g, 0L, targets = Set(2L)).collect()
      .sortBy(_.getLong(1)).map(_.getLong(0)).toSeq
    assert(cut == Seq(0L, 1L, 2L))
    // depth exit
    val shallow = Paths.dfs(g, 0L, maxDepth = 1).collect()
      .sortBy(_.getLong(1)).map(_.getLong(0)).toSeq
    assert(shallow == Seq(0L, 1L, 4L))
  }
}
