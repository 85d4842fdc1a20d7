package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.algo.{NodeSimilarity, NodeSimilarityConfig}
import graft.core.Orientation

/** Transcribed from NodeSimilarityTest.java (bipartite Person→Item LIKES
  * graph; persons a..d = 0..3, items i1..i4 = 4..7). */
class NodeSimilaritySpec extends AnyFunSuite with SparkTestBase {

  val Seq(a, b, c, d) = (0L to 3L)
  val Seq(i1, i2, i3, i4) = (4L to 7L)
  val edges: Seq[(Long, Long, Double)] = Seq(
    (a, i1, 1.0), (a, i2, 1.0), (a, i3, 2.0), (b, i1, 1.0), (b, i2, 1.0),
    (c, i3, 1.0), (d, i1, 0.5), (d, i2, 1.0), (d, i3, 1.0))
  lazy val graph = weightedGraphOf(8, edges)

  def collect(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      math.rint(r.getDouble(2) * 1e5) / 1e5)).toSet

  test("jaccard similarities incl. zero pairs at cutoff 0 (both directions)") {
    val got = collect(NodeSimilarity.run(graph,
      NodeSimilarityConfig(similarityCutoff = 0.0, topK = 10)))
    val exp = Set(
      (a, b, 2 / 3.0), (a, c, 1 / 3.0), (a, d, 1.0), (b, c, 0.0), (b, d, 2 / 3.0),
      (c, d, 1 / 3.0), (b, a, 2 / 3.0), (c, a, 1 / 3.0), (d, a, 1.0), (c, b, 0.0),
      (d, b, 2 / 3.0), (d, c, 1 / 3.0)
    ).map { case (x, y, s) => (x, y, math.rint(s * 1e5) / 1e5) }
    assert(got == exp, s"got $got")
  }

  test("weighted jaccard (sum-min / sum-max)") {
    val got = collect(NodeSimilarity.run(graph,
      NodeSimilarityConfig(similarityCutoff = 0.0, topK = 10, weighted = true)))
    val exp = Set(
      (a, b, 2 / 4.0), (a, c, 1 / 4.0), (a, d, 2.5 / 4.0), (b, c, 0.0),
      (b, d, 2 / 4.0), (c, d, 1 / 2.5),
      (b, a, 2 / 4.0), (c, a, 1 / 4.0), (d, a, 2.5 / 4.0), (c, b, 0.0),
      (d, b, 2 / 4.0), (d, c, 1 / 2.5)
    ).map { case (x, y, s) => (x, y, math.rint(s * 1e5) / 1e5) }
    assert(got == exp, s"got $got")
  }

  test("topK = 1 keeps each node's best pair") {
    val got = collect(NodeSimilarity.run(graph,
      NodeSimilarityConfig(similarityCutoff = 0.0, topK = 1)))
    val exp = Set((a, d, 1.0), (b, a, 2 / 3.0), (c, a, 1 / 3.0), (d, a, 1.0))
      .map { case (x, y, s) => (x, y, math.rint(s * 1e5) / 1e5) }
    assert(got == exp, s"got $got")
  }

  test("topN = 1 keeps the single best canonical pair") {
    val got = collect(NodeSimilarity.run(graph,
      NodeSimilarityConfig(similarityCutoff = 0.0, topK = 10, topN = 1)))
    assert(got == Set((a, d, 1.0)), s"got $got")
  }

  test("similarityCutoff > 0 drops zero pairs") {
    val got = collect(NodeSimilarity.run(graph,
      NodeSimilarityConfig(similarityCutoff = 1e-42, topK = 10)))
    assert(!got.exists(_._3 == 0.0))
    assert(got.size == 10)
  }

  test("degreeCutoff = 2 excludes c") {
    val got = collect(NodeSimilarity.run(graph,
      NodeSimilarityConfig(similarityCutoff = 0.0, topK = 10, degreeCutoff = 2)))
    val exp = Set(
      (a, b, 2 / 3.0), (a, d, 1.0), (b, d, 2 / 3.0),
      (b, a, 2 / 3.0), (d, a, 1.0), (d, b, 2 / 3.0)
    ).map { case (x, y, s) => (x, y, math.rint(s * 1e5) / 1e5) }
    assert(got == exp, s"got $got")
  }

  test("maxNeighborsPerTarget: exact when cap >= max in-degree, bounded fan-out below it") {
    // Cap above every target's in-degree (i1/i2/i3 have <= 3 likers) must
    // reproduce the uncapped reference result exactly.
    val uncapped = collect(NodeSimilarity.run(graph,
      NodeSimilarityConfig(similarityCutoff = 0.0, topK = 10)))
    val atCap = collect(NodeSimilarity.run(graph,
      NodeSimilarityConfig(similarityCutoff = 0.0, topK = 10, maxNeighborsPerTarget = 3)))
    assert(atCap == uncapped)

    // Hub graph: 40 sources all pointing at one hub target plus one private
    // target each. cap=4 bounds candidate pairs through the hub to 4*3=12
    // (vs 40*39=1560); similarity only ever UNDERestimated, sizes exact.
    val hubEdges = (0L until 40L).flatMap(s => Seq((s, 1000L, 1.0), (s, 2000L + s, 1.0)))
    val hubGraph = weightedGraphOf(2041, hubEdges)
    val capped = NodeSimilarity.run(hubGraph,
      NodeSimilarityConfig(similarityCutoff = 1e-42, topK = 0, maxNeighborsPerTarget = 4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(capped.nonEmpty && capped.length <= 12, s"fan-out not bounded: ${capped.length}")
    // every surviving pair's true jaccard is 1/3 (share the hub out of 2+2 sets)
    assert(capped.forall(p => math.abs(p._3 - 1.0 / 3.0) < 1e-9))
    // deterministic: same hash-ordered sample on rerun
    val rerun = NodeSimilarity.run(hubGraph,
      NodeSimilarityConfig(similarityCutoff = 1e-42, topK = 0, maxNeighborsPerTarget = 4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(capped.toSet == rerun.toSet)
  }

  test("reverse orientation: items similar by their likers") {
    val got = collect(NodeSimilarity.run(graph,
      NodeSimilarityConfig(orientation = Orientation.Reverse, topK = 10)))
    val exp = Set(
      (i1, i2, 1.0), (i1, i3, 1 / 2.0), (i2, i3, 1 / 2.0),
      (i2, i1, 1.0), (i3, i1, 1 / 2.0), (i3, i2, 1 / 2.0)
    ).map { case (x, y, s) => (x, y, math.rint(s * 1e5) / 1e5) }
    assert(got == exp, s"got $got")
  }
}
