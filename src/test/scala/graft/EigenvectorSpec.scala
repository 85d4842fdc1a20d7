package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.algo.{Eigenvector, PageRankConfig}

/** Transcribed from PageRankTest.java Eigenvector nested class (:440-530). */
class EigenvectorSpec extends AnyFunSuite with SparkTestBase {

  val Seq(a, b, c, d, e, f, g, h, i, j) = (0L to 9L)
  val weightedEdges: Seq[(Long, Long, Double)] = Seq(
    (b, c, 1.0), (c, b, 3.0), (d, a, 5.0), (d, b, 5.0), (e, b, 4.0),
    (e, d, 4.0), (e, f, 4.0), (f, b, 10.0), (f, e, 10.0))

  lazy val graph = weightedGraphOf(10, weightedEdges)

  test("eigenvector matches reference fixture (unweighted, 40 iterations)") {
    val r = Eigenvector.run(graph, PageRankConfig(tolerance = 0.0, maxIterations = 40))
    val expected = Map(
      a -> 0.01262, b -> 0.71623, c -> 0.69740, d -> 0.01262, e -> 0.01262,
      f -> 0.01262, g -> 0.0, h -> 0.0, i -> 0.0, j -> 0.0)
    assertRanks(collectMap(r.scores, "id", "score"), expected, 1e-5)
  }

  test("weighted eigenvector (10 iterations)") {
    val r = Eigenvector.run(graph,
      PageRankConfig(tolerance = 0.0, maxIterations = 10, weighted = true))
    val expected = Map(
      a -> 0.00210, b -> 0.70774, c -> 0.70645, d -> 0.00172, e -> 0.00210,
      f -> 0.00172, g -> 0.0, h -> 0.0, i -> 0.0, j -> 0.0)
    assertRanks(collectMap(r.scores, "id", "score"), expected, 1e-5)
  }

  test("personalized eigenvector (source d, tol 0.1, 10 iterations)") {
    val r = Eigenvector.run(graph,
      PageRankConfig(tolerance = 0.1, maxIterations = 10, sourceNodes = Seq(d)))
    val expected = Map(
      a -> 0.00997, b -> 0.70735, c -> 0.70678, d -> 0.00056, e -> 0.0,
      f -> 0.0, g -> 0.0, h -> 0.0, i -> 0.0, j -> 0.0)
    assertRanks(collectMap(r.scores, "id", "score"), expected, 1e-5)
  }
}
