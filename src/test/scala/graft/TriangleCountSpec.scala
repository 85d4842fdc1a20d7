package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.algo.{TriangleCount, TriangleCountConfig}

/** Transcribed from the reference's IntersectingTriangleCountTest.java and
  * LocalClusteringCoefficientTest.java (FIXTURES.md §B4). All graphs
  * UNDIRECTED; our engine symmetrizes + dedups internally. */
class TriangleCountSpec extends AnyFunSuite with SparkTestBase {

  def localCounts(n: Int, edges: Seq[(Long, Long)],
                  maxDegree: Option[Long] = None): (Map[Long, Long], Long) = {
    val r = TriangleCount.run(graphOf(n, edges), TriangleCountConfig(maxDegree))
    (collectLongMap(r.localTriangles, "id", "triangles"), r.globalTriangles)
  }

  test("no triangles: line, isolated, single edge, back-and-forth") {
    assert(localCounts(3, Seq(0L -> 1L, 1L -> 2L)) == (Map(0L -> 0L, 1L -> 0L, 2L -> 0L), 0L))
    assert(localCounts(3, Seq.empty)._2 == 0L)
    assert(localCounts(3, Seq(0L -> 1L))._2 == 0L)
    assert(localCounts(3, Seq(0L -> 1L, 1L -> 0L))._2 == 0L) // parallel back-and-forth
  }

  test("clique5: global 10, local 6 everywhere") {
    val k5 = for (i <- 0L until 5L; j <- (i + 1) until 5L) yield i -> j
    val (local, global) = localCounts(5, k5)
    assert(global == 10L)
    assert(local.values.forall(_ == 6L), s"got $local")
  }

  test("independent triangles") {
    for (nTri <- Seq(1, 2, 4, 8)) {
      val edges = (0 until nTri).flatMap { t =>
        val b = 3L * t
        Seq(b -> (b + 1), (b + 1) -> (b + 2), (b + 2) -> b)
      }
      val (local, global) = localCounts(3 * nTri, edges)
      assert(global == nTri.toLong)
      assert(local.values.forall(_ == 1L))
    }
  }

  test("two adjacent triangles share a corner") {
    val edges = Seq(0L -> 1L, 1L -> 2L, 2L -> 0L, 0L -> 3L, 3L -> 4L, 4L -> 0L)
    val (local, global) = localCounts(5, edges)
    assert(global == 2L)
    assert(local(0L) == 2L && local(1L) == 1L && local(4L) == 1L)
  }

  test("two triangles joined by a line") {
    val edges = Seq(0L -> 1L, 1L -> 2L, 2L -> 0L, 3L -> 4L, 4L -> 5L, 5L -> 3L, 0L -> 3L)
    val (local, global) = localCounts(6, edges)
    assert(global == 2L)
    assert(local.values.forall(_ == 1L))
  }

  test("self-loops ignored") {
    assert(localCounts(1, Seq(0L -> 0L, 0L -> 0L, 0L -> 0L)) == (Map(0L -> 0L), 0L))
    val (local, global) = localCounts(3,
      Seq(0L -> 1L, 1L -> 2L, 2L -> 0L, 0L -> 0L))
    assert(global == 1L && local.values.forall(_ == 1L))
  }

  test("parallel relationships deduplicated") {
    val (l1, g1) = localCounts(3, Seq(0L -> 1L, 1L -> 2L, 2L -> 0L, 0L -> 1L))
    assert(g1 == 1L && l1.values.forall(_ == 1L))
    val (l2, g2) = localCounts(3,
      Seq(0L -> 1L, 1L -> 2L, 2L -> 0L, 0L -> 1L, 1L -> 2L, 2L -> 0L))
    assert(g2 == 1L && l2.values.forall(_ == 1L))
  }

  test("triangle not on first path variants") {
    val (l1, g1) = localCounts(4, Seq(0L -> 1L, 1L -> 2L, 0L -> 3L, 1L -> 3L))
    assert(g1 == 1L && l1 == Map(0L -> 1L, 1L -> 1L, 2L -> 0L, 3L -> 1L))
    val (l2, g2) = localCounts(5, Seq(0L -> 1L, 1L -> 2L, 0L -> 3L, 0L -> 4L, 1L -> 3L))
    assert(g2 == 1L && l2 == Map(0L -> 1L, 1L -> 1L, 2L -> 0L, 3L -> 1L, 4L -> 0L))
    val (l3, g3) = localCounts(5, Seq(0L -> 1L, 1L -> 2L, 0L -> 3L, 0L -> 4L, 1L -> 4L))
    assert(g3 == 1L && l3 == Map(0L -> 1L, 1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("manyTrianglesAndOtherThings mixed graph") {
    // a..o = 0..14 (IntersectingTriangleCountTest.java:405-446)
    val Seq(a, b, c, d, e, f, g, h, i, j, k, l, m, nn, o) = (0L to 14L)
    val edges = Seq(
      a -> b, b -> b, b -> c, c -> a,
      c -> d, d -> e, e -> f, f -> d,
      f -> g, g -> h, h -> f,
      h -> i, i -> j, j -> k, k -> e,
      k -> l,
      k -> m, m -> nn, nn -> j)
    val (local, global) = localCounts(15, edges)
    assert(global == 3L)
    val expected = Map(a -> 1L, b -> 1L, c -> 1L, d -> 1L, e -> 1L, f -> 2L,
      g -> 1L, h -> 1L, i -> 0L, j -> 0L, k -> 0L, l -> 0L, m -> 0L, nn -> 0L, o -> 0L)
    assert(local == expected, s"got $local")
  }

  test("maxDegree excludes hubs with -1 and drops their triangles") {
    // (IntersectingTriangleCountTest.java:449-481)
    val edges = Seq(0L -> 1L, 0L -> 2L, 0L -> 3L, 1L -> 2L, 1L -> 3L,
      4L -> 5L, 5L -> 6L, 6L -> 4L)
    val (local, global) = localCounts(7, edges, maxDegree = Some(2L))
    assert(global == 1L)
    assert(local == Map(0L -> -1L, 1L -> -1L, 2L -> 0L, 3L -> 0L,
      4L -> 1L, 5L -> 1L, 6L -> 1L), s"got $local")
  }

  test("maxDegree first-c-node variant") {
    // (IntersectingTriangleCountTest.java:346-377): n2 has degree 4 > 3
    val edges = Seq(0L -> 1L, 1L -> 2L, 2L -> 3L, 2L -> 4L, 2L -> 5L,
      3L -> 4L, 1L -> 6L, 0L -> 2L, 0L -> 6L)
    val (local, global) = localCounts(7, edges, maxDegree = Some(3L))
    assert(global == 1L)
    assert(local == Map(0L -> 1L, 1L -> 1L, 2L -> -1L, 3L -> 0L,
      4L -> 0L, 5L -> 0L, 6L -> 1L), s"got $local")
  }

  test("local clustering coefficient: triangle=1.0, K5=1.0, line=0.0") {
    val tri = graphOf(3, Seq(0L -> 1L, 1L -> 2L, 2L -> 0L))
    val (c1, avg1) = TriangleCount.localClusteringCoefficient(tri)
    assert(collectMap(c1, "id", "coefficient").values.forall(_ == 1.0) && avg1 == 1.0)

    val k5 = graphOf(5, for (i <- 0L until 5L; j <- (i + 1) until 5L) yield i -> j)
    val (c2, avg2) = TriangleCount.localClusteringCoefficient(k5)
    assert(collectMap(c2, "id", "coefficient").values.forall(_ == 1.0) && avg2 == 1.0)

    val line = graphOf(3, Seq(0L -> 1L, 1L -> 2L))
    val (c3, avg3) = TriangleCount.localClusteringCoefficient(line)
    assert(collectMap(c3, "id", "coefficient").values.forall(_ == 0.0) && avg3 == 0.0)
  }

  test("wedgeBatches (bounded-peak-footprint mode) matches the single-job plan exactly") {
    // seeded random graph: batching by hash of the lowest corner must give
    // bit-identical local counts and global count for any K
    val rnd = new scala.util.Random(13L)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val g = graphOf(40, edges)
    val single = TriangleCount.run(g, TriangleCountConfig())
    for (k <- Seq(2, 5)) {
      val batched = TriangleCount.run(g, TriangleCountConfig(wedgeBatches = k))
      assert(batched.globalTriangles == single.globalTriangles, s"global at K=$k")
      val s = collectLongMap(single.localTriangles, "id", "triangles")
      val b = collectLongMap(batched.localTriangles, "id", "triangles")
      assert(b == s, s"local counts at K=$k")
    }
    // maxDegree exclusion composes with batching
    val ex1 = TriangleCount.run(g, TriangleCountConfig(maxDegree = Some(12L)))
    val ex2 = TriangleCount.run(g, TriangleCountConfig(maxDegree = Some(12L), wedgeBatches = 3))
    assert(ex2.globalTriangles == ex1.globalTriangles)
    assert(collectLongMap(ex2.localTriangles, "id", "triangles") ==
      collectLongMap(ex1.localTriangles, "id", "triangles"))
  }

  test("triangle stream emits ordered triples") {
    val edges = Seq(0L -> 1L, 1L -> 2L, 2L -> 0L, 0L -> 3L, 3L -> 4L, 4L -> 0L)
    val triples = TriangleCount.triangleStream(graphOf(5, edges))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(triples == Set((0L, 1L, 2L), (0L, 3L, 4L)))
  }
}
