package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.algo.{InfluenceMaximization, MaxKCut, Sllpa}

/** SLLPA / influence maximization / approx max k-cut fixtures — structural
  * assertions matching the reference's test shapes (two dense cliques with a
  * weak bridge; a broadcast hub; a bipartite-ish cut). */
class CommunityExtrasSpec extends AnyFunSuite with SparkTestBase {

  // two 4-cliques bridged by one edge
  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for { a <- ids; b <- ids if a < b } yield (a, b)
  private val twoCliques = clique(Seq(0L, 1L, 2L, 3L)) ++
    clique(Seq(4L, 5L, 6L, 7L)) ++ Seq((3L, 4L))

  test("sllpa: clique members share a dominant community") {
    val g = graphOf(8, twoCliques)
    val r = Sllpa.run(g, maxIterations = 20, minAssociationStrength = 0.3)
    val m = r.communities.collect()
      .map(row => row.getLong(0) -> row.getSeq[Long](1).toSet).toMap
    assert(m.size == 8)
    // within each clique every pair of members overlaps in >= 1 community
    for (c <- Seq(Seq(0L, 1L, 2L, 3L), Seq(4L, 5L, 6L, 7L)); a <- c; b <- c if a < b)
      assert(m(a).intersect(m(b)).nonEmpty, s"no shared community for $a,$b")
    // the two cliques do not share a dominant label
    assert(m(0L).intersect(m(7L)).isEmpty)
    // deterministic: same seed, same result
    val r2 = Sllpa.run(g, maxIterations = 20, minAssociationStrength = 0.3)
    val m2 = r2.communities.collect()
      .map(row => row.getLong(0) -> row.getSeq[Long](1).toSet).toMap
    assert(m == m2)
  }

  test("sllpa/maxkcut/k1coloring local tails match the distributed paths exactly") {
    val rnd   = new scala.util.Random(23L)
    val edges = Seq.fill(150)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val g = graphOf(50, edges)

    def sllpaMap(t: Long): Map[Long, Seq[Long]] =
      Sllpa.run(g, maxIterations = 8, localTailThreshold = t)
        .communities.collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sllpaMap(Long.MaxValue) == sllpaMap(-1L), "sllpa local != distributed")

    val mkL = MaxKCut.run(g, k = 3, localTailThreshold = Long.MaxValue)
    val mkD = MaxKCut.run(g, k = 3, localTailThreshold = -1L)
    val aL = mkL.assignments.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val aD = mkD.assignments.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(aL == aD, "maxkcut local != distributed")
    assert(math.abs(mkL.cutWeight - mkD.cutWeight) < 1e-9 &&
      mkL.ranIterations == mkD.ranIterations)

    import graft.algo.{K1Coloring, K1ColoringConfig}
    def colorsOf(t: Long): Map[Long, Long] =
      K1Coloring.run(g, K1ColoringConfig(localTailThreshold = t))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cL = colorsOf(Long.MaxValue)
    assert(cL == colorsOf(-1L), "k1coloring local != distributed")
    // validity: no monochromatic edge
    assert(edges.filter { case (a, b) => a != b }
      .forall { case (a, b) => cL(a) != cL(b) })
  }

  test("influence maximization: the broadcast hub is the first seed") {
    // star: 0 -> 1..9, plus an isolated chain 10->11
    val star = (1L to 9L).map(i => (0L, i)) :+ (10L, 11L)
    val g = graphOf(12, star)
    val r = InfluenceMaximization.run(g, k = 2, p = 1.0, samples = 64)
    val seeds = r.seeds.orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(seeds.head == 0L, s"expected hub 0 first, got $seeds")
  }

  test("influence maximization is deterministic and ranks by coverage gain") {
    val g = graphOf(8, twoCliques)
    val a = InfluenceMaximization.run(g, k = 3, p = 0.5, samples = 100)
      .seeds.orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val b = InfluenceMaximization.run(g, k = 3, p = 0.5, samples = 100)
      .seeds.orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(a == b)
    // gains are non-increasing (greedy max-coverage invariant)
    assert(a.map(_._2).sliding(2).forall(s => s.length < 2 || s(0) >= s(1)))
  }

  test("max 2-cut finds the bipartition of an even cycle") {
    // 6-cycle: optimal 2-cut cuts all 6 edges
    val cycle = (0L to 5L).map(i => (i, (i + 1) % 6))
    val g = graphOf(6, cycle)
    val r = MaxKCut.run(g, k = 2, maxIterations = 20)
    assert(r.cutWeight == 6.0, s"cut=${r.cutWeight}")
    val cls = collectLongMap(r.assignments, "id", "community")
    assert((0L to 5L).forall(i => cls(i) != cls((i + 1) % 6)))
  }

  test("max 3-cut on a triangle separates all vertices") {
    val g = graphOf(3, Seq((0L, 1L), (1L, 2L), (0L, 2L)))
    val r = MaxKCut.run(g, k = 3, maxIterations = 20)
    assert(r.cutWeight == 3.0)
    val cls = collectLongMap(r.assignments, "id", "community")
    assert(cls.values.toSet.size == 3)
  }
}
