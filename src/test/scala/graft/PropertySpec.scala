package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}
import graft.algo.{TriangleCount, Wcc, WccConfig}
import graft.core.{GraphOps, PropertyGraph}

/** Property-based cross-implementation checks on random graphs: three
  * independent WCC formulations must agree exactly, and the degree-ordered
  * wedge-join triangle count must match a brute-force enumeration. Seeded
  * generators keep runs reproducible. */
class PropertySpec extends AnyFunSuite with SparkTestBase {

  private val genGraph: Gen[(Int, List[(Long, Long)])] = for {
    n     <- Gen.choose(1, 24)
    m     <- Gen.choose(0, 40)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n - 1L)
      b <- Gen.choose(0L, n - 1L)
    } yield (a, b))
  } yield (n, edges)

  private val params = Parameters.default
    .withMinSuccessfulTests(30)
    .withInitialSeed(org.scalacheck.rng.Seed(42L))

  private def assertHolds(prop: Prop): Unit = {
    val r = check(params, prop)
    assert(r.passed, r.status.toString)
  }

  /** Reference-model union-find (union-by-min, like the reference's DSS). */
  private def localComponents(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      r
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
    }
    edges.foreach { case (a, b) => union(a, b) }
    (0L until n.toLong).map(v => v -> find(v)).toMap
  }

  test("WCC: hash-min, star-contraction, and local union-find agree") {
    assertHolds(Prop.forAll(genGraph) { case (n, edges) =>
      val g = graphOf(n, edges)
      val expected = localComponents(n, edges)
      def toMap(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val hashMin = toMap(Wcc.run(g).components)
      val star    = toMap(Wcc.runStar(g, WccConfig(localSolveThreshold = 0L)).components)
      hashMin == expected && star == expected
    })
  }

  test("triangle count: wedge join matches brute-force enumeration") {
    assertHolds(Prop.forAll(genGraph) { case (n, edges) =>
      val g = graphOf(n, edges)
      val und = edges.filter { case (a, b) => a != b }
        .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
      val nbrs = und.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
      // iterate edge endpoints (not 0 until n): scalacheck shrinking may
      // produce edges outside the generated node range, which the engine
      // legitimately counts from the edge table
      val brute = (for {
        a <- und.map(_._1); b <- nbrs.getOrElse(a, Set.empty) if b > a
        c <- nbrs.getOrElse(b, Set.empty) if c > b && und((a, c))
      } yield (a, b, c)).size.toLong
      TriangleCount.run(g).globalTriangles == brute
    })
  }
}
