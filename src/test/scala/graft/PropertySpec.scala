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

  test("dijkstra: distances match local Bellman-Ford; paths walk real edges") {
    val genWeighted: Gen[(Int, List[(Long, Long, Double)])] = for {
      n     <- Gen.choose(2, 16)
      m     <- Gen.choose(1, 30)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n - 1L)
        b <- Gen.choose(0L, n - 1L)
        w <- Gen.choose(1, 9)
      } yield (a, b, w.toDouble))
    } yield (n, edges)
    assertHolds(Prop.forAll(genWeighted) { case (n, edges) =>
      val g = weightedGraphOf(n, edges)
      // local Bellman-Ford over pair-level min weights
      val minW = edges.filter(e => e._1 < n && e._2 < n)
        .groupBy(e => (e._1, e._2)).map { case (k, es) => k -> es.map(_._3).min }
      val dist = scala.collection.mutable.Map(0L -> 0.0)
      var changed = true
      while (changed) {
        changed = false
        minW.foreach { case ((a, b), w) =>
          if (dist.contains(a) && dist(a) + w < dist.getOrElse(b, Double.MaxValue)) {
            dist(b) = dist(a) + w; changed = true
          }
        }
      }
      val rows = graft.algo.ShortestPaths.dijkstraSingleSource(g, source = 0L).collect()
      val got = rows.map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val distOk = got == dist.toMap
      val pathsOk = rows.forall { r =>
        val p = r.getSeq[Long](3)
        p.head == 0L && p.last == r.getLong(0) &&
          p.sliding(2).filter(_.length == 2)
            .map(s => minW.getOrElse((s(0), s(1)), Double.NaN)).sum ==
            (if (p.length == 1) 0.0 else r.getDouble(1))
      }
      distOk && pathsOk
    })
  }

  test("weighted all-pairs: every source slice matches local Bellman-Ford") {
    val genWeighted: Gen[(Int, List[(Long, Long, Double)])] = for {
      n     <- Gen.choose(2, 12)
      m     <- Gen.choose(1, 24)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n - 1L)
        b <- Gen.choose(0L, n - 1L)
        w <- Gen.choose(1, 9)
      } yield (a, b, w.toDouble))
    } yield (n, edges)
    assertHolds(Prop.forAll(genWeighted) { case (n, edges) =>
      val g = weightedGraphOf(n, edges)
      val minW = edges.groupBy(e => (e._1, e._2)).map { case (k, es) => k -> es.map(_._3).min }
      def bf(s: Long): Map[Long, Double] = {
        val dist = scala.collection.mutable.Map(s -> 0.0)
        var changed = true
        while (changed) {
          changed = false
          minW.foreach { case ((a, b), w) =>
            if (dist.contains(a) && dist(a) + w < dist.getOrElse(b, Double.MaxValue)) {
              dist(b) = dist(a) + w; changed = true
            }
          }
        }
        dist.toMap
      }
      val got = graft.algo.ShortestPaths.allShortestPathsWeighted(g).collect()
        .groupBy(_.getLong(0))
        .map { case (s, rs) => s -> rs.map(r => r.getLong(1) -> r.getDouble(2)).toMap }
      (0L until n).forall(s => got.getOrElse(s, Map.empty) == bf(s))
    })
  }

  /** Reference-model Brandes (directed, unweighted, all sources). */
  private def localBrandesRef(n: Int, edges: Seq[(Long, Long)]): Map[Long, Double] = {
    import scala.collection.mutable
    val adj = edges.distinct.groupBy(_._1).map { case (v, es) => v -> es.map(_._2).distinct }
    val bc = mutable.Map.empty[Long, Double].withDefaultValue(0.0)
    for (s <- 0L until n.toLong) {
      val pred  = mutable.Map.empty[Long, mutable.ListBuffer[Long]]
      val sigma = mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      val dist  = mutable.Map.empty[Long, Int]
      sigma(s) = 1.0; dist(s) = 0
      val q = mutable.Queue(s)
      val order = mutable.ArrayBuffer.empty[Long]
      while (q.nonEmpty) {
        val v = q.dequeue(); order += v
        for (w <- adj.getOrElse(v, Seq.empty)) {
          if (!dist.contains(w)) { dist(w) = dist(v) + 1; q.enqueue(w) }
          if (dist(w) == dist(v) + 1) {
            sigma(w) += sigma(v)
            pred.getOrElseUpdate(w, mutable.ListBuffer.empty) += v
          }
        }
      }
      val delta = mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      for (w <- order.reverseIterator) {
        for (v <- pred.getOrElse(w, Nil)) delta(v) += sigma(v) / sigma(w) * (1.0 + delta(w))
        if (w != s) bc(w) += delta(w)
      }
    }
    (0L until n.toLong).map(v => v -> bc(v)).toMap
  }

  private def centMap(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("betweenness (local tail): matches brute-force Brandes") {
    assertHolds(Prop.forAll(genGraph) { case (n, edges) =>
      val valid = edges.filter { case (a, b) => a < n && b < n }
      val g = graphOf(n, valid)
      val expected = localBrandesRef(n, valid)
      val got = centMap(graft.algo.MsBfs.betweenness(g).select("id", "centrality"))
      expected.keySet == got.keySet &&
        expected.forall { case (id, v) => math.abs(got(id) - v) <= 1e-9 }
    })
  }

  test("betweenness (distributed path): matches brute-force Brandes") {
    val few = Parameters.default.withMinSuccessfulTests(8)
      .withInitialSeed(org.scalacheck.rng.Seed(7L))
    val r = check(few, Prop.forAll(genGraph) { case (n, edges) =>
      val valid = edges.filter { case (a, b) => a < n && b < n }
      val g = graphOf(n, valid)
      val expected = localBrandesRef(n, valid)
      val got = centMap(graft.algo.MsBfs.betweenness(g, localTailThreshold = -1L)
        .select("id", "centrality"))
      expected.keySet == got.keySet &&
        expected.forall { case (id, v) => math.abs(got(id) - v) <= 1e-9 }
    })
    assert(r.passed, r.status.toString)
  }

  test("node similarity: engine pairs match brute-force jaccard over out-neighbor sets") {
    assertHolds(Prop.forAll(genGraph) { case (n, edges) =>
      val valid = edges.filter { case (a, b) => a < n && b < n }
      val g = graphOf(n, valid)
      val nb = valid.distinct.groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
      val expected = (for {
        a <- nb.keySet; b <- nb.keySet if a != b
        inter = (nb(a) & nb(b)).size
        if inter > 0 // similarityCutoff 1e-42 excludes exact zeros
      } yield (a, b, BigDecimal(inter.toDouble / (nb(a) | nb(b)).size)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP))).toSet
      val got = graft.algo.NodeSimilarity.run(g,
          graft.algo.NodeSimilarityConfig(topK = 0))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP))).toSet
      expected == got
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
