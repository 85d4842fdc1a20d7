package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.algo.{Louvain, LouvainConfig, Schedule}

/** Louvain fixtures in the style of the reference's LouvainTest
  * (algo/src/test/java/org/neo4j/gds/louvain/LouvainTest.java): community
  * structure assertions (grouping, not raw ids) + modularity values. */
class LouvainSpec extends AnyFunSuite with SparkTestBase {

  private def communitiesOf(g: graft.core.PropertyGraph,
                            cfg: LouvainConfig = LouvainConfig()): Map[Long, Long] =
    Louvain.run(g, cfg).communities.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def grouping(m: Map[Long, Long]): Set[Set[Long]] =
    m.groupBy(_._2).values.map(_.keySet.toSet).toSet

  test("two 4-cliques with one bridge separate into the cliques") {
    val clique1 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val clique2 = for (a <- 4L to 7L; b <- 4L to 7L if a < b) yield (a, b)
    val g = graphOf(8, clique1 ++ clique2 ++ Seq((3L, 4L)))
    val r = Louvain.run(g)
    val groups = grouping(r.communities.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap)
    assert(groups == Set(Set(0L, 1L, 2L, 3L), Set(4L, 5L, 6L, 7L)))
    assert(r.modularity > 0.40 && r.modularity < 0.43,
      s"expected ~0.423 for the clique split, got ${r.modularity}")
  }

  test("ring of four triangles finds the four triangles") {
    // triangles (0,1,2) (3,4,5) (6,7,8) (9,10,11), ring links 2-3, 5-6, 8-9, 11-0
    val tri = (0 until 4).flatMap { t =>
      val b = 3L * t
      Seq((b, b + 1), (b, b + 2), (b + 1, b + 2))
    }
    val ring = Seq((2L, 3L), (5L, 6L), (8L, 9L), (11L, 0L))
    val g = graphOf(12, tri ++ ring)
    val groups = grouping(communitiesOf(g))
    assert(groups == Set(Set(0L, 1L, 2L), Set(3L, 4L, 5L), Set(6L, 7L, 8L), Set(9L, 10L, 11L)))
  }

  test("weights dominate topology (heavy pair sticks together)") {
    // path 0-1-2 where (0,1) is heavy and (1,2) light
    val g = weightedGraphOf(3, Seq((0L, 1L, 10.0), (1L, 2L, 0.1)))
    val m = communitiesOf(g, LouvainConfig(weighted = true))
    assert(m(0L) == m(1L), "heavy edge endpoints must share a community")
  }

  test("singleton/empty graphs are stable") {
    val g = graphOf(3, Seq.empty)
    val m = communitiesOf(g)
    assert(m == Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }

  test("FullSync first-level schedule is deterministic across runs") {
    val clique1 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val g = graphOf(6, clique1 ++ Seq((3L, 4L), (4L, 5L)))
    val cfg = LouvainConfig(maxLevels = 1, maxInnerIterations = 1, schedule = Schedule.FullSync)
    val a = communitiesOf(g, cfg)
    val b = communitiesOf(g, cfg)
    assert(a == b)
  }

  test("modularity of the found partition beats singletons and is <= 1") {
    val clique1 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val clique2 = for (a <- 4L to 7L; b <- 4L to 7L if a < b) yield (a, b)
    val g = graphOf(8, clique1 ++ clique2 ++ Seq((3L, 4L)))
    val r = Louvain.run(g)
    val singletonQ = Louvain.modularity(g,
      g.vertices.select(col("id"), col("id").as("communityId")))
    assert(r.modularity > singletonQ && r.modularity <= 1.0)
    // modularity() on the final assignment agrees with the level-loop value
    val recomputed = Louvain.modularity(g, r.communities)
    assert(math.abs(recomputed - r.modularity) < 1e-9)
    // the one-pass singleton shortcut agrees with the general formula
    assert(math.abs(Louvain.singletonModularity(g) - singletonQ) < 1e-12)
  }

  test("local tail and distributed path agree exactly (fully local + handoff)") {
    // seeded random graph: 60 nodes, ~180 edges, some parallel + self loops
    val rnd = new scala.util.Random(7L)
    val edges = Seq.fill(200)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val g = graphOf(60, edges)
    val dist  = communitiesOf(g, LouvainConfig(localTailThreshold = -1L))
    val local = communitiesOf(g, LouvainConfig(localTailThreshold = Long.MaxValue))
    assert(local == dist, "fully-local run must equal the distributed run")
    val rDist  = Louvain.run(g, LouvainConfig(localTailThreshold = -1L))
    val rLocal = Louvain.run(g, LouvainConfig(localTailThreshold = Long.MaxValue))
    assert(rDist.ranLevels == rLocal.ranLevels)
    assert(rDist.modularities.zip(rLocal.modularities).forall {
      case (a, b) => math.abs(a - b) < 1e-12 })
    // handoff mid-run: level 1 distributed, coarser levels local
    val tri = (0 until 4).flatMap { t =>
      val b = 3L * t; Seq((b, b + 1), (b, b + 2), (b + 1, b + 2))
    }
    val ring = Seq((2L, 3L), (5L, 6L), (8L, 9L), (11L, 0L))
    val g2 = graphOf(12, tri ++ ring)
    val h  = communitiesOf(g2, LouvainConfig(localTailThreshold = 10L)) // level-1 sym=32 > 10
    val d2 = communitiesOf(g2, LouvainConfig(localTailThreshold = -1L))
    assert(h == d2, "handoff mid-run must equal the distributed run")
  }

  test("singletonModularity handles self-loops and weights like modularity()") {
    val g = weightedGraphOf(4,
      Seq((0L, 1L, 2.0), (1L, 2L, 1.0), (2L, 2L, 3.0), (3L, 0L, 0.5)))
    val general = Louvain.modularity(g,
      g.vertices.select(col("id"), col("id").as("communityId")), weighted = true)
    assert(math.abs(Louvain.singletonModularity(g, weighted = true) - general) < 1e-12)
  }
}
