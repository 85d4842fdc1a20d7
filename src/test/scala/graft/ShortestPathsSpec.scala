package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.algo.ShortestPaths

class ShortestPathsSpec extends AnyFunSuite with SparkTestBase {

  // diamond with a shortcut: 0->1 (1), 0->2 (4), 1->2 (1), 1->3 (5), 2->3 (1)
  // shortest 0->3 is 0,1,2,3 cost 3
  private lazy val g = weightedGraphOf(4, Seq(
    (0L, 1L, 1.0), (0L, 2L, 4.0), (1L, 2L, 1.0), (1L, 3L, 5.0), (2L, 3L, 1.0)))

  test("single-source dijkstra: distances, predecessors and paths") {
    val r = ShortestPaths.dijkstraSingleSource(g, source = 0L).collect()
      .map(x => x.getLong(0) -> ((x.getDouble(1), Option(x.get(2)), x.getSeq[Long](3)))).toMap
    assert(r(0L) == ((0.0, None, Seq(0L))))
    assert(r(1L) == ((1.0, Some(0L), Seq(0L, 1L))))
    assert(r(2L) == ((2.0, Some(1L), Seq(0L, 1L, 2L))))
    assert(r(3L) == ((3.0, Some(2L), Seq(0L, 1L, 2L, 3L))))
  }

  test("canonical predecessor: min in-neighbor wins ties") {
    // two equal-cost routes to 3: 0->1->3 and 0->2->3, all weights 1
    val tie = weightedGraphOf(4, Seq(
      (0L, 1L, 1.0), (0L, 2L, 1.0), (1L, 3L, 1.0), (2L, 3L, 1.0)))
    val r = ShortestPaths.dijkstraSingleSource(tie, 0L).collect()
      .map(x => x.getLong(0) -> x.getSeq[Long](3)).toMap
    assert(r(3L) == Seq(0L, 1L, 3L), "tie must resolve via the smaller predecessor")
  }

  test("dijkstra local tail matches the distributed path exactly") {
    val rnd = new scala.util.Random(31L)
    val es  = Seq.fill(160)((rnd.nextInt(45).toLong, rnd.nextInt(45).toLong,
      (rnd.nextInt(9) + 1).toDouble))
    val rg = weightedGraphOf(45, es)
    def rowsOf(t: Long): Map[Long, (Double, Option[Any], Seq[Long])] =
      ShortestPaths.dijkstraSingleSource(rg, 0L, localTailThreshold = t).collect()
        .map(x => x.getLong(0) -> ((x.getDouble(1), Option(x.get(2)), x.getSeq[Long](3)))).toMap
    assert(rowsOf(Long.MaxValue) == rowsOf(-1L))
  }

  test("weighted all-shortest-paths: every source's distances match dijkstra") {
    val rnd = new scala.util.Random(77L)
    val es  = Seq.fill(180)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong,
      (rnd.nextInt(9) + 1).toDouble))
    val rg = weightedGraphOf(40, es)
    def pairs(t: Long): Set[(Long, Long, Double)] =
      ShortestPaths.allShortestPathsWeighted(rg, localTailThreshold = t).collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    val local = pairs(Long.MaxValue)
    // local tail and distributed superstep loop agree exactly
    assert(local == pairs(-1L))
    // and each source's slice equals the verified single-source dijkstra
    val s7 = ShortestPaths.dijkstraSingleSource(rg, 7L, trackPaths = false).collect()
      .map(x => (7L, x.getLong(0), x.getDouble(1))).toSet
    assert(local.filter(_._1 == 7L) == s7)
  }

  test("source-target dijkstra emits one row; unreachable emits none") {
    val row = ShortestPaths.dijkstra(g, 0L, 3L).collect()
    assert(row.length == 1)
    assert(row(0).getDouble(2) == 3.0)
    assert(row(0).getSeq[Long](3) == Seq(0L, 1L, 2L, 3L))
    assert(ShortestPaths.dijkstra(g, 3L, 0L).collect().isEmpty)
  }

  test("astar equals dijkstra on a geometric graph and prunes hopeless detours") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // nodes on the equator at lon 0..4 degrees (~111.2 km apart), a chain
    // 0..4 plus an expensive direct edge and a far-north decoy branch
    val verts = Seq(
      (0L, 0.0, 0.0), (1L, 0.0, 1.0), (2L, 0.0, 2.0), (3L, 0.0, 3.0),
      (4L, 0.0, 4.0), (5L, 60.0, 0.0)
    ).toDF("id", "latitude", "longitude")
    def hv(lon1: Double, lon2: Double): Double = 6371.0 * 2 *
      math.asin(math.abs(math.sin(math.toRadians(lon1 - lon2) / 2)))
    val es = Seq(
      (0L, 1L, hv(0, 1) + 1), (1L, 2L, hv(1, 2) + 1), (2L, 3L, hv(2, 3) + 1),
      (3L, 4L, hv(3, 4) + 1), (0L, 4L, hv(0, 4) + 500.0),
      (0L, 5L, 7000.0), (5L, 4L, 7000.0)
    ).toDF("src", "dst", "weight")
    val geo = graft.core.PropertyGraph(verts, es)
    val a = ShortestPaths.astar(geo, 0L, 4L).collect()
    val d = ShortestPaths.dijkstra(geo, 0L, 4L).collect()
    assert(a.length == 1 && d.length == 1)
    assert(math.abs(a(0).getDouble(2) - d(0).getDouble(2)) < 1e-9)
    assert(a(0).getSeq[Long](3) == d(0).getSeq[Long](3))
    assert(a(0).getSeq[Long](3) == Seq(0L, 1L, 2L, 3L, 4L))
    // local tail == distributed, including the bound prune
    val aD = ShortestPaths.astar(geo, 0L, 4L, localTailThreshold = -1L).collect()
    assert(aD.length == 1 && a(0).getDouble(2) == aD(0).getDouble(2) &&
      a(0).getSeq[Long](3) == aD(0).getSeq[Long](3))
  }

  test("astar unreachable target emits no rows") {
    import spark.implicits._
    val verts = Seq((0L, 0.0, 0.0), (1L, 0.0, 1.0)).toDF("id", "latitude", "longitude")
    val es = Seq((1L, 0L, 5.0)).toDF("src", "dst", "weight")
    val geo = graft.core.PropertyGraph(verts, es)
    assert(ShortestPaths.astar(geo, 0L, 1L).collect().isEmpty)
  }

  test("yens k-shortest loopless paths, ranked by cost") {
    val r = ShortestPaths.yens(g, 0L, 3L, k = 3).collect()
      .map(x => (x.getDouble(1), x.getSeq[Long](2)))
    assert(r.length == 3)
    assert(r(0) == ((3.0, Seq(0L, 1L, 2L, 3L))))
    assert(r(1) == ((5.0, Seq(0L, 2L, 3L))))
    assert(r(2) == ((6.0, Seq(0L, 1L, 3L))))
  }

  test("yens distributed spur loop matches local, without per-edge driver jobs") {
    val rnd = new scala.util.Random(13L)
    val es  = (0L until 29L).map(i => (i, i + 1, (rnd.nextInt(5) + 1).toDouble)) ++
      Seq.fill(60)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong,
        (rnd.nextInt(9) + 1).toDouble))
    val rg = weightedGraphOf(30, es)
    def run(t: Long) = ShortestPaths.yens(rg, 0L, 29L, k = 4, localSolveThreshold = t)
      .collect().map(x => (x.getDouble(1), x.getSeq[Long](2))).toSeq
    val local = run(Long.MaxValue)
    // count driver jobs during the forced-distributed run: the rootCost
    // lookups must be one aggregation per ACCEPTED path, not one job per
    // root-prefix edge per spur (round 2 ran O(k·|path|²) point queries)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
    }
    spark.sparkContext.addSparkListener(listener)
    val dist = try run(-1L) finally {
      Thread.sleep(500) // let queued job-start events drain
      spark.sparkContext.removeSparkListener(listener)
    }
    assert(dist == local)
    // ~20 spur relaxations x (loop jobs + pred/walk jobs) + k weight-cache
    // jobs land well under this; the per-edge version adds |path|² more per
    // spur and blows past it
    val pathEdges = local.map(_._2.length - 1).sum
    assert(jobs.get() < 60 * pathEdges,
      s"driver job count ${jobs.get()} suggests per-edge point queries returned")
  }
}
