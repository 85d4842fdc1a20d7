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

  test("masterCompute: eigenvector on the public API matches the exact reference fixture") {
    // The reference's masterCompute contract (PregelComputation.java:98-117)
    // written purely against the public surface: per-superstep L2 norm as a
    // withMasterCompute aggregate, referenced from the message expression.
    // Power iteration on (A + I): the identity term is an explicit self-loop
    // edge, so next_k(v) = next_{k-1}(v)/L + Σ_{u→v} next_{k-1}(u) with
    // L = master("l2") — the EigenvectorComputation.java recurrence exactly
    // (Eigenvector.scala derivation); final normalization applied on the
    // returned state.
    val Seq(a1, b1, c1, d1, e1, f1) = (0L to 5L)
    val edges = Seq((b1, c1), (c1, b1), (d1, a1), (d1, b1), (e1, b1),
      (e1, d1), (e1, f1), (f1, b1), (f1, e1))
    val n = 10
    val spark0 = spark; import spark0.implicits._
    val edgeDf = (edges.map { case (s, d) => (s, d, 0) } ++
      (0L until n).map(i => (i, i, 1))).toDF("src", "dst", "self")
    val verts = spark.range(n).select(col("id"))
    val g = graft.core.PropertyGraph(verts, edgeDf)
    val iterations = 40
    val state = Pregel(g)
      .withVertexColumn("next", init = lit(1.0 / n), afterMsg = Pregel.msg)
      .withMasterCompute("l2", sqrt(sum(col("next") * col("next"))))
      .sendMsgToDst(when(Pregel.edge("self") === 1,
          Pregel.src("next") / Pregel.master("l2"))
        .otherwise(Pregel.src("next")))
      .aggMsgs(sum(Pregel.msg))
      .setMaxIterations(iterations - 1) // init state is superstep 0's result
      .setFusedSteps(4)
      .run()
    val raw = state.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val l2 = math.sqrt(raw.values.map(v => v * v).sum)
    val got = raw.map { case (id, v) => id -> v / l2 }
    // the EigenvectorSpec unweighted fixture (PageRankTest.java:440-530),
    // restricted to the 6 connected nodes (isolated nodes score 0)
    val expected = Map(a1 -> 0.01262, b1 -> 0.71623, c1 -> 0.69740,
      d1 -> 0.01262, e1 -> 0.01262, f1 -> 0.01262,
      6L -> 0.0, 7L -> 0.0, 8L -> 0.0, 9L -> 0.0)
    assertRanks(got, expected, 1e-5)
    // and the in-engine Eigenvector agrees per-vertex
    val engine = collectMap(graft.algo.Eigenvector.run(
      graphOf(n, edges),
      graft.algo.PageRankConfig(tolerance = 0.0, maxIterations = iterations)).scores,
      "id", "score")
    got.foreach { case (id, v) => assert(math.abs(v - engine(id)) < 1e-9,
      s"node $id public=$v engine=${engine(id)}") }
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
