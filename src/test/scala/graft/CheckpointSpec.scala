package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.algo.{PageRank, PageRankConfig, Wcc, WccConfig}
import graft.io.SnapshotStore
import java.nio.file.Files

/** Checkpoint/resume: the north rule requires per-iteration durable
  * checkpoints with convergence metrics, and resume producing the identical
  * final result (FIXTURES.md §C "kill-after-iteration-k"). */
class CheckpointSpec extends AnyFunSuite with SparkTestBase {

  val edges: Seq[(Long, Long)] = Seq(
    1L -> 2L, 2L -> 1L, 3L -> 0L, 3L -> 1L, 4L -> 1L, 4L -> 3L, 4L -> 5L,
    5L -> 1L, 5L -> 4L, 6L -> 1L, 6L -> 4L, 7L -> 1L, 7L -> 4L, 8L -> 1L,
    8L -> 4L, 9L -> 4L, 10L -> 4L)
  lazy val graph = graphOf(11, edges)

  test("interrupted pagerank resumes to the identical final state") {
    val dir = Files.createTempDirectory("graft-ck-pr").toString
    // full uninterrupted run, no checkpointing
    val full = collectMap(PageRank.run(graph,
      PageRankConfig(tolerance = 0.0, maxIterations = 20)).scores, "id", "score")
    // "crash" after 7 supersteps (checkpoint every iteration)
    PageRank.run(graph, PageRankConfig(tolerance = 0.0, maxIterations = 7,
      checkpointDir = Some(dir)))
    assert(SnapshotStore.snapshots(dir).nonEmpty)
    val preIter = SnapshotStore.latest(dir).get.meta("iteration").toInt
    assert(preIter == 6, s"7 supersteps = init + 6 steps, got $preIter")
    // resume with the full budget
    val resumed = PageRank.resume(graph, PageRankConfig(tolerance = 0.0,
      maxIterations = 20, checkpointDir = Some(dir)))
    assert(collectMap(resumed.scores, "id", "score") == full)
    // snapshots carry convergence metrics
    val last = SnapshotStore.latest(dir).get
    assert(last.meta.contains("activeCount") && last.meta.contains("partitions"))
    assert(last.meta("iteration").toInt == 19)
    // ... and per-partition file lineage: every data file with its size
    val files = last.meta("files").split(";").toSeq
    assert(files.size == last.meta("numFiles").toInt && files.nonEmpty)
    assert(files.forall(_.matches("part-.*:\\d+")))
    assert(files.map(_.split(':').last.toLong).sum == last.meta("totalBytes").toLong)
  }

  test("checkpoint interval > 1 still resumes correctly") {
    val dir = Files.createTempDirectory("graft-ck-wcc").toString
    val full = collectLongMap(Wcc.run(graph).components, "id", "componentId")
    Wcc.run(graph, WccConfig(maxSteps = 2, checkpointDir = Some(dir), checkpointInterval = 2))
    val r = Wcc.run(graph, WccConfig(maxSteps = 100, checkpointDir = Some(dir),
      checkpointInterval = 2))
    // fresh run ignores old snapshots; resumed-from state equals full run
    assert(collectLongMap(r.components, "id", "componentId") == full)
  }

  test("snapshot store: atomic versioned commits and latest-read") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-snap").toString
    SnapshotStore.commit(Seq((1L, "a")).toDF("id", "v"), dir, Map("k" -> "v0"))
    SnapshotStore.commit(Seq((2L, "b"), (3L, "c")).toDF("id", "v"), dir, Map("k" -> "v1"))
    val snaps = SnapshotStore.snapshots(dir)
    assert(snaps.map(_.version) == Seq(0L, 1L))
    assert(SnapshotStore.read(spark, dir).count() == 2)
    assert(SnapshotStore.readVersion(spark, dir, 0).count() == 1)
    assert(SnapshotStore.latest(dir).get.meta("k") == "v1")
    // a torn manifest write is invisible: only atomic renames become snapshots
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_snapshots", ".v9.json.tmp"), "{\"version\":9")
    assert(SnapshotStore.snapshots(dir).size == 2)
  }

  test("snapshot expiration keeps the newest keepLast, deletes orphaned data") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-snap-exp").toString
    (0 until 5).foreach(i =>
      SnapshotStore.commit(Seq((i.toLong, s"r$i")).toDF("id", "v"), dir,
        Map("iteration" -> i.toString)))
    val expired = SnapshotStore.expire(dir, keepLast = 2)
    assert(expired == Seq(0L, 1L, 2L))
    assert(SnapshotStore.snapshots(dir).map(_.version) == Seq(3L, 4L))
    assert(SnapshotStore.latest(dir).get.meta("iteration") == "4")
    assert(SnapshotStore.read(spark, dir).count() == 1)
    // expired data dirs are gone, surviving ones intact
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "data", "v0")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "data", "v3")))
    // keepLast larger than history is a no-op
    assert(SnapshotStore.expire(dir, keepLast = 10).isEmpty)
  }

  test("checkpointed loop with keepLast retention still resumes identically") {
    import graft.pregel.Pregel
    val dir = Files.createTempDirectory("graft-ck-keep").toString
    def wccVia(maxIter: Int) = Pregel(graph)
      .withVertexColumn("label", init = col("id"),
        afterMsg = when(Pregel.msg < col("label"), Pregel.msg).otherwise(col("label")))
      .sendMsgToDst(Pregel.src("label"))
      .sendMsgToSrc(Pregel.dst("label"))
      .aggMsgs(min(Pregel.msg))
      .setMaxIterations(maxIter)
      .setCheckpointDir(dir, keepLast = 2)
      .run()
    val got = wccVia(20).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = collectLongMap(Wcc.run(graph).components, "id", "componentId")
    assert(got == plain, s"got $got")
    // retention held: at most 2 snapshots on disk, and the latest is intact
    val snaps = SnapshotStore.snapshots(dir)
    assert(snaps.size <= 2 && snaps.nonEmpty, s"snapshots ${snaps.map(_.version)}")
    assert(SnapshotStore.read(spark, dir).count() == 11)
  }
}
