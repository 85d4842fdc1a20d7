package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.algo.{PageRank, PageRankConfig}
import graft.core.{GraphOps, PropertyGraph}
import graft.io.{Pages, SnapshotStore}

/** Bench-scale durable-checkpoint kill/resume proof (BASELINE.md): the
  * north rule's "resume mid-algorithm" story at the size it exists for.
  *
  *  1. FULL:   checkpointed 8-superstep PageRank on the 1M-page bench graph
  *             runs to completion in THIS JVM — final ranks digested
  *             (bit-exact xxhash64 over (id, rank) bytes) + wall time.
  *  2. VICTIM: the SAME job in a FORKED JVM on a fresh checkpoint dir; the
  *             parent polls the dir and SIGKILLs the process (
  *             destroyForcibly) as soon as a MID-RUN snapshot (iteration
  *             in (0, 8)) has committed — a real crash, not a polite stop.
  *  3. RESUME: PageRank.resume from the killed dir in this JVM; must pick
  *             up from the committed iteration, run only the remainder, and
  *             produce a digest IDENTICAL to the uninterrupted run.
  *
  * Usage: runMain graft.tools.KillResumeProbe [nPages] [victim <ckDir>]
  * (the victim arg form is what the fork executes). */
object KillResumeProbe {

  private val Supersteps = 8

  private def session(): SparkSession = {
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("GRAFT_BENCH_LOCAL_DIR", "/dev/shm/spark-local"))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def benchGraph(spark: SparkSession, nPages: Long): PropertyGraph = {
    val edges = Pages.synthEdges(spark, nPages, density = 8.0).persist()
    edges.count()
    val verts = GraphOps.verticesOf(edges).persist()
    verts.count()
    PropertyGraph(verts, edges)
  }

  private def cfg(ckDir: String): PageRankConfig =
    // fusedSteps 2 + interval 2: mid-run snapshots at iterations 2/4/6/8
    PageRankConfig(tolerance = 0.0, maxIterations = Supersteps,
      checkpointDir = Some(ckDir), checkpointInterval = 2, fusedSteps = 2)

  /** Bit-exact digest: xxhash64 over each (id, rank) pair's raw bytes,
    * order-insensitively combined. */
  private def digest(scores: org.apache.spark.sql.DataFrame): Long =
    scores.select(xxhash64(col("id"), col("score")).as("h"))
      .agg(expr("bit_xor(h)")).first().getLong(0)

  def main(args: Array[String]): Unit = {
    if (args.length >= 2 && args(0) == "victim") {
      victim(args(1), if (args.length > 2) args(2).toLong else 1000000L); return
    }
    val nPages = if (args.length > 0) args(0).toLong else 1000000L
    val base = java.nio.file.Files.createTempDirectory("graft-killresume").toString

    val spark = session()
    val graph = benchGraph(spark, nPages)

    // 1. uninterrupted checkpointed run
    val t0 = System.nanoTime()
    val full = PageRank.run(graph, cfg(s"$base/full"))
    val fullDigest = digest(full.scores)
    val fullSecs = (System.nanoTime() - t0) / 1e9
    println(f"FULL    iterations=${full.ranIterations} secs=$fullSecs%.1f digest=$fullDigest")

    // 2. forked victim on a fresh dir, SIGKILLed at a mid-run snapshot
    val victimDir = s"$base/victim"
    val cp = s"/opt/spark/jars/*:${new java.io.File("target/scala-2.13/classes").getAbsolutePath}"
    // Spark 4 on JDK 17 outside spark-submit needs the module opens
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq("java", "-Xmx24g", "-Xss64m") ++ addOpens ++
      Seq("-cp", cp, "graft.tools.KillResumeProbe", "victim", victimDir, nPages.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(ProcessBuilder.Redirect.INHERIT)
    val proc = pb.start()
    val tKill0 = System.nanoTime()
    var killedAtIter = -1
    while (killedAtIter < 0 && proc.isAlive) {
      Thread.sleep(500)
      SnapshotStore.latest(victimDir).foreach { snap =>
        val it = snap.meta("iteration").toInt
        if (it > 0 && it < Supersteps) { // mid-run snapshot committed: crash it
          proc.destroyForcibly()
          killedAtIter = it
        }
      }
    }
    proc.waitFor()
    val victimSecs = (System.nanoTime() - tKill0) / 1e9
    require(killedAtIter > 0 && killedAtIter < Supersteps,
      s"victim completed before a mid-run snapshot could be observed " +
        s"(exit=${proc.exitValue()}) — nothing was killed; no resume to prove")
    val latest = SnapshotStore.latest(victimDir).get
    println(f"KILLED  at_iteration=${latest.meta("iteration")} after=$victimSecs%.1f s (SIGKILL)")

    // 3. resume from the killed run's snapshots
    val t2 = System.nanoTime()
    val resumed = PageRank.resume(graph, cfg(victimDir))
    val resumedDigest = digest(resumed.scores)
    val resumeSecs = (System.nanoTime() - t2) / 1e9
    println(f"RESUMED iterations=${resumed.ranIterations} secs=$resumeSecs%.1f digest=$resumedDigest")
    println(s"RESULT identical=${fullDigest == resumedDigest} " +
      f"full=$fullSecs%.1f s kill_at=iter$killedAtIter resume=$resumeSecs%.1f s " +
      f"saved=${fullSecs - resumeSecs}%.1f s")
    graft.io.Fs.deleteRecursively(base)
    spark.stop()
    if (fullDigest != resumedDigest) sys.exit(1)
  }

  /** Forked-JVM leg: the same checkpointed job, expected to be SIGKILLed. */
  private def victim(ckDir: String, nPages: Long): Unit = {
    val spark = session()
    val graph = benchGraph(spark, nPages)
    PageRank.run(graph, cfg(ckDir))
    spark.stop()
  }
}
