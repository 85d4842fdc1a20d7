package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import graft.algo.{PageRank, PageRankConfig}
import graft.core.{GraphOps, PropertyGraph}
import graft.io.Pages

/** Straggler probe for the hub-split path (SURVEY §4 skew handling):
  * runs PageRank on a synthetic graph with forced 100k-degree hubs, with
  * and without the hub split, and reports the max/median task-duration
  * ratio across all superstep tasks. The hub split moves super-hub
  * adjacency off the src-partitioned edge table (where one hub's edges land
  * in a single task) onto a broadcast-frontier join spread across dst
  * partitions — expect ratio >> 4 without it, < 4 with it. */
object HubSkewProbe {

  final class TaskTimes extends SparkListener {
    val durations = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskInfo != null && t.taskMetrics != null)
        durations.add(t.taskMetrics.executorRunTime)
    def stats(): (Long, Long, Int) = {
      val ds = durations.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
      if (ds.isEmpty) (0L, 0L, 0)
      else (ds(ds.length / 2), ds.last, ds.length)
    }
    def reset(): Unit = durations.clear()
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 500000L
    val hubDegree = if (args.length > 1) args(1).toInt else 100000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val listener = new TaskTimes
    spark.sparkContext.addSparkListener(listener)

    val edges = Pages.synthEdges(spark, n, hubCount = 4, hubDegree = hubDegree,
      density = 2.0).persist()
    val e = edges.count()
    val verts = GraphOps.verticesOf(edges).persist(); verts.count()
    val graph = PropertyGraph(verts, edges)
    println(s"HUBPROBE edges=$e hubDegree=$hubDegree")

    for ((label, thresh) <- Seq("no_hub_split" -> None, "hub_split" -> Some(10000.0))) {
      // warm
      PageRank.run(graph, PageRankConfig(tolerance = 0.0, maxIterations = 2,
        hubThreshold = thresh, fusedSteps = 2)).scores.count()
      listener.reset()
      val t0 = System.nanoTime()
      PageRank.run(graph, PageRankConfig(tolerance = 0.0, maxIterations = 6,
        hubThreshold = thresh, fusedSteps = 6)).scores.count()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // let straggler task-end events drain
      val (med, max, cnt) = listener.stats()
      println(f"HUBPROBE $label: tasks=$cnt medianMs=$med maxMs=$max " +
        f"ratio=${if (med == 0) -1.0 else max.toDouble / med}%.1f secs=$secs%.1f")
    }
    spark.stop()
  }
}
