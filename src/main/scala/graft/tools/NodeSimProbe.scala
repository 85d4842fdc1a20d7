package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.algo.{NodeSimilarity, NodeSimilarityConfig}
import graft.core.{GraphOps, PropertyGraph}

/** Straggler/fan-out probe for NodeSimilarity's maxNeighborsPerTarget guard
  * (VERDICT r2 item 6): builds a graph whose hub nodes are high in-degree
  * TARGETS (the quadratic side of the pair-generating self-join), runs the
  * pair computation capped vs uncapped, and reports wall time, emitted
  * pairs, and the max/median task-duration ratio. One d-in-degree hub
  * contributes d·(d−1) candidate pairs uncapped — the single-task straggler
  * the cap removes. */
object NodeSimProbe {

  def main(args: Array[String]): Unit = {
    val nSrc = if (args.nonEmpty) args(0).toLong else 100000L
    val hubDeg = if (args.length > 1) args(1).toInt else 5000
    val cap = if (args.length > 2) args(2).toInt else 1000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val listener = new HubSkewProbe.TaskTimes
    spark.sparkContext.addSparkListener(listener)

    // nSrc sources; each likes 2 private items + (for the first hubDeg
    // sources, per hub) one of 4 shared hub items → hubs have in-degree
    // hubDeg, everything else in-degree 1.
    val src = spark.range(nSrc)
    val priv = src.selectExpr("id as src", "10000000 + id * 2 as dst")
      .union(src.selectExpr("id as src", "10000001 + id * 2 as dst"))
    val hubs = spark.range(hubDeg).selectExpr("id as src")
      .crossJoin(spark.range(4).selectExpr("20000000 + id as dst"))
    val edges = priv.union(hubs).withColumn("weight", lit(1.0)).persist()
    val e = edges.count()
    val graph = PropertyGraph(GraphOps.verticesOf(edges), edges)
    println(s"NODESIM PROBE edges=$e hubInDegree=$hubDeg cap=$cap")

    for ((label, c) <- Seq("capped" -> cap, "uncapped" -> 0)) {
      listener.reset()
      val t0 = System.nanoTime()
      val pairs = NodeSimilarity.run(graph, NodeSimilarityConfig(
        similarityCutoff = 1e-42, topK = 10, maxNeighborsPerTarget = c)).count()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000)
      val (med, max, cnt) = listener.stats()
      println(f"NODESIM $label: pairs=$pairs tasks=$cnt medianMs=$med maxMs=$max " +
        f"ratio=${if (med == 0) -1.0 else max.toDouble / med}%.1f secs=$secs%.1f")
    }
    spark.stop()
  }
}
