package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.algo.{K1Coloring, K1ColoringConfig}
import graft.core.GraphOps

/** Round-count/time probe for K1Coloring on the synthetic pages graph. */
object ColorProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = graft.io.Pages.synthEdges(spark, n, density = 2.0)
    val g = graft.core.PropertyGraph(GraphOps.verticesOf(edges), edges)
    val t0 = System.nanoTime()
    val (colors, loop) = K1Coloring.runWithStats(g, K1ColoringConfig())
    val nc = colors.select("color").distinct().count()
    println(f"COLOR n=$n iters=${loop.ranIterations} converged=${loop.didConverge} " +
      f"colors=$nc secs=${(System.nanoTime() - t0) / 1e9}%.1f")
    loop.history.foreach(m => println(s"  round ${m.iteration}: active=${m.activeCount} wallMs=${m.wallMs}"))
    spark.stop()
  }
}
