package graft.tools

import org.apache.spark.sql.SparkSession
import graft.algo.{PageRank, PageRankConfig}
import graft.core.PropertyGraph
import graft.io.Pages

/** Dev probe for scaling methodology: steady-state per-superstep time via
  * the (T_long - T_short) delta, repeated, at one core count.
  * Usage: runMain graft.tools.ScalingProbe <cores> <parts> <pages> <density> */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val cores   = args(0).toInt
    val parts   = args(1)
    val nPages  = args(2).toLong
    val density = args(3).toDouble
    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName(s"probe-$cores")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.shuffle.compress", sys.env.getOrElse("PROBE_SHUF_COMPRESS", "true"))
      .config("spark.shuffle.spill.compress", sys.env.getOrElse("PROBE_SHUF_COMPRESS", "true"))
      .config("spark.sql.inMemoryColumnarStorage.compressed",
        sys.env.getOrElse("PROBE_CACHE_COMPRESS", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = Pages.synthEdges(spark, nPages, density = density).persist()
    val e = edges.count()
    val verts = graft.core.GraphOps.verticesOf(edges).persist()
    verts.count()
    val graph = PropertyGraph(verts, edges)
    def run(steps: Int): Double = {
      val t0 = System.nanoTime()
      PageRank.run(graph, PageRankConfig(tolerance = 0.0, maxIterations = steps,
        fusedSteps = steps, hubThreshold = Some(2000.0))).scores.count()
      (System.nanoTime() - t0) / 1e9
    }
    val reps = sys.env.getOrElse("PROBE_REPS", "3").toInt
    val longN = sys.env.getOrElse("PROBE_LONG", "12").toInt
    run(math.min(longN, 6)) // warmup (JIT, codegen)
    for (rep <- 1 to reps) {
      val t2 = run(2); val tl = run(longN)
      val per = (tl - t2) / (longN - 2).toDouble
      println(f"PROBE cores=$cores parts=$parts edges=$e rep=$rep t2=$t2%.1f tl=$tl%.1f perStep=$per%.2f eps=${e / per}%.0f")
    }
    spark.stop()
  }
}
