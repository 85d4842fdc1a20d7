package graft.tools

import org.apache.spark.sql.SparkSession
import graft.algo.{LabelPropagation, LpConfig, Schedule, TriangleCount, Wcc, WccConfig}
import graft.core.PropertyGraph
import graft.io.Pages

/** 10× robustness probe for the non-PageRank north-rule algorithms
  * (VERDICT r4 item 6): WCC-to-fixpoint and global triangle count on the
  * deterministic synthetic web graph at 10× the bench size (default
  * 10,000,000 pages / ~147.6M edges, density 8 — the same input the 10×
  * PageRank probe used). Reports wall seconds, edges/sec and the result
  * digests; completing at all proves the plans survive a memory/traffic
  * regime 10× past the scaling-gate size with no OOM or spill-death.
  *
  * Usage: runMain graft.tools.TenXProbe [pages] [wcc,triangle] */
object TenXProbe {
  def main(args: Array[String]): Unit = {
    graft.bench.Quiet.install()
    val nPages = if (args.length > 0) args(0).toLong else 10000000L
    val algos  = (if (args.length > 1) args(1) else "wcc,triangle")
      .split(",").map(_.trim).toSet
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val parts = sys.env.getOrElse("GRAFT_PROBE_PARTS", "64")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("tenx-probe")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("GRAFT_BENCH_LOCAL_DIR", "/dev/shm/spark-local"))
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val edges = Pages.synthEdges(spark, nPages, density = 8.0).persist()
    val e     = edges.count()
    val verts = graft.core.GraphOps.verticesOf(edges).persist()
    val v     = verts.count()
    val graph = PropertyGraph(verts, edges)
    println(s"""{"probe":"tenx-input","pages":$nPages,"vertices":$v,"edges":$e}""")

    if (algos("wcc")) {
      val t0 = System.nanoTime()
      val r  = Wcc.run(graph, WccConfig())
      val nComp = r.components.select("componentId").distinct().count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(s"""{"probe":"tenx-wcc","secs":${"%.1f".format(secs)},""" +
        s""""iterations":${r.ranIterations},"converged":${r.didConverge},""" +
        s""""components":$nComp,""" +
        s""""edges_per_sec":${"%.0f".format(e / secs)},""" +
        s""""edges_per_sec_per_round":${"%.0f".format(e.toDouble * r.ranIterations / secs)}}""")
    }
    if (algos("lp")) {
      // 5 synchronous rounds, the secondary-scaling shape (fixed work at
      // any input size, like the PageRank superstep headline)
      val t0 = System.nanoTime()
      val r  = LabelPropagation.run(graph,
        LpConfig(maxIterations = 5, schedule = Schedule.Sync))
      val labels = r.labels.select("label").distinct().count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(s"""{"probe":"tenx-lp","secs":${"%.1f".format(secs)},""" +
        s""""rounds":5,"distinct_labels":$labels,""" +
        s""""edges_per_sec_per_round":${"%.0f".format(e.toDouble * 5 / secs)}}""")
    }
    if (algos("triangle")) {
      // the O(m^1.5) wedge stream at 147M edges (~100 GB shuffle) exceeds a
      // single box's RAM+disk; batches bound peak footprint to ~1/K (a real
      // cluster absorbs the single-job plan in aggregate shuffle space)
      val batches = sys.env.getOrElse("GRAFT_TENX_TRI_BATCHES", "8").toInt
      val t0 = System.nanoTime()
      val r  = TriangleCount.run(graph,
        graft.algo.TriangleCountConfig(wedgeBatches = batches))
      val secs = (System.nanoTime() - t0) / 1e9
      println(s"""{"probe":"tenx-triangle","secs":${"%.1f".format(secs)},""" +
        s""""wedge_batches":$batches,"global_triangles":${r.globalTriangles},""" +
        s""""edges_per_sec":${"%.0f".format(e / secs)}}""")
    }
    spark.stop()
  }
}
