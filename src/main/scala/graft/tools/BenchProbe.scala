package graft.tools

import org.apache.spark.sql.SparkSession
import graft.algo.{PageRank, PageRankConfig}
import graft.core.PropertyGraph
import graft.io.Pages

/** Phase-timing probe for benchmark tuning (dev tool). */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val nPages = if (args.nonEmpty) args(0).toLong else 20000L
    val cores  = if (args.length > 1) args(1).toInt else 32
    val steps  = if (args.length > 2) args(2).toInt else 8
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val spark = t("session") {
      val s = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("PROBE_PARTS", cores.toString))
        .config("spark.sql.adaptive.enabled", sys.env.getOrElse("PROBE_AQE", "true"))
        .config("spark.sql.autoBroadcastJoinThreshold",
          sys.env.getOrElse("PROBE_BCAST", "10485760"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("ERROR"); s
    }
    val pages = t("synth+cache pages") {
      val p = Pages.synth(spark, nPages).persist(); p.count(); p
    }
    val graph = t("extract edges") {
      val g = Pages.toGraph(pages)
      val e = g.edges.persist()
      println("PROBE edges=" + e.count())
      val v = g.vertices.select("id").persist(); v.count()
      PropertyGraph(v, e)
    }
    t(s"pagerank $steps supersteps") {
      PageRank.run(graph, PageRankConfig(tolerance = 0.0, maxIterations = steps)).scores.count()
    }
    t(s"pagerank $steps supersteps (2nd)") {
      PageRank.run(graph, PageRankConfig(tolerance = 0.0, maxIterations = steps)).scores.count()
    }
    if (sys.env.get("PROBE_EXPLAIN_LOOP").contains("1")) {
      // replicate the EXACT loop conditions: loop conf + truncated state
      import org.apache.spark.sql.functions._
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
      val parts = spark.sessionState.conf.numShufflePartitions
      val edgesW = graft.core.GraphOps.withWeight(graph.edges)
      val degrees = edgesW.groupBy("src").agg(count(lit(1)).cast("double").as("deg"))
      val msgEdges = edgesW.join(degrees, "src").filter(col("deg") > 0)
        .select(col("src"), col("dst"), (lit(1.0) / col("deg")).as("norm"))
        .repartition(parts, col("src")).persist()
      msgEdges.count()
      val init0 = graph.vertices.repartition(parts, col("id"))
        .select(col("id"), lit(0.15).as("rank"), lit(0.15).as("delta"), lit(true).as("_active"))
        .persist()
      init0.count()
      // superstep 1 output, persisted + truncated like the loop does
      def step(state: org.apache.spark.sql.DataFrame) = {
        val inbox = state.filter(col("_active")).select(col("id").as("src"), col("delta"))
          .join(msgEdges, "src")
          .select(col("dst").as("id"), (col("delta") * col("norm")).as("msg"))
          .groupBy("id").agg(sum("msg").as("msum"))
        state.select("id", "rank").join(inbox, Seq("id"), "left")
          .select(col("id"),
            (col("rank") + coalesce(lit(0.85) * col("msum"), lit(0.0))).as("rank"),
            coalesce(lit(0.85) * col("msum"), lit(0.0)).as("delta"))
          .withColumn("_active", col("delta") > lit(0.0))
      }
      val s1 = step(init0).persist(); s1.count()
      val s1t = org.apache.spark.sql.GraftSqlCompat.truncatePlan(s1)
      println("=== PLAN OF SUPERSTEP 2 (steady state) ===")
      step(s1t).explain("formatted")
    }
    if (sys.env.get("PROBE_EXPLAIN").contains("1")) {
      // one-superstep plan: replicate the loop body for inspection
      import org.apache.spark.sql.functions._
      val parts = spark.sessionState.conf.numShufflePartitions
      val edgesW = graft.core.GraphOps.withWeight(graph.edges)
      val degrees = edgesW.groupBy("src").agg(count(lit(1)).cast("double").as("deg"))
      val msgEdges = edgesW.join(degrees, "src").filter(col("deg") > 0)
        .select(col("src"), col("dst"), (lit(1.0) / col("deg")).as("norm"))
        .repartition(parts, col("src")).persist()
      msgEdges.count()
      val init = graph.vertices.repartition(parts, col("id"))
        .select(col("id"), lit(0.15).as("rank"), lit(0.15).as("delta"), lit(true).as("_active"))
        .persist()
      init.count()
      val inbox = init.filter(col("_active")).select(col("id").as("src"), col("delta"))
        .join(msgEdges, "src")
        .select(col("dst").as("id"), (col("delta") * col("norm")).as("msg"))
        .groupBy("id").agg(sum("msg").as("msum"))
      val next = init.select("id", "rank").join(inbox, Seq("id"), "left")
      next.explain("formatted")
    }
    spark.stop()
  }
}
