package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.algo.{Louvain, LouvainConfig}
import graft.core.{GraphOps, PropertyGraph}

/** Level/round structure probe for Louvain on the sf0.1 dense graph. */
object LouvainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges =
      if (sfDir == "pages") graft.io.Pages.synthEdges(spark, 20000L, density = 2.0)
      else {
        val o = spark.read.parquet(s"$sfDir/orders.parquet")
        o.select((col("o_orderkey") % 300).as("src"),
          ((col("o_orderkey") * 7 + col("o_custkey")) % 300).as("dst"))
      }
    val g = PropertyGraph(GraphOps.verticesOf(edges), edges)
    val t0 = System.nanoTime()
    val r = Louvain.run(g)
    println(f"LOUVAIN levels=${r.ranLevels} Q=${r.modularity}%.4f " +
      f"mods=${r.modularities.map(q => f"$q%.4f").mkString(",")} " +
      f"secs=${(System.nanoTime() - t0) / 1e9}%.1f")
    spark.stop()
  }
}
