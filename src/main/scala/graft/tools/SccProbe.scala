package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.algo.Scc
import graft.core.{GraphOps, PropertyGraph}

/** Outer-round structure probe for SCC on the q_scc bench graph. */
object SccProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val edges = o.filter(col("o_orderkey") % 9 === 0)
      .select((col("o_orderkey") % 400).as("src"),
              ((col("o_orderkey") * 13 + col("o_custkey") * 7) % 400).as("dst"))
    val g = PropertyGraph(GraphOps.verticesOf(edges), edges)
    val t0 = System.nanoTime()
    val r = Scc.run(g)
    println(f"SCC comps=${r.select("sccId").distinct().count()} " +
      f"rows=${r.count()} secs=${(System.nanoTime() - t0) / 1e9}%.1f")
    spark.stop()
  }
}
