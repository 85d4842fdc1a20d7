package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.algo.{Node2Vec, SpanningTree, Wcc, WccConfig}
import graft.core.{GraphOps, PropertyGraph}

/** Timing breakdown for q_kspanning / q_node2vec hot parts. */
object KspProbe {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"TIMER $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val c = spark.read.parquet(s"$dir/customer.parquet")
    val n = c.count()
    val path = c.filter(col("c_custkey") < n - 1)
      .select(col("c_custkey").as("src"), (col("c_custkey") + 1).as("dst"),
        (col("c_custkey") % 7 + 1).cast("double").as("weight"))
    val chords = c.select(col("c_custkey").as("src"),
        pmod(col("c_custkey") * 3 + 1, lit(n)).as("dst"),
        (col("c_custkey") % 13 + 10).cast("double").as("weight"))
    val edges = path.unionByName(chords)
    val g = PropertyGraph(GraphOps.verticesOf(edges), edges)

    val r = t("spanning_run") { val r = SpanningTree.run(g, None, true); r.treeEdges.count(); r }
    val ord = Seq(col("weight").desc, col("src").asc, col("dst").asc)
    val cut = t("cut") { val c2 = r.treeEdges.orderBy(ord: _*).limit(2); c2.count(); c2 }
    val kept = t("kept") {
      val k = r.treeEdges.join(cut.select("src", "dst"), Seq("src", "dst"), "left_anti")
      k.count(); k
    }
    val nodes = r.treeEdges.select(col("src").as("id"))
      .unionByName(r.treeEdges.select(col("dst").as("id"))).distinct()
    val sub = PropertyGraph(nodes, kept)
    val wccR = t("wcc_star") { val w = Wcc.runStar(sub); w.components.count(); w }
    println(s"wcc rounds=${wccR.ranIterations} converged=${wccR.didConverge}")

    // node2vec breakdown on the dense graph
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val de = o.select((col("o_orderkey") % 300).as("src"),
      ((col("o_orderkey") * 7 + col("o_custkey")) % 300).as("dst"))
    val dg = PropertyGraph(GraphOps.verticesOf(de), de)
    val cfg = Node2Vec.Node2VecConfig(embeddingDimension = 16,
      walkLength = 6, walksPerNode = 2, returnFactor = 0.5,
      inOutFactor = 2.0, windowSize = 3, rejectionRounds = 4)
    val walks = t("n2v_walks") { val w = Node2Vec.biasedWalks(dg, cfg); w.count(); w }
    t("n2v_full") { Node2Vec.run(dg, cfg).embeddings.count() }
    spark.stop()
  }
}
