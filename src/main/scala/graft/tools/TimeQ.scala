package graft.tools

object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("TIMEQ_DIR", "/root/testdata/sf0.001")
    val qs = sys.env.getOrElse("TIMEQ_QUERIES",
      "q_dijkstra_dist,q_astar_dist,q_yens_dist,q_scc_dist,q_louvain_l1_dist,q_betweenness_dist,q_closeness_dist,q_knn_dist").split(",")
    val reps = sys.env.getOrElse("TIMEQ_REPS","2").toInt
    for (rep <- 1 to reps; q <- qs) {
      val t0=System.nanoTime(); graft.SparkEntry.queries(q)(spark,dir).count()
      println(f"rep=$rep $q ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
