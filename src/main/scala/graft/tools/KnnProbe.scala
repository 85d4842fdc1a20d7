package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.algo.Knn
import graft.ops.Ann

/** Dev probe: NN-descent recall vs brute force per config. */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$dir/embeddings.parquet").persist()
    val n = e.count()
    val evalK = 5
    val exact = Ann.bruteForceTopK(e, e, k = evalK)
      .select(col("query_id").as("id"), col("neighbor_id")).persist()
    exact.count()
    for (k <- Seq(10, 15, 20); iters <- Seq(8, 12); rj <- Seq(8)) {
      val t0 = System.nanoTime()
      val r = Knn.run(e, Knn.KnnConfig(k = k, maxIterations = iters, randomJoins = rj))
      val matched = r.neighbors.filter(col("rank") <= evalK)
        .select("id", "neighbor_id")
        .join(exact, Seq("id", "neighbor_id"), "left_semi").count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"KNNPROBE k=$k iters=$iters rj=$rj ranIters=${r.ranIterations} " +
        f"recall@$evalK=${matched.toDouble / (n * evalK)}%.3f secs=$secs%.1f")
    }
    spark.stop()
  }
}
