package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.algo.Knn
import graft.ops.Ann

/** Recall/time sweep for the NN-descent config on the sf embeddings table.
  * args: sfDir [k] then triples maxIter:randomJoins... */
object KnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = if (args.length > 1) args(1).toInt else 5
    val cfgs = args.drop(2).map { s =>
      val Array(mi, rj) = s.split(":"); (mi.toInt, rj.toInt)
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").persist()
    val n = e.count()
    val exact = Ann.bruteForceTopK(e, e, k = k)
      .select(col("query_id").as("id"), col("neighbor_id")).persist()
    exact.count()
    for ((mi, rj) <- cfgs) {
      val t0 = System.nanoTime()
      val r = Knn.run(e, Knn.KnnConfig(k = 20, maxIterations = mi, randomJoins = rj))
      val matched = r.neighbors.filter(col("rank") <= k).select("id", "neighbor_id")
        .join(exact, Seq("id", "neighbor_id"), "left_semi").count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"KNNPROBE mi=$mi rj=$rj iters=${r.ranIterations} converged=${r.didConverge} " +
        f"recall=${matched.toDouble / (n * k)}%.3f secs=$secs%.1f")
    }
    spark.stop()
  }
}
