package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.algo.Knn
import graft.ops.Ann

/** Times the q_knn pieces in isolation: local-tail NN-descent vs the
  * distributed path vs the brute-force exact side. */
object KnnTailProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    e.count()
    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"KNNPROBE $label rows=$r secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    time("local-1st") {
      Knn.run(e, Knn.KnnConfig(k = 20, maxIterations = 4, randomJoins = 16)).neighbors.count()
    }
    time("local-2nd") {
      Knn.run(e, Knn.KnnConfig(k = 20, maxIterations = 4, randomJoins = 16)).neighbors.count()
    }
    time("distributed") {
      Knn.run(e, Knn.KnnConfig(k = 20, maxIterations = 4, randomJoins = 16,
        localTailThreshold = -1L)).neighbors.count()
    }
    time("bruteforce") {
      Ann.bruteForceTopK(e, e, k = 5).count()
    }
    spark.stop()
  }
}
