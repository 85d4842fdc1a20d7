package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.algo.Knn
import graft.ops.Ann
object KnnDistProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).count()
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.1f s"); r
    }
    val approx = t("nn-descent (dist)") {
      Knn.run(e, Knn.KnnConfig(k = 20, maxIterations = 4, randomJoins = 16,
        localTailThreshold = -1L)).neighbors.persist()
    }
    t("nn-descent materialize")(approx.count())
    val exact = t("brute force") {
      val x = Ann.bruteForceTopK(e, e, k = 5)
        .select(col("query_id").as("id"), col("neighbor_id")).persist()
      x.count(); x
    }
    t("recall join") {
      approx.filter(col("rank") <= 5).select("id", "neighbor_id")
        .join(exact, Seq("id", "neighbor_id"), "left_semi").count()
    }
    spark.stop()
  }
}
