package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Dev probe: hashed-ngram classifier accuracy / loss trajectory on the
  * q_text_classifier target (unigram-share threshold) at a given SF dir. */
object ClassifierProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .appName("classifier-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val toks = TextOps.tokenCount(col("text"))
    val share = when(toks === 0, lit(0.0)).otherwise(
      size(regexp_extract_all(col("text"), lit("\\bspark\\b"), lit(0)))
        .cast("double") / toks.cast("double"))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("y", (share >= 0.03).cast("long"))
    for ((dims, big, lr, iters) <- Seq((256, false, 25.0, 500), (256, false, 200.0, 2000),
                                       (64, true, 200.0, 2000))) {
      val r = TextOps.trainTextClassifier(docs, "doc_id", "text", "y", dims = dims,
        bigrams = big,
        cfg = graft.ml.LogisticRegression.LrConfig(
          maxIterations = iters, learningRate = lr, tolerance = 0.0))
      println(f"dims=$dims bigrams=$big lr=$lr iters=$iters acc=${r.accuracy}%.4f " +
        f"losses(first,last)=${r.model.losses.head}%.4f,${r.model.losses.last}%.4f " +
        f"nlosses=${r.model.losses.size}")
    }
    spark.stop()
  }
}
