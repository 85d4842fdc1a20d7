package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ml.{LinkPipeline, LogisticRegression}
object LpPipeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          Option(j.properties).map(_.getProperty("callSite.short", "?")).getOrElse("?")))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = starts.remove(j.jobId)
        if (s != null) {
          val sec = (System.nanoTime() - s._1) / 1e9
          if (sec > 0.3) println(f"[job] ${j.jobId}%4d ${sec}%7.2f s  ${s._2}")
        }
      }
    })
    spark.range(10).count()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[lp] $tag: ${(System.nanoTime()-t0)/1e9}%.1f s"); r
    }
    // mirror q_lp_pipeline's mlGraph
    val n = 300L; val half = 150L
    val verts = spark.range(n).select(col("id"),
      array((col("id") < half).cast("double"), (col("id") >= half).cast("double"),
            (col("id") % 7).cast("double") / 7.0).as("emb"),
      when(col("id") < half, 0L).otherwise(1L).as("cls"))
    val base = when(col("id") < half, lit(0L)).otherwise(lit(half))
    val ring  = spark.range(n).select(col("id").as("src"), (base + pmod(col("id") - base + 1, lit(half))).as("dst"))
    val chord = spark.range(n).select(col("id").as("src"), (base + pmod(col("id") - base + 7, lit(half))).as("dst"))
    val g = graft.core.PropertyGraph(verts, ring.unionByName(chord))
    LinkPipeline.drop("pp"); LinkPipeline.create("pp")
    LinkPipeline.addNodeProperty("pp", "fastRP", "frp", Map("embeddingDimension" -> "8"))
    LinkPipeline.addFeature("pp", graft.ml.LinkPrediction.Combiner.Hadamard, Seq("emb"))
    LinkPipeline.addFeature("pp", graft.ml.LinkPrediction.Combiner.L2, Seq("frp"))
    LinkPipeline.configureSplit("pp", LinkPipeline.SplitCfg(testFraction = 0.25, seed = 7L))
    LinkPipeline.configureParams("pp", Seq(
      LogisticRegression.LrConfig(maxIterations = 1, learningRate = 0.01),
      LogisticRegression.LrConfig(maxIterations = 120, learningRate = 1.0)))
    val frp = t("fastRP alone") {
      graft.algo.FastRP.run(g, graft.algo.FastRP.FastRPConfig(embeddingDimension = 8))
    }
    t("fastRP materialize")(frp.count())
    val m = t("train")(LinkPipeline.train(g, "pp", "ppm"))
    t("predict")(LinkPipeline.predict(g, "ppm", 50).count())
    spark.stop()
  }
}
