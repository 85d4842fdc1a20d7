package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.PropertyGraph
import graft.ml.{LinkPipeline, LogisticRegression, ModelCatalog}
import graft.ml.LinkPrediction.Combiner

class LinkPipelineSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  /** Two clusters with intra-cluster ring+chord edges and one-hot features —
    * the same learnable structure MlSpec uses. */
  private def clusteredGraph(n: Int): PropertyGraph = {
    val half = n / 2
    val verts = (0L until n.toLong).map { i =>
      val c = if (i < half) 0 else 1
      (i, Array(if (c == 0) 1.0 else 0.0, if (c == 1) 1.0 else 0.0, 0.1 * (i % 5)))
    }.toDF("id", "emb")
    val edges = (0L until n.toLong).flatMap { i =>
      val base = if (i < half) 0L else half.toLong
      Seq((i, base + (i - base + 1) % half), (i, base + (i - base + 7) % half))
    }.filter { case (a, b) => a != b }.toDF("src", "dst")
    PropertyGraph(verts, edges)
  }

  test("staged configuration mutates the named pipeline") {
    LinkPipeline.create("p0")
    assert(LinkPipeline.exists("p0"))
    LinkPipeline.addNodeProperty("p0", "degree", "deg")
    LinkPipeline.addFeature("p0", Combiner.Hadamard, Seq("emb"))
    LinkPipeline.configureSplit("p0", LinkPipeline.SplitCfg(testFraction = 0.3))
    LinkPipeline.configureParams("p0",
      Seq(LogisticRegression.LrConfig(maxIterations = 5)))
    val p = LinkPipeline.get("p0")
    assert(p.nodePropertySteps.map(_.proc) == Seq("degree"))
    assert(p.featureSteps.head.nodeProperties == Seq("emb"))
    assert(p.split.testFraction == 0.3)
    assert(p.params.head.maxIterations == 5)
    assert(LinkPipeline.drop("p0") && !LinkPipeline.exists("p0"))
    intercept[IllegalArgumentException] {
      LinkPipeline.create("px"); LinkPipeline.addNodeProperty("px", "nope", "x")
    }
    LinkPipeline.drop("px")
  }

  test("train selects the best candidate and learns the cluster structure") {
    val g = clusteredGraph(80)
    LinkPipeline.create("p1")
    LinkPipeline.addFeature("p1", Combiner.Hadamard, Seq("emb"))
    LinkPipeline.configureSplit("p1", LinkPipeline.SplitCfg(testFraction = 0.25, seed = 7L))
    // candidate 0 is deliberately underfit (1 iteration); candidate 1 real
    LinkPipeline.configureParams("p1", Seq(
      LogisticRegression.LrConfig(maxIterations = 1, learningRate = 0.01),
      LogisticRegression.LrConfig(maxIterations = 120, learningRate = 1.0)))
    val m = LinkPipeline.train(g, "p1", "m1")
    assert(m.candidateTestAcc.size == 2)
    assert(m.winner == 1, s"winner ${m.winner} accs ${m.candidateTestAcc}")
    assert(m.testAccuracy >= 0.7, s"test acc ${m.testAccuracy}")
    assert(ModelCatalog.exists("m1"))
    val preds = LinkPipeline.predict(g, "m1", 20).collect()
    assert(preds.length == 20)
    // learned signal: top pairs are intra-cluster
    val intra = preds.count(r =>
      (r.getLong(0) < 40) == (r.getLong(1) < 40))
    assert(intra >= 18, s"intra $intra/20")
    LinkPipeline.drop("p1"); ModelCatalog.drop("m1")
  }

  test("node-property steps mutate the graph and feed features") {
    val g = clusteredGraph(40)
    LinkPipeline.create("p2")
    LinkPipeline.addNodeProperty("p2", "degree", "deg")
    LinkPipeline.addNodeProperty("p2", "fastRP", "frp",
      Map("embeddingDimension" -> "8"))
    // scalar 'deg' becomes a length-1 block; frp an 8-block; emb a 3-block
    LinkPipeline.addFeature("p2", Combiner.Hadamard, Seq("emb", "deg"))
    LinkPipeline.addFeature("p2", Combiner.L2, Seq("frp"))
    LinkPipeline.configureParams("p2",
      Seq(LogisticRegression.LrConfig(maxIterations = 10)))
    val m = LinkPipeline.train(g, "p2", "m2")
    assert(m.dims == 3 + 1 + 8, s"dims ${m.dims}")
    LinkPipeline.drop("p2"); ModelCatalog.drop("m2")
  }

  test("train is deterministic") {
    val g = clusteredGraph(60)
    LinkPipeline.create("p3")
    LinkPipeline.addFeature("p3", Combiner.Hadamard, Seq("emb"))
    LinkPipeline.configureParams("p3",
      Seq(LogisticRegression.LrConfig(maxIterations = 15)))
    val a = LinkPipeline.train(g, "p3", "m3a")
    val b = LinkPipeline.train(g, "p3", "m3b")
    assert(a.model.weights.toSeq == b.model.weights.toSeq)
    assert(a.testAccuracy == b.testAccuracy)
    LinkPipeline.drop("p3"); ModelCatalog.drop("m3a"); ModelCatalog.drop("m3b")
  }

  test("pipeline model store/load roundtrip preserves the replayable recipe") {
    val g = clusteredGraph(40)
    LinkPipeline.create("p4")
    LinkPipeline.addNodeProperty("p4", "degree", "deg", Map.empty)
    LinkPipeline.addFeature("p4", Combiner.Cosine, Seq("emb"))
    LinkPipeline.addFeature("p4", Combiner.Hadamard, Seq("deg"))
    LinkPipeline.configureParams("p4",
      Seq(LogisticRegression.LrConfig(maxIterations = 8)))
    val m = LinkPipeline.train(g, "p4", "m4")
    val dir = java.nio.file.Files.createTempDirectory("graft-models").toString
    ModelCatalog.store(spark, "m4", dir)
    ModelCatalog.drop("m4")
    ModelCatalog.load(spark, "m4", dir)
    val back = ModelCatalog.get[LinkPipeline.PipelineModel]("m4")
    assert(back.pipeline.nodePropertySteps == m.pipeline.nodePropertySteps)
    assert(back.pipeline.featureSteps == m.pipeline.featureSteps)
    assert(back.model.weights.toSeq == m.model.weights.toSeq)
    assert(back.dims == m.dims && back.winner == m.winner)
    assert(back.candidateTestAcc == m.candidateTestAcc)
    // loaded model predicts on a raw graph (steps replay)
    val preds = LinkPipeline.predict(g, "m4", 5).collect()
    assert(preds.length == 5)
    LinkPipeline.drop("p4"); ModelCatalog.drop("m4")
  }
}
