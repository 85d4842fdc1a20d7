package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.{LinkPrediction, LogisticRegression, ModelCatalog, NodeClassification}
import graft.algo.GraphSage

/** Lifecycle + codec roundtrip for the model catalog (reference:
  * gds.beta.model.list/exists/drop, gds.alpha.model.store/load). */
class ModelCatalogSpec extends AnyFunSuite with SparkTestBase {

  private def lr(seed: Int) = LogisticRegression.LrModel(
    Array(0.1 * seed, -0.25, 3.5), 0.75 + seed, Seq(1.0, 0.5, 0.25))

  test("set / exists / list / drop lifecycle") {
    ModelCatalog.dropAll()
    ModelCatalog.set("m1", lr(1), Map("k" -> "v"))
    ModelCatalog.set("m2", lr(2))
    assert(ModelCatalog.exists("m1") && ModelCatalog.exists("m2"))
    val infos = ModelCatalog.list()
    assert(infos.map(_.name) == Seq("m1", "m2"))
    assert(infos.head.modelType == "LogisticRegression")
    assert(infos.head.meta == Map("k" -> "v"))
    assert(ModelCatalog.drop("m1") && !ModelCatalog.exists("m1"))
    assert(!ModelCatalog.drop("m1"))
    assert(ModelCatalog.get[LogisticRegression.LrModel]("m2").bias == 2.75)
    ModelCatalog.dropAll()
  }

  test("encode/decode roundtrips every model type exactly") {
    val lrm = lr(3)
    val nc = NodeClassification.NcModel(Seq(0L, 7L),
      Map(0L -> lr(4), 7L -> lr(5)), 0.9375, 0.8125,
      winner = 1,
      validationStats = Seq(
        NodeClassification.CandidateStats(0, 0.5, 0.25, 0.75),
        NodeClassification.CandidateStats(1, 0.875, 0.8125, 0.9375)),
      holdoutMetrics = Map("ACCURACY" -> 0.8125, "F1_MACRO" -> 0.75))
    val link = LinkPrediction.LinkModel(lr(6), LinkPrediction.Combiner.L2, 3, 1.0, 0.75)
    val sage = GraphSage.GraphSageModel(Seq(
      GraphSage.Layer(Array(Array(1.0, 2.0), Array(3.0, 4.0)),
        Array(Array(-1.0, 0.5), Array(0.0, 2.5)), Array(0.1, -0.2)),
      GraphSage.Layer(Array(Array(5.0, 6.0)), Array(Array(7.0, 8.0)), Array(9.0))), 2)

    def rt(m: AnyRef, t: String): AnyRef = ModelCatalog.decode(t, ModelCatalog.encode(m))

    val lrBack = rt(lrm, "LogisticRegression").asInstanceOf[LogisticRegression.LrModel]
    assert(lrBack.weights.sameElements(lrm.weights) && lrBack.bias == lrm.bias
      && lrBack.losses == lrm.losses)

    val ncBack = rt(nc, "NodeClassification").asInstanceOf[NodeClassification.NcModel]
    assert(ncBack.classes == nc.classes
      && ncBack.trainAccuracy == nc.trainAccuracy && ncBack.testAccuracy == nc.testAccuracy
      && nc.classes.forall(c => ncBack.models(c).weights.sameElements(nc.models(c).weights)
        && ncBack.models(c).bias == nc.models(c).bias))
    assert(ncBack.winner == nc.winner
      && ncBack.validationStats == nc.validationStats
      && ncBack.holdoutMetrics == nc.holdoutMetrics)

    val linkBack = rt(link, "LinkPrediction").asInstanceOf[LinkPrediction.LinkModel]
    assert(linkBack.combiner == link.combiner && linkBack.dims == link.dims
      && linkBack.model.weights.sameElements(link.model.weights)
      && linkBack.trainAccuracy == link.trainAccuracy)

    val sageBack = rt(sage, "GraphSage").asInstanceOf[GraphSage.GraphSageModel]
    assert(sageBack.inputDim == sage.inputDim && sageBack.layers.size == 2)
    sage.layers.zip(sageBack.layers).foreach { case (e, g) =>
      assert(e.wSelf.map(_.toSeq).toSeq == g.wSelf.map(_.toSeq).toSeq)
      assert(e.wNeigh.map(_.toSeq).toSeq == g.wNeigh.map(_.toSeq).toSeq)
      assert(e.bias.sameElements(g.bias))
    }
  }

  test("store/load roundtrip is versioned and atomic-latest") {
    ModelCatalog.dropAll()
    val dir = java.nio.file.Files.createTempDirectory("graft-mc").toString
    try {
      ModelCatalog.set("m", lr(1), Map("note" -> "first"))
      ModelCatalog.store(spark, "m", dir)
      ModelCatalog.set("m", lr(9), Map("note" -> "second"))
      ModelCatalog.store(spark, "m", dir) // second snapshot of the same name
      ModelCatalog.dropAll()
      val info = ModelCatalog.load(spark, "m", dir)
      assert(info.meta.get("note").contains("second"))
      val back = ModelCatalog.get[LogisticRegression.LrModel]("m")
      assert(back.bias == 9.75 && back.weights.sameElements(Array(0.9, -0.25, 3.5)))
      ModelCatalog.dropAll()
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }
}
