package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.PropertyGraph
import graft.ml.{LogisticRegression, LinkPrediction, NodeClassification}
import graft.algo.GraphSage

class MlSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("logistic regression separates a linearly separable set") {
    // y = 1 iff x0 + x1 > 1, with a margin
    val rows = for (i <- 0 until 40; j <- 0 until 40) yield {
      val x0 = i / 40.0; val x1 = j / 40.0
      val s = x0 + x1
      if (math.abs(s - 1.0) < 0.1) None
      else Some((Array(x0, x1), if (s > 1.0) 1.0 else 0.0))
    }
    val df = rows.flatten.toDF("features", "y")
    val m = LogisticRegression.train(df, "features", "y", 2,
      LogisticRegression.LrConfig(maxIterations = 200, learningRate = 2.0))
    // loss decreases monotonically-ish and accuracy is perfect
    assert(m.losses.head > m.losses.last)
    val acc = df.agg(avg(when(
      (LogisticRegression.predictProb(col("features"), m) >= 0.5) ===
        (col("y") === 1.0), 1.0).otherwise(0.0))).first().getDouble(0)
    assert(acc == 1.0, s"accuracy $acc")
  }

  test("logistic regression local tail matches the distributed scan") {
    val df = (0 until 120).map(i =>
      (Array(i / 120.0, (i % 11) / 11.0, (i % 3) / 3.0),
        if ((i % 11) > 5 == (i % 2 == 0)) 1.0 else 0.0)).toDF("features", "y")
    val dist = LogisticRegression.train(df, "features", "y", 3,
      LogisticRegression.LrConfig(maxIterations = 30, localTailThreshold = -1L))
    val local = LogisticRegression.train(df, "features", "y", 3,
      LogisticRegression.LrConfig(maxIterations = 30, localTailThreshold = Long.MaxValue))
    assert(dist.losses.size == local.losses.size)
    dist.losses.zip(local.losses).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"loss $a vs $b") }
    dist.weights.zip(local.weights).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"weight $a vs $b") }
    assert(math.abs(dist.bias - local.bias) < 1e-9)
  }

  test("logistic regression is deterministic") {
    val df = (0 until 100).map(i =>
      (Array(i / 100.0, (i % 7) / 7.0), if (i % 2 == 0) 1.0 else 0.0)).toDF("features", "y")
    val cfg = LogisticRegression.LrConfig(maxIterations = 20)
    val a = LogisticRegression.train(df, "features", "y", 2, cfg)
    val b = LogisticRegression.train(df, "features", "y", 2, cfg)
    assert(a.weights.toSeq == b.weights.toSeq && a.bias == b.bias)
  }

  /** Two feature clusters; edges only inside clusters. Hadamard features of
    * intra-cluster pairs differ from inter-cluster ones, so the model must
    * beat coin-flip comfortably. */
  private def clusteredGraph(n: Int): PropertyGraph = {
    val verts = (0L until n.toLong).map { i =>
      val c = if (i < n / 2) 0 else 1
      val f = Array(if (c == 0) 1.0 else 0.0, if (c == 1) 1.0 else 0.0,
        0.1 * (i % 5))
      (i, f, c.toLong)
    }.toDF("id", "emb", "cls")
    val edges = (0L until n.toLong).flatMap { i =>
      val base = if (i < n / 2) 0L else n / 2L
      val lim  = n / 2L
      Seq((i, base + (i + 1) % lim), (i, base + (i + 3) % lim))
    }.filter { case (a, b) => a != b }.toDF("src", "dst")
    PropertyGraph(verts, edges)
  }

  test("link prediction learns intra-cluster structure") {
    val g = clusteredGraph(60)
    val model = LinkPrediction.train(g, "emb",
      LinkPrediction.LinkPredictionConfig(
        lr = LogisticRegression.LrConfig(maxIterations = 120, learningRate = 1.0)))
    assert(model.trainAccuracy > 0.8, s"train acc ${model.trainAccuracy}")
    val preds = LinkPrediction.predict(g, model, "emb", 20)
    assert(preds.count() == 20)
    // top predictions should all be intra-cluster (the learned signal)
    val intra = preds.filter(
      (col("src") < 30 && col("dst") < 30) || (col("src") >= 30 && col("dst") >= 30))
    assert(intra.count() >= 18)
  }

  test("node classification recovers separable classes") {
    val g = clusteredGraph(80)
    val m = NodeClassification.train(g, "emb", "cls",
      NodeClassification.NcConfig(
        lr = LogisticRegression.LrConfig(maxIterations = 120, learningRate = 1.0)))
    assert(m.classes == Seq(0L, 1L))
    assert(m.trainAccuracy == 1.0 && m.testAccuracy == 1.0,
      s"train ${m.trainAccuracy} test ${m.testAccuracy}")
    val preds = collectLongMap(
      NodeClassification.predict(g, "emb", m), "id", "predictedClass")
    assert(preds(0L) == 0L && preds(79L) == 1L)
    assert(preds.size == 80)
  }

  test("node classification CV selection picks the trained candidate over the null model") {
    val g = clusteredGraph(80)
    // candidate 0: zero GD steps -> all-zero weights -> every margin ties at
    // 0 -> argmax predicts the smallest class everywhere (F1 floor);
    // candidate 1: the real model
    val m = NodeClassification.train(g, "emb", "cls",
      NodeClassification.NcConfig(
        params = Seq(
          LogisticRegression.LrConfig(maxIterations = 0),
          LogisticRegression.LrConfig(maxIterations = 120, learningRate = 1.0)),
        validationFolds = 3, metric = "F1_WEIGHTED"))
    assert(m.winner == 1, s"winner ${m.winner}, stats ${m.validationStats}")
    assert(m.validationStats.map(_.candidate) == Seq(0, 1))
    assert(m.validationStats(1).avg > m.validationStats(0).avg)
    assert(m.validationStats(1).min == 1.0 && m.validationStats(1).max == 1.0)
    assert(m.holdoutMetrics("ACCURACY") == 1.0
      && m.holdoutMetrics("F1_WEIGHTED") == 1.0
      && m.holdoutMetrics("F1_MACRO") == 1.0, s"metrics ${m.holdoutMetrics}")
    assert(m.trainAccuracy == 1.0 && m.testAccuracy == 1.0)
  }

  test("node classification CV: local selection loop matches the forced-distributed path") {
    val g = clusteredGraph(60)
    def cfg(threshold: Long) = NodeClassification.NcConfig(
      params = Seq(
        LogisticRegression.LrConfig(maxIterations = 0, localTailThreshold = threshold),
        LogisticRegression.LrConfig(maxIterations = 40, learningRate = 1.0,
          localTailThreshold = threshold)),
      validationFolds = 2, metric = "F1_MACRO")
    val local = NodeClassification.train(g, "emb", "cls", cfg(Long.MaxValue))
    val dist  = NodeClassification.train(g, "emb", "cls", cfg(-1L))
    assert(local.winner == dist.winner)
    assert(local.validationStats == dist.validationStats,
      s"${local.validationStats} vs ${dist.validationStats}")
    assert(local.holdoutMetrics == dist.holdoutMetrics)
  }

  test("multiclass metrics from confusion counts") {
    // 3 classes; confusion: class 0 perfect (2), class 1: 1 right / 1 -> 2,
    // class 2: both predicted as 0
    val conf = Map((0L, 0L) -> 2L, (1L, 1L) -> 1L, (1L, 2L) -> 1L,
      (2L, 0L) -> 2L)
    val classes = Seq(0L, 1L, 2L)
    def m(n: String) = NodeClassification.computeMetric(n, classes, conf)
    assert(m("ACCURACY") == 3.0 / 6.0)
    // f1(0): tp=2 fp=2 fn=0 -> 4/6; f1(1): tp=1 fp=0 fn=1 -> 2/3; f1(2): tp=0 -> 0
    assert(math.abs(m("F1_MACRO") - (4.0 / 6.0 + 2.0 / 3.0 + 0.0) / 3.0) < 1e-15)
    assert(math.abs(m("F1_WEIGHTED") -
      (2 * (4.0 / 6.0) + 2 * (2.0 / 3.0) + 2 * 0.0) / 6.0) < 1e-15)
  }

  test("graphsage: loss decreases, embeddings are unit-norm and cluster-separating") {
    val g = clusteredGraph(60)
    val r = GraphSage.run(g, "emb", GraphSage.GraphSageConfig(
      embeddingDimension = 8, hiddenDimension = 8, epochs = 40, sampleNodes = 60))
    assert(r.losses.head > r.losses.last, s"losses ${r.losses.head} -> ${r.losses.last}")
    val embs = r.embeddings.select(col("id"),
        aggregate(col("embedding"), lit(0.0), (a, v) => a + v * v).as("n2"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(embs.size == 60)
    embs.values.foreach(n2 => assert(math.abs(n2 - 1.0) < 1e-9, s"norm2 $n2"))
    // same-cluster pairs more similar on average than cross-cluster pairs
    val vecs = r.embeddings.collect()
      .map(x => x.getLong(0) -> x.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = a.zip(b).map(p => p._1 * p._2).sum
    val intra = (0L until 29L).map(i => cos(vecs(i), vecs(i + 1)))
    val inter = (0L until 29L).map(i => cos(vecs(i), vecs(i + 30L)))
    assert(intra.sum / intra.size > inter.sum / inter.size)
  }

  test("graphsage predict is deterministic and handles isolated vertices") {
    val verts = Seq((0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)),
      (2L, Array(0.5, 0.5))).toDF("id", "emb")
    val g = PropertyGraph(verts, Seq((0L, 1L)).toDF("src", "dst"))
    val (model, _) = GraphSage.train(g, "emb",
      GraphSage.GraphSageConfig(embeddingDimension = 4, hiddenDimension = 4,
        epochs = 5, sampleNodes = 3))
    val a = GraphSage.predict(g, "emb", model).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = GraphSage.predict(g, "emb", model).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a == b)
    assert(a.keySet == Set(0L, 1L, 2L)) // 2 is isolated: zero neighbour mean
    a.values.foreach(v => v.foreach(x => assert(!x.isNaN && !x.isInfinite)))
  }

  test("gds util functions") {
    import graft.functions.GdsUtil
    val df = Seq((1.0), (Double.NaN), (Double.PositiveInfinity)).toDF("x")
    val r = df.select(GdsUtil.isFinite(col("x")).as("f"),
      GdsUtil.isInfinite(col("x")).as("i")).collect()
    assert(r.map(x => (x.getBoolean(0), x.getBoolean(1))).toSeq ==
      Seq((true, false), (false, false), (false, true)))
  }
}
