package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.PropertyGraph

/** Node-classification pipeline (reference: alpha/alpha-algo/src/main/java/
  * org/neo4j/gds/ml/nodemodels/NodeClassificationTrain.java + the
  * `gds.alpha.ml.nodeClassification.*` procs): multiclass logistic
  * regression over a node feature vector, trained one-vs-rest.
  *
  * The class list is discovered with one distinct scan (class cardinality
  * is assumed driver-small — the reference holds the full class histogram
  * in memory too); each class trains an independent [[LogisticRegression]]
  * (one codegen'd scan per GD step). Prediction is a single select that
  * evaluates all per-class margins as expressions and takes the argmax —
  * ties break toward the smaller class id, matching the reference's
  * deterministic `max`-reduction order.
  */
object NodeClassification {

  final case class NcConfig(
    testFraction: Double = 0.25,
    seed: Long = 42L,
    lr: LogisticRegression.LrConfig = LogisticRegression.LrConfig(maxIterations = 60),
    /** model-selection candidates (reference NodeClassificationTrainConfig
      * `params`); empty = just `lr` (no selection) */
    params: Seq[LogisticRegression.LrConfig] = Seq.empty,
    /** stratified cross-validation folds over the train split (reference
      * `validationFolds`, StratifiedKFoldSplitter.java); <2 disables CV and
      * the first candidate wins directly */
    validationFolds: Int = 0,
    /** selection metric (reference picks `metrics().get(0)`):
      * ACCURACY | F1_WEIGHTED | F1_MACRO */
    metric: String = "ACCURACY")

  /** Per-candidate validation statistics across folds (reference
    * ModelStats: avg/min/max of the selection metric). */
  final case class CandidateStats(candidate: Int, avg: Double, min: Double, max: Double)

  final case class NcModel(classes: Seq[Long],
                           models: Map[Long, LogisticRegression.LrModel],
                           trainAccuracy: Double, testAccuracy: Double,
                           winner: Int = 0,
                           validationStats: Seq[CandidateStats] = Nil,
                           holdoutMetrics: Map[String, Double] = Map.empty)

  /** Train on vertices where `labelCol` is non-null. With `validationFolds
    * >= 2` runs the reference's model-selection loop: stratified k-fold CV
    * of every candidate on the train split, winner = best mean validation
    * metric, retrained on the full train split and evaluated on the
    * holdout (NodeClassificationTrain.java's selectBestModel +
    * evaluateBestModel + retrainBestModel). */
  def train(graph: PropertyGraph, featureProperty: String, labelCol: String,
            cfg: NcConfig = NcConfig()): NcModel = {
    val candidates = if (cfg.params.nonEmpty) cfg.params else Seq(cfg.lr)
    val labeled = graph.vertices
      .filter(col(labelCol).isNotNull)
      .select(col("id"), col(featureProperty).cast("array<double>").as("features"),
        col(labelCol).cast("long").as("cls"))
      .withColumn("__split",
        pmod(xxhash64(col("id"), lit(cfg.seed)), lit(1000L)).cast("double") / 1000.0)
      .persist()
    val classes = labeled.select("cls").distinct().collect().map(_.getLong(0)).sorted.toSeq
    require(classes.nonEmpty, "no labeled vertices")
    val dims = labeled.select(size(col("features"))).first().getInt(0)
    val trainDf0 = labeled.filter(col("__split") >= cfg.testFraction)
    val testDf   = labeled.filter(col("__split") < cfg.testFraction).persist()

    // stratified fold id: deterministic hash rank within each class, mod k
    // (reference StratifiedKFoldSplitter distributes each class round-robin
    // over folds after a seeded shuffle). Window sorts per class partition —
    // CV is a train-split operation; at web scale selection runs on a
    // sampled train split, so the per-class sort stays bounded.
    val k = cfg.validationFolds
    val trainDf =
      (if (k >= 2) {
        import org.apache.spark.sql.expressions.Window
        trainDf0.withColumn("__fold",
          pmod(row_number().over(
            Window.partitionBy("cls").orderBy(xxhash64(col("id"), lit(cfg.seed + 17L)))
          ).cast("long"), lit(k.toLong)))
      } else trainDf0.withColumn("__fold", lit(0L))).persist()

    def fitAll(df: DataFrame, c: LogisticRegression.LrConfig):
        Map[Long, LogisticRegression.LrModel] =
      classes.map { cl =>
        val binary = df.withColumn("y", when(col("cls") === cl, 1.0).otherwise(0.0))
        cl -> LogisticRegression.train(binary, "features", "y", dims, c)
      }.toMap

    // one confusion-count scan per (df, models); metrics derive driver-side
    // (class count is driver-small, like the reference's in-memory histogram)
    def confusionOf(df: DataFrame, ms: Map[Long, LogisticRegression.LrModel]):
        Map[(Long, Long), Long] =
      df.groupBy(col("cls"), predictExpr(classes, ms).as("pred"))
        .count().collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap

    val (winner, vstats) =
      if (k >= 2 && candidates.size >= 1) {
        // CV runs k*|params|*|classes| fits plus k*|params| validation scans
        // — when the train split fits LR's local tail, collect it ONCE and
        // run the whole selection loop driver-side (same margin fold, clamp
        // and update arithmetic as the distributed scan; MlSpec asserts the
        // selected winner and stats agree with the distributed path)
        val minThreshold = candidates.map(_.localTailThreshold).min
        val localRows: Array[(Array[Double], Long, Long)] =
          if (minThreshold >= 0 && trainDf.count() <= minThreshold)
            trainDf.select("features", "cls", "__fold").collect()
              .map(r => (r.getSeq[Double](0).toArray, r.getLong(1), r.getLong(2)))
          else null
        val perCand = candidates.indices.map { ci =>
          val scores = (0 until k).map { f =>
            if (localRows != null) {
              val fit = localRows.filter(_._3 != f.toLong)
              val ms = classes.map { cl =>
                cl -> LogisticRegression.trainOnRows(
                  fit.map(r => (r._1, if (r._2 == cl) 1.0 else 0.0)), dims, candidates(ci))
              }.toMap
              val conf = localRows.filter(_._3 == f.toLong)
                .groupBy(r => (r._2, predictLocal(classes, ms, r._1)))
                .map { case (key, rs) => key -> rs.length.toLong }
              computeMetric(cfg.metric, classes, conf)
            } else {
              val ms = fitAll(trainDf.filter(col("__fold") =!= f.toLong), candidates(ci))
              computeMetric(cfg.metric, classes,
                confusionOf(trainDf.filter(col("__fold") === f.toLong), ms))
            }
          }
          CandidateStats(ci, scores.sum / k, scores.min, scores.max)
        }
        // ties -> first candidate (stable, like the reference's reduce order)
        (perCand.maxBy(s => (s.avg, -s.candidate)).candidate, perCand)
      } else (0, Nil)

    val models = fitAll(trainDf, candidates(winner))

    val trainConf = confusionOf(trainDf, models)
    val testConf  = confusionOf(testDf, models)
    val holdout = Map(
      "ACCURACY"    -> computeMetric("ACCURACY", classes, testConf),
      "F1_WEIGHTED" -> computeMetric("F1_WEIGHTED", classes, testConf),
      "F1_MACRO"    -> computeMetric("F1_MACRO", classes, testConf))
    val out = NcModel(classes, models,
      computeMetric("ACCURACY", classes, trainConf), holdout("ACCURACY"),
      winner, vstats, holdout)
    labeled.unpersist(false); trainDf.unpersist(false); testDf.unpersist(false)
    out
  }

  /** Driver-side argmax prediction — same (margin, -classId) max as
    * [[predictExpr]], same bias-seeded ascending-dims margin fold. */
  private def predictLocal(classes: Seq[Long],
                           ms: Map[Long, LogisticRegression.LrModel],
                           x: Array[Double]): Long =
    classes.map { c =>
      val m = ms(c)
      var s = m.bias
      var i = 0
      while (i < m.weights.length) { s += x(i) * m.weights(i); i += 1 }
      (s, -c)
    }.max._2 * -1L

  /** Multiclass metric from confusion counts ((actual, predicted) -> n).
    * Empty input (no rows) scores 1.0, matching the previous accuracy
    * convention. Undefined per-class F1 components count as 0 (reference
    * F1Score.java guards zero denominators the same way). */
  private[graft] def computeMetric(name: String, classes: Seq[Long],
                                conf: Map[(Long, Long), Long]): Double = {
    val total = conf.values.sum
    if (total == 0L) return 1.0
    def f1(c: Long): Double = {
      val tp = conf.getOrElse((c, c), 0L).toDouble
      val fp = classes.filter(_ != c).map(a => conf.getOrElse((a, c), 0L)).sum.toDouble
      val fn = classes.filter(_ != c).map(p => conf.getOrElse((c, p), 0L)).sum.toDouble
      if (tp == 0.0) 0.0 else 2 * tp / (2 * tp + fp + fn)
    }
    name.toUpperCase match {
      case "ACCURACY" =>
        classes.map(c => conf.getOrElse((c, c), 0L)).sum.toDouble / total
      case "F1_MACRO" => classes.map(f1).sum / classes.size
      case "F1_WEIGHTED" =>
        classes.map { c =>
          val support = classes.map(p => conf.getOrElse((c, p), 0L)).sum.toDouble
          support * f1(c)
        }.sum / total
      case other => throw new IllegalArgumentException(s"Unknown metric: $other")
    }
  }

  /** argmax_c margin_c as a pure expression over `features`. */
  private def predictExpr(classes: Seq[Long],
                          models: Map[Long, LogisticRegression.LrModel]) = {
    val scored = classes.map { c =>
      val m = models(c)
      struct(LogisticRegression.margin(col("features"), m.weights, m.bias).as("m"),
        lit(-c).as("negc"))
    }
    // array_max over (margin, -classId) structs: max margin, ties -> smaller class
    -array_max(array(scored: _*)).getField("negc")
  }

  /** (id, predictedClass) for every vertex with the feature property. */
  def predict(graph: PropertyGraph, featureProperty: String, model: NcModel): DataFrame =
    graph.vertices
      .select(col("id"), col(featureProperty).cast("array<double>").as("features"))
      .filter(col("features").isNotNull)
      .select(col("id"),
        predictExpr(model.classes, model.models).cast("long").as("predictedClass"))
}
