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
    lr: LogisticRegression.LrConfig = LogisticRegression.LrConfig(maxIterations = 60))

  final case class NcModel(classes: Seq[Long],
                           models: Map[Long, LogisticRegression.LrModel],
                           trainAccuracy: Double, testAccuracy: Double)

  /** Train on vertices where `labelCol` is non-null. */
  def train(graph: PropertyGraph, featureProperty: String, labelCol: String,
            cfg: NcConfig = NcConfig()): NcModel = {
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
    val trainDf = labeled.filter(col("__split") >= cfg.testFraction).persist()
    val testDf  = labeled.filter(col("__split") < cfg.testFraction).persist()

    val models = classes.map { c =>
      val binary = trainDf.withColumn("y", when(col("cls") === c, 1.0).otherwise(0.0))
      c -> LogisticRegression.train(binary, "features", "y", dims, cfg.lr)
    }.toMap

    def acc(df: DataFrame): Double = {
      val pred = predictExpr(classes, models)
      val r = df.agg(sum(when(pred === col("cls"), 1L).otherwise(0L)).as("ok"),
        count(lit(1)).as("n")).first()
      if (r.getLong(1) == 0L) 1.0 else r.getLong(0).toDouble / r.getLong(1)
    }
    val out = NcModel(classes, models, acc(trainDf), acc(testDf))
    labeled.unpersist(false); trainDf.unpersist(false); testDf.unpersist(false)
    out
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
