package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed binary logistic regression by full-batch gradient descent —
  * the training core of the reference's ML pipelines (reference:
  * alpha/alpha-algo/src/main/java/org/neo4j/gds/ml/core/functions/ and
  * .../ml/linkmodels/logisticregression/LinkLogisticRegressionTrain.java,
  * which likewise runs batched gradient descent over a tiny dense weight
  * vector).
  *
  * Spark shape (the only one that survives 100 TB of training rows): the
  * MODEL is tiny and lives on the driver; the DATA never moves. Each
  * iteration is ONE whole-stage-codegen'd aggregation over the feature
  * table — `d+2` partial sums (per-dimension gradient, bias gradient, loss)
  * computed map-side and reduced — so the per-iteration cost is a single
  * scan with no shuffle beyond the final scalar reduce, and adding
  * executors divides the scan time. No per-row UDFs: the dot product is a
  * `zip_with`/`aggregate` expression over the broadcast-as-literal weights.
  */
object LogisticRegression {

  final case class LrConfig(
    maxIterations: Int = 100,
    learningRate: Double = 0.5,
    l2Penalty: Double = 0.0,
    tolerance: Double = 1e-7,
    /** Training sets at or below this many rows run the same full-batch GD
      * driver-locally — each distributed iteration is one scan-agg whose
      * job latency dwarfs the math at fixture sizes. Gradients/losses agree
      * with the distributed scan up to FP summation order (the update
      * formulas are identical); -1 forces distributed. */
    localTailThreshold: Long = 100000L)

  final case class LrModel(weights: Array[Double], bias: Double,
                           losses: Seq[Double]) {
    def dims: Int = weights.length
  }

  private def sigmoid(m: Column): Column = lit(1.0) / (lit(1.0) + exp(-m))

  /** margin = w·x + b with weights as a literal array (broadcast in the
    * task binary — the model is a few hundred bytes). */
  def margin(features: Column, weights: Array[Double], bias: Double): Column = {
    val w = array(weights.map(lit): _*)
    aggregate(zip_with(features, w, (x, wi) => x * wi), lit(bias), (a, v) => a + v)
  }

  def predictProb(features: Column, model: LrModel): Column =
    sigmoid(margin(features, model.weights, model.bias))

  /** Train on (featuresCol: array<double>, labelCol: 0/1). One distributed
    * aggregation per iteration; converges when the relative loss improvement
    * drops below `tolerance` (the reference's stop criterion). */
  def train(data: DataFrame, featuresCol: String, labelCol: String, dims: Int,
            cfg: LrConfig = LrConfig()): LrModel =
    trainMany(data, featuresCol, labelCol, dims, Seq(cfg)).head

  /** Train every candidate config on the SAME training set with the input
    * scanned/collected once (the reference's model-selection loop trains all
    * candidates on one split — LinkPredictionTrain.java's trainOnCandidates).
    * One persist+count decides the local tail for all candidates; the local
    * tail collects once and fits each candidate over the shared row array. */
  def trainMany(data: DataFrame, featuresCol: String, labelCol: String,
                dims: Int, cfgs: Seq[LrConfig]): Seq[LrModel] = {
    require(cfgs.nonEmpty, "trainMany needs at least one candidate")
    val df = data.select(
        col(featuresCol).cast("array<double>").as("x"),
        col(labelCol).cast("double").as("y"))
      .persist()
    val n = df.count().toDouble
    require(n > 0, "empty training set")
    val out = cfgs.map { cfg =>
      if (cfg.localTailThreshold >= 0L && n <= cfg.localTailThreshold) null
      else trainDistributed(df, dims, n, cfg)
    }
    val models =
      if (out.forall(_ != null)) out
      else {
        val rows = df.collect().map(r => (r.getSeq[Double](0).toArray, r.getDouble(1)))
        cfgs.zip(out).map { case (cfg, m) =>
          if (m != null) m else trainLocal(rows, dims, cfg)
        }
      }
    df.unpersist(false)
    models
  }

  private def trainDistributed(df: DataFrame, dims: Int, n: Double,
                               cfg: LrConfig): LrModel = {

    var w = new Array[Double](dims)
    var b = 0.0
    val losses = scala.collection.mutable.ArrayBuffer.empty[Double]
    var it = 0
    var done = false
    while (it < cfg.maxIterations && !done) {
      // clamp the margin so exp/log stay finite (ANSI mode is on)
      val m = least(greatest(margin(col("x"), w, b), lit(-30.0)), lit(30.0))
      val p = sigmoid(m)
      val err = (p - col("y")).as("err")
      val withErr = df.select(col("x"), col("y"), err, m.as("m"))
      // d+2 partial-aggregated sums in ONE scan: grad_i, grad_bias, loss
      val gradCols = (0 until dims).map(i =>
        sum(col("err") * element_at(col("x"), i + 1)).as(s"g$i"))
      val extras = Seq(sum(col("err")).as("gb"),
        // logloss in the overflow-safe softplus form:
        //   log(1+e^m) - y*m  ==  -[y log p + (1-y) log(1-p)]
        sum(log1p(exp(col("m"))) - col("y") * col("m")).as("loss"))
      val row = withErr.agg(gradCols.head, (gradCols.tail ++ extras): _*).first()
      val loss = row.getDouble(dims + 1) / n +
        0.5 * cfg.l2Penalty * w.map(x => x * x).sum
      losses += loss
      val newW = Array.tabulate(dims)(i =>
        w(i) - cfg.learningRate * (row.getDouble(i) / n + cfg.l2Penalty * w(i)))
      b -= cfg.learningRate * row.getDouble(dims) / n
      w = newW
      it += 1
      if (losses.length >= 2) {
        val prev = losses(losses.length - 2)
        done = math.abs(prev - loss) <= cfg.tolerance * math.max(math.abs(prev), 1e-12)
      }
    }
    LrModel(w, b, losses.toSeq)
  }

  /** Train directly on driver-held rows — the local tail exposed for
    * callers that already collected a (bounded) training set, e.g. the
    * cross-validation selection loop in [[NodeClassification]]. */
  def trainOnRows(rows: Array[(Array[Double], Double)], dims: Int,
                  cfg: LrConfig): LrModel = {
    require(rows.nonEmpty, "empty training set")
    trainLocal(rows, dims, cfg)
  }

  /** Driver-local full-batch GD — the same margin fold (bias-seeded,
    * ascending dims), ±30 clamp, softplus loss, update and stop formulas
    * as the distributed scan (MlSpec asserts agreement). */
  private def trainLocal(rows: Array[(Array[Double], Double)], dims: Int,
                         cfg: LrConfig): LrModel = {
    val n = rows.length.toDouble
    var w = new Array[Double](dims)
    var b = 0.0
    val losses = scala.collection.mutable.ArrayBuffer.empty[Double]
    var it = 0
    var done = false
    while (it < cfg.maxIterations && !done) {
      val grad = new Array[Double](dims)
      var gb   = 0.0
      var lossSum = 0.0
      rows.foreach { case (x, y) =>
        var m = b
        var i = 0
        while (i < dims) { m += x(i) * w(i); i += 1 }
        m = math.min(math.max(m, -30.0), 30.0)
        val p   = 1.0 / (1.0 + math.exp(-m))
        val err = p - y
        i = 0
        while (i < dims) { grad(i) += err * x(i); i += 1 }
        gb += err
        lossSum += math.log1p(math.exp(m)) - y * m
      }
      val loss = lossSum / n + 0.5 * cfg.l2Penalty * w.map(x => x * x).sum
      losses += loss
      val newW = Array.tabulate(dims)(i =>
        w(i) - cfg.learningRate * (grad(i) / n + cfg.l2Penalty * w(i)))
      b -= cfg.learningRate * gb / n
      w = newW
      it += 1
      if (losses.length >= 2) {
        val prev = losses(losses.length - 2)
        done = math.abs(prev - loss) <= cfg.tolerance * math.max(math.abs(prev), 1e-12)
      }
    }
    LrModel(w, b, losses.toSeq)
  }
}
