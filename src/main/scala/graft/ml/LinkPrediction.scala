package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.PropertyGraph

/** Link-prediction pipeline (reference: alpha/alpha-algo/src/main/java/org/
  * neo4j/gds/ml/linkmodels/LinkPredictionTrain.java + the pipeline procs
  * under `gds.alpha.ml.linkPrediction.*`): combine per-node property vectors
  * into per-pair link features, train a logistic model on existing edges
  * (positives) vs sampled non-edges (negatives), and score candidate pairs.
  *
  * Everything is expressed as joins + pure expressions:
  *  - feature combination is `zip_with` on the two endpoint vectors
  *    (HADAMARD / L2 / COSINE — the reference's LinkFeatureSteps);
  *  - negative sampling is a deterministic hash shuffle of endpoints with an
  *    anti-join against the edge table (no RNG state, resumable);
  *  - training delegates to [[LogisticRegression]] (driver-held tiny model,
  *    one codegen'd scan per iteration);
  *  - candidate scoring is a single select over any pair table; top-N via
  *    a global sort-limit (executors keep per-partition heaps of N).
  */
object LinkPrediction {

  sealed trait Combiner
  object Combiner {
    /** element-wise product (reference HadamardFeatureStep) */
    case object Hadamard extends Combiner
    /** element-wise squared difference (reference L2FeatureStep) */
    case object L2 extends Combiner
    /** [cosine similarity] — one-dim feature (reference CosineFeatureStep) */
    case object Cosine extends Combiner
  }

  final case class LinkPredictionConfig(
    combiner: Combiner = Combiner.Hadamard,
    negativeSamplingRatio: Double = 1.0,
    testFraction: Double = 0.25,
    seed: Long = 42L,
    lr: LogisticRegression.LrConfig = LogisticRegression.LrConfig(maxIterations = 60))

  final case class LinkModel(model: LogisticRegression.LrModel,
                             combiner: Combiner, dims: Int,
                             trainAccuracy: Double, testAccuracy: Double)

  def combine(a: Column, b: Column, c: Combiner): Column = c match {
    case Combiner.Hadamard => zip_with(a, b, (x, y) => x * y)
    case Combiner.L2       => zip_with(a, b, (x, y) => (x - y) * (x - y))
    case Combiner.Cosine   => array(graft.functions.Similarity.cosine(a, b))
  }

  /** (src, dst) pairs joined with endpoint vectors -> (src, dst, features). */
  def pairFeatures(vertices: DataFrame, pairs: DataFrame, property: String,
                   combiner: Combiner): DataFrame = {
    val va = vertices.select(col("id").as("src"),
      col(property).cast("array<double>").as("__fa"))
    val vb = vertices.select(col("id").as("dst"),
      col(property).cast("array<double>").as("__fb"))
    pairs.join(va, "src").join(vb, "dst")
      .withColumn("features", combine(col("__fa"), col("__fb"), combiner))
      .drop("__fa", "__fb")
  }

  /** Deterministic non-edge sample of ~`ratio * |E|` pairs. Scale shape:
    * reduce the vertex set to one representative per hash bucket (a
    * broadcast-sized table), pair each hash-sampled edge row with the
    * representative of a pseudo-random bucket, then anti-join the real
    * edges. No global sort/window, no RNG state — one broadcast join +
    * one anti-join regardless of graph size. */
  private def sampleNegatives(graph: PropertyGraph, ratio: Double, seed: Long): DataFrame = {
    val e = graph.edges.select("src", "dst")
    val buckets = 1 << 16
    // one representative vertex per bucket: ~65k rows, broadcastable
    val reps = graph.vertices
      .groupBy(pmod(xxhash64(col("id"), lit(seed + 1)), lit(buckets)).as("__b"))
      .agg(min(col("id")).as("dst"))
    // hash-sample edge rows at `ratio`, derive a pseudo-random bucket per row
    val keep = math.max(1L, math.min(1000L, (1000L * ratio).toLong))
    e.filter(pmod(xxhash64(col("src"), col("dst"), lit(seed + 2)), lit(1000L)) < keep)
      .select(col("src"),
        pmod(xxhash64(col("src"), col("dst"), lit(seed + 3)), lit(buckets)).as("__b"))
      .join(broadcast(reps), "__b")
      .select("src", "dst")
      .filter(col("src") =!= col("dst"))
      .distinct()
      .join(e, Seq("src", "dst"), "left_anti")
  }

  /** Train on the graph's own edges vs sampled non-edges; deterministic
    * hash split into train/test; report accuracy on both. */
  def train(graph: PropertyGraph, property: String,
            cfg: LinkPredictionConfig = LinkPredictionConfig()): LinkModel = {
    val pos = graph.edges.select("src", "dst").distinct().withColumn("y", lit(1.0))
    val neg = sampleNegatives(graph, cfg.negativeSamplingRatio, cfg.seed)
      .withColumn("y", lit(0.0))
    val all = pairFeatures(graph.vertices, pos.unionByName(neg), property, cfg.combiner)
      .withColumn("__split",
        (pmod(xxhash64(col("src"), col("dst"), lit(cfg.seed)), lit(1000L)))
          .cast("double") / 1000.0)
    val trainDf = all.filter(col("__split") >= cfg.testFraction).persist()
    val testDf  = all.filter(col("__split") < cfg.testFraction).persist()
    val dims = cfg.combiner match {
      case Combiner.Cosine => 1
      case _ => trainDf.select(size(col("features"))).first().getInt(0)
    }
    val model = LogisticRegression.train(trainDf, "features", "y", dims, cfg.lr)
    def acc(df: DataFrame): Double = {
      val p = LogisticRegression.predictProb(col("features"), model)
      val r = df.agg(
        sum(when((p >= 0.5) === (col("y") === 1.0), 1L).otherwise(0L)).as("ok"),
        count(lit(1)).as("n")).first()
      if (r.getLong(1) == 0L) 1.0 else r.getLong(0).toDouble / r.getLong(1)
    }
    val out = LinkModel(model, cfg.combiner, dims, acc(trainDf), acc(testDf))
    trainDf.unpersist(false); testDf.unpersist(false)
    out
  }

  /** Score candidate pairs; default candidates = distinct 2-hop pairs that
    * are not already edges (the standard "friend of a friend" generator —
    * one self-join, never all-pairs). */
  def predict(graph: PropertyGraph, model: LinkModel, property: String,
              topN: Int, candidates: Option[DataFrame] = None): DataFrame = {
    val e = graph.edges.select("src", "dst")
    val cand = candidates.getOrElse {
      e.as("a").join(e.as("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
        .join(e, Seq("src", "dst"), "left_anti")
    }
    pairFeatures(graph.vertices, cand, property, model.combiner)
      .withColumn("probability",
        LogisticRegression.predictProb(col("features"), model.model))
      .select("src", "dst", "probability")
      .orderBy(col("probability").desc, col("src"), col("dst"))
      .limit(topN)
  }
}
