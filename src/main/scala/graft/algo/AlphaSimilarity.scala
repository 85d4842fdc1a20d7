package graft.algo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Similarity

/** The alpha similarity PROC family — `gds.alpha.similarity.{cosine,
  * euclidean,pearson,overlap}.{stream,stats}` (reference: alpha/alpha-proc/
  * src/main/java/org/neo4j/gds/similarity/ proc classes over
  * alpha/alpha-algo/.../impl/similarity/{WeightedSimilarityAlgorithm,
  * CategoricalSimilarityAlgorithm}.java): exact pairwise similarity over a
  * per-node vector (weighted metrics) or category list (overlap), with the
  * reference's `topK` / `similarityCutoff` knobs.
  *
  * Semantics mirrored from the reference:
  *  - `topK == 0` streams each unordered pair once (`node1 < node2`);
  *  - `topK > 0` streams every node's K nearest (both directions, so a pair
  *    can appear from each endpoint), K selected per `node1`;
  *  - EUCLIDEAN streams the DISTANCE (`SimilarityResult.squareRooted()`,
  *    EuclideanAlgorithm.java:44-47) — nearest = smallest, and
  *    `similarityCutoff` is an upper bound; all other metrics are
  *    descending with `similarityCutoff` a lower bound (cutoff < 0 = off);
  *  - ties break toward the smaller `node2` (the reference's stable
  *    TopKConsumer insertion order).
  *
  * Scale shape: pairwise-exact is inherently quadratic — identical to the
  * reference, which materializes all decoded pairs per source. This proc is
  * the EXACT tool for bounded vector sets (the reference holds the whole
  * input in memory too); the linear-at-scale paths are [[Knn]] (NN-descent)
  * and the LSH/IVF pipelines in `graft.ops.Ann`. The join below broadcasts
  * the smaller side automatically at fixture sizes and degrades to a
  * shuffled nested-loop join above that; per-source top-K is one window
  * over the (node1-partitioned) pair set — no global sort.
  */
object AlphaSimilarity {

  sealed trait Metric
  object Metric {
    /** dense-vector metrics (reference WeightedSimilarityAlgorithm) */
    case object Cosine    extends Metric
    case object Euclidean extends Metric
    case object Pearson   extends Metric
    /** category-list metric (reference CategoricalSimilarityAlgorithm) */
    case object Overlap   extends Metric
  }

  final case class SimConfig(
    topK: Int = 0,
    similarityCutoff: Double = -1.0)

  private def simColumn(m: Metric, a: Column, b: Column): Column = m match {
    case Metric.Cosine    => Similarity.cosine(a, b)
    case Metric.Euclidean => Similarity.euclideanDistance(a, b)
    case Metric.Pearson   => Similarity.pearson(a, b)
    case Metric.Overlap   => Similarity.overlap(a, b)
  }

  /** Pairwise similarity of `data(idCol, vecCol)` -> (node1, node2,
    * similarity). */
  def stream(data: DataFrame, idCol: String, vecCol: String, metric: Metric,
             cfg: SimConfig = SimConfig()): DataFrame = {
    val rows = data.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("node1"), col(vecCol).as("__v1"))
    val other = rows.select(col("node1").as("node2"), col("__v1").as("__v2"))
    val pairPred =
      if (cfg.topK > 0) col("node1") =!= col("node2") else col("node1") < col("node2")
    val sims = rows.join(other, pairPred)
      .select(col("node1"), col("node2"),
        simColumn(metric, col("__v1"), col("__v2")).as("similarity"))
    val cut =
      if (cfg.similarityCutoff < 0) sims
      else if (metric == Metric.Euclidean)
        sims.filter(col("similarity") <= cfg.similarityCutoff)
      else sims.filter(col("similarity") >= cfg.similarityCutoff)
    if (cfg.topK <= 0) cut
    else {
      import org.apache.spark.sql.expressions.Window
      val order =
        if (metric == Metric.Euclidean) Seq(col("similarity").asc, col("node2").asc)
        else Seq(col("similarity").desc, col("node2").asc)
      cut.withColumn("__r",
          row_number().over(Window.partitionBy("node1").orderBy(order: _*)))
        .filter(col("__r") <= cfg.topK)
        .drop("__r")
    }
  }
}
