package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{GraphOps, Orientation, PropertyGraph}

/** Similarity metric over neighbor sets. */
sealed trait SimilarityMetric
object SimilarityMetric {
  case object Jaccard extends SimilarityMetric
  case object Overlap extends SimilarityMetric
}

/** Reference config (algo/src/main/java/org/neo4j/gds/similarity/nodesim/
  * NodeSimilarityBaseConfig.java:31-96): degreeCutoff (min out-degree to
  * participate, default 1), similarityCutoff (default 1e-42 — excludes exact
  * zeros), topK per node (default 10, 0 = unlimited), topN global (0 = all).
  * Weighted Jaccard = Σ min(w) / Σ max(w). */
final case class NodeSimilarityConfig(
  orientation: Orientation = Orientation.Natural,
  metric: SimilarityMetric = SimilarityMetric.Jaccard,
  weighted: Boolean = false,
  degreeCutoff: Long = 1L,
  similarityCutoff: Double = 1e-42,
  topK: Int = 10,
  topN: Int = 0,
  /** Scale guard (graft extension, off by default = exact reference
    * semantics): cap on the in-degree of a shared-neighbor TARGET in the
    * pair-generating self-join. A target with in-degree d contributes
    * d·(d−1) candidate pairs, so one 10M-in-degree hub alone would emit
    * 10^14 pairs; with the cap, each hub contributes at most cap·(cap−1).
    * The kept in-neighbors are a deterministic hash-ordered sample
    * (xxhash64(src,dst)), so results are stable across runs/partitionings.
    * Approximation: intersections through capped hubs are undercounted
    * (similarity is underestimated, never overestimated — set sizes stay
    * exact); pairs that only share capped-out hub edges can be missed. */
  maxNeighborsPerTarget: Int = 0)

/** Node Similarity (reference: algo/src/main/java/org/neo4j/gds/similarity/
  * nodesim/NodeSimilarity.java): pairwise Jaccard/Overlap of out-neighbor
  * sets.
  *
  * Spark shape: a self-join of the (deduplicated) edge table on the shared
  * neighbor produces exactly the overlapping pairs — never the O(n²) pair
  * space; per-pair intersection sizes come out of one groupBy with map-side
  * combine; topK is a per-source window over the (already similarity-
  * filtered) pair set. When `similarityCutoff <= 0` the reference emits
  * zero-similarity pairs too — that genuinely requires the quadratic pair
  * space, so it is supported (for parity) but the cutoff default keeps the
  * scalable path.
  */
object NodeSimilarity {

  /** Returns (node1, node2, similarity) — both directions per pair when
    * topK > 0, like the reference's stream mode. */
  def run(graph: PropertyGraph, cfg: NodeSimilarityConfig = NodeSimilarityConfig()): DataFrame = {
    val edges = GraphOps.aggregateEdges(
      graph.orientedEdges(cfg.orientation), graft.core.EdgeAggregation.Single)
      .select(col("src"), col("dst"), col("weight"))

    val degrees = edges.groupBy("src")
      .agg(count(lit(1)).as("deg"), sum("weight").as("wsum"))
      .filter(col("deg") >= cfg.degreeCutoff)

    val filtered = edges.join(degrees.select("src"), "src")

    // Hub-target fan-out guard: bound the quadratic per-target pair blowup
    // BEFORE the self-join. Degrees/wsums above are computed pre-cap, so
    // set sizes stay exact and capping only undercounts intersections.
    // One window shuffle (dst-partitioned); sorting a hub's in-edges in one
    // task is linear-log — vs the d² pair fan-out it prevents.
    val pairSide =
      if (cfg.maxNeighborsPerTarget > 0) {
        val w = Window.partitionBy("dst").orderBy(xxhash64(col("src"), col("dst")))
        filtered.withColumn("__rk", row_number().over(w))
          .filter(col("__rk") <= cfg.maxNeighborsPerTarget).drop("__rk")
      } else filtered

    // Pairs sharing at least one neighbor + their intersection weight.
    val a = pairSide.select(col("src").as("n1"), col("dst"), col("weight").as("w1"))
    val b = pairSide.select(col("src").as("n2"), col("dst"), col("weight").as("w2"))
    val interCol =
      if (cfg.weighted) sum(least(col("w1"), col("w2")))
      else count(lit(1)).cast("double")
    val inter = a.join(b, Seq("dst")).filter(col("n1") =!= col("n2"))
      .groupBy("n1", "n2").agg(interCol.as("inter"))

    val sizeCol = if (cfg.weighted) col("wsum") else col("deg").cast("double")
    val d1 = degrees.select(col("src").as("n1"), sizeCol.as("s1"))
    val d2 = degrees.select(col("src").as("n2"), sizeCol.as("s2"))
    val simCol = cfg.metric match {
      case SimilarityMetric.Jaccard => col("inter") / (col("s1") + col("s2") - col("inter"))
      case SimilarityMetric.Overlap => col("inter") / least(col("s1"), col("s2"))
    }
    val overlapping = inter.join(d1, "n1").join(d2, "n2")
      .select(col("n1"), col("n2"), simCol.as("similarity"))

    // Zero-similarity pairs (cutoff <= 0 — reference parity; quadratic in the
    // number of participating nodes, small-graph only).
    val withZeros =
      if (cfg.similarityCutoff <= 0.0) {
        val srcs = degrees.select(col("src"))
        val allPairs = srcs.select(col("src").as("n1"))
          .crossJoin(srcs.select(col("src").as("n2")))
          .filter(col("n1") =!= col("n2"))
        val zeros = allPairs.join(overlapping.select("n1", "n2"), Seq("n1", "n2"), "left_anti")
          .select(col("n1"), col("n2"), lit(0.0).as("similarity"))
        overlapping.unionByName(zeros)
      } else overlapping

    val cut = withZeros.filter(col("similarity") >= cfg.similarityCutoff)

    val topKed =
      if (cfg.topK > 0) {
        val w = Window.partitionBy("n1").orderBy(desc("similarity"), col("n2"))
        cut.withColumn("__rk", row_number().over(w))
          .filter(col("__rk") <= cfg.topK).drop("__rk")
      } else cut

    if (cfg.topN > 0)
      topKed.filter(col("n1") < col("n2"))
        .orderBy(desc("similarity"), col("n1"), col("n2"))
        .limit(cfg.topN)
    else topKed
  }
}
