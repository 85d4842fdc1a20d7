package graft.api

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.algo._
import graft.core._

/** The reference's four execution modes (reference: doc/asciidoc/
  * common-usage/running-algorihms.adoc; proc/common/src/main/java/org/neo4j/
  * gds/{Stream,Stats,MutateProperty,Write}Proc.java):
  *
  *  - stream  → the result DataFrame itself
  *  - stats   → one summary row with count + histogram percentiles
  *             (p50/p75/p90/p95/p99/p999, min/max/mean — the reference's
  *             AbstractCommunityResultBuilder histogram fields)
  *  - mutate  → attach the result as a vertex property of the catalog graph
  *  - write   → persist to a table directory (parquet, snapshot-committed)
  */
object Modes {

  /** Percentile summary of `valueCol` — exact percentiles (the reference
    * uses HdrHistogram approximations; exact is strictly stronger and
    * identical on fixture scales). */
  def stats(result: DataFrame, valueCol: String): Row = {
    val v = col(valueCol).cast("double")
    result.agg(
      count(v).as("count"),
      min(v).as("min"), max(v).as("max"), avg(v).as("mean"),
      expr(s"percentile($valueCol, 0.5)").as("p50"),
      expr(s"percentile($valueCol, 0.75)").as("p75"),
      expr(s"percentile($valueCol, 0.9)").as("p90"),
      expr(s"percentile($valueCol, 0.95)").as("p95"),
      expr(s"percentile($valueCol, 0.99)").as("p99"),
      expr(s"percentile($valueCol, 0.999)").as("p999")
    ).first()
  }

  /** Community-stats variant: component/label sizes histogram. */
  def communityStats(result: DataFrame, communityCol: String): Row = {
    val sizes = result.groupBy(communityCol).agg(count(lit(1)).as("size"))
    stats(sizes, "size")
  }

  def write(result: DataFrame, dir: String): Unit =
    graft.io.SnapshotStore.commit(result, dir, Map("kind" -> "algo-result"))
}

/** User-facing session facade mirroring the reference's procedure surface
  * as a Scala API: `gds.graph.create`, `gds.pageRank.stream`, ... */
final class Gds(val spark: SparkSession) {
  val catalog = new GraphCatalog

  object graph {
    def create(name: String, vertices: DataFrame, edges: DataFrame,
               aggregation: EdgeAggregation = EdgeAggregation.None): PropertyGraph =
      catalog.create(name, PropertyGraph(vertices, edges), aggregation)
    def drop(name: String): Boolean  = catalog.drop(name)
    def exists(name: String): Boolean = catalog.exists(name)
    def list(): Seq[String]          = catalog.list()
    def subgraph(name: String, newName: String,
                 vertexPredicate: String = "true", edgePredicate: String = "true"): PropertyGraph =
      catalog.create(newName, catalog.get(name).subgraph(vertexPredicate, edgePredicate))
    /** `gds.graph.create.cypher` analogue: arbitrary SQL projections define
      * the vertex/edge tables (reference: proc/catalog/.../GraphCreateProc
      * .java:115-131 + CypherFactory — query-based projection). The SQL runs
      * against whatever tables/views are registered in the Spark session;
      * vertexSql must yield (id, ...), edgeSql (src, dst[, weight, ...]). */
    def createFromSql(name: String, vertexSql: String, edgeSql: String,
                      aggregation: EdgeAggregation = EdgeAggregation.None): PropertyGraph =
      catalog.create(name, PropertyGraph(spark.sql(vertexSql), spark.sql(edgeSql)), aggregation)
    def streamNodeProperties(name: String, properties: Seq[String]): DataFrame =
      catalog.get(name).vertices.select("id", properties: _*)
    /** `gds.graph.streamNodeProperty` (singular proc form). */
    def streamNodeProperty(name: String, property: String): DataFrame =
      streamNodeProperties(name, Seq(property))
    /** `gds.graph.streamRelationshipProperty` (singular proc form). */
    def streamRelationshipProperty(name: String, property: String): DataFrame =
      streamRelationshipProperties(name, Seq(property))
    /** `gds.graph.streamRelationshipProperties`: relationship triples with
      * the requested property columns (reference: proc/catalog/.../
      * GraphStreamRelationshipPropertiesProc.java). */
    def streamRelationshipProperties(name: String, properties: Seq[String]): DataFrame =
      catalog.get(name).edges.select((Seq("src", "dst") ++ properties).map(col): _*)
    def writeNodeProperties(name: String, dir: String, properties: Seq[String]): Unit =
      Modes.write(catalog.get(name).vertices.select("id", properties: _*), dir)
    def removeNodeProperty(name: String, property: String): PropertyGraph =
      catalog.removeNodeProperty(name, property)
    def writeRelationship(name: String, relType: String, result: DataFrame): PropertyGraph =
      catalog.addRelationships(name, relType, result)
    def deleteRelationships(name: String, relType: String): PropertyGraph =
      catalog.deleteRelationships(name, relType)
    /** `gds.beta.graph.generate`: deterministic seeded random graph with
      * the reference's UNIFORM/RANDOM/POWER_LAW distributions and property
      * producers (graft.io.GraphGenerate), registered in the catalog. */
    def generate(name: String, nodeCount: Long, averageDegree: Long,
                 distribution: graft.io.GraphGenerate.Distribution =
                   graft.io.GraphGenerate.Distribution.Uniform,
                 seed: Long = 42L,
                 properties: Seq[graft.io.GraphGenerate.PropertyProducer] = Seq.empty): PropertyGraph =
      catalog.create(name, graft.io.GraphGenerate.graph(
        spark, nodeCount, averageDegree, distribution, seed, properties))
    /** Persist a catalog graph bucketed by its join keys (edges by src,
      * vertices by id) — subsequent loads scan pre-distributed tables and
      * src-keyed plans skip the initial exchange (graft.io.BucketedGraphStore). */
    def exportBucketed(name: String, dir: String, buckets: Int): Unit =
      graft.io.BucketedGraphStore.save(spark, catalog.get(name), name, dir, buckets)
    def importBucketed(name: String): PropertyGraph =
      catalog.create(name, graft.io.BucketedGraphStore.load(spark, name))
  }

  /** Model catalog surface (reference: `gds.beta.model.list/exists/drop`,
    * `gds.alpha.model.store/load` — model-operation-references.adoc). */
  object model {
    import graft.ml.ModelCatalog
    def set(name: String, m: AnyRef, meta: Map[String, String] = Map.empty): ModelCatalog.ModelInfo =
      ModelCatalog.set(name, m, meta)
    def list(): Seq[ModelCatalog.ModelInfo] = ModelCatalog.list()
    def exists(name: String): Boolean       = ModelCatalog.exists(name)
    def drop(name: String): Boolean         = ModelCatalog.drop(name)
    def get[M <: AnyRef](name: String): M   = ModelCatalog.get[M](name)
    def store(name: String, dir: String): graft.io.SnapshotStore.Snapshot =
      ModelCatalog.store(spark, name, dir)
    def load(name: String, dir: String): ModelCatalog.ModelInfo =
      ModelCatalog.load(spark, name, dir)
    /** `gds.alpha.model.delete`: remove the STORED snapshots of `name` from
      * `dir` (the in-catalog registration, if any, is untouched — that is
      * `drop`, matching the reference's delete/drop split). */
    def delete(name: String, dir: String): Boolean =
      ModelCatalog.deleteStored(name, dir)
  }

  object pageRank {
    def stream(name: String, cfg: PageRankConfig = PageRankConfig()): DataFrame =
      PageRank.run(catalog.get(name), cfg).scores
    def stats(name: String, cfg: PageRankConfig = PageRankConfig()): Row =
      Modes.stats(stream(name, cfg), "score")
    def mutate(name: String, property: String, cfg: PageRankConfig = PageRankConfig()): PropertyGraph =
      catalog.mutateNodeProperty(name, property, stream(name, cfg))
    def write(name: String, dir: String, cfg: PageRankConfig = PageRankConfig()): Unit =
      Modes.write(stream(name, cfg), dir)
    def estimate(name: String): EstimateResult = Gds.this.estimate.pageRank(name)
  }

  object articleRank {
    def stream(name: String, cfg: PageRankConfig = PageRankConfig()): DataFrame =
      PageRank.articleRank(catalog.get(name), cfg).scores
    def stats(name: String, cfg: PageRankConfig = PageRankConfig()): Row =
      Modes.stats(stream(name, cfg), "score")
    def mutate(name: String, property: String, cfg: PageRankConfig = PageRankConfig()): PropertyGraph =
      catalog.mutateNodeProperty(name, property, stream(name, cfg))
    def write(name: String, dir: String, cfg: PageRankConfig = PageRankConfig()): Unit =
      Modes.write(stream(name, cfg), dir)
  }

  object eigenvector {
    def stream(name: String, cfg: PageRankConfig = PageRankConfig()): DataFrame =
      Eigenvector.run(catalog.get(name), cfg).scores
    def stats(name: String, cfg: PageRankConfig = PageRankConfig()): Row =
      Modes.stats(stream(name, cfg), "score")
    def mutate(name: String, property: String, cfg: PageRankConfig = PageRankConfig()): PropertyGraph =
      catalog.mutateNodeProperty(name, property, stream(name, cfg))
    def write(name: String, dir: String, cfg: PageRankConfig = PageRankConfig()): Unit =
      Modes.write(stream(name, cfg), dir)
  }

  object wcc {
    def stream(name: String, cfg: WccConfig = WccConfig()): DataFrame =
      Wcc.run(catalog.get(name), cfg).components
    def stats(name: String, cfg: WccConfig = WccConfig()): Row =
      Modes.communityStats(stream(name, cfg), "componentId")
    def mutate(name: String, property: String, cfg: WccConfig = WccConfig()): PropertyGraph =
      catalog.mutateNodeProperty(name, property, stream(name, cfg))
    def write(name: String, dir: String, cfg: WccConfig = WccConfig()): Unit =
      Modes.write(stream(name, cfg), dir)
    def estimate(name: String): EstimateResult = Gds.this.estimate.wcc(name)
  }

  object labelPropagation {
    def stream(name: String, cfg: LpConfig = LpConfig()): DataFrame =
      LabelPropagation.run(catalog.get(name), cfg).labels
    def stats(name: String, cfg: LpConfig = LpConfig()): Row =
      Modes.communityStats(stream(name, cfg), "label")
    def mutate(name: String, property: String, cfg: LpConfig = LpConfig()): PropertyGraph =
      catalog.mutateNodeProperty(name, property, stream(name, cfg))
    def write(name: String, dir: String, cfg: LpConfig = LpConfig()): Unit =
      Modes.write(stream(name, cfg), dir)
    def estimate(name: String): EstimateResult = Gds.this.estimate.labelPropagation(name)
  }

  object triangleCount {
    def stream(name: String, cfg: TriangleCountConfig = TriangleCountConfig()): DataFrame =
      TriangleCount.run(catalog.get(name), cfg).localTriangles
    def stats(name: String, cfg: TriangleCountConfig = TriangleCountConfig()): (Long, Row) = {
      val r = TriangleCount.run(catalog.get(name), cfg)
      (r.globalTriangles, Modes.stats(r.localTriangles, "triangles"))
    }
    def mutate(name: String, property: String, cfg: TriangleCountConfig = TriangleCountConfig()): PropertyGraph =
      catalog.mutateNodeProperty(name, property, stream(name, cfg))
    def write(name: String, dir: String, cfg: TriangleCountConfig = TriangleCountConfig()): Unit =
      Modes.write(stream(name, cfg), dir)
    def estimate(name: String): EstimateResult = Gds.this.estimate.triangleCount(name)
  }

  object localClusteringCoefficient {
    def stream(name: String): DataFrame =
      TriangleCount.localClusteringCoefficient(catalog.get(name))._1
    def stats(name: String): (Double, Row) = {
      val (coeffs, avg) = TriangleCount.localClusteringCoefficient(catalog.get(name))
      (avg, Modes.stats(coeffs, "coefficient"))
    }
    def mutate(name: String, property: String): PropertyGraph =
      catalog.mutateNodeProperty(name, property, stream(name))
    def write(name: String, dir: String): Unit = Modes.write(stream(name), dir)
  }

  object degree {
    def stream(name: String, orientation: Orientation = Orientation.Natural,
               weighted: Boolean = false): DataFrame =
      DegreeCentrality.run(catalog.get(name), orientation, weighted)
    def stats(name: String, orientation: Orientation = Orientation.Natural,
              weighted: Boolean = false): Row =
      Modes.stats(stream(name, orientation, weighted), "score")
    def mutate(name: String, property: String,
               orientation: Orientation = Orientation.Natural,
               weighted: Boolean = false): PropertyGraph =
      catalog.mutateNodeProperty(name, property, stream(name, orientation, weighted))
    def write(name: String, dir: String,
              orientation: Orientation = Orientation.Natural,
              weighted: Boolean = false): Unit =
      Modes.write(stream(name, orientation, weighted), dir)
  }

  object nodeSimilarity {
    def stream(name: String, cfg: NodeSimilarityConfig = NodeSimilarityConfig()): DataFrame =
      NodeSimilarity.run(catalog.get(name), cfg)
    def stats(name: String, cfg: NodeSimilarityConfig = NodeSimilarityConfig()): Row =
      Modes.stats(stream(name, cfg), "similarity")
    /** `gds.nodeSimilarity.mutate`: the similarity pairs become NEW
      * relationships of `relType` with the similarity as `weight` — the
      * reference's mutateRelationshipType/mutateProperty composition idiom
      * (proc/similarity/.../NodeSimilarityMutateProc.java), enabling
      * downstream algorithms to run over the similarity graph. */
    def mutate(name: String, relType: String,
               cfg: NodeSimilarityConfig = NodeSimilarityConfig()): PropertyGraph =
      catalog.addRelationships(name, relType, stream(name, cfg)
        .select(col("n1").as("src"), col("n2").as("dst"),
          col("similarity").as("weight")))
    def write(name: String, dir: String,
              cfg: NodeSimilarityConfig = NodeSimilarityConfig()): Unit =
      Modes.write(stream(name, cfg), dir)
    def estimate(name: String,
                 cfg: NodeSimilarityConfig = NodeSimilarityConfig()): EstimateResult =
      Gds.this.estimate.nodeSimilarity(name, cfg)
  }

  object louvain {
    def stream(name: String, cfg: LouvainConfig = LouvainConfig()): DataFrame =
      Louvain.run(catalog.get(name), cfg).communities
    def stats(name: String, cfg: LouvainConfig = LouvainConfig()): (Double, Row) = {
      val r = Louvain.run(catalog.get(name), cfg)
      (r.modularity, Modes.communityStats(r.communities, "communityId"))
    }
    def mutate(name: String, property: String, cfg: LouvainConfig = LouvainConfig()): PropertyGraph =
      catalog.mutateNodeProperty(name, property, stream(name, cfg))
    def write(name: String, dir: String, cfg: LouvainConfig = LouvainConfig()): Unit =
      Modes.write(stream(name, cfg), dir)
    def estimate(name: String): EstimateResult = Gds.this.estimate.louvain(name)
  }

  /** gds.beta.modularityOptimization: one Louvain level of local moves. */
  object modularityOptimization {
    def stream(name: String, cfg: LouvainConfig = LouvainConfig(maxLevels = 1)): DataFrame =
      Louvain.run(catalog.get(name), cfg.copy(maxLevels = 1)).communities
    def stats(name: String, cfg: LouvainConfig = LouvainConfig(maxLevels = 1)): Double =
      Louvain.run(catalog.get(name), cfg.copy(maxLevels = 1)).modularity
  }

  object betweenness {
    def stream(name: String, sources: Option[DataFrame] = None,
               orientation: Orientation = Orientation.Natural): DataFrame =
      MsBfs.betweenness(catalog.get(name), sources, orientation)
    def stats(name: String): Row = Modes.stats(stream(name), "centrality")
    def mutate(name: String, property: String): PropertyGraph =
      catalog.mutateNodeProperty(name, property, stream(name))
    def write(name: String, dir: String): Unit = Modes.write(stream(name), dir)
    def estimate(name: String): EstimateResult = Gds.this.estimate.betweenness(name)
  }

  object closeness {
    def stream(name: String, wassermanFaust: Boolean = false): DataFrame =
      MsBfs.closeness(catalog.get(name), wassermanFaust = wassermanFaust)
    def stats(name: String, wassermanFaust: Boolean = false): Row =
      Modes.stats(stream(name, wassermanFaust), "centrality")
    def mutate(name: String, property: String, wassermanFaust: Boolean = false): PropertyGraph =
      catalog.mutateNodeProperty(name, property, stream(name, wassermanFaust))
    def write(name: String, dir: String, wassermanFaust: Boolean = false): Unit =
      Modes.write(stream(name, wassermanFaust), dir)
    object harmonic {
      def stream(name: String): DataFrame = MsBfs.harmonic(catalog.get(name))
      def stats(name: String): Row = Modes.stats(stream(name), "centrality")
      def mutate(name: String, property: String): PropertyGraph =
        catalog.mutateNodeProperty(name, property, stream(name))
      def write(name: String, dir: String): Unit = Modes.write(stream(name), dir)
    }
  }

  object scc {
    def stream(name: String): DataFrame = Scc.run(catalog.get(name))
    def stats(name: String): Row = Modes.communityStats(stream(name), "sccId")
    def mutate(name: String, property: String): PropertyGraph =
      catalog.mutateNodeProperty(name, property, stream(name))
    def write(name: String, dir: String): Unit = Modes.write(stream(name), dir)
  }

  object shortestPath {
    /** mutate/write parity with the reference's path procs (proc/
      * path-finding/.../ShortestPath{Dijkstra,Yens,AStar}{Mutate,Write}
      * Proc.java): each found path becomes ONE relationship
      * (source)-[relType {weight = totalCost}]->(target). */
    object dijkstra {
      def stream(name: String, source: Long, target: Long): DataFrame =
        ShortestPaths.dijkstra(catalog.get(name), source, target)
      def mutate(name: String, relType: String, source: Long, target: Long): PropertyGraph =
        catalog.addRelationships(name, relType, stream(name, source, target)
          .select(col("sourceNode").as("src"), col("targetNode").as("dst"),
            col("totalCost").as("weight")))
      def write(name: String, dir: String, source: Long, target: Long): Unit =
        Modes.write(stream(name, source, target), dir)
    }
    object yens {
      def stream(name: String, source: Long, target: Long, k: Int): DataFrame =
        ShortestPaths.yens(catalog.get(name), source, target, k)
      /** One relationship per accepted path; the path INDEX rides along so
        * the k alternatives stay distinguishable after projection. */
      def mutate(name: String, relType: String, source: Long, target: Long, k: Int): PropertyGraph =
        catalog.addRelationships(name, relType, stream(name, source, target, k)
          .select(lit(source).as("src"), lit(target).as("dst"),
            col("totalCost").as("weight"), col("index")))
      def write(name: String, dir: String, source: Long, target: Long, k: Int): Unit =
        Modes.write(stream(name, source, target, k), dir)
    }
    object astar {
      def stream(name: String, source: Long, target: Long,
                 latCol: String = "latitude", lonCol: String = "longitude"): DataFrame =
        ShortestPaths.astar(catalog.get(name), source, target, latCol, lonCol)
      def mutate(name: String, relType: String, source: Long, target: Long,
                 latCol: String = "latitude", lonCol: String = "longitude"): PropertyGraph =
        catalog.addRelationships(name, relType, stream(name, source, target, latCol, lonCol)
          .select(col("sourceNode").as("src"), col("targetNode").as("dst"),
            col("totalCost").as("weight")))
      def write(name: String, dir: String, source: Long, target: Long,
                latCol: String = "latitude", lonCol: String = "longitude"): Unit =
        Modes.write(stream(name, source, target, latCol, lonCol), dir)
    }
  }

  object allShortestPaths {
    /** Single-source variant with full path tracking. */
    def stream(name: String, source: Long): DataFrame =
      ShortestPaths.dijkstraSingleSource(catalog.get(name), source)
    /** All-pairs distance stream (gds.alpha.allShortestPaths.stream) via
      * batched multi-source BFS; restrict `sources` to bound output size. */
    def streamAllPairs(name: String, sources: Option[DataFrame] = None,
                       orientation: Orientation = Orientation.Natural): DataFrame =
      MsBfs.allShortestPaths(catalog.get(name), sources, orientation)
    /** Weighted all-pairs distance stream (the reference's
      * WeightedAllShortestPaths): all sources relax in the same superstep. */
    def streamAllPairsWeighted(name: String, sources: Option[DataFrame] = None,
                               orientation: Orientation = Orientation.Natural): DataFrame =
      ShortestPaths.allShortestPathsWeighted(catalog.get(name), sources, orientation)
    def write(name: String, dir: String, source: Long): Unit =
      Modes.write(stream(name, source), dir)
  }

  object bfs {
    def stream(name: String, source: Long): DataFrame =
      Paths.bfs(catalog.get(name), source)
    /** Spark-idiomatic composition form of the reference's BFS mutate: the
      * traversal result (hop distance from `source`) becomes a vertex
      * property downstream algorithms can filter/join on. */
    def mutate(name: String, property: String, source: Long): PropertyGraph =
      catalog.mutateNodeProperty(name, property, stream(name, source))
    def write(name: String, dir: String, source: Long): Unit =
      Modes.write(stream(name, source), dir)
  }

  object dfs {
    def stream(name: String, source: Long, maxDepth: Int = Int.MaxValue,
               targets: Set[Long] = Set.empty): DataFrame =
      Paths.dfs(catalog.get(name), source, maxDepth = maxDepth, targets = targets)
    def write(name: String, dir: String, source: Long,
              maxDepth: Int = Int.MaxValue, targets: Set[Long] = Set.empty): Unit =
      Modes.write(stream(name, source, maxDepth, targets), dir)
  }

  object randomWalk {
    /** `gds.alpha.randomWalk.stream` — uniform by default; `returnFactor`
      * (p) / `inOutFactor` (q) != 1 switch to the node2vec-biased
      * second-order walker, matching the reference's RandomWalk.java whose
      * walk engine IS the node2vec one. */
    def stream(name: String, steps: Int, walksPerNode: Int = 1, seed: Long = 42L,
               returnFactor: Double = 1.0, inOutFactor: Double = 1.0): DataFrame =
      Paths.randomWalks(catalog.get(name), steps, walksPerNode, seed,
        returnFactor, inOutFactor)
  }

  object hits {
    def stream(name: String, cfg: HitsConfig = HitsConfig()): DataFrame =
      Hits.run(catalog.get(name), cfg)
    /** Distributions of both scores: (hub stats, auth stats). */
    def stats(name: String, cfg: HitsConfig = HitsConfig()): (Row, Row) = {
      val r = stream(name, cfg)
      (Modes.stats(r, "hub"), Modes.stats(r, "auth"))
    }
    /** Attaches BOTH scores: `<property>hub` / `<property>auth`, matching
      * the reference's hitsHub/hitsAuth property pair (gds.alpha.hits). */
    def mutate(name: String, property: String, cfg: HitsConfig = HitsConfig()): PropertyGraph = {
      val r = stream(name, cfg)
      catalog.mutateNodeProperty(name, s"${property}hub", r.select("id", "hub"))
      catalog.mutateNodeProperty(name, s"${property}auth", r.select("id", "auth"))
    }
    def write(name: String, dir: String, cfg: HitsConfig = HitsConfig()): Unit =
      Modes.write(stream(name, cfg), dir)
  }

  object k1coloring {
    def stream(name: String): DataFrame = K1Coloring.run(catalog.get(name))
    def stats(name: String): Row = Modes.communityStats(stream(name), "color")
    def mutate(name: String, property: String): PropertyGraph =
      catalog.mutateNodeProperty(name, property, stream(name))
    def write(name: String, dir: String): Unit = Modes.write(stream(name), dir)
  }

  /** gds.fastRP — sparse-random-projection node embeddings
    * (reference: algo/.../embeddings/fastrp/FastRP.java). */
  object fastRP {
    def stream(name: String, cfg: FastRP.FastRPConfig = FastRP.FastRPConfig()): DataFrame =
      FastRP.run(catalog.get(name), cfg)
    def mutate(name: String, property: String,
               cfg: FastRP.FastRPConfig = FastRP.FastRPConfig()): PropertyGraph =
      catalog.mutateNodeProperty(name, property, stream(name, cfg))
    def write(name: String, dir: String,
              cfg: FastRP.FastRPConfig = FastRP.FastRPConfig()): Unit =
      Modes.write(stream(name, cfg), dir)
    def estimate(name: String,
                 cfg: FastRP.FastRPConfig = FastRP.FastRPConfig()): EstimateResult =
      Gds.this.estimate.fastRP(name, cfg)
  }

  /** `gds.beta.fastRPExtended` — FastRP with the trailing propertyDimension
    * dims fed by node-feature projections (FastRP.scala extended mode). */
  object fastRPExtended {
    def stream(name: String, featureProperties: Seq[String],
               cfg: FastRP.FastRPConfig = FastRP.FastRPConfig(propertyRatio = 0.5)): DataFrame =
      FastRP.run(catalog.get(name), cfg.copy(featureProperties = featureProperties))
    def mutate(name: String, property: String, featureProperties: Seq[String],
               cfg: FastRP.FastRPConfig = FastRP.FastRPConfig(propertyRatio = 0.5)): PropertyGraph =
      catalog.mutateNodeProperty(name, property, stream(name, featureProperties, cfg))
    def write(name: String, dir: String, featureProperties: Seq[String],
              cfg: FastRP.FastRPConfig = FastRP.FastRPConfig(propertyRatio = 0.5)): Unit =
      Modes.write(stream(name, featureProperties, cfg), dir)
  }

  /** gds.node2vec — biased second-order random walks + skip-gram embeddings
    * (reference: algo/.../embeddings/node2vec/Node2Vec.java). */
  object node2vec {
    def stream(name: String,
               cfg: Node2Vec.Node2VecConfig = Node2Vec.Node2VecConfig()): DataFrame =
      Node2Vec.run(catalog.get(name), cfg).embeddings
    def mutate(name: String, property: String,
               cfg: Node2Vec.Node2VecConfig = Node2Vec.Node2VecConfig()): PropertyGraph =
      catalog.mutateNodeProperty(name, property, stream(name, cfg))
    def write(name: String, dir: String,
              cfg: Node2Vec.Node2VecConfig = Node2Vec.Node2VecConfig()): Unit =
      Modes.write(stream(name, cfg), dir)
  }

  /** gds.knn — approximate k-nearest-neighbours by NN-descent over a vector
    * node property (reference: algo/.../similarity/knn/Knn.java). */
  object knn {
    /** Over a catalog graph's vertex property (array<float/double>). */
    def stream(name: String, property: String,
               cfg: Knn.KnnConfig = Knn.KnnConfig()): DataFrame =
      Knn.run(catalog.get(name).vertices, cfg, idCol = "id", vecCol = property).neighbors
    /** Over a free-standing vectors DataFrame. */
    def streamVectors(vectors: DataFrame, cfg: Knn.KnnConfig = Knn.KnnConfig(),
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
      Knn.run(vectors, cfg, idCol, vecCol).neighbors
    def stats(name: String, property: String,
              cfg: Knn.KnnConfig = Knn.KnnConfig()): Row =
      Modes.stats(stream(name, property, cfg), "similarity")
    /** `gds.knn.mutate`: each node's top-k neighbour list becomes NEW
      * relationships of `relType` with the similarity as `weight`
      * (reference: proc/similarity/.../KnnMutateProc.java). */
    def mutate(name: String, relType: String, property: String,
               cfg: Knn.KnnConfig = Knn.KnnConfig()): PropertyGraph =
      catalog.addRelationships(name, relType, stream(name, property, cfg)
        .select(col("id").as("src"), col("neighbor_id").as("dst"),
          col("similarity").as("weight")))
    def write(name: String, dir: String, property: String,
              cfg: Knn.KnnConfig = Knn.KnnConfig()): Unit =
      Modes.write(stream(name, property, cfg), dir)
    def estimate(name: String, cfg: Knn.KnnConfig = Knn.KnnConfig()): EstimateResult =
      Gds.this.estimate.knn(name, cfg)
  }

  /** `gds.alpha.ml.ann.stream` (reference: alpha/alpha-proc/.../
    * ApproxNearestNeighborsProc.java — approximate per-node top-K over a
    * node property, NN-descent under the hood, same as [[knn]]). */
  object ann {
    def stream(name: String, property: String,
               cfg: Knn.KnnConfig = Knn.KnnConfig()): DataFrame =
      knn.stream(name, property, cfg)
    /** Same mutate/write shape as [[knn]] (the reference's ANN proc family
      * exposes write — ApproxNearestNeighborsProc write mode). */
    def mutate(name: String, relType: String, property: String,
               cfg: Knn.KnnConfig = Knn.KnnConfig()): PropertyGraph =
      knn.mutate(name, relType, property, cfg)
    def write(name: String, dir: String, property: String,
              cfg: Knn.KnnConfig = Knn.KnnConfig()): Unit =
      knn.write(name, dir, property, cfg)
  }

  /** `gds.alpha.similarity.{cosine,euclidean,pearson,overlap}.{stream,stats}`
    * — exact pairwise similarity over a node property vector/category list
    * with the reference's topK / similarityCutoff knobs
    * (graft.algo.AlphaSimilarity; quadratic-exact like the reference — the
    * linear-at-scale paths are [[knn]]/[[ann]]). */
  object alphaSimilarity {
    def stream(name: String, property: String,
               metric: AlphaSimilarity.Metric,
               cfg: AlphaSimilarity.SimConfig = AlphaSimilarity.SimConfig()): DataFrame =
      AlphaSimilarity.stream(catalog.get(name).vertices, "id", property, metric, cfg)
    def stats(name: String, property: String,
              metric: AlphaSimilarity.Metric,
              cfg: AlphaSimilarity.SimConfig = AlphaSimilarity.SimConfig()): Row =
      Modes.stats(stream(name, property, metric, cfg), "similarity")
  }

  /** gds.alpha.spanningTree / gds.alpha.kSpanningTree (reference:
    * alpha/.../impl/spanningTrees/{Prim,KSpanningTree}.java). */
  object spanningTree {
    def stream(name: String, startNode: Option[Long] = None,
               minimize: Boolean = true): DataFrame =
      SpanningTree.run(catalog.get(name), startNode, minimize).treeEdges
    def kmax(name: String, k: Int, startNode: Option[Long] = None): DataFrame =
      SpanningTree.kSpanningTree(catalog.get(name), k, startNode, minimize = false)
    def kmin(name: String, k: Int, startNode: Option[Long] = None): DataFrame =
      SpanningTree.kSpanningTree(catalog.get(name), k, startNode, minimize = true)
    /** `gds.alpha.spanningTree.write` analogue (reference: alpha/alpha-proc/
      * .../SpanningTreeProc.java — writes the tree relationships back):
      * mutate registers the tree edges as a typed relationship set on the
      * catalog graph; write persists them. */
    def mutate(name: String, relType: String, startNode: Option[Long] = None,
               minimize: Boolean = true): PropertyGraph =
      catalog.addRelationships(name, relType, stream(name, startNode, minimize))
    def write(name: String, dir: String, startNode: Option[Long] = None,
              minimize: Boolean = true): Unit =
      Modes.write(stream(name, startNode, minimize), dir)
    def estimate(name: String): EstimateResult = Gds.this.estimate.spanningTree(name)
  }

  /** gds.alpha.sllpa — speaker-listener LPA, overlapping communities
    * (reference: alpha/alpha-proc/.../pregel/SpeakerListenerLPA.java). */
  object sllpa {
    def stream(name: String, maxIterations: Int = 10,
               minAssociationStrength: Double = 0.2): DataFrame =
      Sllpa.run(catalog.get(name), maxIterations, minAssociationStrength).communities
    def mutate(name: String, property: String, maxIterations: Int = 10,
               minAssociationStrength: Double = 0.2): PropertyGraph =
      catalog.mutateNodeProperty(name, property,
        stream(name, maxIterations, minAssociationStrength))
    def write(name: String, dir: String, maxIterations: Int = 10,
              minAssociationStrength: Double = 0.2): Unit =
      Modes.write(stream(name, maxIterations, minAssociationStrength), dir)
  }

  /** gds.alpha.influenceMaximization — RIS greedy seed selection
    * (reference: alpha/.../impl/influenceMaximization/{CELF,Greedy}.java). */
  object influenceMaximization {
    def stream(name: String, seedSetSize: Int, propagationProbability: Double = 0.1,
               monteCarloSimulations: Int = 200): DataFrame =
      InfluenceMaximization.run(catalog.get(name), seedSetSize,
        propagationProbability, monteCarloSimulations).seeds
    /** Attaches the marginal spread gain as a vertex property of the chosen
      * seeds (null elsewhere) — the composition-friendly form of the
      * reference's CELF result set. */
    def mutate(name: String, property: String, seedSetSize: Int,
               propagationProbability: Double = 0.1,
               monteCarloSimulations: Int = 200): PropertyGraph =
      catalog.mutateNodeProperty(name, property,
        stream(name, seedSetSize, propagationProbability, monteCarloSimulations)
          .select(col("nodeId").as("id"), col("spreadGain")))
    def write(name: String, dir: String, seedSetSize: Int,
              propagationProbability: Double = 0.1,
              monteCarloSimulations: Int = 200): Unit =
      Modes.write(stream(name, seedSetSize, propagationProbability,
        monteCarloSimulations), dir)
  }

  /** gds.alpha.maxkcut (reference: alpha/.../impl/approxmaxkcut/ApproxMaxKCut.java). */
  object maxkcut {
    def stream(name: String, k: Int = 2, iterations: Int = 8): DataFrame =
      MaxKCut.run(catalog.get(name), k, iterations).assignments
    def stats(name: String, k: Int = 2, iterations: Int = 8): Row =
      Modes.communityStats(stream(name, k, iterations), "community")
    def mutate(name: String, property: String, k: Int = 2, iterations: Int = 8): PropertyGraph =
      catalog.mutateNodeProperty(name, property, stream(name, k, iterations))
    def write(name: String, dir: String, k: Int = 2, iterations: Int = 8): Unit =
      Modes.write(stream(name, k, iterations), dir)
  }

  /** gds.alpha.scaleProperties (reference: algo-common/.../scaling/ScalarScaler.java). */
  object scaleProperties {
    def mutate(name: String, property: String, scaler: Scaler): PropertyGraph = {
      val g = catalog.get(name)
      val scaled = Scaler.apply(scaler,
        g.vertices.select(col("id"), col(property).cast("double").as(property)),
        property)
      catalog.mutateNodeProperty(name, s"${property}_scaled",
        scaled.withColumnRenamed(property, s"${property}_scaled"))
    }
  }

  /** gds.alpha.triangles — stream actual (a,b,c) triples
    * (reference: alpha/.../impl/triangle/TriangleStream.java). */
  object triangles {
    def stream(name: String): DataFrame = TriangleCount.triangleStream(catalog.get(name))
    /** Attaches each node's triangle-participation count computed from the
      * streamed (a,b,c) triples — identical to triangleCount.mutate but via
      * the triple stream, matching the reference TriangleProc's
      * stream-then-write pairing. */
    def mutate(name: String, property: String): PropertyGraph = {
      val t = stream(name)
      val corners = t.select(col("a").as("id"))
        .unionAll(t.select(col("b").as("id")))
        .unionAll(t.select(col("c").as("id")))
        .groupBy("id").agg(count(lit(1)).as("triangles"))
      val all = catalog.get(name).vertices.select("id")
        .join(corners, Seq("id"), "left")
        .select(col("id"), coalesce(col("triangles"), lit(0L)).as("triangles"))
      catalog.mutateNodeProperty(name, property, all)
    }
    def write(name: String, dir: String): Unit = Modes.write(stream(name), dir)
  }

  /** gds.alpha.collapsePath.mutate (reference: alpha/.../impl/walking/CollapsePath.java). */
  object collapsePath {
    def mutate(name: String, relType: String, hops: Int): PropertyGraph = {
      val g = catalog.get(name)
      val collapsed = Paths.collapsePath(Seq.fill(hops)(g.edges))
      catalog.addRelationships(name, relType, collapsed)
    }
  }

  /** gds.alpha.shortestPath.deltaStepping — single-source distances
    * (reference: alpha/.../impl/ShortestPathDeltaStepping.java). */
  object deltaStepping {
    def stream(name: String, source: Long): DataFrame =
      Paths.sssp(catalog.get(name), source)
    def mutate(name: String, property: String, source: Long): PropertyGraph =
      catalog.mutateNodeProperty(name, property, stream(name, source))
    def write(name: String, dir: String, source: Long): Unit =
      Modes.write(stream(name, source), dir)
  }

  /** gds.beta.graphSage — inductive embeddings: driver-sample training,
    * fully distributed layer-wise inference (reference:
    * algo/.../embeddings/graphsage/GraphSage.java). */
  object graphSage {
    def train(name: String, featureProperty: String,
              cfg: GraphSage.GraphSageConfig = GraphSage.GraphSageConfig()): GraphSage.GraphSageModel =
      GraphSage.train(catalog.get(name), featureProperty, cfg)._1
    def stream(name: String, featureProperty: String,
               model: GraphSage.GraphSageModel): DataFrame =
      GraphSage.predict(catalog.get(name), featureProperty, model)
    def mutate(name: String, property: String, featureProperty: String,
               cfg: GraphSage.GraphSageConfig = GraphSage.GraphSageConfig()): PropertyGraph =
      catalog.mutateNodeProperty(name, property,
        GraphSage.run(catalog.get(name), featureProperty, cfg).embeddings)
  }

  /** gds.alpha.ml.linkPrediction — train on edges vs sampled non-edges,
    * score candidate pairs (reference: alpha/.../ml/linkmodels/
    * LinkPredictionTrain.java). */
  object linkPrediction {
    def train(name: String, featureProperty: String,
              cfg: graft.ml.LinkPrediction.LinkPredictionConfig =
                graft.ml.LinkPrediction.LinkPredictionConfig()): graft.ml.LinkPrediction.LinkModel =
      graft.ml.LinkPrediction.train(catalog.get(name), featureProperty, cfg)
    def stream(name: String, featureProperty: String,
               model: graft.ml.LinkPrediction.LinkModel, topN: Int): DataFrame =
      graft.ml.LinkPrediction.predict(catalog.get(name), model, featureProperty, topN)
  }

  /** gds.alpha.ml.nodeClassification (reference: alpha/.../ml/nodemodels/
    * NodeClassificationTrain.java). */
  object nodeClassification {
    def train(name: String, featureProperty: String, labelProperty: String,
              cfg: graft.ml.NodeClassification.NcConfig =
                graft.ml.NodeClassification.NcConfig()): graft.ml.NodeClassification.NcModel =
      graft.ml.NodeClassification.train(catalog.get(name), featureProperty, labelProperty, cfg)
    def stream(name: String, featureProperty: String,
               model: graft.ml.NodeClassification.NcModel): DataFrame =
      graft.ml.NodeClassification.predict(catalog.get(name), featureProperty, model)
  }

  /** `.estimate` mode (reference: proc/common/.../AlgoBaseProc.java:262-299 +
    * MemoryEstimations): a cheap per-family size model instead of a run.
    * Spark manages executor memory itself, so the estimate reports the
    * LOGICAL footprint an algorithm implies: bytes per persisted state row
    * (8 B per long/double column + 1 B per boolean, times the number of
    * live state generations) and bytes of shuffled message/intermediate
    * rows per superstep. The widths are asserted against measured
    * in-memory-cache sizes (within 2x) in GdsApiSpec — honest numbers, not
    * a vestigial constant. `bytesMax` = 3x headroom (execution + shuffle +
    * cache copies). */
  object estimate {
    private def dims(name: String): (Long, Long) = {
      val g = catalog.get(name)
      (g.vertices.count(), g.edges.count())
    }
    private def mk(algo: String, n: Long, m: Long, stateRow: Long,
                   generations: Long, msg: Long): EstimateResult = {
      val state = n * stateRow * generations
      EstimateResult(algo, n, m, stateRow, state, msg, state + msg, (state + msg) * 3)
    }
    /** State (id, rank, delta, active) = 8+8+8+8; messages (dst, partial). */
    def pageRank(name: String): EstimateResult =
      { val (n, m) = dims(name); mk("pageRank", n, m, 32L, 1L, m * 16L) }
    /** State (id, component, active); messages (dst, candidate label). */
    def wcc(name: String): EstimateResult =
      { val (n, m) = dims(name); mk("wcc", n, m, 24L, 1L, m * 16L) }
    /** State (id, label, active); messages (dst, label[, weight] combined). */
    def labelPropagation(name: String): EstimateResult =
      { val (n, m) = dims(name); mk("labelPropagation", n, m, 24L, 1L, m * 16L) }
    /** State (id, triangles); intermediate = wedge stream of (a,b,c) rows,
      * ~ m * avgDegree on the degree-ordered orientation. */
    def triangleCount(name: String): EstimateResult = {
      val (n, m) = dims(name)
      mk("triangleCount", n, m, 16L, 1L, if (n == 0) 0L else m * (m / n) * 24L)
    }
    /** State (id, array[d]) for current round + accumulator; messages =
      * exploded (dst, dim, partial) per edge per dimension. */
    def fastRP(name: String,
               cfg: FastRP.FastRPConfig = FastRP.FastRPConfig()): EstimateResult = {
      val (n, m) = dims(name)
      val d = cfg.embeddingDimension
      mk("fastRP", n, m, 8L + 8L * d, 2L, m * d.toLong * 24L)
    }
    /** State (id, k neighbor structs) forward + reverse; candidates per
      * NN-descent iteration = (2k)^2 pairs per node. */
    def knn(name: String, cfg: Knn.KnnConfig = Knn.KnnConfig()): EstimateResult = {
      val (n, m) = dims(name)
      val k = cfg.k.toLong
      mk("knn", n, m, 8L + 24L * k, 2L, n * 4L * k * k * 24L)
    }
    /** Brandes: the forward MS-BFS materializes the full (source, node)
      * visited frame (s, id, dist, sigma) ≈ 28 B/row — S×V rows (S =
      * #sources, default n), the QUADRATIC state that makes a pre-run size
      * gate matter most here (reference: BetweennessCentrality.java's
      * per-source path state; ~70 GB on a 50k-node graph unsampled). The
      * backward sweep shuffles ≤ S contribution rows per edge. */
    def betweenness(name: String, sources: Long = -1L): EstimateResult = {
      val (n, m) = dims(name)
      val s = if (sources > 0) sources else n
      mk("betweenness", n, m, 28L, s, s * m * 24L)
    }
    /** Louvain: two live assignment generations (current + next local-move
      * round) at 16 B (id, communityId); the coarsened level graphs sum to
      * ≤ 2x the input edge bytes (level sizes shrink geometrically). */
    def louvain(name: String): EstimateResult =
      { val (n, m) = dims(name); mk("louvain", n, m, 16L, 2L, m * 48L) }
    /** NodeSimilarity: the capped result heap holds topK (n1, n2,
      * similarity) 24 B rows per node; candidate-pair volume before the
      * cutoff ≈ m x avgDegree shared-target wedges (hub cap bounds the true
      * worst case further — this is the uncapped planning number). */
    def nodeSimilarity(name: String,
                       cfg: NodeSimilarityConfig = NodeSimilarityConfig()): EstimateResult = {
      val (n, m) = dims(name)
      mk("nodeSimilarity", n, m, 24L, cfg.topK.toLong,
        if (n == 0) 0L else m * (m / n) * 24L)
    }
    /** Borůvka: per-node (id, component, candidate dst+weight) 32 B state,
      * one live generation; every round shuffles each edge at most once. */
    def spanningTree(name: String): EstimateResult =
      { val (n, m) = dims(name); mk("spanningTree", n, m, 32L, 1L, m * 24L) }
    def forAlgorithm(name: String, algorithm: String): EstimateResult =
      algorithm match {
        case "pageRank" | "eigenvector" | "articleRank" =>
          pageRank(name).copy(algorithm = algorithm)
        case "wcc" | "scc"        => wcc(name).copy(algorithm = algorithm)
        case "labelPropagation"   => labelPropagation(name)
        case "triangleCount"      => triangleCount(name)
        case "fastRP"             => fastRP(name)
        case "knn"                => knn(name)
        case "betweenness"        => betweenness(name)
        case "louvain" | "modularityOptimization" =>
          louvain(name).copy(algorithm = algorithm)
        case "nodeSimilarity"     => nodeSimilarity(name)
        case "spanningTree"       => spanningTree(name)
        case other => // generic fallback: one 32 B state row per node, one
          // 16 B message per edge — flagged so callers know this is NOT a
          // per-family model and can be off by orders of magnitude
          val (n, m) = dims(name)
          mk(other, n, m, 32L, 1L, m * 16L).copy(genericFallback = true)
      }
  }
}

final case class EstimateResult(algorithm: String,
                                nodeCount: Long, relationshipCount: Long,
                                stateRowBytes: Long, stateBytes: Long,
                                msgBytes: Long,
                                bytesMin: Long, bytesMax: Long,
                                /** true when no per-family model exists and
                                  * the generic node+edge default was used —
                                  * treat the numbers as a floor, not a gate */
                                genericFallback: Boolean = false)

object Gds {
  def apply(spark: SparkSession): Gds = new Gds(spark)
}
