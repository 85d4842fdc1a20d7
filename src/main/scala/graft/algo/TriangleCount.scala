package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{GraphOps, PropertyGraph}

/** Reference config: `maxDegree` excludes hub nodes — their count is
  * reported as -1 and no triangle containing them is counted (reference:
  * algo/src/main/java/org/neo4j/gds/triangle/IntersectingTriangleCount.java:58,161-166). */
final case class TriangleCountConfig(
  maxDegree: Option[Long] = None,
  numPartitions: Option[Int] = None,
  /** > 1 splits the wedge build into K hash-of-lowest-corner batches run as
    * separate jobs, with per-batch corner counts spilled to a temp parquet
    * table and summed at the end — identical results, peak shuffle
    * footprint ~1/K of the single-job plan. The O(m^1.5) wedge stream is
    * the algorithm's inherent cost; a 1000-executor cluster absorbs it in
    * aggregate shuffle space and should keep the default single job, but a
    * disk-bounded deployment (or a 10x-input single box — see BASELINE.md's
    * robustness probe) picks K so one batch fits its shuffle capacity. */
  wedgeBatches: Int = 1)

final case class TriangleCountResult(
  localTriangles: DataFrame, // (id, triangles) — -1 for excluded nodes
  globalTriangles: Long)

/** Triangle counting via degree-ordered edge intersection, expressed as two
  * joins (wedge build + wedge close) instead of the reference's sequential
  * sorted-adjacency merge-intersection (reference: algo/src/main/java/org/
  * neo4j/gds/triangle/IntersectingTriangleCount.java:129-181, intersection
  * kernel GraphIntersect.java:52-159).
  *
  * Semantics match the reference exactly: input is treated as UNDIRECTED
  * (every triangle-count proc validates an undirected projection), parallel
  * edges are deduplicated, self-loops ignored, each distinct triangle counted
  * once globally and once at each of its three corners.
  *
  * Scale shape: each undirected edge is oriented from its lower-degree
  * endpoint to its higher-degree endpoint (ties by id) — the standard
  * rewrite that bounds total wedge fan-out by O(m^1.5) and caps the join
  * explosion at hub vertices (same effect as the reference's id-ordered
  * B>A, C>B iteration, GraphIntersect.java:62-66, but skew-robust). The
  * wedge-close join runs on (src, dst) pairs; AQE skew-join splitting
  * handles residual hot keys.
  */
object TriangleCount {

  def run(graph: PropertyGraph, cfg: TriangleCountConfig = TriangleCountConfig()): TriangleCountResult = {
    val spark = graph.edges.sparkSession
    val parts = cfg.numPartitions.getOrElse(
      GraphOps.adaptiveParts(spark, graph.edges.count()))
    GraphOps.withShuffleWidth(spark, parts) {

    // GDS degree under an UNDIRECTED projection counts every adjacency slot:
    // both directions of every input edge, parallels included, self-loops
    // twice. Used only for maxDegree exclusion.
    val rawDegree = graph.edges.select(col("src").as("id"))
      .unionByName(graph.edges.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("rawDeg"))

    val excluded = cfg.maxDegree match {
      case Some(m) => rawDegree.filter(col("rawDeg") > lit(m)).select("id").persist()
      case None    => null
    }

    // Canonical simple undirected edges, minus edges touching excluded hubs.
    val canonical0 = GraphOps.canonicalUndirected(graph.edges)
    val canonical = (if (excluded != null)
      canonical0
        .join(excluded.withColumnRenamed("id", "lo"), Seq("lo"), "left_anti")
        .join(excluded.withColumnRenamed("id", "hi"), Seq("hi"), "left_anti")
    else canonical0).persist()

    // Simple degree (distinct neighbors) for the degree ordering.
    val simpleDeg = canonical.select(col("lo").as("id"))
      .unionByName(canonical.select(col("hi").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))

    // Orient low-degree → high-degree (ties by id).
    val oriented = canonical
      .join(simpleDeg.select(col("id").as("lo"), col("deg").as("dlo")), "lo")
      .join(simpleDeg.select(col("id").as("hi"), col("deg").as("dhi")), "hi")
      .select(
        when(col("dlo") < col("dhi") || (col("dlo") === col("dhi")), col("lo")).otherwise(col("hi")).as("src"),
        when(col("dlo") < col("dhi") || (col("dlo") === col("dhi")), col("hi")).otherwise(col("lo")).as("dst"))
      .repartition(parts, col("src"))
      .persist()

    // Wedge build: u→v→w with (u,v,w) strictly increasing in degree order;
    // close with the u→w edge. Each triangle matches exactly once.
    val e1 = oriented.select(col("src").as("u"), col("dst").as("v"))
    val e2 = oriented.select(col("src").as("v"), col("dst").as("w"))
    val e3 = oriented.select(col("src").as("u"), col("dst").as("w"))
    def corners(tri: DataFrame): DataFrame = tri.select(col("u").as("id"))
      .unionByName(tri.select(col("v").as("id")))
      .unionByName(tri.select(col("w").as("id")))
      .groupBy("id").agg(count(lit(1)).as("triangles"))

    val cornerCounts =
      if (cfg.wedgeBatches <= 1)
        corners(e1.join(e2, "v").join(e3, Seq("u", "w")).select("u", "v", "w"))
      else {
        // Bounded-peak-footprint mode: batch b takes the wedges whose LOWEST
        // corner hashes to b (u partitions every wedge AND every triangle
        // exactly once, so per-batch corner counts sum to the exact result).
        // Each batch is its own job whose partial counts land in a temp
        // parquet table; dropping the batch's plan references and nudging GC
        // lets the ContextCleaner reclaim its shuffle files before the next
        // batch runs — peak shuffle disk is one batch's, not the sum's.
        val k = cfg.wedgeBatches
        val tmp = java.nio.file.Files.createTempDirectory("graft-tri-batch").toString
        try {
          for (b <- 0 until k) {
            val e1b = e1.filter(pmod(xxhash64(col("u")), lit(k.toLong)) === lit(b.toLong))
            corners(e1b.join(e2, "v").join(e3, Seq("u", "w")).select("u", "v", "w"))
              .write.mode("append").parquet(tmp)
            System.gc() // release the finished batch's shuffle files
          }
          spark.read.parquet(tmp)
            .groupBy("id").agg(sum("triangles").as("triangles"))
            // eager local checkpoint: materializes AND cuts lineage to the
            // about-to-vanish temp files
            .localCheckpoint(true)
        } finally graft.io.Fs.deleteRecursively(tmp)
      }

    val local0 = graph.vertices.select("id")
      .join(cornerCounts, Seq("id"), "left")
      .select(col("id"), coalesce(col("triangles"), lit(0L)).as("triangles"))
    val local = (if (excluded != null)
      local0.join(excluded.withColumn("__ex", lit(true)), Seq("id"), "left")
        .select(col("id"),
          when(col("__ex"), lit(-1L)).otherwise(col("triangles")).as("triangles"))
    else local0).persist()

    // ONE execution of the wedge join serves everything: the global count is
    // Σ per-corner counts / 3 over the (persisted, materialized-right-here)
    // local table — excluded hubs carry -1, every counted triangle has three
    // non-excluded corners. Downstream consumers (stream/write modes, LCC's
    // coefficient join + average) read the small cached (id, triangles)
    // table instead of re-running the join pipeline.
    val global = local
      .agg(coalesce(sum(when(col("triangles") > 0L, col("triangles")).otherwise(0L)), lit(0L)))
      .first().getLong(0) / 3

    oriented.unpersist(false)
    canonical.unpersist(false)
    TriangleCountResult(local, global)
    }
  }

  /** Local clustering coefficient: C(v) = 2·tri(v) / (deg(v)·(deg(v)−1))
    * with the parallel-free degree; 0.0 when tri = 0; NaN for excluded nodes
    * (reference: algo/src/main/java/org/neo4j/gds/triangle/
    * LocalClusteringCoefficient.java:78-122). Returns ((id, coefficient), avg).
    */
  def localClusteringCoefficient(
      graph: PropertyGraph,
      cfg: TriangleCountConfig = TriangleCountConfig(),
      precomputedTriangles: Option[DataFrame] = None): (DataFrame, Double) = {
    val tri = precomputedTriangles.getOrElse(run(graph, cfg).localTriangles)
    val canonical = GraphOps.canonicalUndirected(graph.edges)
    val simpleDeg = canonical.select(col("lo").as("id"))
      .unionByName(canonical.select(col("hi").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val coeffs = tri.join(simpleDeg, Seq("id"), "left")
      .select(col("id"),
        when(col("triangles") === lit(-1L), lit(Double.NaN))
          .when(col("triangles") === lit(0L), lit(0.0))
          .otherwise(col("triangles").cast("double") * lit(2.0) /
                     (col("deg").cast("double") * (col("deg").cast("double") - lit(1.0))))
          .as("coefficient"))
    // NaN (excluded nodes) propagates into the average, like the reference's
    // DoubleAdder sum (LocalClusteringCoefficient.java:89-99).
    val avgRow = coeffs.agg(avg(col("coefficient"))).first()
    val avgCoeff = if (avgRow.isNullAt(0)) 0.0 else avgRow.getDouble(0)
    (coeffs, avgCoeff)
  }

  /** Stream actual (a, b, c) triangle triples, a < b < c by id — the
    * reference's `gds.alpha.triangles` (alpha/alpha-algo/.../impl/triangle/
    * TriangleStream.java). */
  def triangleStream(graph: PropertyGraph, cfg: TriangleCountConfig = TriangleCountConfig()): DataFrame = {
    val canonical = GraphOps.canonicalUndirected(graph.edges)
    val e1 = canonical.select(col("lo").as("a"), col("hi").as("b"))
    val e2 = canonical.select(col("lo").as("b"), col("hi").as("c"))
    val e3 = canonical.select(col("lo").as("a"), col("hi").as("c"))
    e1.join(e2, "b").join(e3, Seq("a", "c")).select("a", "b", "c")
  }
}
