package graft.algo

import org.apache.spark.sql.{DataFrame, GraftSqlCompat}
import org.apache.spark.sql.functions._
import graft.core.{GraphOps, Orientation, PropertyGraph}

/** Multi-source BFS engine + the centralities built on it.
  *
  * Reference: the MS-BFS engine alpha/alpha-algo/src/main/java/org/neo4j/
  * gds/impl/msbfs/MultiSourceBFS.java:1-547 (64-source bitset batches over
  * shared memory) powering closeness (impl/closeness/
  * MSClosenessCentrality.java:148-156), harmonic (impl/harmonic/
  * HarmonicCentrality.java:56-70) and all-shortest-paths streaming; Brandes
  * betweenness algo/src/main/java/org/neo4j/gds/betweenness/
  * BetweennessCentrality.java (undirected divisor 2 at :74,:185).
  *
  * Spark formulation: the BFS state is a Dataset keyed by (source, node) —
  * every source expands simultaneously in the SAME join (the shuffle is the
  * bitset batch), so rounds = graph eccentricity regardless of source count.
  * `sigma` (shortest-path counts) ride the same aggregation. Source
  * sampling bounds the state to |sources| x reachable for betweenness at
  * scale — the same knob the reference exposes. */
object MsBfs {

  /** Forward multi-source BFS: returns (s, id, dist, sigma) for every
    * (source, reached-node) pair — dist in hops, sigma = number of distinct
    * shortest paths. One shuffle per BFS level. */
  def distSigma(edges: DataFrame, sources: DataFrame, maxDepth: Int = 100): DataFrame = {
    val spark = edges.sparkSession
    // loop-scoped conf (AQE off, no auto-broadcast of the growing visited
    // set, hash joins): same discipline as SuperstepLoop — per-level
    // re-planning and driver-side state broadcasts are the fixed costs that
    // dominate BFS levels at small per-level compute.
    graft.pregel.SuperstepLoop.withIterationConf(spark) {
      distSigmaScoped(edges, sources, maxDepth)
    }
  }

  private def distSigmaScoped(edges: DataFrame, sources: DataFrame, maxDepth: Int): DataFrame = {
    val spark = edges.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val e = edges.select("src", "dst").repartition(parts, col("src")).persist()

    var visited = sources.select(col("id").as("s"), col("id"),
        lit(0).as("dist"), lit(1.0).as("sigma"))
      .repartition(parts, col("id")).persist()
    visited.count()
    var frontier = visited
    var depth    = 0
    var more     = true
    while (more && depth < maxDepth) {
      depth += 1
      val next = frontier
        .select(col("s"), col("id").as("src"), col("sigma"))
        .join(e, "src")
        .groupBy(col("s"), col("dst").as("id")).agg(sum("sigma").as("sigma"))
        .join(visited.select(col("s"), col("id")), Seq("s", "id"), "left_anti")
        .select(col("s"), col("id"), lit(depth).as("dist"), col("sigma"))
        .repartition(parts, col("id"))
        .persist()
      val reached = next.limit(1).count()
      more = reached > 0
      if (more) {
        val acc = GraftSqlCompat.truncatePlan(visited.unionByName(next)).persist()
        acc.count()
        visited.unpersist(false)
        visited  = acc
        frontier = GraftSqlCompat.truncatePlan(next)
      }
      next.unpersist(false)
    }
    e.unpersist(false)
    visited
  }

  /** All-pairs shortest-path distance stream (gds.alpha.allShortestPaths
    * .stream, reference impl/msbfs/MSBFSAllShortestPaths.java): every source
    * expands in the same batched BFS; emits one row per reachable
    * (source, target) pair. `sources` defaults to all vertices — pass a
    * subset to bound the O(sources x reachable) output at scale. */
  def allShortestPaths(graph: PropertyGraph,
                       sources: Option[DataFrame] = None,
                       orientation: Orientation = Orientation.Natural,
                       maxDepth: Int = 100): DataFrame = {
    val srcDf = sources.getOrElse(graph.vertices.select("id"))
    distSigma(graph.orientedEdges(orientation), srcDf, maxDepth)
      .select(col("s").as("sourceNodeId"), col("id").as("targetNodeId"),
        col("dist").cast("double").as("distance"))
  }

  /** Closeness centrality (gds.alpha.closeness.*): for each node v,
    * farness = sum of dist(s, v) over sources reaching it (excluding v),
    * componentSize = how many reach it; centrality = comp/farness, or
    * Wasserman-Faust (comp/farness)*(comp/(n-1)). Mirrors
    * MSClosenessCentrality.centrality(...):148-156. */
  def closeness(graph: PropertyGraph,
                orientation: Orientation = Orientation.Undirected,
                wassermanFaust: Boolean = false): DataFrame = {
    val n = graph.vertices.count()
    val reach = distSigma(graph.orientedEdges(orientation), graph.vertices.select("id"))
      .filter(col("dist") > 0)
    val agg = reach.groupBy("id").agg(
      sum("dist").as("farness"), count(lit(1)).as("comp"))
    val base = col("comp").cast("double") / col("farness")
    val cent =
      if (wassermanFaust)
        base * (col("comp").cast("double") / lit((n - 1).toDouble))
      else base
    graph.vertices.select("id").join(agg, Seq("id"), "left")
      .select(col("id"),
        when(col("farness").isNull || col("farness") === 0, lit(0.0))
          .otherwise(cent).as("centrality"))
  }

  /** Harmonic centrality (gds.alpha.closeness.harmonic.*):
    * inverseFarness(v) = sum of 1/dist(s,v); centrality = that / (n-1).
    * Mirrors HarmonicCentrality.java:56-70 + result scaling. */
  def harmonic(graph: PropertyGraph,
               orientation: Orientation = Orientation.Undirected): DataFrame = {
    val n = graph.vertices.count()
    val reach = distSigma(graph.orientedEdges(orientation), graph.vertices.select("id"))
      .filter(col("dist") > 0)
    val agg = reach.groupBy("id")
      .agg(sum(lit(1.0) / col("dist")).as("inv"))
    graph.vertices.select("id").join(agg, Seq("id"), "left")
      .select(col("id"),
        (coalesce(col("inv"), lit(0.0)) / lit((n - 1).toDouble)).as("centrality"))
  }

  /** Brandes betweenness centrality, optionally over a sampled source set
    * (reference: BetweennessCentrality.java with SelectionStrategy;
    * undirected graphs divide by 2). Forward MS-BFS computes (dist, sigma);
    * the backward sweep accumulates pair dependencies level by level:
    * delta(s,v) = sum over successors w of sigma_v/sigma_w * (1 + delta(s,w)).
    * Each level is one join-aggregation, chained lazily — a single job
    * materializes the whole accumulation. */
  // NOTE: the backward accumulation deliberately runs WITHOUT the scoped
  // iteration conf — it is one lazily-chained multi-level job (not a
  // materialize-per-step loop), and measured 2x faster with AQE + runtime
  // broadcast of the shrinking per-level delta frames (12s vs 23s at the
  // benchmark shape). Only the forward distSigma loop uses the loop conf.
  def betweenness(graph: PropertyGraph,
                  sources: Option[DataFrame] = None,
                  orientation: Orientation = Orientation.Natural): DataFrame = {
    val spark = graph.edges.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val edges = graph.orientedEdges(orientation).select("src", "dst").distinct()
      .repartition(parts, col("src")).persist()
    val srcDf = sources.getOrElse(graph.vertices.select("id"))

    val visited = distSigma(edges, srcDf).persist()
    val maxDRow = visited.agg(max("dist")).first()
    val maxD    = if (maxDRow.isNullAt(0)) 0 else maxDRow.getInt(0)

    val divisor = orientation match {
      case Orientation.Undirected => 2.0
      case _                      => 1.0
    }

    // Backward accumulation: deltas land exactly once per (s, v) — at v's
    // level — so a lazy union across levels is a disjoint accumulation.
    var deltaPrev: DataFrame = visited.filter(col("dist") === maxD)
      .select(col("s"), col("id"), lit(0.0).as("delta")).persist()
    var acc: DataFrame = deltaPrev
    val levelFrames = scala.collection.mutable.ArrayBuffer[DataFrame](deltaPrev)
    var level = maxD
    while (level > 0) {
      level -= 1
      val atPrev = deltaPrev // (s, w, delta) at level+1 with final deltas
      val contrib = atPrev
        .join(visited.select(col("s"), col("id"), col("sigma")), Seq("s", "id"))
        .select(col("s"), col("id").as("dst"), col("sigma").as("sw"), col("delta"))
        .join(edges, "dst")
        .select(col("s"), col("src").as("id"), col("sw"), col("delta"))
        .join(visited.filter(col("dist") === level)
          .select(col("s"), col("id"), col("sigma").as("sv")), Seq("s", "id"))
        .groupBy("s", "id")
        .agg(sum(col("sv") / col("sw") * (lit(1.0) + col("delta"))).as("delta"))
      val deltaHere = visited.filter(col("dist") === level)
        .select("s", "id")
        .join(contrib, Seq("s", "id"), "left")
        .select(col("s"), col("id"), coalesce(col("delta"), lit(0.0)).as("delta"))
        .persist()
      acc = acc.unionByName(deltaHere)
      deltaPrev = deltaHere
      levelFrames += deltaHere
    }
    val result = graph.vertices.select("id")
      .join(acc.filter(col("s") =!= col("id"))
        .groupBy("id").agg(sum("delta").as("c")), Seq("id"), "left")
      .select(col("id"),
        (coalesce(col("c"), lit(0.0)) / lit(divisor)).as("centrality"))
      .persist()
    result.count()
    levelFrames.foreach(_.unpersist(false))
    visited.unpersist(false)
    edges.unpersist(false)
    result
  }
}
