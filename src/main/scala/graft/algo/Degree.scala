package graft.algo

import org.apache.spark.sql.DataFrame
import graft.core.{Orientation, PropertyGraph}

/** Degree centrality (reference: algo/src/main/java/org/neo4j/gds/degree/
  * DegreeCentrality.java:40-108): in/out/undirected degree, weighted = sum of
  * positive weights. A single groupBy with map-side combine — Catalyst's
  * partial aggregation is the whole algorithm. */
object DegreeCentrality {
  def run(graph: PropertyGraph,
          orientation: Orientation = Orientation.Natural,
          weighted: Boolean = false): DataFrame =
    graph.degrees(orientation, weighted)
      .withColumnRenamed("degree", "score")
}
