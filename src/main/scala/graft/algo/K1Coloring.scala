package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{GraphOps, PropertyGraph}
import graft.pregel.{LoopConfig, SuperstepLoop}

final case class K1ColoringConfig(maxIterations: Int = 30, numPartitions: Option[Int] = None)

/** K-1 graph coloring (reference: algo/src/main/java/org/neo4j/gds/beta/
  * k1coloring/K1Coloring.java — greedy parallel coloring with conflict
  * resolution rounds).
  *
  * Each round every still-conflicted vertex recolors to the smallest color
  * not used by its neighbors; conflicts (same color across an edge) are
  * broken by the higher vertex id recoloring. Converges when no edge is
  * monochromatic. Returns (id, color).
  */
object K1Coloring {

  def run(graph: PropertyGraph, cfg: K1ColoringConfig = K1ColoringConfig()): DataFrame = {
    val spark = graph.edges.sparkSession
    val parts = cfg.numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val undirected = GraphOps.canonicalUndirected(graph.edges)
    val edges = undirected.select(col("lo").as("src"), col("hi").as("dst"))
      .unionByName(undirected.select(col("hi").as("src"), col("lo").as("dst")))
      .repartition(parts, col("src")).persist()

    val init = graph.vertices.select("id")
      .repartition(parts, col("id"))
      .select(col("id"), lit(0L).as("color"), lit(true).as(SuperstepLoop.ActiveCol))

    val result = SuperstepLoop.run(init, LoopConfig(cfg.maxIterations)) { (state, _) =>
      // neighbor colors per vertex. The gathered set is CAPPED: mex(taken)
      // can never exceed the number of distinct colors in use, and a greedy
      // coloring uses at most maxCore+1 colors — far below the cap — so
      // filtering colors >= 65536 cannot change the mex while bounding the
      // per-node aggregation state on power-law hubs (a 10M-degree hub would
      // otherwise materialize its whole neighborhood's color set in one row).
      val nbrColors = state.select(col("id").as("src"), col("color").as("c"))
        .join(edges, "src")
        .select(col("dst").as("id"), col("c"))
        .filter(col("c") < lit(65536L))
        .groupBy("id").agg(collect_set("c").as("taken"))
      // conflicted = my color present among neighbors AND I lose the tie
      // (higher id recolors). New color = mex(taken).
      // mex(taken): fold over the sorted distinct colors — acc counts how
      // many consecutive values 0,1,2,… are present; the first gap stops it.
      val mex = aggregate(sort_array(col("taken")), lit(0L),
        (acc, v) => when(v === acc, acc + 1L).otherwise(acc))
      // conflict detection: does any LOWER-id neighbor share my color?
      val conflicts = state.select(col("id").as("src"), col("color").as("c"))
        .join(edges, "src")
        .join(state.select(col("id").as("dst"), col("color").as("c2")), "dst")
        .filter(col("c") === col("c2") && col("src") < col("dst"))
        .select(col("dst").as("id")).distinct()
        .withColumn("__conflict", lit(true))
      state.select("id", "color").join(nbrColors, Seq("id"), "left")
        .join(conflicts, Seq("id"), "left")
        .select(col("id"),
          when(col("__conflict"), mex).otherwise(col("color")).as("color"),
          coalesce(col("__conflict"), lit(false)).as(SuperstepLoop.ActiveCol))
    }
    edges.unpersist(false)
    result.state.select("id", "color")
  }
}
