package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.PropertyGraph
import graft.pregel.{LoopConfig, SuperstepLoop}

/** @param fusedSteps iterations chained lazily per driver action (see
  *                   [[graft.pregel.LoopConfig.fusedSteps]]). HITS runs a
  *                   FIXED iteration count (no convergence check), so fusing
  *                   loses nothing; the only cost is a deeper one-time plan. */
final case class HitsConfig(maxIterations: Int = 20, numPartitions: Option[Int] = None,
                            fusedSteps: Int = 5)

/** HITS hubs & authorities (reference: alpha/alpha-proc/src/main/java/org/
  * neo4j/gds/pregel/Hits.java — a Pregel computation alternating
  * auth(v) = Σ hub(u) over in-edges and hub(u) = Σ auth(v) over out-edges,
  * each L2-normalized per half-step).
  *
  * Two shuffle aggregations per iteration; the two L2 scalars (the
  * masterCompute analogue) are 1-row aggregates broadcast back into the same
  * plan. Iterations run under [[SuperstepLoop]] with `fusedSteps` chained
  * lazily per driver action — a batch of K iterations is ONE multi-stage job
  * (round 2 persisted + counted twice per iteration, pure fixed cost on
  * small graphs and a per-superstep driver sync at scale). Returns
  * (id, hub, auth).
  */
object Hits {

  def run(graph: PropertyGraph, cfg: HitsConfig = HitsConfig()): DataFrame = {
    val spark = graph.edges.sparkSession
    val parts = cfg.numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    // Two persisted orientations: the auth step joins on src, the hub step
    // on dst — co-partitioned joins both ways instead of re-shuffling the
    // edge table every half-iteration (the 100-TB shape: edge storage is
    // cheap next to 20x2 repeated shuffles of it).
    val edges = graph.edges.select("src", "dst")
      .repartition(parts, col("src")).persist()
    val edgesByDst = graph.edges.select("src", "dst")
      .repartition(parts, col("dst")).persist()

    val init = graph.vertices.select("id")
      .repartition(parts, col("id"))
      .select(col("id"), lit(1.0).as("hub"), lit(1.0).as("auth"),
        lit(true).as(SuperstepLoop.ActiveCol))

    def l2Of(df: DataFrame, c: String): DataFrame =
      df.agg(sqrt(sum(col(c) * col(c))).as("__l2"))
        .select(when(col("__l2") === 0.0, lit(1.0)).otherwise(col("__l2")).as("__l2"))

    val result = SuperstepLoop.run(init,
        LoopConfig(cfg.maxIterations, fusedSteps = cfg.fusedSteps)) { (state, _) =>
      // auth(v) = Σ hub(u) for u→v, L2-normalized in-plan
      val authRaw = state.select(col("id").as("src"), col("hub"))
        .join(edges, "src")
        .groupBy(col("dst").as("id")).agg(sum("hub").as("a"))
      val authJoined = state.select("id", "hub").join(authRaw, Seq("id"), "left")
        .select(col("id"), col("hub"), coalesce(col("a"), lit(0.0)).as("auth"))
      val s1 = authJoined
        .crossJoin(broadcast(l2Of(authJoined.select("auth"), "auth")))
        .select(col("id"), col("hub"), (col("auth") / col("__l2")).as("auth"))
      // hub(u) = Σ auth(v) for u→v, L2-normalized in-plan
      val hubRaw = s1.select(col("id").as("dst"), col("auth"))
        .join(edgesByDst, "dst")
        .groupBy(col("src").as("id")).agg(sum("auth").as("h"))
      val next = s1.select("id", "auth").join(hubRaw, Seq("id"), "left")
        .select(col("id"), coalesce(col("h"), lit(0.0)).as("hub"), col("auth"))
      next.crossJoin(broadcast(l2Of(next.select("hub"), "hub")))
        .select(col("id"), (col("hub") / col("__l2")).as("hub"), col("auth"),
          lit(true).as(SuperstepLoop.ActiveCol))
    }
    edges.unpersist(false)
    edgesByDst.unpersist(false)
    result.state.select("id", "hub", "auth")
  }
}
