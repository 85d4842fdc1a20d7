package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.PropertyGraph

final case class HitsConfig(maxIterations: Int = 20, numPartitions: Option[Int] = None)

/** HITS hubs & authorities (reference: alpha/alpha-proc/src/main/java/org/
  * neo4j/gds/pregel/Hits.java — a Pregel computation alternating
  * auth(v) = Σ hub(u) over in-edges and hub(u) = Σ auth(v) over out-edges,
  * each L2-normalized per half-step).
  *
  * Two shuffle aggregations per iteration; the two L2 scalars (the
  * masterCompute analogue) are 1-row aggregates broadcast back into the same
  * plan, so each iteration costs exactly ONE driver action (the persist-
  * materializing count) — round 1 collected both L2 scalars on the driver
  * per iteration, three synchronization points per step. Returns
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

    var state = graph.vertices.select("id")
      .repartition(parts, col("id"))
      .select(col("id"), lit(1.0).as("hub"), lit(1.0).as("auth"))
      .persist()
    state.count()

    def l2Of(df: DataFrame, c: String): DataFrame =
      df.agg(sqrt(sum(col(c) * col(c))).as("__l2"))
        .select(when(col("__l2") === 0.0, lit(1.0)).otherwise(col("__l2")).as("__l2"))

    for (_ <- 1 to cfg.maxIterations) {
      // auth(v) = Σ hub(u) for u→v, L2-normalized in-plan
      val authRaw = state.select(col("id").as("src"), col("hub"))
        .join(edges, "src")
        .groupBy(col("dst").as("id")).agg(sum("hub").as("a"))
      val s1 = state.select("id", "hub").join(authRaw, Seq("id"), "left")
        .select(col("id"), col("hub"), coalesce(col("a"), lit(0.0)).as("auth"))
        .crossJoin(broadcast(l2Of(state.select("id", "hub").join(authRaw, Seq("id"), "left")
          .select(coalesce(col("a"), lit(0.0)).as("auth")), "auth")))
        .select(col("id"), col("hub"), (col("auth") / col("__l2")).as("auth"))
        .persist()
      // hub(u) = Σ auth(v) for u→v, L2-normalized in-plan
      val hubRaw = s1.select(col("id").as("dst"), col("auth"))
        .join(edgesByDst, "dst")
        .groupBy(col("src").as("id")).agg(sum("auth").as("h"))
      val next = s1.select("id", "auth").join(hubRaw, Seq("id"), "left")
        .select(col("id"), coalesce(col("h"), lit(0.0)).as("hub"), col("auth"))
      val hl2 = l2Of(next.select("hub"), "hub")
      val out = next.crossJoin(broadcast(hl2))
        .select(col("id"), (col("hub") / col("__l2")).as("hub"), col("auth"))
        .persist()
      out.count()
      state.unpersist(false); s1.unpersist(false)
      state = org.apache.spark.sql.GraftSqlCompat.truncatePlan(out)
    }
    edges.unpersist(false)
    edgesByDst.unpersist(false)
    state.select("id", "hub", "auth")
  }
}
