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
  * Two shuffle aggregations per iteration plus two scalar L2 reductions
  * (the masterCompute analogue). Returns (id, hub, auth).
  */
object Hits {

  def run(graph: PropertyGraph, cfg: HitsConfig = HitsConfig()): DataFrame = {
    val spark = graph.edges.sparkSession
    val parts = cfg.numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val edges = graph.edges.select("src", "dst")
      .repartition(parts, col("src")).persist()

    var state = graph.vertices.select("id")
      .repartition(parts, col("id"))
      .select(col("id"), lit(1.0).as("hub"), lit(1.0).as("auth"))
      .persist()
    state.count()

    for (_ <- 1 to cfg.maxIterations) {
      // auth(v) = Σ hub(u) for u→v, then L2 normalize
      val authRaw = state.select(col("id").as("src"), col("hub"))
        .join(edges, "src")
        .groupBy(col("dst").as("id")).agg(sum("hub").as("a"))
      val s1 = state.select("id", "hub").join(authRaw, Seq("id"), "left")
        .select(col("id"), col("hub"), coalesce(col("a"), lit(0.0)).as("auth"))
        .persist()
      val an = s1.agg(sqrt(sum(col("auth") * col("auth")))).first().getDouble(0)
      // hub(u) = Σ auth(v) for u→v, then L2 normalize
      val hubRaw = s1.select(col("id").as("dst"), (col("auth") / lit(if (an == 0) 1 else an)).as("na"))
        .join(edges, "dst")
        .groupBy(col("src").as("id")).agg(sum("na").as("h"))
      val s2 = s1.select(col("id"), (col("auth") / lit(if (an == 0) 1 else an)).as("auth"))
        .join(hubRaw, Seq("id"), "left")
        .select(col("id"), coalesce(col("h"), lit(0.0)).as("hub"), col("auth"))
        .persist()
      val hn = s2.agg(sqrt(sum(col("hub") * col("hub")))).first().getDouble(0)
      val next = s2.select(col("id"),
        (col("hub") / lit(if (hn == 0) 1 else hn)).as("hub"), col("auth"))
        .persist()
      next.count()
      state.unpersist(false); s1.unpersist(false); s2.unpersist(false)
      state = org.apache.spark.sql.GraftSqlCompat.truncatePlan(next)
    }
    edges.unpersist(false)
    state.select("id", "hub", "auth")
  }
}
