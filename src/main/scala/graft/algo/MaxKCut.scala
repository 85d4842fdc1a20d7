package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{GraphOps, Orientation, PropertyGraph}

/** Approximate maximum k-cut: partition nodes into k classes maximizing the
  * total weight of cross-class edges.
  *
  * Reference: alpha/alpha-algo/src/main/java/org/neo4j/gds/impl/
  * approxmaxkcut/ApproxMaxKCut.java — sequential variable-neighborhood
  * search. The Spark formulation is synchronous batched local search:
  * every node scores each class by the weight of its same-class neighbors
  * and greedily moves to the least-conflicting class; moves apply in
  * alternating hash-parity batches (a 2-coloring of the move schedule) so
  * neighboring nodes never swap simultaneously and oscillate. Each round is
  * one edge shuffle + one aggregation — the same plan shape as label
  * propagation, converging when no batch improves. Seeded hash init makes
  * runs reproducible. */
object MaxKCut {

  final case class Result(assignments: DataFrame, cutWeight: Double,
                          totalWeight: Double, ranIterations: Int)

  def run(graph: PropertyGraph, k: Int = 2, maxIterations: Int = 8,
          seed: Long = 42L): Result = {
    require(k >= 2, "k must be >= 2")
    val spark = graph.edges.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions

    val edges = GraphOps.withWeight(
        PropertyGraph(graph.vertices, GraphOps.withWeight(graph.edges))
          .orientedEdges(Orientation.Undirected))
      .filter(col("src") =!= col("dst"))
      .repartition(parts, col("src")).persist()
    edges.count()

    var cached = graph.vertices
      .select(col("id"), pmod(xxhash64(col("id"), lit(seed)), lit(k.toLong))
        .cast("int").as("cls"))
      .repartition(parts, col("id")).persist()
    cached.count()
    // assign is referenced twice per iteration (neighbor pull + final join):
    // without per-iteration plan truncation the logical plan DOUBLES per
    // round (2^iters nodes — OOMs the driver before any data moves)
    var assign = org.apache.spark.sql.GraftSqlCompat.truncatePlan(cached)

    def sameClassWeight(a: DataFrame): Double = {
      val r = edges
        .join(a.select(col("id").as("src"), col("cls").as("c1")), "src")
        .join(a.select(col("id").as("dst"), col("cls").as("c2")), "dst")
        .filter(col("c1") === col("c2"))
        .agg(coalesce(sum("weight"), lit(0.0))).collect()(0).getDouble(0)
      r / 2.0 // undirected view double-counts
    }

    val totalWeight = edges.agg(coalesce(sum("weight"), lit(0.0)))
      .collect()(0).getDouble(0) / 2.0

    var intra = sameClassWeight(assign)
    var iter = 0
    var improved = true
    graft.pregel.SuperstepLoop.withIterationConf(spark) {
    while (improved && iter < maxIterations) {
      iter += 1
      // per (node, class): weight of neighbors currently in that class
      val pull = edges
        .join(assign.select(col("id").as("src"), col("cls").as("nc")), "src")
        .groupBy(col("dst").as("id"), col("nc"))
        .agg(sum("weight").as("w"))
      // best class = least same-class weight; absent classes weigh 0, so
      // compare the best PRESENT class against zero and fall back to the
      // smallest class id with no neighbors when that is strictly better.
      val best = pull.groupBy("id").agg(
        min(struct(col("w"), col("nc"))).as("pick"),
        collect_set("nc").as("present"))
        .select(col("id"), col("pick.w").as("bestW"), col("pick.nc").as("bestC"),
          filter(sequence(lit(0), lit(k - 1)),
            c => !array_contains(col("present"), c)).as("absent"))
        .select(col("id"),
          when(size(col("absent")) > 0 && col("bestW") > lit(0.0),
            array_min(col("absent"))).otherwise(col("bestC")).as("target"))
      // alternating hash-parity batches: half the nodes may move per round
      val nextAssign = assign.join(best, Seq("id"), "left")
        .select(col("id"),
          when(col("target").isNotNull &&
               pmod(xxhash64(col("id"), lit(seed + 1)), lit(2L)) === lit(iter % 2),
            col("target").cast("int")).otherwise(col("cls")).as("cls"))
        .repartition(parts, col("id")).persist()
      // ONE action per round: the intra-weight job's first pass over
      // nextAssign populates its cache — no separate count() needed.
      val nextIntra = sameClassWeight(nextAssign)
      if (nextIntra < intra - 1e-12) {
        cached.unpersist(false)
        cached = nextAssign
        assign = org.apache.spark.sql.GraftSqlCompat.truncatePlan(nextAssign)
        intra = nextIntra
      } else {
        nextAssign.unpersist(false)
        improved = false
      }
    }
    }
    edges.unpersist(false)
    val out = assign.select(col("id"), col("cls").cast("long").as("community"))
    Result(out, totalWeight - intra, totalWeight, iter)
  }
}
