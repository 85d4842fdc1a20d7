package graft.algo

import org.apache.spark.sql.{DataFrame, GraftSqlCompat}
import org.apache.spark.sql.functions._
import graft.core.{GraphOps, PropertyGraph}

/** Louvain configuration (reference: algo/src/main/java/org/neo4j/gds/louvain/
  * LouvainBaseConfig.java:54-70 — maxLevels 10, maxIterations 10,
  * tolerance 1e-4). */
final case class LouvainConfig(
  maxLevels: Int = 10,
  maxInnerIterations: Int = 10,
  tolerance: Double = 1e-4,
  /** FullSync runs pure synchronous local-move rounds (deterministic AND
    * SQL-replayable — used by the oracle); Halves (default) moves an
    * alternating pseudo-random half per round, which breaks the two-cycle
    * oscillations synchronous local moves exhibit on symmetric structures. */
  schedule: Schedule = Schedule.Sync,
  weighted: Boolean = false,
  numPartitions: Option[Int] = None)

final case class LouvainResult(
  communities: DataFrame,      // (id, communityId)
  modularity: Double,
  modularities: Seq[Double],   // per level
  ranLevels: Int)

/** Louvain multi-level modularity optimization, Spark-first.
  *
  * Reference: algo/src/main/java/org/neo4j/gds/louvain/Louvain.java:1-346
  * (level loop + graph coarsening) delegating local moves to
  * beta/modularity/ModularityOptimization.java. The reference parallelizes
  * local moves over K1-colored conflict-free batches of a shared-memory
  * graph; the Spark formulation instead runs deterministic synchronous
  * local-move rounds (every node evaluates its best neighboring community
  * from the PREVIOUS round's assignment) — one shuffle per round, map-side
  * combined, schedule-stable under any parallelism.
  *
  * Per round (level graph has symmetric edges, self-loops kept aside):
  *   gain(i -> C) = w(i,C) - k_i * Sigma_tot(C \ i) / 2m
  * argmax over neighboring communities + staying, ties to the smaller
  * community id; a node moves when the best strictly beats staying.
  * Coarsening is one groupBy(community pair) aggregation; assignments
  * compose through a join per level. Every step is a DataFrame plan — no
  * collected state, hub communities handled by partial aggregation.
  */
object Louvain {

  def run(graph: PropertyGraph, cfg: LouvainConfig = LouvainConfig()): LouvainResult = {
    val spark = graph.edges.sparkSession
    val parts = cfg.numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)

    // Symmetric weighted view WITHOUT self-loops (each undirected edge twice)
    // plus per-node self-loop weight (from input loops; later from
    // coarsening). Parallel edges aggregate by SUM, like an undirected
    // weighted projection.
    val ew = (if (cfg.weighted) GraphOps.withWeight(graph.edges)
              else graph.edges.select(col("src"), col("dst")).withColumn("weight", lit(1.0)))
      .select(col("src"), col("dst"), col("weight"))
    var sym = ew.filter(col("src") =!= col("dst"))
      .unionByName(ew.filter(col("src") =!= col("dst"))
        .select(col("dst").as("src"), col("src").as("dst"), col("weight")))
      .groupBy("src", "dst").agg(sum("weight").as("weight"))
      .repartition(parts, col("src")).persist()
    var self = ew.filter(col("src") === col("dst"))
      .groupBy(col("src").as("id")).agg(sum("weight").as("self"))
    var nodes = graph.vertices.select("id")

    // assign: original id -> current community (community of the level-graph
    // node the original node is contracted into)
    var assign = nodes.select(col("id"), col("id").as("communityId")).persist()
    assign.count()

    var modularities = Vector.empty[Double]
    var level        = 0
    var prevQ        = Double.NegativeInfinity
    var done         = false

    while (!done && level < cfg.maxLevels) {
      level += 1
      val state = localMoves(nodes, sym, self, cfg, parts)
      val q     = modularityOf(state, sym, self)
      modularities :+= q
      if (q - prevQ <= cfg.tolerance && level > 1) {
        level -= 1
        modularities = modularities.dropRight(1)
        done = true
      } else {
        prevQ = q
        // Compose assignments: original -> levelNode -> community
        val newAssign = assign
          .join(state.select(col("id").as("communityId"), col("comm")), "communityId")
          .select(col("id"), col("comm").as("communityId"))
          .repartition(parts, col("id")).persist()
        newAssign.count()
        assign.unpersist(false)
        assign = newAssign

        // Coarsen: communities become nodes; intra-community symmetric
        // weight folds into the new node's self weight (sym counts every
        // undirected edge twice, a self-loop's convention weight is half).
        val mapped = sym
          .join(state.select(col("id").as("src"), col("comm").as("csrc")), "src")
          .join(state.select(col("id").as("dst"), col("comm").as("cdst")), "dst")
          .select(col("csrc"), col("cdst"), col("weight"))
        val newSym = mapped.filter(col("csrc") =!= col("cdst"))
          .groupBy(col("csrc").as("src"), col("cdst").as("dst"))
          .agg(sum("weight").as("weight"))
          .repartition(parts, col("src")).persist()
        val intra = mapped.filter(col("csrc") === col("cdst"))
          .groupBy(col("csrc").as("id")).agg((sum("weight") / lit(2.0)).as("w"))
        val newSelf = self
          .join(state.select(col("id"), col("comm")), "id")
          .groupBy(col("comm").as("id")).agg(sum("self").as("w"))
          .unionByName(intra)
          .groupBy("id").agg(sum("w").as("self"))
        val movedAny = state.filter(col("id") =!= col("comm")).limit(1).count() > 0
        sym.unpersist(false)
        sym   = newSym
        self  = newSelf
        nodes = state.select(col("comm").as("id")).distinct()
        if (!movedAny) done = true
      }
    }
    sym.unpersist(false)

    val out = assign.select(col("id"), col("communityId"))
    LouvainResult(out, modularities.lastOption.getOrElse(0.0), modularities, level)
  }

  /** Inner local-move loop on one level graph. Returns (id, comm). */
  private def localMoves(nodes: DataFrame, sym: DataFrame, self: DataFrame,
                         cfg: LouvainConfig, parts: Int): DataFrame = {
    val spark = sym.sparkSession
    // k_i = symmetric degree + 2 * self weight; 2m = sum of k
    val deg = nodes
      .join(sym.groupBy(col("src").as("id")).agg(sum("weight").as("kd")), Seq("id"), "left")
      .join(self, Seq("id"), "left")
      .select(col("id"),
        (coalesce(col("kd"), lit(0.0)) + lit(2.0) * coalesce(col("self"), lit(0.0))).as("k"))
      .repartition(parts, col("id")).persist()
    val m2Row = deg.agg(sum("k")).first()
    val m2    = if (m2Row.isNullAt(0)) 0.0 else m2Row.getDouble(0)
    if (m2 == 0.0) { deg.unpersist(false); return nodes.select(col("id"), col("id").as("comm")) }

    var state = deg.select(col("id"), col("id").as("comm"), col("k")).persist()
    state.count()
    var iter    = 0
    var moved   = true
    while (moved && iter < cfg.maxInnerIterations) {
      iter += 1
      // Community totals from the previous round's assignment.
      val tot = state.groupBy("comm").agg(sum("k").as("tot"))
      // Weight from each node to each neighboring community.
      val wic = sym
        .join(state.select(col("id").as("dst"), col("comm").as("cand")), "dst")
        .groupBy(col("src").as("id"), col("cand")).agg(sum("weight").as("w"))
      // Candidates = neighboring communities + staying (w = own-community
      // weight or 0). gain(i->C) = w - k_i * (tot_C - [C==cur]k_i) / m2.
      val cands = state.select(col("id"), col("comm"), col("k"))
        .join(wic, Seq("id"), "left")
        .select(col("id"), col("comm"), col("k"),
          coalesce(col("cand"), col("comm")).as("cand"), coalesce(col("w"), lit(0.0)).as("w"))
        .unionByName(state.select(col("id"), col("comm"), col("k"),
          col("comm").as("cand"), lit(0.0).as("w"))) // explicit stay row
        .groupBy("id", "comm", "k", "cand").agg(max("w").as("w"))
        .join(tot.withColumnRenamed("comm", "cand"), "cand")
        .select(col("id"), col("comm"), col("cand"),
          (col("w") - col("k") * (col("tot") -
            when(col("cand") === col("comm"), col("k")).otherwise(lit(0.0))) / lit(m2)).as("gain"))
      val best = cands
        .groupBy("id", "comm")
        .agg(max(struct(col("gain"), (-col("cand")).as("neg"))).as("b"))
        .select(col("id"), col("comm"), (-col("b.neg")).as("bestCand"), col("b.gain").as("bestGain"))
      val stayGain = cands.filter(col("cand") === col("comm"))
        .select(col("id"), col("gain").as("sg"))
      val phase =
        if (cfg.schedule == Schedule.FullSync) lit(true)
        else pmod(xxhash64(col("id"), lit(iter.toLong)), lit(2L)) === lit(0L)
      val next = best.join(stayGain, "id")
        .join(state.select(col("id"), col("k")), "id")
        .select(col("id"),
          when(phase && col("bestGain") > col("sg") && col("bestCand") =!= col("comm"),
            col("bestCand")).otherwise(col("comm")).as("comm"),
          col("k"),
          (col("bestGain") > col("sg") && col("bestCand") =!= col("comm")).as("__wants"))
        .repartition(parts, col("id"))
        .persist()
      val wants = next.agg(count(when(col("__wants"), lit(1)))).first().getLong(0)
      moved = wants > 0
      state.unpersist(false)
      state = GraftSqlCompat.truncatePlan(next.drop("__wants"))
    }
    deg.unpersist(false)
    state.select("id", "comm")
  }

  /** Modularity of an assignment on a level graph:
    * Q = Sigma_C [ in_C / m2 - (tot_C / m2)^2 ] with in_C the symmetric
    * intra-community weight (self-loops count twice). Exposed for the
    * gds.beta.modularityOptimization stats surface. */
  def modularityOf(state: DataFrame, sym: DataFrame, self: DataFrame): Double = {
    val deg =
      if (state.columns.contains("k")) state.select("id", "comm", "k")
      else {
        state.select("id", "comm")
          .join(sym.groupBy(col("src").as("id")).agg(sum("weight").as("kd")), Seq("id"), "left")
          .join(self, Seq("id"), "left")
          .select(col("id"), col("comm"),
            (coalesce(col("kd"), lit(0.0)) + lit(2.0) * coalesce(col("self"), lit(0.0))).as("k"))
      }
    val m2Row = deg.agg(sum("k")).first()
    val m2    = if (m2Row.isNullAt(0)) 0.0 else m2Row.getDouble(0)
    if (m2 == 0.0) return 0.0
    val intra = sym
      .join(deg.select(col("id").as("src"), col("comm").as("c1")), "src")
      .join(deg.select(col("id").as("dst"), col("comm").as("c2")), "dst")
      .filter(col("c1") === col("c2"))
      .agg(coalesce(sum("weight"), lit(0.0))).first().getDouble(0)
    val selfW = deg.select("id", "comm")
      .join(self, Seq("id"))
      .agg(coalesce(sum("self"), lit(0.0))).first().getDouble(0)
    val totSq = deg.groupBy("comm").agg(sum("k").as("tot"))
      .agg(sum(col("tot") * col("tot"))).first().getDouble(0)
    (intra + 2.0 * selfW) / m2 - totSq / (m2 * m2)
  }

  /** Modularity of a full-resolution assignment (id, communityId) on the
    * ORIGINAL graph — the gds.beta.modularityOptimization stats value. */
  def modularity(graph: PropertyGraph, assignment: DataFrame,
                 weighted: Boolean = false): Double = {
    val ew = (if (weighted) GraphOps.withWeight(graph.edges)
              else graph.edges.select(col("src"), col("dst")).withColumn("weight", lit(1.0)))
    val sym = ew.filter(col("src") =!= col("dst"))
      .unionByName(ew.filter(col("src") =!= col("dst"))
        .select(col("dst").as("src"), col("src").as("dst"), col("weight")))
      .groupBy("src", "dst").agg(sum("weight").as("weight"))
    val self = ew.filter(col("src") === col("dst"))
      .groupBy(col("src").as("id")).agg(sum("weight").as("self"))
    modularityOf(assignment.select(col("id"), col("communityId").as("comm")), sym, self)
  }
}
