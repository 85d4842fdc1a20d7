package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.PropertyGraph
import graft.pregel.{LoopConfig, SuperstepLoop}

/** Strongly connected components.
  *
  * Reference: alpha/alpha-algo/src/main/java/org/neo4j/gds/impl/scc/
  * SccAlgorithm.java:1-219 — a sequential iterative Tarjan. A stack-based
  * DFS does not distribute, so the Spark formulation is the classic
  * coloring/peeling decomposition (Orzan-style, the standard Pregel SCC):
  *
  *  repeat until no nodes remain:
  *    1. FORWARD max-id propagation to fixpoint: color(v) = max id that
  *       reaches v within the remaining subgraph (frontier loop, one
  *       shuffle per round);
  *    2. every color class c with pivot c (color(c) == c) peels the SCC
  *       {v : color(v) = c and v reaches c within the color class} via a
  *       BACKWARD reachability loop;
  *    3. peeled nodes get sccId = min member id (canonical, matching the
  *       WCC min-id convention); the subgraph shrinks and repeats.
  *
  * Many SCCs peel per outer round (one per color class), so rounds stay
  * small on real graphs. Emits (id, sccId). */
object Scc {

  def run(graph: PropertyGraph, maxOuterRounds: Int = 1000,
          maxInnerRounds: Int = 200): DataFrame = {
    val spark = graph.edges.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions

    var remV = graph.vertices.select("id").persist()
    var remE = graph.edges.select("src", "dst")
      .filter(col("src") =!= col("dst")).distinct()
      .repartition(parts, col("src")).persist()
    remV.count(); remE.count()

    var pieces = List.empty[DataFrame]
    var outer  = 0
    var remaining = remV.count()

    while (remaining > 0 && outer < maxOuterRounds) {
      outer += 1
      // 0. trim: nodes with no in- or no out-edge in the remaining subgraph
      // are singleton SCCs — peel them in bulk (the standard trim step; it
      // collapses DAG-like regions without paying a coloring fixpoint).
      val trimmed = remV
        .join(remE.select(col("src").as("id")).distinct(), Seq("id"), "left_anti")
        .unionByName(remV
          .join(remE.select(col("dst").as("id")).distinct(), Seq("id"), "left_anti"))
        .distinct()
        .select(col("id"), col("id").as("sccId")).persist()
      if (trimmed.count() > 0) {
        pieces ::= trimmed
        val newV = remV.join(trimmed.select("id"), Seq("id"), "left_anti")
          .repartition(parts, col("id")).persist()
        val newE = remE
          .join(newV.select(col("id").as("src")), Seq("src"), "left_semi")
          .join(newV.select(col("id").as("dst")), Seq("dst"), "left_semi")
          .select("src", "dst")
          .repartition(parts, col("src")).persist()
        remaining = newV.count(); newE.count()
        remV.unpersist(false); remE.unpersist(false)
        remV = newV; remE = newE
        if (remaining == 0) {
          // fall through to loop exit
        }
      } else trimmed.unpersist(false)
      if (remaining == 0) {
        // nothing left after trimming
      } else {
      // 1. forward max-color fixpoint
      val colorInit = remV
        .select(col("id"), col("id").as("color"), lit(true).as(SuperstepLoop.ActiveCol))
        .repartition(parts, col("id"))
      val colors = SuperstepLoop.run(colorInit, LoopConfig(maxInnerRounds)) { (state, _) =>
        val msgs = state.filter(col(SuperstepLoop.ActiveCol))
          .select(col("id").as("src"), col("color"))
          .join(remE, "src")
          .groupBy(col("dst").as("id")).agg(max("color").as("cand"))
        state.select("id", "color").join(msgs, Seq("id"), "left")
          .select(col("id"), greatest(col("color"), coalesce(col("cand"), col("color"))).as("color"),
            (coalesce(col("cand"), lit(Long.MinValue)) > col("color")).as(SuperstepLoop.ActiveCol))
      }.state.select("id", "color").persist()
      colors.count()

      // 2. backward reach from each pivot within its color class
      val colored = remE
        .join(colors.select(col("id").as("src"), col("color").as("c1")), "src")
        .join(colors.select(col("id").as("dst"), col("color").as("c2")), "dst")
        .filter(col("c1") === col("c2"))
        .select(col("src"), col("dst"), col("c1").as("color"))
        .repartition(parts, col("dst")).persist()
      val reachInit = colors
        .select(col("id"), col("color"), (col("id") === col("color")).as("reached"))
        .withColumn(SuperstepLoop.ActiveCol, col("reached"))
        .repartition(parts, col("id"))
      val reach = SuperstepLoop.run(reachInit, LoopConfig(maxInnerRounds)) { (state, _) =>
        // reached flows BACKWARD: v reached and edge u->v (same color) => u
        val msgs = state.filter(col(SuperstepLoop.ActiveCol))
          .select(col("id").as("dst"))
          .join(colored, "dst")
          .select(col("src").as("id")).distinct()
          .withColumn("cand", lit(true))
        state.select("id", "color", "reached").join(msgs, Seq("id"), "left")
          .select(col("id"), col("color"),
            (col("reached") || coalesce(col("cand"), lit(false))).as("reached"),
            (coalesce(col("cand"), lit(false)) && !col("reached")).as(SuperstepLoop.ActiveCol))
      }.state.persist()
      reach.count()

      // 3. peel: reached nodes form SCCs keyed by color; canonical id = min member
      val members = reach.filter(col("reached"))
        .select(col("id"), col("color"))
      val canon = members.groupBy("color").agg(min("id").as("sccId"))
      val piece = members.join(canon, "color").select(col("id"), col("sccId")).persist()
      piece.count()
      pieces ::= piece

      val newV = remV.join(piece.select("id"), Seq("id"), "left_anti")
        .repartition(parts, col("id")).persist()
      val newE = remE
        .join(newV.select(col("id").as("src")), Seq("src"), "left_semi")
        .join(newV.select(col("id").as("dst")), Seq("dst"), "left_semi")
        .select("src", "dst")
        .repartition(parts, col("src")).persist()
      remaining = newV.count(); newE.count()
      remV.unpersist(false); remE.unpersist(false)
      colors.unpersist(false); colored.unpersist(false); reach.unpersist(false)
      remV = newV; remE = newE
      }
    }
    remV.unpersist(false); remE.unpersist(false)
    val out = pieces match {
      case Nil => graph.vertices.select(col("id"), col("id").as("sccId")).limit(0)
      case l   => l.reduce(_ unionByName _)
    }
    val result = out.persist()
    result.count()
    pieces.foreach(_.unpersist(false))
    result
  }
}
