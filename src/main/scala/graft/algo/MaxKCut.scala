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
          seed: Long = 42L, localTailThreshold: Long = 500000L): Result = {
    require(k >= 2, "k must be >= 2")
    val spark = graph.edges.sparkSession
    val edgeCount = graph.edges.count()
    if (localTailThreshold >= 0L && edgeCount <= localTailThreshold)
      return runLocal(graph, k, maxIterations, seed)
    val parts = GraphOps.adaptiveParts(spark, edgeCount)
    GraphOps.withShuffleWidth(spark, parts) {

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

  /** Driver-local tail for sub-threshold graphs: the EXACT same synchronous
    * batched local search — XXH64-seeded init, least-conflict class with
    * empty-class fallback, alternating hash-parity move batches, accept a
    * round only when the intra weight strictly improves — on arrays.
    * Deterministic, so local == distributed exactly (asserted in
    * CommunityExtrasSpec). */
  private def runLocal(graph: PropertyGraph, k: Int, maxIterations: Int,
                       seed: Long): Result = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import scala.collection.mutable
    val spark = graph.edges.sparkSession
    val ids = graph.vertices.select("id").collect().map(_.getLong(0))
    val n   = ids.length
    val idx = mutable.HashMap.empty[Long, Int]
    var i = 0
    while (i < n) { idx(ids(i)) = i; i += 1 }
    // symmetric weighted multigraph (parallel edges keep multiplicity,
    // loops dropped) — the exact rows the distributed path consumes
    val ew = graft.core.GraphOps.withWeight(graph.edges)
      .select("src", "dst", "weight").collect()
    val sb = mutable.ArrayBuffer.empty[(Int, Int, Double)]
    ew.foreach { r =>
      (idx.get(r.getLong(0)), idx.get(r.getLong(1))) match {
        case (Some(a), Some(b)) if a != b =>
          val w = r.getDouble(2); sb += ((a, b, w)); sb += ((b, a, w))
        case _ => ()
      }
    }
    val eArr = sb.toArray
    def pm(h: Long, m: Long): Long = (h % m + m) % m

    val cls = new Array[Int](n)
    i = 0
    while (i < n) {
      cls(i) = pm(XXH64.hashLong(seed, XXH64.hashLong(ids(i), 42L)), k.toLong).toInt
      i += 1
    }
    val moverParity = new Array[Int](n)
    i = 0
    while (i < n) {
      moverParity(i) =
        pm(XXH64.hashLong(seed + 1, XXH64.hashLong(ids(i), 42L)), 2L).toInt
      i += 1
    }
    def sameClassWeight(a: Array[Int]): Double = {
      var s = 0.0
      eArr.foreach { case (u, v, w) => if (a(u) == a(v)) s += w }
      s / 2.0
    }
    val totalWeight = eArr.iterator.map(_._3).sum / 2.0

    var intra    = sameClassWeight(cls)
    var iter     = 0
    var improved = true
    while (improved && iter < maxIterations) {
      iter += 1
      // per (node, class): weight of neighbors currently in that class;
      // presence = some neighbor occupies the class (a row in the
      // distributed pull), tracked separately from the weight sum
      val pull    = Array.fill(n)(null: Array[Double])
      val present = Array.fill(n)(null: Array[Boolean])
      eArr.foreach { case (u, v, w) =>
        if (pull(v) == null) {
          pull(v) = new Array[Double](k); present(v) = new Array[Boolean](k)
        }
        pull(v)(cls(u)) += w
        present(v)(cls(u)) = true
      }
      val next = cls.clone()
      i = 0
      while (i < n) {
        if (pull(i) != null && moverParity(i) == iter % 2) {
          // best PRESENT class = least weight, ties smaller id; prefer the
          // smallest ABSENT class when the best present weight is > 0
          val p = pull(i); val pr = present(i)
          var bestC = -1; var bestW = Double.MaxValue
          var c = 0
          while (c < k) {
            if (pr(c) && p(c) < bestW) { bestW = p(c); bestC = c }
            c += 1
          }
          var absentC = -1
          c = 0
          while (c < k && absentC < 0) { if (!pr(c)) absentC = c; c += 1 }
          next(i) = if (absentC >= 0 && bestW > 0.0) absentC else bestC
        }
        i += 1
      }
      val nextIntra = sameClassWeight(next)
      if (nextIntra < intra - 1e-12) {
        System.arraycopy(next, 0, cls, 0, n)
        intra = nextIntra
      } else improved = false
    }
    val out = spark.createDataFrame(ids.indices.map(v => (ids(v), cls(v).toLong)))
      .toDF("id", "community")
    Result(out, totalWeight - intra, totalWeight, iter)
  }
}
