package graft.algo

import org.apache.spark.sql.{DataFrame, GraftSqlCompat}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{GraphOps, PropertyGraph}

/** node2vec embeddings: biased second-order random walks + skip-gram.
  *
  * Reference: algo/src/main/java/org/neo4j/gds/embeddings/node2vec/
  * {Node2Vec.java,RandomWalk.java,TrainingTask.java} — per-thread walkers
  * with in-memory CSR cursors and a hand-rolled hierarchical-softmax
  * skip-gram trainer. Neither distributes; the Spark formulation:
  *
  *  - WALKS: one frontier DataFrame per step over an indexed edge table
  *    (src, pos, dst) — adjacency is never collected per node, so a
  *    10M-degree hub costs two equi-joins like everyone else. The
  *    return/in-out bias (p, q) uses REJECTION SAMPLING, the same trick the
  *    reference's walker uses (RandomWalk.java walkOneStep): draw a uniform
  *    neighbor, accept with probability weight/maxWeight. All rejection
  *    rounds for a step are evaluated in ONE plan (explode over round ids +
  *    min-accepted aggregation) instead of a driver loop per retry; after
  *    `rejectionRounds` consecutive rejections the last draw is accepted
  *    (bounded-round variant of the reference's unbounded retry loop —
  *    the residual bias is ≤ (1-minAccept)^rounds and documented).
  *  - TRAINING: Spark ML's distributed Word2Vec (skip-gram, per-partition
  *    SGD + synchronized averaging) over the walk sentences. Sentences are
  *    hash-partitioned and sorted by walkId so training input is
  *    deterministic at any parallelism.
  *
  * Everything random is a pure function of (walkId, step, round, seed):
  * walks are bit-identical across runs and parallelism levels.
  */
object Node2Vec {

  final case class Node2VecConfig(
      embeddingDimension: Int = 128,
      walkLength: Int = 80,
      walksPerNode: Int = 10,
      returnFactor: Double = 1.0, // p: lower = more backtracking
      inOutFactor: Double = 1.0,  // q: lower = more exploration (DFS-like)
      windowSize: Int = 10,
      iterations: Int = 1,
      minCount: Int = 0,
      rejectionRounds: Int = 6,
      seed: Long = 42L) {
    require(returnFactor > 0 && inOutFactor > 0, "p and q must be positive")
    require(walkLength >= 2 && walksPerNode >= 1 && embeddingDimension >= 1)
  }

  final case class Result(embeddings: DataFrame, walks: DataFrame)

  /** Biased second-order walks: (walkId, step, nodeId), step 0..walkLength-1
    * (walks stop early at sinks). Deterministic. */
  def biasedWalks(graph: PropertyGraph, cfg: Node2VecConfig): DataFrame = {
    val spark = graph.edges.sparkSession
    val parts = GraphOps.adaptiveParts(spark, graph.edges.count())
    val p = cfg.returnFactor
    val q = cfg.inOutFactor

    // indexed adjacency: (src, pos, dst), pos dense in [0, deg)
    val idx = graph.edges.select("src", "dst").distinct()
      .withColumn("pos",
        row_number().over(Window.partitionBy("src").orderBy("dst")) - 1)
      .repartition(parts, col("src")).persist()
    val deg = idx.groupBy("src").agg(count(lit(1)).as("deg"))
      .repartition(parts, col("src")).persist()
    // membership view for the in-out test: is cand adjacent to prev?
    val adj = idx.select(col("src").as("prev"), col("dst").as("cand"),
      lit(true).as("isAdj"))

    // step 0 + uniform first hop
    val walk0 = graph.vertices
      .crossJoin(spark.range(cfg.walksPerNode).select(col("id").as("w")))
      .select(concat_ws("_", col("id"), col("w")).as("walkId"),
        col("id").as("cur"))
      .repartition(parts, col("cur"))
    val hop1 = walk0.join(deg, walk0("cur") === deg("src"))
      .select(col("walkId"), col("cur").as("prev"),
        pmod(xxhash64(col("walkId"), lit(1), lit(cfg.seed)), col("deg")).as("pos"))
    var state = hop1
      .join(idx, hop1("prev") === idx("src") && hop1("pos") === idx("pos"))
      .select(col("walkId"), col("prev"), col("dst").as("cur"))
      .persist()

    val steps = scala.collection.mutable.ArrayBuffer[DataFrame](
      walk0.select(col("walkId"), lit(0).as("step"), col("cur").as("nodeId")),
      state.select(col("walkId"), lit(1).as("step"), col("cur").as("nodeId")))
    val frames = scala.collection.mutable.ArrayBuffer[DataFrame](state)

    val unbiased = p == 1.0 && q == 1.0
    val rounds = if (unbiased) 1 else cfg.rejectionRounds
    val maxW = math.max(1.0 / p, math.max(1.0, 1.0 / q))

    for (s <- 2 until cfg.walkLength) {
      // R draws per pending walk in one plan; first accepted round wins
      val tries = state.withColumn("r", explode(lit((1 to rounds).toArray)))
      val drawn = tries.join(deg, tries("cur") === deg("src"))
        .select(col("walkId"), col("prev"), col("cur"), col("r"),
          pmod(xxhash64(col("walkId"), lit(s), col("r"), lit(cfg.seed)),
            col("deg")).as("pos"))
      val idxC = idx.select(col("src").as("csrc"), col("pos").as("cpos"),
        col("dst").as("cand"))
      val cand = drawn
        .join(idxC, drawn("cur") === idxC("csrc") && drawn("pos") === idxC("cpos"))
        .select(col("walkId"), col("prev"), col("cur"), col("r"), col("cand"))
      val weighted =
        if (unbiased) cand.withColumn("ok", lit(true))
        else {
          val u = pmod(xxhash64(col("walkId"), lit(s), col("r"),
            lit(cfg.seed + 7919L)), lit(1000000000L)).cast("double") / 1e9
          cand.join(adj, Seq("prev", "cand"), "left")
            .withColumn("w",
              when(col("cand") === col("prev"), lit(1.0 / p))
                .when(col("isAdj"), lit(1.0))
                .otherwise(lit(1.0 / q)))
            .withColumn("ok", u * lit(maxW) < col("w"))
        }
      val next = weighted.groupBy("walkId").agg(
          max(col("cur")).as("prevNext"), // constant per walk
          min(when(col("ok"), struct(col("r"), col("cand")))).as("acc"),
          max(struct(col("r"), col("cand"))).as("fallback"))
        .select(col("walkId"), col("prevNext").as("prev"),
          coalesce(col("acc.cand"), col("fallback.cand")).as("cur"))
        .repartition(parts, col("walkId"))
        .persist()
      frames += next
      // depth-1 logical plan per step: 80-step walks would otherwise carry
      // an 80-layer join-agg plan into every downstream reference
      state = GraftSqlCompat.truncatePlan(next)
      steps += state.select(col("walkId"), lit(s).as("step"),
        col("cur").as("nodeId"))
    }

    val out = steps.reduce(_ unionByName _).persist()
    out.count() // one action materializes all hops through their caches
    frames.foreach(_.unpersist(false))
    idx.unpersist(false); deg.unpersist(false)
    out
  }

  /** Full node2vec: walks + Word2Vec skip-gram.
    * Returns (id, embedding: array<double>). */
  def run(graph: PropertyGraph, cfg: Node2VecConfig = Node2VecConfig()): Result = {
    val spark = graph.edges.sparkSession
    val parts = GraphOps.adaptiveParts(spark, graph.edges.count())
    val walks = biasedWalks(graph, cfg)

    // sentences: per-walk node sequence ordered by step; deterministic
    // partition contents AND order so Word2Vec's per-partition SGD streams
    // identical input every run
    val sentences = walks
      .groupBy("walkId")
      .agg(transform(array_sort(collect_list(struct(col("step"), col("nodeId")))),
        x => x("nodeId").cast("string")).as("walk"))
      .repartition(parts, col("walkId"))
      .sortWithinPartitions("walkId")
      .persist()
    sentences.count()

    val w2v = new org.apache.spark.ml.feature.Word2Vec()
      .setInputCol("walk").setOutputCol("vec")
      .setVectorSize(cfg.embeddingDimension)
      .setWindowSize(cfg.windowSize)
      .setMinCount(cfg.minCount)
      .setMaxIter(cfg.iterations)
      .setSeed(cfg.seed)
      .setNumPartitions(math.max(1, parts / 4))
    val model = w2v.fit(sentences)
    sentences.unpersist(false)

    val emb = model.getVectors
      .select(col("word").cast("long").as("id"),
        org.apache.spark.ml.functions.vector_to_array(col("vector"), "float64")
          .as("embedding"))
    Result(emb, walks)
  }
}
