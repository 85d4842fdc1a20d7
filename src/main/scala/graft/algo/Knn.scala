package graft.algo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.Ann

/** K-nearest-neighbours over a node embedding column via NN-descent.
  *
  * Reference: algo/src/main/java/org/neo4j/gds/similarity/knn/Knn.java:1-530
  * (Dong et al. NN-descent: random initial lists, then rounds of
  * "neighbours-of-neighbours" local joins — forward + reversed lists — with
  * per-node bounded candidate sampling, stopping when fewer than
  * `deltaThreshold * n * k` list entries changed in a round).
  *
  * Spark formulation — per round:
  *   1. adjacency = current lists ∪ reversed lists, the reverse side CAPPED
  *      at k per node (deterministic hash-ordered sample — the reference's
  *      `sampledK` bound) so a popular vector can't quadratically explode the
  *      local join;
  *   2. local join: two entries sharing a list owner become a candidate pair
  *      (one self-equi-join on the owner, bare-id shuffle, distinct);
  *   3. exact cosine on candidates (joined to vectors twice — co-partitioned
  *      hash joins), 5-dp rounded for cross-run determinism;
  *   4. union with the incumbent lists → per-node top-k window (partitioned
  *      by node: no global sort anywhere).
  *
  * Every shuffle key is a node id or id pair; per-node work is bounded by
  * (2k)² candidates — the O(n²) brute-force pair space is never formed. The
  * convergence count is one tiny action per round (the round is already a
  * multi-shuffle job, so the driver sync is not the bottleneck — unlike the
  * per-superstep case SuperstepLoop.fusedSteps removes).
  */
object Knn {

  /** Reference defaults: KnnBaseConfig.java (sampleRate 0.5 expressed here
    * as the hard reverse-cap k, deltaThreshold 0.001, maxIterations 100 —
    * bounded lower here because DataFrame rounds are coarser-grained). */
  final case class KnnConfig(
    k: Int = 10,
    maxIterations: Int = 8,
    deltaThreshold: Double = 0.001,
    similarityCutoff: Double = 0.0,
    randomJoins: Int = 4,
    seed: Long = 42L)

  final case class KnnResult(neighbors: DataFrame, ranIterations: Int, didConverge: Boolean)

  /** Scale-safe dense index 0..n-1 for arbitrary node ids, ordered by id:
    * hash-bucket the ids, rank within each bucket (partitioned window — no
    * single-task global sort), then add per-bucket prefix offsets (one tiny
    * aggregation collected and broadcast). */
  def denseIndex(df: DataFrame, idCol: String, buckets: Int = 64): DataFrame = {
    val ids = df.select(col(idCol).as("id")).distinct()
      .withColumn("__b", pmod(xxhash64(col("id")), lit(buckets.toLong)))
    // bucket by hash but rank by id: indices are a permutation, which is all
    // the pseudo-random init needs (it never relies on index order)
    val local = ids.withColumn("__r",
      row_number().over(Window.partitionBy("__b").orderBy("id")).cast("long"))
    val counts = local.groupBy("__b").agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft(0L)(_ + _._2).zip(counts).map {
      case (off, (b, _)) => (b, off)
    }
    val offDf = df.sparkSession.createDataFrame(offsets).toDF("__b", "__off")
    local.join(broadcast(offDf), "__b")
      .select(col("id"), (col("__off") + col("__r") - 1L).as("idx"))
  }

  /** Top-k approximate neighbour lists: (id, neighbor_id, similarity, rank).
    * `vectors` must have (idCol, vecCol: array<float/double>). */
  def run(vectors: DataFrame, cfg: KnnConfig = KnnConfig(),
          idCol: String = "vec_id", vecCol: String = "embedding"): KnnResult = {
    val spark = vectors.sparkSession
    val sessionParts = spark.sessionState.conf.numShufflePartitions
    val n0 = vectors.select(col(idCol)).count()
    // shuffle width sized by WORK, not rows: candidate scoring is
    // O(n·(2k)²·dim), so ~100 vectors per partition keeps every core busy
    // on mid-size corpora while tiny unit-test corpora still skip the
    // 32-way scheduling overhead; large corpora use the session's width
    val parts = math.max(2, math.min(sessionParts, (n0 / 100L).toInt + 1))
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try runWithParts(vectors, cfg, idCol, vecCol, parts)
    finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  private def runWithParts(vectors: DataFrame, cfg: KnnConfig,
                           idCol: String, vecCol: String, parts: Int): KnnResult = {
    val spark = vectors.sparkSession
    // store L2-NORMALIZED double vectors once: cosine then degrades to a
    // single dot product per candidate pair instead of three interpreted
    // higher-order aggregates (dot + two norms) — the hot path is pair
    // scoring, so this is a ~3x cut of the per-round CPU
    val rawNorm = sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x))
    val vecs = vectors
      .select(col(idCol).as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .select(col("id"),
        when(rawNorm === 0.0, col("v"))
          .otherwise(transform(col("v"), x => x / rawNorm)).as("v"))
      .repartition(parts, col("id")).persist()
    val n = vecs.count()
    val k = math.min(cfg.k.toLong, math.max(0L, n - 1)).toInt
    if (k == 0) {
      val empty = spark.emptyDataFrame
        .withColumn("id", lit(0L)).withColumn("neighbor_id", lit(0L))
        .withColumn("similarity", lit(0.0)).withColumn("rank", lit(0))
        .limit(0)
      return KnnResult(empty, 0, didConverge = true)
    }

    val index = denseIndex(vecs, "id").persist()
    index.count()

    // vectors are broadcast while the corpus fits an executor (the cheap
    // side of a few-hundred-MB bound); past that, co-partitioned hash joins
    val vside = if (n <= 500000L) broadcast(vecs) else vecs
    def withSim(pairs: DataFrame): DataFrame =
      pairs
        .join(vside.select(col("id"), col("v").as("va")), "id")
        .join(vside.select(col("id").as("neighbor_id"), col("v").as("vb")), "neighbor_id")
        .select(col("id"), col("neighbor_id"),
          graft.core.Num.roundTo(
            graft.functions.VectorExprs.vecDot(col("va"), col("vb")), 5)
            .as("similarity"))

    // Pseudo-random init (Knn.java initializeRandomNeighbors): k distinct
    // hash-derived partners per node, skewed around the self index to avoid
    // self-pairs without rejection sampling.
    val initPairs = index
      .select(col("id"), col("idx"), explode(sequence(lit(0), lit(k - 1))).as("j"))
      .withColumn("cand", pmod(xxhash64(col("idx"), lit(cfg.seed), col("j")), lit(n - 1)))
      .withColumn("nidx", when(col("cand") >= col("idx"), col("cand") + 1L).otherwise(col("cand")))
      .join(index.select(col("idx").as("nidx"), col("id").as("neighbor_id")), "nidx")
      .select("id", "neighbor_id").distinct()

    val topW = Window.partitionBy("id").orderBy(desc("similarity"), col("neighbor_id"))
    def topK(scored: DataFrame): DataFrame =
      scored.withColumn("rank", row_number().over(topW)).filter(col("rank") <= k)

    // `cachedState` holds storage; `state` is the PLAN-TRUNCATED view handed
    // to the next round — each round references the state several times, so
    // without truncation the logical plan grows exponentially and the
    // driver dies planning, not executing. State carries an `is_new` flag:
    // Dong et al.'s incremental rule — only entries that ENTERED a list
    // last round generate candidates (new x all), so round cost tracks the
    // churn, not the full list size, and late rounds are nearly free.
    var cachedState = topK(withSim(initPairs))
      .withColumn("is_new", lit(true)).persist()
    cachedState.count()
    var state = org.apache.spark.sql.GraftSqlCompat.truncatePlan(cachedState)

    var iter = 0
    var converged = false
    val stopAt = math.max(1L, (cfg.deltaThreshold * n * k).toLong)
    while (!converged && iter < cfg.maxIterations) {
      iter += 1
      // adjacency entries (owner x, member nb): forward lists + hash-capped
      // reverse lists, each tagged with the member entry's is_new flag
      val fwd = state.select(col("id").as("x"), col("neighbor_id").as("nb"), col("is_new"))
      val rev = state.select(col("neighbor_id").as("x"), col("id").as("nb"), col("is_new"))
        .withColumn("__rk", row_number().over(
          Window.partitionBy("x").orderBy(xxhash64(col("nb"), lit(iter.toLong)))))
        .filter(col("__rk") <= k).drop("__rk")
      val adj = fwd.unionByName(rev)
        .groupBy("x", "nb").agg(max("is_new").as("is_new")).persist()
      // incremental local join: a pair is proposed only when at least one
      // side is new — (new x all), both orientations collapsed by nb < nb2
      val allSide = adj.select(col("x"), col("nb").as("nb2"), col("is_new").as("new2"))
      val local = adj.join(allSide, "x")
        .filter(col("nb") < col("nb2") && (col("is_new") || col("new2")))
        .select(col("nb").as("id"), col("nb2").as("neighbor_id"))
      // random joins (Knn.java:randomJoins): hash-derived fresh partners per
      // node each round — the escape hatch from local-join stagnation that
      // the reference applies after every NN-descent round.
      val rnd = index
        .select(col("id"), col("idx"),
          explode(sequence(lit(0), lit(cfg.randomJoins - 1))).as("j"))
        .withColumn("cand",
          pmod(xxhash64(col("idx"), lit(cfg.seed), lit(iter.toLong), col("j")), lit(n - 1)))
        .withColumn("nidx", when(col("cand") >= col("idx"), col("cand") + 1L).otherwise(col("cand")))
        .join(index.select(col("idx").as("nidx"), col("id").as("neighbor_id")), "nidx")
        .select("id", "neighbor_id")
      val cand = (if (cfg.randomJoins > 0) local.unionByName(rnd) else local).distinct()
      val scored = withSim(cand).persist()
      val next = topK(
        state.select("id", "neighbor_id", "similarity")
          .unionByName(scored)
          .unionByName(scored.select(col("neighbor_id").as("id"),
            col("id").as("neighbor_id"), col("similarity")))
          .groupBy("id", "neighbor_id").agg(max("similarity").as("similarity"))
      ).join(state.select(col("id"), col("neighbor_id"), lit(false).as("__old")),
          Seq("id", "neighbor_id"), "left")
        .withColumn("is_new", col("__old").isNull).drop("__old")
        .persist()
      val updates = next.filter(col("is_new")).count()
      cachedState.unpersist(false)
      adj.unpersist(false)
      scored.unpersist(false)
      cachedState = next
      state = org.apache.spark.sql.GraftSqlCompat.truncatePlan(next)
      converged = updates <= stopAt
    }

    val out = state.filter(col("similarity") >= lit(cfg.similarityCutoff))
      .select("id", "neighbor_id", "similarity", "rank")
    KnnResult(out, iter, converged)
  }
}
