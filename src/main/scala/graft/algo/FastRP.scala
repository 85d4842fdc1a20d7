package graft.algo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{GraphOps, PropertyGraph}

/** FastRP node embeddings (Chen et al., "Fast and Accurate Network
  * Embeddings via Very Sparse Random Projection").
  *
  * Reference: algo/src/main/java/org/neo4j/gds/embeddings/fastrp/
  * FastRP.java:1-435 — very-sparse random base vectors (entries
  * ±sqrt(3) w.p. 1/6 each, else 0), optionally scaled by
  * degree^normalizationStrength and fed UNNORMALIZED into the first
  * aggregation (the reference only normalizes propagation results); L
  * rounds of neighbour MEAN aggregation, each round L2-normalized; final
  * embedding = Σ_i iterationWeights(i) · h^(i).
  *
  * Spark formulation: the embedding is an `array<double>` column. A round
  * is two map-side-combined aggregations — explode to (dst, dim, value)
  * and sum per (dst, dim) (the message combiner), then re-assemble the
  * array per dst — followed by pure-expression L2 normalization
  * (`aggregate`/`transform`, codegen'd, no UDFs). Base vectors are
  * deterministic hash functions of (id, dim, seed) — reruns and resumes
  * produce identical embeddings with no stored random state. Shuffle keys
  * are (dst, dim) then dst: skewed in-degree hubs spread across `d`
  * dimension sub-keys in the first aggregation, which is exactly the salted
  * split a power-law graph needs (SURVEY §4).
  */
object FastRP {

  /** Reference defaults: FastRPBaseConfig.java (iterationWeights
    * [0.0, 1.0, 1.0], normalizationStrength 0, propertyDimension 0).
    *
    * `featureProperties` + `propertyDimension` enable the extended variant
    * (`gds.beta.fastRPExtended`, FastRPBaseConfig.java:42-45 and
    * FastRP.java:155-167,325-340): the TRAILING `propertyDimension` entries
    * of each initial vector are fed by random projections of the named node
    * property columns (one shared ±sqrt(3)/sqrt(p) hash-random vector per
    * feature, `initPropertyVectors`), while the LEADING
    * `embeddingDimension - propertyDimension` entries stay the per-node
    * hash-random base draw — so structural information and feature
    * information occupy disjoint dimension ranges and mix only through the
    * propagation rounds. `propertyRatio`, when > 0, derives
    * `propertyDimension = round(ratio · embeddingDimension)` (the knob the
    * reference docs describe). */
  final case class FastRPConfig(
    embeddingDimension: Int = 64,
    iterationWeights: Seq[Double] = Seq(0.0, 1.0, 1.0),
    normalizationStrength: Double = 0.0,
    seed: Long = 42L,
    featureProperties: Seq[String] = Nil,
    propertyDimension: Int = 0,
    propertyRatio: Double = 0.0) {
    /** Effective trailing-feature width: ratio wins when set; zero without
      * feature properties (plain FastRP). */
    def effectivePropertyDimension: Int =
      if (featureProperties.isEmpty) 0
      else if (propertyRatio > 0.0) math.round(propertyRatio * embeddingDimension).toInt
      else propertyDimension
  }

  /** ±sqrt(3) w.p. 1/6 each, else 0 — derived from xxhash64(seed, id, dim)
    * mod 6 (very-sparse Achlioptas projection, FastRP.java:198-210). */
  private def baseEntry(id: Column, dim: Column, seed: Long): Column = {
    val h = pmod(xxhash64(lit(seed), id, dim), lit(6L))
    val s3 = math.sqrt(3.0)
    when(h === 0L, lit(s3)).when(h === 1L, lit(-s3)).otherwise(lit(0.0))
  }

  /** Property-vector entry R_j(k): ±sqrt(3)/sqrt(p) w.p. 1/6 each, else 0 —
    * one shared random vector per FEATURE (not per node), mirroring
    * `initPropertyVectors` (FastRP.java:155-167). Keyed in a distinct hash
    * subspace (feature index is offset from Long.MinValue, far from any
    * graph's node-id range) so property draws don't correlate with base
    * draws. */
  private def propEntry(j: Int, dim: Column, seed: Long, p: Int): Column = {
    val h = pmod(xxhash64(lit(seed), lit(Long.MinValue + j), dim), lit(6L))
    val v = math.sqrt(3.0) / math.sqrt(p.toDouble)
    when(h === 0L, lit(v)).when(h === 1L, lit(-v)).otherwise(lit(0.0))
  }

  private def l2normalize(vec: Column): Column = {
    val norm = sqrt(aggregate(vec, lit(0.0), (a, v) => a + v * v))
    transform(vec, v => when(norm === 0.0, lit(0.0)).otherwise(v / norm))
  }

  /** (id, embedding: array<double>) for every vertex. */
  def run(graph: PropertyGraph, cfg: FastRPConfig = FastRPConfig()): DataFrame = {
    val spark = graph.edges.sparkSession
    val edgeCount = graph.edges.count()
    val parts = GraphOps.adaptiveParts(spark, edgeCount)
    val d = cfg.embeddingDimension
    val p = cfg.effectivePropertyDimension
    require(p >= 0 && p < d,
      s"propertyDimension ($p) must be in [0, embeddingDimension=$d)")
    val baseDim = d - p
    val dims = sequence(lit(0), lit(d - 1))

    // extended mode carries the feature property columns (missing values ->
    // 0, matching the reference's default fallback) through the cached
    // vertex table; plain mode carries id only
    val featCols = cfg.featureProperties.map(f =>
      coalesce(col(f).cast("double"), lit(0.0)).as(f))
    val vertices = graph.vertices.select(col("id") +: (if (p > 0) featCols else Nil): _*)
      .repartition(parts, col("id")).persist()
    val edges = GraphOps.withWeight(graph.edges)
      .select("src", "dst", "weight")
      .repartition(parts, col("src")).persist()
    // mean aggregation denominator: weighted in-degree of dst
    val inDeg = edges.groupBy(col("dst").as("id"))
      .agg(sum("weight").as("indeg"))

    // base vectors, degree^normalizationStrength scaled (FastRP.java:176-191
    // uses the node's degree; 0 strength = no scaling)
    val degScale =
      if (cfg.normalizationStrength == 0.0) lit(1.0)
      else pow(coalesce(col("indeg"), lit(0.0)), lit(cfg.normalizationStrength))
    // initial vector: plain mode = d hash-random base entries (unchanged
    // path); extended mode = (d-p) base entries at the reference's
    // ±scaling·sqrt(3)/sqrt(baseDim) magnitude ++ p property-projection
    // entries Σ_j f_j·R_j(k) (FastRP.java computeRandomVector:325-340) —
    // the base/property relative magnitudes matter once both coexist
    val initVec =
      if (p == 0)
        transform(dims, dim => baseEntry(col("id"), dim, cfg.seed) * degScale)
      else {
        val baseScale = lit(1.0 / math.sqrt(baseDim.toDouble))
        val basePart = transform(sequence(lit(0), lit(baseDim - 1)),
          dim => baseEntry(col("id"), dim, cfg.seed) * baseScale * degScale)
        val propPart = transform(sequence(lit(0), lit(p - 1)), k =>
          cfg.featureProperties.zipWithIndex.map { case (f, j) =>
            col(f) * propEntry(j, k, cfg.seed, p)
          }.reduce(_ + _))
        concat(basePart, propPart)
      }
    // Reference parity (FastRP.java): initial vectors enter the FIRST
    // aggregation UNNORMALIZED — only propagation results are L2-normalized
    // (each round below). Normalizing here would cancel the per-node
    // degree^normalizationStrength scale (a uniform scalar per vector) and
    // make hub/leaf init magnitudes indistinguishable; FastRpSpec pins the
    // strength knob's effect.
    var state = vertices.join(inDeg, Seq("id"), "left")
      .select(col("id"), initVec.as("h"))

    // accumulated Σ_i w_i · h^(i)
    var acc: DataFrame = vertices.select(col("id"),
      transform(dims, _ => lit(0.0)).as("emb"))

    // Small graphs: chain the rounds LAZILY (one action total, Spark's
    // exchange reuse dedupes the shared state subplans) — per-round
    // persist + count is 2 driver-synced jobs per round of fixed latency
    // that dominates wall time on sub-threshold inputs (the LP pipeline's
    // FastRP step measured 8.3 s on a 600-edge graph, almost all of it
    // round-boundary overhead). At scale the per-round materialization
    // stays: it bounds plan depth and recompute across the L rounds.
    val fuseRounds = edgeCount <= 100000L

    cfg.iterationWeights.foreach { w =>
      // one round: h'(v) = L2norm( Σ_{u->v} weight·h(u) / indeg(v) )
      val msgs = state.join(edges, col("id") === col("src"))
        .select(col("dst"), posexplode(col("h")).as(Seq("dim", "hv")), col("weight"))
        .groupBy("dst", "dim").agg(sum(col("hv") * col("weight")).as("s"))
      val gathered = msgs.groupBy(col("dst").as("id"))
        .agg(array_sort(collect_list(struct(col("dim"), col("s")))).as("ds"))
        .select(col("id"), transform(col("ds"), e => e.getField("s")).as("hsum"))
      val next = vertices
        .join(gathered, Seq("id"), "left")
        .join(inDeg, Seq("id"), "left")
        .select(col("id"), when(col("hsum").isNull, transform(dims, _ => lit(0.0)))
          .otherwise(l2normalize(transform(col("hsum"), v => v / col("indeg"))))
          .as("h"))
      val prevState = state
      val prevAcc = acc
      state = if (fuseRounds) next else next.persist()
      acc = acc.join(state, "id")
        .select(col("id"), zip_with(col("emb"), col("h"),
          (a, b) => a + lit(w) * b).as("emb"))
      if (!fuseRounds) {
        acc = acc.persist()
        // one cache-populating job per round: evaluating acc fills BOTH the
        // acc cache and (via the join) the new state's cache
        acc.count()
        prevState.unpersist(false)
        prevAcc.unpersist(false)
      }
    }
    val out = acc.select(col("id"), col("emb").as("embedding"))
    vertices.unpersist(false)
    edges.unpersist(false)
    out
  }
}
