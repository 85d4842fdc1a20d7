package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (`array<float>`): brute-force
  * cosine top-k as the exact baseline, and an LSH-bucketed variant as the
  * scale path. Dot products are `zip_with` + `aggregate` expressions — no
  * UDFs, fully codegen'd.
  */
object Ann {

  /** `.estimate`-mode analogue for the ANN family: vector-table and
    * bucketed-index cardinalities from the config, exact integer
    * arithmetic (companion to `graft.api.Gds.estimate` and
    * [[Dedup.estimateMinHash]]). `bytesMax` = 3x headroom. */
  final case class AnnEstimate(vectors: Long, dim: Int, vectorBytes: Long,
                               indexRows: Long, indexBytes: Long,
                               bytesMin: Long, bytesMax: Long)

  /** Hyperplane LSH: corpus vectors re-keyed once per table — the bucketed
    * index carries (table, bucket, id, vector) because candidate scoring
    * reads the vector in place (no second corpus join). */
  def estimateLsh(vectors: Long, dim: Int, planes: Int = 12,
                  tables: Int = 4): AnnEstimate = {
    val vec = vectors * (8L + 8L * dim)
    val idxRows = vectors * tables
    val idx = idxRows * (16L + 8L + 8L * dim) // table+bucket, id, vector
    AnnEstimate(vectors, dim, vec, idxRows, idx, vec + idx, (vec + idx) * 3)
  }

  /** IVF: one cell assignment per vector (the index IS the corpus keyed by
    * cell) plus the broadcast centroid table. */
  def estimateIvf(vectors: Long, dim: Int, cells: Int): AnnEstimate = {
    val vec = vectors * (8L + 8L * dim)
    val idx = vectors * (8L + 8L + 8L * dim) + cells * 8L * dim
    AnnEstimate(vectors, dim, vec, vectors, idx, vec + idx, (vec + idx) * 3)
  }

  /** Cosine similarity between two array<float/double> columns, computed in
    * double precision. 0.0 when either norm is 0 (instead of NaN/err).
    * One codegen'd pass per pair (graft.functions.VecCosine) — the
    * composable aggregate/zip_with form is CodegenFallback and its
    * interpreter overhead dominates candidate scoring. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExprs.vecCosine(a, b)

  /** Exact top-k cosine neighbors for each query vector, brute force.
    * The query set is broadcast (it is the small side by construction), so
    * the scan over the corpus is a single map-side pass — no shuffle until
    * the final per-query top-k, which is a partial-aggregated window.
    * Ranking uses the 5-dp-rounded similarity with id tie-break, so results
    * are deterministic and portable across float summation orders. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     localTailThreshold: Long = 100000000L): DataFrame = {
    if (localTailThreshold >= 0L) {
      val nQ = queries.count(); val nC = corpus.count()
      // |Q|*|C| pair bound: one 64-dim pair scores in ~50ns locally, so 1e8
      // pairs is a few parallel seconds — far below one distributed shuffle
      // of the same pair table. Beyond the bound, the broadcast scan is the
      // only shape that survives corpus scale.
      if (nQ * nC <= localTailThreshold && nC <= 1000000L)
        return bruteForceTopKLocal(queries, corpus, k, idCol, vecCol)
    }
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val sims = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.core.Num.roundTo(cosine(col("qv"), col("cv")), 5).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Driver-local exact top-k: same arithmetic as the distributed path
    * (VecCosine's single ascending pass, 5-dp rounding, (cosine desc, id
    * asc) ranking), parallel over query chunks. Local == distributed
    * exactly — asserted in OpsSpec. */
  private def bruteForceTopKLocal(queries: DataFrame, corpus: DataFrame, k: Int,
                                  idCol: String, vecCol: String): DataFrame = {
    val spark = queries.sparkSession
    def collectVecs(df: DataFrame): (Array[Long], Array[Array[Double]]) = {
      val rows = df.select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v")).collect()
      (rows.map(_.getLong(0)), rows.map(_.getSeq[Double](1).toArray))
    }
    val (qIds, qVecs) = collectVecs(queries)
    val (cIds, cVecs) = collectVecs(corpus)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      if (a.length != b.length) return 0.0
      var dot = 0.0; var aa = 0.0; var bb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i); val y = b(i)
        dot += x * y; aa += x * x; bb += y * y; i += 1
      }
      val denom = math.sqrt(aa) * math.sqrt(bb)
      if (denom == 0.0) 0.0 else dot / denom
    }
    def round5(x: Double): Double = math.floor(x * 100000.0 + 0.5 + 1e-6) / 100000.0
    val perQuery = new Array[Array[(Long, Long, Double, Int)]](qIds.length)
    java.util.stream.IntStream.range(0, qIds.length).parallel().forEach { qi =>
      val sims = new Array[(Double, Long)](cIds.length)
      var m = 0
      var ci = 0
      while (ci < cIds.length) {
        if (cIds(ci) != qIds(qi)) {
          sims(m) = (round5(cos(qVecs(qi), cVecs(ci))), cIds(ci)); m += 1
        }
        ci += 1
      }
      val top = java.util.Arrays.copyOf(sims, m)
        .sortBy { case (s, id) => (-s, id) }.take(k)
      perQuery(qi) = top.zipWithIndex.map { case ((s, id), r) =>
        (qIds(qi), id, s, r + 1)
      }
    }
    spark.createDataFrame(perQuery.flatten.toSeq)
      .toDF("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Random-hyperplane signature: bit p = sign of Σ_d vec[d] * r(p, d) where
    * r is a deterministic ±1 pseudo-random derived from xxhash64(p, d).
    * Vectors with equal signatures land in one bucket. */
  /** Symmetric int8 scalar quantization, per vector: scale = max|x|/127,
    * q_i = round-half-up(x_i/scale) in [-127,127] (all-zero vectors get
    * scale 0 and zero codes). At corpus scale the quantized table shuffles
    * 4-8x fewer bytes than float64/float32 vectors, and COSINE is
    * scale-invariant, so quantized search needs only integer dot products.
    * Pure expressions; rounding is the cross-engine floor(x+0.5) form so a
    * SQL oracle replays codes bit-for-bit. Returns (id, scale, qvec). */
  def scalarQuantize(vectors: DataFrame, idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val scale = array_max(transform(v, x => abs(x))) / lit(127.0)
    val q = transform(col("__v"), x =>
      least(greatest(
        when(col("__scale") === 0.0, lit(0.0)).otherwise(floor(x / col("__scale") + lit(0.5))),
        lit(-127.0)), lit(127.0)).cast("int"))
    vectors.select(col(idCol).as("id"), v.as("__v"), scale.as("__scale"))
      .select(col("id"), col("__scale").as("scale"), q.as("qvec"))
  }

  /** Reconstruct approximate doubles from int8 codes. */
  def dequantize(qvec: Column, scale: Column): Column =
    transform(qvec, q => q.cast("double") * scale)

  /** Exact top-k under QUANTIZED cosine: both sides int8-coded, similarity
    * = integer dot / (sqrt of integer self-dots) — the scales cancel, so
    * the whole score derives from exact integer arithmetic (deterministic
    * and SQL-replayable, unlike float-sum order). Same broadcast + windowed
    * top-k shape as [[bruteForceTopK]]. */
  def quantizedCosineTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame = {
    val q = scalarQuantize(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("qvec").as("qa"))
    val c = scalarQuantize(corpus, idCol, vecCol)
      .select(col("id").as("neighbor_id"), col("qvec").as("qb"))
    def selfDot(a: Column) = aggregate(
      transform(a, x => (x * x).cast("long")), lit(0L), (s, x) => s + x)
    val dot = aggregate(zip_with(col("qa"), col("qb"), (x, y) => (x * y).cast("long")),
      lit(0L), (s, x) => s + x)
    val denom = sqrt(selfDot(col("qa")).cast("double")) *
      sqrt(selfDot(col("qb")).cast("double"))
    val sims = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.core.Num.roundTo(
          when(denom === 0.0, lit(0.0)).otherwise(dot.cast("double") / denom), 6)
          .as("qcosine"))
    val w = Window.partitionBy("query_id").orderBy(desc("qcosine"), col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "qcosine", "rank")
  }

  def hyperplaneBucket(vec: Column, planes: Int, seed: Long = 42L): Column = {
    val proj = (p: Int) => aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1),
        (v, d) => v.cast("double") *
          when(pmod(xxhash64(lit(seed), lit(p), d), lit(2L)) === 0L, lit(1.0)).otherwise(lit(-1.0))),
      lit(0.0), (acc, x) => acc + x)
    (0 until planes).map { p =>
      when(proj(p) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: candidates limited to vectors sharing
    * the query's hyperplane bucket under any of `tables` independent
    * signatures; exact cosine + top-k within candidates. The join key is
    * (table, bucket) — at corpus scale this replaces the O(|Q|·|C|) scan
    * with bucket-local work. Recall grows with `tables`, bucket selectivity
    * with `planes`. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              planes: Int = 12, tables: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def signed(df: DataFrame, id: String, v: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(v),
          posexplode(array((0 until tables).map(t =>
            hyperplaneBucket(col(vecCol), planes, seed = 42L + t)): _*))
            .as(Seq("table", "bucket")))
    val q = signed(queries, "query_id", "qv")
    val c = signed(corpus, "neighbor_id", "cv")
    val candidates = q.join(c, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qv", "neighbor_id", "cv")
      .distinct()
    val sims = candidates.select(col("query_id"), col("neighbor_id"),
      graft.core.Num.roundTo(cosine(col("qv"), col("cv")), 5).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Embedding-cosine near-duplicate pairs over one table: LSH buckets →
    * exact cosine >= threshold. */
  def cosineNearDuplicates(vectors: DataFrame, threshold: Double,
                           planes: Int = 12, tables: Int = 4,
                           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val signed = vectors.select(col(idCol).as("id"), col(vecCol).as("v"),
      posexplode(array((0 until tables).map(t =>
        hyperplaneBucket(col(vecCol), planes, seed = 42L + t)): _*))
        .as(Seq("table", "bucket")))
    val a = signed.select(col("table"), col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = signed.select(col("table"), col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "v_a", "v_b").distinct()
      .select(col("id_a"), col("id_b"), graft.core.Num.roundTo(cosine(col("v_a"), col("v_b")), 5).as("cosine"))
      .filter(col("cosine") >= lit(threshold))
  }

  /** IVF (inverted-file) approximate top-k — the coarse-quantizer scale
    * path next to [[lshTopK]]: the corpus is partitioned into `nlist`
    * centroid cells (short deterministic Lloyd refinement of a hash-seeded
    * init), a query scores only the cells of its `nprobe` nearest
    * centroids, exact cosine + top-k within the probed candidates. The
    * centroid table (nlist x dim) is the ONLY driver-side state — genuinely
    * tiny and broadcast to both assignment scans; the corpus itself moves
    * through one groupBy(cell) equi-join, never all-pairs. Identical
    * vectors always share a cell and every query probes its own cell first,
    * so exact-duplicate recall is structural (the oracle-checkable
    * invariant), while general recall grows with `nprobe`. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4, lloydIters: Int = 2,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      transform(col(vecCol), x => x.cast("double")).as("cv"))

    // hash-seeded deterministic init: the nlist corpus vectors with the
    // smallest id hashes (spread uniformly, independent of row order)
    var centroids: Array[(Int, Array[Double])] =
      c.orderBy(xxhash64(col("neighbor_id")), col("neighbor_id")).limit(nlist)
        .collect().zipWithIndex
        .map { case (r, i) => (i, r.getSeq[Double](1).toArray) }

    def centroidDf(spark: org.apache.spark.sql.SparkSession) =
      spark.createDataFrame(centroids.map { case (i, v) => (i, v.toSeq) })
        .toDF("cell", "centroid")

    /** Nearest-centroid cell per vector: broadcast the tiny centroid table,
      * argmin via a lexicographic struct-min (max cosine, ties -> smaller
      * cell id) — one map-side pass + one combine per vector. */
    def assign(df: DataFrame, id: String, v: String): DataFrame =
      df.crossJoin(broadcast(centroidDf(df.sparkSession)))
        .select(col(id), col(v),
          struct((-cosine(col(v), col("centroid"))).as("neg"), col("cell").as("cell")).as("sc"))
        .groupBy(col(id), col(v))
        .agg(min("sc").as("sc"))
        .select(col(id), col(v), col("sc.cell").as("cell"))

    val spark = corpus.sparkSession
    for (_ <- 1 to lloydIters) {
      // Lloyd update: per-cell mean, computed dimension-wise (explode ->
      // partial-agg avg -> re-assemble); the collected result is <= nlist rows
      val means = assign(c, "neighbor_id", "cv")
        .select(col("cell"), posexplode(col("cv")).as(Seq("dim", "x")))
        .groupBy("cell", "dim").agg(avg("x").as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cell"), transform(col("dm"), s => s.getField("m")).as("centroid"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      // Spherical update for the cosine objective: L2-normalize each per-cell
      // mean; a cell emptied during refinement (or whose mean collapses to 0)
      // KEEPS its previous centroid, so the effective nlist never shrinks.
      centroids = centroids.map { case (cell, prev) =>
        means.get(cell) match {
          case Some(m) =>
            val n = math.sqrt(m.map(x => x * x).sum)
            (cell, if (n > 0.0) m.map(_ / n) else prev)
          case None => (cell, prev)
        }
      }
    }

    val cells  = assign(c, "neighbor_id", "cv")
    val q      = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), x => x.cast("double")).as("qv"))
    // nprobe nearest centroids per query (rank over the broadcast table)
    val probes = q.crossJoin(broadcast(centroidDf(spark)))
      .select(col("query_id"), col("qv"), col("cell"),
        cosine(col("qv"), col("centroid")).as("ccos"))
      .withColumn("prank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("ccos"), col("cell"))))
      .filter(col("prank") <= nprobe)
      .select("query_id", "qv", "cell")

    val sims = probes.join(cells, "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.core.Num.roundTo(cosine(col("qv"), col("cv")), 5).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
