package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pairwise similarity metrics over array columns — the reference's alpha
  * similarity functions (`gds.alpha.similarity.{jaccard,cosine,euclidean,
  * overlap,pearson}`; reference: alpha/alpha-algo/src/main/java/org/neo4j/
  * gds/impl/similarity/). All pure Catalyst expressions (zip_with/aggregate,
  * fully codegen'd): apply to `array<long>` category lists or
  * `array<double>` weight vectors. */
object Similarity {

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Jaccard over category arrays (treated as sets). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0.0, lit(1.0)).otherwise(inter / union)
  }

  /** Overlap coefficient over category arrays: |∩| / min(|A|,|B|). */
  def overlap(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val mn = least(size(array_distinct(a)), size(array_distinct(b))).cast("double")
    when(mn === 0.0, lit(0.0)).otherwise(inter / mn)
  }

  /** Cosine similarity over numeric vectors. */
  def cosine(a: Column, b: Column): Column = {
    val denom = sqrt(dot(a, a)) * sqrt(dot(b, b))
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Euclidean distance over numeric vectors. */
  def euclideanDistance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), lit(0.0), (acc, v) => acc + v))

  /** Euclidean similarity = 1 / (1 + distance), the reference's convention. */
  def euclideanSimilarity(a: Column, b: Column): Column =
    lit(1.0) / (lit(1.0) + euclideanDistance(a, b))

  /** Pearson correlation over numeric vectors. */
  def pearson(a: Column, b: Column): Column = {
    val n    = size(a).cast("double")
    val sumA = aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double"))
    val sumB = aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double"))
    val muA  = sumA / n
    val muB  = sumB / n
    val cov  = aggregate(zip_with(a, b, (x, y) =>
      (x.cast("double") - muA) * (y.cast("double") - muB)), lit(0.0), (acc, v) => acc + v)
    val varA = aggregate(a, lit(0.0), (acc, v) =>
      acc + (v.cast("double") - muA) * (v.cast("double") - muA))
    val varB = aggregate(b, lit(0.0), (acc, v) =>
      acc + (v.cast("double") - muB) * (v.cast("double") - muB))
    val denom = sqrt(varA) * sqrt(varB)
    when(denom === 0.0, lit(0.0)).otherwise(cov / denom)
  }

  /** Closed-form link-prediction scores (reference alpha functions
    * `gds.alpha.linkprediction.*`), over precomputed neighbor arrays. */
  def commonNeighbors(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double")

  def totalNeighbors(a: Column, b: Column): Column =
    size(array_union(a, b)).cast("double")

  /** Preferential attachment: |N(a)| * |N(b)|. */
  def preferentialAttachment(a: Column, b: Column): Column =
    size(array_distinct(a)).cast("double") * size(array_distinct(b)).cast("double")

  /** `gds.alpha.linkprediction.sameCommunity` (reference: alpha/alpha-proc/
    * src/main/java/org/neo4j/gds/linkprediction/LinkPredictionFunc.java:113-121):
    * 1.0 if both nodes carry the community property and the values are equal,
    * 0.0 when either is missing or they differ. */
  def sameCommunity(ca: Column, cb: Column): Column =
    when(ca.isNull || cb.isNull, lit(0.0))
      .otherwise(when(ca === cb, lit(1.0)).otherwise(lit(0.0)))

  // ------------------------------------------------------------------
  // Degree-weighted link-prediction scores (gds.alpha.linkprediction.
  // {adamicAdar,resourceAllocation}; reference: alpha/alpha-proc/src/main/
  // java/org/neo4j/gds/functions/linkprediction/). These need each common
  // neighbor's DEGREE, so they are DataFrame-level: one join per side plus
  // a degree join — no per-node adjacency materialization, scale-safe.
  // ------------------------------------------------------------------

  private def commonWithDegree(neighbors: DataFrame, pairs: DataFrame): DataFrame = {
    val deg = neighbors.groupBy(col("id").as("c"))
      .agg(count(lit(1)).cast("double").as("cdeg"))
    pairs
      .join(neighbors.select(col("id").as("a"), col("nb").as("c")), "a")
      .join(neighbors.select(col("id").as("b"), col("nb").as("c")), Seq("b", "c"))
      .join(deg, "c")
  }

  /** Adamic-Adar over an adjacency table `neighbors(id, nb)` (distinct,
    * symmetric for undirected semantics) and `pairs(a, b)`:
    * score = Σ over common neighbors c of 1 / ln(deg(c)). A common neighbor
    * has degree >= 2 by construction, so ln(deg) > 0. Returns (a, b, score),
    * 0.0 when the pair shares no neighbor. */
  def adamicAdar(neighbors: DataFrame, pairs: DataFrame): DataFrame = {
    val s = commonWithDegree(neighbors, pairs)
      .groupBy("a", "b").agg(sum(lit(1.0) / log(col("cdeg"))).as("score"))
    pairs.join(s, Seq("a", "b"), "left")
      .select(col("a"), col("b"), coalesce(col("score"), lit(0.0)).as("score"))
  }

  /** Resource allocation: Σ over common neighbors c of 1 / deg(c). */
  def resourceAllocation(neighbors: DataFrame, pairs: DataFrame): DataFrame = {
    val s = commonWithDegree(neighbors, pairs)
      .groupBy("a", "b").agg(sum(lit(1.0) / col("cdeg")).as("score"))
    pairs.join(s, Seq("a", "b"), "left")
      .select(col("a"), col("b"), coalesce(col("score"), lit(0.0)).as("score"))
  }
}
