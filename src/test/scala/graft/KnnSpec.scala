package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.algo.Knn
import graft.ops.Ann

/** NN-descent kNN vs brute force (reference behavior contract:
  * algo/src/test/java/org/neo4j/gds/similarity/knn/KnnTest.java — exact
  * recovery on small fixtures, determinism under reruns). */
class KnnSpec extends AnyFunSuite with SparkTestBase {

  /** Deterministic synthetic vectors: 3 well-separated clusters in 8-d. */
  def vectors(n: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val c = i % 3
      val base = Array.tabulate(8)(d => if (d % 3 == c) 10.0f else 0.0f)
      val jitter = Array.tabulate(8)(d => ((i * 31 + d * 7) % 13).toFloat / 13f)
      (i.toLong, base.zip(jitter).map { case (a, b) => a + b })
    }.toDF("vec_id", "embedding")
  }

  def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("recovers the exact top-k on a small corpus") {
    val vs = vectors(30)
    val got = Knn.run(vs, Knn.KnnConfig(k = 3, maxIterations = 6))
    val exact = Ann.bruteForceTopK(vs, vs, k = 3)
      .select(col("query_id").as("id"), col("neighbor_id"))
    // compare per-node neighbor SETS at matching similarity (rank ties at
    // equal rounded cosine can be ordered differently but sets must agree
    // on this tie-free fixture)
    assert(pairsOf(got.neighbors) == exact.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
    assert(got.didConverge)
  }

  test("deterministic across reruns") {
    val vs = vectors(40)
    val a = Knn.run(vs, Knn.KnnConfig(k = 4)).neighbors
      .select("id", "neighbor_id", "rank").collect().toSet
    val b = Knn.run(vs, Knn.KnnConfig(k = 4)).neighbors
      .select("id", "neighbor_id", "rank").collect().toSet
    assert(a == b)
  }

  test("similarityCutoff filters low-similarity entries") {
    val vs = vectors(30)
    val got = Knn.run(vs, Knn.KnnConfig(k = 5, similarityCutoff = 0.9)).neighbors
    val sims = got.select("similarity").collect().map(_.getDouble(0))
    assert(sims.nonEmpty && sims.forall(_ >= 0.9))
  }

  test("k larger than corpus degrades to n-1 neighbors") {
    val vs = vectors(4)
    val got = Knn.run(vs, Knn.KnnConfig(k = 10)).neighbors
    val counts = got.groupBy("id").count().collect().map(_.getLong(1))
    assert(counts.forall(_ == 3))
  }

  test("local tail matches the distributed path bit-for-bit") {
    // random-ish vectors (NN-descent's hard regime) so every hash decision
    // matters: init partners, reverse caps, random joins, is_new churn
    import spark.implicits._
    val vs = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 37 + d * 11) % 17 - 8).toFloat))
    }.toDF("vec_id", "embedding")
    def rowsOf(t: Long): Set[(Long, Long, Double, Int)] = {
      val r = Knn.run(vs, Knn.KnnConfig(k = 4, maxIterations = 5,
        randomJoins = 3, localTailThreshold = t))
      r.neighbors.collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getInt(3))).toSet
    }
    assert(rowsOf(Long.MaxValue) == rowsOf(-1L))
  }

  test("denseIndex is a 0..n-1 permutation over arbitrary ids") {
    import spark.implicits._
    val ids = Seq(100L, 7L, 55L, 3L, 999L, 42L).toDF("id")
    val idx = Knn.denseIndex(ids, "id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(idx.keySet == Set(100L, 7L, 55L, 3L, 999L, 42L))
    assert(idx.values.toSet == (0L to 5L).toSet)
  }
}
