package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.GraphGenerate
import graft.io.GraphGenerate.{Distribution, FixedDouble, RandomDouble, RandomEmbedding, RandomLong}

class GraphGenerateSpec extends AnyFunSuite with SparkTestBase {

  test("uniform: every node has exactly averageDegree out-edges") {
    val e = GraphGenerate.edges(spark, 200L, 5L, Distribution.Uniform)
    val degs = e.groupBy("src").count().select("count").distinct()
      .collect().map(_.getLong(0)).toSeq
    assert(degs == Seq(5L))
    assert(e.count() == 1000L)
    assert(e.agg(min("dst"), max("dst")).first().toSeq == Seq(0L, 199L).map(x => x))
  }

  test("random: gaussian degrees clamped to [0, n], mean near averageDegree") {
    val e = GraphGenerate.edges(spark, 500L, 8L, Distribution.Random)
    val stats = e.groupBy("src").count().agg(min("count"), max("count"), avg("count")).first()
    assert(stats.getLong(0) >= 1L && stats.getLong(1) <= 500L)
    assert(math.abs(stats.getDouble(2) - 8.0) < 1.5, s"mean degree ${stats.getDouble(2)}")
  }

  test("power-law: in-degree tail is skewed, targets within [1, n-1]") {
    val e = GraphGenerate.edges(spark, 1000L, 8L, Distribution.PowerLaw)
    val (lo, hi) = {
      val r = e.agg(min("dst"), max("dst")).first(); (r.getLong(0), r.getLong(1))
    }
    assert(lo >= 1L && hi <= 999L)
    // the hottest 1% of targets must hold far more than a uniform share
    val inDeg = e.groupBy("dst").count()
    val total = e.count().toDouble
    val top10 = inDeg.orderBy(desc("count")).limit(10)
      .agg(sum("count")).first().getLong(0).toDouble
    assert(top10 / total > 0.10, s"top-10 targets hold ${top10 / total} of edges")
  }

  test("deterministic across runs and parallelism; seeds differ") {
    def sig(seed: Long, parts: Int) =
      GraphGenerate.edges(spark, 300L, 4L, Distribution.PowerLaw, seed)
        .repartition(parts).agg(sum(col("src") * 31 + col("dst"))).first().getLong(0)
    assert(sig(42L, 1) == sig(42L, 4))
    assert(sig(42L, 2) != sig(43L, 2))
  }

  test("property producers: fixed, ranged double/long, embedding") {
    val g = GraphGenerate.graph(spark, 100L, 3L, Distribution.Uniform, 7L, Seq(
      FixedDouble("w", 2.5), RandomDouble("x", -1.0, 1.0),
      RandomLong("c", 0L, 5L), RandomEmbedding("emb", 16)))
    assert(g.vertices.count() == 100L)
    val r = g.vertices.agg(
      min("w"), max("w"), min("x"), max("x"), min("c"), max("c"),
      min(size(col("emb")))).first()
    assert(r.getDouble(0) == 2.5 && r.getDouble(1) == 2.5)
    assert(r.getDouble(2) >= -1.0 && r.getDouble(3) <= 1.0)
    assert(r.getLong(4) >= 0L && r.getLong(5) < 5L)
    assert(r.getInt(6) == 16)
  }
}
