package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.algo.FastRP
import graft.core.{Orientation, PropertyGraph}

/** FastRP contract tests (reference behavior:
  * algo/src/test/java/org/neo4j/gds/embeddings/fastrp/FastRPTest.java —
  * dimension/normalization invariants and determinism; exact values are
  * RNG-specific and not portable). */
class FastRpSpec extends AnyFunSuite with SparkTestBase {

  // small connected graph, undirected view
  lazy val graph: PropertyGraph = {
    val g = graphOf(8, Seq((0L,1L),(1L,2L),(2L,3L),(3L,4L),(4L,5L),(5L,6L),(6L,7L),(7L,0L),(0L,4L)))
    PropertyGraph(g.vertices, g.orientedEdges(Orientation.Undirected))
  }

  def norms(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.select(col("id"),
        sqrt(aggregate(col("embedding"), lit(0.0), (a, v) => a + v * v)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("dimension and determinism") {
    val cfg = FastRP.FastRPConfig(embeddingDimension = 16)
    val a = FastRP.run(graph, cfg)
    assert(a.select(size(col("embedding"))).distinct().collect().map(_.getInt(0)).toSeq == Seq(16))
    val b = FastRP.run(graph, cfg)
    val da = a.select("id", "embedding").collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val db = b.select("id", "embedding").collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(da == db)
  }

  test("single unit iteration weight gives unit-norm embeddings") {
    val got = FastRP.run(graph, FastRP.FastRPConfig(embeddingDimension = 32,
      iterationWeights = Seq(1.0)))
    norms(got).foreach { case (id, n) =>
      assert(math.abs(n - 1.0) < 1e-9, s"node $id norm $n")
    }
  }

  test("isolated node embeds to the zero vector") {
    val g = graphOf(3, Seq((0L, 1L), (1L, 0L))) // node 2 isolated
    val got = FastRP.run(g, FastRP.FastRPConfig(embeddingDimension = 8))
    assert(norms(got)(2L) == 0.0)
  }

  test("different seeds give different embeddings") {
    val a = FastRP.run(graph, FastRP.FastRPConfig(embeddingDimension = 16, seed = 1L))
    val b = FastRP.run(graph, FastRP.FastRPConfig(embeddingDimension = 16, seed = 2L))
    val da = a.select("id", "embedding").collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val db = b.select("id", "embedding").collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(da != db)
  }

  test("fastRPExtended: trailing propertyDimension dims carry features, leading dims are structural") {
    // feature = 0 for every node → the property part of every INITIAL vector
    // is the zero vector, and propagation (linear + per-round L2 norm) keeps
    // the trailing p dims exactly 0.0 while base dims stay populated
    val gz = graph.copy(vertices = graph.vertices.withColumn("feat", lit(0.0)))
    val cfg = FastRP.FastRPConfig(embeddingDimension = 16,
      iterationWeights = Seq(1.0), featureProperties = Seq("feat"),
      propertyDimension = 4)
    val z = FastRP.run(gz, cfg).collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    z.foreach { case (id, e) =>
      assert(e.length == 16)
      assert(e.drop(12).forall(_ == 0.0), s"node $id trailing dims not zero: $e")
      assert(e.take(12).exists(_ != 0.0), s"node $id base dims all zero")
    }
    // nonzero features → trailing dims populated (a.s.), embeddings deterministic
    val gf = graph.copy(vertices = graph.vertices
      .withColumn("feat", (col("id") % 3 + 1).cast("double")))
    val a = FastRP.run(gf, cfg).collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = FastRP.run(gf, cfg).collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a == b)
    assert(a.values.exists(_.drop(12).exists(_ != 0.0)), "no trailing dim ever populated")
    // embeddings respond to the feature VALUES, not just their presence
    assert(a != z)
    // unit norms still hold for single-unit-weight runs
    a.foreach { case (id, e) =>
      val n = math.sqrt(e.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"node $id norm $n")
    }
  }

  test("fastRPExtended: propertyRatio derives the dimension split; empty featureProperties stays plain") {
    val gf = graph.copy(vertices = graph.vertices
      .withColumn("feat", (col("id") + 1).cast("double")))
    val viaRatio = FastRP.FastRPConfig(embeddingDimension = 16,
      featureProperties = Seq("feat"), propertyRatio = 0.25)
    assert(viaRatio.effectivePropertyDimension == 4)
    val viaDim = viaRatio.copy(propertyRatio = 0.0, propertyDimension = 4)
    val a = FastRP.run(gf, viaRatio).collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = FastRP.run(gf, viaDim).collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a == b)
    // propertyDimension without featureProperties is a no-op: byte-identical
    // to the plain config (the p=0 code path is untouched)
    val plain = FastRP.run(graph, FastRP.FastRPConfig(embeddingDimension = 16))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val noFeat = FastRP.run(graph, FastRP.FastRPConfig(embeddingDimension = 16,
      propertyDimension = 4))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(plain == noFeat)
  }

  test("normalizationStrength scales init-vector magnitudes (not cancelled by normalization)") {
    // the cycle+chord graph has mixed degrees (nodes 0 and 4 have degree 3,
    // the rest 2): with unnormalized init vectors (reference behavior),
    // degree^strength changes the relative weight of high-degree neighbors
    // in the first aggregation, so strength != 0 MUST change the result.
    // (The pre-fix code L2-normalized init vectors, cancelling the uniform
    // per-node scale and silently making this knob a no-op.)
    def embs(strength: Double) =
      FastRP.run(graph, FastRP.FastRPConfig(embeddingDimension = 16,
        iterationWeights = Seq(1.0), normalizationStrength = strength))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val s0 = embs(0.0)
    val s1 = embs(1.0)
    assert(s0 != s1, "normalizationStrength must influence the embeddings")
    // results remain unit-norm per round regardless of init magnitudes
    s1.foreach { case (id, e) =>
      val n = math.sqrt(e.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"node $id norm $n under strength 1")
    }
  }

  test("structurally equivalent nodes get identical aggregated neighborhoods") {
    // two leaves hanging off the same hub see the same neighbor multiset,
    // so their ROUND-1 aggregation (weights [1,0]) must only differ through
    // their own base vectors — verify symmetry via the hub-only graph where
    // both leaves aggregate exactly the hub's base vector.
    val g = graphOf(3, Seq((1L, 0L), (2L, 0L), (0L, 1L), (0L, 2L)))
    val got = FastRP.run(g, FastRP.FastRPConfig(embeddingDimension = 16,
      iterationWeights = Seq(1.0)))
    val m = got.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // leaves 1 and 2 both aggregate only node 0's base vector → identical
    assert(m(1L) == m(2L))
  }
}
